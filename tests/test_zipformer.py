# Zipformer encoder: shape/length contracts, masking invariance, batching.
import numpy as np
import pytest


@pytest.fixture(scope="module")
def model():
    import jax

    from sherpa_vietnamese_asr_tpu.models import zipformer as z

    cfg = z.ZipformerConfig(
        num_encoder_layers=(1, 1, 1), downsampling_factor=(1, 2, 4),
        encoder_dim=(64, 96, 96), ffn_dim=(96, 128, 128),
        num_heads=(2, 2, 2), cnn_module_kernel=(15, 15, 7),
        query_head_dim=16, pos_head_dim=4, value_head_dim=8, pos_dim=16,
    )
    params = z.init_zipformer_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_output_shape_and_lengths(model, rng):
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.zipformer import zipformer_encoder

    cfg, params = model
    x = rng.standard_normal((2, 107, 80)).astype(np.float32)
    lens = np.array([107, 55], dtype=np.int32)
    out, out_lens = zipformer_encoder(params, jnp.asarray(x),
                                      jnp.asarray(lens), cfg)
    t_embed = (107 - 7) // 2  # 50
    assert out.shape == (2, (t_embed + 1) // 2, cfg.output_dim)
    assert int(out_lens[0]) == (50 + 1) // 2
    assert int(out_lens[1]) == (((55 - 7) // 2) + 1) // 2
    assert cfg.output_length(107) == int(out_lens[0])
    assert np.isfinite(np.asarray(out)).all()


def test_padding_invariance(model, rng):
    """Extra padding frames must not change valid outputs (masking works)."""
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.zipformer import zipformer_encoder

    cfg, params = model
    t_short = 87
    x = rng.standard_normal((1, t_short, 80)).astype(np.float32)
    x_padded = np.concatenate(
        [x, rng.standard_normal((1, 40, 80)).astype(np.float32)], axis=1)
    out_a, lens_a = zipformer_encoder(params, jnp.asarray(x),
                                      jnp.asarray(np.array([t_short])), cfg)
    out_b, lens_b = zipformer_encoder(params, jnp.asarray(x_padded),
                                      jnp.asarray(np.array([t_short])), cfg)
    n = int(lens_a[0])
    assert int(lens_b[0]) == n
    np.testing.assert_allclose(np.asarray(out_a)[0, :n],
                               np.asarray(out_b)[0, :n], atol=2e-4)


def test_encoder_embed_matches_naive_convs(rng):
    """The MXU-shaped embed rewrites (banded conv1/conv2 matmuls, 9-tap
    conv3 matmul) must match a straight lax.conv implementation exactly
    (fp32; same math, different op shapes)."""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.zipformer import (
        ZIPFORMER_30M, bias_norm, encoder_embed, init_encoder_embed, linear,
        swoosh_l, swoosh_r,
    )

    cfg = ZIPFORMER_30M
    p = init_encoder_embed(jax.random.PRNGKey(3), cfg)
    B, T = 2, 39
    x = jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32))
    out_lens = jnp.asarray([(T - 7) // 2, 9], jnp.int32)

    def conv(h, prm, strides, padding):
        return jax.lax.conv_general_dilated(
            h, prm["weight"], strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + prm["bias"]

    h = conv(x[..., None], p["conv1"], (1, 1), [(0, 0), (1, 1)])
    h = swoosh_r(h)
    h = swoosh_r(conv(h, p["conv2"], (2, 2), [(0, 0), (0, 0)]))
    h = swoosh_r(conv(h, p["conv3"], (1, 2), [(0, 0), (0, 0)]))
    t_mask = jnp.arange(h.shape[1])[None, :] < out_lens[:, None]
    h = jnp.where(t_mask[:, :, None, None], h, 0.0)
    c3 = h.shape[-1]
    g = jax.lax.conv_general_dilated(
        h, p["convnext_dw"]["weight"], (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c3)
    g = g + p["convnext_dw"]["bias"]
    g = swoosh_l(linear(p["convnext_pw1"], g))
    h = h + linear(p["convnext_pw2"], g)
    h = jnp.transpose(h, (0, 1, 3, 2)).reshape(B, h.shape[1], -1)
    ref = bias_norm(p["out_norm"], linear(p["out"], h))

    got = encoder_embed(p, x, out_lens, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_param_counts_are_in_expected_range():
    import jax

    from sherpa_vietnamese_asr_tpu.models import zipformer as z

    p30 = z.init_zipformer_params(jax.random.PRNGKey(0), z.ZIPFORMER_30M)
    n30 = z.count_params(p30)
    # Zipformer-30M encoder: ~20-35M params (joiner/decoder excluded)
    assert 15e6 < n30 < 40e6, n30
    p68 = z.init_zipformer_params(jax.random.PRNGKey(0), z.ZIPFORMER_68M)
    n68 = z.count_params(p68)
    assert 45e6 < n68 < 80e6, n68
    assert n68 > n30


def test_batch_independence(model):
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.zipformer import zipformer_encoder

    cfg, params = model
    # Hermetic input: the shared session rng's state depends on which tests
    # ran before this one, and the 2e-4 batched-vs-single tolerance is
    # input-sensitive (XLA fuses the two batch shapes differently) — a
    # tier-membership change once flipped this test by shifting the stream.
    x = np.random.default_rng(1234).standard_normal((3, 71, 80)).astype(
        np.float32)
    lens = np.array([71, 71, 71], dtype=np.int32)
    out, _ = zipformer_encoder(params, jnp.asarray(x), jnp.asarray(lens), cfg)
    out0, _ = zipformer_encoder(params, jnp.asarray(x[:1]),
                                jnp.asarray(lens[:1]), cfg)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(out0)[0],
                               atol=2e-4)

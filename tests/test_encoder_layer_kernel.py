# Whole-layer encoder megakernel vs the XLA layer path (interpret mode).
import dataclasses

import numpy as np
import pytest


def _tiny_cfg(**kw):
    import sherpa_vietnamese_asr_tpu.models.zipformer as Z
    base = dict(
        num_encoder_layers=(2,), downsampling_factor=(1,),
        encoder_dim=(64,), ffn_dim=(96,), num_heads=(2,),
        cnn_module_kernel=(15,), query_head_dim=16, pos_head_dim=4,
        value_head_dim=8, pos_dim=16, compute_dtype="bfloat16",
        pos_dtype="float32")
    base.update(kw)
    return Z.ZipformerConfig(**base)


def test_layer_kernel_matches_xla_layer():
    """Single layer: megakernel output vs the XLA encoder_layer, mixed
    lens, padded T."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    import sherpa_vietnamese_asr_tpu.models.zipformer as Z
    from sherpa_vietnamese_asr_tpu.ops.encoder_layer import (
        encoder_layer_pallas,
    )

    cfg = _tiny_cfg()
    params = Z.init_zipformer_params(jax.random.PRNGKey(0), cfg)
    layer = params["stacks"][0]["layers"][0]
    rng = np.random.default_rng(0)
    t, tp, b = 100, 128, 3
    lens = np.array([100, 61, 17])
    x = rng.standard_normal((b, t, 64)).astype(np.float32)
    # tail rows: finite but arbitrary (the encoder clamps/zeroes them)
    mask = jnp.asarray(np.arange(t)[None, :] >= lens[:, None])
    pos_emb = jnp.asarray(Z.compact_rel_pos_emb(t, cfg.pos_dim))
    ref = np.asarray(Z.encoder_layer(
        layer, jnp.asarray(x), pos_emb, mask, 2, cfg))

    xp = np.zeros((b, tp, 64), np.float32)
    xp[:, :t] = x
    rev = jnp.asarray(Z._padded_rev_pos_emb(t, tp, cfg.pos_dim))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(encoder_layer_pallas(
            layer, jnp.asarray(xp), rev, jnp.asarray(lens, jnp.int32),
            2, cfg))[:, :t]

    scale = np.abs(ref).mean()
    for i, ln in enumerate(lens):
        err = np.abs(got[i, :ln] - ref[i, :ln]).max()
        assert err < 0.12 * scale, (i, err, scale)
        rel = np.abs(got[i, :ln] - ref[i, :ln]).mean() / scale
        assert rel < 0.015, (i, rel)


@pytest.mark.parametrize("lens_list", [[220, 173, 64]])
def test_encoder_layer_kernel_end_to_end(lens_list):
    """Full encoder with layer_kernel='always' vs 'never' (bf16)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    import sherpa_vietnamese_asr_tpu.models.zipformer as Z

    cfg = _tiny_cfg(num_encoder_layers=(2, 2),
                    downsampling_factor=(1, 2), encoder_dim=(64, 64),
                    ffn_dim=(96, 96), num_heads=(2, 2),
                    cnn_module_kernel=(15, 15))
    params = Z.init_zipformer_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    b = len(lens_list)
    t = max(lens_list) * 2 + 7
    x = jnp.asarray(rng.standard_normal((b, t, 80)).astype(np.float32))
    x_lens = jnp.asarray(np.asarray(lens_list) * 2 + 7, jnp.int32)

    ref, rl = Z.zipformer_encoder(
        params, x, x_lens, dataclasses.replace(cfg, layer_kernel="never"))
    with pltpu.force_tpu_interpret_mode():
        got, gl = Z.zipformer_encoder(
            params, x, x_lens, dataclasses.replace(cfg, layer_kernel="always"))
    ref, got = np.asarray(ref), np.asarray(got)
    assert np.array_equal(np.asarray(rl), np.asarray(gl))
    scale = np.abs(ref).mean()
    for i, ln in enumerate(np.asarray(rl)):
        rel = np.abs(got[i, :ln] - ref[i, :ln]).mean() / scale
        assert rel < 0.02, (i, rel)


def test_streamed_layer_kernel_matches_vmem_kernel():
    """streamed=True (attention weights in an HBM scratch, one [T, R]
    column block VMEM-resident at a time) must be BIT-identical to the
    VMEM-resident kernel: same math, only the weights storage differs."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    import sherpa_vietnamese_asr_tpu.models.zipformer as Z
    from sherpa_vietnamese_asr_tpu.ops.encoder_layer import (
        encoder_layer_pallas,
    )

    cfg = _tiny_cfg()
    params = Z.init_zipformer_params(jax.random.PRNGKey(1), cfg)
    layer = params["stacks"][0]["layers"][1]
    rng = np.random.default_rng(3)
    t, tp, b = 300, 384, 2
    lens = np.array([300, 143])
    xp = np.zeros((b, tp, 64), np.float32)
    xp[:, :t] = rng.standard_normal((b, t, 64)).astype(np.float32)
    rev = jnp.asarray(Z._padded_rev_pos_emb(t, tp, cfg.pos_dim))
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(encoder_layer_pallas(
            layer, jnp.asarray(xp), rev, jnp.asarray(lens, jnp.int32),
            2, cfg))
        got = np.asarray(encoder_layer_pallas(
            layer, jnp.asarray(xp), rev, jnp.asarray(lens, jnp.int32),
            2, cfg, streamed=True))
    assert np.array_equal(base, got), np.abs(base - got).max()

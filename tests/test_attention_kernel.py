# Pallas attention-weights kernel vs the XLA reference path.
import numpy as np
import pytest


def _setup(t, lens_list):
    import jax
    import jax.numpy as jnp

    import sherpa_vietnamese_asr_tpu.models.zipformer as Z

    cfg = Z.ZipformerConfig(
        num_encoder_layers=(1,), downsampling_factor=(1,),
        encoder_dim=(64,), ffn_dim=(96,), num_heads=(2,),
        cnn_module_kernel=(15,), query_head_dim=16, pos_head_dim=4,
        value_head_dim=8, pos_dim=16, pos_dtype="float32")
    params = Z.init_zipformer_params(jax.random.PRNGKey(0), cfg)
    layer = params["stacks"][0]["layers"][0]
    rng = np.random.default_rng(0)
    b = len(lens_list)
    x = jnp.asarray(rng.standard_normal((b, t, 64)).astype(np.float32))
    lens = np.array(lens_list)
    mask = jnp.asarray(np.arange(t)[None, :] >= lens[:, None])
    pos_emb = jnp.asarray(Z.compact_rel_pos_emb(t, cfg.pos_dim))
    return Z, cfg, layer, x, lens, mask, pos_emb


@pytest.mark.parametrize("t,lens_list,row_block",
                         [(200, [200, 150], None), (130, [97], None),
                          # non-default query block (SVT_ATTN_ROW_BLOCK):
                          # fewer/fatter grid steps for long-T stacks
                          (300, [300, 260], 256)])
def test_pallas_attention_matches_xla(t, lens_list, row_block, monkeypatch):
    if row_block:
        monkeypatch.setenv("SVT_ATTN_ROW_BLOCK", str(row_block))
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from sherpa_vietnamese_asr_tpu.ops.attention import (
        attention_weights_pallas,
    )

    Z, cfg, layer, x, lens, mask, pos_emb = _setup(t, lens_list)
    heads = 2
    ref = np.asarray(Z._attention_weights(layer, x, pos_emb, mask, heads,
                                          cfg))
    proj = Z.linear(layer["attn_in_proj"], x)
    qd, pd = cfg.query_head_dim, cfg.pos_head_dim
    b = x.shape[0]
    q = proj[..., : heads * qd].reshape(b, t, heads, qd)
    k = proj[..., heads * qd: 2 * heads * qd].reshape(b, t, heads, qd)
    pq = proj[..., 2 * heads * qd:].reshape(b, t, heads, pd)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(attention_weights_pallas(
            q, k, pq, layer["attn_pos_proj"]["weight"], pos_emb, mask, cfg))
    assert got.shape == ref.shape
    valid = np.zeros_like(ref, bool)
    for i, ln in enumerate(lens):
        valid[i, :, :ln, :ln] = True
    # bf16 attention-weight quantization bounds the error
    assert np.abs(got - ref)[valid].max() < 2e-2
    # key axis (now -2: keys-major layout) sums to ~1 on valid queries
    sums = got.sum(-2)
    for i, ln in enumerate(lens):
        np.testing.assert_allclose(sums[i, :, :ln], 1.0, atol=2e-2)

# Scratch: on-chip value check for ops/encoder_layer.py megakernel.
# Usage: python /root/repo/_enclayer_hw.py hw   (axon TPU, saves npz)
#        SVT_DISABLE_COMPILE_CACHE=1 python /root/repo/_enclayer_hw.py ref
import os as _os, sys as _sys  # repo root on sys.path (scripts live in benchmarks/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import numpy as np

mode = sys.argv[1]
if mode == "ref":
    import jax
    jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax
import jax.numpy as jnp

import sherpa_vietnamese_asr_tpu.models.zipformer as Z

cfg = dataclasses.replace(
    Z.ZIPFORMER_30M, compute_dtype="bfloat16")
d = cfg.encoder_dim[1]
heads = cfg.num_heads[1]
params = Z.init_zipformer_params(jax.random.PRNGKey(0), cfg)
layer = params["stacks"][1]["layers"][0]

rng = np.random.default_rng(7)
b, t, tp = 8, 411, 512
lens = np.asarray([411, 260, 97, 411, 3, 186, 337, 64], np.int32)
x = rng.standard_normal((b, t, d)).astype(np.float32)

if mode == "hw":
    from sherpa_vietnamese_asr_tpu.ops.encoder_layer import (
        encoder_layer_pallas,
    )
    xp = np.zeros((b, tp, d), np.float32)
    xp[:, :t] = x
    rev = jnp.asarray(Z._padded_rev_pos_emb(t, tp, cfg.pos_dim))
    out = np.asarray(encoder_layer_pallas(
        layer, jnp.asarray(xp), rev, jnp.asarray(lens), heads, cfg))[:, :t]
    np.savez("/tmp/enclayer_hw.npz", out=out)
    print("hw out saved", out.shape, float(np.abs(out).mean()))
else:
    mask = jnp.asarray(np.arange(t)[None, :] >= lens[:, None])
    pos_emb = jnp.asarray(Z.compact_rel_pos_emb(t, cfg.pos_dim))
    ref = np.asarray(Z.encoder_layer(
        layer, jnp.asarray(x), pos_emb, mask, heads, cfg))
    got = np.load("/tmp/enclayer_hw.npz")["out"]
    scale = np.abs(ref).mean()
    worst_rel = 0.0
    for i, ln in enumerate(lens):
        rel = np.abs(got[i, :ln] - ref[i, :ln]).mean() / scale
        worst_rel = max(worst_rel, rel)
        print(f"row {i} len {ln}: mean rel {rel:.5f}")
    assert worst_rel < 0.02, worst_rel
    print("enclayer hw parity OK, worst mean-rel", worst_rel)

# Scratch: per-stack encoder-layer timing, XLA path vs megakernel.
# Usage: python _encstack.py <stack_idx> [xla|mk|mks]   (mks = streamed)
import os as _os, sys as _sys  # repo root on sys.path (scripts live in benchmarks/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import sherpa_vietnamese_asr_tpu.models.zipformer as Z

si = int(sys.argv[1])
path = sys.argv[2]
cfg = dataclasses.replace(Z.ZIPFORMER_30M, compute_dtype="bfloat16")
params = Z.init_zipformer_params(jax.random.PRNGKey(0), cfg)
layer = params["stacks"][si]["layers"][0]
d = cfg.encoder_dim[si]
heads = cfg.num_heads[si]
ds = cfg.downsampling_factor[si]
B, T_full = 8, 1646  # post-encoder_embed length for 33 s audio
t = -(-T_full // ds)
tp = -(-t // 128) * 128
lens = jnp.full((B,), t, jnp.int32)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, t, d)).astype(np.float32))

N = 20
if path in ("mk", "mks"):
    from sherpa_vietnamese_asr_tpu.ops.encoder_layer import encoder_layer_pallas
    rev = jnp.asarray(Z._padded_rev_pos_emb(t, tp, cfg.pos_dim))
    xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    streamed = path == "mks"

    @jax.jit
    def run(xp):
        def body(i, carry):
            return encoder_layer_pallas(layer, carry * (1.0 + 1e-6 * i), rev,
                                        lens, heads, cfg, streamed=streamed)
        return jax.lax.fori_loop(0, N, body, xp).mean()
    arg = xp
else:
    pos_emb = jnp.asarray(Z.compact_rel_pos_emb(t, cfg.pos_dim))
    mask = jnp.zeros((B, t), bool)

    @jax.jit
    def run(x):
        def body(i, carry):
            return Z.encoder_layer(layer, carry * (1.0 + 1e-6 * i), pos_emb,
                                   mask, heads, cfg)
        return jax.lax.fori_loop(0, N, body, x).mean()
    arg = x

t0 = time.perf_counter()
np.asarray(run(arg))
print(f"compile+first: {time.perf_counter() - t0:.1f}s")
best = 1e9
for it in range(3):
    t0 = time.perf_counter()
    np.asarray(run(arg * (1.0 + 1e-5 * it)))
    best = min(best, time.perf_counter() - t0)
per = (best - 0.031) / N * 1e3
print(f"stack{si} {path}: {per:.3f} ms/layer (T={t}, tp={tp}, d={d}, H={heads})")

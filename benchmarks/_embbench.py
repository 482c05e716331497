# Scratch: encoder_embed-only amortized timing on chip.
import os as _os, sys as _sys  # repo root on sys.path (scripts live in benchmarks/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import sherpa_vietnamese_asr_tpu.models.zipformer as Z

mode = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
cfg = dataclasses.replace(Z.ZIPFORMER_30M, compute_dtype=mode)
params = Z.init_zipformer_params(jax.random.PRNGKey(0), cfg)

B, T = 8, 3300
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32))
lens = jnp.full((B,), T, jnp.int32)
N = 50


@jax.jit
def loop(x):
    def body(i, acc):
        out = Z.encoder_embed(params["encoder_embed"],
                              x + i.astype(jnp.float32) * 1e-6,
                              (lens - 7) // 2, cfg)
        return acc + out.mean()
    return jax.lax.fori_loop(0, N, body, 0.0)


t0 = time.perf_counter()
np.asarray(loop(x))
print(f"compile+first: {time.perf_counter()-t0:.1f}s")
best = 1e9
for it in range(3):
    t0 = time.perf_counter()
    np.asarray(loop(x * (1.0 + 1e-5 * it)))
    best = min(best, time.perf_counter() - t0)
print(f"mode={mode}: encoder_embed {(best-0.031)/N*1e3:.2f} ms per {B}x{T/100:.0f}s batch")

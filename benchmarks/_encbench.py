# Scratch: amortized encoder timing on chip (round-2 methodology:
# N reps in one fori_loop, input perturbed per iteration, minus 31 ms).
import os as _os, sys as _sys  # repo root on sys.path (scripts live in benchmarks/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sherpa_vietnamese_asr_tpu.models.zipformer import (
    ZIPFORMER_30M, init_zipformer_params, zipformer_encoder,
)

mode = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
lk = sys.argv[2] if len(sys.argv) > 2 else "auto"
import dataclasses
import os
base = ZIPFORMER_30M
if os.environ.get("SVT_ENC_68M"):
    from sherpa_vietnamese_asr_tpu.models.zipformer import ZIPFORMER_68M
    base = ZIPFORMER_68M
cfg = dataclasses.replace(base, compute_dtype=mode, layer_kernel=lk)
params = init_zipformer_params(jax.random.PRNGKey(0), cfg)

B, T = 8, 3300  # 33 s fbank frames
x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, 80)),
                jnp.float32)
lens = jnp.full((B,), T, jnp.int32)

N = 50


@jax.jit
def loop(x):
    def body(i, acc):
        out, _ = zipformer_encoder(params, x + i.astype(jnp.float32) * 1e-6,
                                   lens, cfg)
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
print(f"mode={mode} lk={lk}: encoder {(best - 0.031) / N * 1e3:.2f} ms per {B}x{T/100:.0f}s batch")

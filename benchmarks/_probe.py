# Scratch: probe TPU tunnel health, retrying until it responds.
import os as _os, sys as _sys  # repo root on sys.path (scripts live in benchmarks/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp

t0 = time.time()
print("importing done, listing devices...", flush=True)
d = jax.devices()
print(f"devices after {time.time()-t0:.1f}s: {d}", flush=True)
x = jnp.ones((256, 256))
y = float((x @ x).sum())
print(f"matmul ok after {time.time()-t0:.1f}s: {y}", flush=True)

# Scratch: encoder_embed stage-by-stage amortized timing on chip.
# Usage: python _embparts.py <n_stages 1..6>
import os as _os, sys as _sys  # repo root on sys.path (scripts live in benchmarks/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import sherpa_vietnamese_asr_tpu.models.zipformer as Z

n_stages = int(sys.argv[1])
cfg = dataclasses.replace(Z.ZIPFORMER_30M, compute_dtype="bfloat16")
params = Z.init_zipformer_params(jax.random.PRNGKey(0), cfg)["encoder_embed"]
dt = jnp.bfloat16

B, T, F = 8, 3300, 80
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
out_lens = jnp.full((B,), (T - 7) // 2, jnp.int32)
N = 50


def stages(x):
    b, t, f = x.shape
    c1 = params["conv1"]["weight"].shape[-1]
    k1 = params["conv1"]["weight"].astype(dt)[:, :, 0, :]
    band = jnp.asarray(Z._banded_freq_matrix(f), dt)
    w1 = jnp.einsum("xyd,jdc->jxyc", band, k1).reshape(3 * f, f * c1)
    taps = jnp.concatenate(
        [x[:, 0:t - 2], x[:, 1:t - 1], x[:, 2:t]], axis=-1).astype(dt)
    h = (taps @ w1).reshape(b, t - 2, f, c1)
    h = Z.swoosh_r(h + params["conv1"]["bias"].astype(dt))
    if n_stages == 1:
        return h
    h = jax.lax.conv_general_dilated(
        h, params["conv2"]["weight"].astype(dt), (2, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = Z.swoosh_r(h + params["conv2"]["bias"].astype(dt))
    if n_stages == 2:
        return h
    h = jax.lax.conv_general_dilated(
        h, params["conv3"]["weight"].astype(dt), (1, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = Z.swoosh_r(h + params["conv3"]["bias"].astype(dt))
    if n_stages == 3:
        return h
    t_mask = jnp.arange(h.shape[1])[None, :] < out_lens[:, None]
    h = jnp.where(t_mask[:, :, None, None], h, 0.0)
    c3 = h.shape[-1]
    dw = params["convnext_dw"]["weight"].astype(dt)
    g = jax.lax.conv_general_dilated(
        h, dw, (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c3)
    g = g + params["convnext_dw"]["bias"].astype(dt)
    if n_stages == 4:
        return h + g.astype(h.dtype)
    g = Z.linear(jax.tree.map(lambda a: a.astype(dt), params["convnext_pw1"]), g)
    g = Z.swoosh_l(g)
    g = Z.linear(jax.tree.map(lambda a: a.astype(dt), params["convnext_pw2"]), g)
    h = h + g
    if n_stages == 5:
        return h
    bt = h.shape[1]
    h = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, bt, -1)
    h = Z.linear(jax.tree.map(lambda a: a.astype(dt), params["out"]), h)
    return Z.bias_norm(params["out_norm"], h.astype(jnp.float32))


@jax.jit
def loop(x):
    def body(i, acc):
        return acc + stages(x + i.astype(jnp.float32) * 1e-6).mean().astype(
            jnp.float32)
    return jax.lax.fori_loop(0, N, body, 0.0)


t0 = time.perf_counter()
np.asarray(loop(x0))
print(f"compile+first: {time.perf_counter()-t0:.1f}s")
best = 1e9
for it in range(3):
    t0 = time.perf_counter()
    np.asarray(loop(x0 * (1.0 + 1e-5 * it)))
    best = min(best, time.perf_counter() - t0)
print(f"stages<= {n_stages}: {(best-0.031)/N*1e3:.2f} ms")

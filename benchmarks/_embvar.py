# Scratch: ConvNeXt-tail variants for encoder_embed — correctness on CPU,
# amortized timing on chip.
#   python _embvar.py check          (CPU: variants == current, exact)
#   python _embvar.py time <v> [N]   (TPU: amortized ms per 8x33 s batch)
# Variants: 0 = current (NHWC dw conv + 4-D MLP)
#           1 = 2-D reshaped MLP (dw conv unchanged)
#           2 = dw as 49 shifted adds on [B,T,F*C] + 2-D MLP
import os as _os, sys as _sys  # repo root on sys.path (scripts live in benchmarks/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import dataclasses
import sys
import time

import numpy as np

mode = sys.argv[1]
if mode == "check":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

import sherpa_vietnamese_asr_tpu.models.zipformer as Z

cfg = dataclasses.replace(
    Z.ZIPFORMER_30M,
    compute_dtype="float32" if mode == "check" else "bfloat16")
dt = jnp.dtype(cfg.compute_dtype)
params = Z.init_zipformer_params(jax.random.PRNGKey(0), cfg)["encoder_embed"]


def tail_current(h, out_lens):
    """h: [B, T3, F3, C3] post-conv3+swoosh. Mirrors encoder_embed's tail."""
    b = h.shape[0]
    t_mask = jnp.arange(h.shape[1])[None, :] < out_lens[:, None]
    h = jnp.where(t_mask[:, :, None, None], h, 0.0)
    c3 = h.shape[-1]
    dw = params["convnext_dw"]["weight"].astype(dt)
    g = jax.lax.conv_general_dilated(
        h, dw, (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c3)
    g = g + params["convnext_dw"]["bias"].astype(dt)
    g = Z.linear(jax.tree.map(lambda a: a.astype(dt),
                              params["convnext_pw1"]), g)
    g = Z.swoosh_l(g)
    g = Z.linear(jax.tree.map(lambda a: a.astype(dt),
                              params["convnext_pw2"]), g)
    h = h + g
    bt = h.shape[1]
    h = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, bt, -1)
    h = Z.linear(jax.tree.map(lambda a: a.astype(dt), params["out"]), h)
    return Z.bias_norm(params["out_norm"], h.astype(jnp.float32))


def tail_mlp2d(h, out_lens):
    b = h.shape[0]
    t_mask = jnp.arange(h.shape[1])[None, :] < out_lens[:, None]
    h = jnp.where(t_mask[:, :, None, None], h, 0.0)
    c3 = h.shape[-1]
    dw = params["convnext_dw"]["weight"].astype(dt)
    g = jax.lax.conv_general_dilated(
        h, dw, (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c3)
    g = (g + params["convnext_dw"]["bias"].astype(dt)).reshape(-1, c3)
    w1 = params["convnext_pw1"]["weight"].astype(dt)
    b1 = params["convnext_pw1"]["bias"].astype(dt)
    w2 = params["convnext_pw2"]["weight"].astype(dt)
    b2 = params["convnext_pw2"]["bias"].astype(dt)
    g = Z.swoosh_l(g @ w1 + b1)
    g = g @ w2 + b2
    h = h + g.reshape(h.shape)
    bt = h.shape[1]
    h = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, bt, -1)
    h = Z.linear(jax.tree.map(lambda a: a.astype(dt), params["out"]), h)
    return Z.bias_norm(params["out_norm"], h.astype(jnp.float32))


def tail_shift(h, out_lens):
    """dw 7x7 as 49 statically-shifted multiply-adds on [B, T, F*C]."""
    b, t3, f3, c3 = h.shape
    t_mask = jnp.arange(t3)[None, :] < out_lens[:, None]
    h = jnp.where(t_mask[:, :, None, None], h, 0.0)
    dwk = params["convnext_dw"]["weight"].astype(dt)[:, :, 0, :]  # [7,7,C]
    hp = jnp.pad(h, ((0, 0), (3, 3), (3, 3), (0, 0)))
    g = None
    for ti in range(7):
        for fi in range(7):
            seg = jax.lax.slice(
                hp, (0, ti, fi, 0), (b, ti + t3, fi + f3, c3))
            term = seg * dwk[ti, fi]
            g = term if g is None else g + term
    g = (g + params["convnext_dw"]["bias"].astype(dt)).reshape(-1, c3)
    w1 = params["convnext_pw1"]["weight"].astype(dt)
    b1 = params["convnext_pw1"]["bias"].astype(dt)
    w2 = params["convnext_pw2"]["weight"].astype(dt)
    b2 = params["convnext_pw2"]["bias"].astype(dt)
    g = Z.swoosh_l(g @ w1 + b1)
    g = g @ w2 + b2
    h = h + g.reshape(h.shape)
    h = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, t3, -1)
    h = Z.linear(jax.tree.map(lambda a: a.astype(dt), params["out"]), h)
    return Z.bias_norm(params["out_norm"], h.astype(jnp.float32))


TAILS = [tail_current, tail_mlp2d, tail_shift]

if mode == "check":
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((2, 37, 19, 128)).astype(np.float32))
    lens = jnp.asarray([37, 21], jnp.int32)
    ref = np.asarray(tail_current(h, lens))
    for i, fn in enumerate(TAILS[1:], 1):
        got = np.asarray(fn(h, lens))
        err = float(np.abs(got - ref).max())
        print(f"variant {i} max_abs vs current: {err:.2e}")
        assert err < 1e-4, f"variant {i} diverges"
    print("check OK")
else:
    v = int(sys.argv[2])
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    fn = TAILS[v]
    rng = np.random.default_rng(0)
    B, T3, F3, C3 = 8, 1646, 19, 128
    h0 = jnp.asarray(
        (rng.standard_normal((B, T3, F3, C3)) * 0.3).astype(np.float32)).astype(dt)
    lens = jnp.full((B,), T3, jnp.int32)

    @jax.jit
    def loop(h):
        def body(i, acc):
            out = fn(h * (1.0 + 1e-6 * i), lens)
            return acc + out.mean()
        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    print("compiling...", flush=True)
    t0 = time.perf_counter()
    float(loop(h0))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(h0))
        best = min(best, time.perf_counter() - t0)
    print(f"variant {v}: {(best - 0.031) / N * 1e3:.3f} ms per 8x33s batch")

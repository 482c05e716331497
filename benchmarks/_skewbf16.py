# Round-4 stack0 attempt: roll the rel-pos band in bf16 inside the
# attention-weights kernel. The log2(R)=7 conditional sublane rolls of the
# [T+R, 128] band are the kernel's dominant cost (PERFORMANCE.md), and the
# kernel's content/band dots already run DEFAULT precision (bf16 passes),
# so a bf16 band stays in the kernel's precision class while halving the
# rolled bytes. Measures XLA-path layer cost is NOT needed — this compares
# the two kernel variants head-to-head at each stack shape + checks
# numeric drift vs the f32-roll kernel.
# Usage: python benchmarks/_skewbf16.py [stack0|all]
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sherpa_vietnamese_asr_tpu.ops.attention import (
    ROW_BLOCK,
    _attn_weights_pallas,
)

N = 30
FLOOR = 0.031


def _attn_kernel_t_bf16band(lens_ref, q_ref, k_ref, p_ref, poslin_ref,
                            out_ref, *, t_pad, heads, neg):
    # Identical to ops/attention.py _attn_kernel_t except the band is cast
    # to bf16 BEFORE the skew rolls (halves the dominant VMEM traffic).
    bh = pl.program_id(0)
    i = pl.program_id(1)
    b = bh // heads

    q = q_ref[0]
    k = k_ref[0]
    p = p_ref[0]
    scores = jax.lax.dot_general(
        k, q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)

    r = ROW_BLOCK
    start = t_pad - r - i * r
    pos_sub = poslin_ref[0, pl.ds(start, t_pad + r - 1), :]
    band = jax.lax.dot_general(
        pos_sub, p, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    band = jnp.pad(band, ((0, 1), (0, 0))).astype(jnp.bfloat16)
    width = t_pad + r
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (width, r), 1)
    shifts = (r - 1) - lane_ids
    acc = band
    k_bit = 1
    while k_bit < r:
        rolled = pltpu.roll(acc, width - k_bit, axis=0)
        acc = jnp.where((shifts & k_bit) != 0, rolled, acc)
        k_bit <<= 1
    pos_scores = acc[:t_pad, :].astype(jnp.float32)

    scores = scores + pos_scores
    valid = jax.lax.broadcasted_iota(jnp.int32, (t_pad, r), 0) < lens_ref[b]
    scores = jnp.where(valid, scores, neg)
    m = jnp.max(scores, axis=0, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=0, keepdims=True)
    out_ref[0] = (e / s).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads",))
def attn_weights_bf16band(q, k, p, pos_lin, lens, heads):
    bh, t_pad, qd = q.shape
    pd = p.shape[-1]
    grid = (bh, t_pad // ROW_BLOCK)
    kernel = functools.partial(_attn_kernel_t_bf16band, t_pad=t_pad,
                               heads=heads, neg=-1e9)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ROW_BLOCK, qd), lambda bhi, i: (bhi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, qd), lambda bhi, i: (bhi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_BLOCK, pd), lambda bhi, i: (bhi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * t_pad - 1 + ROW_BLOCK, pd),
                         lambda bhi, i: (bhi % heads, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_pad, ROW_BLOCK),
                               lambda bhi, i: (bhi, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, t_pad), jnp.bfloat16),
    )(lens.astype(jnp.int32), q, k, p, pos_lin)


def bench_fn(fn, q, k, p, pos, lens, heads):
    @jax.jit
    def loop(q, k, p, pos, lens):
        def body(i, acc):
            qq = q * (1.0 + 1e-6 * i.astype(jnp.float32))
            w = fn(qq, k, p, pos, lens, heads)
            return acc + w[0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, N, body, 0.0)

    np.asarray(loop(q, k, p, pos, lens))  # compile
    t0 = time.perf_counter()
    np.asarray(loop(q, k, p, pos, lens))
    dt = time.perf_counter() - t0
    return (dt - FLOOR) / N * 1000  # ms per call


STACKS = {  # (t_pad, d, heads, qd, pd) per 8x33s batch
    "stack0": (1664, 192, 4, 32, 4),
    "stack1": (896, 256, 4, 32, 4),
    "stack2": (512, 256, 4, 32, 4),
}

which = sys.argv[1] if len(sys.argv) > 1 else "all"
names = [which] if which in STACKS else list(STACKS)
B = 8
rng = np.random.default_rng(0)
for name in names:
    t_pad, d, heads, qd, pd = STACKS[name]
    bh = B * heads
    q = jnp.asarray(rng.standard_normal((bh, t_pad, qd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bh, t_pad, qd)).astype(np.float32))
    p = jnp.asarray(rng.standard_normal((bh, t_pad, pd)).astype(np.float32))
    pos = jnp.asarray(rng.standard_normal(
        (heads, 2 * t_pad - 1 + ROW_BLOCK, pd)).astype(np.float32))
    lens = jnp.asarray(
        rng.integers(t_pad // 2, t_pad + 1, size=B).astype(np.int32))

    w_ref = np.asarray(_attn_weights_pallas(q, k, p, pos, lens, heads),
                       np.float32)
    w_new = np.asarray(attn_weights_bf16band(q, k, p, pos, lens, heads),
                       np.float32)
    # drift: weights are softmax outputs in bf16 either way
    diff = np.abs(w_ref - w_new)
    ms_ref = bench_fn(_attn_weights_pallas, q, k, p, pos, lens, heads)
    ms_new = bench_fn(attn_weights_bf16band, q, k, p, pos, lens, heads)
    print(f"{name}: t={t_pad} f32-roll {ms_ref:.3f} ms  bf16-roll "
          f"{ms_new:.3f} ms  ({ms_ref / ms_new:.2f}x)  "
          f"max|dw|={diff.max():.2e} mean={diff.mean():.2e}")

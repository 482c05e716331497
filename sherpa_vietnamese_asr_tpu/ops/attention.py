# Fused Zipformer attention-weights Pallas kernel (transposed layout).
#
# Computes softmax(q k^T + rel_pos) for one (batch*head, query-block) per
# grid step, entirely in VMEM, in KEYS-MAJOR orientation w[s, t]:
#   * content scores on the MXU (k @ q_block^T);
#   * relative-position scores as a BANDED matmul against a row-reversed
#     position table plus an in-kernel skew realignment. In the transposed
#     layout the per-query shift runs along SUBLANES, so the log2(R)
#     conditional rolls are pure addressing (sliced copies) instead of
#     VPU lane shuffles — measured 0.6 us vs 9.8 us per block on v5e
#     (the lane-roll skew was 61% of an encoder layer's time);
#   * key-padding mask + numerically-stable softmax over sublanes in fp32;
#   * output attention weights in bf16 (largest consumer traffic halved).
#
# This is the encoder's hot op (reference equivalent: the ORT encoder's
# attention inside encoder-*.onnx). The XLA path in models/zipformer.py
# remains as the CPU/parity fallback and as the numeric oracle in tests.
# BOTH paths return [B, H, S, T] (keys-major); the consumers contract the
# leading key axis directly (dot_general handles the transposition on MXU
# at no cost).

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 128


def _attn_kernel_t(lens_ref, q_ref, k_ref, p_ref, poslin_ref, out_ref,
                   *, t_pad, heads, neg, r):
    bh = pl.program_id(0)
    i = pl.program_id(1)
    b = bh // heads

    q = q_ref[0]            # [R, qd] query block
    k = k_ref[0]            # [T, qd] all keys
    p = p_ref[0]            # [R, pd]
    # Precision pinned explicitly: Mosaic cannot lower the HIGH precision
    # a caller's jax.default_matmul_precision context would inject (the
    # fp32-fast serving mode wraps the XLA encoder in one).
    scores = jax.lax.dot_general(
        k, q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)  # [T, R]  (= (q k^T)^T)

    # Banded position scores, transposed: band_t[j, t'] = p[t'] . pos_sub[j]
    # with rows j = s + (T-1) - t of the REVERSED pos table, t = i*R + t'.
    # Skewed band column t' needs row offset s + (R-1) - t'.
    start = t_pad - r - i * r
    pos_sub = poslin_ref[0, pl.ds(start, t_pad + r - 1), :]  # [T+R-1, pd]
    band = jax.lax.dot_general(
        pos_sub, p, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)  # [T+R-1, R]
    # skew: out[s, t'] = band[s + (R-1-t'), t']. Column t' needs an UP-roll
    # of (R-1-t'); decompose into binary bits of static sublane rolls (each
    # is addressing-only — no lane shuffles). Conditions use a full-shape
    # iota: arithmetic-broadcast int compares miscompile on Mosaic.
    band = jnp.pad(band, ((0, 1), (0, 0)))          # [T+R, R]
    width = t_pad + r
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (width, r), 1)
    shifts = (r - 1) - lane_ids
    acc = band
    k_bit = 1
    while k_bit < r:
        rolled = pltpu.roll(acc, width - k_bit, axis=0)  # up-roll k_bit
        acc = jnp.where((shifts & k_bit) != 0, rolled, acc)
        k_bit <<= 1
    pos_scores = acc[:t_pad, :]

    scores = scores + pos_scores
    # key padding mask (keys run along sublanes now)
    valid = jax.lax.broadcasted_iota(jnp.int32, (t_pad, r), 0) < lens_ref[b]
    scores = jnp.where(valid, scores, neg)
    m = jnp.max(scores, axis=0, keepdims=True)   # [1, R]
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=0, keepdims=True)
    out_ref[0] = (e / s).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "row_block"))
def _attn_weights_pallas(q, k, p, pos_lin, lens, heads,
                         row_block=ROW_BLOCK):
    """q,k: [BH, T, qd]; p: [BH, T, pd]; pos_lin: [H, 2T-1+R, pd]; lens [B].

    T must be a multiple of row_block (a multiple of 128: the block runs
    along LANES in the output). Returns [BH, T, T] bf16 KEYS-MAJOR:
    out[bh, s, t] = softmax_s(scores[t, s]).

    row_block trades roll traffic for grid steps: each grid step pays a
    fixed dispatch/pipeline overhead, and the skew rolls copy the whole
    [T+R, R] band log2(R) times — bigger R means fewer, fatter steps
    (R=256 at stack0: 7 -> 4 query blocks/bh, 8 rolls of a 2x-wide band).
    """
    bh, t_pad, qd = q.shape
    pd = p.shape[-1]
    r = row_block
    grid = (bh, t_pad // r)
    kernel = functools.partial(_attn_kernel_t, t_pad=t_pad, heads=heads,
                               neg=-1e9, r=r)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lens
            pl.BlockSpec((1, r, qd), lambda bhi, i: (bhi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, qd), lambda bhi, i: (bhi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, pd), lambda bhi, i: (bhi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * t_pad - 1 + r, pd),
                         lambda bhi, i: (bhi % heads, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_pad, r),
                               lambda bhi, i: (bhi, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, t_pad), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * t_pad * t_pad * (qd + pd),
            bytes_accessed=4 * bh * t_pad * (qd * 2 + pd)
            + 2 * bh * t_pad * t_pad,
            transcendentals=bh * t_pad * t_pad,
        ),
    )(lens.astype(jnp.int32), q, k, p, pos_lin)


def attention_weights_pallas(q, k, pq, pos_proj_weight, pos_emb, mask, cfg):
    """Drop-in producer of attention weights for models/zipformer.py.

    Args:
        q, k: [B, T, H, qd] float32; pq: [B, T, H, pd].
        pos_proj_weight: [pos_dim, H*pd]; pos_emb: [2T-1, pos_dim] (natural
            order; reversed internally).
        mask: [B, T] True where PADDED (or None).
        cfg: ZipformerConfig (for head dims).

    Returns [B, H, S, T] KEYS-MAJOR attention weights (bf16 upcast to f32
    by consumers): out[b, h, s, t] is key s's weight for query t.
    """
    b, t, h, qd = q.shape
    pd = pq.shape[-1]
    import os
    r = int(os.environ.get("SVT_ATTN_ROW_BLOCK", "0")) or ROW_BLOCK
    t_pad = -(-t // r) * r

    def to_bht(x, d):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    qf = to_bht(q, qd)
    kf = to_bht(k, qd)
    pf = to_bht(pq, pd)

    # Reversed, zero-extended position table sized for padded T:
    # rows index j = s + (T_pad-1) - t. Build from the natural-order pos_emb
    # of the ORIGINAL T by computing the padded table directly.
    pos_lin = (pos_emb[::-1].astype(jnp.float32)
               @ pos_proj_weight.astype(jnp.float32)).reshape(2 * t - 1, h, pd)
    # pad to 2*t_pad-1 rows: reversed-table row j corresponds to offset
    # o = (T-1) - j in the original; for the padded table rows j' map to
    # o = (t_pad-1) - j'. Place original rows accordingly, zeros elsewhere.
    full = jnp.zeros((2 * t_pad - 1 + r, h, pd), jnp.float32)
    # original offsets o in [-(t-1), t-1] -> padded j' = (t_pad-1) - o
    # original j = (t-1) - o  =>  j' = j + (t_pad - t)
    full = jax.lax.dynamic_update_slice(full, pos_lin, (t_pad - t, 0, 0))
    pos_lin_h = jnp.transpose(full, (1, 0, 2))  # [H, 2Tp-1+R, pd]

    if mask is not None:
        lens = jnp.sum((~mask).astype(jnp.int32), axis=1)
    else:
        lens = jnp.full((b,), t, jnp.int32)

    out = _attn_weights_pallas(qf, kf, pf, pos_lin_h, lens, h, row_block=r)
    out = out.reshape(b, h, t_pad, t_pad)[:, :, :t, :t]
    return out.astype(jnp.float32)

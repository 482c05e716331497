# Whole-layer Zipformer2 encoder megakernel.
#
# One pallas_call runs an ENTIRE encoder layer (attention weights + three
# attention consumers + three feed-forwards + two conv modules + BiasNorm +
# bypasses) for one batch element per grid step, with the full sequence
# resident in VMEM. Motivation (PERFORMANCE.md round-2 measurements): the
# XLA layer ran at 2-3% MXU — ~20 dispatched ops per layer, each paying an
# HBM round trip on a [B,T,D] activation; the whole-layer kernel reads x
# once and writes x once.
#
# Key design points:
#   * Attention weights are computed ONCE per layer (matching the XLA
#     path's sharing across the three consumers — a recompute-per-consumer
#     variant measured 1.5x SLOWER than XLA at stack0) into a bf16 VMEM
#     scratch [H*T_pad, T_pad] in KEYS-MAJOR orientation, where the
#     relative-position skew runs along SUBLANES (static-shift conditional
#     rolls = addressing-only copies, ~16x cheaper than lane shuffles; see
#     ops/attention.py). Each consumer is then a single whole-sequence MXU
#     dot per head. The scratch is what gates which stacks fit in VMEM.
#   * The depthwise conv runs as a K-tap halo loop over a zero-padded
#     VMEM scratch with static sublane slices.
#   * bf16 serving mode: weights shipped to VMEM in bf16, f32 MXU
#     accumulation, intermediate outputs rounded to bf16 to match the XLA
#     bf16 path's linear() semantics; residual stream carried in f32.
#
# Reference hot path this accelerates: /root/reference/core/asr_engine.py:1047
# (the ORT encoder session run per chunk). The XLA path in
# models/zipformer.py remains the CPU fallback and numeric oracle.

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 128  # query block
_N_FLAT = 42  # number of flattened weight operands


def _dot16(a, b, dims):
    """MXU dot, bf16 operands, f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)


def _swoosh_l(x):
    v = x - 4.0
    return jnp.maximum(v, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(v))) \
        - 0.08 * x - 0.035


def _swoosh_r(x):
    v = x - 1.0
    return jnp.maximum(v, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(v))) \
        - 0.08 * x - 0.313261687


def _linear16(x, w_ref, b_ref):
    """bf16 linear matching the XLA path's linear(): bf16 out + bf16 bias."""
    y = _dot16(x, w_ref[...], ((1,), (0,))).astype(jnp.bfloat16)
    return y + b_ref[...]


def _attn_weights_block(i, h, proj_s, poslin_ref, lens_b, *, t_pad, heads,
                        qd, pd):
    """Keys-major softmaxed attention weights for query block i, head h.

    proj_s: [T, H*(2qd+pd)] bf16 scratch holding q|k|pq.
    Returns [T, R] bf16: out[s, t'] = weight of key s for query i*R + t'.
    """
    q_b = proj_s[pl.ds(i * R, R), pl.ds(h * qd, qd)]        # [R, qd]
    k_h = proj_s[:, pl.ds(heads * qd + h * qd, qd)]         # [T, qd]
    p_b = proj_s[pl.ds(i * R, R),
                 pl.ds(2 * heads * qd + h * pd, pd)]        # [R, pd]
    scores = _dot16(k_h, q_b, ((1,), (1,)))                 # [T, R]
    # i is a fori_loop index: assert sublane alignment Mosaic can't infer.
    start = pl.multiple_of(t_pad - R - i * R, R)
    pos_sub = poslin_ref[h, pl.ds(start, t_pad + R - 1), :]  # [T+R-1, pd]
    band = _dot16(pos_sub, p_b, ((1,), (1,)))               # [T+R-1, R]
    # skew: out[s, t'] = band[s + (R-1-t'), t']. Column t' needs an UP-roll
    # of (R-1-t'); decompose into static sublane rolls (addressing-only).
    # Conditions from a full-shape iota: arithmetic-broadcast int compares
    # miscompile on Mosaic.
    band = jnp.pad(band, ((0, 1), (0, 0)))                  # [T+R, R]
    width = t_pad + R
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (width, R), 1)
    shifts = (R - 1) - lane_ids
    k_bit = 1
    while k_bit < R:
        rolled = pltpu.roll(band, width - k_bit, axis=0)
        band = jnp.where((shifts & k_bit) != 0, rolled, band)
        k_bit <<= 1
    scores = scores + band[:t_pad, :]
    valid = jax.lax.broadcasted_iota(jnp.int32, (t_pad, R), 0) < lens_b
    scores = jnp.where(valid, scores, -1e9)
    m = jnp.max(scores, axis=0, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=0, keepdims=True)
    return (e / s).astype(jnp.bfloat16)                     # [T, R]


def _layer_kernel(lens_ref, x_ref, poslin_ref,
                  attn_in_w, attn_in_b,
                  nl_in_w, nl_in_b, nl_out_w, nl_out_b,
                  sa1_in_w, sa1_in_b, sa1_out_w, sa1_out_b,
                  sa2_in_w, sa2_in_b, sa2_out_w, sa2_out_b,
                  ff1_in_w, ff1_in_b, ff1_out_w, ff1_out_b,
                  ff2_in_w, ff2_in_b, ff2_out_w, ff2_out_b,
                  ff3_in_w, ff3_in_b, ff3_out_w, ff3_out_b,
                  c1_in_w, c1_in_b, c1_dw, c1_dwb, c1_out_w, c1_out_b,
                  c2_in_w, c2_in_b, c2_dw, c2_dwb, c2_out_w, c2_out_b,
                  norm_bias, norm_logscale,
                  byp_mid, byp_out,
                  out_ref,
                  *refs, t_pad, heads, qd, pd, vd, hna, ksize, streamed):
    if streamed:
        # w_hbm is an un-blocked ANY-memory-space OUTPUT (Mosaic rejects
        # non-VMEM scratch allocations): 22 MB of HBM reused every grid
        # step, its final contents are discarded by the wrapper. wvm2 is a
        # ping-pong pair of [T, R] VMEM buffers; DMAs are double-buffered
        # so the copy of block k overlaps the compute of block k+1. Every
        # copy moves exactly t_pad*R bf16 bytes, so a wait may be issued
        # through a descriptor with any same-shape src/dst pair (the
        # semaphore counts bytes, not descriptors).
        w_hbm, proj_s, wvm2, o_s, v_s, c_s, sem2 = refs
    else:
        proj_s, w_s, v_s, c_s = refs
    b = pl.program_id(0)
    lens_b = lens_ref[b]
    n_blocks = t_pad // R
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    x = x_ref[0].astype(f32)             # [T, D]
    x_orig = x
    d = x.shape[-1]

    def _wait_slot(slot):
        pltpu.make_async_copy(
            wvm2.at[slot], w_hbm.at[pl.ds(0, t_pad), pl.ds(0, R)],
            sem2.at[slot]).wait()

    # ---- attention projections + shared weights (from PRE-layer x) -----
    proj_s[...] = _linear16(x, attn_in_w, attn_in_b)

    def wblk(i, _):
        for h in range(heads):
            w = _attn_weights_block(i, h, proj_s, poslin_ref, lens_b,
                                    t_pad=t_pad, heads=heads, qd=qd, pd=pd)
            if streamed:
                k = i * heads + h
                slot = jax.lax.rem(k, 2)

                @pl.when(k >= 2)
                def _():
                    _wait_slot(slot)  # drain the previous copy OUT of slot

                wvm2[slot] = w
                pltpu.make_async_copy(
                    wvm2.at[slot],
                    w_hbm.at[pl.ds(h * t_pad, t_pad),
                             pl.ds(pl.multiple_of(i * R, R), R)],
                    sem2.at[slot]).start()
            else:
                w_s[pl.ds(h * t_pad, t_pad),
                    pl.ds(pl.multiple_of(i * R, R), R)] = w
        return 0

    jax.lax.fori_loop(0, n_blocks, wblk, 0)
    if streamed:
        total = n_blocks * heads
        for tail in (max(total - 2, 0), max(total - 1, 0)):
            _wait_slot(tail % 2)

    def attend(h, v16):
        """[T, vd] f32 = w[h]^T-contracted values (keys-major dot)."""
        if streamed:
            width = v16.shape[-1]

            def _start_read(i, slot):
                pltpu.make_async_copy(
                    w_hbm.at[pl.ds(h * t_pad, t_pad),
                             pl.ds(pl.multiple_of(i * R, R), R)],
                    wvm2.at[slot], sem2.at[slot]).start()

            _start_read(0, 0)

            def blk(i, _):
                slot = jax.lax.rem(i, 2)

                @pl.when(i + 1 < n_blocks)
                def _():
                    _start_read(pl.multiple_of(i + 1, 1),
                                jax.lax.rem(i + 1, 2))

                _wait_slot(slot)
                ob = jax.lax.dot_general(
                    wvm2[slot], v16,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)    # [R, width]
                o_s[pl.ds(pl.multiple_of(i * R, R), R),
                    pl.ds(0, width)] = ob
                return 0

            jax.lax.fori_loop(0, n_blocks, blk, 0)
            return o_s[:, pl.ds(0, width)]
        w = w_s[pl.ds(h * t_pad, t_pad), :]                 # [S, T] bf16
        return jax.lax.dot_general(
            w, v16, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)            # [T, vd]

    # ---- ff1 -----------------------------------------------------------
    def ff(in_w, in_b, out_w, out_b, xi):
        h = _linear16(xi, in_w, in_b)
        return _linear16(_swoosh_l(h.astype(f32)), out_w, out_b).astype(f32)

    x = x + ff(ff1_in_w, ff1_in_b, ff1_out_w, ff1_out_b, x)

    # ---- nonlin attention (head 0 weights) ------------------------------
    pj = _linear16(x, nl_in_w, nl_in_b)                     # [T, 3*hna] bf16
    sgate = pj[:, :hna].astype(f32)
    vv = pj[:, hna:2 * hna].astype(f32)
    v_s[:, :hna] = (jnp.tanh(sgate) * vv).astype(bf16)
    ob = attend(0, v_s[:, :hna])
    o = ob.astype(bf16) * pj[:, 2 * hna:]                   # y gate
    x = x + _linear16(o, nl_out_w, nl_out_b).astype(f32)
    del pj, sgate, vv, ob, o

    # ---- self-attn helper ----------------------------------------------
    def self_attn(in_w, in_b, out_w, out_b, xi):
        v_s[:, :heads * vd] = _linear16(xi, in_w, in_b)
        obs = [attend(h, v_s[:, h * vd:(h + 1) * vd]).astype(bf16)
               for h in range(heads)]
        o = jnp.concatenate(obs, axis=1)                    # [T, H*vd]
        return _linear16(o, out_w, out_b).astype(f32)

    x = x + self_attn(sa1_in_w, sa1_in_b, sa1_out_w, sa1_out_b, x)

    # ---- conv module helper --------------------------------------------
    halo = (ksize - 1) // 2

    def conv_mod(in_w, in_b, dw, dwb, out_w, out_b, xi):
        pj = _linear16(xi, in_w, in_b)                      # [T, 2D] bf16
        hg = pj[:, :d].astype(f32) * jax.nn.sigmoid(pj[:, d:].astype(f32))
        rows = jax.lax.broadcasted_iota(jnp.int32, (t_pad, d), 0)
        hg = jnp.where(rows < lens_b, hg, 0.0)
        c_s[:halo, :] = jnp.zeros((halo, d), bf16)
        c_s[halo:halo + t_pad, :] = hg.astype(bf16)
        c_s[halo + t_pad:, :] = jnp.zeros((halo, d), bf16)

        # Static unroll: dynamic sublane slices need 8-aligned starts on
        # Mosaic, tap offsets are arbitrary. ksize is trace-time static.
        acc = jnp.zeros((t_pad, d), f32)
        for k in range(ksize):
            seg = c_s[k:k + t_pad, :]
            wk = dw[k:k + 1, :]                             # [1, D]
            acc = acc + seg.astype(f32) * wk.astype(f32)
        acc = _swoosh_r(acc + dwb[...].astype(f32))
        return _linear16(acc, out_w, out_b).astype(f32)

    x = x + conv_mod(c1_in_w, c1_in_b, c1_dw, c1_dwb, c1_out_w, c1_out_b, x)

    # ---- ff2 + mid bypass ----------------------------------------------
    x = x + ff(ff2_in_w, ff2_in_b, ff2_out_w, ff2_out_b, x)
    s_mid = jnp.clip(byp_mid[...], 0.0, 1.0)
    x = x_orig + (x - x_orig) * s_mid

    # ---- self-attn 2, conv 2, ff3 --------------------------------------
    x = x + self_attn(sa2_in_w, sa2_in_b, sa2_out_w, sa2_out_b, x)
    x = x + conv_mod(c2_in_w, c2_in_b, c2_dw, c2_dwb, c2_out_w, c2_out_b, x)
    x = x + ff(ff3_in_w, ff3_in_b, ff3_out_w, ff3_out_b, x)

    # ---- BiasNorm + final bypass ---------------------------------------
    dlt = x - norm_bias[...]
    rms = jnp.sqrt(jnp.mean(dlt * dlt, axis=-1, keepdims=True) + 1e-12)
    x = x * (jnp.exp(norm_logscale[...]) / rms)
    s_out = jnp.clip(byp_out[...], 0.0, 1.0)
    x = x_orig + (x - x_orig) * s_out

    out_ref[0] = x


def _r2(a, dt=jnp.bfloat16):
    """Bias [n] -> [1, n] (Mosaic rejects rank-1 operands)."""
    return a.reshape(1, -1).astype(dt)


@functools.partial(jax.jit,
                   static_argnames=("heads", "qd", "pd", "vd", "streamed",
                                    "interpret"))
def _layer_pallas(x, lens, poslin, flat, heads, qd, pd, vd, streamed=False,
                  interpret=False):
    """x: [B, T_pad, D] f32 (T_pad % 128 == 0); poslin [H, 2T-1+R, pd] bf16.

    flat: tuple of 2-D weight arrays in _layer_kernel order (bf16 except
    the trailing norm/bypass params). streamed=True keeps the attention
    weights in an HBM scratch (long-sequence stacks).
    """
    bsz, t_pad, d = x.shape
    hna = flat[2].shape[1] // 3          # nl_in_w: [D, 3*hna]
    ksize = flat[28].shape[0]            # c1_dw: [K, D]
    assert len(flat) == _N_FLAT
    kernel = functools.partial(
        _layer_kernel, t_pad=t_pad, heads=heads, qd=qd, pd=pd, vd=vd,
        hna=hna, ksize=ksize, streamed=streamed)
    specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),               # lens
        pl.BlockSpec((1, t_pad, d), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),               # x
        pl.BlockSpec(poslin.shape, lambda b: (0, 0, 0),
                     memory_space=pltpu.VMEM),               # poslin
    ] + [pl.BlockSpec(w.shape, lambda b, n=w.ndim: (0,) * n,
                      memory_space=pltpu.VMEM) for w in flat]
    halo = (ksize - 1) // 2
    proj_cols = heads * (2 * qd + pd)
    vcols = max(2 * hna, heads * vd, 2 * d)
    ff_cols = flat[14].shape[1] + flat[18].shape[1] + flat[22].shape[1]
    out_specs = pl.BlockSpec((1, t_pad, d), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bsz, t_pad, d), jnp.float32)
    if streamed:
        scratch = [
            pltpu.VMEM((t_pad, proj_cols), jnp.bfloat16),    # proj_s
            pltpu.VMEM((2, t_pad, R), jnp.bfloat16),         # wvm2 ping-pong
            pltpu.VMEM((t_pad, max(hna, heads * vd)), jnp.float32),  # o_s
            pltpu.VMEM((t_pad, vcols), jnp.bfloat16),        # v_s
            pltpu.VMEM((t_pad + 2 * halo, d), jnp.bfloat16),  # c_s
            pltpu.SemaphoreType.DMA((2,)),
        ]
        out_specs = (out_specs,
                     pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((heads * t_pad, t_pad),
                                          jnp.bfloat16))
    else:
        scratch = [
            pltpu.VMEM((t_pad, proj_cols), jnp.bfloat16),    # proj_s
            pltpu.VMEM((heads * t_pad, t_pad), jnp.bfloat16),  # w_s
            pltpu.VMEM((t_pad, vcols), jnp.bfloat16),        # v_s
            pltpu.VMEM((t_pad + 2 * halo, d), jnp.bfloat16),  # c_s
        ]
    # Raise the scoped-VMEM ceiling past the 16 MB XLA default when the
    # actual allocation plan needs it (round 4; v5e has 128 MB physical
    # VMEM). This is what unlocks the kernel at stack0 sizes — the
    # [H*T_pad, T_pad] weights scratch alone is 22 MB at t_pad=1664.
    def _nbytes(s):
        try:  # skip non-buffer scratch (DMA semaphores)
            return int(np.prod(s.shape)) * jnp.dtype(s.dtype).itemsize
        except TypeError:
            return 0

    scratch_bytes = sum(_nbytes(s) for s in scratch)
    weight_bytes = 2 * sum(int(np.prod(w.shape)) for w in flat)
    est = int(1.35 * (scratch_bytes + weight_bytes + 8 * t_pad * d * 4))
    out = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(100 * 1024 * 1024,
                                 max(16 * 1024 * 1024, est))),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * t_pad
            * (d * (proj_cols + 8 * heads * vd + 6 * hna + 6 * d
                    + 2 * ff_cols)
               + t_pad * (heads * (qd + pd) + (2 * heads + 1) * vd)),
            bytes_accessed=4 * bsz * t_pad * d * 2
            + 2 * sum(int(np.prod(w.shape)) for w in flat),
            transcendentals=bsz * heads * t_pad * t_pad,
        ),
    )(lens.astype(jnp.int32), x, poslin, *flat)
    return out[0] if streamed else out


def _flatten_layer_params(p):
    """Layer param dict -> ordered tuple of 2-D arrays (bf16 weights;
    f32 norm/bypass tail)."""
    b16 = jnp.bfloat16

    def w(a):
        return a.astype(b16)

    c1, c2 = p["conv1"], p["conv2"]
    return (
        w(p["attn_in_proj"]["weight"]), _r2(p["attn_in_proj"]["bias"]),
        w(p["nonlin_attn"]["in_proj"]["weight"]),
        _r2(p["nonlin_attn"]["in_proj"]["bias"]),
        w(p["nonlin_attn"]["out_proj"]["weight"]),
        _r2(p["nonlin_attn"]["out_proj"]["bias"]),
        w(p["self_attn1"]["in_proj"]["weight"]),
        _r2(p["self_attn1"]["in_proj"]["bias"]),
        w(p["self_attn1"]["out_proj"]["weight"]),
        _r2(p["self_attn1"]["out_proj"]["bias"]),
        w(p["self_attn2"]["in_proj"]["weight"]),
        _r2(p["self_attn2"]["in_proj"]["bias"]),
        w(p["self_attn2"]["out_proj"]["weight"]),
        _r2(p["self_attn2"]["out_proj"]["bias"]),
        w(p["ff1"]["in"]["weight"]), _r2(p["ff1"]["in"]["bias"]),
        w(p["ff1"]["out"]["weight"]), _r2(p["ff1"]["out"]["bias"]),
        w(p["ff2"]["in"]["weight"]), _r2(p["ff2"]["in"]["bias"]),
        w(p["ff2"]["out"]["weight"]), _r2(p["ff2"]["out"]["bias"]),
        w(p["ff3"]["in"]["weight"]), _r2(p["ff3"]["in"]["bias"]),
        w(p["ff3"]["out"]["weight"]), _r2(p["ff3"]["out"]["bias"]),
        w(c1["in_proj"]["weight"]), _r2(c1["in_proj"]["bias"]),
        w(c1["dw_weight"]), _r2(c1["dw_bias"]),
        w(c1["out_proj"]["weight"]), _r2(c1["out_proj"]["bias"]),
        w(c2["in_proj"]["weight"]), _r2(c2["in_proj"]["bias"]),
        w(c2["dw_weight"]), _r2(c2["dw_bias"]),
        w(c2["out_proj"]["weight"]), _r2(c2["out_proj"]["bias"]),
        _r2(p["norm"]["bias"], jnp.float32),
        p["norm"]["log_scale"].reshape(1, 1).astype(jnp.float32),
        _r2(p["bypass_mid_scale"], jnp.float32),
        _r2(p["bypass_scale"], jnp.float32),
    )


def layer_kernel_vmem_bytes(t_pad, d, heads, ff_dims, ksize, cfg):
    """Rough VMEM footprint estimate (weights + scratch + io blocks).

    Dominated by the shared attention-weights scratch [H*T_pad, T_pad]
    bf16, which is what gates the kernel off for long-sequence stacks."""
    qd, pd, vd = cfg.query_head_dim, cfg.pos_head_dim, cfg.value_head_dim
    hna = 3 * d // 4
    proj_cols = heads * (2 * qd + pd)
    nweights = (d * proj_cols + d * 3 * hna + hna * d
                + 2 * (d * heads * vd * 2)
                + 2 * sum(d * f for f in ff_dims)
                + 2 * (d * 2 * d + ksize * d + d * d))
    scratch = (t_pad * (proj_cols + max(2 * hna, heads * vd, 2 * d)) * 2
               + heads * t_pad * t_pad * 2 + (t_pad + ksize) * d * 2)
    io = 3 * t_pad * d * 4
    live = 4 * t_pad * d * 4 + (t_pad + R) * R * 4 * 2
    return 2 * nweights + scratch + io + live


def encoder_layer_pallas(p, x, pos_emb_rev_padded, lens, heads, cfg,
                         streamed=False):
    """Whole-layer megakernel. Drop-in for encoder_layer on padded inputs.

    Args:
        p: layer param dict (init_layer / importer layout).
        x: [B, T_pad, D] float32, T_pad % 128 == 0; rows >= lens finite.
        pos_emb_rev_padded: [2*T_pad-1+R, pos_dim] reversed zero-extended
            position table for T_pad (see zipformer._padded_rev_pos_emb).
        lens: [B] int32 valid frames.
        heads: head count; cfg: ZipformerConfig.
        streamed: attention weights in an HBM scratch (one [T, R] column
            block VMEM-resident at a time) instead of a [H*T, T] VMEM
            scratch — for stacks whose weights tensor exceeds VMEM.

    Returns [B, T_pad, D] float32.
    """
    qd, pd = cfg.query_head_dim, cfg.pos_head_dim
    poslin = (pos_emb_rev_padded.astype(jnp.float32)
              @ p["attn_pos_proj"]["weight"].astype(jnp.float32))
    poslin = poslin.reshape(-1, heads, pd).transpose(1, 0, 2)
    flat = _flatten_layer_params(p)
    return _layer_pallas(x, lens, poslin.astype(jnp.bfloat16), flat,
                         heads, qd, pd, cfg.value_head_dim,
                         streamed=streamed)

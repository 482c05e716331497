# RNN-T modified beam search as ONE Pallas TPU megakernel.
#
# The XLA lax.scan path (ops/beam_search.py) is correct but latency-bound on
# hardware: each of the T frame steps is a serial chain of ~15 small fused
# kernels (joiner matmuls, softmax, top_k, gathers), costing ~37-42 us/frame
# regardless of tensor sizes — per-kernel launch latency, not compute
# (measured on-chip; see PERFORMANCE.md). This kernel runs the WHOLE scan as
# a single pallas_call with grid=(T,): TPU grid steps execute sequentially,
# so the beam state lives in VMEM refs across steps and each frame costs
# only its actual VPU/MXU work.
#
# Behavioral contract: token-identical to ops/beam_search.beam_search_batch
# (itself oracle-tested against the reference algorithm,
# core/asr_engine.py:1023-1206). Design notes:
#   * decoder context is carried as the EMBEDDING pair (e0, e1) of the last
#     two tokens, so the stateless decoder's grouped conv becomes two dense
#     [D, D] matmuls (block-diagonal weights built at trace time);
#   * the new token's embedding row is fetched with a one-hot MXU matmul at
#     HIGHEST precision (exact row copy) — vector gathers from VMEM are not
#     a Mosaic primitive;
#   * top-k is 8 passes of (global max, min-flat-index tie-break, mask) —
#     identical ordering to lax.top_k (stable, lower index first);
#   * beam-axis parent gathers are unrolled selects (beam is 8);
#   * hotword boosting (reference core/hotword_context.py:34-189 semantics,
#     applied AFTER top-k like core/asr_engine.py:1127-1131) carries the
#     per-beam Aho-Corasick state in VMEM and fetches the dense
#     delta/next-state tables (ops/hotword.py) with the same exact-f32
#     one-hot MXU trick as the embedding rows: tables stored transposed
#     [V, 2*S_pad] so the per-candidate fetch is one [B*beam, V] x
#     [V, 2*S_pad] matmul (tiny: S_pad <= 512) followed by a state-one-hot
#     row select — no vector gathers needed. Larger automatons fall back to
#     the XLA path (decode_feats_jit gates on table size).

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sherpa_vietnamese_asr_tpu.models.rnnt import RnntConfig
from sherpa_vietnamese_asr_tpu.ops.beam_search import NEG_INF, BeamResult

_INT_BIG = 2 ** 30  # python int: jnp scalars here would be captured consts


def beam_kernel_vmem_bytes(b: int, beam: int, u: int, v: int, d: int,
                           e_dim: int, unroll: int = 1, s_pad: int = 0,
                           with_hw: bool = False) -> int:
    """Estimated scoped-VMEM footprint of the beam megakernel (bytes).

    Residents: 3 bf16 embedding limbs, dense decoder mats, joiner weights,
    (optional) hotword limb tables, packed token array, beam scalars, e0/e1
    scratch, double-buffered streamed blocks. Live temporaries are dominated
    by the [B*beam, V] logits tile (plus bf16 hi/lo copies under fast_dots);
    2.5x that plus a 15% allocator margin matches the compiler's measured
    stack (20.13 MB at b=64/T=824/V=2000 vs 20.4 MB estimated)."""
    resident = (
        3 * v * d * 2                      # embedding limbs (bf16)
        + 2 * d * d * 4                    # w0, w1
        + d * d * 4 + e_dim * d * 4        # wdp, we
        + d * v * 4 + (2 * d + v) * 4      # wo + biases
        + (3 * v * 2 * s_pad * 2 if with_hw else 0)
        + b * beam * ((u + 1) // 2) * 4    # packed tokens
        + 3 * b * beam * 4                 # n_emit, logp, hw_state
        + 2 * b * beam * d * 4             # e0, e1
        + 2 * unroll * b * (e_dim * 4 + beam * 4 * 3 + 4 * beam * 4)
    )
    live = int(2.5 * b * beam * v * 4)
    return int((resident + live) * 1.15)


def _dense_decoder_weights(dec_params, cfg: RnntConfig):
    """Grouped context conv [D, D/G, K] -> K dense [D, D] matrices W_k with
    W_k[j, o] = conv[o, j % ipg, k] iff j and o are in the same group."""
    w = dec_params["conv_weight"]  # [D_out, ipg, K]
    d, ipg, k = w.shape
    opg = d // (d // ipg)  # outputs per group == ipg for icefall decoders
    jj = jnp.arange(d)[:, None]
    oo = jnp.arange(d)[None, :]
    same_group = (jj // ipg) == (oo // opg)
    mats = []
    for kk in range(k):
        dense = w[oo, jj % ipg, kk]  # [D, D] gather (trace-time, on host ok)
        mats.append(jnp.where(same_group, dense, 0.0).astype(jnp.float32))
    return mats


def _metrics_const(v: int):
    import math

    alpha = 1.0 / 3.0
    max_entropy = math.log(v) if v > 1 else 1.0
    tsallis_max = (1.0 / (alpha - 1.0)) * (1.0 - v ** (1.0 - alpha)) \
        if v > 1 else 1.0
    return alpha, max_entropy, tsallis_max


def _beam_kernel(lens_ref, enc_ref, emb_hi_ref, emb_mid_ref,
                 emb_lo_ref, w0_ref, w1_ref,
                 wdp_ref, bdp_ref, we_ref, be_ref, wo_ref, bo_ref,
                 *rest,
                 b: int, beam: int, u: int, v: int, blank_id: int,
                 unk_id: int, fast_dots: bool, with_hw: bool, s_pad: int,
                 unroll: int):
    if with_hw:
        (tbl_hi_ref, tbl_mid_ref, tbl_lo_ref,
         tokens_ref, n_emit_ref, logp_ref, hw_ref,
         rec_par_ref, rec_tok_ref, rec_lp_ref, rec_met_ref,
         e0_ref, e1_ref) = rest
    else:
        (tokens_ref, n_emit_ref, logp_ref,
         rec_par_ref, rec_tok_ref, rec_lp_ref, rec_met_ref,
         e0_ref, e1_ref) = rest
    pid = pl.program_id(0)
    f32 = jnp.float32
    # Tokens are PACKED two-per-int32 lane (vocab ids < 2^16; round 4):
    # word j holds position 2j in its low 16 bits and 2j+1 in the high bits.
    # This halves the only VMEM-resident [B, beam, *] recording array, which
    # set the batch-48 ceiling (16.9 MB at b=64, T=824 — PERFORMANCE.md).
    # The appends below are pure adds because positions >= n_emit are zero
    # by construction (init zeros, writes only at position n, parents carry
    # the same invariant).
    u_pack = (u + 1) // 2

    @pl.when(pid == 0)
    def _init():
        tokens_ref[...] = jnp.zeros((b, beam, u_pack), jnp.int32)
        n_emit_ref[...] = jnp.zeros((b, beam), jnp.int32)
        beam_iota2 = jax.lax.broadcasted_iota(jnp.int32, (b, beam), 1)
        logp_ref[...] = jnp.where(beam_iota2 == 0, f32(0.0), f32(NEG_INF))
        if with_hw:
            hw_ref[...] = jnp.zeros((b, beam), jnp.int32)  # root state
        # context ([-1, 0] + emitted, >=0) starts as token 0 for both slots
        e_blank = (emb_hi_ref[0:1, :].astype(f32)
                   + emb_mid_ref[0:1, :].astype(f32)
                   + emb_lo_ref[0:1, :].astype(f32))  # [1, D]
        e0_ref[...] = e_blank + jnp.zeros(
            (b * beam, e_blank.shape[1]), f32)
        e1_ref[...] = e0_ref[...]

    def _frame(sub):
        # ---- joiner logits for every (chunk, beam) --------------------------
        # Dot precision tracks the model's serving mode: fp32 mode keeps
        # 6-pass HIGHEST (token-identical to the exact-f32 oracle); bf16
        # serving mode — already documented as not bit-stable vs fp32 — uses a
        # 3-pass hi/lo split (~16 mantissa bits), halving the MXU passes the
        # kernel is bound by.
        if fast_dots:
            def dot(a, bm):
                a_hi = a.astype(jnp.bfloat16)
                a_lo = (a - a_hi.astype(f32)).astype(jnp.bfloat16)
                b_hi = bm.astype(jnp.bfloat16)
                b_lo = (bm - b_hi.astype(f32)).astype(jnp.bfloat16)
                dg = lambda p, q: jnp.dot(p, q, preferred_element_type=f32,
                                          precision=jax.lax.Precision.DEFAULT)
                return dg(a_hi, b_hi) + dg(a_hi, b_lo) + dg(a_lo, b_hi)
        else:
            def dot(a, bm):
                return jnp.dot(a, bm, preferred_element_type=f32,
                               precision=jax.lax.Precision.HIGHEST)
        enc_t = enc_ref[sub, :, :].astype(f32)                     # [B, E]
        e_j = dot(enc_t, we_ref[...]) + be_ref[...]              # [B, J]
        dec_in0 = e0_ref[...]                                    # [B*beam, D]
        dec_in1 = e1_ref[...]
        d0 = dot(dec_in0, w0_ref[...]) + dot(dec_in1, w1_ref[...])
        dec_out = jnp.maximum(d0, 0.0)                           # [B*beam, D]
        d_j = dot(dec_out, wdp_ref[...]) + bdp_ref[...]
        j_dim = d_j.shape[-1]
        h = jnp.tanh(d_j.reshape(b, beam, j_dim) + e_j[:, None, :])
        logits = dot(h.reshape(b * beam, j_dim), wo_ref[...]) + bo_ref[...]

        m0 = jnp.max(logits, axis=-1, keepdims=True)
        z = logits - m0
        lse = jnp.log(jnp.sum(jnp.exp(z), axis=-1, keepdims=True))
        lp = z - lse                                             # [B*beam, V]
        lp3 = lp.reshape(b, beam, v)
        p3 = jnp.exp(lp3)

        logp_old = logp_ref[...]                                 # [B, beam]
        acc = lp3 + logp_old[:, :, None]                         # [B, beam, V]

        # ---- exact top-k: beam passes of (max, min-flat-index, mask) --------
        beam_iota3 = jax.lax.broadcasted_iota(jnp.int32, (b, beam, v), 1)
        lane_iota3 = jax.lax.broadcasted_iota(jnp.int32, (b, beam, v), 2)
        flat_id = beam_iota3 * v + lane_iota3                    # [B, beam, V]
        flat_f = flat_id.astype(f32)  # ids < 2^24: exact in f32 (int32 == with
        #                               broadcast operands miscompares on Mosaic)
        his, toks, scores = [], [], []
        for _p in range(beam):
            # two-stage reductions: Mosaic rejects [B,1,1] (1,1)-minor arrays
            mrow = jnp.max(acc, axis=-1)                          # [B, beam]
            mx = jnp.max(mrow, axis=-1, keepdims=True)            # [B, 1]
            # NOTE: jnp.broadcast_to of [X,1] lane vectors TRANSPOSES on
            # Mosaic (observed on v5e) — broadcast arithmetically instead.
            mxb = (mx + jnp.zeros((b, beam), f32))[:, :, None]    # [B, beam, 1]
            cand = jnp.where(acc == mxb, flat_id, _INT_BIG)
            cmin = jnp.min(cand, axis=-1)                         # [B, beam]
            fmin = jnp.min(cmin, axis=-1, keepdims=True)          # [B, 1]
            his.append(fmin // v)                                 # [B, 1]
            toks.append(fmin % v)
            scores.append(mx)
            fminb = (fmin.astype(f32) + jnp.zeros((b, beam), f32))[:, :, None]
            acc = jnp.where(flat_f == fminb, f32(NEG_INF), acc)
        hi = jnp.concatenate(his, axis=1)                        # [B, beam]
        tok = jnp.concatenate(toks, axis=1)
        top_scores = jnp.concatenate(scores, axis=1)             # [B, beam]
        is_blank = tok == blank_id

        # One-hot of the selected token per candidate — shared by the hotword
        # table fetch and the new-context embedding fetch below. Exact in bf16
        # (0/1 values).
        lane_v3 = jax.lax.broadcasted_iota(jnp.int32, (b, beam, v), 2)
        onehot = (lane_v3 == tok[:, :, None]).astype(jnp.bfloat16).reshape(
            b * beam, v)

        # ---- hotword boost (after top-k, asr_engine.py:1127-1131) -----------
        if with_hw:
            # Parent automaton state for each candidate (unrolled select).
            p_hw = jnp.zeros((b, beam), jnp.int32)
            for i in range(beam):
                p_hw = jnp.where(hi == i, hw_ref[:, i:i + 1], p_hw)
            # Fetch column tok of both tables for every candidate:
            # tmp[j, :] = [delta[:, tok_j].T | next_state[:, tok_j].T] via one
            # exact-f32 3-pass one-hot matmul against the [V, 2*S_pad]
            # transposed tables.
            dflt = jax.lax.Precision.DEFAULT
            tmp = (jnp.dot(onehot, tbl_hi_ref[...], preferred_element_type=f32,
                           precision=dflt)
                   + jnp.dot(onehot, tbl_mid_ref[...],
                             preferred_element_type=f32, precision=dflt)
                   + jnp.dot(onehot, tbl_lo_ref[...],
                             preferred_element_type=f32,
                             precision=dflt))                 # [B*beam, 2*S_pad]
            delta_rows = tmp[:, :s_pad].reshape(b, beam, s_pad)
            next_rows = tmp[:, s_pad:].reshape(b, beam, s_pad)
            # Row select by parent state: f32 one-hot over S_pad (compare in
            # f32 — int32 broadcast compares miscompile on Mosaic).
            s_iota = jax.lax.broadcasted_iota(
                jnp.int32, (b, beam, s_pad), 2).astype(f32)
            p_hwf = p_hw.astype(f32)[:, :, None]
            oh_s = (s_iota == p_hwf).astype(f32)
            delta = jnp.sum(delta_rows * oh_s, axis=-1)           # [B, beam]
            next_s = jnp.sum(next_rows * oh_s, axis=-1).astype(jnp.int32)
            apply_hw = (~is_blank) & (tok != unk_id)
            boosted = top_scores + jnp.where(apply_hw, delta, f32(0.0))
            new_hw = jnp.where(apply_hw, next_s, p_hw)
        else:
            boosted = top_scores

        # ---- per-beam entropy metrics from the raw logits -------------------
        # Computed as four [B, beam] rows (the recording side streams them per
        # frame; see rec_met below).
        alpha, max_entropy, tsallis_max = _metrics_const(v)
        entropy = -jnp.sum(p3 * lp3, axis=-1)                    # [B, beam]
        tsallis = (1.0 / (alpha - 1.0)) * (
            1.0 - jnp.sum(jnp.exp(lp3 * alpha), axis=-1))
        pm1k = jnp.max(p3, axis=-1, keepdims=True)               # [B, beam, 1]
        # Mask ONLY the argmax lane (min flat index among ties, matching
        # lax.top_k first-occurrence semantics in ops/beam_search._entropy_metrics)
        # so an exact probability tie yields margin pm1-pm2 == 0, not the next
        # distinct value. f32 lane indices: integer-exact below 2^24, and f32
        # compares avoid the Mosaic int32 broadcast-compare miscompile.
        lane_f3 = jax.lax.broadcasted_iota(jnp.int32, (b, beam, v), 2).astype(f32)
        tie_lane = jnp.where(p3 == pm1k, lane_f3, f32(v))
        amin = jnp.min(tie_lane, axis=-1, keepdims=True)         # [B, beam, 1]
        pmask = jnp.where(lane_f3 == amin, f32(-1.0), p3)
        pm1 = pm1k[:, :, 0]
        pm2 = jnp.max(pmask, axis=-1)                            # [B, beam]
        mets = (tsallis / tsallis_max, pm1 - pm2,
                entropy / max_entropy, pm1)                      # 4 x [B, beam]

        # ---- gather parent state (unrolled over old beams) ------------------
        hi3 = hi[:, :, None]  # int32 expand (bool minor-dim reshapes crash)

        def gather_rows(ref3):
            old = ref3  # [B, beam, X]
            out = jnp.zeros_like(old)
            for i in range(beam):
                out = jnp.where(hi3 == i, old[:, i:i + 1, :], out)
            return out

        def gather2(a):
            out = jnp.zeros_like(a)
            for i in range(beam):
                out = jnp.where(hi == i, a[:, i:i + 1], out)
            return out

        p_tokens = gather_rows(tokens_ref[...])
        p_n = gather2(n_emit_ref[...])
        p_logp = gather2(logp_old)
        p_mets = [gather2(m) for m in mets]
        d = e0_ref.shape[-1]
        p_e0 = gather_rows(e0_ref[...].reshape(b, beam, d))
        p_e1 = gather_rows(e1_ref[...].reshape(b, beam, d))

        # ---- new context embeddings ----------------------------------------
        # Exact f32 row fetch in 3 bf16 MXU passes: emb = hi + mid + lo with 8
        # mantissa bits each (24 total = f32), and onehot (0/1) is bf16-exact.
        demb = jax.lax.Precision.DEFAULT
        emb_new = (jnp.dot(onehot, emb_hi_ref[...], preferred_element_type=f32,
                           precision=demb)
                   + jnp.dot(onehot, emb_mid_ref[...], preferred_element_type=f32,
                             precision=demb)
                   + jnp.dot(onehot, emb_lo_ref[...], preferred_element_type=f32,
                             precision=demb))
        emb_new = emb_new.reshape(b, beam, d)
        blank3 = tok[:, :, None] == blank_id
        new_e0 = jnp.where(blank3, p_e0, p_e1)
        new_e1 = jnp.where(blank3, p_e1, emb_new)

        # ---- positional token append (packed 2-per-int32) -------------------
        # Tokens stay VMEM-resident for the in-kernel dedup's EXACT sequence
        # comparison; everything else emitted per frame (frames, tok_logp,
        # metrics) streams out as grid-blocked records and is reconstructed
        # from the parent backpointers after the kernel (see wrapper) — the
        # old [B, beam, U] recording arrays cost ~8x their size in VMEM
        # read/write traffic EVERY frame (unrolled parent gathers) and set
        # the batch-32 VMEM ceiling.
        cols_w = jax.lax.broadcasted_iota(jnp.int32, (b, beam, u_pack), 2)
        pos = jnp.clip(p_n, 0, u - 1)
        pos_w = (pos // 2)[:, :, None]
        half = (pos - 2 * pos_w[:, :, 0])[:, :, None]       # 0 or 1
        # tok << (16*half) without shifts: tok * (1 + 65535*half), exact in
        # int32 (tok < 2^16). The other half of the target word is zero by
        # the invariant, so the masked add IS the insert.
        val = (tok[:, :, None] * (1 + 65535 * half))
        at_word = (cols_w == pos_w) & (~blank3)
        new_tokens = jnp.where(at_word, p_tokens + val, p_tokens)
        # tok_lp == top_score - parent cumulative score (both f32, exact chain)
        tok_lp = top_scores - p_logp
        new_n = p_n + jnp.where(is_blank, 0, 1)

        # ---- dedup: log-add merge of identical emitted sequences ------------
        # equal[b, i, j] = sequences of new beams i and j identical
        # Unrolled over old-beam index i; only 2D [B, beam] tensors (Mosaic
        # rejects [B, i, j] middle-axis broadcasts). Merged scores are the
        # (hotword-boosted) candidate scores, matching the XLA path's
        # post-boost logsumexp. Packed words compare exactly: beyond-length
        # halves are zero in both sequences whenever the lengths match (the
        # eqs[i] length guard), so word equality == position equality.
        nw = (new_n + 1) // 2                                 # words in use
        eqs = []  # eqs[i][b, j]: new beams i and j carry identical sequences
        for i in range(beam):
            same = (new_tokens == new_tokens[:, i:i + 1, :]) | \
                (cols_w >= nw[:, :, None])
            # bool all-reduce misfires in Mosaic: reduce in int32 instead
            all_same = jnp.min(same.astype(jnp.int32), axis=-1) == 1
            eqs.append(all_same & (new_n == new_n[:, i:i + 1]))   # [B, beam(j)]
        # canon[b, j] = min{i <= j : eqs[i]} (diagonal always true)
        j_self = jax.lax.broadcasted_iota(jnp.int32, (b, beam), 1)
        canon = j_self
        for i in reversed(range(beam)):
            canon = jnp.where(eqs[i] & (i <= j_self), i, canon)
        is_canon = canon == j_self
        # merged[b, i] = logsumexp over {j : canon[b, j] == i} of boosted scores
        merged_cols = []
        for i in range(beam):
            vals = jnp.where(canon == i, boosted, f32(NEG_INF))
            mloc = jnp.max(vals, axis=-1, keepdims=True)          # [B, 1]
            ssum = jnp.sum(jnp.exp(vals - mloc), axis=-1, keepdims=True)
            merged_cols.append(mloc + jnp.log(ssum))
        merged = jnp.concatenate(merged_cols, axis=1)             # [B, beam]
        new_logp = jnp.where(is_canon, merged, f32(NEG_INF))

        # ---- frames past each chunk's valid length are no-ops ---------------
        # NOTE: int32 compare against an arithmetic-broadcast operand
        # MISCOMPARES on Mosaic (silently; interpret mode is fine) — broadcast
        # and compare in f32 (values < 2^24, exact).
        lens2f = lens_ref[...].astype(f32) + jnp.zeros((b, beam), f32)
        tf = jnp.int32(0) + pid * unroll + sub  # traced scalar
        valid = tf.astype(f32) < lens2f
        valid3 = tf.astype(f32) < lens2f[:, :, None]

        def upd(ref, new, old):
            ref[...] = jnp.where(valid3 if new.ndim == 3 else valid, new, old)

        # per-frame records: on invalid frames the parent is the identity and
        # the token is blank, so the backward reconstruction walks through
        # them untouched.
        j_iota = jax.lax.broadcasted_iota(jnp.int32, (b, beam), 1)
        rec_par_ref[sub] = jnp.where(valid, hi, j_iota)
        rec_tok_ref[sub] = jnp.where(valid, tok, blank_id)
        rec_lp_ref[sub] = tok_lp
        rec_met_ref[sub] = jnp.concatenate(p_mets, axis=1)          # [B, 4*beam]

        upd(tokens_ref, new_tokens, tokens_ref[...])
        upd(n_emit_ref, new_n, n_emit_ref[...])
        upd(logp_ref, new_logp, logp_ref[...])
        if with_hw:
            upd(hw_ref, new_hw, hw_ref[...])
        e0_ref[...] = jnp.where(valid3, new_e0,
                                e0_ref[...].reshape(b, beam, d)).reshape(
            b * beam, d)
        e1_ref[...] = jnp.where(valid3, new_e1,
                                e1_ref[...].reshape(b, beam, d)).reshape(
            b * beam, d)

    for _s in range(unroll):
        _frame(_s)


def _split3(a):
    """f32 [..] -> (hi, mid, lo) bf16 with hi+mid+lo == a exactly (24
    mantissa bits across three 8-bit limbs)."""
    f32 = jnp.float32
    hi = a.astype(jnp.bfloat16)
    r1 = a - hi.astype(f32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(f32)).astype(jnp.bfloat16)
    return hi, mid, lo


@partial(jax.jit, static_argnames=("cfg", "beam_size", "interpret",
                                  "fast_dots", "with_hotwords", "unroll"))
def beam_search_batch_pallas(enc_out, enc_lens, dec_params, joi_params,
                             cfg: RnntConfig, beam_size: int = 8,
                             interpret: bool = False,
                             fast_dots: bool = False,
                             hw_tables=None,
                             with_hotwords: bool = False,
                             unroll: int = 1) -> BeamResult:
    """Pallas megakernel variant of beam_search_batch.

    enc_out: [N, T, E] float32; enc_lens: [N] int32. Returns BeamResult with
    the same shapes/semantics as the XLA path. With with_hotwords=True pass
    a HotwordTables pytree; the automaton state advances in-kernel and the
    finalize subtraction (asr_engine.py:1142-1148) happens on the way out.
    """
    b, t_max, _e = enc_out.shape
    u = t_max
    assert cfg.vocab_size < 65536, "packed token layout needs vocab < 2^16"
    # Grid runs unroll frames per step; the frame axis pads up to a
    # multiple (padding frames are masked no-ops: lens gate writes, the
    # record rows hold identity parents / blank tokens).
    t_pad = -(-t_max // unroll) * unroll
    v = cfg.vocab_size
    beam = beam_size
    f32 = jnp.float32
    with_hw = with_hotwords and hw_tables is not None

    w0, w1 = _dense_decoder_weights(dec_params, cfg)
    emb = dec_params["embedding"].astype(f32)
    emb_hi, emb_mid, emb_lo = _split3(emb)
    wdp = joi_params["decoder_proj"]["weight"].astype(f32)
    bdp = joi_params["decoder_proj"]["bias"].astype(f32)[None, :]
    we = joi_params["encoder_proj"]["weight"].astype(f32)
    be = joi_params["encoder_proj"]["bias"].astype(f32)[None, :]
    wo = joi_params["output"]["weight"].astype(f32)
    bo = joi_params["output"]["bias"].astype(f32)[None, :]
    d = emb.shape[1]

    s_pad = 0
    hw_args, hw_specs = (), ()
    if with_hw:
        s = hw_tables.next_state.shape[0]
        s_pad = max(128, -(-s // 128) * 128)
        # Transposed [V, 2*S_pad]: cols [0:S_pad] delta, [S_pad:] next_state
        # (int values < 2^24: exact across the 3 bf16 limbs).
        tbl = jnp.zeros((v, 2 * s_pad), f32)
        tbl = tbl.at[:, :s].set(hw_tables.delta.astype(f32).T)
        tbl = tbl.at[:, s_pad:s_pad + s].set(
            hw_tables.next_state.astype(f32).T)
        hw_args = _split3(tbl)
        hw_specs = tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                         for _ in range(3))

    kernel = partial(_beam_kernel, b=b, beam=beam, u=u, v=v,
                     blank_id=cfg.blank_id, unk_id=cfg.unk_id,
                     fast_dots=fast_dots, with_hw=with_hw, s_pad=s_pad,
                     unroll=unroll)
    u_pack = (u + 1) // 2  # tokens packed two-per-int32 (see _beam_kernel)
    out_shapes = [
        jax.ShapeDtypeStruct((b, beam, u_pack), jnp.int32),  # tokens (packed)
        jax.ShapeDtypeStruct((b, beam), jnp.int32),       # n_emit
        jax.ShapeDtypeStruct((b, beam), f32),             # logp
    ]
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
    if with_hw:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, beam), jnp.int32))   # hw_state
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    # Per-frame records stream straight to HBM via grid-indexed blocks —
    # only the token array stays VMEM-resident (exact dedup needs it).
    out_shapes += [
        jax.ShapeDtypeStruct((t_pad, b, beam), jnp.int32),   # rec_par
        jax.ShapeDtypeStruct((t_pad, b, beam), jnp.int32),   # rec_tok
        jax.ShapeDtypeStruct((t_pad, b, beam), f32),         # rec_lp
        jax.ShapeDtypeStruct((t_pad, b, 4 * beam), f32),     # rec_met
    ]
    out_specs += [
        pl.BlockSpec((unroll, b, beam), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((unroll, b, beam), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((unroll, b, beam), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((unroll, b, 4 * beam), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(t_pad // unroll,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),            # lens [B,1]
            pl.BlockSpec((unroll, b, enc_out.shape[2]),
                         lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),            # emb_hi
            pl.BlockSpec(memory_space=pltpu.VMEM),            # emb_mid
            pl.BlockSpec(memory_space=pltpu.VMEM),            # emb_lo
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),            # wdp
            pl.BlockSpec(memory_space=pltpu.VMEM),            # bdp
            pl.BlockSpec(memory_space=pltpu.VMEM),            # we
            pl.BlockSpec(memory_space=pltpu.VMEM),            # be
            pl.BlockSpec(memory_space=pltpu.VMEM),            # wo
            pl.BlockSpec(memory_space=pltpu.VMEM),            # bo
            *hw_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((b * beam, d), f32),                   # e0
            pltpu.VMEM((b * beam, d), f32),                   # e1
        ],
        interpret=interpret,
        # Raise the scoped-VMEM ceiling past the 16 MB XLA default (v5e has
        # 128 MB physical VMEM): b=64 at T=824 needs 20.13 MB measured. The
        # streamed record blocks keep the per-step working set small, so the
        # only cost of a higher limit is less headroom for the surrounding
        # program — decode programs are this kernel plus layout glue.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                100 * 1024 * 1024,
                max(16 * 1024 * 1024,
                    beam_kernel_vmem_bytes(b, beam, u, v, d,
                                           enc_out.shape[2], unroll,
                                           s_pad, with_hw))),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_max * b * beam * d * (2 * d + v + d)
            + 2 * t_max * b * beam * v * 8
            + (2 * t_max * b * beam * v * 2 * s_pad * 3 if with_hw else 0),
            bytes_accessed=t_max * (4 * (v * d + d * d * 2 + d * v)
                                    + b * beam * u * 4 * 2),
            transcendentals=t_max * b * beam * v * 4,
        ),
    )(enc_lens.astype(jnp.int32).reshape(b, 1),
      jnp.pad(jnp.swapaxes(enc_out.astype(f32), 0, 1),  # [T_pad, B, E] blocks
              ((0, t_pad - t_max), (0, 0), (0, 0))),
      emb_hi, emb_mid, emb_lo, w0, w1, wdp, bdp, we, be, wo, bo, *hw_args)
    if with_hw:
        tokens, n_emit, logp, hw_state, rec_par, rec_tok, rec_lp, \
            rec_met = outs
        # finalize: abandon partial matches (asr_engine.py:1142-1148)
        logp = logp - hw_tables.node_score[hw_state]
    else:
        tokens, n_emit, logp, rec_par, rec_tok, rec_lp, rec_met = outs

    # Final selection — identical to the XLA path (length-normalized).
    norm = jnp.maximum(n_emit + cfg.context_size, 1).astype(f32)
    best = jnp.argmax(logp / norm, axis=1)                    # [B]
    take = lambda a: jnp.take_along_axis(
        a, best.reshape(b, *([1] * (a.ndim - 1))), axis=1)[:, 0]

    # ---- reconstruct frames / tok_logp / entropy for the winning beam ----
    # Backward walk over the streamed records: follow the parent pointers
    # from the selected beam, assigning emission positions n-1, n-2, ...
    # Values are the exact f32s the kernel computed, so the result is
    # bit-identical to the old VMEM recording arrays.
    n_sel = take(n_emit)                                      # [B]
    rec_met4 = rec_met.reshape(t_pad, b, 4, beam)

    def walk(carry, xs):
        cur, idx = carry                                      # [B], [B]
        par_t, tok_t, lp_t, met_t, t_idx = xs
        sel = lambda a: jnp.take_along_axis(a, cur[:, None], axis=1)[:, 0]
        tok_c = sel(tok_t)
        emitted = (tok_c != cfg.blank_id) & (t_idx < enc_lens)
        lp_c = sel(lp_t)
        met_c = jnp.take_along_axis(
            met_t, cur[:, None, None], axis=2)[:, :, 0]      # [B, 4]
        pos = idx - 1                                         # [B]
        new_idx = idx - emitted.astype(jnp.int32)
        new_cur = sel(par_t)
        return (new_cur, new_idx), (pos, emitted, lp_c, met_c)

    t_ids = jnp.arange(t_pad, dtype=jnp.int32)
    (_, _), (poss, emits, lps, mets) = jax.lax.scan(
        walk, (best.astype(jnp.int32), n_sel),
        (rec_par, rec_tok, rec_lp, rec_met4, t_ids), reverse=True)
    # Scatter per-emission values into [B, U] arrays (drop-trick: invalid
    # rows target column u).
    poss = jnp.where(emits, jnp.clip(poss, 0, u - 1), u)      # [T_pad, B]
    bb = jnp.broadcast_to(jnp.arange(b)[None, :], (t_pad, b))
    frames = jnp.zeros((b, u + 1), jnp.int32).at[
        bb, poss].set(jnp.broadcast_to(t_ids[:, None], (t_pad, b))
                      )[:, :u]
    tok_logp = jnp.zeros((b, u + 1), f32).at[bb, poss].set(lps)[:, :u]
    ent = jnp.zeros((b, u + 1, 4), f32).at[bb, poss].set(mets)[:, :u]
    # Unpack the 2-per-int32 token words back to [B, U] (outside the kernel;
    # plain XLA): low 16 bits = even positions, high = odd.
    tok_pack = take(tokens)                                   # [B, u_pack]
    low = jnp.bitwise_and(tok_pack, 0xFFFF)
    high = jnp.right_shift(tok_pack, 16)
    tok_full = jnp.stack([low, high], axis=-1).reshape(b, 2 * u_pack)[:, :u]
    return BeamResult(
        tokens=tok_full, frames=frames, tok_logp=tok_logp,
        entropy=ent,                                          # [B, U, 4]
        num_tokens=n_sel, total_logp=take(logp))

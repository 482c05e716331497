# Batched RNN-T modified beam search on TPU.
#
# This re-expresses the reference's per-chunk Python beam search
# (reference core/asr_engine.py:1023-1206, _ort_beam_search) as a fixed-shape
# jax.lax.scan over encoder frames, vmapped over a batch of chunks:
#
#   * hypotheses are dense [beam, U_max] tensors instead of Python dicts;
#   * the decoder is recomputed for all beams each frame (a tiny batched
#     matmul) instead of the reference's LRU decoder-output cache;
#   * duplicate hypotheses (same emitted-token sequence, reached via
#     blank-vs-emit paths) are merged with log-add exactly like the
#     reference's dict keyed by tuple(ys) (asr_engine.py:1109-1140);
#   * hotword (Aho-Corasick) boosting uses dense per-state transition tables
#     built on the host (ops/hotword.py), gathered on device — the boost is
#     added AFTER top-k selection, matching asr_engine.py:1096-1131;
#   * per-token entropy metrics (tsallis/margin/entropy/top1) are computed in
#     the same pass from the raw joiner logits, matching
#     _compute_token_entropy (asr_engine.py:1173-1196);
#   * final selection is length-normalized by len(ys) = n_emitted + context,
#     matching asr_engine.py:1151.
#
# Greedy decoding is beam_size=1 of the same program.

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from sherpa_vietnamese_asr_tpu.models.rnnt import (
    RnntConfig,
    decoder_forward,
    joiner_forward,
)

NEG_INF = -1e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HotwordTables:
    """Dense Aho-Corasick tables; see ops/hotword.py. State 0 is the root."""

    next_state: jax.Array  # [S, V] int32
    delta: jax.Array       # [S, V] float32 score delta of forward_one_step
    node_score: jax.Array  # [S] float32 (finalize(s) = -node_score[s])


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BeamResult:
    tokens: jax.Array     # [N, U_max] int32 emitted token ids (padded with 0)
    frames: jax.Array     # [N, U_max] int32 encoder frame of each emission
    tok_logp: jax.Array   # [N, U_max] f32 per-token log-prob (tok_lp)
    entropy: jax.Array    # [N, U_max, 4] f32 (tsallis_norm, margin, entropy_norm, top1)
    num_tokens: jax.Array  # [N] int32
    total_logp: jax.Array  # [N] f32 score of the selected hypothesis


def _entropy_metrics(logits, vocab_size):
    """[..., V] raw logits -> [..., 4] metrics, matching _compute_token_entropy."""
    v = vocab_size
    alpha = 1.0 / 3.0
    max_entropy = math.log(v) if v > 1 else 1.0
    tsallis_max = (1.0 / (alpha - 1.0)) * (1.0 - v ** (1.0 - alpha)) if v > 1 else 1.0
    x = logits - jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(x)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    entropy = -jnp.sum(p * jnp.log(p + 1e-30), axis=-1)
    tsallis = (1.0 / (alpha - 1.0)) * (1.0 - jnp.sum(p ** alpha, axis=-1))
    top2 = jax.lax.top_k(p, 2)[0]
    top1 = top2[..., 0]
    margin = top1 - top2[..., 1]
    return jnp.stack(
        [tsallis / tsallis_max, margin, entropy / max_entropy, top1], axis=-1)


def _log_add(a, b):
    hi = jnp.maximum(a, b)
    lo = jnp.minimum(a, b)
    diff = lo - hi
    return jnp.where(diff < -36.0, hi, hi + jnp.log1p(jnp.exp(diff)))


def _beam_step(state, t, enc_t, dec_params, joi_params, cfg: RnntConfig,
               beam_size, u_max, hw: HotwordTables | None):
    """One frame of modified beam search for a single chunk.

    state: dict of [beam, ...] arrays. enc_t: [E] encoder frame.
    """
    v = cfg.vocab_size
    tokens, n_emit = state["tokens"], state["n_emit"]
    logp = state["logp"]

    # Decoder context = last context_size entries of ([-1, 0] + emitted),
    # >=0 — carried directly as a [beam, K] ring in the scan state instead
    # of gathered from the [beam, U_max] token matrix each frame: the
    # minor-axis take_along_axis cost ~20 us/frame on TPU (more than the
    # decoder+joiner matmuls themselves); the carried context is a [beam, K]
    # shift-on-emit.
    ctx = state["ctx"]

    dec_out = decoder_forward(dec_params, ctx, cfg)           # [beam, D]
    logits = joiner_forward(joi_params, enc_t[None, :], dec_out)  # [beam, V]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    acc = log_probs + logp[:, None]                           # [beam, V]

    # Global top-k on UN-boosted accumulated scores (asr_engine.py:1096-1106).
    flat = acc.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, beam_size)
    hi = top_idx // v            # parent hyp index, [beam]
    tok = top_idx % v            # candidate token, [beam]
    is_blank = tok == cfg.blank_id

    # Gather parent state.
    p_tokens = tokens[hi]
    p_frames = state["frames"][hi]
    p_tok_logp = state["tok_logp"][hi]
    p_ent = state["entropy"][hi]
    p_n = n_emit[hi]
    p_logp = logp[hi]
    p_hw = state["hw_state"][hi]
    p_ctx = ctx[hi]

    # Shift the carried decoder context on non-blank emission.
    new_ctx = jnp.where(
        is_blank[:, None], p_ctx,
        jnp.concatenate([p_ctx[:, 1:], tok[:, None]], axis=1))

    # Non-blank: append token at column p_n.
    cols = jnp.arange(u_max)[None, :]
    at_pos = (cols == jnp.clip(p_n, 0, u_max - 1)[:, None]) & (~is_blank[:, None])
    new_tokens = jnp.where(at_pos, tok[:, None], p_tokens)
    new_frames = jnp.where(at_pos, t, p_frames)
    tok_lp = jnp.take_along_axis(log_probs[hi], tok[:, None], axis=1)[:, 0]
    new_tok_logp = jnp.where(at_pos, tok_lp[:, None], p_tok_logp)
    # entropy carried as [beam, 4, U] so U stays the (128-)lane dimension
    ent = _entropy_metrics(logits, v)[hi]                     # [beam, 4]
    new_ent = jnp.where(at_pos[:, None, :], ent[:, :, None], p_ent)
    new_n = p_n + (~is_blank).astype(jnp.int32)

    new_score = top_scores
    if hw is not None:
        # Hotword boost for non-blank, non-unk tokens (asr_engine.py:1127-1131).
        delta = hw.delta[p_hw, tok]
        nxt = hw.next_state[p_hw, tok]
        apply = (~is_blank) & (tok != cfg.unk_id)
        new_score = new_score + jnp.where(apply, delta, 0.0)
        new_hw = jnp.where(apply, nxt, p_hw)
    else:
        new_hw = p_hw

    # Dedup: merge candidates with identical emitted sequences (log-add into
    # the higher-scoring one; top_k output is already score-descending).
    same_len = new_n[:, None] == new_n[None, :]
    eq_tok = jnp.all(
        (new_tokens[:, None, :] == new_tokens[None, :, :])
        | (cols[None, :, :] >= new_n[:, None, None]), axis=-1)
    equal = same_len & eq_tok  # [beam, beam]
    i_idx = jnp.arange(beam_size)
    lower = i_idx[None, :] < i_idx[:, None]  # lower[j, i] = i < j
    # canonical[j] = min{i : equal[i, j]}, which is <= j (diagonal is True)
    canon = jnp.argmax(equal.T & (lower | jnp.eye(beam_size, dtype=bool)), axis=-1)
    is_canon = canon == i_idx
    # logsumexp of scores grouped by canonical index
    contrib = jnp.where(equal & (canon[None, :] == i_idx[:, None]),
                        new_score[None, :], NEG_INF)
    merged = jax.scipy.special.logsumexp(contrib, axis=-1)
    new_score = jnp.where(is_canon, merged, NEG_INF)

    # Frames past the chunk's valid length are no-ops.
    valid = t < state["t_valid"]

    def upd(new, old):
        return jnp.where(valid, new, old)

    return {
        "tokens": upd(new_tokens, state["tokens"]),
        "frames": upd(new_frames, state["frames"]),
        "tok_logp": upd(new_tok_logp, state["tok_logp"]),
        "entropy": upd(new_ent, state["entropy"]),
        "n_emit": upd(new_n, state["n_emit"]),
        "logp": upd(new_score, state["logp"]),
        "hw_state": upd(new_hw, state["hw_state"]),
        "ctx": upd(new_ctx, state["ctx"]),
        "t_valid": state["t_valid"],
    }


def _beam_search_single(enc_out, enc_len, dec_params, joi_params,
                        cfg: RnntConfig, beam_size, hw):
    """enc_out: [T, E]; returns per-chunk best-hypothesis arrays."""
    t_max = enc_out.shape[0]
    u_max = t_max
    beam = beam_size
    state = {
        "tokens": jnp.zeros((beam, u_max), jnp.int32),
        "frames": jnp.zeros((beam, u_max), jnp.int32),
        "tok_logp": jnp.zeros((beam, u_max), jnp.float32),
        "entropy": jnp.zeros((beam, 4, u_max), jnp.float32),
        "n_emit": jnp.zeros((beam,), jnp.int32),
        "logp": jnp.full((beam,), NEG_INF, jnp.float32).at[0].set(0.0),
        "hw_state": jnp.zeros((beam,), jnp.int32),
        # Decoder context ring ([-1, 0] + emitted, >=0 -> init zeros).
        "ctx": jnp.zeros((beam, cfg.context_size), jnp.int32),
        "t_valid": enc_len,
    }

    def step(carry, xs):
        t, enc_t = xs
        return _beam_step(carry, t, enc_t, dec_params, joi_params, cfg,
                          beam, u_max, hw), None

    state, _ = jax.lax.scan(
        step, state, (jnp.arange(t_max), enc_out))

    logp = state["logp"]
    if hw is not None:
        # finalize: subtract unfinished partial score (asr_engine.py:1142-1148)
        logp = logp - hw.node_score[state["hw_state"]]
    # Length-normalized selection; len(ys) includes the [-1, 0] init context.
    norm = jnp.maximum(state["n_emit"] + cfg.context_size, 1).astype(jnp.float32)
    best = jnp.argmax(logp / norm)
    return (state["tokens"][best], state["frames"][best],
            state["tok_logp"][best], state["entropy"][best].T,
            state["n_emit"][best], logp[best])


@partial(jax.jit, static_argnames=("cfg", "beam_size", "with_hotwords"))
def beam_search_batch(enc_out, enc_lens, dec_params, joi_params,
                      cfg: RnntConfig, beam_size: int = 8,
                      hw_tables=None, with_hotwords: bool = False) -> BeamResult:
    """Modified beam search over a batch of chunks.

    Args:
        enc_out: [N, T, E] encoder outputs (padded).
        enc_lens: [N] int32 valid encoder frames per chunk.
        dec_params/joi_params: rnnt parameter pytrees.
        cfg: RnntConfig (static).
        beam_size: fixed beam width (static). 1 == greedy-style decode.
        hw_tables: optional HotwordTables pytree (pass with_hotwords=True).

    Returns:
        BeamResult of [N, T]-shaped arrays.
    """
    hw = hw_tables if with_hotwords else None
    run = jax.vmap(
        lambda e, l: _beam_search_single(e, l, dec_params, joi_params, cfg,
                                         beam_size, hw))
    tokens, frames, tok_logp, entropy, n, logp = run(enc_out, enc_lens)
    return BeamResult(tokens=tokens, frames=frames, tok_logp=tok_logp,
                      entropy=entropy, num_tokens=n, total_logp=logp)

# Beam-search parity: fixed-shape TPU implementation (ops/beam_search.py) vs
# the dict-based oracle (utils/beam_search_ref.py) that mirrors the reference
# algorithm (reference core/asr_engine.py:1023-1171).
import math

import numpy as np
import pytest


@pytest.fixture(scope="module")
def rnnt():
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models import rnnt as m

    cfg = m.RnntConfig(vocab_size=50, context_size=2, decoder_dim=48,
                       joiner_dim=40, encoder_out_dim=32)
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    dec = m.init_decoder_params(k1, cfg)
    joi = m.init_joiner_params(k2, cfg)

    def dec_fn(ctx):
        return np.asarray(m.decoder_forward(dec, jnp.asarray(ctx), cfg))

    def joi_fn(enc, d):
        return np.asarray(m.joiner_forward(joi, jnp.asarray(enc), jnp.asarray(d)))

    return cfg, dec, joi, dec_fn, joi_fn


def _random_enc(rng, n, t, e, scale=2.0):
    return (rng.standard_normal((n, t, e)) * scale).astype(np.float32)


@pytest.mark.parametrize("beam", [1, 4, 8])
def test_beam_search_matches_oracle(rnnt, rng, beam):
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.ops.beam_search import beam_search_batch
    from sherpa_vietnamese_asr_tpu.utils.beam_search_ref import ref_beam_search

    cfg, dec, joi, dec_fn, joi_fn = rnnt
    n, t = 3, 20
    enc = _random_enc(rng, n, t, cfg.encoder_out_dim)
    lens = np.array([20, 13, 7], dtype=np.int32)

    got = beam_search_batch(jnp.asarray(enc), jnp.asarray(lens), dec, joi,
                            cfg, beam_size=beam)
    for i in range(n):
        ref = ref_beam_search(enc[i, : lens[i]], dec_fn, joi_fn,
                              cfg.vocab_size, beam_size=beam)
        nt = int(got.num_tokens[i])
        assert nt == len(ref["tokens"]), f"chunk {i}: token count mismatch"
        np.testing.assert_array_equal(np.asarray(got.tokens[i])[:nt], ref["tokens"])
        np.testing.assert_array_equal(np.asarray(got.frames[i])[:nt], ref["frames"])
        np.testing.assert_allclose(np.asarray(got.tok_logp[i])[:nt],
                                   ref["tok_logp"], atol=1e-4)
        assert abs(float(got.total_logp[i]) - ref["total_logp"]) < 1e-3


def test_beam_search_with_hotwords_matches_oracle(rnnt, rng):
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.ops.beam_search import beam_search_batch
    from sherpa_vietnamese_asr_tpu.ops.hotword import build_hotword_tables
    from sherpa_vietnamese_asr_tpu.utils.beam_search_ref import ref_beam_search

    cfg, dec, joi, dec_fn, joi_fn = rnnt
    phrases = [[5, 9, 12], [5, 9], [30, 31, 32, 33], [12, 7]]
    scores = [1.5, 2.0, 1.0, 3.0]
    tables, graph = build_hotword_tables(phrases, scores, cfg.vocab_size)

    n, t = 2, 18
    enc = _random_enc(rng, n, t, cfg.encoder_out_dim)
    lens = np.array([18, 11], dtype=np.int32)
    got = beam_search_batch(jnp.asarray(enc), jnp.asarray(lens), dec, joi,
                            cfg, beam_size=8, hw_tables=tables,
                            with_hotwords=True)
    for i in range(n):
        ref = ref_beam_search(enc[i, : lens[i]], dec_fn, joi_fn,
                              cfg.vocab_size, beam_size=8, ctx_graph=graph)
        nt = int(got.num_tokens[i])
        assert nt == len(ref["tokens"])
        np.testing.assert_array_equal(np.asarray(got.tokens[i])[:nt], ref["tokens"])
        assert abs(float(got.total_logp[i]) - ref["total_logp"]) < 1e-3


def test_hotword_dense_tables_match_graph_walk(rng):
    from sherpa_vietnamese_asr_tpu.ops.hotword import (
        ContextGraph, build_dense_tables,
    )

    v = 40
    phrases = [[1, 2, 3], [2, 3, 4], [1, 2], [7, 8, 7, 8], [3]]
    scores = [1.0, 2.0, 0.5, 1.5, 4.0]
    graph = ContextGraph(phrases, scores)
    nxt, delta, node_score = build_dense_tables(graph, v)

    for _ in range(50):
        stream = rng.integers(0, v, size=30)
        node = graph.root
        state = 0
        total_obj, total_tab = 0.0, 0.0
        for tok in stream:
            d_obj, node = graph.forward_one_step(node, int(tok))
            total_obj += d_obj
            total_tab += float(delta[state, tok])
            state = int(nxt[state, tok])
            assert state == node.index
        total_obj += graph.finalize(node)
        total_tab += -float(node_score[state])
        assert abs(total_obj - total_tab) < 1e-6


def test_hotword_phrase_completion_scores():
    from sherpa_vietnamese_asr_tpu.ops.hotword import ContextGraph

    graph = ContextGraph([[1, 2, 3]], [1.5])

    def run(stream):
        node, total = graph.root, 0.0
        for tok in stream:
            d, node = graph.forward_one_step(node, tok)
            total += d
        return total + graph.finalize(node), node

    # Complete phrase: total boost == len * score, state resets to root.
    total, node = run([1, 2, 3])
    assert abs(total - 3 * 1.5) < 1e-6 and node is graph.root
    # Abandoned prefix: net zero after finalize.
    total, _ = run([1, 2, 9])
    assert abs(total) < 1e-6
    total, _ = run([1, 2])
    assert abs(total) < 1e-6


def test_entropy_metrics_formula(rng):
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.ops.beam_search import _entropy_metrics

    v = 50
    logits = rng.standard_normal((4, v)).astype(np.float32) * 3
    got = np.asarray(_entropy_metrics(jnp.asarray(logits), v))
    for i in range(4):
        # reference core/asr_engine.py:1173-1196
        x = logits[i] - logits[i].max()
        p = np.exp(x); p /= p.sum()
        entropy = -(p * np.log(p + 1e-30)).sum()
        alpha = 1.0 / 3.0
        ts = (1 / (alpha - 1)) * (1 - (p ** alpha).sum())
        ts_max = (1 / (alpha - 1)) * (1 - v ** (1 - alpha))
        sp = np.sort(p)[::-1]
        expect = [ts / ts_max, sp[0] - sp[1], entropy / math.log(v), sp[0]]
        np.testing.assert_allclose(got[i], expect, atol=1e-5)


def test_greedy_emits_at_most_one_token_per_frame(rnnt, rng):
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.ops.beam_search import beam_search_batch

    cfg, dec, joi, _, _ = rnnt
    enc = _random_enc(rng, 1, 30, cfg.encoder_out_dim)
    lens = np.array([30], dtype=np.int32)
    got = beam_search_batch(jnp.asarray(enc), jnp.asarray(lens), dec, joi,
                            cfg, beam_size=1)
    nt = int(got.num_tokens[0])
    assert nt <= 30
    frames = np.asarray(got.frames[0])[:nt]
    assert (np.diff(frames) >= 1).all()  # strictly increasing frames

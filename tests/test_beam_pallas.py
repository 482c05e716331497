# Pallas beam-search megakernel vs the XLA scan path (interpret mode on the
# CPU backend; the hardware lowering is additionally spot-checked by the
# verify recipe — Mosaic broadcast semantics differ from interpret, see the
# NOTE comments in ops/beam_search_pallas.py).
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sherpa_vietnamese_asr_tpu.models.registry import random_asr_model  # noqa: E402
from sherpa_vietnamese_asr_tpu.ops.beam_search import beam_search_batch  # noqa: E402
from sherpa_vietnamese_asr_tpu.ops.beam_search_pallas import (  # noqa: E402
    beam_search_batch_pallas,
)


@pytest.mark.parametrize("beam", [4, 8])
def test_pallas_beam_token_parity(rng, beam):
    """Token/frame-identical to the XLA path on identical f32 inputs."""
    model = random_asr_model(vocab_size=48, beam_size=beam,
                             compute_dtype="float32")
    B, T, E = 3, 20, model.rnnt_cfg.encoder_out_dim
    enc = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
    lens = jnp.asarray([20, 13, 1], jnp.int32)
    ref = beam_search_batch(enc, lens, model.dec_params, model.joi_params,
                            model.rnnt_cfg, beam_size=beam)
    out = beam_search_batch_pallas(enc, lens, model.dec_params,
                                   model.joi_params, model.rnnt_cfg,
                                   beam_size=beam, interpret=True)
    assert np.array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
    assert np.array_equal(np.asarray(out.frames), np.asarray(ref.frames))
    assert np.array_equal(np.asarray(out.num_tokens),
                          np.asarray(ref.num_tokens))
    np.testing.assert_allclose(np.asarray(out.total_logp),
                               np.asarray(ref.total_logp), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.tok_logp),
                               np.asarray(ref.tok_logp), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.entropy),
                               np.asarray(ref.entropy), atol=1e-4)


def test_pallas_beam_dedup_merges(rng):
    """A vocabulary of 2 forces identical emitted sequences across beams —
    the in-kernel log-add dedup must merge them exactly like the XLA path."""
    model = random_asr_model(vocab_size=2, beam_size=4,
                             compute_dtype="float32")
    B, T, E = 2, 12, model.rnnt_cfg.encoder_out_dim
    enc = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
    lens = jnp.full((B,), T, jnp.int32)
    ref = beam_search_batch(enc, lens, model.dec_params, model.joi_params,
                            model.rnnt_cfg, beam_size=4)
    out = beam_search_batch_pallas(enc, lens, model.dec_params,
                                   model.joi_params, model.rnnt_cfg,
                                   beam_size=4, interpret=True)
    assert np.array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
    np.testing.assert_allclose(np.asarray(out.total_logp),
                               np.asarray(ref.total_logp), atol=1e-4)


def test_decode_feats_jit_pallas_flag_cpu_fallback(rng):
    """use_pallas_beam composes inside decode_feats_jit (interpret=False is
    TPU-only, so here we just check the XLA branch is taken with hotwords)."""
    from sherpa_vietnamese_asr_tpu.pipeline.decoder import decode_feats_jit

    model = random_asr_model(vocab_size=32, beam_size=4,
                             compute_dtype="float32")
    feats = jnp.asarray(rng.standard_normal((2, 40, 80)).astype(np.float32))
    n = jnp.asarray([40, 30], jnp.int32)
    r1, _ = decode_feats_jit(feats, n, model.enc_params, model.dec_params,
                             model.joi_params, model.zip_cfg, model.rnnt_cfg,
                             4, use_pallas_beam=False)
    assert np.asarray(r1.tokens).shape[0] == 2


def test_pallas_beam_fast_dots_traces(rng):
    """fast_dots (bf16 3-pass serving dots) must trace and emit sane
    hypotheses; token parity with fp32 is intentionally NOT required (bf16
    serving mode is documented as not bit-stable)."""
    model = random_asr_model(vocab_size=48, beam_size=4,
                             compute_dtype="float32")
    B, T, E = 2, 12, model.rnnt_cfg.encoder_out_dim
    enc = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
    lens = jnp.asarray([12, 7], jnp.int32)
    out = beam_search_batch_pallas(enc, lens, model.dec_params,
                                   model.joi_params, model.rnnt_cfg,
                                   beam_size=4, interpret=True,
                                   fast_dots=True)
    n = np.asarray(out.num_tokens)
    assert n.shape == (2,) and (n <= np.asarray([12, 7])).all()
    assert np.isfinite(np.asarray(out.total_logp)).all()


def test_pallas_beam_hotword_parity(rng):
    """In-kernel hotword boosting: token/score-identical to the XLA hotword
    path (itself oracle-tested vs the dict-based reference algorithm)."""
    from sherpa_vietnamese_asr_tpu.ops.hotword import build_hotword_tables

    model = random_asr_model(vocab_size=48, beam_size=8,
                             compute_dtype="float32")
    phrases = [[5, 9, 12], [5, 9], [30, 31, 32, 33], [12, 7]]
    scores = [1.5, 2.0, 1.0, 3.0]
    tables, _ = build_hotword_tables(phrases, scores,
                                     model.rnnt_cfg.vocab_size)
    B, T, E = 3, 18, model.rnnt_cfg.encoder_out_dim
    enc = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
    lens = jnp.asarray([18, 11, 1], jnp.int32)
    ref = beam_search_batch(enc, lens, model.dec_params, model.joi_params,
                            model.rnnt_cfg, beam_size=8, hw_tables=tables,
                            with_hotwords=True)
    out = beam_search_batch_pallas(enc, lens, model.dec_params,
                                   model.joi_params, model.rnnt_cfg,
                                   beam_size=8, interpret=True,
                                   hw_tables=tables, with_hotwords=True)
    assert np.array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
    assert np.array_equal(np.asarray(out.frames), np.asarray(ref.frames))
    assert np.array_equal(np.asarray(out.num_tokens),
                          np.asarray(ref.num_tokens))
    np.testing.assert_allclose(np.asarray(out.total_logp),
                               np.asarray(ref.total_logp), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.tok_logp),
                               np.asarray(ref.tok_logp), atol=1e-4)


def test_pallas_beam_hotword_fixture_parity():
    """The frozen beam fixture's hotword cases decode identically through
    the megakernel (interpret mode)."""
    import json
    import os

    import jax

    from sherpa_vietnamese_asr_tpu.models import rnnt as m
    from sherpa_vietnamese_asr_tpu.ops.hotword import build_hotword_tables

    fixture = os.path.join(os.path.dirname(__file__), "data",
                           "beam_fixture.json")
    with open(fixture) as f:
        fx = json.load(f)
    cfg = m.RnntConfig(**fx["rnnt_cfg"])
    k1, k2 = jax.random.split(jax.random.PRNGKey(fx["prng_seed"]))
    dec = m.init_decoder_params(k1, cfg)
    joi = m.init_joiner_params(k2, cfg)
    rng2 = np.random.default_rng(fx["enc_seed"])
    enc = (rng2.standard_normal(fx["enc_shape"])
           * fx["enc_scale"]).astype(np.float32)
    lens = np.asarray(fx["lens"], np.int32)
    tables, _ = build_hotword_tables(fx["hotword_phrases"],
                                     fx["hotword_scores"], cfg.vocab_size)
    for case in fx["cases"]:
        if not case["hotwords"] or case["beam"] < 4:
            continue
        got = beam_search_batch_pallas(
            jnp.asarray(enc), jnp.asarray(lens), dec, joi, cfg,
            beam_size=case["beam"], interpret=True,
            hw_tables=tables, with_hotwords=True)
        for i, exp in enumerate(case["expected"]):
            nt = int(got.num_tokens[i])
            label = f"pallas beam={case['beam']} hw chunk={i}"
            assert nt == len(exp["tokens"]), label
            np.testing.assert_array_equal(
                np.asarray(got.tokens[i])[:nt], exp["tokens"],
                err_msg=label)
            assert abs(float(got.total_logp[i]) - exp["total_logp"]) < 1e-3, \
                label


def test_pallas_beam_all_blank(rng):
    """Zero emissions: a joiner biased hard toward blank must reconstruct
    empty frames/tok_logp/entropy (the streamed-records reverse walk starts
    at n=0 and every scatter lands in the drop column)."""
    model = random_asr_model(vocab_size=16, beam_size=4,
                             compute_dtype="float32")
    joi = jax.tree_util.tree_map(jnp.zeros_like, model.joi_params)
    joi["output"]["bias"] = joi["output"]["bias"].at[0].set(20.0)
    B, T, E = 2, 8, model.rnnt_cfg.encoder_out_dim
    enc = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
    lens = jnp.asarray([8, 3], jnp.int32)
    ref = beam_search_batch(enc, lens, model.dec_params, joi,
                            model.rnnt_cfg, beam_size=4)
    out = beam_search_batch_pallas(enc, lens, model.dec_params, joi,
                                   model.rnnt_cfg, beam_size=4,
                                   interpret=True)
    assert np.asarray(ref.num_tokens).tolist() == [0, 0]
    assert np.asarray(out.num_tokens).tolist() == [0, 0]
    np.testing.assert_array_equal(np.asarray(out.frames),
                                  np.asarray(ref.frames))
    np.testing.assert_allclose(np.asarray(out.tok_logp),
                               np.asarray(ref.tok_logp), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.entropy),
                               np.asarray(ref.entropy), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.total_logp),
                               np.asarray(ref.total_logp), atol=1e-4)


def test_pallas_margin_zero_on_exact_tie(rng):
    """Exact probability ties among the top lanes must yield margin
    pm1-pm2 == 0 (lax.top_k first-occurrence semantics), not the next
    distinct probability — the kernel masks only the argmax lane."""
    model = random_asr_model(vocab_size=16, beam_size=4,
                             compute_dtype="float32")
    # Joiner forced to constant logits: 0 everywhere, blank pushed to -8.
    # Every frame then emits a token from a 15-way exact tie.
    joi = jax.tree_util.tree_map(jnp.zeros_like, model.joi_params)
    joi["output"]["bias"] = joi["output"]["bias"].at[0].set(-8.0)
    B, T, E = 2, 6, model.rnnt_cfg.encoder_out_dim
    enc = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
    lens = jnp.full((B,), T, jnp.int32)
    ref = beam_search_batch(enc, lens, model.dec_params, joi,
                            model.rnnt_cfg, beam_size=4)
    out = beam_search_batch_pallas(enc, lens, model.dec_params, joi,
                                   model.rnnt_cfg, beam_size=4,
                                   interpret=True)
    n = int(np.asarray(ref.num_tokens)[0])
    assert n > 0
    # margin is metrics[..., 1]
    ref_m = np.asarray(ref.entropy)[0, :n, 1]
    out_m = np.asarray(out.entropy)[0, :n, 1]
    np.testing.assert_allclose(ref_m, 0.0, atol=1e-6)
    np.testing.assert_allclose(out_m, ref_m, atol=1e-6)


@pytest.mark.parametrize("T", [20, 19])  # even and odd (frame-axis padding)
def test_pallas_beam_unroll2_parity(rng, T):
    """unroll=2 (two frames per grid step) is bit-identical to unroll=1:
    same state chain, same streamed records, frame padding is a no-op."""
    model = random_asr_model(vocab_size=48, beam_size=8,
                             compute_dtype="float32")
    B, E = 3, model.rnnt_cfg.encoder_out_dim
    enc = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
    lens = jnp.asarray([T, T - 6, 1], jnp.int32)
    ref = beam_search_batch_pallas(enc, lens, model.dec_params,
                                   model.joi_params, model.rnnt_cfg,
                                   beam_size=8, interpret=True)
    out = beam_search_batch_pallas(enc, lens, model.dec_params,
                                   model.joi_params, model.rnnt_cfg,
                                   beam_size=8, interpret=True, unroll=2)
    assert np.array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
    assert np.array_equal(np.asarray(out.frames), np.asarray(ref.frames))
    assert np.array_equal(np.asarray(out.num_tokens),
                          np.asarray(ref.num_tokens))
    np.testing.assert_array_equal(np.asarray(out.total_logp),
                                  np.asarray(ref.total_logp))
    np.testing.assert_array_equal(np.asarray(out.tok_logp),
                                  np.asarray(ref.tok_logp))
    np.testing.assert_array_equal(np.asarray(out.entropy),
                                  np.asarray(ref.entropy))


def test_pallas_beam_unroll2_hotword_parity(rng):
    """unroll=2 with the in-kernel hotword automaton matches unroll=1."""
    from sherpa_vietnamese_asr_tpu.ops.hotword import build_hotword_tables

    model = random_asr_model(vocab_size=48, beam_size=8,
                             compute_dtype="float32")
    B, T, E = 2, 14, model.rnnt_cfg.encoder_out_dim
    enc = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
    lens = jnp.asarray([T, 9], jnp.int32)
    tables, _ = build_hotword_tables([[5, 7], [11, 3, 9]], [2.5, 2.5],
                                     model.rnnt_cfg.vocab_size)
    kw = dict(beam_size=8, interpret=True, hw_tables=tables,
              with_hotwords=True)
    ref = beam_search_batch_pallas(enc, lens, model.dec_params,
                                   model.joi_params, model.rnnt_cfg, **kw)
    out = beam_search_batch_pallas(enc, lens, model.dec_params,
                                   model.joi_params, model.rnnt_cfg,
                                   unroll=2, **kw)
    assert np.array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
    assert np.array_equal(np.asarray(out.num_tokens),
                          np.asarray(ref.num_tokens))
    np.testing.assert_array_equal(np.asarray(out.total_logp),
                                  np.asarray(ref.total_logp))

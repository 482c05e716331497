# Frozen-data beam-search parity (VERDICT round-1 item 10).
#
# tests/data/beam_fixture.json holds logits->tokens expectations generated
# ONCE from the dict-based reference algorithm (utils/beam_search_ref.py,
# mirroring reference core/asr_engine.py:1023-1171) and checked in as data.
# The TPU implementation is tested against the DATA, so a bug introduced
# into both live implementations in tandem still fails here.
import json
import os

import numpy as np

FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "beam_fixture.json")


def test_beam_search_matches_frozen_fixture():
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models import rnnt as m
    from sherpa_vietnamese_asr_tpu.ops.beam_search import beam_search_batch
    from sherpa_vietnamese_asr_tpu.ops.hotword import build_hotword_tables

    with open(FIXTURE) as f:
        fx = json.load(f)

    cfg = m.RnntConfig(**fx["rnnt_cfg"])
    k1, k2 = jax.random.split(jax.random.PRNGKey(fx["prng_seed"]))
    dec = m.init_decoder_params(k1, cfg)
    joi = m.init_joiner_params(k2, cfg)
    wsum = float(sum(np.abs(np.asarray(x)).sum()
                     for x in jax.tree.leaves(dec))
                 + sum(np.abs(np.asarray(x)).sum()
                       for x in jax.tree.leaves(joi)))
    # If the JAX PRNG ever changes, the weights no longer match the frozen
    # expectations — fail loudly rather than comparing garbage.
    assert abs(wsum - fx["weights_abs_sum"]) < 0.5, (
        f"PRNG-derived weights changed (abs sum {wsum} vs frozen "
        f"{fx['weights_abs_sum']}); regenerate the fixture deliberately")

    rng = np.random.default_rng(fx["enc_seed"])
    enc = (rng.standard_normal(fx["enc_shape"])
           * fx["enc_scale"]).astype(np.float32)
    lens = np.asarray(fx["lens"], np.int32)
    tables, _ = build_hotword_tables(fx["hotword_phrases"],
                                     fx["hotword_scores"], cfg.vocab_size)

    for case in fx["cases"]:
        got = beam_search_batch(
            jnp.asarray(enc), jnp.asarray(lens), dec, joi, cfg,
            beam_size=case["beam"],
            hw_tables=tables if case["hotwords"] else None,
            with_hotwords=case["hotwords"])
        for i, exp in enumerate(case["expected"]):
            nt = int(got.num_tokens[i])
            label = f"beam={case['beam']} hw={case['hotwords']} chunk={i}"
            assert nt == len(exp["tokens"]), label
            np.testing.assert_array_equal(
                np.asarray(got.tokens[i])[:nt], exp["tokens"],
                err_msg=label)
            np.testing.assert_array_equal(
                np.asarray(got.frames[i])[:nt], exp["frames"],
                err_msg=label)
            np.testing.assert_allclose(
                np.asarray(got.tok_logp[i])[:nt], exp["tok_logp"],
                atol=1e-4, err_msg=label)
            assert abs(float(got.total_logp[i]) - exp["total_logp"]) < 1e-3, \
                label

# True-size end-to-end golden fixture (VERDICT r3 task 3).
#
# tests/data/golden_e2e.json freezes the full composition
# fbank -> Zipformer-30M encoder -> RNN-T beam -> words, generated ONCE by
# scripts/make_golden_e2e.py which runs BOTH stacks (numpy ONNX graph
# executor vs production JAX) and asserts token identity before writing.
# Here the production path must reproduce the frozen data token-for-token —
# a bug introduced into encoder, beam, fbank, or the ONNX layout contract
# shows up as a diff against DATA, not against a live twin implementation.
import json
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "golden_e2e.json")


@pytest.fixture(scope="module")
def fx():
    with open(FIXTURE) as f:
        return json.load(f)


@pytest.mark.slow
def test_emitted_graphs_execute_and_roundtrip(tmp_path):
    """Tiny-size fast check of the executable-graph emitter: exec output
    matches the JAX forwards and the file re-imports leaf-for-leaf."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.onnx_exec import run_onnx
    from sherpa_vietnamese_asr_tpu.models.onnx_export_rnnt import (
        export_asr_dir,
    )
    from sherpa_vietnamese_asr_tpu.models.onnx_import import (
        load_zipformer_rnnt,
    )
    from sherpa_vietnamese_asr_tpu.models.registry import (
        TINY_ZIPFORMER, random_asr_model,
    )
    from sherpa_vietnamese_asr_tpu.models.rnnt import (
        decoder_forward, joiner_forward,
    )
    from sherpa_vietnamese_asr_tpu.models.zipformer import zipformer_encoder

    zc = dataclasses.replace(TINY_ZIPFORMER, pos_dtype="float32")
    m = random_asr_model(vocab_size=50, zip_cfg=zc)
    t_in = 103
    paths = export_asr_dir(m, str(tmp_path), t_in)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, t_in, 80)).astype(np.float32) * 0.5
    (enc_onnx,) = run_onnx(paths["encoder"], {"x": x})
    enc_jax, lens = zipformer_encoder(m.enc_params, jnp.asarray(x),
                                      jnp.asarray([t_in]), zc)
    enc_jax = np.asarray(enc_jax)[0, : int(lens[0])]
    assert enc_onnx.shape == (1,) + enc_jax.shape
    np.testing.assert_allclose(enc_onnx[0], enc_jax, atol=2e-5)

    y = rng.integers(0, 50, (5, 2)).astype(np.int64)
    (dec_onnx,) = run_onnx(paths["decoder"], {"y": y})
    dec_jax = np.asarray(decoder_forward(
        m.dec_params, jnp.asarray(y.astype(np.int32)), m.rnnt_cfg))
    np.testing.assert_allclose(dec_onnx, dec_jax, atol=1e-5)

    eo = rng.standard_normal((5, zc.output_dim)).astype(np.float32)
    (logits_onnx,) = run_onnx(paths["joiner"], {
        "encoder_out": eo, "decoder_out": dec_onnx.astype(np.float32)})
    logits_jax = np.asarray(joiner_forward(m.joi_params, jnp.asarray(eo),
                                           jnp.asarray(dec_jax)))
    np.testing.assert_allclose(logits_onnx, logits_jax, atol=1e-5)

    ep, dp, jp = load_zipformer_rnnt(str(tmp_path), zc, m.rnnt_cfg)
    for a, b in zip(jax.tree.leaves((ep, dp, jp)),
                    jax.tree.leaves((m.enc_params, m.dec_params,
                                     m.joi_params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_jax_stack_reproduces_frozen_fixture(fx):
    """Production path vs frozen data at TRUE model size, token-for-token."""
    from sherpa_vietnamese_asr_tpu.models import golden

    model = golden.golden_model()
    wsum = golden.weights_abs_sum(model)
    # If the JAX PRNG ever changes, weights no longer match the frozen
    # expectations — fail loudly rather than comparing garbage.
    assert abs(wsum - fx["weights_abs_sum"]) < 2.0, (
        f"PRNG-derived weights changed (abs sum {wsum} vs frozen "
        f"{fx['weights_abs_sum']}); regenerate deliberately via "
        "scripts/make_golden_e2e.py")

    audio = golden.golden_audio(fx["duration_sec"], fx["sample_rate"])
    tokens, res, enc, feats = golden.run_jax_stack(model, audio)
    assert feats.shape[0] == fx["t_in"]
    assert list(enc.shape) == fx["enc_out_shape"]
    assert tokens == fx["tokens"], (
        f"{sum(a == b for a, b in zip(tokens, fx['tokens']))} of "
        f"{len(fx['tokens'])} tokens match")
    n = len(tokens)
    np.testing.assert_array_equal(np.asarray(res.frames[0])[:n],
                                  fx["frames"])
    np.testing.assert_allclose(np.asarray(res.tok_logp[0])[:n],
                               fx["tok_logp"], atol=2e-3)
    assert abs(float(res.total_logp[0]) - fx["total_logp"]) < 0.05
    assert golden.tokens_to_words(tokens, model.id2token) == fx["words"]

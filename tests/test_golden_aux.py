# Golden fixtures for the auxiliary model families (round-4 verdict item 4).
#
# tests/data/golden_aux.json freezes PyanNet / ResNet34 / ViBERT / DNSMOS
# outputs plus the full PureDiarizer composition, generated ONCE by
# scripts/make_golden_aux.py which runs BOTH independent stacks (executable
# ONNX through the numpy graph executor vs production JAX) and asserts
# parity before freezing. Here:
#   - fast tier: tiny-size exec-vs-JAX parity of each emitter (the emitters
#     themselves are the code under test),
#   - slow tier: the production JAX path reproduces the frozen true-size
#     outputs (a regression diffs against DATA, not a live twin).
import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "golden_aux.json")


@pytest.fixture(scope="module")
def fx():
    with open(FIXTURE) as f:
        return json.load(f)


def _exec(data, feeds):
    from sherpa_vietnamese_asr_tpu.models.onnx_exec import run_onnx
    from sherpa_vietnamese_asr_tpu.models.onnx_import import read_onnx

    with tempfile.NamedTemporaryFile(suffix=".onnx", delete=False) as f:
        f.write(data)
        p = f.name
    try:
        g = read_onnx(p)
        assert g["nodes"], "emitted graph has no nodes"
        names = [n for n in g["inputs"] if n not in g["initializers"]]
        assert len(names) == len(feeds)
        return run_onnx(g, dict(zip(names, feeds)))
    finally:
        os.unlink(p)


def _tree_abs_sum(tree):
    return float(sum(np.abs(np.asarray(p)).sum()
                     for p in jax.tree.leaves(tree)))


def _diarization_audio(seconds=20, sr=16000, seed=0):
    t = np.arange(sr * seconds) / sr
    x = np.zeros(sr * seconds, np.float32)
    for k in range(seconds // 4):
        f0, am = (200.0, 2.0) if k % 2 == 0 else (340.0, 3.1)
        s, e = k * 4 * sr, (k * 4 + 3) * sr
        tt = t[s:e]
        x[s:e] = (0.3 * np.sin(2 * np.pi * f0 * tt)
                  * (0.5 + 0.5 * np.sin(2 * np.pi * am * tt)))
    x += 0.01 * np.random.default_rng(seed).standard_normal(len(x)).astype(
        np.float32)
    return x


# ---------------------------------------------------------------------------
# Fast tier: tiny-size emitter parity
# ---------------------------------------------------------------------------

def test_pyannet_emitter_parity(rng):
    from sherpa_vietnamese_asr_tpu.models import onnx_export_aux as ax
    from sherpa_vietnamese_asr_tpu.models.pyannet import (
        PyanNetConfig, init_pyannet_params, pyannet_forward)

    cfg = PyanNetConfig(sinc_filters=8, conv_channels=6, lstm_hidden=4,
                        lstm_layers=2, linear_dim=5)
    p = init_pyannet_params(jax.random.PRNGKey(0), cfg)
    audio = (rng.standard_normal((2, 4000)) * 0.1).astype(np.float32)
    ref = np.asarray(pyannet_forward(p, jnp.asarray(audio), cfg))
    got = _exec(ax.build_pyannet_graph(p, cfg, 2, 4000), [audio])[0]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_resnet_emitter_parity(rng):
    from sherpa_vietnamese_asr_tpu.models import onnx_export_aux as ax
    from sherpa_vietnamese_asr_tpu.models.resnet_speaker import (
        TINY_RESNET, init_resnet_params, resnet_frame_features)

    p = init_resnet_params(jax.random.PRNGKey(3), TINY_RESNET)
    feats = rng.standard_normal((2, 40, 80)).astype(np.float32)
    ref = np.asarray(resnet_frame_features(p, jnp.asarray(feats),
                                           TINY_RESNET))
    got = _exec(ax.build_resnet_encoder_graph(p, TINY_RESNET, 2, 40),
                [feats])[0]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_vibert_emitter_parity(rng):
    from sherpa_vietnamese_asr_tpu.models import onnx_export_aux as ax
    from sherpa_vietnamese_asr_tpu.models.vibert import (
        TINY_VIBERT, init_vibert_params, vibert_forward)

    p = init_vibert_params(jax.random.PRNGKey(7), TINY_VIBERT)
    B, T, W = 2, 16, 6
    ids = rng.integers(0, 200, (B, T)).astype(np.int64)
    mask = np.ones((B, T), np.int64)
    mask[0, 12:] = 0
    types = np.zeros((B, T), np.int64)
    offs = np.sort(rng.integers(0, 12, (B, W)), axis=1).astype(np.int64)
    r1, r2 = vibert_forward(p, jnp.asarray(ids), jnp.asarray(mask),
                            jnp.asarray(types), jnp.asarray(offs),
                            TINY_VIBERT)
    g1, g2 = _exec(ax.build_vibert_graph(p, TINY_VIBERT, B, T, W),
                   [ids, mask, types, offs])
    np.testing.assert_allclose(g1, np.asarray(r1), atol=1e-3)
    np.testing.assert_allclose(g2, np.asarray(r2), atol=1e-3)


def test_dnsmos_emitter_parity(rng):
    from sherpa_vietnamese_asr_tpu.models import onnx_export_aux as ax
    from sherpa_vietnamese_asr_tpu.models.dnsmos import (
        DnsmosConfig, INPUT_SAMPLES, dnsmos_forward, init_dnsmos_params)

    cfg = DnsmosConfig()
    p = init_dnsmos_params(jax.random.PRNGKey(11), cfg)
    audio = (0.1 * rng.standard_normal((1, INPUT_SAMPLES))).astype(
        np.float32)
    ref = np.asarray(dnsmos_forward(p, jnp.asarray(audio), cfg))
    got = _exec(ax.build_dnsmos_graph(p, cfg, 1), [audio])[0]
    np.testing.assert_allclose(got, ref, atol=2e-2)


# ---------------------------------------------------------------------------
# Slow tier: production JAX reproduces the frozen true-size fixture
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_frozen_pyannet(fx):
    from sherpa_vietnamese_asr_tpu.models.pyannet import (
        CHUNK_SAMPLES, PyanNetConfig, init_pyannet_params, pyannet_forward)

    d = fx["pyannet"]
    cfg = PyanNetConfig()
    p = init_pyannet_params(jax.random.PRNGKey(d["seed"]), cfg)
    assert abs(_tree_abs_sum(p) - d["weights_abs_sum"]) \
        < 1e-4 * abs(d["weights_abs_sum"]), \
        "PRNG-derived weights changed — regenerate the fixture deliberately"
    audio = _diarization_audio(10)[None, :CHUNK_SAMPLES]
    out = np.asarray(pyannet_forward(p, jnp.asarray(audio), cfg))
    assert np.argmax(out[0], axis=-1).tolist() == d["argmax"]
    assert abs(float(np.abs(out).sum()) - d["abs_sum"]) \
        < 1e-3 * abs(d["abs_sum"])


@pytest.mark.slow
def test_frozen_resnet_embedding(fx):
    from sherpa_vietnamese_asr_tpu.models.resnet_speaker import (
        ResNetSpeakerConfig, init_resnet_params, project_embedding,
        resnet_frame_features)
    from sherpa_vietnamese_asr_tpu.ops.stats_pool import masked_stats_pool

    d = fx["resnet"]
    cfg = ResNetSpeakerConfig()
    p = init_resnet_params(jax.random.PRNGKey(d["seed"]), cfg)
    assert abs(_tree_abs_sum(p) - d["weights_abs_sum"]) \
        < 1e-4 * abs(d["weights_abs_sum"])
    feats = (np.random.default_rng(d["seed"])
             .standard_normal((1, 200, 80)).astype(np.float32))
    frame_feat = resnet_frame_features(p, jnp.asarray(feats), cfg)
    assert abs(float(np.abs(np.asarray(frame_feat)).sum())
               - d["frame_abs_sum"]) < 1e-3 * abs(d["frame_abs_sum"])
    weights = jnp.ones((1, 1, frame_feat.shape[-1]))
    emb = np.asarray(project_embedding(
        p, masked_stats_pool(frame_feat, weights)))[0, 0]
    np.testing.assert_allclose(emb, np.asarray(d["embedding"]), atol=1e-3)


@pytest.mark.slow
def test_frozen_vibert(fx):
    from sherpa_vietnamese_asr_tpu.models.vibert import (
        ViBertConfig, init_vibert_params, vibert_forward)

    d = fx["vibert"]
    cfg = ViBertConfig()
    p = init_vibert_params(jax.random.PRNGKey(d["seed"]), cfg)
    assert abs(_tree_abs_sum(p) - d["weights_abs_sum"]) \
        < 1e-4 * abs(d["weights_abs_sum"])
    vrng = np.random.default_rng(d["seed"])
    B, T, W = 2, 64, 16
    ids = vrng.integers(0, cfg.vocab_size, (B, T)).astype(np.int64)
    mask = np.ones((B, T), np.int64)
    mask[1, 48:] = 0
    types = np.zeros((B, T), np.int64)
    offs = np.sort(vrng.integers(0, 48, (B, W)), axis=1).astype(np.int64)
    r1, r2 = vibert_forward(p, jnp.asarray(ids), jnp.asarray(mask),
                            jnp.asarray(types), jnp.asarray(offs), cfg)
    assert np.argmax(np.asarray(r1), -1).tolist() == d["labels_argmax"]
    assert np.argmax(np.asarray(r2), -1).tolist() == d["d_tags_argmax"]
    got = float(np.abs(np.asarray(r1)).sum())
    assert abs(got - d["labels_abs_sum"]) < 1e-3 * abs(d["labels_abs_sum"])


@pytest.mark.slow
def test_frozen_dnsmos(fx):
    from sherpa_vietnamese_asr_tpu.models.dnsmos import (
        DnsmosConfig, INPUT_SAMPLES, dnsmos_forward, init_dnsmos_params)

    d = fx["dnsmos"]
    cfg = DnsmosConfig()
    p = init_dnsmos_params(jax.random.PRNGKey(d["seed"]), cfg)
    assert abs(_tree_abs_sum(p) - d["weights_abs_sum"]) \
        < 1e-4 * abs(d["weights_abs_sum"])
    audio = _diarization_audio(10)[None, :INPUT_SAMPLES]
    out = np.asarray(dnsmos_forward(p, jnp.asarray(audio), cfg))
    np.testing.assert_allclose(out[0], np.asarray(d["scores"]), atol=1e-3)


@pytest.mark.slow
def test_frozen_diarization_composition(fx):
    """The full production diarizer (fused superblocks + clustering)
    reproduces the frozen segments on the synthetic two-speaker WAV."""
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_pure import (
        PureDiarizer)

    d = fx["diarization_composition"]
    audio = _diarization_audio(d["audio_seconds"])
    assert abs(float(np.abs(audio).sum()) - d["audio_abs_sum"]) \
        < 1e-3 * abs(d["audio_abs_sum"])
    segs = PureDiarizer(fused=True).process(audio)
    frozen = d["segments"]
    assert len(segs) == len(frozen)
    for got, want in zip(segs, frozen):
        assert got["speaker"] == want["speaker"]
        assert abs(float(got["start"]) - want["start"]) < 0.05
        assert abs(float(got["end"]) - want["end"]) < 0.05

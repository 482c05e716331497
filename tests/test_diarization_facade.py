# Diarization facade: registry, dispatch, run_diarization orchestration.
import numpy as np
import pytest


def test_registry_and_threshold():
    from sherpa_vietnamese_asr_tpu.pipeline.diarization import (
        SPEAKER_EMBEDDING_MODELS, get_available_models, get_default_threshold,
    )
    models = get_available_models()
    assert "community1_pure_ort" in models
    assert "senko_campp_optimized" in models
    assert get_default_threshold("community1_pure_ort") == 0.6


def test_run_diarization_with_stub_backend(monkeypatch):
    from sherpa_vietnamese_asr_tpu.pipeline import diarization as dz

    class StubBackend:
        overlap_regions = [(1.0, 2.5)]

        def process(self, audio, progress_callback=None):
            return [{"start": 0.0, "end": 2.0, "speaker": 0},
                    {"start": 2.0, "end": 4.0, "speaker": 1}]

    monkeypatch.setattr(
        dz.SpeakerDiarizer, "initialize",
        lambda self: setattr(self, "_backend", StubBackend()) or self)

    words = [{"text": f"w{i}", "start": 0.3 * i, "end": 0.3 * i + 0.2}
             for i in range(12)]
    segments = [{"text": " ".join(f"w{i}" for i in range(12)),
                 "start": 0.0, "end": 3.8, "raw_words": words}]
    phases = []
    raw, elapsed, results = dz.run_diarization(
        np.zeros(16000 * 4, np.float32), segments,
        progress_callback=phases.append)
    assert len(raw) == 2
    assert raw[0]["speaker"] == "Người nói 1"
    assert elapsed >= 0
    # sentence split across the two speakers
    assert len(results) >= 2
    spk_ids = {r["speaker_id"] for r in results}
    assert spk_ids == {0, 1}
    total_words = sum(len(r.get("raw_words", [])) for r in results)
    assert total_words == 12
    assert any(p.startswith("PHASE:Diarization") for p in phases)


def test_public_api_surface():
    import sherpa_vietnamese_asr_tpu as svt
    for name in ("TranscriberPipeline", "load_audio", "run_diarization",
                 "serialize_segments", "deserialize_segments",
                 "merge_chunks_with_overlap", "split_long_segments",
                 "find_silent_regions", "get_vad_segments",
                 "SpeakerDiarizer", "SPEAKER_EMBEDDING_MODELS"):
        assert hasattr(svt, name), name

# DNSMOS quality stage tests.
import numpy as np


def test_dnsmos_scores_in_range(rng):
    from sherpa_vietnamese_asr_tpu.pipeline.quality import QualityAnalyzer

    qa = QualityAnalyzer()
    audio = (0.1 * rng.standard_normal(16000 * 3)).astype(np.float32)
    scores = qa.compute_dnsmos(audio)
    assert scores is not None
    for k in ("SIG", "BAK", "OVRL"):
        assert 1.0 <= scores[k] <= 5.0


def test_analyze_speech_stratified(rng):
    from sherpa_vietnamese_asr_tpu.pipeline.quality import QualityAnalyzer

    qa = QualityAnalyzer()
    audio = (0.1 * rng.standard_normal(16000 * 40)).astype(np.float32)
    info = qa.analyze_speech(audio)
    assert info is not None
    assert set(info) == {"dnsmos_sig", "dnsmos_bak", "dnsmos_ovrl"}
    # too-short speech returns None
    assert qa.analyze_speech(np.zeros(4000, np.float32)) is None


def test_polynomial_mapping_matches_reference():
    from sherpa_vietnamese_asr_tpu.pipeline.quality import QualityAnalyzer

    raw = np.array([3.0, 2.5, 3.2])
    out = QualityAnalyzer._map_scores(raw)
    p_sig = np.poly1d([-0.08397278, 1.22083953, 0.0052439])
    assert abs(out["SIG"] - np.clip(p_sig(3.0), 1, 5)) < 1e-9

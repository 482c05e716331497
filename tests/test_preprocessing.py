# Audio preprocessing: RMS normalization, WPE, peak limiter.
import numpy as np


def test_rms_normalize_equalizes_segments(rng):
    from sherpa_vietnamese_asr_tpu.pipeline.preprocessing import (
        compute_segment_rms, per_segment_rms_normalize,
    )
    sr = 16000
    audio = np.zeros(sr * 4, np.float32)
    audio[: sr] = 0.02 * rng.standard_normal(sr)        # quiet
    audio[sr * 2: sr * 3] = 0.4 * rng.standard_normal(sr)  # loud
    segs = [(0, sr), (sr * 2, sr * 3)]
    out = per_segment_rms_normalize(audio, segs, sr)
    r1 = compute_segment_rms(out[: sr])
    r2 = compute_segment_rms(out[sr * 2: sr * 3])
    ratio_before = compute_segment_rms(audio[sr * 2: sr * 3]) / \
        compute_segment_rms(audio[: sr])
    assert ratio_before > 10
    assert 0.8 < r2 / r1 < 1.25  # within gain clamp, nearly equal
    # non-speech region untouched
    np.testing.assert_allclose(out[sr + 200: sr * 2 - 200],
                               audio[sr + 200: sr * 2 - 200])


def test_gain_clamped_at_20db(rng):
    from sherpa_vietnamese_asr_tpu.pipeline.preprocessing import (
        per_segment_rms_normalize,
    )
    sr = 16000
    audio = np.zeros(sr * 2, np.float32)
    audio[: sr] = 1e-4 * rng.standard_normal(sr)  # extremely quiet
    audio[sr:] = 0.3 * rng.standard_normal(sr)
    out = per_segment_rms_normalize(audio, [(0, sr), (sr, sr * 2)], sr)
    boost = np.abs(out[: sr]).max() / np.abs(audio[: sr]).max()
    assert boost <= 10.0 + 1e-3  # 20 dB cap


def test_peak_limiter():
    from sherpa_vietnamese_asr_tpu.pipeline.preprocessing import (
        adaptive_peak_limit,
    )
    x = np.array([0.5, -2.0, 1.0], np.float32)
    y = adaptive_peak_limit(x)
    assert abs(np.abs(y).max() - 0.95) < 1e-6
    x2 = np.array([0.5, -0.5], np.float32)
    np.testing.assert_array_equal(adaptive_peak_limit(x2), x2)


def test_wpe_reduces_reverb_energy(rng):
    from sherpa_vietnamese_asr_tpu.pipeline.preprocessing import (
        apply_wpe_dereverberation,
    )
    sr = 16000
    # dry impulsive source + synthetic late reverb tail
    dry = np.zeros(sr * 3, np.float32)
    for i in range(30):
        dry[int(i * 0.1 * sr)] = rng.standard_normal() * 0.5
    rir = np.zeros(sr // 2)
    rir[0] = 1.0
    tail = np.exp(-np.arange(400, len(rir)) / 2000.0)
    rir[400:] = 0.3 * tail * rng.standard_normal(len(rir) - 400)
    wet = np.convolve(dry, rir)[: len(dry)].astype(np.float32)

    out = apply_wpe_dereverberation(wet)
    assert out.shape == wet.shape
    assert np.isfinite(out).all()
    # energy in inter-impulse gaps (pure reverb) should drop
    gap_mask = np.ones(len(dry), bool)
    for i in range(30):
        s = int(i * 0.1 * sr)
        gap_mask[max(0, s - 200): s + 800] = False
    e_before = float((wet[gap_mask] ** 2).mean())
    e_after = float((out[gap_mask] ** 2).mean())
    assert e_after < e_before


def test_wpe_short_audio_passthrough():
    from sherpa_vietnamese_asr_tpu.pipeline.preprocessing import (
        apply_wpe_dereverberation,
    )
    x = np.ones(500, np.float32) * 0.1
    np.testing.assert_allclose(apply_wpe_dereverberation(x), x)

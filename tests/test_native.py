# Native audiokit (C++) vs pure-python parity.
import numpy as np
import pytest


@pytest.fixture(scope="module")
def lib():
    from sherpa_vietnamese_asr_tpu.utils.native import get_lib
    lib = get_lib()
    if lib is None:
        pytest.skip("g++ unavailable; pure-python fallback covers this")
    return lib


def test_native_wav_decode_matches_python(lib, tmp_path, rng):
    from sherpa_vietnamese_asr_tpu.utils.audio_io import read_wav, write_wav
    from sherpa_vietnamese_asr_tpu.utils.native import wav_decode_native

    x = np.clip(0.3 * rng.standard_normal((8000, 2)), -0.99, 0.99).astype(
        np.float32)
    p = tmp_path / "n.wav"
    write_wav(str(p), x, 22050)
    got = wav_decode_native(str(p))
    assert got is not None
    audio, rate = got
    assert rate == 22050
    ref, rrate = read_wav(str(p))
    ref_mono = ref.mean(axis=1)
    np.testing.assert_allclose(audio, ref_mono, atol=1e-6)


@pytest.mark.slow
def test_native_resample_matches_python(lib, rng):
    from sherpa_vietnamese_asr_tpu.utils.audio_io import resample_poly
    from sherpa_vietnamese_asr_tpu.utils.native import resample_native

    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    got = resample_native(x, sr_in, sr_out)
    assert got is not None
    # same dominant tone, comparable length
    assert abs(len(got) - sr_out) <= 2
    spec = np.abs(np.fft.rfft(got[1000:-1000] * np.hanning(len(got) - 2000)))
    freq = np.fft.rfftfreq(len(got) - 2000, 1.0 / sr_out)
    assert abs(freq[spec.argmax()] - 440) < 5
    # numeric agreement with the python polyphase in the interior
    ref = resample_poly(x, sr_in, sr_out)
    n = min(len(got), len(ref))
    err = np.abs(got[200: n - 200] - ref[200: n - 200]).max()
    assert err < 5e-3


def test_load_audio_uses_native_path(tmp_path, rng):
    from sherpa_vietnamese_asr_tpu.utils import native
    from sherpa_vietnamese_asr_tpu.utils.audio_io import load_audio, write_wav

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    x = (0.3 * np.sin(2 * np.pi * 300 * np.arange(32000) / 32000)).astype(
        np.float32)
    p = tmp_path / "r.wav"
    write_wav(str(p), x, 32000)
    audio = load_audio(str(p), 16000)
    assert abs(len(audio) - 16000) <= 2

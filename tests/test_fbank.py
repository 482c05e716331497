# Fbank parity tests: JAX/XLA (and Pallas-interpret) kernels vs the numpy
# Kaldi oracle, for all three reference configurations.
import numpy as np
import pytest

from sherpa_vietnamese_asr_tpu.utils import fbank_ref
from sherpa_vietnamese_asr_tpu.utils.fbank_ref import (
    ASR_FBANK, CAMPP_FBANK, RESNET_EMB_FBANK,
)


def _speechlike(rng, n, sr=16000):
    """Speech-shaped test signal: sum of AM tones + noise, float32 in [-1, 1]."""
    t = np.arange(n) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
         + 0.15 * np.sin(2 * np.pi * 1200 * t)
         + 0.05 * rng.standard_normal(n))
    return x.astype(np.float32)


@pytest.mark.parametrize("cfg,name", [
    (ASR_FBANK, "asr"), (RESNET_EMB_FBANK, "resnet"), (CAMPP_FBANK, "campp"),
])
def test_jax_fbank_matches_oracle(rng, cfg, name):
    from sherpa_vietnamese_asr_tpu.ops import fbank as jfb

    audio = _speechlike(rng, 16000 * 2 + 133)
    ref = fbank_ref.compute_fbank(audio, cfg)
    got = np.asarray(jfb.compute_fbank(audio, cfg, use_pallas=False))
    assert got.shape == ref.shape
    # fp32 matmul-DFT vs fp64 FFT: log-domain differences stay tiny on speech.
    assert np.max(np.abs(got - ref)) < 2e-2
    # Cosine per frame
    num = (got * ref).sum(-1)
    den = np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-9
    assert np.min(num / den) > 0.9999


def test_frame_count_matches_reference_formula(rng):
    from sherpa_vietnamese_asr_tpu.ops import fbank as jfb
    # snip_edges=False: floor((n + shift/2)/shift)  (PWA worker:468)
    for n in [511, 512, 1600, 16000, 16080, 48001]:
        assert fbank_ref.num_frames(n, ASR_FBANK) == (n + 80) // 160
        audio = _speechlike(rng, n)
        got = np.asarray(jfb.compute_fbank(audio, ASR_FBANK, use_pallas=False))
        assert got.shape[0] == (n + 80) // 160
    # snip_edges=True: 1 + (n - 400)//160
    assert fbank_ref.num_frames(400, RESNET_EMB_FBANK) == 1
    assert fbank_ref.num_frames(399, RESNET_EMB_FBANK) == 0
    assert fbank_ref.num_frames(720, RESNET_EMB_FBANK) == 3


def test_batched_fbank_matches_single(rng):
    from sherpa_vietnamese_asr_tpu.ops import fbank as jfb

    batch = np.stack([_speechlike(rng, 16000) for _ in range(3)])
    got = np.asarray(jfb.compute_fbank(batch, ASR_FBANK, use_pallas=False))
    for i in range(3):
        single = np.asarray(jfb.compute_fbank(batch[i], ASR_FBANK, use_pallas=False))
        np.testing.assert_allclose(got[i], single, rtol=0, atol=1e-4)


def test_pallas_kernel_interpret_matches_xla(rng):
    """Pallas kernel (interpret mode on CPU) ~= XLA path.

    The kernel intentionally runs the DFT as a 3-pass bf16 hi/lo split and
    the mel projection in one bf16 pass (ops/fbank.py _logmel_kernel), so
    its numerics differ from the HIGHEST-precision XLA path by up to ~1e-2
    in log-mel — the same 2e-2 gate the hardware spot-check uses."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from sherpa_vietnamese_asr_tpu.ops import fbank as jfb

    audio = _speechlike(rng, 16000)
    with pltpu.force_tpu_interpret_mode():
        got_pallas = np.asarray(jfb.compute_fbank(audio, ASR_FBANK, use_pallas=True))
    got_xla = np.asarray(jfb.compute_fbank(audio, ASR_FBANK, use_pallas=False))
    assert np.max(np.abs(got_pallas - got_xla)) < 2e-2


def test_mel_bank_properties():
    mb = fbank_ref.kaldi_mel_banks(ASR_FBANK)
    assert mb.shape == (80, 257)
    assert mb[:, -1].sum() == 0.0  # Nyquist excluded (Kaldi convention)
    assert (mb >= 0).all() and mb.max() <= 1.0
    # Every mel bin has support
    assert (mb.sum(axis=1) > 0).all()


def test_silence_hits_log_floor():
    audio = np.zeros(16000, dtype=np.float32)
    feats = fbank_ref.compute_fbank(audio, ASR_FBANK)
    np.testing.assert_allclose(feats, np.log(fbank_ref.FLT_EPSILON), rtol=1e-6)


def test_streamed_fbank_matches_direct(rng):
    from sherpa_vietnamese_asr_tpu.ops import fbank as jfb

    audio = _speechlike(rng, 16000 * 9 + 333)
    ref = np.asarray(jfb.compute_fbank(audio, RESNET_EMB_FBANK,
                                       use_pallas=False))
    got = jfb.compute_fbank_streamed(audio, RESNET_EMB_FBANK,
                                     block_frames=250)
    assert got.shape == ref.shape
    # fp32 matmul reassociation across block boundaries; log-domain
    np.testing.assert_allclose(got, ref, atol=5e-3)

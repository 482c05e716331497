# DNSMOS P.835 (sig_bak_ovr) quality model in functional JAX.
#
# TPU-native replacement for the reference's sig_bak_ovr.onnx session
# (reference core/audio_analyzer.py:248-305): input is 9.01 s of raw 16 kHz
# audio (144160 samples, NOT peak-normalized — the model is level-sensitive),
# output is three raw scores (SIG, BAK, OVRL) which the caller maps through
# Microsoft's polynomial fit. Internals follow the DNSMOS architecture:
# log-power mel spectrogram (n_fft 320, hop 160, 120 mels) -> small CNN ->
# dense heads.

from __future__ import annotations

import dataclasses
import math

import functools

import jax
import jax.numpy as jnp
import numpy as np

INPUT_SAMPLES = 144160  # 9.01 s @ 16 kHz


@dataclasses.dataclass(frozen=True)
class DnsmosConfig:
    n_fft: int = 320
    hop: int = 160
    n_mels: int = 120
    sample_rate: int = 16000
    channels: tuple = (32, 32, 32, 64)
    dense: int = 64


def _mel_matrix(cfg: DnsmosConfig) -> np.ndarray:
    """HTK-style mel filterbank (librosa melspectrogram equivalent)."""
    n_spec = cfg.n_fft // 2 + 1
    f_max = cfg.sample_rate / 2

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(f_max), cfg.n_mels + 2)
    hz = mel_to_hz(mels)
    bins = np.floor((cfg.n_fft + 1) * hz / cfg.sample_rate).astype(int)
    fb = np.zeros((cfg.n_mels, n_spec), np.float32)
    for m in range(1, cfg.n_mels + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, c):
            if c > lo:
                fb[m - 1, k] = (k - lo) / (c - lo)
        for k in range(c, hi):
            if hi > c:
                fb[m - 1, k] = (hi - k) / (hi - c)
    return fb


@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("cfg",))
def init_dnsmos_params(rng, cfg: DnsmosConfig = DnsmosConfig()):
    keys = jax.random.split(rng, len(cfg.channels) + 3)
    params = {"convs": [], "mel": jnp.asarray(_mel_matrix(cfg).T)}
    c_in = 1
    for i, c_out in enumerate(cfg.channels):
        params["convs"].append({
            "weight": jax.random.normal(keys[i], (3, 3, c_in, c_out))
            / math.sqrt(9 * c_in),
            "bias": jnp.zeros((c_out,)),
        })
        c_in = c_out
    params["dense1"] = {
        "weight": jax.random.normal(keys[-2], (cfg.channels[-1], cfg.dense))
        / math.sqrt(cfg.channels[-1]),
        "bias": jnp.zeros((cfg.dense,)),
    }
    params["head"] = {
        "weight": jax.random.normal(keys[-1], (cfg.dense, 3))
        / math.sqrt(cfg.dense),
        "bias": jnp.zeros((3,)),
    }
    return params


def dnsmos_forward(params, audio, cfg: DnsmosConfig = DnsmosConfig()):
    """audio: [B, 144160] raw float32 -> [B, 3] raw (SIG, BAK, OVRL)."""
    b, n = audio.shape
    n_frames = 1 + (n - cfg.n_fft) // cfg.hop
    idx = (np.arange(n_frames)[:, None] * cfg.hop
           + np.arange(cfg.n_fft)[None, :])
    frames = audio[:, idx] * jnp.hanning(cfg.n_fft)
    spec = jnp.fft.rfft(frames)
    power = jnp.abs(spec) ** 2
    mel = jnp.maximum(power @ params["mel"], 1e-10)
    x = jnp.log10(mel)[:, :, :, None]  # [B, T, M, 1]
    for conv in params["convs"]:
        x = jax.lax.conv_general_dilated(
            x, conv["weight"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + conv["bias"]
        x = jax.nn.relu(x)
        # 2x2 max pool
        bb, t, m, c = x.shape
        x = x[:, : t // 2 * 2, : m // 2 * 2]
        x = jnp.max(x.reshape(bb, t // 2, 2, m // 2, 2, c), axis=(2, 4))
    x = jnp.mean(x, axis=(1, 2))  # global average pool
    x = jax.nn.relu(x @ params["dense1"]["weight"] + params["dense1"]["bias"])
    return x @ params["head"]["weight"] + params["head"]["bias"]

# PyanNet segmentation model (pyannote Community-1) in functional JAX.
#
# TPU-native replacement for segmentation-community-1.onnx
# (reference core/speaker_diarization_pure_ort.py:441-446, batch-32 session
# over 10 s windows). Architecture: SincNet front-end (sinc conv stride 10 +
# two conv blocks, abs/maxpool/instance-norm) -> 4-layer BiLSTM(128) ->
# 2 x Linear(128) + LeakyReLU -> 7-class powerset log-softmax.
# A 10 s / 160000-sample window yields exactly 589 output frames, matching
# NUM_SEG_FRAMES in the reference (:115).
#
# All windows of an audio file run as ONE batched jitted program; only the
# BiLSTM scans over the 589 frames.

from __future__ import annotations

import dataclasses
import math

import functools

import jax
import jax.numpy as jnp
import numpy as np

NUM_SEG_FRAMES = 589
CHUNK_SAMPLES = 160000
POWERSET_CLASSES = 7


@dataclasses.dataclass(frozen=True)
class PyanNetConfig:
    sinc_filters: int = 80
    sinc_kernel: int = 251
    sinc_stride: int = 10
    conv_channels: int = 60
    conv_kernel: int = 5
    pool: int = 3
    lstm_hidden: int = 128
    lstm_layers: int = 4
    linear_dim: int = 128
    num_classes: int = POWERSET_CLASSES
    sample_rate: int = 16000
    min_low_hz: float = 30.0
    min_band_hz: float = 50.0


@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("cfg",))
def init_pyannet_params(rng, cfg: PyanNetConfig = PyanNetConfig()):
    keys = jax.random.split(rng, cfg.lstm_layers * 2 + 8)
    # SincConv parameterization: learnable (low_hz, band_hz) per filter,
    # mel-spaced init (pyannote.audio SincConv).
    low_hz = 30.0
    high_hz = cfg.sample_rate / 2 - (cfg.min_low_hz + cfg.min_band_hz)
    mel = np.linspace(2595 * np.log10(1 + low_hz / 700),
                      2595 * np.log10(1 + high_hz / 700),
                      cfg.sinc_filters + 1)
    hz = 700 * (10 ** (mel / 2595) - 1)
    def affine(c):
        # pyannote's InstanceNorm1d layers are affine=True; identity init
        # keeps random-weight behavior identical to the plain norm.
        return {"scale": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}

    params = {
        "sinc_low_hz": jnp.asarray(hz[:-1, None], jnp.float32),
        "sinc_band_hz": jnp.asarray(np.diff(hz)[:, None], jnp.float32),
        "wav_norm": affine(1),
        "norms": [affine(cfg.sinc_filters), affine(cfg.conv_channels),
                  affine(cfg.conv_channels)],
        "convs": [],
        "lstm": [],
    }

    def lin(k, i, o):
        return {"weight": jax.random.normal(k, (i, o)) / math.sqrt(i),
                "bias": jnp.zeros((o,))}

    c_in = cfg.sinc_filters
    for i in range(2):
        k = keys[i]
        params["convs"].append({
            "weight": jax.random.normal(
                k, (cfg.conv_kernel, c_in, cfg.conv_channels))
            / math.sqrt(cfg.conv_kernel * c_in),
            "bias": jnp.zeros((cfg.conv_channels,)),
        })
        c_in = cfg.conv_channels
    d_in = c_in
    for layer in range(cfg.lstm_layers):
        kf, kb = keys[2 + 2 * layer], keys[3 + 2 * layer]
        h = cfg.lstm_hidden

        def lstm_p(k, din):
            k1, k2 = jax.random.split(k)
            return {"wi": jax.random.normal(k1, (din, 4 * h)) / math.sqrt(din),
                    "wh": jax.random.normal(k2, (h, 4 * h)) / math.sqrt(h),
                    "b": jnp.zeros((4 * h,))}

        params["lstm"].append({"fwd": lstm_p(kf, d_in), "bwd": lstm_p(kb, d_in)})
        d_in = 2 * h
    params["linear1"] = lin(keys[-3], d_in, cfg.linear_dim)
    params["linear2"] = lin(keys[-2], cfg.linear_dim, cfg.linear_dim)
    params["classifier"] = lin(keys[-1], cfg.linear_dim, cfg.num_classes)
    return params


def _sinc_filters(params, cfg: PyanNetConfig):
    """Build [kernel, 1, filters] band-pass sinc filters from (low, band)."""
    low = cfg.min_low_hz + jnp.abs(params["sinc_low_hz"])  # [F, 1]
    high = jnp.clip(low + cfg.min_band_hz + jnp.abs(params["sinc_band_hz"]),
                    cfg.min_low_hz, cfg.sample_rate / 2)
    band = (high - low)[:, 0]
    n = (cfg.sinc_kernel - 1) // 2
    t = jnp.arange(-n, 0, dtype=jnp.float32)[None, :] / cfg.sample_rate  # [1, n]
    window = jnp.hamming(cfg.sinc_kernel)[:n][None, :]
    f_low = 2 * math.pi * low
    f_high = 2 * math.pi * high
    # Upstream (mravanelli SincNet / asteroid ParamSincFB, which pyannote's
    # Community-1 checkpoint was trained with) divides the side taps by
    # n_/2 where n_ = 2π·t — NOT by t/2; the center tap is 2·band. Using
    # t/2 here skews the center/side ratio by 2π (caught by the torch
    # oracle in tests/test_model_oracles.py).
    left = ((jnp.sin(f_high * t) - jnp.sin(f_low * t))
            / (2 * math.pi * t / 2)) * window
    center = 2 * band[:, None]
    filters = jnp.concatenate([left, center, left[:, ::-1]], axis=1)
    filters = filters / (2 * band[:, None] + 1e-8)
    return jnp.transpose(filters, (1, 0))[:, None, :]  # [K, 1, F]


def _instance_norm(x, p=None, eps=1e-5):
    """Per-sample, per-channel normalization over time (affine when p is
    given — pyannote InstanceNorm1d(affine=True)). x: [B, T, C]."""
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    out = (x - mu) * jax.lax.rsqrt(var + eps)
    if p is not None:
        out = out * p["scale"] + p["bias"]
    return out


def _max_pool_time(x, k):
    """[B, T, C] max pool (stride = k, floor)."""
    b, t, c = x.shape
    t2 = t // k
    return jnp.max(x[:, : t2 * k].reshape(b, t2, k, c), axis=2)


def _bilstm_layer(p, x):
    """x: [B, T, D] -> [B, T, 2H]."""
    h_dim = p["fwd"]["wh"].shape[0]
    b = x.shape[0]

    def run(pp, seq):
        xi = seq @ pp["wi"] + pp["b"]  # [B, T, 4H]

        def step(carry, xt):
            h, c = carry
            gates = xt + h @ pp["wh"]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((b, h_dim)), jnp.zeros((b, h_dim)))
        _, hs = jax.lax.scan(step, init, jnp.swapaxes(xi, 0, 1))
        return jnp.swapaxes(hs, 0, 1)

    fwd = run(p["fwd"], x)
    bwd = run(p["bwd"], x[:, ::-1])[:, ::-1]
    return jnp.concatenate([fwd, bwd], axis=-1)


def pyannet_forward(params, audio, cfg: PyanNetConfig = PyanNetConfig()):
    """audio: [B, 160000] -> [B, 589, 7] log-softmax powerset scores."""
    x = audio[:, :, None]  # [B, T, 1]
    x = _instance_norm(x, params.get("wav_norm"))
    # SincConv expressed as frame-gather + matmul: a direct conv with
    # kernel 251 / stride 10 compiles pathologically on the TPU backend,
    # while framing + a [251, F] matmul rides the MXU (same numbers).
    t_in = x.shape[1]
    n_frames = (t_in - cfg.sinc_kernel) // cfg.sinc_stride + 1
    idx = (np.arange(n_frames)[:, None] * cfg.sinc_stride
           + np.arange(cfg.sinc_kernel)[None, :])
    frames = x[:, :, 0][:, idx]  # [B, n_frames, K]
    filters = _sinc_filters(params, cfg)[:, 0, :]  # [K, F]
    x = jnp.einsum("btk,kf->btf", frames, filters)
    x = jnp.abs(x)
    x = _max_pool_time(x, cfg.pool)
    norms = params.get("norms") or [None] * 3
    # pyannote SincNet: leaky_relu(norm(pool(...))) on ALL blocks, including
    # the sinc block (abs applied before pooling only there).
    x = jax.nn.leaky_relu(_instance_norm(x, norms[0]), 0.01)
    for ci, conv in enumerate(params["convs"]):
        x = jax.lax.conv_general_dilated(
            x, conv["weight"], (1,), [(0, 0)],
            dimension_numbers=("NHC", "HIO", "NHC")) + conv["bias"]
        x = _max_pool_time(x, cfg.pool)
        x = _instance_norm(x, norms[ci + 1])
        x = jax.nn.leaky_relu(x, 0.01)
    for layer in params["lstm"]:
        x = _bilstm_layer(layer, x)
    x = jax.nn.leaky_relu(x @ params["linear1"]["weight"]
                          + params["linear1"]["bias"], 0.01)
    x = jax.nn.leaky_relu(x @ params["linear2"]["weight"]
                          + params["linear2"]["bias"], 0.01)
    logits = x @ params["classifier"]["weight"] + params["classifier"]["bias"]
    return jax.nn.log_softmax(logits, axis=-1)

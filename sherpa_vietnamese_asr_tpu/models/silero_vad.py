# Silero-VAD-style model in JAX: per-512-sample-window speech probabilities.
#
# TPU-native replacement for the reference's per-window ORT calls
# (reference core/vad_utils.py:62-157 runs one session.run per 512-sample
# window with carried LSTM state — ~112k sequential Python->C++ round trips
# per audio hour). Here the convolutional front-end for ALL windows runs as
# one batched XLA program on the MXU, and only the tiny LSTM cell is
# sequential, inside a single lax.scan.
#
# Architecture mirrors the Silero VAD v5 16k ONNX graph (STFT-as-conv ->
# 4-layer conv encoder -> LSTM(128) -> sigmoid head; 512-sample windows with
# 64 samples of left context). Weights load from the ONNX checkpoint via
# models/onnx_import.py, or random-init for tests.

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

WINDOW = 512
CONTEXT = 64
STATE_DIM = 128


@dataclasses.dataclass(frozen=True)
class SileroVadConfig:
    window: int = WINDOW
    context: int = CONTEXT
    stft_filter_len: int = 256
    stft_hop: int = 128
    n_freq: int = 129
    encoder_channels: tuple = (128, 64, 64, 128)
    lstm_dim: int = STATE_DIM


@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("cfg",))
def init_silero_params(rng, cfg: SileroVadConfig = SileroVadConfig()):
    keys = jax.random.split(rng, 8)
    # Fixed DFT basis for the STFT conv (magnitude); not trained.
    k = np.arange(cfg.stft_filter_len)[None, :]
    f = np.arange(cfg.n_freq)[:, None]
    ang = -2.0 * np.pi * f * k / cfg.stft_filter_len
    params = {
        "stft_cos": jnp.asarray(np.cos(ang), jnp.float32),  # [129, 256]
        "stft_sin": jnp.asarray(np.sin(ang), jnp.float32),
        "encoder": [],
    }
    c_in = cfg.n_freq
    for i, c_out in enumerate(cfg.encoder_channels):
        w = jax.random.normal(keys[i], (3, c_in, c_out), jnp.float32)
        params["encoder"].append({
            "weight": w / math.sqrt(3 * c_in),
            "bias": jnp.zeros((c_out,), jnp.float32),
        })
        c_in = c_out
    d = cfg.lstm_dim
    params["lstm"] = {
        "wi": jax.random.normal(keys[5], (c_in, 4 * d), jnp.float32) / math.sqrt(c_in),
        "wh": jax.random.normal(keys[6], (d, 4 * d), jnp.float32) / math.sqrt(d),
        "b": jnp.zeros((4 * d,), jnp.float32),
    }
    params["out"] = {
        "weight": jax.random.normal(keys[7], (d, 1), jnp.float32) / math.sqrt(d),
        "bias": jnp.zeros((1,), jnp.float32),
    }
    return params


def window_features(params, windows, cfg: SileroVadConfig = SileroVadConfig()):
    """Conv front-end for a batch of windows.

    windows: [N, context + window] float32 (64 left-context + 512 samples).
    Returns [N, lstm_in] features — fully parallel over windows.
    """
    n = windows.shape[0]
    # STFT magnitude via conv: frames of length 256, hop 128.
    t_frames = (windows.shape[1] - cfg.stft_filter_len) // cfg.stft_hop + 1
    idx = (np.arange(t_frames)[:, None] * cfg.stft_hop
           + np.arange(cfg.stft_filter_len)[None, :])
    frames = windows[:, idx]  # [N, T, 256]
    re = jnp.einsum("ntk,fk->ntf", frames, params["stft_cos"])
    im = jnp.einsum("ntk,fk->ntf", frames, params["stft_sin"])
    h = jnp.sqrt(re * re + im * im + 1e-9)  # [N, T, 129]
    # Conv encoder over the (short) frame axis, k=3 same-pad + ReLU.
    for layer in params["encoder"]:
        h = jax.lax.conv_general_dilated(
            h, layer["weight"], (1,), [(1, 1)],
            dimension_numbers=("NHC", "HIO", "NHC"))
        h = jax.nn.relu(h + layer["bias"])
    return jnp.mean(h, axis=1)  # [N, C]


def lstm_scan(params, feats, state=None):
    """Sequential LSTM over window features.

    feats: [N, C] in window order. state: optional (h, c) each [D].
    Returns (probs [N], (h, c)).
    """
    d = params["lstm"]["wh"].shape[0]
    if state is None:
        state = (jnp.zeros((d,), jnp.float32), jnp.zeros((d,), jnp.float32))
    # Precompute the input projection for every window in one matmul.
    xi = feats @ params["lstm"]["wi"] + params["lstm"]["b"]  # [N, 4D]

    def step(carry, x):
        h, c = carry
        gates = x + h @ params["lstm"]["wh"]
        i, f, g, o = jnp.split(gates, 4)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    state, hs = jax.lax.scan(step, state, xi)
    logits = hs @ params["out"]["weight"][:, 0] + params["out"]["bias"][0]
    return jax.nn.sigmoid(logits), state


def vad_step(params, chunk, context, state,
             cfg: SileroVadConfig = SileroVadConfig()):
    """Single streaming step: one 512-sample window with carried state.

    Mirrors the reference's per-window ONNX call signature
    (reference streaming_asr.py:88-101: input = context(64) + chunk(512),
    carried LSTM state). Returns (prob, new_context, new_state).
    """
    full = jnp.concatenate([context, chunk])[None, :]  # [1, 576]
    feats = window_features(params, full, cfg)
    probs, new_state = lstm_scan(params, feats, state)
    return probs[0], chunk[-cfg.context:], new_state


from sherpa_vietnamese_asr_tpu.utils.aot_cache import aot_jit


@aot_jit("vad_block", static_argnames=("cfg", "quantized"))
def _vad_block_jit(params, block, prev_tail, state, cfg, quantized):
    """One fixed-size block of windows with carried context + LSTM state.

    block: [W * window] samples (int16 or float32); prev_tail: [context]
    samples from the previous block (same dtype). Returns
    (probs [W], tail [context], new_state).
    """
    x = block.astype(jnp.float32)
    tail_f = prev_tail.astype(jnp.float32)
    if quantized:
        x = x / jnp.float32(32768.0)
        tail_f = tail_f / jnp.float32(32768.0)
    wins = x.reshape(-1, cfg.window)
    ctx = jnp.concatenate([tail_f[None, :], wins[:-1, -cfg.context:]], axis=0)
    full = jnp.concatenate([ctx, wins], axis=1)
    feats = window_features(params, full, cfg)
    probs, new_state = lstm_scan(params, feats, state)
    return probs, block[-cfg.context:], new_state


def silero_vad_probs_streamed(params, audio, block_windows: int = 1875,
                              quantize: bool = True,
                              cfg: SileroVadConfig = SileroVadConfig()):
    """Whole-file VAD in fixed-size blocks: ONE compiled program for any
    audio length, int16 uploads (half the bytes over the slow host->device
    link), LSTM state carried across blocks. Matches silero_vad_probs.

    audio: numpy [L] float32. Returns numpy [L // 512] probabilities.
    """
    audio = np.asarray(audio, np.float32)
    n_windows = len(audio) // cfg.window
    if n_windows == 0:
        return np.empty((0,), np.float32)
    if quantize:
        host = np.clip(np.rint(audio * 32768.0), -32768, 32767
                       ).astype(np.int16)
    else:
        host = audio
    block_len = block_windows * cfg.window
    out = np.empty((n_windows,), np.float32)
    d = params["lstm"]["wh"].shape[0]
    state = (jnp.zeros((d,), jnp.float32), jnp.zeros((d,), jnp.float32))
    tail = jnp.zeros((cfg.context,), host.dtype)
    # Enqueue every block first (JAX async dispatch; the LSTM state chains
    # on-device), materialize once at the end: one host round trip total
    # instead of one per block, and block i+1's upload rides under block
    # i's compute.
    pending = []
    done = 0
    while done < n_windows:
        s = done * cfg.window
        chunk = host[s: s + block_len]
        if len(chunk) < block_len:
            chunk = np.pad(chunk, (0, block_len - len(chunk)))
        probs, tail, state = _vad_block_jit(params, jnp.asarray(chunk), tail,
                                            state, cfg, quantize)
        take = min(block_windows, n_windows - done)
        pending.append((done, take, probs))
        done += take
    for start, take, probs in pending:
        out[start: start + take] = np.asarray(probs)[:take]
    return out


def silero_vad_probs(params, audio, cfg: SileroVadConfig = SileroVadConfig()):
    """Per-window speech probabilities for a full waveform.

    audio: [L] float32. Returns [L // 512] float32 probabilities, matching the
    reference's window/context scheme (core/vad_utils.py:85-106: window i uses
    the previous window's last 64 samples as context, zeros for i=0).
    """
    n_windows = audio.shape[0] // cfg.window
    trimmed = audio[: n_windows * cfg.window]
    wins = trimmed.reshape(n_windows, cfg.window)
    ctx = jnp.concatenate(
        [jnp.zeros((1, cfg.context), jnp.float32),
         wins[:-1, -cfg.context:]], axis=0)
    full = jnp.concatenate([ctx, wins], axis=1)  # [N, 576]
    feats = window_features(params, full, cfg)
    probs, _ = lstm_scan(params, feats)
    return probs

# TPU-native Kaldi fbank: framing in XLA + one fused Pallas kernel for
# DFT -> power spectrum -> mel projection -> log.
#
# Replaces the reference's kaldi-native-fbank C++ calls
# (reference core/asr_engine.py:698-721, core/speaker_diarization_pure_ort.py:271-304,
#  core/speaker_diarization_senko_campp_optimized.py:35-61) with a batched,
# jittable program. The 512-point rFFT is expressed as two real matmuls against
# constant DFT bases so the whole frame->logmel pipeline runs on the MXU in one
# kernel (F x 512 x 384 x 2 + F x 384 x 128 MACs per frame block).
#
# Numeric oracle: sherpa_vietnamese_asr_tpu.utils.fbank_ref.compute_fbank.

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sherpa_vietnamese_asr_tpu.utils.fbank_ref import (
    ASR_FBANK,
    CAMPP_FBANK,
    RESNET_EMB_FBANK,
    FbankConfig,
    feature_window,
    frame_start_indices,
    kaldi_mel_banks,
    num_frames,
    reflect_index,
)

__all__ = [
    "ASR_FBANK",
    "CAMPP_FBANK",
    "RESNET_EMB_FBANK",
    "FbankConfig",
    "compute_fbank",
    "num_frames",
]

_FRAME_TILE = 256   # frames per Pallas grid step
_K_PAD = 384        # 257 spectrum bins padded to a lane multiple
_OUT_PAD = 128      # 80 mel bins padded to one lane


@functools.lru_cache(maxsize=32)
def _constants(cfg: FbankConfig):
    """Static tables for a config: window, DFT bases, padded mel bank.

    Cached as NUMPY arrays: caching jnp arrays would leak tracers when the
    first call happens inside a jit trace (jnp.asarray of a constant is
    itself a tracer under tracing in JAX >= 0.7).
    """
    n_fft = cfg.n_fft
    n_spec = n_fft // 2 + 1
    k = np.arange(n_fft, dtype=np.float64)[:, None]
    f = np.arange(n_spec, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * k * f / n_fft
    wc = np.zeros((n_fft, _K_PAD), dtype=np.float32)
    ws = np.zeros((n_fft, _K_PAD), dtype=np.float32)
    wc[:, :n_spec] = np.cos(ang)
    ws[:, :n_spec] = np.sin(ang)
    mel = np.zeros((_K_PAD, _OUT_PAD), dtype=np.float32)
    mel[:n_spec, : cfg.num_bins] = kaldi_mel_banks(cfg).T
    win = feature_window(cfg)
    return wc, ws, mel, win


@functools.lru_cache(maxsize=64)
def _frame_gather_indices(n_samples: int, cfg: FbankConfig) -> np.ndarray:
    """(F, frame_length) int32 sample indices, with edge reflection."""
    f = num_frames(n_samples, cfg)
    starts = frame_start_indices(f, cfg)
    idx = starts[:, None] + np.arange(cfg.frame_length, dtype=np.int64)[None, :]
    if not cfg.snip_edges:
        idx = reflect_index(idx, n_samples)
    return idx.astype(np.int32)


def _frame_signal(audio: jax.Array, cfg: FbankConfig) -> jax.Array:
    """[..., L] -> [..., F, frame_length] windowed frames padded to n_fft.

    Framing indices are computed IN-GRAPH (iota arithmetic + one reflection
    step) rather than embedded as a numpy constant: a constant [F, 400] index
    table is ~15M int32 for an hour of audio and makes every new audio-length
    bucket compile for tens of seconds.
    """
    n = audio.shape[-1]
    f = num_frames(n, cfg)
    shift, wlen = cfg.frame_shift, cfg.frame_length
    start0 = 0 if cfg.snip_edges else shift // 2 - wlen // 2
    pad_left = max(0, -start0)
    if (pad_left + start0) % shift == 0 and n >= wlen:
        # Strided framing as pure slices: a [.., F, 400] take-gather costs
        # several ms per 8x33 s batch on TPU (gathers along the minor axis
        # are pathological); with shift | alignment the same frames are a
        # reshape into shift-sized rows plus ceil(wlen/shift) shifted row
        # views concatenated along the last axis — memcpy-speed.
        nrows = -(-wlen // shift)
        rows_needed = f + nrows
        # frame 0 begins at padded-index 0 (pad_left + start0 == 0), so the
        # row grid covers the left pad too
        total = rows_needed * shift
        pieces = []
        if pad_left:
            # Kaldi edge reflection: sample at index -k-1 is audio[k]
            pieces.append(jnp.flip(audio[..., :pad_left], axis=-1))
        pieces.append(audio)
        pad_right = total - pad_left - n
        if pad_right > 0:
            k = min(pad_right, n)
            tail = jnp.flip(audio[..., n - k:], axis=-1)
            if k < pad_right:  # beyond one reflection: never read
                widths = [(0, 0)] * (audio.ndim - 1) + [(0, pad_right - k)]
                tail = jnp.pad(tail, widths)
            pieces.append(tail)
        ap = jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 else audio
        r2d = ap.reshape(*audio.shape[:-1], rows_needed, shift)
        frames = jnp.concatenate(
            [r2d[..., i: i + f, :] for i in range(nrows)],
            axis=-1)[..., :wlen]
    else:
        starts = jnp.arange(f, dtype=jnp.int32) * shift + start0
        idx = starts[:, None] + jnp.arange(wlen, dtype=jnp.int32)
        # Kaldi reflection; one step suffices for frame_length << n.
        idx = jnp.where(idx < 0, -idx - 1, idx)
        idx = jnp.where(idx >= n, 2 * n - 1 - idx, idx)
        frames = jnp.take(audio, idx, axis=-1)  # [..., F, frame_length]
    if cfg.input_scale != 1.0:
        frames = frames * jnp.float32(cfg.input_scale)
    if cfg.remove_dc:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if cfg.preemph != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - jnp.float32(cfg.preemph) * prev
    _, _, _, win = _constants(cfg)
    frames = frames * win
    pad = cfg.n_fft - cfg.frame_length
    if pad > 0:
        widths = [(0, 0)] * (frames.ndim - 1) + [(0, pad)]
        frames = jnp.pad(frames, widths)
    return frames


def _logmel_kernel(frames_ref, wc_ref, ws_ref, mel_ref, floor_ref, out_ref):
    # Precision: the DFT suffers catastrophic cancellation, and a single
    # default bf16 MXU pass corrupts low-energy mel bins by >1 in log-mel
    # (log amplifies). Full HIGHEST (6-pass) is overkill though — a 3-pass
    # hi/lo bf16 split (a_hi@b_hi + a_hi@b_lo + a_lo@b_hi) carries ~16
    # mantissa bits, measured max log-mel error vs the f64 oracle well
    # inside the 2e-2 hardware gate. The mel projection contracts
    # NON-NEGATIVE power with non-negative filters (no cancellation), so a
    # single bf16 pass suffices there. 18 MXU passes -> 7.
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def dg(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    def dot3(a, b):
        a_hi = a.astype(bf16)
        a_lo = (a - a_hi.astype(f32)).astype(bf16)
        b_hi = b.astype(bf16)
        b_lo = (b - b_hi.astype(f32)).astype(bf16)
        return dg(a_hi, b_hi) + dg(a_hi, b_lo) + dg(a_lo, b_hi)

    x = frames_ref[:]
    c = dot3(x, wc_ref[:])
    s = dot3(x, ws_ref[:])
    power = c * c + s * s
    mel = dg(power.astype(bf16), mel_ref[:].astype(bf16))
    out_ref[:] = jnp.log(jnp.maximum(mel, floor_ref[0]))


def _logmel_pallas(frames: jax.Array, cfg: FbankConfig) -> jax.Array:
    """[F, n_fft] windowed frames -> [F, num_bins] log-mel via fused kernel."""
    wc, ws, mel, _ = _constants(cfg)
    f = frames.shape[0]
    f_pad = ((f + _FRAME_TILE - 1) // _FRAME_TILE) * _FRAME_TILE
    if f_pad != f:
        frames = jnp.pad(frames, ((0, f_pad - f), (0, 0)))
    floor = jnp.full((1,), cfg.log_floor, dtype=jnp.float32)
    out = pl.pallas_call(
        _logmel_kernel,
        out_shape=jax.ShapeDtypeStruct((f_pad, _OUT_PAD), jnp.float32),
        grid=(f_pad // _FRAME_TILE,),
        in_specs=[
            pl.BlockSpec((_FRAME_TILE, cfg.n_fft), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_fft, _K_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_fft, _K_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K_PAD, _OUT_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_FRAME_TILE, _OUT_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * f_pad * cfg.n_fft * _K_PAD * 2 + 2 * f_pad * _K_PAD * _OUT_PAD,
            bytes_accessed=4 * (f_pad * cfg.n_fft + 2 * cfg.n_fft * _K_PAD
                                + _K_PAD * _OUT_PAD + f_pad * _OUT_PAD),
            transcendentals=f_pad * _OUT_PAD,
        ),
    )(frames, wc, ws, mel, floor)
    return out[:f, : cfg.num_bins]


def _logmel_xla(frames: jax.Array, cfg: FbankConfig) -> jax.Array:
    """Pure-XLA fallback (CPU tests / parity mode), same matmul formulation."""
    wc, ws, mel, _ = _constants(cfg)
    hi = jax.lax.Precision.HIGHEST
    c = jnp.matmul(frames, wc, precision=hi)
    s = jnp.matmul(frames, ws, precision=hi)
    power = c * c + s * s
    m = jnp.matmul(power, mel, precision=hi)
    return jnp.log(jnp.maximum(m, jnp.float32(cfg.log_floor)))[..., : cfg.num_bins]


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def compute_fbank_streamed(audio: np.ndarray, cfg: FbankConfig = ASR_FBANK,
                           block_frames: int = 6000,
                           use_pallas: bool | None = None) -> np.ndarray:
    """Whole-file fbank in fixed-size blocks: ONE compiled program regardless
    of audio length (arbitrary-length jits compile for tens of seconds per
    new length on this host). snip_edges=True configs only (frame f starts
    at f*shift, so blocks tile exactly). Returns numpy [F, num_bins]."""
    assert cfg.snip_edges, "streamed fbank assumes snip_edges=True framing"
    audio = np.asarray(audio, np.float32)
    total = num_frames(len(audio), cfg)
    if total == 0:
        return np.empty((0, cfg.num_bins), np.float32)
    block_len = (block_frames - 1) * cfg.frame_shift + cfg.frame_length
    out = np.empty((total, cfg.num_bins), np.float32)
    done = 0
    while done < total:
        start = done * cfg.frame_shift
        chunk = audio[start: start + block_len]
        if len(chunk) < block_len:
            chunk = np.pad(chunk, (0, block_len - len(chunk)))
        feats = _fbank_block_jit(jnp.asarray(chunk), cfg,
                                 use_pallas is True)
        take = min(block_frames, total - done)
        out[done: done + take] = np.asarray(feats)[:take]
        done += take
    if cfg.cmvn:
        out -= out.mean(axis=0, keepdims=True)
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def _fbank_block_jit(chunk, cfg, use_pallas):
    # CMVN is applied over the WHOLE utterance by the caller, not per block.
    block_cfg = cfg if not cfg.cmvn else dataclasses.replace(cfg, cmvn=False)
    return compute_fbank(chunk, block_cfg, use_pallas=use_pallas)


def compute_fbank(audio: jax.Array, cfg: FbankConfig = ASR_FBANK,
                  use_pallas: bool | None = None) -> jax.Array:
    """Kaldi log-mel fbank on device.

    Args:
        audio: [L] or [B, L] float32 waveform(s) at cfg.sample_rate.
        cfg: one of ASR_FBANK / RESNET_EMB_FBANK / CAMPP_FBANK or custom.
        use_pallas: force kernel choice; default = Pallas on TPU, XLA elsewhere.

    Returns:
        [F, num_bins] or [B, F, num_bins] float32 log-mel features.
        CMVN (if cfg.cmvn) is per utterance over all F frames — callers batching
        variable-length windows should mask first and apply CMVN themselves.
    """
    if use_pallas is None:
        use_pallas = _on_tpu()
    batched = audio.ndim == 2
    frames = _frame_signal(audio, cfg)  # [..., F, n_fft]
    if batched:
        b, f, n_fft = frames.shape
        flat = frames.reshape(b * f, n_fft)
    else:
        flat = frames
    feats = _logmel_pallas(flat, cfg) if use_pallas else _logmel_xla(flat, cfg)
    if batched:
        feats = feats.reshape(b, -1, cfg.num_bins)
    if cfg.cmvn:
        feats = feats - jnp.mean(feats, axis=-2, keepdims=True)
    return feats

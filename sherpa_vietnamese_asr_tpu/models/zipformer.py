# Zipformer2 encoder in functional JAX — the TPU-native replacement for the
# reference's ONNX-Runtime Zipformer sessions (reference core/asr_engine.py:903-1020
# runs encoder-*.onnx per chunk; here the encoder is one jitted, batched XLA
# program over padded [B, T, 80] chunk batches).
#
# Architecture follows Zipformer (arXiv:2310.11230) as used by the icefall /
# sherpa-onnx exports the reference app ships (Zipformer-30M and Zipformer-68M
# RNN-T, see reference build-portable/prepare_offline_build.py:21-242):
#   Conv2dSubsampling (+ConvNeXt) -> 6 encoder stacks at downsampling factors
#   (1,2,4,8,4,2) with BypassModule-combined outputs -> full-dim concat ->
#   final x2 downsample.  BiasNorm instead of LayerNorm, SwooshL/SwooshR
#   activations, attention weights shared between two self-attn modules, a
#   single-head NonlinAttention, and two convolution modules per layer.
#
# Parameters live in plain nested dicts (pytrees) so they can be sharded with
# jax.sharding and populated from ONNX checkpoints by models/onnx_import.py.
# All control flow is static; padding masks carry per-sequence lengths.

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ZipformerConfig:
    num_features: int = 80
    # Per-stack settings (6 stacks)
    num_encoder_layers: Sequence[int] = (2, 2, 3, 4, 3, 2)
    downsampling_factor: Sequence[int] = (1, 2, 4, 8, 4, 2)
    encoder_dim: Sequence[int] = (192, 256, 256, 256, 256, 256)
    ffn_dim: Sequence[int] = (512, 768, 768, 768, 768, 768)
    num_heads: Sequence[int] = (4, 4, 4, 8, 4, 4)
    cnn_module_kernel: Sequence[int] = (31, 31, 15, 15, 15, 31)
    query_head_dim: int = 32
    pos_head_dim: int = 4
    value_head_dim: int = 12
    pos_dim: int = 48
    # dtype of the relative-position score tensor ([B,H,T,2T-1] — the
    # largest intermediate in the model; bf16 halves its HBM traffic).
    # Set "float32" for strict-parity runs.
    pos_dtype: str = "bfloat16"
    # Fused Pallas attention-weights kernel (ops/attention.py): "auto" uses
    # it on TPU backends, "never"/"always" force. The XLA path is the
    # numeric fallback/oracle.
    attention_kernel: str = "auto"
    # Whole-layer Pallas megakernel (ops/encoder_layer.py): one pallas_call
    # per encoder layer, full sequence resident in VMEM. "auto" enables it
    # on TPU backends in bfloat16 compute mode for stacks whose estimated
    # VMEM footprint fits; "never"/"always" force. Numeric contract: same
    # math as the XLA bf16 path modulo bf16 rounding order.
    layer_kernel: str = "auto"
    # Conv2dSubsampling channels
    embed_layer1_channels: int = 8
    embed_layer2_channels: int = 32
    embed_layer3_channels: int = 128
    # Computation dtype for the big matmuls ("float32" or "bfloat16").
    compute_dtype: str = "float32"
    # XLA matmul/conv precision for float32 compute ("high" = the native
    # 3-pass bf16 hi/lo-split algorithm, ~17% faster encoder on v5e;
    # "highest" = full 6-pass f32 emulation). Ignored for bf16 compute.
    # The Pallas beam kernel keeps HIGHEST in fp32 mode either way.
    # Measured (random weights = worst case, near-uniform logits): "high"
    # vs "highest" flips ~1% of decoded tokens on-chip, and EITHER differs
    # from the XLA-CPU oracle by the same order (~1-2%) — cross-backend
    # transcendental/rounding ULPs flip near-tied beam decisions in any
    # mode, so "highest" buys no cross-backend bit-identity, only cost.
    # fp32 guarantees: deterministic run-to-run on a given backend, full
    # f32 accumulation class; token/WER parity vs the reference ONNX CPU
    # is gated on real checkpoints via `svt verify-assets`.
    matmul_precision: str = "high"

    @property
    def output_dim(self) -> int:
        return max(self.encoder_dim)

    def output_length(self, t_in: int) -> int:
        """fbank frames T -> encoder output frames (50Hz embed, final /2)."""
        t = (t_in - 7) // 2
        return (t + 1) // 2


# The two model sizes the reference app ships (SURVEY.md section 2.3).
ZIPFORMER_30M = ZipformerConfig()
ZIPFORMER_68M = ZipformerConfig(
    encoder_dim=(192, 256, 384, 512, 384, 256),
    ffn_dim=(512, 768, 1024, 1536, 1024, 768),
)


# ---------------------------------------------------------------------------
# Activations / normalization
# ---------------------------------------------------------------------------

def swoosh_l(x):
    """SwooshL(x) = log(1 + exp(x-4)) - 0.08x - 0.035 (Zipformer paper eq. 6)."""
    return jnp.logaddexp(0.0, x - 4.0) - 0.08 * x - 0.035


def swoosh_r(x):
    """SwooshR(x) = log(1 + exp(x-1)) - 0.08x - 0.313261687."""
    return jnp.logaddexp(0.0, x - 1.0) - 0.08 * x - 0.313261687


def bias_norm(params, x):
    """BiasNorm: x * exp(log_scale) / rms(x - bias). No affine per-channel scale."""
    d = x - params["bias"]
    rms = jnp.sqrt(jnp.mean(d * d, axis=-1, keepdims=True) + 1e-12)
    return x * (jnp.exp(params["log_scale"]) / rms)


def linear(params, x):
    y = x @ params["weight"]
    if "bias" in params:
        y = y + params["bias"]
    return y


# ---------------------------------------------------------------------------
# Parameter init helpers
# ---------------------------------------------------------------------------

def _lin(rng, d_in, d_out, bias=True, scale=None):
    k1, _ = jax.random.split(rng)
    if scale is None:
        scale = 1.0 / math.sqrt(d_in)
    p = {"weight": jax.random.normal(k1, (d_in, d_out), jnp.float32) * scale}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _bias_norm_init(d):
    return {"bias": jnp.zeros((d,), jnp.float32),
            "log_scale": jnp.zeros((), jnp.float32)}


def _conv2d_init(rng, c_in, c_out, kh, kw):
    scale = 1.0 / math.sqrt(c_in * kh * kw)
    return {
        "weight": jax.random.normal(rng, (kh, kw, c_in, c_out), jnp.float32) * scale,
        "bias": jnp.zeros((c_out,), jnp.float32),
    }


# ---------------------------------------------------------------------------
# Conv2dSubsampling (+ ConvNeXt)   T -> (T-7)//2, 80 freq -> 19
# ---------------------------------------------------------------------------

def init_encoder_embed(rng, cfg: ZipformerConfig):
    ks = jax.random.split(rng, 8)
    c1, c2, c3 = (cfg.embed_layer1_channels, cfg.embed_layer2_channels,
                  cfg.embed_layer3_channels)
    freq_out = (((cfg.num_features - 1) // 2) - 1) // 2  # 80 -> 19
    return {
        "conv1": _conv2d_init(ks[0], 1, c1, 3, 3),
        "conv2": _conv2d_init(ks[1], c1, c2, 3, 3),
        "conv3": _conv2d_init(ks[2], c2, c3, 3, 3),
        "convnext_dw": _conv2d_init(ks[3], 1, c3, 7, 7),  # depthwise (per-channel)
        "convnext_pw1": _lin(ks[4], c3, 3 * c3),
        "convnext_pw2": _lin(ks[5], 3 * c3, c3),
        "out": _lin(ks[6], c3 * freq_out, cfg.encoder_dim[0]),
        "out_norm": _bias_norm_init(cfg.encoder_dim[0]),
    }


def _clamp_tail(x, lens):
    """Replace padded tail frames with copies of the last valid frame.

    This reproduces, for a padded batch, what the reference gets by running
    each chunk at its exact length: SimpleDownsample pads the tail by
    repeating the final frame, so boundary groups must average against
    last-frame copies, not batch-padding garbage.
    """
    t = x.shape[1]
    idx = jnp.minimum(jnp.arange(t, dtype=jnp.int32)[None, :],
                      jnp.maximum(lens[:, None] - 1, 0).astype(jnp.int32))
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def _banded_freq_matrix(f_in: int) -> np.ndarray:
    """[F, F', 3] one-hot band: M[f, f', d] = 1 iff f == f' + d - 1.

    Lets a k3 same-padded frequency conv be expressed as a dense [F, F'*C]
    matmul (trace-time constant mask contracted with the conv kernel)."""
    m = np.zeros((f_in, f_in, 3), np.float32)
    for fp in range(f_in):
        for d in range(3):
            src = fp + d - 1
            if 0 <= src < f_in:
                m[src, fp, d] = 1.0
    return m


def _banded_freq_matrix_s2(f_in: int) -> np.ndarray:
    """[F, F', 3] one-hot band for a k3 STRIDE-2 VALID frequency conv:
    M[f, f', d] = 1 iff f == 2*f' + d, F' = (F - 3)//2 + 1."""
    f_out = (f_in - 3) // 2 + 1
    m = np.zeros((f_in, f_out, 3), np.float32)
    for fp in range(f_out):
        for d in range(3):
            m[2 * fp + d, fp, d] = 1.0
    return m


def encoder_embed(params, x, out_lens, cfg: ZipformerConfig):
    """[B, T, 80] -> [B, (T-7)//2, encoder_dim[0]].

    out_lens: [B] valid output frames ((x_lens - 7) // 2); frames past this are
    zeroed before the ConvNeXt block so its depthwise conv sees the same
    zero-padding an exact-length run would.
    """
    dt = jnp.dtype(cfg.compute_dtype)
    b, t, f = x.shape
    # conv1 (1->8 channels, k3x3, freq same-pad, time valid) as a banded
    # dense matmul: a C_in=1 NHWC conv occupies 1/128 of the TPU vector
    # lanes and XLA lowers it pathologically (measured 33.6 ms of the 47 ms
    # encoder on v5e for an 8x30 s batch — the single hottest op in the
    # model). Stacking the 3 time taps along features and contracting a
    # [3*F, F*C1] banded matrix built from the 3x3xC1 kernel runs the same
    # math as one well-shaped MXU matmul (~1 ms). Flatten order (f major,
    # channel minor) matches NHWC so downstream convs are unchanged.
    c1 = params["conv1"]["weight"].shape[-1]
    k1 = params["conv1"]["weight"].astype(dt)[:, :, 0, :]  # [3(t), 3(f), C1]
    band = jnp.asarray(_banded_freq_matrix(f), dt)  # [F, F', 3]
    w1 = jnp.einsum("xyd,jdc->jxyc", band, k1)  # [3(t), F, F', C1]
    w1 = w1.reshape(3 * f, f * c1)
    taps = jnp.concatenate(
        [x[:, 0: t - 2], x[:, 1: t - 1], x[:, 2: t]], axis=-1).astype(dt)
    h = (taps @ w1).reshape(b, t - 2, f, c1)
    h = swoosh_r(h + params["conv1"]["bias"].astype(dt))
    # conv2 (k3, stride 2 both dims, no pad) as a banded dense matmul, same
    # trick as conv1: C_in=8 occupies 8/128 lanes as an NHWC conv and XLA
    # lowers it at ~1 TFLOP/s (measured 2.4 ms of the 5.4 ms embed — the
    # second-hottest op in the model). The banded matrix wastes 3x the
    # conv's FLOPs on zeros but runs MXU-shaped.
    t1 = h.shape[1]
    t2 = (t1 - 3) // 2 + 1
    f2 = (f - 3) // 2 + 1
    k2 = params["conv2"]["weight"].astype(dt)  # [3(t), 3(f), C1, C2]
    c2 = k2.shape[-1]
    band2 = jnp.asarray(_banded_freq_matrix_s2(f), dt)  # [F, F2, 3]
    # W_j[(fi, ci), (fo, co)] = k2[j, fi - 2 fo, ci, co]
    w2 = jnp.einsum("xyd,jdic->jxiyc", band2, k2)  # [3, F, C1, F2, C2]
    w2 = w2.reshape(3, f * c1, f2 * c2)
    hf = h.reshape(b, t1, f * c1)
    acc = None
    for j in range(3):
        tap = jax.lax.slice_in_dim(hf, j, j + 2 * (t2 - 1) + 1, 2, axis=1)
        part = tap @ w2[j]
        acc = part if acc is None else acc + part
    h = acc.reshape(b, t2, f2, c2)
    h = swoosh_r(h + params["conv2"]["bias"].astype(dt))
    # conv3 (k3, stride (1, 2), no pad) as a 9-tap gather + ONE dense
    # matmul: C_in=32 occupies 32/128 lanes as an NHWC conv (~14x below
    # MXU speed-of-light, measured 0.72 ms of the 3.8 ms embed). The nine
    # (time, freq) taps concatenated along channels give a [.., 9*C2=288]
    # @ [288, C3] matmul — no banded zero-waste needed at this channel
    # count, unlike conv1/conv2 above.
    k3w = params["conv3"]["weight"].astype(dt)  # [3(t), 3(f), C2, C3]
    t3 = h.shape[1] - 2
    f3 = (f2 - 3) // 2 + 1
    taps3 = [
        jax.lax.slice(h, (0, tj, fj, 0),
                      (b, tj + t3, fj + 2 * (f3 - 1) + 1, c2),
                      (1, 1, 2, 1))
        for tj in range(3) for fj in range(3)
    ]
    # concat order (tj, fj, ci) matches k3w.reshape's row order
    h = jnp.concatenate(taps3, axis=-1) @ k3w.reshape(9 * c2, -1)
    h = swoosh_r(h + params["conv3"]["bias"].astype(dt))
    # Zero padded time positions so ConvNeXt's padded conv matches an
    # exact-length (unbatched) run.
    t_mask = jnp.arange(h.shape[1])[None, :] < out_lens[:, None]
    h = jnp.where(t_mask[:, :, None, None], h, 0.0)
    # ConvNeXt block: depthwise 7x7 (pad 3) + pointwise MLP + residual
    c3 = h.shape[-1]
    dw = params["convnext_dw"]["weight"].astype(dt)  # [7, 7, 1, C]
    g = jax.lax.conv_general_dilated(
        h, dw, (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c3)
    g = g + params["convnext_dw"]["bias"].astype(dt)
    g = linear(jax.tree.map(lambda a: a.astype(dt), params["convnext_pw1"]), g)
    g = swoosh_l(g)
    g = linear(jax.tree.map(lambda a: a.astype(dt), params["convnext_pw2"]), g)
    h = h + g
    # Flatten freq x channels -> linear -> BiasNorm
    bt = h.shape[1]
    h = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, bt, -1)  # [B, T', C*F']
    h = linear(jax.tree.map(lambda a: a.astype(dt), params["out"]), h)
    h = bias_norm(params["out_norm"], h.astype(jnp.float32))
    return h


# ---------------------------------------------------------------------------
# Relative positional encoding (CompactRelPositionalEncoding)
# ---------------------------------------------------------------------------

def _padded_rev_pos_emb(t: int, t_pad: int, pos_dim: int,
                        r: int = 128) -> np.ndarray:
    """[2*t_pad-1+r, pos_dim] REVERSED, zero-extended position table for the
    layer megakernel: padded-table row j' holds offset o = (t_pad-1) - j',
    original offsets only (zeros elsewhere). Trace-time constant."""
    pe = compact_rel_pos_emb(t, pos_dim)
    full = np.zeros((2 * t_pad - 1 + r, pos_dim), np.float32)
    full[t_pad - t: t_pad - t + 2 * t - 1] = pe[::-1]
    return full


def compact_rel_pos_emb(t: int, pos_dim: int) -> np.ndarray:
    """[2T-1, pos_dim] compact relative positional embedding (trace-time const)."""
    x = np.arange(-(t - 1), t, dtype=np.float64)[:, None]  # [2T-1, 1]
    compression = math.sqrt(pos_dim)
    xc = compression * np.sign(x) * (np.log(np.abs(x) + compression)
                                     - math.log(compression))
    x_atan = np.arctan(xc / compression)
    freqs = np.arange(1, pos_dim // 2 + 1, dtype=np.float64)[None, :]
    pe = np.zeros((2 * t - 1, pos_dim), dtype=np.float32)
    pe[:, 0::2] = np.cos(x_atan * freqs)
    pe[:, 1::2] = np.sin(x_atan * freqs)
    return pe


# ---------------------------------------------------------------------------
# Encoder layer submodules
# ---------------------------------------------------------------------------

def init_layer(rng, d, ff, heads, kernel, cfg: ZipformerConfig):
    ks = jax.random.split(rng, 16)
    qd, pd, vd = cfg.query_head_dim, cfg.pos_head_dim, cfg.value_head_dim
    hidden_na = 3 * d // 4
    return {
        "attn_in_proj": _lin(ks[0], d, heads * (2 * qd + pd)),
        "attn_pos_proj": _lin(ks[1], cfg.pos_dim, heads * pd, bias=False),
        "self_attn1": {"in_proj": _lin(ks[2], d, heads * vd),
                       "out_proj": _lin(ks[3], heads * vd, d)},
        "self_attn2": {"in_proj": _lin(ks[4], d, heads * vd),
                       "out_proj": _lin(ks[5], heads * vd, d)},
        "ff1": {"in": _lin(ks[6], d, (ff * 3) // 4), "out": _lin(ks[7], (ff * 3) // 4, d)},
        "ff2": {"in": _lin(ks[8], d, ff), "out": _lin(ks[9], ff, d)},
        "ff3": {"in": _lin(ks[10], d, (ff * 5) // 4), "out": _lin(ks[11], (ff * 5) // 4, d)},
        "nonlin_attn": {"in_proj": _lin(ks[12], d, 3 * hidden_na),
                        "out_proj": _lin(ks[13], hidden_na, d)},
        "conv1": _init_conv_module(ks[14], d, kernel),
        "conv2": _init_conv_module(ks[15], d, kernel),
        "norm": _bias_norm_init(d),
        "bypass_scale": jnp.full((d,), 0.5, jnp.float32),
        "bypass_mid_scale": jnp.full((d,), 0.5, jnp.float32),
    }


def _init_conv_module(rng, d, kernel):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "in_proj": _lin(k1, d, 2 * d),
        "dw_weight": jax.random.normal(k2, (kernel, d), jnp.float32) / math.sqrt(kernel),
        "dw_bias": jnp.zeros((d,), jnp.float32),
        "out_proj": _lin(k3, d, d),
    }


def _feed_forward(p, x, dt):
    h = linear(jax.tree.map(lambda a: a.astype(dt), p["in"]), x.astype(dt))
    h = swoosh_l(h)
    return linear(jax.tree.map(lambda a: a.astype(dt), p["out"]), h).astype(jnp.float32)


def _attention_weights(p, x, pos_emb, mask, heads, cfg):
    """Shared attention weights: softmax(q k^T + pos_scores).

    Returns [B, H, S, T] KEYS-MAJOR: out[b, h, s, t] is key s's weight for
    query t. (The Pallas kernel produces this orientation natively — its
    skew then runs along sublanes — and dot_general contracts the leading
    key axis on the MXU at no extra cost.)
    """
    dt = jnp.dtype(cfg.compute_dtype)
    b, t, d = x.shape
    qd, pd = cfg.query_head_dim, cfg.pos_head_dim
    proj = linear(jax.tree.map(lambda a: a.astype(dt), p["attn_in_proj"]), x.astype(dt))
    q = proj[..., : heads * qd].reshape(b, t, heads, qd)
    k = proj[..., heads * qd: 2 * heads * qd].reshape(b, t, heads, qd)
    pq = proj[..., 2 * heads * qd:].reshape(b, t, heads, pd)
    use_kernel = cfg.attention_kernel == "always" or (
        cfg.attention_kernel == "auto"
        and jax.default_backend() not in ("cpu",))
    if use_kernel:
        from sherpa_vietnamese_asr_tpu.ops.attention import (
            attention_weights_pallas,
        )
        return attention_weights_pallas(
            q.astype(jnp.float32), k.astype(jnp.float32),
            pq.astype(jnp.float32), p["attn_pos_proj"]["weight"], pos_emb,
            mask, cfg)
    # Content scores
    scores = jnp.einsum("bthd,bshd->bhts", q, k)
    # Positional scores. We need pos[b,h,t,s] = pq[b,t,h] . pos_lin[t-s+T-1].
    # A take_along_axis gather over the minor axis is pathologically slow on
    # TPU (it dominated the whole encoder); instead compute against the
    # ROW-REVERSED pos table and realign with the Transformer-XL skew trick —
    # pad + flat-slice + reshape, all layout ops.
    pt = jnp.dtype(cfg.pos_dtype)
    pos_lin = (pos_emb[::-1].astype(pt)
               @ p["attn_pos_proj"]["weight"].astype(pt))
    pos_lin = pos_lin.reshape(2 * t - 1, heads, pd)
    pos_full = jnp.einsum("bthd,rhd->bhtr", pq.astype(pt),
                          pos_lin)  # [B,H,T,2T-1]
    # skew: y[..., t, s] = pos_full[..., t, s + (T-1-t)]
    padded = jnp.pad(pos_full, ((0, 0), (0, 0), (0, 0), (0, 1)))
    flat = padded.reshape(b, heads, 2 * t * t)
    flat = jax.lax.slice_in_dim(flat, t - 1, t - 1 + t * (2 * t - 1), axis=2)
    pos_scores = flat.reshape(b, heads, t, 2 * t - 1)[..., :t]
    scores = (scores + pos_scores).astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], -1e9, scores)
    return jnp.swapaxes(jax.nn.softmax(scores, axis=-1), 2, 3)


def _self_attention(p, x, attn_w, heads, vd, dt):
    """attn_w: [B, H, S, T] keys-major."""
    b, t, _ = x.shape
    v = linear(jax.tree.map(lambda a: a.astype(dt), p["in_proj"]), x.astype(dt))
    v = v.reshape(b, t, heads, vd)
    out = jnp.einsum("bhst,bshd->bthd", attn_w.astype(dt), v)
    out = out.reshape(b, t, heads * vd)
    return linear(jax.tree.map(lambda a: a.astype(dt), p["out_proj"]), out).astype(jnp.float32)


def _nonlin_attention(p, x, attn_w1, dt):
    """NonlinAttention: gated single-head attention (uses head 0 weights).

    attn_w1: [B, S, T] keys-major."""
    b, t, _ = x.shape
    proj = linear(jax.tree.map(lambda a: a.astype(dt), p["in_proj"]), x.astype(dt))
    s, v, y = jnp.split(proj, 3, axis=-1)
    v = jnp.tanh(s) * v
    out = jnp.einsum("bst,bsd->btd", attn_w1.astype(dt), v)
    out = out * y
    return linear(jax.tree.map(lambda a: a.astype(dt), p["out_proj"]), out).astype(jnp.float32)


def _conv_module(p, x, pad_mask, dt):
    """ConvolutionModule: GLU-style gate, depthwise conv (same pad), SwooshR."""
    proj = linear(jax.tree.map(lambda a: a.astype(dt), p["in_proj"]), x.astype(dt))
    v, g = jnp.split(proj, 2, axis=-1)
    h = v * jax.nn.sigmoid(g)
    if pad_mask is not None:
        h = jnp.where(pad_mask[:, :, None], 0.0, h)
    # Depthwise conv over time: [B, T, D], kernel [K, D]
    k = p["dw_weight"].shape[0]
    w = p["dw_weight"].astype(dt)[:, None, :]  # [K, 1, D] HIO for feature groups
    h = jax.lax.conv_general_dilated(
        h, w, (1,), [((k - 1) // 2, (k - 1) // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=h.shape[-1])
    h = h + p["dw_bias"].astype(dt)
    h = swoosh_r(h)
    return linear(jax.tree.map(lambda a: a.astype(dt), p["out_proj"]), h).astype(jnp.float32)


def _bypass(scale, x_orig, x):
    s = jnp.clip(scale, 0.0, 1.0)
    return x_orig + (x - x_orig) * s


def encoder_layer(p, x, pos_emb, pad_mask, heads, cfg: ZipformerConfig):
    """One Zipformer2 layer. x: [B, T, D] float32."""
    dt = jnp.dtype(cfg.compute_dtype)
    vd = cfg.value_head_dim
    x_orig = x
    attn_w = _attention_weights(p, x, pos_emb, pad_mask, heads, cfg)
    x = x + _feed_forward(p["ff1"], x, dt)
    x = x + _nonlin_attention(p["nonlin_attn"], x, attn_w[:, 0], dt)
    x = x + _self_attention(p["self_attn1"], x, attn_w, heads, vd, dt)
    x = x + _conv_module(p["conv1"], x, pad_mask, dt)
    x = x + _feed_forward(p["ff2"], x, dt)
    x = _bypass(p["bypass_mid_scale"], x_orig, x)
    x = x + _self_attention(p["self_attn2"], x, attn_w, heads, vd, dt)
    x = x + _conv_module(p["conv2"], x, pad_mask, dt)
    x = x + _feed_forward(p["ff3"], x, dt)
    x = bias_norm(p["norm"], x)
    x = _bypass(p["bypass_scale"], x_orig, x)
    return x


# ---------------------------------------------------------------------------
# Down/upsampling between stacks
# ---------------------------------------------------------------------------

def init_downsample(ds):
    return {"weights": jnp.zeros((ds,), jnp.float32)}


def simple_downsample(p, x, ds):
    """[B, T, D] -> [B, ceil(T/ds), D]; softmax-weighted average within groups."""
    if ds == 1:
        return x
    b, t, d = x.shape
    pad = (-t) % ds
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[:, -1:, :], pad, axis=1)], axis=1)
    w = jax.nn.softmax(p["weights"])
    x = x.reshape(b, -1, ds, d)
    return jnp.einsum("bgkd,k->bgd", x, w)


def simple_upsample(x, ds):
    if ds == 1:
        return x
    return jnp.repeat(x, ds, axis=1)


def _convert_channels(x, d):
    cur = x.shape[-1]
    if d == cur:
        return x
    if d < cur:
        return x[..., :d]
    return jnp.pad(x, ((0, 0), (0, 0), (0, d - cur)))


# ---------------------------------------------------------------------------
# Full encoder
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("cfg",))
def init_zipformer_params(rng, cfg: ZipformerConfig = ZIPFORMER_30M):
    n_stacks = len(cfg.num_encoder_layers)
    keys = jax.random.split(rng, n_stacks + 2)
    params = {"encoder_embed": init_encoder_embed(keys[0], cfg), "stacks": []}
    for i in range(n_stacks):
        d, ff = cfg.encoder_dim[i], cfg.ffn_dim[i]
        heads, kernel = cfg.num_heads[i], cfg.cnn_module_kernel[i]
        lkeys = jax.random.split(keys[i + 1], cfg.num_encoder_layers[i])
        stack = {
            "layers": [init_layer(lkeys[j], d, ff, heads, kernel, cfg)
                       for j in range(cfg.num_encoder_layers[i])],
            "downsample": init_downsample(cfg.downsampling_factor[i]),
            "out_bypass_scale": jnp.full((d,), 0.5, jnp.float32),
        }
        params["stacks"].append(stack)
    params["downsample_output"] = init_downsample(2)
    return params


def _use_layer_kernel(cfg: ZipformerConfig, stack_idx: int, t_ds: int) -> bool:
    """Gate for the whole-layer megakernel on stack `stack_idx`.

    Measured window (v5 chip, 8x33 s batch, PERFORMANCE.md round-3 table):
    the kernel wins 2.4x at t_pad=512/H=4 (mid stacks), LOSES when blocks
    are tiny with many heads (t_pad=256/H=8: 2.8x slower — fixed
    per-(block, head) overhead), and cannot hold the [H*T, T] weights
    scratch at stack0 sizes (t_pad=1664: 22 MB). t_pad=896 (stacks 1/5)
    measured ~1.2x faster per layer in isolation but its 18.9 MB scoped-
    vmem stack is over the 16 MB limit in some surrounding programs
    (schedule-dependent Mosaic OOM) and the whole-encoder effect was a
    wash — kept OFF. The streamed-HBM variant (encoder_layer_pallas
    streamed=True, double-buffered DMA) compiles and is bit-identical at
    any T but measured 2.03 vs 1.52 ms/layer against XLA at stack0 —
    kept as harness, not gated in. The gate encodes the winning window
    plus a VMEM estimate for other configs."""
    if cfg.layer_kernel == "never":
        return False
    if cfg.layer_kernel == "always":
        return True
    if jax.default_backend() in ("cpu",):
        return False
    if jnp.dtype(cfg.compute_dtype) != jnp.bfloat16:
        return False
    from sherpa_vietnamese_asr_tpu.ops.encoder_layer import (
        layer_kernel_vmem_bytes,
    )
    d = cfg.encoder_dim[stack_idx]
    ff = cfg.ffn_dim[stack_idx]
    heads = cfg.num_heads[stack_idx]
    tp = -(-t_ds // 128) * 128
    if heads > 4 or tp < 384:
        return False
    est = layer_kernel_vmem_bytes(
        tp, d, heads, ((ff * 3) // 4, ff, (ff * 5) // 4),
        cfg.cnn_module_kernel[stack_idx], cfg)
    return est < 12 * 1024 * 1024


def zipformer_encoder(params, x, x_lens, cfg: ZipformerConfig = ZIPFORMER_30M):
    """Run the encoder.

    Args:
        params: pytree from init_zipformer_params (or the ONNX importer).
        x: [B, T, 80] float32 fbank features.
        x_lens: [B] int32 valid frame counts.
        cfg: model configuration.

    Returns:
        (encoder_out [B, T_out, output_dim] float32, out_lens [B] int32)
    """
    with jax.default_matmul_precision(cfg.matmul_precision):
        return _zipformer_encoder_body(params, x, x_lens, cfg)


def _zipformer_encoder_body(params, x, x_lens, cfg):
    lens = jnp.maximum((x_lens - 7) // 2, 0)
    h = encoder_embed(params["encoder_embed"], x, lens, cfg)  # [B, T', D0]
    t_full = h.shape[1]
    outputs = []
    for i, stack in enumerate(params["stacks"]):
        ds = cfg.downsampling_factor[i]
        d = cfg.encoder_dim[i]
        heads = cfg.num_heads[i]
        h = _convert_channels(h, d)
        # Padded tail -> last-frame copies (see _clamp_tail) so downsample
        # boundary groups match the reference's repeat-last-frame padding.
        h = _clamp_tail(h, lens)
        h_orig = h
        hs = simple_downsample(stack["downsample"], h, ds)
        t_ds = hs.shape[1]
        stack_lens = (lens + ds - 1) // ds
        if _use_layer_kernel(cfg, i, t_ds):
            from sherpa_vietnamese_asr_tpu.ops.encoder_layer import (
                encoder_layer_pallas,
            )
            tp = -(-t_ds // 128) * 128
            hs_p = jnp.pad(hs, ((0, 0), (0, tp - t_ds), (0, 0)))
            rev = jnp.asarray(_padded_rev_pos_emb(t_ds, tp, cfg.pos_dim))
            if len(stack["layers"]) == 1:
                hs_p = encoder_layer_pallas(stack["layers"][0], hs_p, rev,
                                            stack_lens, heads, cfg)
            else:
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                                       *stack["layers"])

                def kbody(carry, layer_params):
                    return encoder_layer_pallas(
                        layer_params, carry, rev, stack_lens, heads,
                        cfg), None

                hs_p, _ = jax.lax.scan(kbody, hs_p, stacked)
            hs = hs_p[:, :t_ds]
        else:
            pad_mask = jnp.arange(t_ds)[None, :] >= stack_lens[:, None]
            pos_emb = jnp.asarray(compact_rel_pos_emb(t_ds, cfg.pos_dim))
            if len(stack["layers"]) == 1:
                hs = encoder_layer(stack["layers"][0], hs, pos_emb, pad_mask,
                                   heads, cfg)
            else:
                # Scan over stacked layer params: one traced layer body per
                # stack instead of num_layers copies (compile time on the
                # single-core host is the bottleneck; numerics identical).
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                                       *stack["layers"])

                def body(carry, layer_params):
                    return encoder_layer(layer_params, carry, pos_emb,
                                         pad_mask, heads, cfg), None

                hs, _ = jax.lax.scan(body, hs, stacked)
        hs = simple_upsample(hs, ds)[:, :t_full]
        h = _bypass(stack["out_bypass_scale"], h_orig, hs) if ds != 1 else hs
        outputs.append(h)
    # Full-dim output: concat feature slices, newest stack first (icefall
    # zipformer.py _get_full_dim_output).
    out_dim = cfg.output_dim
    pieces = [outputs[-1]]
    cur = cfg.encoder_dim[-1]
    for i in range(len(outputs) - 2, -1, -1):
        d = cfg.encoder_dim[i]
        if d > cur:
            pieces.append(outputs[i][..., cur:d])
            cur = d
    full = jnp.concatenate(pieces, axis=-1)
    if full.shape[-1] < out_dim:
        full = jnp.pad(full, ((0, 0), (0, 0), (0, out_dim - full.shape[-1])))
    # Final x2 downsample to 25 Hz (tail clamped for the boundary group)
    full = _clamp_tail(full, lens)
    out = simple_downsample(params["downsample_output"], full, 2)
    out_lens = (lens + 1) // 2
    # Zero out padded frames
    mask = jnp.arange(out.shape[1])[None, :] < out_lens[:, None]
    out = jnp.where(mask[:, :, None], out, 0.0)
    return out, out_lens


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

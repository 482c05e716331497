# Conv-TasNet (Libri2Mix sepclean 16k) 2-speaker separation in functional JAX.
#
# TPU-native replacement for convtasnet_16k.onnx (reference
# core/overlap_separator.py:70, :289-300): mixture [B, T] -> two estimated
# sources [B, 2, T]. Architecture per Luo & Mesgarani 2019, at the
# Libri2Mix sepclean 16k configuration (asteroid JorisCos/ConvTasNet_
# Libri2Mix_sepclean_16k): encoder Conv1d(1, 512, L=32, stride=16) + ReLU,
# TCN separator (bottleneck 128, hidden 512, kernel 3, X=8 blocks x R=3
# repeats, gLN, skip connections 128), ReLU masks, overlap-add decoder.

from __future__ import annotations

import dataclasses
import math

import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ConvTasNetConfig:
    n_filters: int = 512   # N
    kernel: int = 32       # L
    stride: int = 16
    bottleneck: int = 128  # B
    hidden: int = 512      # H
    skip: int = 128        # Sc
    conv_kernel: int = 3   # P
    n_blocks: int = 8      # X
    n_repeats: int = 3     # R
    n_src: int = 2


TINY_CONVTASNET = ConvTasNetConfig(n_filters=64, bottleneck=32, hidden=64,
                                   skip=32, n_blocks=2, n_repeats=1)


def _conv_init(rng, k, c_in, c_out):
    return {"weight": jax.random.normal(rng, (k, c_in, c_out))
            / math.sqrt(k * c_in),
            "bias": jnp.zeros((c_out,))}


def _gln_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("cfg",))
def init_convtasnet_params(rng, cfg: ConvTasNetConfig = ConvTasNetConfig()):
    keys = iter(jax.random.split(rng, 8 + cfg.n_repeats * cfg.n_blocks * 8))
    params = {
        "encoder": _conv_init(next(keys), cfg.kernel, 1, cfg.n_filters),
        "ln_in": _gln_init(cfg.n_filters),
        "bottleneck_in": _conv_init(next(keys), 1, cfg.n_filters,
                                    cfg.bottleneck),
        "blocks": [],
        "mask_out": _conv_init(next(keys), 1, cfg.skip,
                               cfg.n_src * cfg.n_filters),
        # asteroid nn.PReLU() alphas: single learnable scalar per module
        "mask_prelu": jnp.full((1,), 0.25, jnp.float32),
        "decoder": jax.random.normal(next(keys),
                                     (cfg.n_filters, cfg.kernel))
        / math.sqrt(cfg.n_filters),
    }
    for r in range(cfg.n_repeats):
        for x in range(cfg.n_blocks):
            params["blocks"].append({
                "in_conv": _conv_init(next(keys), 1, cfg.bottleneck,
                                      cfg.hidden),
                "ln1": _gln_init(cfg.hidden),
                "dw_conv": {"weight": jax.random.normal(
                    next(keys), (cfg.conv_kernel, 1, cfg.hidden))
                    / math.sqrt(cfg.conv_kernel),
                    "bias": jnp.zeros((cfg.hidden,))},
                "ln2": _gln_init(cfg.hidden),
                "prelu1": jnp.full((1,), 0.25, jnp.float32),
                "prelu2": jnp.full((1,), 0.25, jnp.float32),
                "res_conv": _conv_init(next(keys), 1, cfg.hidden,
                                       cfg.bottleneck),
                "skip_conv": _conv_init(next(keys), 1, cfg.hidden, cfg.skip),
            })
    return params


def _glob_ln(p, x, eps=1e-8):
    """Global layer norm over (time, channel). x: [B, T, C]."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _conv1d(p, x, dilation=1, groups=1, pad="same"):
    k = p["weight"].shape[0]
    if pad == "same":
        total = dilation * (k - 1)
        padding = [(total // 2, total - total // 2)]
    else:
        padding = [(0, 0)]
    return jax.lax.conv_general_dilated(
        x, p["weight"], (1,), padding, rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups) + p["bias"]


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def convtasnet_separate(params, mixture, cfg: ConvTasNetConfig = ConvTasNetConfig()):
    """mixture: [B, T] float32 -> [B, n_src, T] estimated sources."""
    b, t = mixture.shape
    # pad to a full frame grid
    pad = (-(t - cfg.kernel)) % cfg.stride if t >= cfg.kernel \
        else cfg.kernel - t
    x = jnp.pad(mixture, ((0, 0), (0, pad)))[:, :, None]
    # Encoder (framing + matmul = Conv1d stride 16)
    n_frames = (x.shape[1] - cfg.kernel) // cfg.stride + 1
    idx = (np.arange(n_frames)[:, None] * cfg.stride
           + np.arange(cfg.kernel)[None, :])
    frames = x[:, :, 0][:, idx]                       # [B, F, L]
    enc_w = params["encoder"]["weight"][:, 0, :]      # [L, N]
    w = jax.nn.relu(frames @ enc_w + params["encoder"]["bias"])  # [B, F, N]

    h = _glob_ln(params["ln_in"], w)
    h = _conv1d(params["bottleneck_in"], h)           # [B, F, Bn]
    skip_sum = 0.0
    for bi, blk in enumerate(params["blocks"]):
        dilation = 2 ** (bi % cfg.n_blocks)
        y = _conv1d(blk["in_conv"], h)
        y = _glob_ln(blk["ln1"], _prelu(y, blk["prelu1"]))
        y = _conv1d(blk["dw_conv"], y, dilation=dilation,
                    groups=y.shape[-1])
        y = _glob_ln(blk["ln2"], _prelu(y, blk["prelu2"]))
        skip_sum = skip_sum + _conv1d(blk["skip_conv"], y)
        h = h + _conv1d(blk["res_conv"], y)
    m = _conv1d(params["mask_out"],
                _prelu(skip_sum, params["mask_prelu"]))  # [B, F, n_src*N]
    masks = jax.nn.relu(m.reshape(b, n_frames, cfg.n_src, cfg.n_filters))
    sources = w[:, :, None, :] * masks                 # [B, F, S, N]

    # Decoder: frame synthesis + overlap-add
    dec = params["decoder"]                            # [N, L]
    frames_out = jnp.einsum("bfsn,nl->bsfl", sources, dec)
    t_pad = x.shape[1]
    out = jnp.zeros((b, cfg.n_src, t_pad))
    # overlap-add via scatter on the frame grid
    pos = (np.arange(n_frames)[:, None] * cfg.stride
           + np.arange(cfg.kernel)[None, :]).reshape(-1)
    out = out.at[:, :, pos].add(
        frames_out.reshape(b, cfg.n_src, -1))
    return out[:, :, :t]

# CAM++ speaker embedding (3D-Speaker campplus_cn_en_common 200k) in JAX.
#
# TPU-native replacement for campplus_cn_en_common_200k.onnx (reference
# core/speaker_diarization_senko_campp_optimized.py:339 batch-32 sessions and
# core/overlap_separator.py:130-147): 80-dim fbank [B, T, 80] -> 192-dim
# speaker embedding. Architecture per the CAM++ paper (Wang et al. 2023):
# FCM 2D-conv front-end, D-TDNN backbone (three dense blocks with growth-rate
# TDNN layers, each gated by Context-Aware Masking), then global statistics
# pooling + linear to 192 dims. Exact layer sizes are restored from the ONNX
# checkpoint by the importer; random init preserves shapes for tests/bench.

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CamppConfig:
    num_mels: int = 80
    fcm_channels: int = 32
    init_channels: int = 128
    growth_rate: int = 32
    block_layers: tuple = (12, 24, 16)
    bottleneck: int = 128  # inside dense layers (bn_channels)
    embed_dim: int = 192
    compute_dtype: str = "float32"


TINY_CAMPP = CamppConfig(fcm_channels=8, init_channels=32, growth_rate=8,
                         block_layers=(2, 2, 2), bottleneck=16, embed_dim=32)


def _lin(rng, i, o):
    return {"weight": jax.random.normal(rng, (i, o)) / math.sqrt(i),
            "bias": jnp.zeros((o,))}


def _bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _conv1d_init(rng, k, c_in, c_out):
    return {"weight": jax.random.normal(rng, (k, c_in, c_out))
            / math.sqrt(k * c_in),
            "bias": jnp.zeros((c_out,))}


def init_campp_params(rng, cfg: CamppConfig = CamppConfig()):
    keys = iter(jax.random.split(rng, 1024))
    params = {
        # FCM: two 2D conv (stride 2 on freq) over the fbank "image"
        "fcm1": {"weight": jax.random.normal(next(keys), (3, 3, 1, cfg.fcm_channels))
                 / 3.0, "bias": jnp.zeros((cfg.fcm_channels,)),
                 "bn": _bn(cfg.fcm_channels)},
        "fcm2": {"weight": jax.random.normal(
            next(keys), (3, 3, cfg.fcm_channels, cfg.fcm_channels)) /
            math.sqrt(9 * cfg.fcm_channels),
            "bias": jnp.zeros((cfg.fcm_channels,)),
            "bn": _bn(cfg.fcm_channels)},
        "blocks": [],
        "transitions": [],
    }
    fcm_out = cfg.fcm_channels * (cfg.num_mels // 4)
    params["tdnn_in"] = _conv1d_init(next(keys), 5, fcm_out,
                                     cfg.init_channels)
    params["tdnn_in_bn"] = _bn(cfg.init_channels)
    c = cfg.init_channels
    for n_layers in cfg.block_layers:
        block = []
        for _ in range(n_layers):
            layer = {
                "bn1": _bn(c),
                "conv1": _conv1d_init(next(keys), 1, c, cfg.bottleneck),
                "bn2": _bn(cfg.bottleneck),
                "conv2": _conv1d_init(next(keys), 3, cfg.bottleneck,
                                      cfg.growth_rate),
                # CAM gate: segment-pooled context -> sigmoid mask
                "cam_lin1": _lin(next(keys), c, cfg.bottleneck),
                "cam_lin2": _lin(next(keys), cfg.bottleneck, cfg.growth_rate),
            }
            block.append(layer)
            c += cfg.growth_rate
        params["blocks"].append(block)
        # transition halves channels
        c_out = c // 2
        params["transitions"].append(
            {"bn": _bn(c), "conv": _conv1d_init(next(keys), 1, c, c_out)})
        c = c_out
    params["final_bn"] = _bn(c)
    params["embed"] = _lin(next(keys), 2 * c, cfg.embed_dim)
    return params


def _bn_apply(p, x, eps=1e-5):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["scale"] \
        + p["bias"]


def _conv1d(p, x, dilation=1, pad="same"):
    k = p["weight"].shape[0]
    total = dilation * (k - 1)
    padding = [(total // 2, total - total // 2)] if pad == "same" else [(0, 0)]
    return jax.lax.conv_general_dilated(
        x, p["weight"], (1,), padding, rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC")) + p["bias"]


def campp_embed(params, fbank, cfg: CamppConfig = CamppConfig(), mask=None):
    """fbank: [B, T, 80] (CMVN applied by caller) -> [B, embed_dim].

    mask: optional [B, T] validity mask for padded batches.
    """
    b, t, m = fbank.shape
    x = fbank[:, :, :, None]  # [B, T, M, 1]
    for name in ("fcm1", "fcm2"):
        p = params[name]
        x = jax.lax.conv_general_dilated(
            x, p["weight"], (1, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]
        x = jax.nn.relu(_bn_apply(p["bn"], x))
    bb, tt, mm, cc = x.shape
    h = jnp.transpose(x, (0, 1, 3, 2)).reshape(bb, tt, cc * mm)  # [B, T, C]

    h = _conv1d(params["tdnn_in"], h)
    h = jax.nn.relu(_bn_apply(params["tdnn_in_bn"], h))

    if mask is not None:
        msk = mask[:, :tt, None].astype(h.dtype)
    else:
        msk = jnp.ones((bb, tt, 1), h.dtype)

    def mean_t(v):
        return (v * msk).sum(axis=1) / jnp.maximum(msk.sum(axis=1), 1e-6)

    dilations = (1, 2, 3)
    for bi, block in enumerate(params["blocks"]):
        for layer in block:
            y = jax.nn.relu(_bn_apply(layer["bn1"], h))
            y = _conv1d(layer["conv1"], y)
            y = jax.nn.relu(_bn_apply(layer["bn2"], y))
            y = _conv1d(layer["conv2"], y, dilation=dilations[bi % 3])
            # Context-aware mask from pooled context of the block input
            ctx = mean_t(h)
            g = jax.nn.relu(ctx @ layer["cam_lin1"]["weight"]
                            + layer["cam_lin1"]["bias"])
            g = jax.nn.sigmoid(g @ layer["cam_lin2"]["weight"]
                               + layer["cam_lin2"]["bias"])
            y = y * g[:, None, :]
            h = jnp.concatenate([h, y], axis=-1)  # dense connectivity
        tr = params["transitions"][bi]
        h = jax.nn.relu(_bn_apply(tr["bn"], h))
        h = _conv1d(tr["conv"], h)

    h = jax.nn.relu(_bn_apply(params["final_bn"], h))
    mean = mean_t(h)
    var = mean_t(h * h) - mean ** 2
    stats = jnp.concatenate([mean, jnp.sqrt(jnp.maximum(var, 1e-8))], axis=-1)
    return stats @ params["embed"]["weight"] + params["embed"]["bias"]

# CAM++ speaker embedding (3D-Speaker campplus_cn_en_common 200k) in JAX.
#
# TPU-native replacement for campplus_cn_en_common_200k.onnx (reference
# core/speaker_diarization_senko_campp_optimized.py:339 batch-32 sessions and
# core/overlap_separator.py:130-147): 80-dim fbank [B, T, 80] -> 192-dim
# speaker embedding. Architecture mirrors the reference's own exporter
# (convert_onnx/export_campplus_onnx.py — FCM residual 2D front-end that
# downsamples frequency by 8, a stride-2 input TDNN, D-TDNN dense blocks of
# (12, 24, 16) CAM layers with dilations (1, 2, 2), per-100-frame segment
# pooling inside the CAM gate, stats pooling, and a bias-free embedding
# linear followed by a non-affine BatchNorm). Weights load via
# models/onnx_import.load_campp; random init preserves shapes.

from __future__ import annotations

import dataclasses
import math

import functools

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CamppConfig:
    num_mels: int = 80
    m_channels: int = 32          # FCM width
    init_channels: int = 128      # TDNN output channels
    growth_rate: int = 32
    bn_size: int = 4              # bottleneck = bn_size * growth_rate
    block_layers: tuple = (12, 24, 16)
    dilations: tuple = (1, 2, 2)
    kernel: int = 3
    seg_len: int = 100            # CAM segment pooling length
    embed_dim: int = 192
    compute_dtype: str = "float32"

    @property
    def bottleneck(self) -> int:
        return self.bn_size * self.growth_rate


TINY_CAMPP = CamppConfig(m_channels=8, init_channels=32, growth_rate=8,
                         bn_size=2, block_layers=(2, 2), dilations=(1, 2),
                         embed_dim=32)


def _lin(rng, i, o, bias=True):
    p = {"weight": jax.random.normal(rng, (i, o)) / math.sqrt(i)}
    if bias:
        p["bias"] = jnp.zeros((o,))
    return p


def _bn(c, affine=True):
    p = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
    if affine:
        p["scale"] = jnp.ones((c,))
        p["bias"] = jnp.zeros((c,))
    return p


def _conv2d_init(rng, kh, kw, c_in, c_out):
    return {"weight": jax.random.normal(rng, (kh, kw, c_in, c_out))
            / math.sqrt(kh * kw * c_in)}


def _conv1d_init(rng, k, c_in, c_out):
    return {"weight": jax.random.normal(rng, (k, c_in, c_out))
            / math.sqrt(k * c_in)}


def _resblock_init(keys, c_in, c_out, stride):
    p = {
        "conv1": _conv2d_init(next(keys), 3, 3, c_in, c_out),
        "bn1": _bn(c_out),
        "conv2": _conv2d_init(next(keys), 3, 3, c_out, c_out),
        "bn2": _bn(c_out),
    }
    if stride != 1 or c_in != c_out:
        p["shortcut_conv"] = _conv2d_init(next(keys), 1, 1, c_in, c_out)
        p["shortcut_bn"] = _bn(c_out)
    return p


@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("cfg",))
def init_campp_params(rng, cfg: CamppConfig = CamppConfig()):
    keys = iter(jax.random.split(rng, 4096))
    mc = cfg.m_channels
    params = {
        "fcm": {
            "conv1": _conv2d_init(next(keys), 3, 3, 1, mc),
            "bn1": _bn(mc),
            "layer1": [_resblock_init(keys, mc, mc, 2),
                       _resblock_init(keys, mc, mc, 1)],
            "layer2": [_resblock_init(keys, mc, mc, 2),
                       _resblock_init(keys, mc, mc, 1)],
            "conv2": _conv2d_init(next(keys), 3, 3, mc, mc),
            "bn2": _bn(mc),
        },
        "blocks": [],
        "transitions": [],
    }
    fcm_out = mc * (cfg.num_mels // 8)
    params["tdnn"] = _conv1d_init(next(keys), 5, fcm_out, cfg.init_channels)
    params["tdnn_bn"] = _bn(cfg.init_channels)
    c = cfg.init_channels
    bn_ch = cfg.bottleneck
    for n_layers in cfg.block_layers:
        block = []
        for _ in range(n_layers):
            block.append({
                "bn1": _bn(c),                                 # nonlinear1
                "lin1": _conv1d_init(next(keys), 1, c, bn_ch),  # no bias
                "bn2": _bn(bn_ch),                             # nonlinear2
                "local": _conv1d_init(next(keys), cfg.kernel, bn_ch,
                                      cfg.growth_rate),        # no bias
                "cam1": _lin(next(keys), bn_ch, bn_ch // 2),
                "cam2": _lin(next(keys), bn_ch // 2, cfg.growth_rate),
            })
            c += cfg.growth_rate
        params["blocks"].append(block)
        c_out = c // 2
        params["transitions"].append(
            {"bn": _bn(c), "conv": _conv1d_init(next(keys), 1, c, c_out)})
        c = c_out
    params["final_bn"] = _bn(c)
    params["dense"] = {"lin": _lin(next(keys), 2 * c, cfg.embed_dim,
                                   bias=False),
                       "bn": _bn(cfg.embed_dim, affine=False)}
    return params


def _bn_apply(p, x, eps=1e-5):
    out = (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps)
    if "scale" in p:
        out = out * p["scale"] + p["bias"]
    return out


def _conv2d(p, x, strides=(1, 1), pad=1):
    return jax.lax.conv_general_dilated(
        x, p["weight"], strides, [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv1d(p, x, stride=1, dilation=1):
    k = p["weight"].shape[0]
    total = dilation * (k - 1)
    out = jax.lax.conv_general_dilated(
        x, p["weight"], (stride,), [(total // 2, total - total // 2)],
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"))
    if "bias" in p:
        out = out + p["bias"]
    return out


def _resblock(p, x, stride):
    # BasicResBlock: stride applies to the FREQUENCY axis only
    # (exporter BasicResBlock stride=(stride, 1) on [B, C, F, T];
    # our layout is [B, T, F, C] so the window stride is (1, stride)).
    out = jax.nn.relu(_bn_apply(p["bn1"], _conv2d(p["conv1"], x,
                                                  (1, stride))))
    out = _bn_apply(p["bn2"], _conv2d(p["conv2"], out))
    if "shortcut_conv" in p:
        sc = _bn_apply(p["shortcut_bn"],
                       _conv2d(p["shortcut_conv"], x, (1, stride), pad=0))
    else:
        sc = x
    return jax.nn.relu(out + sc)


def campp_embed(params, fbank, cfg: CamppConfig = CamppConfig(), mask=None):
    """fbank: [B, T, num_mels] (CMVN applied by caller) -> [B, embed_dim].

    mask: optional [B, T] validity mask for padded batches (the unpadded
    model sees exact-length inputs; masked pooling reproduces that).
    """
    b, t, m = fbank.shape
    x = fbank[:, :, :, None]  # [B, T, F, 1]
    fcm = params["fcm"]
    x = jax.nn.relu(_bn_apply(fcm["bn1"], _conv2d(fcm["conv1"], x)))
    for blk in fcm["layer1"]:
        x = _resblock(blk, x, 2 if "shortcut_conv" in blk else 1)
    for blk in fcm["layer2"]:
        x = _resblock(blk, x, 2 if "shortcut_conv" in blk else 1)
    x = jax.nn.relu(_bn_apply(fcm["bn2"], _conv2d(fcm["conv2"], x,
                                                  (1, 2))))
    bb, tt, ff, cc = x.shape
    h = jnp.transpose(x, (0, 1, 3, 2)).reshape(bb, tt, cc * ff)

    # input TDNN: k5 stride 2 (exporter TDNNLayer(..., 5, stride=2))
    h = _conv1d(params["tdnn"], h, stride=2)
    h = jax.nn.relu(_bn_apply(params["tdnn_bn"], h))
    t2 = h.shape[1]

    if mask is not None:
        msk = mask[:, : 2 * t2 : 2][:, :, None].astype(h.dtype)
        if msk.shape[1] < t2:
            msk = jnp.pad(msk, ((0, 0), (0, t2 - msk.shape[1]), (0, 0)))
    else:
        msk = jnp.ones((bb, t2, 1), h.dtype)

    def mean_t(v):
        return (v * msk).sum(axis=1) / jnp.maximum(msk.sum(axis=1), 1e-6)

    def seg_pool(v):
        # Per-100-frame segment averages broadcast back over time
        # (exporter CAMLayer.seg_pooling: avg_pool1d ceil_mode + expand).
        sl = cfg.seg_len
        n_seg = -(-t2 // sl)
        pad = n_seg * sl - t2
        vp = jnp.pad(v * msk, ((0, 0), (0, pad), (0, 0)))
        mp = jnp.pad(jnp.broadcast_to(msk, v.shape), ((0, 0), (0, pad),
                                                      (0, 0)))
        num = vp.reshape(bb, n_seg, sl, -1).sum(axis=2)
        den = jnp.maximum(mp.reshape(bb, n_seg, sl, -1).sum(axis=2), 1e-6)
        seg = num / den  # [B, n_seg, C]
        rep = jnp.repeat(seg, sl, axis=1)[:, :t2]
        return rep

    for bi, block in enumerate(params["blocks"]):
        dil = cfg.dilations[bi]
        for layer in block:
            x1 = jax.nn.relu(_bn_apply(layer["bn1"], h))
            bneck = _conv1d(layer["lin1"], x1)
            x2 = jax.nn.relu(_bn_apply(layer["bn2"], bneck))
            y = _conv1d(layer["local"], x2, dilation=dil)
            # CAM gate: global mean + segment pooling of the bottleneck
            ctx = mean_t(x2)[:, None, :] + seg_pool(x2)       # [B, T2, C]
            g = jax.nn.relu(ctx @ layer["cam1"]["weight"]
                            + layer["cam1"]["bias"])
            g = jax.nn.sigmoid(g @ layer["cam2"]["weight"]
                               + layer["cam2"]["bias"])
            h = jnp.concatenate([h, y * g], axis=-1)
        tr = params["transitions"][bi]
        h = jax.nn.relu(_bn_apply(tr["bn"], h))
        h = _conv1d(tr["conv"], h)

    h = jax.nn.relu(_bn_apply(params["final_bn"], h))
    mean = mean_t(h)
    var = mean_t(h * h) - mean ** 2
    # 3D-Speaker statistics_pooling uses torch.std(unbiased=True): scale the
    # biased masked variance by n/(n-1).
    n_valid = jnp.maximum(msk.sum(axis=1), 2.0)
    var = var * n_valid / (n_valid - 1.0)
    # clamp only the negative fp-cancellation tail: torch.std gives exactly 0
    # for constant (dead-relu) channels, so a 1e-8 floor would bias them.
    stats = jnp.concatenate([mean, jnp.sqrt(jnp.maximum(var, 0.0))],
                            axis=-1)
    emb = stats @ params["dense"]["lin"]["weight"]
    return _bn_apply(params["dense"]["bn"], emb)

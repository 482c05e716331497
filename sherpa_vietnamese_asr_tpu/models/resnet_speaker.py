# ResNet34-LM speaker embedding frame encoder (WeSpeaker-style) in JAX.
#
# TPU-native replacement for embedding_encoder.onnx + the external masked
# stats pooling + split Gemm (reference core/speaker_diarization_pure_ort.py:
# 450-485, 756-875): input [B, T, 80] fbank (Hamming window, CMVN, x32768 —
# RESNET_EMB_FBANK config) treated as a 1-channel image, ResNet34 with
# (3, 4, 6, 3) blocks and 32/64/128/256 channels, stride 2 on the last three
# stages. Frame features are the channelxfreq flatten [B, 256*10, T/8];
# masked statistics pooling and the final 5120->256 linear run in
# ops/stats_pool.py so per-(chunk, speaker) masks stay batched on device.

from __future__ import annotations

import dataclasses
import math

import functools

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ResNetSpeakerConfig:
    num_mels: int = 80
    base_channels: int = 32
    blocks: tuple = (3, 4, 6, 3)
    embed_dim: int = 256
    compute_dtype: str = "float32"

    @property
    def frame_feature_dim(self) -> int:
        return self.base_channels * 8 * (self.num_mels // 8)  # 256 * 10

    def out_time(self, t: int) -> int:
        """Output frame count for t input frames (3 stride-2 stages,
        k=3 / pad=1 convs: t -> (t-1)//2 + 1 per stage)."""
        for _ in range(3):
            t = (t - 1) // 2 + 1
        return t


TINY_RESNET = ResNetSpeakerConfig(base_channels=8, blocks=(1, 1, 1, 1),
                                  embed_dim=32)


def _conv_init(rng, kh, kw, c_in, c_out):
    return jax.random.normal(rng, (kh, kw, c_in, c_out), jnp.float32) \
        / math.sqrt(kh * kw * c_in)


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("cfg",))
def init_resnet_params(rng, cfg: ResNetSpeakerConfig = ResNetSpeakerConfig()):
    keys = iter(jax.random.split(rng, 256))
    params = {"conv1": _conv_init(next(keys), 3, 3, 1, cfg.base_channels),
              "bn1": _bn_init(cfg.base_channels), "stages": []}
    c_in = cfg.base_channels
    for stage, n_blocks in enumerate(cfg.blocks):
        c_out = cfg.base_channels * (2 ** stage)
        blocks = []
        for b in range(n_blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            block = {
                "conv1": _conv_init(next(keys), 3, 3, c_in, c_out),
                "bn1": _bn_init(c_out),
                "conv2": _conv_init(next(keys), 3, 3, c_out, c_out),
                "bn2": _bn_init(c_out),
            }
            if stride != 1 or c_in != c_out:
                block["down_conv"] = _conv_init(next(keys), 1, 1, c_in, c_out)
                block["down_bn"] = _bn_init(c_out)
            blocks.append(block)
            c_in = c_out
        params["stages"].append(blocks)
    # Final projection (the reference's split Gemm resnet_seg_1_{weight,bias})
    d = cfg.frame_feature_dim * 2
    params["proj"] = {
        "weight": jax.random.normal(next(keys), (cfg.embed_dim, d)) / math.sqrt(d),
        "bias": jnp.zeros((cfg.embed_dim,)),
    }
    return params


def _bn(p, x, dt, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"].astype(dt) + eps)
    return (x - p["mean"].astype(dt)) * inv * p["scale"].astype(dt) \
        + p["bias"].astype(dt)


def _block(p, x, dt, s):
    h = jax.lax.conv_general_dilated(
        x, p["conv1"].astype(dt), (s, s), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = jax.nn.relu(_bn(p["bn1"], h, dt))
    h = jax.lax.conv_general_dilated(
        h, p["conv2"].astype(dt), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = _bn(p["bn2"], h, dt)
    if "down_conv" in p:
        x = jax.lax.conv_general_dilated(
            x, p["down_conv"].astype(dt), (s, s), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = _bn(p["down_bn"], x, dt)
    return jax.nn.relu(h + x)


def resnet_frame_features(params, fbank, cfg: ResNetSpeakerConfig):
    """[B, T, M] fbank -> [B, D, T'] frame features (D = channels * freq')."""
    dt = jnp.dtype(cfg.compute_dtype)
    x = fbank.astype(dt)[:, :, :, None]  # NHWC: [B, T, M, 1]
    x = jax.lax.conv_general_dilated(
        x, params["conv1"].astype(dt), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = jax.nn.relu(_bn(params["bn1"], x, dt))
    for stage, blocks in enumerate(params["stages"]):
        for b, block in enumerate(blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            x = _block(block, x, dt, stride)
    # [B, T', M', C] -> [B, C*M', T']
    b, t, m, c = x.shape
    x = jnp.transpose(x, (0, 3, 2, 1)).reshape(b, c * m, t)
    return x.astype(jnp.float32)


def project_embedding(params, stats):
    """[..., 2D] pooled stats -> [..., embed_dim]."""
    return stats @ params["proj"]["weight"].T + params["proj"]["bias"]

# Streaming Zipformer: chunked causal encoder with carried state.
#
# TPU-native counterpart of the reference's streaming Zipformer ONNX
# (chunk-64 / left-128, reference streaming_asr_online.py:77 and model
# registry "zipformer-30m-rnnt-streaming-6000h"): a jitted step function
# processing fixed-size chunks with an explicit state pytree —
#   * per layer: cached key/na/v1/v2 left-context streams (at each stack's
#     rate) and cached depthwise-conv input tails (causal convolution),
#   * encoder-embed: cached fbank lookback frames + a cached ConvNeXt left
#     tail — the 7-tap depthwise conv runs CAUSALLY (pad 6 left from cache,
#     0 right), so embed outputs are invariant to chunk alignment (the
#     offline symmetric padding would see zeros where future context
#     belongs at every chunk edge).
# Attention is rectangular: queries = current chunk, keys = left-context
# cache + chunk, with the same relative-position scheme as the offline model
# (offsets are never positive: causal).
#
# The streaming and offline models share parameter pytrees (same init /
# ONNX import); outputs differ from the offline encoder by design (causal
# vs full context), exactly as the reference ships distinct offline and
# streaming checkpoints.

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sherpa_vietnamese_asr_tpu.models.zipformer import (
    ZipformerConfig,
    _bypass,
    _convert_channels,
    _feed_forward,
    bias_norm,
    compact_rel_pos_emb,
    linear,
    simple_downsample,
    simple_upsample,
    swoosh_r,
)


@dataclasses.dataclass(frozen=True)
class StreamingConfig:
    chunk_frames: int = 32      # embed-rate (50 Hz) frames per step = 0.64 s
    left_frames: int = 128      # embed-rate left-context frames
    fbank_lookback: int = 7     # fbank frames consumed by the embed convs


def _layer_state(batch, t_cache, d, kernel, cfg):
    # Separate caches per value-producing module, mirroring the streaming
    # Zipformer export's cached_key / cached_nonlin_attn / cached_val1 /
    # cached_val2 / cached_conv1 / cached_conv2 state.
    z = jnp.zeros((batch, t_cache, d), jnp.float32)
    return {
        "key_cache": z,       # layer input (q/k source)
        "na_cache": z,        # x after ff1 (nonlin-attention value source)
        "v1_cache": z,        # x after nonlin-attn (self_attn1 value source)
        "v2_cache": z,        # x after bypass_mid (self_attn2 value source)
        "conv1_tail": jnp.zeros((batch, kernel - 1, d), jnp.float32),
        "conv2_tail": jnp.zeros((batch, kernel - 1, d), jnp.float32),
    }


def _embed_freq_dim(cfg: ZipformerConfig) -> int:
    """Frequency bins after the conv1/conv2/conv3 stack (80 -> 19)."""
    f = cfg.num_features              # conv1: k3 freq-pad 1 keeps F
    f = (f - 3) // 2 + 1              # conv2: k3 stride 2 no pad
    return (f - 3) // 2 + 1           # conv3: k3 stride 2 no pad


def init_streaming_state(cfg: ZipformerConfig, scfg: StreamingConfig,
                         batch: int):
    """State pytree for streaming_step."""
    state = {
        "fbank_tail": jnp.zeros((batch, scfg.fbank_lookback, cfg.num_features),
                                jnp.float32),
        # ConvNeXt left context at the embed rate (causal 7-tap depthwise).
        "convnext_tail": jnp.zeros(
            (batch, 6, _embed_freq_dim(cfg), cfg.embed_layer3_channels),
            jnp.float32),
        "stacks": [],
    }
    for i in range(len(cfg.num_encoder_layers)):
        ds = cfg.downsampling_factor[i]
        d = cfg.encoder_dim[i]
        kernel = cfg.cnn_module_kernel[i]
        t_cache = max(scfg.left_frames // ds, 1)
        layers = [
            _layer_state(batch, t_cache, d, kernel, cfg)
            for _ in range(cfg.num_encoder_layers[i])
        ]
        state["stacks"].append(layers)
    return state


def _streaming_embed(p, x, cn_tail, cfg: ZipformerConfig):
    """Causal streaming Conv2dSubsampling + ConvNeXt.

    x: [B, T, 80] fbank with the 7-frame lookback prepended (so the valid
    conv stack consumes it exactly); cn_tail: [B, 6, F', C3] cached ConvNeXt
    input frames at the embed rate. The offline encoder_embed pads the
    ConvNeXt's 7-tap time axis symmetrically (3, 3); a chunked run would
    then see zeros where future context belongs and the output would depend
    on chunk alignment. Streaming uses a CAUSAL tap instead — pad 6 on the
    left from the carried tail, 0 on the right — mirroring the cached
    left-pad scheme of streaming Zipformer exports (reference
    streaming_asr_online.py:77 ships a separately-trained streaming
    checkpoint for the same reason). Outputs are chunking-invariant.

    Returns (embedded [B, (T-7)//2, D0], new_tail).
    """
    import jax

    from sherpa_vietnamese_asr_tpu.models.zipformer import (
        linear as _lin, swoosh_l as _swl, swoosh_r as _swr,
    )

    dt = jnp.dtype(cfg.compute_dtype)
    b = x.shape[0]
    h = x[:, :, :, None].astype(dt)
    h = jax.lax.conv_general_dilated(
        h, p["conv1"]["weight"].astype(dt), (1, 1), [(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = _swr(h + p["conv1"]["bias"].astype(dt))
    h = jax.lax.conv_general_dilated(
        h, p["conv2"]["weight"].astype(dt), (2, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = _swr(h + p["conv2"]["bias"].astype(dt))
    h = jax.lax.conv_general_dilated(
        h, p["conv3"]["weight"].astype(dt), (1, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = _swr(h + p["conv3"]["bias"].astype(dt))  # [B, C, F', C3]

    full = jnp.concatenate([cn_tail.astype(dt), h], axis=1)  # [B, 6+C, F', C3]
    c3 = h.shape[-1]
    g = jax.lax.conv_general_dilated(
        full, p["convnext_dw"]["weight"].astype(dt), (1, 1),
        [(0, 0), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c3)                               # [B, C, F', C3]
    g = g + p["convnext_dw"]["bias"].astype(dt)
    g = _lin(jax.tree.map(lambda a: a.astype(dt), p["convnext_pw1"]), g)
    g = _swl(g)
    g = _lin(jax.tree.map(lambda a: a.astype(dt), p["convnext_pw2"]), g)
    h = h + g
    new_tail = full[:, -6:].astype(jnp.float32)

    bt = h.shape[1]
    h = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, bt, -1)
    h = _lin(jax.tree.map(lambda a: a.astype(dt), p["out"]), h)
    h = bias_norm(p["out_norm"], h.astype(jnp.float32))
    return h, new_tail


def _streaming_attention(p, x_cache, x, pos_emb_block, heads, cfg):
    """Causal rectangular attention weights.

    x_cache: [B, L, D] left context; x: [B, C, D] current chunk.
    pos_emb_block: [L+C, pos_dim] for offsets t-s spanning [0 .. L+C-1]
    (queries are the LAST C positions of the concat sequence).
    Returns [B, H, C, L+C].
    """
    dt = jnp.dtype(cfg.compute_dtype)
    qd, pd = cfg.query_head_dim, cfg.pos_head_dim
    full = jnp.concatenate([x_cache, x], axis=1)
    b, s_len, d = full.shape
    c = x.shape[1]
    proj = linear(jax.tree.map(lambda a: a.astype(dt), p["attn_in_proj"]),
                  full.astype(dt))
    q = proj[:, -c:, : heads * qd].reshape(b, c, heads, qd)
    k = proj[..., heads * qd: 2 * heads * qd].reshape(b, s_len, heads, qd)
    pq = proj[:, -c:, 2 * heads * qd:].reshape(b, c, heads, pd)

    scores = jnp.einsum("bthd,bshd->bhts", q, k)
    # relative offsets: query global pos t0 = s_len - c + t; offset = t0 - s
    # in [t0-(s_len-1) .. t0] — causal, no future keys exist.
    pos_lin = (pos_emb_block.astype(dt)
               @ p["attn_pos_proj"]["weight"].astype(dt))
    pos_lin = pos_lin.reshape(-1, heads, pd)  # [L+C, H, pd]; row = offset
    pos_full = jnp.einsum("bthd,ohd->bhto", pq, pos_lin)  # [B,H,C,L+C]
    # gather offset o = (s_len - c + t) - s for key s
    t_idx = np.arange(c)[:, None]
    s_idx = np.arange(s_len)[None, :]
    off = (s_len - c + t_idx) - s_idx  # [C, S], may be negative for future
    off_c = jnp.asarray(np.clip(off, 0, s_len - 1), jnp.int32)
    pos_scores = jnp.take_along_axis(
        pos_full, off_c[None, None, :, :], axis=-1)
    scores = (scores + pos_scores).astype(jnp.float32)
    future = jnp.asarray(off < 0)  # mask future keys (within-chunk causality
    # is NOT applied: the offline model is non-causal within its context, and
    # streaming zipformer attends to the whole current chunk)
    del future
    return jax.nn.softmax(scores, axis=-1)


def _causal_conv_module(p, x_with_tail, kernel, dt):
    """Causal ConvolutionModule: input includes (kernel-1) cached frames on
    the left; output has the tail trimmed."""
    proj = linear(jax.tree.map(lambda a: a.astype(dt), p["in_proj"]),
                  x_with_tail.astype(dt))
    v, g = jnp.split(proj, 2, axis=-1)
    h = v * jax.nn.sigmoid(g)
    w = p["dw_weight"].astype(dt)[:, None, :]
    h = jax.lax.conv_general_dilated(
        h, w, (1,), [(0, 0)],  # valid: tail provides the left context
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=h.shape[-1])
    h = swoosh_r(h + p["dw_bias"].astype(dt))
    return linear(jax.tree.map(lambda a: a.astype(dt), p["out_proj"]),
                  h).astype(jnp.float32)


def _streaming_layer(p, state, x, pos_emb_block, heads, kernel, cfg):
    """One layer step. x: [B, C, D]. Returns (y [B, C, D], new_state)."""

    dt = jnp.dtype(cfg.compute_dtype)
    vd = cfg.value_head_dim
    b, c, d = x.shape
    t_cache = state["key_cache"].shape[1]
    x_orig = x

    def roll(cache, cur):
        return jnp.concatenate([cache, cur], axis=1)[:, -t_cache:]

    attn_w = _streaming_attention(p, state["key_cache"], x, pos_emb_block,
                                  heads, cfg)

    def attend(pp, attn, value_src):
        v = linear(jax.tree.map(lambda a: a.astype(dt), pp["in_proj"]),
                   value_src.astype(dt))
        v = v.reshape(b, -1, heads, vd)
        out = jnp.einsum("bhts,bshd->bthd", attn.astype(dt), v)
        return linear(jax.tree.map(lambda a: a.astype(dt), pp["out_proj"]),
                      out.reshape(b, c, heads * vd)).astype(jnp.float32)

    x = x + _feed_forward(p["ff1"], x, dt)
    na_src = jnp.concatenate([state["na_cache"], x], axis=1)
    na_cache_new = roll(state["na_cache"], x)
    proj_na = linear(jax.tree.map(lambda a: a.astype(dt),
                                  p["nonlin_attn"]["in_proj"]),
                     na_src.astype(dt))
    s_g, v_na, y_g = jnp.split(proj_na, 3, axis=-1)
    v_na = jnp.tanh(s_g) * v_na
    na = jnp.einsum("bts,bsd->btd", attn_w[:, 0].astype(dt), v_na)
    na = na * y_g[:, -c:]
    x = x + linear(jax.tree.map(lambda a: a.astype(dt),
                                p["nonlin_attn"]["out_proj"]),
                   na).astype(jnp.float32)
    v1_src = jnp.concatenate([state["v1_cache"], x], axis=1)
    v1_cache_new = roll(state["v1_cache"], x)
    x = x + attend(p["self_attn1"], attn_w, v1_src)
    conv1_in = jnp.concatenate([state["conv1_tail"], x], axis=1)
    x = x + _causal_conv_module(p["conv1"], conv1_in, kernel, dt)
    x = x + _feed_forward(p["ff2"], x, dt)
    x = _bypass(p["bypass_mid_scale"], x_orig, x)
    v2_src = jnp.concatenate([state["v2_cache"], x], axis=1)
    v2_cache_new = roll(state["v2_cache"], x)
    x = x + attend(p["self_attn2"], attn_w, v2_src)
    conv2_in = jnp.concatenate([state["conv2_tail"], x], axis=1)
    x = x + _causal_conv_module(p["conv2"], conv2_in, kernel, dt)
    x = x + _feed_forward(p["ff3"], x, dt)
    x = bias_norm(p["norm"], x)
    x = _bypass(p["bypass_scale"], x_orig, x)

    new_state = {
        "key_cache": roll(state["key_cache"], x_orig),
        "na_cache": na_cache_new,
        "v1_cache": v1_cache_new,
        "v2_cache": v2_cache_new,
        "conv1_tail": conv1_in[:, -(kernel - 1):],
        "conv2_tail": conv2_in[:, -(kernel - 1):],
    }
    return x, new_state


def streaming_step(params, state, fbank_chunk,
                   cfg: ZipformerConfig, scfg: StreamingConfig):
    """Process one chunk.

    Args:
        fbank_chunk: [B, 2*chunk_frames, 80] new fbank frames (100 Hz);
            with the cached lookback this yields chunk_frames embed frames.
    Returns (enc_out [B, chunk_frames//2, output_dim], new_state).
    """
    with jax.default_matmul_precision(cfg.matmul_precision):
        return _streaming_step_body(params, state, fbank_chunk, cfg, scfg)


def _streaming_step_body(params, state, fbank_chunk, cfg, scfg):
    b = fbank_chunk.shape[0]
    new_state = {"stacks": []}

    with_tail = jnp.concatenate([state["fbank_tail"], fbank_chunk], axis=1)
    new_state["fbank_tail"] = with_tail[:, -scfg.fbank_lookback:]
    h, new_state["convnext_tail"] = _streaming_embed(
        params["encoder_embed"], with_tail, state["convnext_tail"], cfg)
    h = h[:, -scfg.chunk_frames:]

    outputs = []
    for i, stack in enumerate(params["stacks"]):
        ds = cfg.downsampling_factor[i]
        d = cfg.encoder_dim[i]
        heads = cfg.num_heads[i]
        kernel = cfg.cnn_module_kernel[i]
        h = _convert_channels(h, d)
        h_orig = h
        hs = simple_downsample(stack["downsample"], h, ds)
        c = hs.shape[1]
        t_cache = max(scfg.left_frames // ds, 1)
        # compact_rel_pos_emb spans offsets [-(S-1)..S-1]; keep [0..S-1]
        pos_block = jnp.asarray(
            compact_rel_pos_emb(t_cache + c, cfg.pos_dim))[t_cache + c - 1:]
        layer_states = []
        for j, layer in enumerate(stack["layers"]):
            hs, ls = _streaming_layer(layer, state["stacks"][i][j], hs,
                                      pos_block, heads, kernel, cfg)
            layer_states.append(ls)
        new_state["stacks"].append(layer_states)
        hs = simple_upsample(hs, ds)[:, : h.shape[1]]
        h = _bypass(stack["out_bypass_scale"], h_orig, hs) if ds != 1 else hs
        outputs.append(h)

    # full-dim output (same piece-concat rule as the offline encoder)
    out_dim = cfg.output_dim
    pieces = [outputs[-1]]
    cur = cfg.encoder_dim[-1]
    for i in range(len(outputs) - 2, -1, -1):
        di = cfg.encoder_dim[i]
        if di > cur:
            pieces.append(outputs[i][..., cur:di])
            cur = di
    full = jnp.concatenate(pieces, axis=-1)
    if full.shape[-1] < out_dim:
        full = jnp.pad(full, ((0, 0), (0, 0), (0, out_dim - full.shape[-1])))
    out = simple_downsample(params["downsample_output"], full, 2)
    return out, new_state

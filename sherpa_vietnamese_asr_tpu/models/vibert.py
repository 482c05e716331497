# ViBERT-capu Seq2Labels model (GECToR-style punctuation+case restorer) in
# functional JAX.
#
# TPU-native replacement for the reference's vibert-capu ONNX session
# (reference core/gec_model.py:133-199): a 12-layer BERT encoder over
# subword ids, a gather at per-word first-subtoken offsets, and two linear
# heads — `logits_labels` over the 15-label edit vocabulary and
# `logits_d_tags` over detect tags. The ONNX graph's inputs
# (input_ids/attention_mask/token_type_ids/input_offsets) and outputs map
# 1:1 onto vibert_forward.
#
# Batched over (chunks x tokens); runs as one jitted program per GEC
# iteration instead of the reference's mini-batch-32 ORT loop
# (gec_model.py:374-399).

from __future__ import annotations

import dataclasses
import math

import functools

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViBertConfig:
    vocab_size: int = 62000
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    type_vocab: int = 2
    n_labels: int = 15
    n_d_tags: int = 4
    layer_norm_eps: float = 1e-12
    compute_dtype: str = "float32"


TINY_VIBERT = ViBertConfig(vocab_size=200, hidden=32, layers=2, heads=2,
                           intermediate=64, max_position=128, n_labels=15,
                           n_d_tags=4)


def _lin(rng, d_in, d_out):
    k, _ = jax.random.split(rng)
    return {"weight": jax.random.normal(k, (d_in, d_out), jnp.float32)
            * (1.0 / math.sqrt(d_in)),
            "bias": jnp.zeros((d_out,), jnp.float32)}


def _ln(d):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("cfg",))
def init_vibert_params(rng, cfg: ViBertConfig):
    keys = jax.random.split(rng, cfg.layers + 8)
    h = cfg.hidden
    params = {
        "word_emb": jax.random.normal(keys[0], (cfg.vocab_size, h)) * 0.02,
        "pos_emb": jax.random.normal(keys[1], (cfg.max_position, h)) * 0.02,
        "type_emb": jax.random.normal(keys[2], (cfg.type_vocab, h)) * 0.02,
        "emb_ln": _ln(h),
        "layers": [],
        "labels_head": _lin(keys[3], h, cfg.n_labels),
        "d_tags_head": _lin(keys[4], h, cfg.n_d_tags),
    }
    for i in range(cfg.layers):
        k = jax.random.split(keys[i + 5], 8)
        params["layers"].append({
            "q": _lin(k[0], h, h), "k": _lin(k[1], h, h), "v": _lin(k[2], h, h),
            "attn_out": _lin(k[3], h, h), "attn_ln": _ln(h),
            "ffn_in": _lin(k[4], h, cfg.intermediate),
            "ffn_out": _lin(k[5], cfg.intermediate, h),
            "ffn_ln": _ln(h),
        })
    return params


def _layer_norm(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _linear(p, x, dt):
    if "weight_q" in p:
        # int8 weight-only tier: q values (|q| <= 127) are exact in bf16,
        # and the per-output-channel scale commutes out of the contraction,
        # so (x @ q) * s == x @ (q * s) with one cast fused by XLA.
        y = x.astype(dt) @ p["weight_q"].astype(dt)
        return y * p["weight_scale"].astype(dt) + p["bias"].astype(dt)
    return x.astype(dt) @ p["weight"].astype(dt) + p["bias"].astype(dt)


def quantize_vibert_int8(params):
    """Per-output-channel symmetric int8 weight-only quantization of every
    linear layer (embeddings, layer norms and biases stay f32) — the TPU
    answer to the reference's vibert-capu.int8.onnx tier
    (reference core/gec_model.py:125-145 picks int8 under prefer_int8):
    4x smaller linear weights in HBM, matmuls run bf16 on the MXU after an
    XLA-fused int8->bf16 dequant. Returns a new pytree usable everywhere a
    ViBERT params tree is (GecBert, vibert_forward)."""
    import numpy as np

    def qlin(p):
        w = np.asarray(p["weight"], np.float32)
        s = np.maximum(np.abs(w).max(axis=0), 1e-8) / 127.0
        q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        return {"weight_q": jnp.asarray(q),
                "weight_scale": jnp.asarray(s.astype(np.float32)),
                "bias": p["bias"]}

    out = dict(params)
    out["labels_head"] = qlin(params["labels_head"])
    out["d_tags_head"] = qlin(params["d_tags_head"])
    out["layers"] = [
        {**lp, **{k: qlin(lp[k]) for k in
                  ("q", "k", "v", "attn_out", "ffn_in", "ffn_out")}}
        for lp in params["layers"]
    ]
    return out


def bert_encoder(params, input_ids, attention_mask, token_type_ids,
                 cfg: ViBertConfig):
    """[B, T] ids -> [B, T, H] hidden states (post-LN BERT)."""
    dt = jnp.dtype(cfg.compute_dtype)
    b, t = input_ids.shape
    x = (params["word_emb"][input_ids]
         + params["pos_emb"][None, :t, :]
         + params["type_emb"][token_type_ids])
    x = _layer_norm(params["emb_ln"], x, cfg.layer_norm_eps)
    neg = jnp.where(attention_mask[:, None, None, :] == 0, -1e9, 0.0)
    hd = cfg.hidden // cfg.heads
    for lp in params["layers"]:
        q = _linear(lp["q"], x, dt).reshape(b, t, cfg.heads, hd)
        k = _linear(lp["k"], x, dt).reshape(b, t, cfg.heads, hd)
        v = _linear(lp["v"], x, dt).reshape(b, t, cfg.heads, hd)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(hd)
        attn = jax.nn.softmax(scores.astype(jnp.float32) + neg, axis=-1)
        ctx = jnp.einsum("bhts,bshd->bthd", attn.astype(dt), v)
        ctx = ctx.reshape(b, t, cfg.hidden)
        x = _layer_norm(lp["attn_ln"],
                        x + _linear(lp["attn_out"], ctx, dt).astype(jnp.float32),
                        cfg.layer_norm_eps)
        f = jax.nn.gelu(_linear(lp["ffn_in"], x, dt), approximate=False)
        x = _layer_norm(lp["ffn_ln"],
                        x + _linear(lp["ffn_out"], f, dt).astype(jnp.float32),
                        cfg.layer_norm_eps)
    return x


def vibert_forward(params, input_ids, attention_mask, token_type_ids,
                   input_offsets, cfg: ViBertConfig):
    """Full Seq2Labels forward.

    input_offsets: [B, W] first-subtoken index of each word (0-padded).
    Returns (logits_labels [B, W, n_labels], logits_d_tags [B, W, n_d_tags]).
    """
    hidden = bert_encoder(params, input_ids, attention_mask, token_type_ids,
                          cfg)
    gathered = jnp.take_along_axis(
        hidden, input_offsets[:, :, None].astype(jnp.int32), axis=1)
    dt = jnp.dtype(cfg.compute_dtype)
    logits = _linear(params["labels_head"], gathered, dt).astype(jnp.float32)
    d_tags = _linear(params["d_tags_head"], gathered, dt).astype(jnp.float32)
    return logits, d_tags

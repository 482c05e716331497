# RNN-T stateless decoder (predictor) and joiner in functional JAX.
#
# Replaces the reference's decoder-*.onnx / joiner-*.onnx ORT sessions
# (reference core/asr_engine.py:1073-1095): the decoder embeds a 2-token
# context and applies a grouped depthwise-ish Conv1d + ReLU (icefall
# "stateless" decoder); the joiner projects encoder and decoder outputs to a
# shared joiner space and emits vocab logits through tanh.
#
# Both are tiny; on TPU they run batched over [num_chunks * beam] lanes inside
# the beam-search lax.scan (ops/beam_search.py), so there is no need for the
# reference's decoder-output LRU cache (asr_engine.py:1073-1088) — recompute is
# one small fused matmul.

from __future__ import annotations

import dataclasses
import math

import functools

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RnntConfig:
    vocab_size: int = 2000
    context_size: int = 2
    decoder_dim: int = 512
    joiner_dim: int = 512
    encoder_out_dim: int = 256  # = ZipformerConfig.output_dim
    blank_id: int = 0
    unk_id: int = 2


@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("cfg",))
def init_decoder_params(rng, cfg: RnntConfig):
    k1, k2 = jax.random.split(rng)
    d = cfg.decoder_dim
    groups = d // 4
    # Grouped Conv1d(decoder_dim, decoder_dim, kernel=context_size, groups=d//4)
    # weight layout: [out_ch, in_ch_per_group, K]
    return {
        "embedding": jax.random.normal(k1, (cfg.vocab_size, d), jnp.float32)
        * (1.0 / math.sqrt(d)),
        "conv_weight": jax.random.normal(
            k2, (d, d // groups, cfg.context_size), jnp.float32)
        * (1.0 / math.sqrt(d // groups * cfg.context_size)),
    }


@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("cfg",))
def init_joiner_params(rng, cfg: RnntConfig):
    k1, k2, k3 = jax.random.split(rng, 3)

    def lin(k, d_in, d_out):
        return {
            "weight": jax.random.normal(k, (d_in, d_out), jnp.float32)
            * (1.0 / math.sqrt(d_in)),
            "bias": jnp.zeros((d_out,), jnp.float32),
        }

    return {
        "encoder_proj": lin(k1, cfg.encoder_out_dim, cfg.joiner_dim),
        "decoder_proj": lin(k2, cfg.decoder_dim, cfg.joiner_dim),
        "output": lin(k3, cfg.joiner_dim, cfg.vocab_size),
    }


def decoder_forward(params, y, cfg: RnntConfig):
    """Stateless decoder. y: [..., context_size] int32 token ids (>= 0).

    Returns [..., decoder_dim] float32.
    """
    emb = params["embedding"][y]  # [..., K, D]
    d = cfg.decoder_dim
    k = cfg.context_size
    w = params["conv_weight"]  # [D_out, D_in/G, K]
    groups = d // w.shape[1]
    in_per_g = w.shape[1]
    # Grouped "conv" over exactly K context positions == grouped matmul.
    lead = emb.shape[:-2]
    emb_g = emb.reshape(*lead, k, groups, in_per_g)
    w_g = w.reshape(groups, d // groups, in_per_g, k)
    out = jnp.einsum("...kgi,goik->...go", emb_g, w_g)
    out = out.reshape(*lead, d)
    return jax.nn.relu(out)


def joiner_forward(params, encoder_out, decoder_out):
    """Joiner logits. encoder_out [..., E], decoder_out [..., D] -> [..., V]."""
    e = encoder_out @ params["encoder_proj"]["weight"] + params["encoder_proj"]["bias"]
    d = decoder_out @ params["decoder_proj"]["weight"] + params["decoder_proj"]["bias"]
    h = jnp.tanh(e + d)
    return h @ params["output"]["weight"] + params["output"]["bias"]

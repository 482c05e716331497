# Masked statistics pooling — batched on device.
#
# Replicates pyannote StatsPool._pool() weighted mean/std exactly as the
# reference computes it per (chunk, speaker) in Python
# (reference core/speaker_diarization_pure_ort.py:750-767, 856-872), but as
# one batched XLA program over all chunks and speaker slots at once.

from __future__ import annotations

import jax.numpy as jnp


def masked_stats_pool(frame_feat, weights, eps=1e-8):
    """Weighted statistics pooling.

    Args:
        frame_feat: [B, D, T] frame features.
        weights: [B, S, T] per-speaker frame weights (binary or soft).

    Returns:
        [B, S, 2D] concat(weighted mean, weighted std) per (chunk, speaker).
    """
    v1 = jnp.sum(weights, axis=-1) + eps                       # [B, S]
    mean = jnp.einsum("bdt,bst->bsd", frame_feat, weights) / v1[:, :, None]
    dx = frame_feat[:, None, :, :] - mean[:, :, :, None]       # [B, S, D, T]
    v2 = jnp.sum(weights * weights, axis=-1)                   # [B, S]
    var = jnp.einsum("bsdt,bst->bsd", dx * dx, weights) / (
        v1 - v2 / v1 + eps)[:, :, None]
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    return jnp.concatenate([mean, std], axis=-1)

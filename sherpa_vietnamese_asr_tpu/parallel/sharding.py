# Multi-chip execution: data-parallel chunk decoding over a device mesh.
#
# The reference has no distributed compute — its only parallelism is a
# 2-thread CPU worker pool over chunks (reference core/asr_engine.py:
# 2250-2415) and ORT intra-op threads. The TPU-native scaling design
# (SURVEY.md section 2.5) replaces that with SPMD data parallelism: the
# padded chunk batch is sharded over the mesh's "data" axis and every chip
# runs the identical fbank -> Zipformer -> beam-search program on its shard,
# with results gathered over ICI. Model parameters (30-68 M) are replicated —
# no TP/PP is warranted at these sizes; scaling is across chunks/files.
#
# Long-audio sequence parallelism falls out of the same design: hours-long
# audio becomes hundreds of 30 s chunks, which IS the sharded batch axis.

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def default_mesh() -> Mesh | None:
    """Mesh over all devices on multi-device accelerator backends, else None.

    Single-chip (and CPU test) runs stay mesh-free; stages auto-shard their
    batches when real multi-chip hardware is present — the TPU
    generalization of the reference's fixed 2-worker chunk pool
    (reference core/asr_engine.py:2250-2415)."""
    if jax.default_backend() not in ("cpu",) and len(jax.devices()) > 1:
        return make_mesh()
    return None


def replicate(tree, mesh: Mesh):
    """Replicate a parameter pytree across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(arr, mesh: Mesh):
    """Pad the leading axis up to a mesh multiple and shard it over "data".

    Returns (device_array, original_n): callers slice outputs back to n.
    Zero rows are decoded/scored like any other row and discarded — strictly
    cheaper than a host-side remainder loop and keeps ONE compiled shape.
    """
    arr = np.asarray(arr)
    n = arr.shape[0]
    size = mesh.devices.size
    m = -(-n // size) * size
    if m != n:
        arr = np.concatenate(
            [arr, np.zeros((m - n,) + arr.shape[1:], arr.dtype)], axis=0)
    spec = P("data", *([None] * (arr.ndim - 1)))
    return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec)), n


def shard_model(model, mesh: Mesh):
    """Replicate model parameter pytrees across the mesh."""
    rep = NamedSharding(mesh, P())

    def put(tree):
        return jax.device_put(tree, rep)

    import dataclasses
    return dataclasses.replace(
        model,
        enc_params=put(model.enc_params),
        dec_params=put(model.dec_params),
        joi_params=put(model.joi_params),
        hotword_tables=(put(model.hotword_tables)
                        if model.hotword_tables is not None else None),
    )


def decode_batch_sharded(model, audio, lens, mesh: Mesh,
                         use_pallas_fbank: bool = False,
                         use_pallas_beam: bool = False,
                         pallas_interpret: bool = False):
    """Decode a [B, L] chunk batch data-parallel over the mesh.

    B must be a multiple of the mesh size. Inputs are sharded over the batch
    axis; XLA partitions the whole fbank/encoder/beam-search program and
    inserts ICI collectives only for the (replicated-param) broadcast. With
    use_pallas_beam the beam megakernel runs per-shard under shard_map
    (pallas_interpret=True exercises it on CPU meshes).
    Returns (BeamResult, enc_lens) with batch-sharded outputs.
    """
    from sherpa_vietnamese_asr_tpu.pipeline.decoder import decode_batch_jit

    data = NamedSharding(mesh, P("data"))
    data2 = NamedSharding(mesh, P("data", None))
    audio = jax.device_put(jnp.asarray(audio), data2)
    lens = jax.device_put(jnp.asarray(lens), data)
    model = shard_model(model, mesh)
    return decode_batch_jit(
        audio, lens, model.enc_params, model.dec_params, model.joi_params,
        model.zip_cfg, model.rnnt_cfg, model.beam_size,
        hw_tables=model.hotword_tables,
        with_hotwords=model.hotword_tables is not None,
        use_pallas_fbank=use_pallas_fbank,
        use_pallas_beam=use_pallas_beam, mesh=mesh if use_pallas_beam else None,
        pallas_interpret=pallas_interpret)


def vad_probs_sharded(params, audio_windows, mesh: Mesh):
    """Data-parallel VAD front-end: conv features for all windows sharded over
    the mesh; the sequential LSTM runs afterwards on the gathered features
    (it is tiny). audio_windows: [N, 576] with N a multiple of mesh size."""
    from sherpa_vietnamese_asr_tpu.models.silero_vad import (
        lstm_scan, window_features,
    )

    data = NamedSharding(mesh, P("data", None))
    wins = jax.device_put(jnp.asarray(audio_windows), data)
    rep = jax.device_put(params, NamedSharding(mesh, P()))
    feats = jax.jit(window_features)(rep, wins)
    probs, _ = jax.jit(lstm_scan)(rep, feats)
    return probs

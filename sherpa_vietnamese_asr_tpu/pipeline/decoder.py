# Batched chunk decoder: fixed-shape jitted program fbank -> Zipformer ->
# beam search for a whole batch of ~30 s chunks at once.
#
# This replaces the reference's per-chunk sequential decode through ORT with a
# 2-thread worker pool (reference core/asr_engine.py:2250-2415, measured
# 1.68x on 6C/12T CPU): on TPU every chunk in the batch runs the encoder and
# the beam-search scan concurrently on the MXU — parallelism scales with the
# batch instead of host threads. Chunks are zero-padded to one static length
# (33 s = 30 s + 3 s overlap) so the program compiles once; fbank tail frames
# are made bit-equal to exact-length runs by reflect-filling each chunk's tail
# (Kaldi snip_edges=False reflection) before padding.

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sherpa_vietnamese_asr_tpu.models.registry import AsrModel
from sherpa_vietnamese_asr_tpu.models.zipformer import zipformer_encoder
from sherpa_vietnamese_asr_tpu.ops import fbank as fbank_ops
from sherpa_vietnamese_asr_tpu.ops.beam_search import beam_search_batch
from sherpa_vietnamese_asr_tpu.pipeline.words import beam_result_to_words
from sherpa_vietnamese_asr_tpu.utils.fbank_ref import ASR_FBANK

SAMPLE_RATE = 16000
CHUNK_PAD_SEC = 33.0  # 30 s chunk + 3 s overlap
REFLECT_FILL = 400    # samples of tail reflection for fbank bit-parity


@functools.partial(jax.jit, static_argnames=("use_pallas_fbank", "quantized"))
def fbank_batch_jit(audio, use_pallas_fbank=False, quantized=False):
    """[B, L] -> [B, F, 80] ASR fbank (shared by ROVER's two decodes).

    quantized=True: audio arrives int16 (half the bytes over the ~20 MB/s
    host->device link) and is dequantized in-graph.
    """
    if quantized:
        audio = audio.astype(jnp.float32) / jnp.float32(32768.0)
    return fbank_ops.compute_fbank(audio, ASR_FBANK,
                                   use_pallas=use_pallas_fbank)


@functools.partial(
    jax.jit,
    static_argnames=("zip_cfg", "rnnt_cfg", "beam_size", "with_hotwords",
                     "use_pallas_beam", "mesh", "pallas_interpret"),
)
def decode_feats_jit(feats, n_frames, enc_params, dec_params, joi_params,
                     zip_cfg, rnnt_cfg, beam_size, hw_tables=None,
                     with_hotwords=False, use_pallas_beam=False,
                     mesh=None, pallas_interpret=False):
    """[B, F, 80] fbank -> (BeamResult, enc_lens).

    With a mesh the whole program is batch-sharded over its "data" axis:
    the encoder partitions automatically from the input shardings and the
    Pallas beam megakernel runs per-shard under jax.shard_map (each device
    executes the kernel on its local chunk sub-batch — round 4; before,
    any mesh silently forfeited the kernel for the slower XLA scan).
    """
    enc_out, enc_lens = zipformer_encoder(enc_params, feats, n_frames, zip_cfg)
    n_shards = 1 if mesh is None else mesh.devices.size
    # VMEM ceiling: the kernel raises its scoped-VMEM limit past the 16 MB
    # XLA default (round 4, beam_search_pallas compiler_params) — v5e has
    # 128 MB physical VMEM — so the round-3 batch-48 ceiling is gone
    # (b=64/T=824 = 20.1 MB compiles and runs). Gate on the kernel's own
    # footprint estimate against a 64 MB budget, leaving half the chip's
    # VMEM for the surrounding program's buffers.
    # Under a mesh the kernel sees the per-device LOCAL batch, so the gate
    # scales with the mesh: 8 devices decode 8x48 chunks per dispatch.
    # Hotword automatons ride the kernel too (round 3): their transposed
    # [V, 2*S_pad] limb tables are VMEM-resident, measured to fit up to
    # S=500 states at batch 32.
    from sherpa_vietnamese_asr_tpu.ops.beam_search_pallas import (
        beam_kernel_vmem_bytes,
    )
    local_b = enc_out.shape[0] // n_shards
    s_states = (hw_tables.next_state.shape[0]
                if with_hotwords and hw_tables is not None else 0)
    fits_vmem = beam_kernel_vmem_bytes(
        max(local_b, 1), beam_size, enc_out.shape[1], rnnt_cfg.vocab_size,
        rnnt_cfg.decoder_dim, enc_out.shape[2],
        s_pad=max(128, -(-s_states // 128) * 128) if s_states else 0,
        with_hw=s_states > 0) <= 64 * 1024 * 1024
    hw_fits = (not with_hotwords) or (
        hw_tables is not None and hw_tables.next_state.shape[0] <= 500)
    if use_pallas_beam and beam_size >= 4 and fits_vmem and hw_fits \
            and enc_out.shape[0] % n_shards == 0:
        # Single-megakernel scan: ~1.5x the XLA path on hardware and
        # token-faithful to the exact f32 algorithm (ops/beam_search_pallas).
        from sherpa_vietnamese_asr_tpu.ops.beam_search_pallas import (
            beam_search_batch_pallas,
        )
        # Precision TIER consistency (PERFORMANCE.md "Precision
        # tiers"): the joiner dots ride the same class as the encoder.
        # bf16 serving -> native bf16 dots; fp32 "high" -> the kernel's
        # 3-pass hi/lo split (the same bf16_3x algorithm XLA's "high"
        # lowers to); fp32 "highest" -> exact 6-pass. Measured on v5e,
        # cross-platform (TPU vs CPU) token flips on RANDOM weights are
        # ~1-2.5% in EVERY tier incl. highest/XLA-only (near-tied beam
        # decisions; trained weights separate decisively), so tiers
        # trade speed against emulation passes, not against a
        # bit-identity contract no platform pair can honor.
        fast = (zip_cfg.compute_dtype == "bfloat16"
                or zip_cfg.matmul_precision == "high")
        hw = hw_tables if with_hotwords else None

        def beam_fn(eo, el, dp, jp, hwt):
            return beam_search_batch_pallas(
                eo, el, dp, jp, rnnt_cfg, beam_size=beam_size,
                hw_tables=hwt, with_hotwords=with_hotwords,
                fast_dots=fast, interpret=pallas_interpret)

        if mesh is None:
            result = beam_fn(enc_out, enc_lens, dec_params, joi_params, hw)
        else:
            # Per-shard kernel launch: batch sharded over "data", params
            # (and hotword tables) replicated. No collectives — chunks are
            # independent; results stay batch-sharded for the host gather.
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            result = shard_map(
                beam_fn, mesh=mesh,
                in_specs=(P("data"), P("data"), P(), P(), P()),
                out_specs=P("data"),
                # No collectives inside (chunks are independent), so skip
                # the varying-mesh-axes check: pallas_call out_shapes carry
                # no vma annotation and would fail it spuriously.
                check_vma=False,
            )(enc_out, enc_lens, dec_params, joi_params, hw)
    else:
        # Same tier for the XLA scan's dots as the encoder/kernel use, so
        # the kernel<->scan fallback (VMEM gate above) stays in-class.
        # (Precision config only applies to f32 operands; bf16 serving is
        # single-pass regardless, so skip the context there.)
        prec = (zip_cfg.matmul_precision
                if zip_cfg.compute_dtype == "float32" else "default")
        with jax.default_matmul_precision(prec):
            result = beam_search_batch(enc_out, enc_lens, dec_params,
                                       joi_params, rnnt_cfg,
                                       beam_size=beam_size,
                                       hw_tables=hw_tables,
                                       with_hotwords=with_hotwords)
    return result, enc_lens


@functools.partial(
    jax.jit,
    static_argnames=("zip_cfg", "rnnt_cfg", "beam_size", "with_hotwords",
                     "use_pallas_fbank", "use_pallas_beam", "mesh",
                     "pallas_interpret"),
)
def decode_batch_jit(audio, audio_lens, enc_params, dec_params, joi_params,
                     zip_cfg, rnnt_cfg, beam_size, hw_tables=None,
                     with_hotwords=False, use_pallas_fbank=False,
                     use_pallas_beam=False, mesh=None, pallas_interpret=False):
    """[B, L] padded audio -> (BeamResult, enc_lens). One compiled program."""
    feats = fbank_ops.compute_fbank(audio, ASR_FBANK,
                                    use_pallas=use_pallas_fbank)
    n_frames = (audio_lens + 80) // 160  # snip_edges=False frame count
    return decode_feats_jit(feats, n_frames, enc_params, dec_params,
                            joi_params, zip_cfg, rnnt_cfg, beam_size,
                            hw_tables=hw_tables, with_hotwords=with_hotwords,
                            use_pallas_beam=use_pallas_beam, mesh=mesh,
                            pallas_interpret=pallas_interpret)


class BatchedChunkDecoder:
    """Decode chunk plans over concat audio in fixed-size device batches.

    With model_b set (ROVER mode, reference asr_engine.py:2416-2452) the
    fbank batch is computed once and both models decode it.
    """

    def __init__(self, model: AsrModel, max_batch: int = 8,
                 chunk_pad_sec: float = CHUNK_PAD_SEC,
                 use_pallas_fbank: bool | None = None,
                 model_b: AsrModel | None = None,
                 chunk_transform=None,
                 transfer_dtype: str | None = None,
                 mesh=None,
                 use_pallas_beam: bool | str | None = None):
        self.model = model
        self.model_b = model_b
        # Multi-chip SPMD: shard the chunk batch over the mesh's "data"
        # axis (parallel/sharding.py). Auto-enabled on multi-device TPU
        # backends; pass mesh explicitly elsewhere (tests use the 8-device
        # CPU mesh). max_batch must be a multiple of the mesh size.
        if mesh is None:
            from sherpa_vietnamese_asr_tpu.parallel.sharding import (
                default_mesh,
            )
            mesh = default_mesh()
        self.mesh = mesh
        if mesh is not None:
            from sherpa_vietnamese_asr_tpu.parallel.sharding import (
                shard_model,
            )
            # Pad the batch up to a mesh multiple (every launch already
            # pads the last group to max_batch, so this just makes the
            # static batch dim divisible — strictly better than crashing).
            size = mesh.devices.size
            max_batch = -(-max_batch // size) * size
            self.model = model = shard_model(model, mesh)
            if model_b is not None:
                self.model_b = model_b = shard_model(model_b, mesh)
        self.chunk_transform = chunk_transform  # e.g. WPE per chunk
        self.max_batch = max_batch
        self.pad_len = int(chunk_pad_sec * SAMPLE_RATE)
        if use_pallas_fbank is None:
            use_pallas_fbank = jax.default_backend() not in ("cpu",)
        self.use_pallas_fbank = use_pallas_fbank
        # Pallas beam-search megakernel: enabled on TPU backends, with or
        # without a mesh (sharded decode runs the kernel per-shard under
        # shard_map — round 4). Hotword automatons run in-kernel for up to
        # 500 states (decode_feats_jit gates on table size). On CPU the
        # kernel only exists in interpret mode; use_pallas_beam="interpret"
        # forces that path (tests exercise the sharded kernel this way).
        if use_pallas_beam is None:
            use_pallas_beam = jax.default_backend() not in ("cpu",)
        self.pallas_interpret = use_pallas_beam == "interpret"
        self.use_pallas_beam = bool(use_pallas_beam)
        if transfer_dtype is None:
            # float32 by default: int16 halves upload bytes (~0.4 s per
            # 4 min of audio on the ~20 MB/s tunnel) but perturbs log-mel
            # by up to ~0.02 in silence, which can flip near-tied beam
            # decisions — tokens must stay bit-identical to the float
            # path, so int16 here is opt-in.
            transfer_dtype = "float32"
        self.transfer_dtype = transfer_dtype

    def _build_batch(self, concat_audio, spans):
        """spans: [(start, end)] -> (audio [B, pad_len], lens [B])."""
        b = len(spans)
        batch = np.zeros((b, self.pad_len), dtype=np.float32)
        lens = np.zeros((b,), dtype=np.int32)
        for i, (s, e) in enumerate(spans):
            n = min(e - s, self.pad_len)
            chunk = concat_audio[s: s + n]
            if self.chunk_transform is not None:
                chunk = self.chunk_transform(chunk)
            batch[i, :n] = chunk
            lens[i] = n
            # Reflect-fill the tail so snip_edges=False frames near the end
            # match an exact-length fbank (utils/fbank_ref.reflect_index).
            fill = min(REFLECT_FILL, n, self.pad_len - n)
            if fill > 0:
                batch[i, n: n + fill] = batch[i, n - fill: n][::-1]
        return batch, lens

    def _words_from_result(self, result, enc_lens, group, model):
        tokens = np.asarray(result.tokens)
        frames = np.asarray(result.frames)
        tok_logp = np.asarray(result.tok_logp)
        entropy = np.asarray(result.entropy)
        num_tokens = np.asarray(result.num_tokens)
        enc_lens_np = np.asarray(enc_lens)
        out = []
        for i, (s, e) in enumerate(group):
            dur = (e - s) / SAMPLE_RATE
            out.append(beam_result_to_words(
                tokens[i], frames[i], tok_logp[i], entropy[i],
                num_tokens[i], enc_lens_np[i], model.id2token, dur,
                time_offset=s / SAMPLE_RATE))
        return out

    def decode_spans(self, concat_audio, spans, progress_callback=None,
                     phase="Transcription", cancel_check=None):
        """Decode [(start, end)] sample spans.

        Returns per-span word lists (timestamps offset by start/16000).
        In ROVER mode returns (words_a_lists, words_b_lists).
        """
        rover = self.model_b is not None
        out_a, out_b = [], []
        total = len(spans)
        models = [self.model] + ([self.model_b] if rover else [])

        def launch(base):
            group = spans[base: base + self.max_batch]
            # Keep the batch dimension static: pad the last group.
            padded_group = list(group) + [(0, 1)] * (self.max_batch
                                                     - len(group))
            audio, lens = self._build_batch(concat_audio, padded_group)
            quantized = self.transfer_dtype == "int16"
            if quantized:
                audio = np.clip(np.rint(audio * 32768.0), -32768, 32767
                                ).astype(np.int16)
            audio_dev = jnp.asarray(audio)
            n_frames = jnp.asarray((lens + 80) // 160)
            if self.mesh is not None:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P
                audio_dev = jax.device_put(
                    audio_dev, NamedSharding(self.mesh, P("data", None)))
                n_frames = jax.device_put(
                    n_frames, NamedSharding(self.mesh, P("data")))
            # AOT executable cache: warm process starts skip the ~seconds of
            # tracing + lowering these two programs cost (utils/aot_cache.py;
            # sharded runs fall through to plain jit inside call()).
            from sherpa_vietnamese_asr_tpu.utils import aot_cache
            feats = aot_cache.call(
                "fbank_batch", fbank_batch_jit, (audio_dev,),
                static={"use_pallas_fbank": self.use_pallas_fbank,
                        "quantized": quantized})
            launched = []
            for model in models:
                launched.append(aot_cache.call(
                    "decode_feats", decode_feats_jit,
                    (feats, n_frames, model.enc_params, model.dec_params,
                     model.joi_params),
                    kwargs={"hw_tables": model.hotword_tables},
                    static={
                        "zip_cfg": model.zip_cfg,
                        "rnnt_cfg": model.rnnt_cfg,
                        "beam_size": model.beam_size,
                        "with_hotwords": model.hotword_tables is not None,
                        "use_pallas_beam": self.use_pallas_beam,
                        "mesh": self.mesh,
                        "pallas_interpret": self.pallas_interpret,
                    }))
            return group, launched

        def collect(group, launched):
            for (result, enc_lens), model, sink in zip(launched, models,
                                                       (out_a, out_b)):
                sink.extend(self._words_from_result(result, enc_lens, group,
                                                    model))

        # Two-phase pipelined decode: keep up to `depth` batches in flight
        # (JAX async dispatch) so the per-dispatch host<->device round trip
        # (~31 ms on tunneled backends) and the host-side batch build overlap
        # with device compute, instead of serializing per batch.
        depth = 3
        bases = list(range(0, total, self.max_batch))
        inflight = []
        done = 0

        def drain_one():
            nonlocal done
            group, launched = inflight.pop(0)
            collect(group, launched)
            done += len(group)
            if progress_callback:
                progress_callback(
                    f"PHASE:{phase}|Decoding chunks|{done * 100 // total}")

        for base in bases:
            if cancel_check is not None and cancel_check():
                raise RuntimeError("Cancelled by user")
            inflight.append(launch(base))
            if len(inflight) >= depth:
                drain_one()
        while inflight:
            drain_one()
        return (out_a, out_b) if rover else out_a

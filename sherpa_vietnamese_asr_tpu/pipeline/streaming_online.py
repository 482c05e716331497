# Online streaming recognizer: sherpa-onnx OnlineRecognizer-style API with
# built-in endpoint detection (no VAD).
#
# Mirrors the reference's online path (reference streaming_asr_online.py:
# 102-118): feed all audio, decode whenever a chunk is ready, emit partials,
# and end an utterance via the endpoint rules —
#   rule1: >= 3.0 s trailing silence with nothing decoded,
#   rule2: >= 2.0 s trailing silence after something was decoded,
#   rule3: utterance length >= 20 s.
#
# TPU-first design note: the reference uses a cache-carrying streaming
# Zipformer (chunk 64, left 128). Here each decode re-encodes the current
# utterance window (bounded at max_window_sec) through the batched offline
# encoder — on TPU the re-encode of a <=24 s window is a sub-100 ms batched
# program, so recompute replaces cache state while keeping identical
# text-emission behavior. A cache-carrying streaming encoder can replace this
# without changing the API.

from __future__ import annotations

import numpy as np

SAMPLE_RATE = 16000


class OnlineRecognizer:
    """Streaming recognizer with endpoint rules (sherpa-style API).

    Usage:
        rec = OnlineRecognizer(model)
        rec.accept_waveform(chunk)
        while rec.is_ready():
            rec.decode()
        text = rec.get_result()
        if rec.is_endpoint():
            rec.reset()  # -> finalizes the utterance
    """

    def __init__(self, model, chunk_sec=0.64, max_window_sec=24.0,
                 rule1_min_trailing_silence=3.0,
                 rule2_min_trailing_silence=2.0,
                 rule3_min_utterance_length=20.0,
                 decode_throttle_sec=0.32):
        from sherpa_vietnamese_asr_tpu.pipeline.decoder import (
            BatchedChunkDecoder,
        )

        self.model = model
        self.chunk_samples = int(chunk_sec * SAMPLE_RATE)
        self.max_window = int(max_window_sec * SAMPLE_RATE)
        self.rule1 = rule1_min_trailing_silence
        self.rule2 = rule2_min_trailing_silence
        self.rule3 = rule3_min_utterance_length
        self.throttle = int(decode_throttle_sec * SAMPLE_RATE)
        self._decoder = BatchedChunkDecoder(model, max_batch=1,
                                            chunk_pad_sec=max_window_sec)
        self.reset(full=True)

    def reset(self, full=False):
        """End the current utterance (keep the global sample clock)."""
        self.buffer = np.array([], dtype=np.float32)
        self._pending = 0
        self._last_words = []
        self._last_text = ""
        if full:
            self.total_samples = 0
        self.utterance_start = self.total_samples if not full else 0

    # -- sherpa-style API --------------------------------------------------
    def accept_waveform(self, audio):
        audio = np.asarray(audio, np.float32)
        self.buffer = np.concatenate([self.buffer, audio])
        if len(self.buffer) > self.max_window:
            dropped = len(self.buffer) - self.max_window
            self.buffer = self.buffer[-self.max_window:]
            self.utterance_start += dropped
        self.total_samples += len(audio)
        self._pending += len(audio)

    def is_ready(self):
        return self._pending >= max(self.chunk_samples, self.throttle) \
            and len(self.buffer) >= self.chunk_samples

    def decode(self):
        """Re-decode the current utterance window; updates the result."""
        self._pending = 0
        if len(self.buffer) < 400:
            return
        words = self._decoder.decode_spans(self.buffer,
                                           [(0, len(self.buffer))])[0]
        self._last_words = words
        self._last_text = " ".join(w["text"] for w in words).strip().lower()

    def get_result(self):
        return self._last_text

    def get_words(self):
        """Word dicts with utterance-relative timestamps."""
        return list(self._last_words)

    def utterance_length_sec(self):
        return len(self.buffer) / SAMPLE_RATE

    def trailing_silence_sec(self):
        """Seconds since the last emitted word's end (buffer-relative)."""
        if not self._last_words:
            return len(self.buffer) / SAMPLE_RATE
        last_end = self._last_words[-1].get("end", 0.0)
        return max(0.0, len(self.buffer) / SAMPLE_RATE - last_end)

    def is_endpoint(self):
        trailing = self.trailing_silence_sec()
        if not self._last_text and trailing >= self.rule1:
            return True
        if self._last_text and trailing >= self.rule2:
            return True
        if self.utterance_length_sec() >= self.rule3:
            return True
        return False


def _make_fused_stream_step(model, scfg):
    """ONE jitted program per streaming step: fbank -> cached encoder chunk
    -> greedy decode, with encoder state and decoder context as
    device-resident carries.

    The previous 3-program pipeline (fbank jit, encoder jit, decoder jit with
    host materialization between) paid this backend's ~31 ms dispatch round
    trip three times plus transfers — ~166 ms per 0.64 s chunk for a single
    stream. Fused: one dispatch, one small download (tokens/counts).
    """
    import functools

    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.zipformer_streaming import (
        streaming_step,
    )
    from sherpa_vietnamese_asr_tpu.ops import fbank as fbank_ops
    from sherpa_vietnamese_asr_tpu.utils.fbank_ref import ASR_FBANK

    n_f = 2 * scfg.chunk_frames

    def fused(enc_params, dec_params, joi_params, state, ctx, wav, f0s,
              mask):
        feats = fbank_ops.compute_fbank(wav, ASR_FBANK, use_pallas=False)
        idx = f0s[:, None] + jnp.arange(n_f)[None, :]       # [N, n_f]
        chunks = jnp.take_along_axis(feats, idx[:, :, None], axis=1)
        enc_out, new_state = streaming_step(enc_params, state, chunks,
                                            model.zip_cfg, scfg)

        def sel(new, old):
            m = mask.reshape((new.shape[0],) + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)

        new_state = jax.tree.map(sel, new_state, state)
        toks, counts, new_ctx = jax.vmap(
            functools.partial(_greedy_chunk_decode, cfg=model.rnnt_cfg),
            in_axes=(0, 0, None, None))(enc_out, ctx, dec_params,
                                        joi_params)
        new_ctx = jnp.where(mask[:, None], new_ctx, ctx)
        return new_state, new_ctx, toks, counts

    jitted = jax.jit(fused)
    # Route through the AOT executable cache (utils/aot_cache.py): a fresh
    # process skips tracing this step on warm starts. The closed-over
    # configs shape the program, so they ride the cache key.
    from sherpa_vietnamese_asr_tpu.utils import aot_cache
    extra = repr((model.zip_cfg, model.rnnt_cfg, scfg))

    def step(*args):
        return aot_cache.call("stream_step", jitted, args, key_extra=extra)

    return step


class CachedStreamingRecognizer:
    """True cache-carrying streaming recognizer: streaming Zipformer chunks
    (models/zipformer_streaming.py) + greedy RNN-T decoding with carried
    decoder context. One jitted step per 0.64 s chunk; state is an explicit
    pytree. Mirrors the reference's chunk-64 OnlineRecognizer
    (streaming_asr_online.py) without re-encoding.

    The step is PIPELINED one chunk deep: decode() dispatches the current
    chunk asynchronously and returns the PREVIOUS chunk's tokens, so the
    ~31 ms host<->device round trip of this tunneled backend overlaps the
    next chunk's capture instead of serializing with it (the same async-
    dispatch pattern as pipeline/decoder.py). Token VALUES are identical
    to the unpipelined step — only the return is one decode() call late;
    get_result()/reset() drain the in-flight step first.

    background=True additionally moves the device interaction onto a pump
    thread: decode() only packages the chunk (numpy slicing) and hands it
    off, returning tokens the pump has already materialized. Measured on
    the tunneled backend, a paced single-stream decode() call drops from
    ~96 ms (three ~31 ms round trips: upload, dispatch, token fetch — the
    async dispatch alone cannot hide them because materialization is what
    drives execution here) to well under a millisecond, with the round
    trips riding the 640 ms capture gap. Token values are unchanged: the
    pump executes chunks strictly in order with the same device carries.
    Mirrors the reference's capture-thread/decode-thread split
    (streaming_asr.py RecordThread vs main loop).
    """

    _FIXED_F0 = 3  # frame_cursor stays in [0, 3) after buffer trimming

    def __init__(self, model, chunk_frames=32, left_frames=128,
                 background=False):
        import jax.numpy as jnp

        from sherpa_vietnamese_asr_tpu.models.zipformer_streaming import (
            StreamingConfig, init_streaming_state,
        )

        self.model = model
        self.scfg = StreamingConfig(chunk_frames=chunk_frames,
                                    left_frames=left_frames)
        self.enc_state = init_streaming_state(model.zip_cfg, self.scfg, 1)
        self._step = _make_fused_stream_step(model, self.scfg)
        n_f = 2 * chunk_frames
        self._win_samples = (self._FIXED_F0 + n_f - 1) * 160 + 280
        self._mask1 = jnp.ones((1,), bool)
        self.sample_buffer = np.array([], np.float32)
        self.frame_cursor = 0  # fbank frames consumed so far
        self.ctx = jnp.zeros((1, 2), jnp.int32)  # decoder ctx (blank-init)
        self._tokens = []
        self.total_samples = 0
        self._pending = None  # in-flight (toks, counts) device arrays
        self._bg = None
        if background:
            import queue
            import threading

            self._bg_queue = queue.Queue()
            self._bg_lock = threading.Lock()
            self._bg_new = []   # tokens materialized but not yet returned
            self._bg_exc = None
            self._bg = threading.Thread(target=self._bg_loop, daemon=True)
            self._bg.start()

    def _bg_loop(self):
        """Pump thread: executes packaged chunks strictly in order. Owns
        enc_state/ctx while running (the main thread only touches them
        after _bg_join, when the pump is provably idle)."""
        import jax.numpy as jnp

        while True:
            item = self._bg_queue.get()
            if item is None:
                self._bg_queue.task_done()
                return
            wav, f0 = item
            try:
                if self._bg_exc is None:
                    self.enc_state, self.ctx, toks, counts = self._step(
                        self.model.enc_params, self.model.dec_params,
                        self.model.joi_params, self.enc_state, self.ctx,
                        jnp.asarray(wav), jnp.asarray([f0], jnp.int32),
                        self._mask1)
                    new = [int(t) for t in
                           np.asarray(toks[0])[: int(counts[0])]]
                    with self._bg_lock:
                        self._tokens.extend(new)
                        self._bg_new.extend(new)
            except BaseException as e:  # surfaced on the caller thread
                self._bg_exc = e
            finally:
                self._bg_queue.task_done()

    def _bg_join(self):
        """Block until the pump has drained every queued chunk; re-raise
        any pump-side failure on the caller thread."""
        if self._bg is None:
            return
        self._bg_queue.join()
        if self._bg_exc is not None:
            exc, self._bg_exc = self._bg_exc, None
            raise exc

    def close(self):
        """Stop the pump thread (background mode only); idempotent."""
        if self._bg is not None:
            self._bg_queue.put(None)
            self._bg.join()
            self._bg = None

    def accept_waveform(self, audio):
        audio = np.asarray(audio, np.float32)
        self.sample_buffer = np.concatenate([self.sample_buffer, audio])
        self.total_samples += len(audio)

    def _frames_available(self):
        # snip_edges=False framing: frame f covers samples
        # [160 f - 120, 160 f + 280); frame computable once we have
        # 160 f + 280 samples (reflection applies only at stream end).
        return max(0, (len(self.sample_buffer) - 280) // 160)

    def is_ready(self):
        return self._frames_available() - self.frame_cursor \
            >= 2 * self.scfg.chunk_frames

    def _drain(self):
        """Materialize the in-flight step's tokens into self._tokens."""
        if self._pending is None:
            return []
        toks, counts = self._pending
        self._pending = None
        new = [int(t) for t in np.asarray(toks[0])[: int(counts[0])]]
        self._tokens.extend(new)
        return new

    @property
    def tokens(self):
        """All emitted token ids (drains the in-flight step first)."""
        if self._bg is not None:
            self._bg_join()
            with self._bg_lock:
                return list(self._tokens)
        self._drain()
        return self._tokens

    def _package_chunk(self):
        """Slice the next chunk window out of the sample buffer and advance
        the frame cursor. Pure host/numpy work — safe on the caller thread
        in background mode."""
        n_frames = 2 * self.scfg.chunk_frames
        f0 = self.frame_cursor
        wav = np.zeros((1, self._win_samples), np.float32)
        buf = self.sample_buffer[: self._win_samples]
        wav[0, : len(buf)] = buf
        self.frame_cursor += n_frames
        # trim consumed samples, keeping the frame overlap margin
        keep_from = max(0, self.frame_cursor * 160 - 400)
        if keep_from:
            self.sample_buffer = self.sample_buffer[keep_from:]
            self.frame_cursor -= keep_from // 160
        return wav, f0

    def decode(self):
        """Consume one chunk of fbank frames; returns newly emitted pieces
        (from the PREVIOUS in-flight chunk — see class docstring).

        One fused device dispatch; encoder state and decoder context stay
        on device between chunks. In background mode the dispatch happens
        on the pump thread and this call returns whatever the pump has
        materialized since the last call.
        """
        import jax.numpy as jnp

        wav, f0 = self._package_chunk()
        if self._bg is not None:
            if self._bg_exc is not None:
                self._bg_join()  # raises
            self._bg_queue.put((wav, f0))
            with self._bg_lock:
                new, self._bg_new = self._bg_new, []
            return new
        new = self._drain()
        self.enc_state, self.ctx, toks, counts = self._step(
            self.model.enc_params, self.model.dec_params,
            self.model.joi_params, self.enc_state, self.ctx,
            jnp.asarray(wav), jnp.asarray([f0], jnp.int32), self._mask1)
        self._pending = (toks, counts)
        return new

    def get_result(self):
        if self._bg is not None:
            self._bg_join()
        else:
            self._drain()
        return self.peek_result()

    def peek_result(self):
        """Text from already-materialized tokens only — does NOT wait for
        the in-flight step (partial display can lag one chunk; finals via
        get_result are complete)."""
        id2tok = self.model.id2token
        # _tokens, not the tokens property: the property drains the
        # in-flight step, which would serialize host and device again.
        if self._bg is not None:
            with self._bg_lock:
                toks = list(self._tokens)
        else:
            toks = self._tokens
        pieces = [id2tok[t] if t < len(id2tok) else "" for t in toks]
        return "".join(pieces).replace("▁", " ").strip().lower()

    def reset(self):
        from sherpa_vietnamese_asr_tpu.models.zipformer_streaming import (
            init_streaming_state,
        )

        import jax.numpy as jnp

        if self._bg is not None:
            self._bg_join()  # pump idle => safe to touch the carries
            with self._bg_lock:
                self._bg_new = []
        self.enc_state = init_streaming_state(self.model.zip_cfg, self.scfg, 1)
        self.ctx = jnp.zeros((1, 2), jnp.int32)
        self._tokens = []
        self._pending = None
        # Drop unconsumed buffered audio: reset starts a NEW utterance;
        # leftovers would otherwise leak into it.
        self.sample_buffer = np.array([], np.float32)
        self.frame_cursor = 0
        self.total_samples = 0


def _greedy_chunk_decode(enc_chunk, ctx, dec_params, joi_params, cfg):
    """Greedy decode over one chunk's encoder frames with carried context.

    enc_chunk: [T, E]; ctx: [2] int32 (decoder context, 0-padded).
    Returns (tokens [T] int32, count, new_ctx). One emission per frame
    (modified-greedy, same rule as beam_size=1 in ops/beam_search.py).
    """
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.rnnt import (
        decoder_forward, joiner_forward,
    )

    t = enc_chunk.shape[0]

    def step(carry, enc_t):
        ctx_c, = carry
        dec = decoder_forward(dec_params, ctx_c[None, :], cfg)[0]
        logits = joiner_forward(joi_params, enc_t, dec)
        tok = jnp.argmax(logits).astype(jnp.int32)
        emit = tok != cfg.blank_id
        new_ctx = jnp.where(emit, jnp.stack([ctx_c[1], tok]), ctx_c)
        return (new_ctx,), jnp.where(emit, tok, -1)

    (new_ctx,), toks = jax.lax.scan(step, (ctx,), enc_chunk)
    # static-shape compaction: emitted tokens to the front, in frame order
    is_emit = toks >= 0
    order = jnp.argsort(~is_emit, stable=True)
    return toks[order], is_emit.sum(), new_ctx


class OnlineStreamingSession:
    """Queue-driven session over OnlineRecognizer (reference
    streaming_asr_online.py run loop, no Qt): partials on change, finals at
    endpoints, speaker-separator insertion between utterances."""

    SPEAKER_SEP = "__SPK_SEP__"

    def __init__(self, model, on_text, **recognizer_kwargs):
        self.rec = OnlineRecognizer(model, **recognizer_kwargs)
        self.on_text = on_text
        self.last_text = ""
        self.queued_speaker = None
        self.segment_start_samples = 0

    def insert_speaker(self, name):
        self.queued_speaker = name

    def push_chunk(self, audio_chunk):
        if isinstance(audio_chunk, (bytes, bytearray)):
            audio_chunk = (np.frombuffer(audio_chunk, np.int16)
                           .astype(np.float32) / 32768.0)
        self.rec.accept_waveform(audio_chunk)
        if not self.rec.is_ready():
            return
        self.rec.decode()
        text = self.rec.get_result()
        if text and text != self.last_text:
            ts = max(self.rec.total_samples / SAMPLE_RATE,
                     self.segment_start_samples / SAMPLE_RATE)
            self.on_text(text, False, ts)
            self.last_text = text
        if self.rec.is_endpoint():
            self._finalize()

    def _finalize(self):
        text = self.rec.get_result()
        if text:
            self.on_text(text, True,
                         self.segment_start_samples / SAMPLE_RATE)
        if self.queued_speaker:
            self.on_text(f" {self.SPEAKER_SEP}{self.queued_speaker}"
                         f"{self.SPEAKER_SEP}", True, 0.0)
            self.queued_speaker = None
        self.rec.reset()
        self.last_text = ""
        self.segment_start_samples = self.rec.total_samples

    def finalize(self):
        if self.rec.get_result() or len(self.rec.buffer):
            self.rec.decode()
            self._finalize()


class MultiStreamRecognizer:
    """N concurrent live streams multiplexed into ONE jitted encoder step.

    TPU-native serving feature beyond the reference's single-stream
    OnlineRecognizer (streaming_asr_online.py): the per-chunk dispatch
    latency on this backend (~100 ms) dominates a single 0.64 s chunk, so
    batching N mics into one [N, 64, 80] step multiplies streaming
    throughput per chip by ~N. Fixed slot array; slots join/leave without
    recompiling (a validity mask selects which slots' states advance).
    """

    _FIXED_F0 = 3  # frame_cursor stays in [0, 3) after buffer trimming

    def __init__(self, model, n_streams=8, chunk_frames=32, left_frames=128):
        import jax
        import jax.numpy as jnp

        from sherpa_vietnamese_asr_tpu.models.zipformer_streaming import (
            StreamingConfig, init_streaming_state,
        )

        self.model = model
        self.n = n_streams
        self.scfg = StreamingConfig(chunk_frames=chunk_frames,
                                    left_frames=left_frames)
        self.enc_state = init_streaming_state(model.zip_cfg, self.scfg,
                                              n_streams)
        self._zero_state = jax.tree.map(jnp.zeros_like, self.enc_state)
        n_f = 2 * chunk_frames
        self._chunk_samples = (self._FIXED_F0 + n_f - 1) * 160 + 280
        # fbank + cached encoder + greedy decode as ONE dispatch
        self._step = _make_fused_stream_step(model, self.scfg)
        self.active = [False] * n_streams
        self.buffers = [np.array([], np.float32) for _ in range(n_streams)]
        self.cursors = [0] * n_streams
        self.ctx = jnp.zeros((n_streams, 2), jnp.int32)
        self.tokens = [[] for _ in range(n_streams)]

    def open_stream(self):
        """Returns a slot id, or None if all slots are busy."""
        import jax
        import jax.numpy as jnp

        for s in range(self.n):
            if not self.active[s]:
                self.active[s] = True
                self.buffers[s] = np.array([], np.float32)
                self.cursors[s] = 0
                self.ctx = self.ctx.at[s].set(0)
                self.tokens[s] = []
                self.enc_state = jax.tree.map(
                    lambda a, z: a.at[s].set(z[s]),
                    self.enc_state, self._zero_state)
                return s
        return None

    def close_stream(self, slot):
        text = self.get_result(slot)
        self.active[slot] = False
        return text

    def accept_waveform(self, slot, audio):
        self.buffers[slot] = np.concatenate(
            [self.buffers[slot], np.asarray(audio, np.float32)])

    def ready_slots(self):
        n_f = 2 * self.scfg.chunk_frames
        out = []
        for s in range(self.n):
            if not self.active[s]:
                continue
            avail = max(0, (len(self.buffers[s]) - 280) // 160)
            if avail - self.cursors[s] >= n_f:
                out.append(s)
        return out

    def step(self):
        """Advance every ready slot by one chunk (ONE fused dispatch).
        Returns {slot: [new token ids]}."""
        import jax.numpy as jnp

        ready = self.ready_slots()
        if not ready:
            return {}
        n_f = 2 * self.scfg.chunk_frames
        wav = np.zeros((self.n, self._chunk_samples), np.float32)
        f0s = np.zeros((self.n,), np.int32)
        for s in ready:
            buf = self.buffers[s][: self._chunk_samples]
            wav[s, : len(buf)] = buf
            f0s[s] = self.cursors[s]
            self.cursors[s] += n_f
            keep_from = max(0, self.cursors[s] * 160 - 400)
            if keep_from:
                self.buffers[s] = self.buffers[s][keep_from:]
                self.cursors[s] -= keep_from // 160
        mask = np.zeros((self.n,), bool)
        mask[ready] = True
        self.enc_state, self.ctx, toks, counts = self._step(
            self.model.enc_params, self.model.dec_params,
            self.model.joi_params, self.enc_state, self.ctx,
            jnp.asarray(wav), jnp.asarray(f0s), jnp.asarray(mask))
        toks, counts = np.asarray(toks), np.asarray(counts)
        out = {}
        for s in ready:
            new = [int(t) for t in toks[s][: int(counts[s])]]
            self.tokens[s].extend(new)
            out[s] = new
        return out

    def get_result(self, slot):
        id2tok = self.model.id2token
        pieces = [id2tok[t] if t < len(id2tok) else ""
                  for t in self.tokens[slot]]
        return "".join(pieces).replace("▁", " ").strip().lower()

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

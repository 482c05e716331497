# Online (no-VAD) streaming recognizer: endpoint rules and session behavior.
import numpy as np
import pytest


@pytest.fixture(scope="module")
def model():
    from sherpa_vietnamese_asr_tpu.models.registry import (
        TINY_ZIPFORMER, random_asr_model,
    )
    return random_asr_model(vocab_size=60, zip_cfg=TINY_ZIPFORMER, beam_size=1)


def test_endpoint_rules(model):
    from sherpa_vietnamese_asr_tpu.pipeline.streaming_online import (
        OnlineRecognizer,
    )
    rec = OnlineRecognizer(model, max_window_sec=8.0)
    # rule1: nothing decoded + trailing silence >= 3 s
    rec.accept_waveform(np.zeros(int(3.5 * 16000), np.float32))
    rec._last_words = []
    rec._last_text = ""
    assert rec.is_endpoint()
    rec.reset()
    assert not rec.is_endpoint() or rec.utterance_length_sec() == 0

    # rule2: decoded text + >= 2 s trailing silence
    rec.accept_waveform(np.zeros(int(3.0 * 16000), np.float32))
    rec._last_text = "xin chao"
    rec._last_words = [{"text": "chao", "start": 0.5, "end": 0.8}]
    assert rec.trailing_silence_sec() >= 2.0
    assert rec.is_endpoint()

    # rule3: very long utterance
    rec.reset()
    rec.rule3 = 1.0
    rec.accept_waveform(np.zeros(int(1.2 * 16000), np.float32))
    rec._last_words = [{"text": "a", "start": 0.0, "end": 1.1}]
    rec._last_text = "a"
    assert rec.is_endpoint()


def test_online_session_emits_partials_and_finals(model, monkeypatch):
    """Endpoint/session behavior with a deterministic energy-based decode
    stub (random weights would emit tokens on silence, masking rule2)."""
    from sherpa_vietnamese_asr_tpu.pipeline import streaming_online as so

    def fake_decode(self):
        self._pending = 0
        buf = self.buffer
        win = 800
        words = []
        n = len(buf) // win
        for i in range(n):
            if np.sqrt((buf[i * win: (i + 1) * win] ** 2).mean()) > 0.02:
                t = i * win / 16000.0
                words.append({"text": f"w{i}", "start": t, "end": t + 0.05})
        self._last_words = words
        self._last_text = " ".join(w["text"] for w in words)

    monkeypatch.setattr(so.OnlineRecognizer, "decode", fake_decode)

    events = []
    sess = so.OnlineStreamingSession(
        model, lambda t, f, ts: events.append((t, f, ts)),
        chunk_sec=0.32, max_window_sec=6.0,
        rule2_min_trailing_silence=0.8, rule1_min_trailing_silence=1.5,
        decode_throttle_sec=0.32)
    sr = 16000
    tone = (0.3 * np.sin(2 * np.pi * 300 * np.arange(sr) / sr)
            ).astype(np.float32)
    sess.insert_speaker("Bob")
    for i in range(0, sr, 800):
        sess.push_chunk(tone[i: i + 800])
    for _ in range(40):  # trailing silence -> rule2 endpoint
        sess.push_chunk(np.zeros(800, np.float32))
    finals = [e for e in events if e[1]]
    assert finals, f"no finals in {events[:5]}"
    seps = [e for e in finals if "__SPK_SEP__Bob__SPK_SEP__" in e[0]]
    assert len(seps) == 1
    partials = [e for e in events if not e[1]]
    assert partials


def test_window_bounding(model):
    from sherpa_vietnamese_asr_tpu.pipeline.streaming_online import (
        OnlineRecognizer,
    )
    rec = OnlineRecognizer(model, max_window_sec=2.0)
    rec.accept_waveform(np.zeros(16000 * 5, np.float32))
    assert len(rec.buffer) == 16000 * 2
    assert rec.total_samples == 16000 * 5


def test_cached_streaming_recognizer(model, rng):
    from sherpa_vietnamese_asr_tpu.pipeline.streaming_online import (
        CachedStreamingRecognizer,
    )
    rec = CachedStreamingRecognizer(model, chunk_frames=32, left_frames=64)
    sr = 16000
    tone = (0.3 * np.sin(2 * np.pi * 300 * np.arange(sr * 3) / sr)
            ).astype(np.float32)
    emitted = []
    for i in range(0, len(tone), 1600):
        rec.accept_waveform(tone[i: i + 1600])
        while rec.is_ready():
            emitted.extend(rec.decode())
    # random weights emit tokens; result text assembles pieces
    assert emitted
    text = rec.get_result()
    assert isinstance(text, str) and text
    # reset clears state
    rec.reset()
    assert rec.get_result() == ""
    # decoder context carries across chunks (device-resident, [1, 2])
    assert rec.ctx.shape == (1, 2)


def test_cached_streaming_background_pump_parity(model, rng):
    """background=True (pump-thread device interaction) emits the exact
    token sequence of the synchronous recognizer, and survives
    reset-and-reuse. The pump exists to take the tunneled backend's
    ~3 x 31 ms round trips off the caller thread (PERFORMANCE.md)."""
    from sherpa_vietnamese_asr_tpu.pipeline.streaming_online import (
        CachedStreamingRecognizer,
    )
    sr = 16000
    tone = (0.3 * np.sin(2 * np.pi * 300 * np.arange(sr * 3) / sr)
            + 0.02 * rng.standard_normal(sr * 3)).astype(np.float32)

    def run(rec):
        emitted = []
        for i in range(0, len(tone), 1600):
            rec.accept_waveform(tone[i: i + 1600])
            while rec.is_ready():
                emitted.extend(rec.decode())
        text = rec.get_result()
        return emitted + [t for t in rec.tokens[len(emitted):]], text

    sync = CachedStreamingRecognizer(model, chunk_frames=32, left_frames=64)
    bg = CachedStreamingRecognizer(model, chunk_frames=32, left_frames=64,
                                   background=True)
    try:
        toks_s, text_s = run(sync)
        toks_b, text_b = run(bg)
        assert toks_b == toks_s
        assert text_b == text_s
        # reset + second utterance stays in lockstep
        sync.reset()
        bg.reset()
        assert run(bg) == run(sync)
    finally:
        bg.close()


def test_greedy_chunk_decode_compaction(model):
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.pipeline.streaming_online import (
        _greedy_chunk_decode,
    )
    rng2 = np.random.default_rng(3)
    enc = jnp.asarray(rng2.standard_normal(
        (6, model.rnnt_cfg.encoder_out_dim)).astype(np.float32) * 2)
    toks, n, ctx = _greedy_chunk_decode(
        enc, jnp.zeros(2, jnp.int32), model.dec_params, model.joi_params,
        model.rnnt_cfg)
    toks, n = np.asarray(toks), int(n)
    assert (toks[:n] >= 0).all()
    assert (toks[n:] == -1).all() or n == 6


def test_multistream_matches_single_stream(model, rng):
    """N-slot multiplexed streaming == the single-stream recognizer, even
    with slots joining mid-flight and one slot left inactive."""
    from sherpa_vietnamese_asr_tpu.pipeline.streaming_online import (
        CachedStreamingRecognizer, MultiStreamRecognizer,
    )

    sr = 16000
    audios = []
    for i in range(3):
        t = np.arange(sr * 2) / sr
        audios.append(np.clip(
            0.3 * np.sin(2 * np.pi * (250 + 60 * i) * t)
            + 0.03 * rng.standard_normal(len(t)), -1, 1).astype(np.float32))

    # ground truth: independent single-stream decodes
    singles = []
    for a in audios:
        rec = CachedStreamingRecognizer(model, chunk_frames=32,
                                        left_frames=64)
        for off in range(0, len(a), 1600):
            rec.accept_waveform(a[off: off + 1600])
            while rec.is_ready():
                rec.decode()
        singles.append(list(rec.tokens))

    ms = MultiStreamRecognizer(model, n_streams=4, chunk_frames=32,
                               left_frames=64)
    s0 = ms.open_stream()
    s1 = ms.open_stream()
    offsets = {s0: 0, s1: 0}
    slot_audio = {s0: audios[0], s1: audios[1]}
    s2 = None
    tick = 0
    while True:
        moved = False
        for s, a in list(slot_audio.items()):
            if offsets[s] < len(a):
                ms.accept_waveform(s, a[offsets[s]: offsets[s] + 1600])
                offsets[s] += 1600
                moved = True
        while ms.ready_slots():
            ms.step()
        tick += 1
        if tick == 5 and s2 is None:  # third stream joins mid-flight
            s2 = ms.open_stream()
            offsets[s2] = 0
            slot_audio[s2] = audios[2]
        if not moved and not ms.ready_slots():
            break
    assert ms.tokens[s0] == singles[0]
    assert ms.tokens[s1] == singles[1]
    assert ms.tokens[s2] == singles[2]
    # inactive 4th slot untouched
    assert ms.tokens[3 if s2 != 3 else 2] in (ms.tokens[s2], []) or True
    unused = ({0, 1, 2, 3} - {s0, s1, s2}).pop()
    assert ms.tokens[unused] == []
    # close returns the assembled text
    assert isinstance(ms.close_stream(s0), str)
    # slot is reusable after close
    assert ms.open_stream() == s0

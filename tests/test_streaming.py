# Streaming ASR session state machine tests.
import numpy as np
import pytest


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


@pytest.fixture(scope="module")
def model():
    from sherpa_vietnamese_asr_tpu.models.registry import (
        TINY_ZIPFORMER, random_asr_model,
    )
    return random_asr_model(vocab_size=60, zip_cfg=TINY_ZIPFORMER, beam_size=1)


def _mk_session(model, clock):
    from sherpa_vietnamese_asr_tpu.pipeline.streaming import StreamingSession

    events = []
    sess = StreamingSession(model, lambda t, f, ts: events.append((t, f, ts)),
                            clock=clock)
    # Deterministic VAD: energy threshold instead of the random-weight model
    class EnergyVAD:
        def __init__(self):
            self.buf = np.array([], np.float32)
            self.ring = []

        def process(self, chunk):
            self.ring.append(np.asarray(chunk, np.float32))
            self.ring = self.ring[-6:]
            self.buf = np.concatenate([self.buf, np.asarray(chunk, np.float32)])
            if len(self.buf) < 512:
                return None, None
            probs = []
            while len(self.buf) >= 512:
                w, self.buf = self.buf[:512], self.buf[512:]
                probs.append(float(np.sqrt((w ** 2).mean()) > 0.02))
            p = max(probs)
            return p > 0.5, p

        def get_context(self):
            return np.concatenate(self.ring) if self.ring else \
                np.array([], np.float32)

        def reset(self):
            self.buf = np.array([], np.float32)
            self.ring = []

        def soft_reset(self):
            self.reset()

    sess.vad = EnergyVAD()
    return sess, events


def test_streaming_utterance_lifecycle(model):
    clock = FakeClock()
    sess, events = _mk_session(model, clock)
    sr = 16000
    chunk = int(0.05 * sr)
    tone = (0.3 * np.sin(2 * np.pi * 300 * np.arange(chunk) / sr)
            ).astype(np.float32)
    silence = np.zeros(chunk, np.float32)

    # 1.5 s of speech
    for i in range(30):
        clock.t += 0.05
        sess.push_chunk(tone)
    assert sess.state == "RECORDING"
    # 0.8 s of silence ends the utterance
    for i in range(16):
        clock.t += 0.05
        sess.push_chunk(silence)
    assert sess.state == "IDLE"
    finals = [e for e in events if e[1]]
    assert len(finals) == 1
    text, is_final, ts = finals[0]
    assert is_final and isinstance(text, str) and text
    assert ts >= 0.0
    # partials were throttled to ~1 Hz during 1.5 s of speech
    partials = [e for e in events if not e[1]]
    assert len(partials) <= 2


def test_streaming_speaker_insertion(model):
    clock = FakeClock()
    sess, events = _mk_session(model, clock)
    sess.insert_speaker("Alice")
    sess.push_chunk(np.zeros(800, np.float32))
    sep = [e for e in events if "__SPK_SEP__Alice__SPK_SEP__" in e[0]]
    assert len(sep) == 1 and sep[0][1] is True


def test_streaming_max_duration_ends(model):
    clock = FakeClock()
    sess, events = _mk_session(model, clock)
    sess.MAX_SPEECH_DURATION = 0.5  # shorten for the test
    sr = 16000
    chunk = int(0.05 * sr)
    tone = (0.3 * np.sin(2 * np.pi * 300 * np.arange(chunk) / sr)
            ).astype(np.float32)
    for i in range(20):  # 1 s of continuous speech
        clock.t += 0.01  # below decode interval -> no partials
        sess.push_chunk(tone, queue_depth=20)  # backpressure: skip partials
    finals = [e for e in events if e[1]]
    assert len(finals) >= 1
    assert all(not e[1] for e in events if e not in finals)


def test_vad_trigger_state_machine():
    from sherpa_vietnamese_asr_tpu.pipeline.streaming import VADTrigger

    trig = VADTrigger(trigger_level=0.3)
    out = trig.process(np.zeros(100, np.float32))
    assert out == (None, None)  # not enough samples yet
    is_speech, prob = trig.process(np.zeros(512, np.float32))
    assert is_speech in (True, False) and 0.0 <= prob <= 1.0
    ctx = trig.get_context()
    assert len(ctx) == 612
    trig.reset()
    assert len(trig.get_context()) == 0

# End-to-end pipeline tests on synthetic audio with a tiny random model.
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_model():
    from sherpa_vietnamese_asr_tpu.models.registry import (
        TINY_ZIPFORMER, random_asr_model,
    )
    return random_asr_model(vocab_size=80, zip_cfg=TINY_ZIPFORMER,
                            beam_size=4)


@pytest.fixture()
def wav_file(tmp_path, rng):
    from sherpa_vietnamese_asr_tpu.utils.audio_io import write_wav
    sr = 16000
    t = np.arange(sr * 4) / sr
    x = (0.3 * np.sin(2 * np.pi * 300 * t)
         * (0.5 + 0.5 * np.sin(2 * np.pi * 2.5 * t))
         + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
    # Insert a silent region in the middle
    x[sr : int(1.5 * sr)] = 0.0
    path = tmp_path / "test.wav"
    write_wav(str(path), x, sr)
    return str(path), x


def test_wav_roundtrip(tmp_path, rng):
    from sherpa_vietnamese_asr_tpu.utils.audio_io import read_wav, write_wav
    x = np.clip(rng.standard_normal(16000) * 0.3, -0.99, 0.99).astype(np.float32)
    p = tmp_path / "rt.wav"
    write_wav(str(p), x)
    y, sr = read_wav(str(p))
    assert sr == 16000 and y.shape == (16000, 1)
    np.testing.assert_allclose(y[:, 0], x, atol=1.0 / 16000)


@pytest.mark.slow
def test_resample_preserves_tone(rng):
    from sherpa_vietnamese_asr_tpu.utils.audio_io import resample_poly
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample_poly(x, sr_in, sr_out)
    assert abs(len(y) - sr_out) <= 2
    # Dominant frequency must stay at 440 Hz
    spec = np.abs(np.fft.rfft(y[1000:-1000] * np.hanning(len(y) - 2000)))
    freq = np.fft.rfftfreq(len(y) - 2000, 1.0 / sr_out)
    assert abs(freq[spec.argmax()] - 440) < 5


def test_vad_segmentation_logic():
    from sherpa_vietnamese_asr_tpu.pipeline.vad import probs_to_segments
    # 100 windows: speech at [10, 40), [60, 90)
    probs = np.zeros(100, np.float32)
    probs[10:40] = 0.9
    probs[60:90] = 0.9
    segs = probs_to_segments(probs, threshold=0.5, min_silence_ms=300,
                             min_speech_ms=250)
    assert segs == [(10, 40), (60, 90)]
    # short blip below min_speech dropped
    probs2 = np.zeros(100, np.float32)
    probs2[50:53] = 0.9
    assert probs_to_segments(probs2, threshold=0.5, min_speech_ms=250) == []


def test_get_vad_segments_fallback_and_boost():
    from sherpa_vietnamese_asr_tpu.pipeline.vad import get_vad_segments
    audio = np.zeros(16000, np.float32)
    audio[:8000] = 0.01  # quiet
    seen_peaks = []

    def prob_fn(a):
        seen_peaks.append(float(np.max(np.abs(a))))
        return np.zeros(len(a) // 512, np.float32)

    segs = get_vad_segments(audio, prob_fn, fallback_full=True)
    assert segs == [(0, 16000)]  # fallback to full audio
    assert seen_peaks[0] > 0.05  # auto-boost was applied to the VAD copy


def test_chunk_plan_structure():
    from sherpa_vietnamese_asr_tpu.pipeline.chunking import plan_chunks
    total = 16000 * 95  # 95 s
    plan = plan_chunks(total, [])
    assert plan[0][2] == 0
    assert all(ov == 3 * 16000 for _, _, ov in plan[1:])
    assert plan[-1][1] == total
    # contiguous logical coverage
    for i in range(1, len(plan)):
        assert plan[i][0] + plan[i][2] == plan[i - 1][1]


def test_transcriber_end_to_end(tiny_model, wav_file):
    from sherpa_vietnamese_asr_tpu.pipeline.transcriber import (
        TranscriberPipeline,
    )
    path, audio = wav_file
    phases = []

    def vad_prob_fn(a):
        # Deterministic synthetic VAD: energy-based
        n = len(a) // 512
        w = a[: n * 512].reshape(n, 512)
        rms = np.sqrt((w ** 2).mean(axis=1))
        return (rms > 0.01).astype(np.float32)

    pipe = TranscriberPipeline(path, tiny_model, config={"max_batch": 2},
                               progress_callback=phases.append,
                               vad_prob_fn=vad_prob_fn)
    result = pipe.run()
    assert result is not None
    assert set(result) >= {"text", "segments", "timing", "duration_sec",
                           "asr_confidence", "overlap_segments"}
    assert abs(result["duration_sec"] - 4.0) < 0.01
    assert any(p.startswith("PHASE:Transcription") for p in phases)
    assert any(p.startswith("PHASE:Complete") for p in phases)
    # random weights still emit tokens; check structure
    for seg in result["segments"]:
        assert seg["end"] >= seg["start"]
        for w in seg.get("raw_words", []):
            assert "prob" in w


def test_transcriber_cancel(tiny_model, wav_file):
    from sherpa_vietnamese_asr_tpu.pipeline.transcriber import (
        TranscriberPipeline,
    )
    path, _ = wav_file
    pipe = TranscriberPipeline(path, tiny_model, cancel_check=lambda: True)
    assert pipe.run() is None


def test_split_long_segments_behavior():
    from sherpa_vietnamese_asr_tpu.pipeline.merge import split_long_segments
    words = " ".join(f"w{i}" for i in range(30))
    segs = [{"text": words, "start": 0.0, "end": 30.0}]
    out = split_long_segments(segs, max_duration=12.0)
    assert len(out) == 3  # 30 s -> 3 parts
    assert out[0]["start"] == 0.0 and abs(out[-1]["end"] - 30.0) < 1e-6
    total_words = sum(len(s["text"].split()) for s in out)
    assert total_words == 30
    # under-limit segments untouched
    assert split_long_segments([{"text": "a b", "start": 0, "end": 5.0}],
                               12.0) == [{"text": "a b", "start": 0,
                                          "end": 5.0}]


def test_merge_chunks_with_overlap_dedup():
    from sherpa_vietnamese_asr_tpu.pipeline.merge import (
        merge_chunks_with_overlap,
    )

    def mk(texts, t0, local0=0.0, prob=0.9):
        out = []
        t = t0
        lt = local0
        for txt in texts.split():
            out.append({"text": txt, "start": t, "end": t + 0.2,
                        "local_start": lt, "local_end": lt + 0.2,
                        "prob": prob})
            t += 0.3
            lt += 0.3
        return out

    # chunk 1: 0-30 s; chunk 2: 27-60 s with 3 s overlap; head repeats tail
    c1 = {"words": mk("xin chao viet nam hom nay troi dep", 27.0,
                      local0=27.0),
          "audio_start_abs": 0.0, "audio_end_abs": 30.0, "overlap_sec": 0.0}
    c2 = {"words": mk("hom nay troi dep va mat me", 27.9, local0=0.9),
          "audio_start_abs": 27.0, "audio_end_abs": 60.0, "overlap_sec": 3.0}
    merged, text = merge_chunks_with_overlap([c1, c2])
    assert text.split().count("dep") == 1  # overlap deduplicated
    assert "mat" in text and "xin" in text


def test_resume_checkpoint(tiny_model, wav_file):
    """enable_resume: a checkpoint written after decode lets a rerun skip
    decoding and produce the same text (PWA resume analogue)."""
    import json
    import os

    from sherpa_vietnamese_asr_tpu.pipeline.transcriber import (
        TranscriberPipeline,
    )
    path, _ = wav_file

    def vad(a):
        return np.ones(len(a) // 512, np.float32)

    cfg = {"max_batch": 2, "enable_resume": True}
    res1 = TranscriberPipeline(path, tiny_model, config=cfg,
                               vad_prob_fn=vad).run()
    # checkpoint removed after success
    assert not os.path.exists(path + ".asr_ckpt.json")

    # Fabricate a checkpoint as if a previous run died after decode
    ck = {"version": 1, "stage": "decoded", "full_text": res1["text"],
          "all_words": [w for s in res1["segments"]
                        for w in s.get("raw_words", [])],
          "concat_len": 16000, "vad_probs": None}
    with open(path + ".asr_ckpt.json", "w") as f:
        json.dump(ck, f)

    calls = {"n": 0}
    def counting_vad(a):
        calls["n"] += 1
        return vad(a)

    res2 = TranscriberPipeline(path, tiny_model, config=cfg,
                               vad_prob_fn=counting_vad).run()
    assert calls["n"] == 0  # decode path skipped entirely
    assert res2["text"] == res1["text"]
    assert not os.path.exists(path + ".asr_ckpt.json")


def test_silero_vad_streamed_matches_full(rng):
    """Blocked int16-upload VAD == whole-audio VAD (state/context carry)."""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models import silero_vad

    params = silero_vad.init_silero_params(jax.random.PRNGKey(0))
    audio = (0.3 * np.sin(2 * np.pi * 300 * np.arange(16000 * 4) / 16000)
             + 0.05 * rng.standard_normal(16000 * 4)).astype(np.float32)
    audio = np.clip(audio, -1, 1)
    full = np.asarray(silero_vad.silero_vad_probs(params,
                                                  jnp.asarray(audio)))
    # fp32 blocked: exact up to block-boundary reassociation
    got = silero_vad.silero_vad_probs_streamed(params, audio,
                                               block_windows=37,
                                               quantize=False)
    assert got.shape == full.shape
    np.testing.assert_allclose(got, full, atol=1e-5)
    # int16 transfer: probabilities move only marginally
    got_q = silero_vad.silero_vad_probs_streamed(params, audio,
                                                 block_windows=37)
    assert np.max(np.abs(got_q - full)) < 5e-3


def test_decoder_int16_transfer_token_parity(rng):
    """int16 audio upload must not change decoded tokens (quantization is
    ~3e-5 in [-1,1]; logits margins dwarf it)."""
    from sherpa_vietnamese_asr_tpu.models.registry import (
        TINY_ZIPFORMER, random_asr_model,
    )
    from sherpa_vietnamese_asr_tpu.pipeline.decoder import (
        BatchedChunkDecoder,
    )

    model = random_asr_model(vocab_size=60, zip_cfg=TINY_ZIPFORMER,
                             beam_size=2)
    audio = np.clip(
        0.3 * np.sin(2 * np.pi * 300 * np.arange(16000 * 6) / 16000)
        + 0.05 * rng.standard_normal(16000 * 6), -1, 1).astype(np.float32)
    spans = [(0, 16000 * 3), (16000 * 3, 16000 * 6)]
    w_f = BatchedChunkDecoder(model, max_batch=2, chunk_pad_sec=4.0,
                              transfer_dtype="float32"
                              ).decode_spans(audio, spans)
    w_q = BatchedChunkDecoder(model, max_batch=2, chunk_pad_sec=4.0,
                              transfer_dtype="int16"
                              ).decode_spans(audio, spans)
    toks_f = [[w["text"] for w in ws] for ws in w_f]
    toks_q = [[w["text"] for w in ws] for ws in w_q]
    assert toks_f == toks_q


def test_decoder_sharded_matches_single_device(rng):
    """BatchedChunkDecoder over an 8-device mesh == single-device decode
    (same words, timestamps, confidences)."""
    import jax

    from sherpa_vietnamese_asr_tpu.models.registry import (
        TINY_ZIPFORMER, random_asr_model,
    )
    from sherpa_vietnamese_asr_tpu.parallel.sharding import make_mesh
    from sherpa_vietnamese_asr_tpu.pipeline.decoder import (
        BatchedChunkDecoder,
    )

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the 8-device CPU mesh")
    model = random_asr_model(vocab_size=60, zip_cfg=TINY_ZIPFORMER,
                             beam_size=2)
    audio = np.clip(
        0.3 * np.sin(2 * np.pi * 300 * np.arange(16000 * 8) / 16000)
        + 0.05 * rng.standard_normal(16000 * 8), -1, 1).astype(np.float32)
    spans = [(i * 16000, (i + 2) * 16000) for i in range(0, 8, 2)]
    plain = BatchedChunkDecoder(model, max_batch=8, chunk_pad_sec=3.0
                                ).decode_spans(audio, spans)
    sharded = BatchedChunkDecoder(model, max_batch=8, chunk_pad_sec=3.0,
                                  mesh=make_mesh()
                                  ).decode_spans(audio, spans)
    assert [[w["text"] for w in ws] for ws in plain] \
        == [[w["text"] for w in ws] for ws in sharded]
    for a, b in zip(plain, sharded):
        for wa, wb in zip(a, b):
            assert abs(wa["start"] - wb["start"]) < 1e-6


def test_decoder_sharded_pallas_kernel_matches_single_device(rng):
    """Sharded decode through the Pallas beam megakernel (per-shard under
    shard_map, interpret mode on the CPU mesh) == single-device XLA decode.

    Round 4: before this, any mesh silently forfeited the kernel
    (decoder.py use_pallas_beam required mesh is None); this pins the
    fast-AND-distributed path. Also covers max_batch padding: 6 on an
    8-device mesh must round up to 8, not crash."""
    import jax

    from sherpa_vietnamese_asr_tpu.models.registry import (
        TINY_ZIPFORMER, random_asr_model,
    )
    from sherpa_vietnamese_asr_tpu.parallel.sharding import make_mesh
    from sherpa_vietnamese_asr_tpu.pipeline.decoder import (
        BatchedChunkDecoder,
    )

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the 8-device CPU mesh")
    model = random_asr_model(vocab_size=60, zip_cfg=TINY_ZIPFORMER,
                             beam_size=4)  # kernel gate needs beam >= 4
    audio = np.clip(
        0.3 * np.sin(2 * np.pi * 300 * np.arange(16000 * 8) / 16000)
        + 0.05 * rng.standard_normal(16000 * 8), -1, 1).astype(np.float32)
    spans = [(i * 16000, (i + 2) * 16000) for i in range(0, 8, 2)]
    plain = BatchedChunkDecoder(model, max_batch=8, chunk_pad_sec=3.0
                                ).decode_spans(audio, spans)
    sharded = BatchedChunkDecoder(
        model, max_batch=6,  # not a mesh multiple: must pad up to 8
        chunk_pad_sec=3.0, mesh=make_mesh(),
        use_pallas_beam="interpret").decode_spans(audio, spans)
    assert [[w["text"] for w in ws] for ws in plain] \
        == [[w["text"] for w in ws] for ws in sharded]
    for a, b in zip(plain, sharded):
        for wa, wb in zip(a, b):
            assert abs(wa["start"] - wb["start"]) < 1e-6
            assert abs(wa["prob"] - wb["prob"]) < 1e-4


def test_int16_exact_detection_and_lossless_roundtrip(rng, tmp_path):
    """16-bit-PCM-sourced floats (k/32768) must be detected as int16-exact
    and survive the decoder's quantize/dequantize bit-identically — the
    basis for the pipeline's automatic lossless int16 decode upload."""
    from sherpa_vietnamese_asr_tpu.utils.audio_io import (
        is_int16_exact, load_audio, write_wav,
    )

    k = rng.integers(-32768, 32768, size=5000).astype(np.float32)
    a = k / np.float32(32768.0)
    assert is_int16_exact(a)
    # the decoder's transfer path (pipeline/decoder.py:289 + :41)
    q = np.clip(np.rint(a * 32768.0), -32768, 32767).astype(np.int16)
    back = q.astype(np.float32) / np.float32(32768.0)
    assert np.array_equal(back, a)
    # float-valued audio (e.g. RMS-normalized) must ship as float32
    assert not is_int16_exact(a * np.float32(0.9993))
    # WAV round trip through the library's own writer/loader stays exact
    path = str(tmp_path / "x.wav")
    write_wav(path, a, 16000)
    assert is_int16_exact(load_audio(path, 16000))

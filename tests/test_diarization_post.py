# Diarization post-processing: NaturalTurn, fragment zones, word mapping.
import numpy as np

from sherpa_vietnamese_asr_tpu.pipeline.diarization_post import (
    Segment,
    merge_segments_with_gap,
    natural_turn_merge,
    post_process_diarization_segments,
    process_with_transcription,
    resolve_fragment_zones,
    smooth_speaker_boundary_fragments,
    speaker_for_word_by_time,
    speaker_labels_for_words,
)


def test_merge_segments_with_gap():
    segs = [Segment(0, 1, 0), Segment(1.1, 2, 0), Segment(2.2, 3, 1),
            Segment(5, 6, 0)]
    out = merge_segments_with_gap(segs, max_gap=0.3)
    assert len(out) == 3
    assert out[0].start == 0 and out[0].end == 2 and out[0].speaker == 0


def test_resolve_fragment_zones_dominant_speaker():
    segs = [Segment(0, 5, 0),
            Segment(5.0, 5.3, 1), Segment(5.3, 5.4, 0), Segment(5.4, 5.8, 1),
            Segment(6, 10, 1)]
    out = resolve_fragment_zones(segs, short_thresh=0.5, min_zone_size=3)
    # the 3 short fragments collapse to speaker 1 (0.3+0.4 > 0.1)
    zone = [s for s in out if s.start == 5.0][0]
    assert zone.speaker == 1 and zone.end == 5.8
    assert len(out) == 3


def test_natural_turn_backchannel_absorbed():
    # A holds the floor 0-20s with a pause; B interjects briefly inside.
    segs = [Segment(0, 10, 0), Segment(10.5, 11.0, 1), Segment(11.5, 20, 0)]
    out = natural_turn_merge(segs, max_pause=2.0)
    assert all(s.speaker == 0 for s in out)
    # merged into one turn
    assert len(out) == 1 and out[0].start == 0 and out[0].end == 20


def test_natural_turn_keeps_contentful_secondary():
    words = [{"start": 10.5 + 0.1 * i, "end": 10.6 + 0.1 * i, "text": "w"}
             for i in range(6)]  # 6 words inside B's turn -> not backchannel
    segs = [Segment(0, 10, 0), Segment(10.5, 11.4, 1), Segment(11.5, 20, 0)]
    out = natural_turn_merge(segs, max_pause=2.0, asr_words=words)
    assert any(s.speaker == 1 for s in out)


def test_post_process_pipeline_runs():
    segs = [Segment(0, 0.2, 0), Segment(0.25, 0.4, 1), Segment(0.45, 0.6, 0),
            Segment(1, 4, 0), Segment(4.5, 8, 1)]
    out = post_process_diarization_segments(segs)
    assert out and all(isinstance(s, Segment) for s in out)


def test_speaker_for_word_by_time():
    segs = [Segment(0, 2, 0), Segment(3, 5, 1)]
    assert speaker_for_word_by_time({"start": 1.0, "end": 1.2}, segs) == 0
    assert speaker_for_word_by_time({"start": 4.0, "end": 4.2}, segs) == 1
    # word in the gap goes to the nearest boundary
    assert speaker_for_word_by_time({"start": 2.1, "end": 2.3}, segs) == 0
    assert speaker_for_word_by_time({"start": 2.8, "end": 2.95}, segs) == 1


def test_orphan_prefix_moves_to_next_turn():
    segs = [Segment(0, 2, 0), Segment(3.5, 6, 1)]
    # word at 2.6-2.75 (in gap, closer to seg B start? mid=2.675; dist prev
    # 0.675, next 0.825 -> initially labeled 0), next word inside B, with a
    # clear pause after the orphan word.
    words = [{"start": 1.0, "end": 1.2, "text": "a"},
             {"start": 2.6, "end": 2.75, "text": "b"},
             {"start": 3.6, "end": 3.8, "text": "c"}]
    labels = speaker_labels_for_words(words, segs)
    assert labels[0] == 0
    assert labels[1] == 1  # moved to the following turn
    assert labels[2] == 1


def test_process_with_transcription_splits_by_speaker():
    segs = [Segment(0, 2, 0), Segment(2, 4, 1)]
    words = [{"start": 0.2 + i * 0.3, "end": 0.4 + i * 0.3, "text": f"w{i}"}
             for i in range(10)]
    tseg = [{"text": " ".join(f"w{i}" for i in range(10)),
             "start": 0.0, "end": 3.2, "raw_words": words}]
    out = process_with_transcription(tseg, segs)
    assert len(out) >= 2
    assert out[0]["speaker_id"] == 0
    assert out[-1]["speaker_id"] == 1
    total_words = sum(len(s["raw_words"]) for s in out)
    assert total_words == 10


def test_smooth_island_fragment():
    segs = [
        {"text": "one two three.", "start": 0, "end": 3, "speaker_id": 0,
         "speaker": "Người nói 1"},
        {"text": "oh", "start": 3.1, "end": 3.5, "speaker_id": 1,
         "speaker": "Người nói 2"},
        {"text": "four five six.", "start": 3.6, "end": 6, "speaker_id": 0,
         "speaker": "Người nói 1"},
    ]
    out = smooth_speaker_boundary_fragments(segs)
    assert out[1]["speaker_id"] == 0  # island absorbed


def test_transcriber_with_diarizer(tmp_path, rng):
    """Full pipeline with diarization enabled (tiny models)."""
    import jax

    from sherpa_vietnamese_asr_tpu.models.pyannet import (
        PyanNetConfig, init_pyannet_params,
    )
    from sherpa_vietnamese_asr_tpu.models.registry import (
        TINY_ZIPFORMER, random_asr_model,
    )
    from sherpa_vietnamese_asr_tpu.models.resnet_speaker import TINY_RESNET
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_pure import (
        PureDiarizer,
    )
    from sherpa_vietnamese_asr_tpu.pipeline.transcriber import (
        TranscriberPipeline,
    )
    from sherpa_vietnamese_asr_tpu.utils.audio_io import write_wav

    sr = 16000
    t = np.arange(sr * 12) / sr
    x = (0.3 * np.sin(2 * np.pi * 250 * t)).astype(np.float32)
    path = tmp_path / "diar.wav"
    write_wav(str(path), x, sr)

    model = random_asr_model(vocab_size=60, zip_cfg=TINY_ZIPFORMER,
                             beam_size=2)
    seg_cfg = PyanNetConfig(sinc_filters=16, conv_channels=12,
                            lstm_hidden=16, lstm_layers=1, linear_dim=16)
    diar = PureDiarizer(
        seg_params=init_pyannet_params(jax.random.PRNGKey(3), seg_cfg),
        seg_cfg=seg_cfg, emb_cfg=TINY_RESNET,
        segmentation_batch_size=4, embedding_batch_size=4)

    def vad(a):
        return np.ones(len(a) // 512, np.float32)

    res = TranscriberPipeline(str(path), model,
                              config={"speaker_diarization": True,
                                      "max_batch": 2},
                              vad_prob_fn=vad, diarizer=diar).run()
    assert res is not None
    # diarization must SUCCEED on speech audio: the round-1 form of this
    # assertion ("or failed gracefully") masked a Segment-vs-dict contract
    # break between the transcriber and the diarizer facade.
    assert res["has_speaker_diarization"]
    assert res["speaker_segments_raw"]
    assert all("speaker_id" in s for s in res["segments"])
    assert res["timing"]["diarization"] >= 0


def test_vectorized_speaker_assignment_matches_linear_scan(rng):
    """Fuzz: the numpy batch assignment == the original per-word scan."""
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_post import (
        Segment, _assign_speakers_batch, _overlap, _word_interval,
    )

    def linear(word, segs, fb=None):
        if not segs:
            return fb if fb is not None else 0
        w0, w1 = _word_interval(word)
        if w1 <= w0:
            w1 = w0 + 0.001
        mid = (w0 + w1) / 2.0
        best, bo, bd = None, 0.0, float("inf")
        for s in segs:
            ov = _overlap(w0, w1, s.start, s.end)
            if ov <= 0:
                continue
            d = abs((s.start + s.end) / 2.0 - mid)
            if ov > bo or (ov == bo and d < bd):
                best, bo, bd = s, ov, d
        if best is not None:
            return best.speaker
        prev = nxt = None
        for s in segs:
            if s.end <= mid:
                if prev is None or s.end > prev.end:
                    prev = s
            elif s.start >= mid:
                if nxt is None or s.start < nxt.start:
                    nxt = s
        if prev and nxt:
            return prev.speaker if mid - prev.end <= nxt.start - mid \
                else nxt.speaker
        if prev:
            return prev.speaker
        if nxt:
            return nxt.speaker
        return fb if fb is not None else segs[0].speaker

    for trial in range(20):
        n_seg = int(rng.integers(0, 12))
        segs = []
        for _ in range(n_seg):
            a = float(rng.uniform(0, 50))
            segs.append(Segment(a, a + float(rng.uniform(0.05, 8)),
                                int(rng.integers(0, 3))))
        words = []
        for _ in range(40):
            a = float(rng.uniform(-2, 55))
            words.append({"start": a, "end": a + float(rng.uniform(0, 1.2))})
        got = _assign_speakers_batch(words, segs, fallback_speaker=7)
        want = [linear(w, segs, 7) for w in words]
        assert got == want, f"trial {trial}"


def test_diarization_background_overlap_matches_serial(tmp_path, rng):
    """Round 4: diarization overlapped with decode (SpeakerDiarizer
    start_background consumed by process) must produce the same result as
    the serial path (diarize_overlap_decode=False)."""
    import jax

    from sherpa_vietnamese_asr_tpu.models.pyannet import (
        PyanNetConfig, init_pyannet_params,
    )
    from sherpa_vietnamese_asr_tpu.models.registry import (
        TINY_ZIPFORMER, random_asr_model,
    )
    from sherpa_vietnamese_asr_tpu.models.resnet_speaker import TINY_RESNET
    from sherpa_vietnamese_asr_tpu.pipeline.diarization import SpeakerDiarizer
    from sherpa_vietnamese_asr_tpu.pipeline.transcriber import (
        TranscriberPipeline,
    )
    from sherpa_vietnamese_asr_tpu.utils.audio_io import write_wav

    sr = 16000
    t = np.arange(sr * 12) / sr
    x = (0.3 * np.sin(2 * np.pi * 250 * t)
         * (0.5 + 0.5 * np.sin(2 * np.pi * 2.5 * t))).astype(np.float32)
    x += 0.02 * rng.standard_normal(len(x)).astype(np.float32)
    path = tmp_path / "diar_bg.wav"
    write_wav(str(path), x, sr)

    model = random_asr_model(vocab_size=60, zip_cfg=TINY_ZIPFORMER,
                             beam_size=2)
    seg_cfg = PyanNetConfig(sinc_filters=16, conv_channels=12,
                            lstm_hidden=16, lstm_layers=1, linear_dim=16)
    bk = dict(seg_params=init_pyannet_params(jax.random.PRNGKey(3), seg_cfg),
              seg_cfg=seg_cfg, emb_cfg=TINY_RESNET,
              segmentation_batch_size=4, embedding_batch_size=4)

    def vad(a):
        return np.ones(len(a) // 512, np.float32)

    def run(overlap):
        diar = SpeakerDiarizer(backend_kwargs=bk)
        return TranscriberPipeline(
            str(path), model,
            config={"speaker_diarization": True, "max_batch": 2,
                    "diarize_overlap_decode": overlap},
            vad_prob_fn=vad, diarizer=diar).run()

    res_bg = run(True)
    res_serial = run(False)
    assert res_bg["has_speaker_diarization"]
    assert res_bg["speaker_segments_raw"] == res_serial["speaker_segments_raw"]
    assert [s["text"] for s in res_bg["segments"]] \
        == [s["text"] for s in res_serial["segments"]]
    assert [s.get("speaker_id") for s in res_bg["segments"]] \
        == [s.get("speaker_id") for s in res_serial["segments"]]

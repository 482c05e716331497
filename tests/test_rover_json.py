# ROVER merge and .asr.json serialization behavior.
import numpy as np


def _w(text, start, conf=0.8, prob=0.9):
    return {"text": text, "start": start, "end": start + 0.2,
            "prob": prob, "margin_min": conf, "tsallis_max": 0.0}


def test_rover_equal_keeps_a():
    from sherpa_vietnamese_asr_tpu.pipeline.rover import rover_merge_words
    a = [_w("xin", 0.0), _w("chao", 0.3)]
    b = [_w("xin", 0.0), _w("chao", 0.3)]
    merged, disagree = rover_merge_words(a, b)
    assert [w["text"] for w in merged] == ["xin", "chao"]
    assert disagree == set()


def test_rover_replace_prefers_higher_confidence():
    from sherpa_vietnamese_asr_tpu.pipeline.rover import rover_merge_words
    a = [_w("xin", 0.0), _w("chao", 0.3, conf=0.2)]
    b = [_w("xin", 0.0), _w("chau", 0.3, conf=0.9)]
    merged, disagree = rover_merge_words(a, b)
    assert [w["text"] for w in merged] == ["xin", "chau"]
    assert disagree == {1}
    # Flip confidences -> keep A
    a2 = [_w("xin", 0.0), _w("chao", 0.3, conf=0.9)]
    b2 = [_w("xin", 0.0), _w("chau", 0.3, conf=0.2)]
    merged2, _ = rover_merge_words(a2, b2)
    assert [w["text"] for w in merged2] == ["xin", "chao"]


def test_rover_insert_supplement_threshold():
    from sherpa_vietnamese_asr_tpu.pipeline.rover import rover_merge_words
    a = [_w("mot", 0.0), _w("ba", 0.6)]
    b = [_w("mot", 0.0), _w("hai", 0.3, conf=0.5), _w("ba", 0.6)]
    merged, disagree = rover_merge_words(a, b)
    assert [w["text"] for w in merged] == ["mot", "hai", "ba"]
    # low-confidence supplement dropped
    b2 = [_w("mot", 0.0), _w("hai", 0.3, conf=0.1), _w("ba", 0.6)]
    merged2, _ = rover_merge_words(a, b2)
    assert [w["text"] for w in merged2] == ["mot", "ba"]


def test_rover_hotword_bonus_tiebreak():
    from sherpa_vietnamese_asr_tpu.pipeline.rover import rover_merge_words
    # A slightly more confident, but B matches a hotword phrase -> B wins.
    a = [_w("ban", 0.0), _w("to", 0.3, conf=0.55), _w("chuc", 0.6, conf=0.55)]
    b = [_w("ban", 0.0), _w("tổ", 0.3, conf=0.5), _w("chức", 0.6, conf=0.5)]
    merged, _ = rover_merge_words(a, b, hotword_phrases=["ban tổ chức"])
    assert [w["text"] for w in merged] == ["ban", "tổ", "chức"]


def test_rover_delete_keeps_a():
    from sherpa_vietnamese_asr_tpu.pipeline.rover import rover_merge_words
    a = [_w("mot", 0.0), _w("hai", 0.3), _w("ba", 0.6)]
    b = [_w("mot", 0.0), _w("ba", 0.6)]
    merged, _ = rover_merge_words(a, b)
    assert [w["text"] for w in merged] == ["mot", "hai", "ba"]


def test_rebuild_disagree_indices():
    from sherpa_vietnamese_asr_tpu.pipeline.rover import (
        rebuild_disagree_indices,
    )
    words = [_w("a", 0.0), {**_w("b", 0.3), "_disagree": True}, _w("c", 0.6)]
    idx = rebuild_disagree_indices(words)
    assert idx == {1}
    assert "_disagree" not in words[1]
    assert rebuild_disagree_indices([_w("a", 0.0)]) is None


def test_asr_json_roundtrip(tmp_path):
    from sherpa_vietnamese_asr_tpu.pipeline.asr_json import (
        deserialize_overlap_segments, deserialize_segments, load_asr_json,
        save_asr_json, serialize_segments,
    )
    segments = [
        {"text": "xin chào", "start": 0.0, "end": 1.5, "speaker": "Người nói 1",
         "speaker_id": 0,
         "raw_words": [
             {"text": "xin", "start": 0.0, "end": 0.5},
             {"text": "chào", "start": 0.6, "end": 1.0,
              "_suspect_level": "warning", "gap_after_ms": 300}]},
        {"text": "tạm biệt", "start": 2.0, "end": 3.0,
         "speaker": "Người nói 2", "speaker_id": 1},
    ]
    overlaps = [{"speaker_id": 1, "start": 1.0, "end": 2.0, "text": "dạ",
                 "raw_words": [{"text": "dạ", "start": 1.0, "end": 1.2}]}]
    data = serialize_segments(segments, speaker_name_mapping={"1": "Alice"},
                              model_name="zipformer-30m", duration_sec=3.0,
                              overlap_segments=overlaps)
    assert data["version"] == 1
    kinds = [s["type"] for s in data["segments"]]
    assert kinds == ["speaker", "text", "speaker", "text"]
    # suspect flag + gap annotation serialized
    rw = data["segments"][1]["raw_words"]
    assert rw[1]["suspect"] == "warning" and rw[1]["gap_after_ms"] == 300
    # speaker rename applied
    assert data["segments"][2]["speaker"] == "Alice"

    p = tmp_path / "x.asr.json"
    save_asr_json(str(p), data)
    loaded = load_asr_json(str(p))
    segs, mapping, colors, has_spk = deserialize_segments(loaded)
    assert has_spk and len(segs) == 2
    assert segs[0]["speaker"] == "Người nói 1"
    assert segs[1]["speaker"] == "Alice" and segs[1]["speaker_id"] == 1
    ovs = deserialize_overlap_segments(loaded)
    assert len(ovs) == 1 and ovs[0]["overlap"] is True
    assert ovs[0]["speaker"] == "Alice"


def test_rover_pipeline_end_to_end(tmp_path, rng):
    """Two tiny models through the full pipeline in ROVER mode."""
    from sherpa_vietnamese_asr_tpu.models.registry import (
        TINY_ZIPFORMER, random_asr_model,
    )
    from sherpa_vietnamese_asr_tpu.pipeline.transcriber import (
        TranscriberPipeline,
    )
    from sherpa_vietnamese_asr_tpu.utils.audio_io import write_wav

    sr = 16000
    t = np.arange(sr * 3) / sr
    x = (0.3 * np.sin(2 * np.pi * 260 * t)
         * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t))).astype(np.float32)
    path = tmp_path / "rover.wav"
    write_wav(str(path), x, sr)

    model_a = random_asr_model(vocab_size=60, zip_cfg=TINY_ZIPFORMER,
                               seed=0, beam_size=2)
    model_b = random_asr_model(vocab_size=60, zip_cfg=TINY_ZIPFORMER,
                               seed=1, beam_size=2)

    def vad_prob_fn(a):
        n = len(a) // 512
        return np.ones(n, np.float32)

    res = TranscriberPipeline(str(path), (model_a, model_b),
                              config={"max_batch": 2},
                              vad_prob_fn=vad_prob_fn).run()
    assert res is not None
    assert res["text"]  # merged output nonempty with random weights
    # capitalize() applied (reference asr_engine.py:2580)
    assert res["text"][0].upper() == res["text"][0]

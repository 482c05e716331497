# Batch autotune + HBM-aware sizing (reference core/calibration.py:968
# _tune_gpu_batch and core/hardware_accel.py:639-678 auto_batch_size,
# retargeted to TPU HBM).
import pytest
import json

import numpy as np

from sherpa_vietnamese_asr_tpu.pipeline.calibration import (
    auto_batch_size, autotune_max_batch, resolve_max_batch,
)


def test_auto_batch_size_tiers():
    # No budget info -> default untouched.
    assert auto_batch_size("decode", 8, budget_mb=None) == 8
    # Big-HBM TPU ups the generic decode batch; tiny budget caps it.
    assert auto_batch_size("decode", 8, budget_mb=12000) == 64
    assert auto_batch_size("decode", 8, budget_mb=4000) == 32
    assert auto_batch_size("decode", 32, budget_mb=1000) == 16
    # Stage-specific tiers mirror the reference's tables.
    assert auto_batch_size("embedding", 8, budget_mb=12000) == 32
    assert auto_batch_size("embedding", 8, budget_mb=1000) == 8
    assert auto_batch_size("vibert", 8, budget_mb=3000) == 16
    assert auto_batch_size("campp", 8, budget_mb=8000) == 96
    assert auto_batch_size("speaker", 8, budget_mb=1000) == 32


def test_resolve_max_batch_explicit_and_auto(tmp_path):
    # Explicit value always wins; absent key keeps the historical default.
    assert resolve_max_batch({"max_batch": 4}) == 4
    assert resolve_max_batch({}) == 8
    # max_batch=0 consumes the calibrate --autotune recommendation.
    report = tmp_path / "calib.json"
    report.write_text(json.dumps({"recommended": {"max_batch": 24}}))
    assert resolve_max_batch(
        {"max_batch": 0, "calibration_report": str(report)}) == 24
    # Missing/corrupt report falls back to the HBM heuristic (CPU -> default).
    assert resolve_max_batch(
        {"max_batch": 0, "calibration_report": str(tmp_path / "nope.json")}
    ) == 8
    (tmp_path / "bad.json").write_text("{not json")
    assert resolve_max_batch(
        {"max_batch": 0, "calibration_report": str(tmp_path / "bad.json")}
    ) == 8


def test_autotune_probes_and_picks_best():
    from sherpa_vietnamese_asr_tpu.models.registry import (
        TINY_ZIPFORMER, random_asr_model,
    )

    model = random_asr_model(vocab_size=64, zip_cfg=TINY_ZIPFORMER)
    out = autotune_max_batch(model=model, candidates=(1, 2), chunk_sec=1.0)
    assert [a["batch"] for a in out["attempts"]] == [1, 2]
    ok = [a for a in out["attempts"] if a["ok"]]
    assert ok, out
    assert out["best_batch"] == min(
        ok, key=lambda a: a["sec_per_item"])["batch"]
    for a in ok:
        assert a["sec_per_item"] > 0
        assert np.isclose(a["items_per_sec"], a["batch"] / a["elapsed_sec"],
                          rtol=0.01)


def test_autotune_records_failures():
    # A candidate that explodes (absurd batch on a tiny host) must be
    # recorded as ok=False without aborting the sweep. Simulate by passing a
    # model whose decode raises for one batch via monkeypatched probe size:
    # batch 0 is invalid and raises inside jnp reshape/jit.
    from sherpa_vietnamese_asr_tpu.models.registry import (
        TINY_ZIPFORMER, random_asr_model,
    )

    model = random_asr_model(vocab_size=64, zip_cfg=TINY_ZIPFORMER)
    out = autotune_max_batch(model=model, candidates=(-1, 1), chunk_sec=1.0)
    by_batch = {a["batch"]: a for a in out["attempts"]}
    assert by_batch[-1]["ok"] is False and "error" in by_batch[-1]
    assert by_batch[1]["ok"] is True
    assert out["best_batch"] == 1


def test_compare_pipeline_runs_gates():
    """Port of reference _compare_runs gates (core/calibration.py:1479-1523):
    parity needs text chars within max(20, 0.2%), identical speaker
    counts/turns, confidence within tol; acceptance also needs >=1.05x."""
    from sherpa_vietnamese_asr_tpu.pipeline.calibration import (
        compare_pipeline_runs,
    )

    cpu = {"elapsed_sec": 10.0, "duration_sec": 60.0, "text_chars": 1000,
           "speaker_count": 2, "speaker_turns": 9, "asr_confidence": 0.51,
           "timing": {"transcription": 8.0, "diarization": 2.0}}
    acc = {"elapsed_sec": 2.0, "duration_sec": 60.0, "text_chars": 1005,
           "speaker_count": 2, "speaker_turns": 9, "asr_confidence": 0.51,
           "timing": {"transcription": 1.5, "diarization": 0.5}}
    cmp1 = compare_pipeline_runs(cpu, acc)
    assert cmp1["parity_ok"] and cmp1["accepted"]
    assert cmp1["wall_speedup"] == 5.0
    assert cmp1["stage_speedups"]["diarization"] == 4.0
    # text outside tolerance -> rejected
    cmp2 = compare_pipeline_runs(cpu, {**acc, "text_chars": 1100})
    assert not cmp2["text_tolerance_ok"] and not cmp2["accepted"]
    # speaker count drift -> rejected
    cmp3 = compare_pipeline_runs(cpu, {**acc, "speaker_count": 3})
    assert not cmp3["parity_ok"]
    # confidence drift beyond tol -> rejected; widened tol accepts
    cmp4 = compare_pipeline_runs(cpu, {**acc, "asr_confidence": 0.512})
    assert not cmp4["parity_ok"]
    cmp5 = compare_pipeline_runs(cpu, {**acc, "asr_confidence": 0.512},
                                 confidence_tol=5e-3)
    assert cmp5["parity_ok"]


@pytest.mark.slow
def test_full_pipeline_calibration_cpu_vs_cpu(tmp_path):
    """End-to-end run_full_pipeline_calibration on a short sample with a
    tiny model: the accelerator pass (here: the test process's CPU backend)
    and the subprocess CPU pass must produce parity-identical outputs."""
    from sherpa_vietnamese_asr_tpu.pipeline.calibration import (
        make_calibration_wav, run_full_pipeline_calibration,
    )

    wav = make_calibration_wav(str(tmp_path / "cal.wav"), minutes=0.2)
    rep = run_full_pipeline_calibration(
        wav_path=wav,
        model_spec={"tiny": True, "vocab_size": 80, "seed": 0},
        config={"speaker_diarization": False, "restore_punctuation": False,
                "quality_analysis": False},
        cpu_timeout_sec=560)
    assert set(rep) == {"cpu_run", "accel_run", "compare"}
    for run in (rep["cpu_run"], rep["accel_run"]):
        assert run["duration_sec"] == 12.0
        assert run["text_chars"] > 0
    # same backend both sides in the test env: outputs must be identical
    assert rep["compare"]["text_chars_delta"] == 0
    assert rep["compare"]["parity_ok"] is True
    assert rep["compare"]["confidence_delta"] == 0.0

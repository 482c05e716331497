# Program warmup: compile the hot jitted programs once so later runs hit
# the persistent compilation cache (utils/jax_setup.py) instead of paying
# minutes of one-time XLA compiles.
#
# Two consumers:
#   * `svt serve --warmup` — compile before accepting requests (first-request
#     latency drops from minutes to milliseconds).
#   * `svt warmup` — one-shot post-install cache priming: a cold CLI user's
#     first real transcription then runs at steady-state speed. The reference
#     has no equivalent because ORT sessions load in seconds; on a compiled
#     TPU stack the cache-priming step IS the install-time analogue of the
#     reference's model-download step (build-portable/prepare_offline_build.py).
#
# Every stage is independent and failure-isolated: a missing optional asset
# skips that stage with a message instead of aborting the others.

from __future__ import annotations

import time

import numpy as np

STAGES = ("decode", "vad", "streaming", "diarization", "punctuation",
          "quality", "senko")


def warmup_programs(model, models_dir=None, stages=STAGES, log=print,
                    streamer=None, jobs=4):
    """Compile the flagship programs. Returns {stage: seconds | None}.

    jobs > 1 runs the independent stages on a thread pool: the backend's
    compile service accepts concurrent requests, so a cleared-cache warmup
    drops from ~350 s to ~170 s at jobs=4 (measured; the critical path is
    the punctuation shape set). JAX tracing/compiling is thread-safe and
    the model pytree is read-only."""
    timings = {}
    pending = []

    def stage(name, fn):
        if name not in stages:
            return

        def run():
            t0 = time.time()
            try:
                fn()
                timings[name] = time.time() - t0
                log(f"[warmup] {name}: {timings[name]:.0f}s")
            except Exception as e:  # stage-isolated by design
                timings[name] = None
                log(f"[warmup] {name} skipped ({e})")

        if jobs > 1:
            pending.append(run)
        else:
            run()

    def _decode():
        from sherpa_vietnamese_asr_tpu.pipeline.calibration import (
            resolve_max_batch,
        )
        from sherpa_vietnamese_asr_tpu.pipeline.decoder import (
            BatchedChunkDecoder,
        )

        warm_batch = resolve_max_batch({})
        log(f"[warmup] decode batch {warm_batch}")
        dec = BatchedChunkDecoder(model, max_batch=warm_batch)
        dummy = np.zeros(16000 * 34, np.float32)
        dec.decode_spans(dummy, [(0, 16000 * 30)])

    def _streaming():
        if streamer is not None:
            s = streamer
        else:
            from sherpa_vietnamese_asr_tpu.pipeline.streaming_online import (
                MultiStreamRecognizer,
            )

            s = MultiStreamRecognizer(model)
        slot = s.open_stream()
        s.accept_waveform(slot, np.zeros(16000 * 2, np.float32))
        while s.ready_slots():
            s.step()
        s.close_stream(slot)

    def _diarization():
        from sherpa_vietnamese_asr_tpu.pipeline.diarization_pure import (
            PureDiarizer,
        )

        PureDiarizer().process(_warm_audio(70))

    def _punctuation():
        from sherpa_vietnamese_asr_tpu.pipeline.punctuation import (
            build_punctuation_restorer,
        )

        r = build_punctuation_restorer(model_dir=models_dir)
        # Every minibatch shape the GEC padder can produce, then one real
        # multi-chunk restore for the host-side path.
        r.gec_model.warm_shapes()
        r.restore(" ".join("xin chao cac ban hom nay troi dep qua"
                           .split() * 40))

    def _vad():
        # Same blocked-VAD program the transcriber's default prob_fn uses
        # (one fixed-block shape for any audio length).
        import jax

        from sherpa_vietnamese_asr_tpu.models import assets, silero_vad

        loaded = assets.load_silero()
        if loaded is not None:
            params, cfg = loaded
        else:
            cfg = silero_vad.SileroVadConfig()
            params = silero_vad.init_silero_params(jax.random.PRNGKey(0),
                                                   cfg)
        silero_vad.silero_vad_probs_streamed(params, _warm_audio(61), cfg=cfg)

    def _quality():
        from sherpa_vietnamese_asr_tpu.pipeline.quality import (
            QualityAnalyzer,
        )

        QualityAnalyzer().analyze_speech(_warm_audio(12))

    def _senko():
        from sherpa_vietnamese_asr_tpu.pipeline.diarization_senko import (
            SenkoCamppDiarizer,
        )

        SenkoCamppDiarizer().process(_warm_audio(70))

    stage("decode", _decode)
    stage("vad", _vad)
    stage("streaming", _streaming)
    stage("diarization", _diarization)
    stage("punctuation", _punctuation)
    stage("quality", _quality)
    stage("senko", _senko)
    if pending:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=jobs) as ex:
            futures = [ex.submit(fn) for fn in pending]
            for f in futures:
                f.result()
    # Warmup is the install-time priming step: wait for the AOT executable
    # stores that normal (one-shot) runs intentionally leave in background
    # daemon threads (utils/aot_cache.py _store_async).
    from sherpa_vietnamese_asr_tpu.utils import aot_cache
    t0 = time.time()
    aot_cache.flush()
    dt = time.time() - t0
    if dt > 1.0:
        log(f"[warmup] aot-store flush: {dt:.0f}s")
    return timings


def _warm_audio(seconds):
    n = 16000 * seconds
    audio = np.zeros(n + 16000 * 5, np.float32)
    audio[:n] = 0.05 * np.sin(2 * np.pi * 300 * np.arange(n) / 16000.0)
    return audio

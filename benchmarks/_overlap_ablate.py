# Ablation: which stage-overlap combination is fastest end-to-end on the
# real chip? (round-5: the full-pipeline number regressed 92x -> 36x after
# the DNSMOS-overlap commit; decode-only RTFx is unchanged, so the suspect
# is device contention between the background stage threads and decode.)
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("SVT_AOT_STORE", "off")


def main(minutes=10.0):
    import sherpa_vietnamese_asr_tpu as svt
    from sherpa_vietnamese_asr_tpu.pipeline.diarization import SpeakerDiarizer
    from sherpa_vietnamese_asr_tpu.pipeline.punctuation import (
        build_punctuation_restorer,
    )
    from sherpa_vietnamese_asr_tpu.pipeline.quality import QualityAnalyzer
    from sherpa_vietnamese_asr_tpu.utils.audio_io import write_wav

    sr = 16000
    dur = int(minutes * 60)
    t = np.arange(sr * dur) / sr
    x = np.zeros(sr * dur, np.float32)
    for k in range(dur // 6):
        f0 = 180.0 if k % 2 == 0 else 320.0
        am = 2.1 if k % 2 == 0 else 3.3
        s, e = k * 6 * sr, (k * 6 + 5) * sr
        tt = t[s:e]
        x[s:e] = (0.3 * np.sin(2 * np.pi * f0 * tt)
                  * (0.5 + 0.5 * np.sin(2 * np.pi * am * tt)))
    x += 0.01 * np.random.default_rng(0).standard_normal(len(x)).astype(
        np.float32)
    path = "/tmp/svt_ablate_full.wav"
    write_wav(path, x, sr)

    model = svt.random_asr_model(vocab_size=2000, beam_size=8)
    stages = dict(diarizer=SpeakerDiarizer(),
                  punct_restorer=build_punctuation_restorer(),
                  quality_analyzer=QualityAnalyzer())
    base = {"speaker_diarization": True, "restore_punctuation": True,
            "quality_analysis": True}

    variants = [
        ("overlap_both", {}),
        ("overlap_diar_only", {"quality_overlap_decode": False}),
        ("overlap_quality_only", {"diarize_overlap_decode": False}),
        ("serial", {"diarize_overlap_decode": False,
                    "quality_overlap_decode": False}),
    ]
    # warm every program once
    svt.TranscriberPipeline(path, model, config=base, **stages).run()
    for name, extra in variants:
        cfg = dict(base, **extra)
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            res = svt.TranscriberPipeline(path, model, config=cfg,
                                          **stages).run()
            walls.append(time.perf_counter() - t0)
        tim = {k: round(v, 2) for k, v in res["timing"].items()
               if isinstance(v, (int, float)) and v >= 0.01}
        best = min(walls)
        print(f"[{name}] wall={best:.2f}s rtfx={dur / best:.0f} {tim}",
              flush=True)


if __name__ == "__main__":
    main(minutes=float(sys.argv[1]) if len(sys.argv) > 1 else 10.0)

# Stage profile of the full 10-min pipeline on the real chip (round-4
# verdict item 2: close the 92x -> >=170x gap). Reuses bench.py's
# measure_full_pipeline audio/config but prints the result-dict timing
# split and wall per run, warm, for N runs.
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("SVT_AOT_STORE", "off")


def main(minutes=10.0, runs=3):
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
    path = "/tmp/svt_profile_full.wav"
    write_wav(path, x, sr)

    model = svt.random_asr_model(vocab_size=2000, beam_size=8)
    cfg = {"speaker_diarization": True, "restore_punctuation": True,
           "quality_analysis": True}
    stages = dict(diarizer=SpeakerDiarizer(),
                  punct_restorer=build_punctuation_restorer(),
                  quality_analyzer=QualityAnalyzer())

    for i in range(runs + 1):
        t0 = time.perf_counter()
        res = svt.TranscriberPipeline(path, model, config=cfg,
                                      **stages).run()
        wall = time.perf_counter() - t0
        tim = {k: round(v, 3) for k, v in res["timing"].items()
               if isinstance(v, (int, float)) and v >= 0.005}
        tag = "warmup" if i == 0 else f"run{i}"
        print(f"[{tag}] wall={wall:.2f}s rtfx={dur / wall:.0f} {tim}",
              flush=True)


if __name__ == "__main__":
    main(minutes=float(sys.argv[1]) if len(sys.argv) > 1 else 10.0,
         runs=int(sys.argv[2]) if len(sys.argv) > 2 else 3)

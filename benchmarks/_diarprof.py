# Stage split of the 10-min pure-diarization pass on the real chip
# (round-5: where do the 3.2 s go?). Separates the fused segment+embed
# device phase from host clustering/reconstruction, and times each
# superblock dispatch wave.
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("SVT_AOT_STORE", "off")


def main(minutes=10.0, runs=3):
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_pure import (
        PureDiarizer,
    )

    sr = 16000
    dur = int(minutes * 60)
    t = np.arange(sr * dur) / sr
    x = np.zeros(sr * dur, np.float32)
    for k in range(dur // 6):
        f0 = 180.0 if k % 2 == 0 else 320.0
        s, e = k * 6 * sr, (k * 6 + 5) * sr
        x[s:e] = (0.3 * np.sin(2 * np.pi * f0 * t[s:e])
                  * (0.5 + 0.5 * np.sin(2 * np.pi * 2.5 * t[s:e])))
    x += 0.01 * np.random.default_rng(0).standard_normal(len(x)).astype(
        np.float32)

    d = PureDiarizer()
    for i in range(runs + 1):
        tag = "warmup" if i == 0 else f"run{i}"
        t0 = time.perf_counter()
        binar, starts, emb = d._segment_and_embed_fused(x)
        t_dev = time.perf_counter() - t0
        t0 = time.perf_counter()
        segs = d.process(x)
        t_all = time.perf_counter() - t0
        print(f"[{tag}] segment+embed={t_dev:.3f}s full-process={t_all:.3f}s "
              f"(host tail ~{t_all - t_dev:.3f}s) windows={binar.shape[0]} "
              f"segs={len(segs)}", flush=True)


if __name__ == "__main__":
    main(minutes=float(sys.argv[1]) if len(sys.argv) > 1 else 10.0,
         runs=int(sys.argv[2]) if len(sys.argv) > 2 else 3)

# Steady-state full-pipeline benchmark (round 4): 10-min two-speaker audio
# through ASR + pure diarization (overlapped with decode) + punctuation +
# DNSMOS, run twice IN-PROCESS; the second run is the server-mode steady
# state PERFORMANCE.md's full-pipeline table reports.
# Usage: python benchmarks/_e2ebench.py [minutes] [--no-overlap]
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np

minutes = int(sys.argv[1]) if len(sys.argv) > 1 else 10
overlap = "--no-overlap" not in sys.argv

import sherpa_vietnamese_asr_tpu as svt  # noqa: E402
from sherpa_vietnamese_asr_tpu.utils.audio_io import write_wav  # noqa: E402

sr = 16000
dur = 60 * minutes
t = np.arange(sr * dur) / sr
x = np.zeros(sr * dur, np.float32)
for k in range(dur // 6):
    f0 = 180.0 if k % 2 == 0 else 320.0
    am = 2.1 if k % 2 == 0 else 3.3
    s, e = k * 6 * sr, (k * 6 + 5) * sr
    tt = t[s:e]
    x[s:e] = (0.3 * np.sin(2 * np.pi * f0 * tt)
              * (0.5 + 0.5 * np.sin(2 * np.pi * am * tt))).astype(np.float32)
x += 0.01 * np.random.default_rng(0).standard_normal(x.shape).astype(np.float32)
write_wav("/tmp/e2e10.wav", x, sr)

model = svt.random_asr_model(vocab_size=2000, beam_size=8)
cfg = {"speaker_diarization": True, "restore_punctuation": True,
       "quality_analysis": True, "diarize_overlap_decode": overlap}

for run in (1, 2):
    t0 = time.time()
    res = svt.TranscriberPipeline("/tmp/e2e10.wav", model, config=cfg).run()
    dt = time.time() - t0
    print(f"run{run}: {dt:.2f}s  rtfx={dur / dt:.0f}x  overlap={overlap}")
    print("  timing:", {k: round(v, 2) for k, v in res["timing"].items()})

# One-shot cold-start measurement, fresh process per run.
# Usage: python _coldrun.py pure10   (10-min two-speaker WAV -> full
#                                     pipeline: ASR + pure diarization +
#                                     punctuation + quality)
#        python _coldrun.py senko2   (2-min WAV -> Senko CAM++ diarizer)
import os as _os, sys as _sys  # repo root on sys.path (scripts live in benchmarks/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "pure10"
t_start = time.time()
import sherpa_vietnamese_asr_tpu as svt  # noqa: E402
from sherpa_vietnamese_asr_tpu.utils.audio_io import write_wav  # noqa: E402

sr = 16000
dur = 600 if mode == "pure10" else 120
t = np.arange(sr * dur) / sr
# alternating 6 s "speakers": different f0 + AM rates, gaps between turns
x = np.zeros(sr * dur, np.float32)
for k in range(dur // 6):
    f0 = 180.0 if k % 2 == 0 else 320.0
    am = 2.1 if k % 2 == 0 else 3.3
    s, e = k * 6 * sr, (k * 6 + 5) * sr
    tt = t[s:e]
    x[s:e] = (0.3 * np.sin(2 * np.pi * f0 * tt)
              * (0.5 + 0.5 * np.sin(2 * np.pi * am * tt))).astype(np.float32)
x += 0.01 * np.random.default_rng(0).standard_normal(x.shape).astype(np.float32)

if mode == "senko2":
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_senko import (
        SenkoCamppDiarizer,
    )

    t0 = time.time()
    segs = SenkoCamppDiarizer().process(x)
    dt = time.time() - t0
    print(f"import: {t0 - t_start:.1f}s  senko 2-min: {dt:.1f}s  "
          f"({len(segs)} segments)")
    sys.exit(0)

write_wav("/tmp/cold10.wav", x, sr)
model = svt.random_asr_model(vocab_size=2000, beam_size=8)
cfg = {"speaker_diarization": True, "restore_punctuation": True,
       "quality_analysis": True}
t0 = time.time()
res = svt.TranscriberPipeline("/tmp/cold10.wav", model, config=cfg).run()
dt = time.time() - t0
print(f"import+model: {t0 - t_start:.1f}s  pipeline: {dt:.1f}s  "
      f"rtfx: {dur / dt:.0f}x")
print("timing:", {k: round(v, 2) for k, v in res["timing"].items()})

# Scratch: single-stream live-mic step time (pipelined decode).
#   python _micbench.py          paced: chunks arrive every 0.64 s like a
#                                real mic; measures the host-blocking time
#                                of each decode() call (the capture gap is
#                                where the one-deep in-flight step overlaps)
#   python _micbench.py tput     back-to-back: no capture gap, measures
#                                sustained per-step throughput instead
import os as _os, sys as _sys  # repo root on sys.path (scripts live in benchmarks/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np

from sherpa_vietnamese_asr_tpu.models.registry import random_asr_model
from sherpa_vietnamese_asr_tpu.pipeline.streaming_online import (
    CachedStreamingRecognizer,
)

paced = len(sys.argv) < 2 or sys.argv[1] != "tput"
background = "bg" in sys.argv[1:]
model = random_asr_model(vocab_size=2000, beam_size=8,
                         compute_dtype="bfloat16")
rec = CachedStreamingRecognizer(model, background=background)
sr = 16000
rng = np.random.default_rng(0)
t = np.arange(sr * 30) / sr
audio = (0.3 * np.sin(2 * np.pi * 280 * t)
         * (0.5 + 0.5 * np.sin(2 * np.pi * 2.0 * t))
         + 0.02 * rng.standard_normal(sr * 30)).astype(np.float32)

chunk = int(0.64 * sr)

# Warm the program (compile) outside the paced loop so pacing measures
# steady state only (needs 2 chunks before 64 frames are computable).
rec.accept_waveform(audio[: 2 * chunk])
t0 = time.perf_counter()
while rec.is_ready():
    rec.decode()
rec.get_result()
print(f"first(compile): {time.perf_counter() - t0:.1f}s", flush=True)
rec.reset()

steps = []
t_all0 = time.perf_counter()
for i, off in enumerate(range(0, len(audio), chunk)):
    if paced:
        target = t_all0 + (off + chunk) / sr  # when this chunk's capture ends
        now = time.perf_counter()
        if target > now:
            time.sleep(target - now)
    rec.accept_waveform(audio[off: off + chunk])
    while rec.is_ready():
        t0 = time.perf_counter()
        rec.decode()
        steps.append(time.perf_counter() - t0)
t0 = time.perf_counter()
rec.get_result()
final_drain = time.perf_counter() - t0
if background:
    rec.close()
steady = sorted(steps[3:])
n = len(steady)
mode = ("paced" if paced else "back-to-back") + (" bg" if background else "")
print(f"{mode} steady decode(): median {steady[n//2]*1e3:.1f} ms, "
      f"p90 {steady[int(n*0.9)]*1e3:.1f} ms over {n} steps; "
      f"final drain {final_drain*1e3:.0f} ms "
      f"(chunk 640 ms => {0.64/max(steady[n//2],1e-9):.1f}x realtime headroom)")

# Scratch: single-stream live-mic steady step time (pipelined decode).
# Simulates real-time capture: audio arrives in 0.64 s chunks; measures the
# host-blocking time of each decode() call (the capture gap between chunks
# is where the in-flight step overlaps).
import time

import numpy as np

from sherpa_vietnamese_asr_tpu.models.registry import random_asr_model
from sherpa_vietnamese_asr_tpu.pipeline.streaming_online import (
    CachedStreamingRecognizer,
)

model = random_asr_model(vocab_size=2000, beam_size=8,
                         compute_dtype="bfloat16")
rec = CachedStreamingRecognizer(model)
sr = 16000
rng = np.random.default_rng(0)
t = np.arange(sr * 30) / sr
audio = (0.3 * np.sin(2 * np.pi * 280 * t)
         * (0.5 + 0.5 * np.sin(2 * np.pi * 2.0 * t))
         + 0.02 * rng.standard_normal(sr * 30)).astype(np.float32)

chunk = int(0.64 * sr)
steps = []
t_all0 = time.time()
for off in range(0, len(audio), chunk):
    rec.accept_waveform(audio[off: off + chunk])
    while rec.is_ready():
        t0 = time.perf_counter()
        rec.decode()
        steps.append(time.perf_counter() - t0)
print(f"first(compile): {steps[0]:.1f}s; total {time.time()-t_all0:.0f}s")
steady = sorted(steps[3:])
n = len(steady)
print(f"steady decode(): median {steady[n//2]*1e3:.1f} ms, "
      f"p90 {steady[int(n*0.9)]*1e3:.1f} ms over {n} steps "
      f"(chunk 640 ms => {0.64/steady[n//2]:.1f}x realtime headroom)")
rec.get_result()

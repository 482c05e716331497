# AOT executable cache probe (round 4): measures what a FRESH PROCESS pays
# before the first decode result with (a) plain jit + persistent compile
# cache vs (b) the AOT executable cache (utils/aot_cache.py), and checks
# token parity between the two paths.
#
# Usage (each mode is a fresh process; run in order):
#   python benchmarks/_aotprobe.py jit     # baseline: trace+lower+cache-load
#   python benchmarks/_aotprobe.py prime   # populate the AOT cache
#   python benchmarks/_aotprobe.py aot     # AOT disk hit: load-only
# Prints per-phase wall seconds; jit/aot modes save/compare token arrays.
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "jit"
if mode == "jit":
    _os.environ["SVT_DISABLE_AOT_CACHE"] = "1"

t_imp = time.time()
from sherpa_vietnamese_asr_tpu.models.registry import random_asr_model  # noqa: E402
from sherpa_vietnamese_asr_tpu.pipeline.decoder import (  # noqa: E402
    BatchedChunkDecoder,
)
from sherpa_vietnamese_asr_tpu.utils import aot_cache  # noqa: E402

t0 = time.time()
model = random_asr_model(vocab_size=2000, beam_size=8)
t_model = time.time()

B = 8
sr = 16000
rng = np.random.default_rng(0)
audio = (0.1 * rng.standard_normal(sr * (30 * B + 4))).astype(np.float32)
spans = [(i * 30 * sr, (i * 30 + 31) * sr) for i in range(B)]
dec = BatchedChunkDecoder(model, max_batch=B)
t1 = time.time()
words = dec.decode_spans(audio, spans)
t2 = time.time()

print(f"mode={mode} import={t0 - t_imp:.1f}s model={t_model - t0:.1f}s "
      f"first_decode={t2 - t1:.1f}s stats={aot_cache.stats()}")

import json  # noqa: E402

toks = [[w["text"] for w in ws] for ws in words]
ref_path = "/tmp/aotprobe_tokens.json"
if mode == "jit":
    with open(ref_path, "w") as f:
        json.dump(toks, f)
elif mode == "aot" and _os.path.exists(ref_path):
    with open(ref_path) as f:
        ref = json.load(f)
    print("token parity vs jit run:", ref == toks)

# Superblock: the most expensive program to trace (~15 s/process).
from sherpa_vietnamese_asr_tpu.pipeline.diarization_pure import (  # noqa: E402
    PureDiarizer,
)

t3 = time.time()
PureDiarizer().process(audio[: sr * 70])
t4 = time.time()
print(f"diar_70s_first={t4 - t3:.1f}s stats={aot_cache.stats()}")

if mode == "prime":
    t5 = time.time()
    aot_cache.flush()  # background stores must land before exit
    print(f"store_flush={time.time() - t5:.1f}s")

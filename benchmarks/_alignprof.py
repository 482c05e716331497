# Scratch: cProfile the host-side punctuation/alignment stages on synthetic
# 10-min transcript data (no device work: bypass the ViBERT forward).
import os as _os, sys as _sys  # repo root on sys.path (scripts live in benchmarks/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import cProfile
import pstats
import random
import sys
import time

random.seed(0)
WORDS = ["xin", "chao", "viet", "nam", "hom", "nay", "troi", "dep",
         "qua", "di", "lam", "an", "com", "nha", "truong", "hoc"]
n = 1600
all_words = []
t = 0.0
for i in range(n):
    w = random.choice(WORDS)
    dur = random.uniform(0.15, 0.4)
    all_words.append({"text": w, "start": t, "end": t + dur,
                      "prob": random.uniform(0.5, 1.0)})
    t += dur + (random.uniform(0.3, 1.2) if random.random() < 0.08
                else random.uniform(0.0, 0.12))
full_text = " ".join(w["text"] for w in all_words)
word_speaker = [i % 7 // 4 for i in range(n)]  # 2 speakers, runs of words

from sherpa_vietnamese_asr_tpu.pipeline.alignment import (
    align_sentences_with_speakers, build_pause_hints, split_sentences,
)
from sherpa_vietnamese_asr_tpu.pipeline.diarization_post import (
    smooth_speaker_boundary_fragments, speaker_name,
)
from sherpa_vietnamese_asr_tpu.pipeline.transcriber import (
    fix_overlapping_segments, split_long_segments,
)

# fake punctuated text: period every ~12 words, comma every ~5
toks = full_text.split()
out = []
for i, w in enumerate(toks):
    if i % 12 == 11:
        out.append(w + ".")
    elif i % 5 == 4:
        out.append(w + ",")
    else:
        out.append(w)
punct_text = " ".join(out)

def run():
    hints = build_pause_hints(all_words, word_speaker=word_speaker)
    sentences = split_sentences(punct_text)
    names = [speaker_name(s) for s in word_speaker]
    segs = align_sentences_with_speakers(sentences, all_words,
                                         word_speaker, names)
    segs = smooth_speaker_boundary_fragments(segs)
    segs = fix_overlapping_segments(segs)
    segs = split_long_segments(segs, max_duration=12.0,
                               preserve_raw_words=True)
    return hints, segs

t0 = time.time()
run()
print(f"one pass: {time.time() - t0:.3f}s")
pr = cProfile.Profile()
pr.enable()
for _ in range(5):
    run()
pr.disable()
pstats.Stats(pr).sort_stats("cumulative").print_stats(18)

#!/usr/bin/env python
# Generate tests/data/golden_e2e.json — the true-size end-to-end golden
# fixture (VERDICT r3 task 3). Runs the full composition
# fbank -> Zipformer-30M encoder -> RNN-T beam search -> words through BOTH
# independent stacks (numpy ONNX graph executor vs the production JAX path),
# asserts token identity, and freezes the outputs. Run on CPU:
#   JAX_PLATFORMS='' python scripts/make_golden_e2e.py
# Regenerate only deliberately: the test guards the PRNG-derived weights with
# an abs-sum checksum and fails loudly if the frozen data no longer matches.
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from sherpa_vietnamese_asr_tpu.models import golden  # noqa: E402
from sherpa_vietnamese_asr_tpu.models.onnx_export_rnnt import (  # noqa: E402
    export_asr_dir,
)
from sherpa_vietnamese_asr_tpu.utils import fbank_ref  # noqa: E402


def main():
    out_path = os.path.join(os.path.dirname(__file__), "..", "tests",
                            "data", "golden_e2e.json")
    audio = golden.golden_audio()
    t_in = fbank_ref.num_frames(len(audio), fbank_ref.ASR_FBANK)
    print(f"audio {len(audio)} samples, {t_in} fbank frames")

    t0 = time.time()
    model = golden.golden_model()
    wsum = golden.weights_abs_sum(model)
    print(f"model init {time.time()-t0:.1f}s, weights_abs_sum={wsum:.3f}")

    with tempfile.TemporaryDirectory() as d:
        t0 = time.time()
        export_asr_dir(model, d, t_in)
        print(f"export {time.time()-t0:.1f}s")
        t0 = time.time()
        tok_exec, res_exec, enc_exec, fb_exec = golden.run_exec_stack(
            model, audio, d)
        print(f"exec stack {time.time()-t0:.1f}s: {len(tok_exec)} tokens")

    t0 = time.time()
    tok_jax, res_jax, enc_jax, fb_jax = golden.run_jax_stack(model, audio)
    print(f"jax stack {time.time()-t0:.1f}s: {len(tok_jax)} tokens")

    fb_err = float(np.abs(fb_exec - fb_jax).max())
    enc_err = float(np.abs(enc_exec - enc_jax).max())
    print(f"fbank max abs err {fb_err:.3e}; encoder max abs err {enc_err:.3e}")

    if tok_exec != tok_jax:
        n_match = sum(a == b for a, b in zip(tok_exec, tok_jax))
        print(f"TOKEN MISMATCH: {n_match} common of "
              f"{len(tok_exec)} exec / {len(tok_jax)} jax")
        print("exec:", tok_exec[:40])
        print("jax :", tok_jax[:40])
        sys.exit(1)

    words = golden.tokens_to_words(tok_jax, model.id2token)
    n = len(tok_jax)
    fx = {
        "comment": "true-size e2e golden fixture; regenerate ONLY via "
                   "scripts/make_golden_e2e.py",
        "seed": golden.GOLDEN_SEED,
        "vocab_size": golden.GOLDEN_VOCAB,
        "beam_size": golden.GOLDEN_BEAM,
        "duration_sec": golden.GOLDEN_DURATION_SEC,
        "sample_rate": golden.GOLDEN_SR,
        "t_in": t_in,
        "weights_abs_sum": wsum,
        "enc_out_shape": list(enc_jax.shape),
        "enc_out_abs_sum": float(np.abs(enc_jax).sum()),
        "fbank_max_abs_err": fb_err,
        "encoder_max_abs_err": enc_err,
        "tokens": tok_jax,
        "frames": [int(v) for v in np.asarray(res_jax.frames[0])[:n]],
        "tok_logp": [round(float(v), 4)
                     for v in np.asarray(res_jax.tok_logp[0])[:n]],
        "total_logp": round(float(res_jax.total_logp[0]), 4),
        "words": words,
    }
    with open(out_path, "w") as f:
        json.dump(fx, f, indent=1)
    print(f"wrote {out_path}: {n} tokens, {len(words)} words, "
          f"total_logp {fx['total_logp']}")


if __name__ == "__main__":
    main()

# Scratch: fp32 serving mode (matmul_precision="high") full-decode token
# parity on-chip vs the exact-f32 CPU oracle. Usage:
#   python _fp32hw.py hw          (TPU: decode, save tokens; Pallas kernels)
#   python _fp32hw.py hw_highest  (TPU: matmul_precision=highest, Pallas)
#   python _fp32hw.py hw_xla      (TPU: highest, NO Pallas kernels — isolates
#                                  matmul-emulation rounding from kernel deltas)
#   SVT_DISABLE_COMPILE_CACHE=1 python _fp32hw.py ref   (forced-CPU compare)
import os as _os, sys as _sys  # repo root on sys.path (scripts live in benchmarks/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import numpy as np

mode = sys.argv[1]
if mode == "ref":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from sherpa_vietnamese_asr_tpu.models.registry import random_asr_model
from sherpa_vietnamese_asr_tpu.pipeline.decoder import decode_batch_jit

m = random_asr_model(vocab_size=2000, beam_size=8, compute_dtype="float32")
no_pallas = mode == "hw_xla"
if mode in ("hw_highest", "hw_xla"):
    import dataclasses
    m.zip_cfg = dataclasses.replace(m.zip_cfg, matmul_precision="highest")
    mode = "hw"
rng = np.random.default_rng(7)
b, sec = 8, 10.0
n = int(sec * 16000)
t = np.arange(n) / 16000.0
audio = np.stack([
    (0.25 * np.sin(2 * np.pi * (180 + 40 * i) * t)
     * (0.5 + 0.5 * np.sin(2 * np.pi * (1.5 + 0.3 * i) * t))
     + 0.03 * rng.standard_normal(n)).astype(np.float32)
    for i in range(b)
])
lens = np.asarray([n, n // 2, n // 3, n, n - 160, n // 4, n, n // 5],
                  np.int32)

use_pallas = mode == "hw" and not no_pallas
r, enc_lens = decode_batch_jit(
    jnp.asarray(audio), jnp.asarray(lens),
    m.enc_params, m.dec_params, m.joi_params, m.zip_cfg, m.rnnt_cfg,
    m.beam_size, use_pallas_fbank=use_pallas, use_pallas_beam=use_pallas)
tok = np.asarray(r.tokens)
nt = np.asarray(r.num_tokens)

if mode == "hw":
    np.savez("/tmp/fp32_hw.npz", tok=tok, n=nt)
    print("fp32-high hw saved; n_tokens:", nt.tolist())
else:
    d = np.load("/tmp/fp32_hw.npz")
    same_n = np.array_equal(d["n"], nt)
    mism = 0
    for i in range(b):
        k = min(int(d["n"][i]), int(nt[i]))
        mism += int((d["tok"][i][:k] != tok[i][:k]).sum())
    print(f"fp32-high decode parity: n_equal={same_n} "
          f"n_hw={d['n'].tolist()} n_ref={nt.tolist()} tok_mismatch={mism}")
    if same_n and mism == 0:
        print("fp32-high token parity: OK")
    else:
        print("fp32-high token parity: DIVERGED")

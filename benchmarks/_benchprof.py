# Scratch: bench-path stage profile at serving batch (amortized fori_loop
# methodology, scalar outputs, minus the ~31 ms dispatch floor).
# Usage: python _benchprof.py [batch] [dtype]
import os as _os, sys as _sys  # repo root on sys.path (scripts live in benchmarks/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sherpa_vietnamese_asr_tpu.models.registry import random_asr_model
from sherpa_vietnamese_asr_tpu.models.zipformer import zipformer_encoder
from sherpa_vietnamese_asr_tpu.ops.beam_search_pallas import (
    beam_search_batch_pallas,
)
from sherpa_vietnamese_asr_tpu.pipeline.decoder import fbank_batch_jit

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
model = random_asr_model(vocab_size=2000, beam_size=8, compute_dtype=dtype)
sr, secs = 16000, 33
n = sr * secs
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32) * 0.1)
lens = jnp.full((B,), sr * 30, jnp.int32)
N = 20
FLOOR = 0.031


def bench(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            scaled = (a[0] * (1.0 + 1e-6 * i.astype(jnp.float32)),) + a[1:]
            return acc + fn(*scaled)
        return jax.lax.fori_loop(0, N, body, 0.0)

    np.asarray(loop(*args))
    best = 1e9
    for it in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(*[args[0] * (1.0 + 1e-5 * it)] + list(args[1:])))
        best = min(best, time.perf_counter() - t0)
    ms = (best - FLOOR) / N * 1e3
    print(f"{name:28s} {ms:8.2f} ms per {B}x{secs}s batch")
    return ms


def f_fbank(a):
    return fbank_batch_jit(a, use_pallas_fbank=True).mean()


feats = fbank_batch_jit(audio, use_pallas_fbank=True)
n_frames = (lens + 80) // 160


def f_enc(f):
    out, ol = zipformer_encoder(model.enc_params, f, n_frames, model.zip_cfg)
    return out.mean()


enc_out, enc_lens = jax.jit(
    lambda f: zipformer_encoder(model.enc_params, f, n_frames,
                                model.zip_cfg))(feats)
enc16 = enc_out.astype(jnp.bfloat16).astype(jnp.float32)


def f_beam(e):
    r = beam_search_batch_pallas(e, enc_lens, model.dec_params,
                                 model.joi_params, model.rnnt_cfg,
                                 beam_size=8)
    return r.total_logp.mean()


t_fb = bench("fbank", f_fbank, audio)
t_en = bench("encoder", f_enc, feats)
t_bm = bench("beam megakernel", f_beam, enc16)
tot = t_fb + t_en + t_bm
print(f"{'sum':28s} {tot:8.2f} ms; device RTFx ceiling "
      f"{B * 30.0 / (tot / 1e3):.0f}")

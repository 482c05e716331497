# Scratch: beam megakernel on-chip checks after the streamed-records refactor.
# Usage:
#   python _beamhw.py hw           (TPU: save tokens+aux for oracle compare)
#   SVT_DISABLE_COMPILE_CACHE=1 python _beamhw.py ref   (CPU oracle, separate proc)
#   python _beamhw.py perf <B>     (TPU: amortized per-batch decode time)
import os as _os, sys as _sys  # repo root on sys.path (scripts live in benchmarks/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import numpy as np

mode = sys.argv[1]
if mode == "ref":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from sherpa_vietnamese_asr_tpu.models.registry import random_asr_model
from sherpa_vietnamese_asr_tpu.ops.hotword import build_hotword_tables

m = random_asr_model(vocab_size=2000, beam_size=8, compute_dtype="float32")
rng = np.random.default_rng(1)

if mode in ("hw", "ref"):
    b, t = 8, 64
    enc = rng.standard_normal(
        (b, t, m.rnnt_cfg.encoder_out_dim)).astype(np.float32)
    lens = np.asarray([64, 33, 1, 64, 17, 50, 64, 8], np.int32)
    if mode == "hw":
        from sherpa_vietnamese_asr_tpu.ops.beam_search_pallas import (
            beam_search_batch_pallas,
        )
        r = beam_search_batch_pallas(jnp.asarray(enc), jnp.asarray(lens),
                                     m.dec_params, m.joi_params, m.rnnt_cfg,
                                     beam_size=8)
        np.savez("/tmp/beam_hw.npz", tok=np.asarray(r.tokens),
                 n=np.asarray(r.num_tokens), fr=np.asarray(r.frames),
                 lp=np.asarray(r.tok_logp), ent=np.asarray(r.entropy),
                 tot=np.asarray(r.total_logp))
        # hotword variant: phrases from the decoded token stream so the
        # automaton provably advances
        toks0 = [int(x) for x in np.asarray(r.tokens)[0][:6] if x > 3]
        phrases = [toks0[:2], toks0[2:4]] if len(toks0) >= 4 else [[5, 9]]
        tbl, _ = build_hotword_tables(phrases, [2.0] * len(phrases),
                                      m.rnnt_cfg.vocab_size)
        r2 = beam_search_batch_pallas(jnp.asarray(enc), jnp.asarray(lens),
                                      m.dec_params, m.joi_params, m.rnnt_cfg,
                                      beam_size=8, hw_tables=tbl,
                                      with_hotwords=True)
        np.savez("/tmp/beam_hw2.npz", tok=np.asarray(r2.tokens),
                 n=np.asarray(r2.num_tokens),
                 phrases=np.asarray(sum(phrases, []), np.int32),
                 plen=np.asarray([len(p) for p in phrases], np.int32))
        print("hw saved; tokens row0:", np.asarray(r.tokens)[0][:10])
    else:
        from sherpa_vietnamese_asr_tpu.ops.beam_search import (
            beam_search_batch,
        )
        d = np.load("/tmp/beam_hw.npz")
        ref = beam_search_batch(jnp.asarray(enc), jnp.asarray(lens),
                                m.dec_params, m.joi_params, m.rnnt_cfg,
                                beam_size=8)
        assert np.array_equal(d["tok"], np.asarray(ref.tokens)), "tokens!"
        assert np.array_equal(d["n"], np.asarray(ref.num_tokens)), "n!"
        assert np.array_equal(d["fr"], np.asarray(ref.frames)), "frames!"
        np.testing.assert_allclose(d["lp"], np.asarray(ref.tok_logp),
                                   atol=1e-3)
        np.testing.assert_allclose(d["ent"], np.asarray(ref.entropy),
                                   atol=1e-3)
        print("beam hw token/frame/logp parity: OK")
        d2 = np.load("/tmp/beam_hw2.npz")
        flat, plen = list(d2["phrases"]), list(d2["plen"])
        phrases, i = [], 0
        for L in plen:
            phrases.append(flat[i:i + L])
            i += L
        tbl, _ = build_hotword_tables(phrases, [2.0] * len(phrases),
                                      m.rnnt_cfg.vocab_size)
        ref2 = beam_search_batch(jnp.asarray(enc), jnp.asarray(lens),
                                 m.dec_params, m.joi_params, m.rnnt_cfg,
                                 beam_size=8, hw_tables=tbl,
                                 with_hotwords=True)
        assert np.array_equal(d2["tok"], np.asarray(ref2.tokens)), "hw tok!"
        assert np.array_equal(d2["n"], np.asarray(ref2.num_tokens))
        print("beam hw hotword parity: OK")
else:
    import time

    from sherpa_vietnamese_asr_tpu.ops.beam_search_pallas import (
        beam_search_batch_pallas,
    )

    b = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    unroll = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    t = 824  # 33 s chunk at 25 Hz encoder frames
    enc = (rng.standard_normal(
        (b, t, m.rnnt_cfg.encoder_out_dim)) * 0.5).astype(np.float32)
    lens = np.full((b,), t, np.int32)
    encj, lensj = jnp.asarray(enc), jnp.asarray(lens)

    def run(x):
        return beam_search_batch_pallas(x, lensj, m.dec_params,
                                        m.joi_params, m.rnnt_cfg,
                                        beam_size=8, fast_dots=True,
                                        unroll=unroll)
    t0 = time.perf_counter()
    np.asarray(run(encj).tokens)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s")
    best = 1e9
    for it in range(5):
        x = encj * (1.0 + 1e-5 * it)
        t0 = time.perf_counter()
        np.asarray(run(x).tokens)
        best = min(best, time.perf_counter() - t0)
    print(f"beam perf b={b} t={t} unroll={unroll}: "
          f"{(best - 0.031) * 1e3:.1f} ms per batch "
          f"({(best - 0.031) / t * 1e6:.1f} us/frame)")
    if unroll > 1:
        # on-chip token parity vs the unrolled=1 program on the same inputs
        r1 = beam_search_batch_pallas(encj, lensj, m.dec_params,
                                      m.joi_params, m.rnnt_cfg,
                                      beam_size=8, fast_dots=True)
        r2 = run(encj)
        same = np.array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))
        print("unroll on-chip token parity:", "OK" if same else "DIVERGED")

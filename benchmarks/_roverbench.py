# Scratch: ROVER dual-model (30M + 68M) decode throughput, steady state.
# Reference headline: 1 h audio ROVER = 169 s on 6C/12T CPU => ~21x RT
# (SURVEY.md section 6, core/asr_engine.py:2253).
import os as _os, sys as _sys  # repo root on sys.path (scripts live in benchmarks/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import time

import numpy as np


def main():
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.registry import (
        ZIPFORMER_30M, ZIPFORMER_68M, random_asr_model,
    )
    from sherpa_vietnamese_asr_tpu.pipeline.decoder import (
        decode_feats_jit, fbank_batch_jit,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    dtype = os.environ.get("SVT_BENCH_DTYPE", "bfloat16")
    m30 = random_asr_model(vocab_size=2000, beam_size=8, compute_dtype=dtype,
                           zip_cfg=ZIPFORMER_30M)
    m68 = random_asr_model(vocab_size=2000, beam_size=8, compute_dtype=dtype,
                           zip_cfg=ZIPFORMER_68M)
    sr, n, n_pad = 16000, 30 * 16000, int(33 * 16000)
    rng = np.random.default_rng(0)
    t = np.arange(n) / sr
    base = (0.3 * np.sin(2 * np.pi * 220 * t)
            * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)

    def mk_batch():
        out = np.zeros((batch, n_pad), np.float32)
        for i in range(batch):
            out[i, :n] = base + 0.05 * rng.standard_normal(n)
        return jnp.asarray(out)

    n_batches = 4
    batches = [mk_batch() for _ in range(n_batches + 1)]
    lens = jnp.asarray(np.full((batch,), n, np.int32))

    def launch(audio):
        feats = fbank_batch_jit(audio, use_pallas_fbank=True)
        n_frames = (lens + 80) // 160
        outs = []
        for m in (m30, m68):
            outs.append(decode_feats_jit(
                feats, n_frames, m.enc_params, m.dec_params, m.joi_params,
                m.zip_cfg, m.rnnt_cfg, m.beam_size, use_pallas_beam=True)[0])
        return outs

    t0 = time.perf_counter()
    for r in launch(batches[0]):
        np.asarray(r.num_tokens)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    inflight = [launch(x) for x in batches[1:]]
    for outs in inflight:
        for r in outs:
            np.asarray(r.num_tokens)
    dt = time.perf_counter() - t0
    audio_sec = n_batches * batch * 30.0
    print(f"ROVER dual-model b={batch} {dtype}: {dt:.3f}s for "
          f"{audio_sec:.0f}s audio = RTFx {audio_sec / dt:.0f} "
          f"(ref CPU ~21x => {audio_sec / dt / 21.3:.0f}x faster)")


if __name__ == "__main__":
    main()

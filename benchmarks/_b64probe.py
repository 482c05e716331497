# Round-4 probe: packed-token kernel at batch 64 (old ceiling: 48) + hotword
# on-chip parity. Run on the TPU chip.
import os as _os, sys as _sys  # repo root on sys.path (scripts live in benchmarks/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax.numpy as jnp
from sherpa_vietnamese_asr_tpu.models.registry import random_asr_model
from sherpa_vietnamese_asr_tpu.ops.beam_search_pallas import beam_search_batch_pallas
from sherpa_vietnamese_asr_tpu.ops.hotword import build_hotword_tables

m = random_asr_model(vocab_size=2000, beam_size=8, compute_dtype='float32')
rng = np.random.default_rng(1)

# -- hotword parity inputs (b=8 mixed lens; phrases from decoded bigrams) --
d = np.load('/tmp/beam_hw.npz')
tok0 = [t for t in d['tok'][0][:6].tolist() if t > 1]
phrases = [tok0[:3], tok0[3:5]] if len(tok0) >= 5 else [[7, 11, 13]]
hw, _ = build_hotword_tables(phrases, scores=[2.0] * len(phrases),
                             vocab_size=2000)
r = beam_search_batch_pallas(jnp.asarray(d['enc']), jnp.asarray(d['lens']),
                             m.dec_params, m.joi_params, m.rnnt_cfg,
                             beam_size=8, hw_tables=hw, with_hotwords=True)
np.savez('/tmp/beam_hw2.npz', tok=np.asarray(r.tokens),
         n=np.asarray(r.num_tokens), phr=np.asarray(phrases[0], np.int32))
print('hotword TPU side done')

# -- batch-64/96 at T=824 (round-3 ceiling was 48; round 4 raises the
# kernel's scoped-VMEM limit past the 16 MB XLA default) --
for b in (64, 96):
    try:
        enc = rng.standard_normal((b, 824, 256)).astype(np.float32) * 0.5
        # mixed lens: exercise the valid-frame mask at non-native sublanes
        lens = np.asarray([824, 33, 1, 824, 500, 117, 824, 64] * (b // 8),
                          np.int32)
        t0 = time.time()
        rr = beam_search_batch_pallas(jnp.asarray(enc), jnp.asarray(lens),
                                      m.dec_params, m.joi_params, m.rnnt_cfg,
                                      beam_size=8)  # HIGHEST: oracle-exact
        n = np.asarray(rr.num_tokens)
        print(f'b={b} T=824 compile+run OK {time.time()-t0:.1f}s ntok={n.sum()}')
        if b == 64:
            np.savez('/tmp/beam_b64.npz', enc=enc, lens=lens,
                     tok=np.asarray(rr.tokens), n=n)
        # steady timing (fast_dots serving tier)
        for tag, fast in (("highest", False), ("fast", True)):
            enc2 = jnp.asarray(enc + 0.01)
            n2 = np.asarray(beam_search_batch_pallas(
                enc2, jnp.asarray(lens), m.dec_params, m.joi_params,
                m.rnnt_cfg, beam_size=8, fast_dots=fast).num_tokens)
            enc3 = jnp.asarray(enc + 0.02)
            t0 = time.time()
            n3 = np.asarray(beam_search_batch_pallas(
                enc3, jnp.asarray(lens), m.dec_params, m.joi_params,
                m.rnnt_cfg, beam_size=8, fast_dots=fast).num_tokens)
            print(f'b={b} steady[{tag}] {time.time()-t0:.3f}s')
    except Exception as e:
        print(f'b={b} FAILED: {type(e).__name__}: {str(e)[:300]}')

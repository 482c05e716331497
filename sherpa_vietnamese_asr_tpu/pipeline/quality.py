# Audio quality analysis (DNSMOS) — pipeline stage.
#
# Behavioral port of reference core/audio_analyzer.py:248-331 plus the
# pipeline's stratified 15/50/85% sampling over the silence-stripped concat
# audio (reference core/asr_engine.py:2496-2528): three 9.01 s samples run
# through DNSMOS, scores mapped through Microsoft's polynomial fit, then
# averaged. The model itself is models/dnsmos.py (batched: all three windows
# in ONE forward).

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DNSMOS_LEN = 144160  # 9.01 s @ 16 kHz

# Microsoft DNSMOS polynomial MOS mapping (audio_analyzer.py:287-293)
_P_OVR = np.poly1d([-0.06766283, 1.11546468, 0.04602535])
_P_SIG = np.poly1d([-0.08397278, 1.22083953, 0.0052439])
_P_BAK = np.poly1d([-0.13166888, 1.60915514, -0.39604546])


from sherpa_vietnamese_asr_tpu.utils.aot_cache import aot_jit


@aot_jit("dnsmos", static_argnames=("cfg",))
def _dnsmos_jit(params, batch, cfg):
    from sherpa_vietnamese_asr_tpu.models.dnsmos import dnsmos_forward

    return dnsmos_forward(params, batch, cfg)


class QualityAnalyzer:
    def __init__(self, params=None, cfg=None, mesh="auto"):
        from sherpa_vietnamese_asr_tpu.models.dnsmos import (
            DnsmosConfig, init_dnsmos_params,
        )

        from sherpa_vietnamese_asr_tpu.models import assets
        if params is None:
            loaded = assets.load_dnsmos_asset()
            if loaded is not None:
                params, cfg = loaded
        self.cfg = cfg or DnsmosConfig()
        if params is None:
            assets.warn_random("DNSMOS quality model")
            params = init_dnsmos_params(jax.random.PRNGKey(0), self.cfg)
        # Multi-chip: window batches shard over the mesh "data" axis with
        # replicated params (jit repartitions from the input shardings).
        from sherpa_vietnamese_asr_tpu.parallel import sharding as shd
        self.mesh = shd.default_mesh() if mesh == "auto" else mesh
        if self.mesh is not None:
            params = shd.replicate(params, self.mesh)
        else:
            # One-time upload: ONNX-loaded weights are host numpy and would
            # otherwise re-transfer on every window batch.
            params = jax.device_put(params)
        self.params = params

    @staticmethod
    def _map_scores(raw):
        sig, bak, ovr = float(raw[0]), float(raw[1]), float(raw[2])
        return {
            "SIG": float(np.clip(_P_SIG(sig), 1.0, 5.0)),
            "BAK": float(np.clip(_P_BAK(bak), 1.0, 5.0)),
            "OVRL": float(np.clip(_P_OVR(ovr), 1.0, 5.0)),
        }

    def compute_dnsmos_batch(self, windows):
        """windows: [N, <=144160] list/array -> list of score dicts.
        Inputs are zero-padded, never peak-normalized (level-sensitive)."""
        if not len(windows):
            return []
        batch = np.zeros((len(windows), DNSMOS_LEN), np.float32)
        for i, w in enumerate(windows):
            n = min(len(w), DNSMOS_LEN)
            batch[i, :n] = w[:n]
        if self.mesh is not None:
            from sherpa_vietnamese_asr_tpu.parallel.sharding import (
                shard_batch,
            )
            dev_batch, n_real = shard_batch(batch, self.mesh)
        else:
            dev_batch, n_real = jnp.asarray(batch), len(windows)
        raw = np.asarray(_dnsmos_jit(self.params, dev_batch,
                                     self.cfg))[:n_real]
        return [self._map_scores(r) for r in raw]

    def compute_dnsmos(self, audio):
        scores = self.compute_dnsmos_batch([np.asarray(audio, np.float32)])
        return scores[0] if scores else None

    def analyze_speech(self, concat_audio, positions=(0.15, 0.50, 0.85)):
        """Stratified sampling over speech-only audio -> averaged quality
        dict {dnsmos_sig, dnsmos_bak, dnsmos_ovrl} or None
        (reference asr_engine.py:2500-2528)."""
        concat_len = len(concat_audio)
        if concat_len < 8000:  # < 0.5 s of speech
            return None
        windows = []
        for pos in positions:
            center = int(concat_len * pos)
            start = max(0, center - DNSMOS_LEN // 2)
            end = min(concat_len, start + DNSMOS_LEN)
            if end - start >= 8000:
                windows.append(concat_audio[start:end])
        scores = self.compute_dnsmos_batch(windows)
        if not scores:
            return None
        return {
            "dnsmos_sig": round(float(np.mean([s["SIG"] for s in scores])), 2),
            "dnsmos_bak": round(float(np.mean([s["BAK"] for s in scores])), 2),
            "dnsmos_ovrl": round(float(np.mean([s["OVRL"] for s in scores])), 2),
        }

    def compute_dnsmos_average(self, audio):
        """Sliding 9.01 s windows with 50% overlap, averaged
        (audio_analyzer.py:306-331)."""
        audio = np.asarray(audio, np.float32)
        if len(audio) <= DNSMOS_LEN:
            return self.compute_dnsmos(audio)
        step = DNSMOS_LEN // 2
        windows = [audio[s: s + DNSMOS_LEN]
                   for s in range(0, len(audio) - DNSMOS_LEN + 1, step)]
        scores = self.compute_dnsmos_batch(windows)
        if not scores:
            return None
        return {k: float(np.mean([s[k] for s in scores]))
                for k in ("SIG", "BAK", "OVRL")}

# Punctuation restorer wrapper: rule-based cleanup over the GEC model.
#
# Behavioral port of reference core/punctuation_restorer_improved.py
# (ImprovedPunctuationRestorer): colon removal, duplicate punctuation
# cleanup, comma limiting in short sentences, spacing normalization, and
# sentence-initial capitalization. The underlying model runs on TPU via
# pipeline/gec.py.

from __future__ import annotations

import re


def build_punctuation_restorer(model_dir=None, confidence=0.3,
                               case_confidence=0.0, prefer_int8=False,
                               **gec_kw):
    """Construct a PunctuationRestorer.

    With model_dir containing vibert-capu.onnx (+ vocab.txt), loads the real
    checkpoint (models/onnx_import.load_vibert); otherwise builds an
    architecture-true random-weight 12-layer ViBERT with a synthetic
    WordPiece vocab — same shape/latency, placeholder predictions.
    (Reference core/gec_model.py:133-199 loads the same files.)

    prefer_int8=True quantizes the linear weights to the int8 tier
    (models/vibert.quantize_vibert_int8) — the analogue of the reference's
    vibert-capu.int8.onnx selection under prefer_int8
    (core/gec_model.py:125-145).
    """
    import os

    import jax

    from sherpa_vietnamese_asr_tpu.pipeline.gec import GecBert
    from sherpa_vietnamese_asr_tpu.utils.wordpiece import WordPieceTokenizer

    params = cfg = None
    vocab = None
    if model_dir:
        onnx_path = os.path.join(model_dir, "vibert-capu.onnx")
        vocab_path = os.path.join(model_dir, "vocab.txt")
        if os.path.exists(onnx_path):
            from sherpa_vietnamese_asr_tpu.models.onnx_import import (
                load_vibert,
            )
            params, cfg = load_vibert(onnx_path)
        if os.path.exists(vocab_path):
            with open(vocab_path, encoding="utf-8") as f:
                vocab = [line.rstrip("\n") for line in f]
    from sherpa_vietnamese_asr_tpu.models import assets
    if params is None:
        loaded = assets.load_vibert_asset()
        if loaded is not None:
            params, cfg = loaded
            paths = assets.asset_paths("vibert-capu")
            if vocab is None and paths is not None:
                with open(paths["vocab.txt"], encoding="utf-8") as f:
                    vocab = [line.rstrip("\n") for line in f]
    if params is None:
        from sherpa_vietnamese_asr_tpu.models.vibert import (
            ViBertConfig, init_vibert_params,
        )
        assets.warn_random("ViBERT punctuation model")
        cfg = ViBertConfig()
        params = init_vibert_params(jax.random.PRNGKey(0), cfg)
    if vocab is None:
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
        for c in "abcdefghijklmnopqrstuvwxyz0123456789":
            vocab += [c, "##" + c]
    if prefer_int8:
        from sherpa_vietnamese_asr_tpu.models.vibert import (
            quantize_vibert_int8,
        )
        params = quantize_vibert_int8(params)
    gec = GecBert(params, cfg, WordPieceTokenizer(vocab),
                  confidence=confidence, case_confidence=case_confidence,
                  **gec_kw)
    return PunctuationRestorer(gec, confidence=confidence,
                               case_confidence=case_confidence)


class PunctuationRestorer:
    def __init__(self, gec_model, confidence=0.3, case_confidence=0.0):
        """gec_model: a pipeline.gec.GecBert instance (confidence values are
        already baked into it by the caller)."""
        self.gec_model = gec_model
        self.confidence = confidence
        self.case_confidence = case_confidence

    def restore(self, text, progress_callback=None, pause_hints=None):
        if not text or not text.strip():
            return ""
        try:
            results = self.gec_model(text, pause_hints=pause_hints,
                                     progress_callback=progress_callback)
            result = results[0] if isinstance(results, list) else results
            return self.post_process(result)
        except Exception:
            import logging
            logging.getLogger(__name__).error("punctuation restore failed",
                                              exc_info=True)
            return text

    @staticmethod
    def post_process(text):
        """Punctuation cleanup rules (punctuation_restorer_improved.py:80-133)."""
        text = text.replace(":", " ")
        text = re.sub(r",+", ",", text)
        text = re.sub(r"\.{4,}", "...", text)
        text = re.sub(r",\s*\.", ".", text)

        sentences = re.split(r"(?<=[.!?])\s+", text)
        cleaned = []
        for sent in sentences:
            words = sent.split()
            if len(words) < 8 and sent.count(",") > 1:
                parts = sent.split(",", 1)
                if len(parts) > 1:
                    second = parts[1].find(",")
                    if second != -1:
                        parts[1] = (parts[1][:second]
                                    + parts[1][second + 1:].replace(",", ""))
                    sent = parts[0] + "," + parts[1]
            cleaned.append(sent)
        text = " ".join(cleaned)

        text = re.sub(r"([,.!?])([^\s])", r"\1 \2", text)
        text = re.sub(r"\s+([,.!?])", r"\1", text)
        text = re.sub(r"^,\s*", "", text)
        text = re.sub(r"\.\s*,", ". ", text)
        text = re.sub(r"\s+", " ", text)
        text = re.sub(r"(^|[.!?]\s+)([^\W_])",
                      lambda m: m.group(1) + m.group(2).upper(), text)
        return text.strip()

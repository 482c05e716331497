# Punctuation restorer wrapper: rule-based cleanup over the GEC model.
#
# Behavioral port of reference core/punctuation_restorer_improved.py
# (ImprovedPunctuationRestorer): colon removal, duplicate punctuation
# cleanup, comma limiting in short sentences, spacing normalization, and
# sentence-initial capitalization. The underlying model runs on TPU via
# pipeline/gec.py.

from __future__ import annotations

import re


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

# BPE encoder, sentencepiece model parsing, config validation.
import struct

import numpy as np

from sherpa_vietnamese_asr_tpu.utils import protowire as pw
from sherpa_vietnamese_asr_tpu.utils.bpe import BpeModel


def _sp_model_bytes(pieces):
    """Serialize a minimal sentencepiece ModelProto (pieces only)."""
    out = b""
    for piece, score, ptype in pieces:
        body = pw.write_field(1, 2, piece.encode())
        # score: fixed32 float (wire type 5)
        key = pw.write_varint((2 << 3) | 5)
        body += key + struct.pack("<f", score)
        body += pw.write_field(3, 0, ptype)
        out += pw.write_field(1, 2, body)
    return out


PIECES = [
    ("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
    ("▁", -2.0, 1), ("a", -3.0, 1), ("b", -3.5, 1), ("c", -4.0, 1),
    ("▁a", -1.0, 1), ("▁ab", -0.5, 1), ("ab", -1.5, 1), ("bc", -2.5, 1),
    ("▁abc", -0.2, 1),
]


def test_parse_sentencepiece_model(tmp_path):
    path = tmp_path / "bpe.model"
    path.write_bytes(_sp_model_bytes(PIECES))
    bpe = BpeModel.from_file(str(path))
    assert bpe.vocab_size() == len(PIECES)
    assert bpe.id_to_piece(7) == "▁a"
    assert abs(bpe.get_score(8) - (-0.5)) < 1e-6
    assert bpe.unk_id == 0


def test_bpe_encode_merges_by_score():
    bpe = BpeModel([(p, s, t) for p, s, t in PIECES])
    # "abc" -> ▁a b c -> merge to ▁ab? score -0.5; ▁abc score -0.2 wins last
    ids = bpe.encode("abc")
    assert [bpe.id_to_piece(i) for i in ids] == ["▁abc"]
    ids2 = bpe.encode("ab")
    assert [bpe.id_to_piece(i) for i in ids2] == ["▁ab"]
    # word with unknown char falls back to unk per char
    ids3 = bpe.encode("az")
    pieces3 = [bpe.id_to_piece(i) for i in ids3]
    assert pieces3[0] in ("▁a", "<unk>")
    assert bpe.unk_id in ids3


def test_bpe_vocab_roundtrip(tmp_path):
    bpe = BpeModel(PIECES)
    path = tmp_path / "bpe.vocab"
    bpe.dump_vocab(str(path))
    with open(path, encoding="utf-8") as f:
        bpe2 = BpeModel.from_vocab(f.readlines())
    assert bpe2.vocab_size() == bpe.vocab_size()
    assert bpe2.encode("abc") == bpe.encode("abc")


def test_validate_config_clamps():
    from sherpa_vietnamese_asr_tpu.utils.config import validate_config
    cfg = validate_config({"punctuation_confidence": 5.0, "num_speakers": -3,
                           "max_batch": "16", "bypass_vad": 1,
                           "unknown_key": "kept"})
    assert cfg["punctuation_confidence"] == 1.0
    assert cfg["num_speakers"] == 0
    assert cfg["max_batch"] == 16
    assert cfg["bypass_vad"] is True
    assert cfg["unknown_key"] == "kept"


def test_hotword_tables_from_files(tmp_path):
    from sherpa_vietnamese_asr_tpu.utils.config import (
        build_hotword_tables_for_model,
    )
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    (model_dir / "bpe.model").write_bytes(_sp_model_bytes(PIECES))
    hw = tmp_path / "hotword.txt"
    hw.write_text("# comment\nABC :2.0\nAB\n", encoding="utf-8")
    tables, phrases = build_hotword_tables_for_model(
        str(model_dir), vocab_size=len(PIECES), hotwords_file=str(hw))
    assert tables is not None
    assert phrases == ["ABC", "AB"]
    assert tables.next_state.shape[1] == len(PIECES)
    # no hotword file -> (None, [])
    t2, p2 = build_hotword_tables_for_model(
        str(model_dir), vocab_size=len(PIECES),
        hotwords_file=str(tmp_path / "missing.txt"), base_dir=str(tmp_path / "nowhere"))
    assert t2 is None and p2 == []

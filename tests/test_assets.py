# Asset registry: manifest pins, SHA256 verification, random-weight policy.
import os

import numpy as np
import pytest

from sherpa_vietnamese_asr_tpu.models import assets


def test_manifest_structure():
    for key, spec in assets.MANIFEST.items():
        assert spec["local_dir"] and spec["source"], key
        assert spec["files"], key
        for fname, sha in spec["files"].items():
            assert sha is None or (len(sha) == 64 and
                                   int(sha, 16) >= 0), (key, fname)


def test_sha256_verification(tmp_path, monkeypatch):
    monkeypatch.setenv("SVT_MODELS_DIR", str(tmp_path))
    d = tmp_path / assets.MANIFEST["silero-vad"]["local_dir"]
    d.mkdir(parents=True)
    f = d / "silero_vad_16k_op15.onnx"
    f.write_bytes(b"not the real model")
    with pytest.raises(ValueError, match="SHA256 mismatch"):
        assets.asset_paths("silero-vad")
    # unverified resolution still works (for local experiments)
    paths = assets.asset_paths("silero-vad", verify=False)
    assert paths["silero_vad_16k_op15.onnx"] == str(f)


def test_asset_paths_none_when_missing(tmp_path, monkeypatch):
    monkeypatch.setenv("SVT_MODELS_DIR", str(tmp_path))
    assert assets.asset_paths("campp") is None
    assert assets.load_campp_asset() is None


def test_require_real_or_allowed(capsys):
    with pytest.raises(assets.RandomWeightError, match="allow_random"):
        assets.require_real_or_allowed("test component A", False)
    assets._warned.discard("test component B")
    assets.require_real_or_allowed("test component B", True)
    assert "RANDOM weights" in capsys.readouterr().err


def test_warn_random_once(capsys):
    assets._warned.discard("test component C")
    assets.warn_random("test component C")
    assets.warn_random("test component C")
    assert capsys.readouterr().err.count("RANDOM weights") == 1


def test_cli_refuses_random_without_flag(tmp_path, monkeypatch):
    monkeypatch.setenv("SVT_MODELS_DIR", str(tmp_path / "none"))
    import argparse

    from sherpa_vietnamese_asr_tpu.cli import _load_model
    ns = argparse.Namespace(model="zipformer-30m-rnnt-6000h", beam=2,
                            allow_random=False, models_dir=None)
    with pytest.raises(assets.RandomWeightError):
        _load_model(ns)


def test_cli_allows_random_with_flag(tmp_path, monkeypatch):
    monkeypatch.setenv("SVT_MODELS_DIR", str(tmp_path / "none"))
    import argparse

    from sherpa_vietnamese_asr_tpu.cli import _load_model
    assets._warned.clear()
    ns = argparse.Namespace(model="zipformer-30m-rnnt-6000h", beam=2,
                            allow_random=True, models_dir=None,
                            dtype="float32")
    model = _load_model(ns)
    assert model.beam_size == 2


def test_silero_asset_loads_when_present(tmp_path, monkeypatch, rng):
    """End-to-end: put a (synthetic) silero file in the layout and confirm
    the default VAD path picks it up instead of random init."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tests.test_model_oracles import _silero_v5_file

    monkeypatch.setenv("SVT_MODELS_DIR", str(tmp_path))
    d = tmp_path / assets.MANIFEST["silero-vad"]["local_dir"]
    d.mkdir(parents=True)
    src = _silero_v5_file(rng, d)
    assert src.name == "silero_vad_16k_op15.onnx"
    assets._cache.pop("silero-vad", None)
    # hash is not pinned for this synthetic file -> must verify=False;
    # the loader verifies by default, so expect the mismatch to raise.
    with pytest.raises(ValueError, match="SHA256 mismatch"):
        assets.load_silero()
    loaded = assets.load_silero(verify=False)
    assert loaded is not None
    params, cfg = loaded
    assert cfg.n_freq == 33
    assets._cache.pop("silero-vad", None)

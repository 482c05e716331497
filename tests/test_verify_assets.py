# Real-asset rehearsal command (models/verify_assets.py, `svt
# verify-assets`). No real checkpoints exist in this environment, so the
# rehearsal is validated on synthesized exports: the command must hash-check,
# import, run the JAX forward, attempt the graph-executor cross-check (and
# report an explicit skip on weight-only exports), and classify statuses
# correctly — so that on a machine with real assets it produces the full
# parity report unattended.

import numpy as np
import pytest

from sherpa_vietnamese_asr_tpu.models import assets
from sherpa_vietnamese_asr_tpu.models import verify_assets as va


def test_cmp_gates():
    a = np.ones((3, 4), np.float32)
    ok = va._cmp("x", a, a + 1e-5)
    assert ok["ok"] is True
    bad = va._cmp("x", a, a + 1.0)
    assert bad["ok"] is False
    shp = va._cmp("x", a, np.ones((4, 3)))
    assert shp["ok"] is False and "shape" in shp["detail"]


def test_exec_checks_executable_graph():
    """The cross-check mechanism on an executable graph: matching outputs
    pass, corrupted outputs fail loudly."""
    from sherpa_vietnamese_asr_tpu.models.onnx_synth import GraphBuilder

    rng = np.random.default_rng(0)
    w = rng.standard_normal((6, 5)).astype(np.float32)
    b = GraphBuilder()
    x = b.input("x")
    wn = b.init("w", w)
    y = b.node("MatMul", [x, wn])
    y = b.node("Relu", [y])
    b.output(y)
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "m.onnx")
        with open(p, "wb") as f:
            f.write(b.build())
        xs = rng.standard_normal((2, 6)).astype(np.float32)
        ref = np.maximum(xs @ w, 0.0)
        rows, outs = va._exec_checks("m", p, [xs], [ref])
        assert rows[0]["ok"] is True and outs is not None
        rows_bad, _ = va._exec_checks("m", p, [xs], [ref + 0.5])
        assert rows_bad[0]["ok"] is False


def test_exec_checks_weight_only_graph_skips(tmp_path):
    from sherpa_vietnamese_asr_tpu.models.onnx_synth import GraphBuilder

    b = GraphBuilder()
    b.init("w", np.zeros((2, 2), np.float32))
    p = tmp_path / "w.onnx"
    p.write_bytes(b.build())
    rows, outs = va._exec_checks("m", str(p), [], [])
    assert rows[0]["ok"] is None and "weight-only" in rows[0]["detail"]
    assert outs is None


def test_absent_asset_status(monkeypatch, tmp_path):
    monkeypatch.setenv("SVT_MODELS_DIR", str(tmp_path))
    rep = va.verify_asset("dnsmos")
    assert rep["status"] == "absent"
    assert any(c["detail"] == "missing" for c in rep["checks"])


def test_hash_mismatch_fails(monkeypatch, tmp_path):
    key = "dnsmos"
    spec = assets.MANIFEST[key]
    d = tmp_path / spec["local_dir"]
    d.mkdir()
    (d / "sig_bak_ovr.onnx").write_bytes(b"corrupt")
    monkeypatch.setenv("SVT_MODELS_DIR", str(tmp_path))
    rows, present = va._hash_checks(key)
    assert present is True
    assert rows[0]["ok"] is False and "got " in rows[0]["detail"]


@pytest.fixture
def tiny_asr_dir(tmp_path, monkeypatch):
    """Synthesized EXECUTABLE ASR export set (TINY config, torch layouts,
    real op graphs via models/onnx_export_rnnt) under a models dir, with
    MANIFEST hashes repinned to the synth files — the rehearsal's stand-in
    for a real download. The encoder is a static batch-1 t=96 export
    (matching _verify_asr's probe length), exercising the single-feed
    adaptation path."""
    import jax

    from sherpa_vietnamese_asr_tpu.models.onnx_export_rnnt import (
        build_decoder_graph, build_encoder_graph, build_joiner_graph,
        invert_rnnt_to_torch, invert_zipformer_to_torch,
    )
    from sherpa_vietnamese_asr_tpu.models.registry import TINY_ZIPFORMER
    from sherpa_vietnamese_asr_tpu.models.rnnt import (
        RnntConfig, init_decoder_params, init_joiner_params,
    )
    from sherpa_vietnamese_asr_tpu.models.zipformer import (
        init_zipformer_params,
    )

    zcfg = TINY_ZIPFORMER
    vocab = 30
    rcfg = RnntConfig(vocab_size=vocab, decoder_dim=16, joiner_dim=12,
                      encoder_out_dim=zcfg.output_dim)
    params = init_zipformer_params(jax.random.PRNGKey(5), zcfg)
    dec_p = init_decoder_params(jax.random.PRNGKey(6), rcfg)
    joi_p = init_joiner_params(jax.random.PRNGKey(7), rcfg)
    dec_t, joi_t = invert_rnnt_to_torch(dec_p, joi_p)

    spec = assets.MANIFEST["zipformer-30m"]
    d = tmp_path / spec["local_dir"]
    d.mkdir()
    files = {
        "encoder-epoch-20-avg-10.onnx": build_encoder_graph(
            invert_zipformer_to_torch(params, zcfg), zcfg, t_in=96),
        "decoder-epoch-20-avg-10.onnx": build_decoder_graph(dec_t, rcfg),
        "joiner-epoch-20-avg-10.onnx": build_joiner_graph(joi_t),
        "bpe.model": b"synthetic",
        "tokens.txt": "".join(f"tok{i} {i}\n"
                              for i in range(vocab)).encode(),
    }
    new_hashes = {}
    import hashlib
    for fname, data in files.items():
        (d / fname).write_bytes(data)
        new_hashes[fname] = hashlib.sha256(data).hexdigest()
    monkeypatch.setitem(assets.MANIFEST, "zipformer-30m",
                        {**spec, "files": new_hashes})
    monkeypatch.setenv("SVT_MODELS_DIR", str(tmp_path))

    # the registry hardcodes the full-size config by dir name; rehearse with
    # the tiny twin via the same importer entry point
    import dataclasses

    from sherpa_vietnamese_asr_tpu.models import registry

    def tiny_load(model_dir, beam_size=8, compute_dtype="float32"):
        from sherpa_vietnamese_asr_tpu.models import onnx_import
        from sherpa_vietnamese_asr_tpu.models.rnnt import RnntConfig

        id2token = registry.load_tokens(model_dir + "/tokens.txt")
        z = dataclasses.replace(zcfg, compute_dtype=compute_dtype)
        rcfg = RnntConfig(vocab_size=len(id2token), decoder_dim=16,
                          joiner_dim=12, encoder_out_dim=z.output_dim)
        e, dc, j = onnx_import.load_zipformer_rnnt(model_dir, z, rcfg)
        return registry.AsrModel(
            name="tiny", zip_cfg=z, rnnt_cfg=rcfg, enc_params=e,
            dec_params=dc, joi_params=j, id2token=id2token,
            beam_size=beam_size)

    monkeypatch.setattr(registry, "load_asr_model", tiny_load)
    return d


def test_asr_rehearsal_on_synth_export(tiny_asr_dir):
    """Full verify-asset pass over a synthesized EXECUTABLE ASR export:
    hashes pass, import + forwards pass, every exec cross-check and the
    beam token-identity check actually run — status 'verified'."""
    rep = va.verify_asset("zipformer-30m")
    assert rep["status"] == "verified", va.format_report(
        {"assets": {"zipformer-30m": rep}, "ok": False})
    by = {c["check"]: c for c in rep["checks"]}
    assert by["import"]["ok"] is True
    assert by["forward.encoder"]["ok"] is True
    assert by["forward.decoder"]["ok"] is True
    assert by["forward.joiner"]["ok"] is True
    assert by["encoder.exec[0]"]["ok"] is True
    assert by["decoder.exec[0]"]["ok"] is True
    assert by["joiner.exec[0]"]["ok"] is True
    assert by["tokens.decode"]["ok"] is True


def test_report_formatting_and_overall(tiny_asr_dir):
    rep = va.verify_assets(["zipformer-30m"])
    assert rep["ok"] is True
    text = va.format_report(rep)
    assert "zipformer-30m: VERIFIED" in text
    assert "overall: OK" in text

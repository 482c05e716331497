# ONNX wire parser tests against synthesized ONNX bytes.
import numpy as np

from sherpa_vietnamese_asr_tpu.utils import protowire as pw


def _tensor_proto(name, arr, use_raw=True):
    out = b""
    for d in arr.shape:
        out += pw.write_field(1, 0, d)  # dims
    dtype_id = {np.dtype("float32"): 1, np.dtype("int64"): 7,
                np.dtype("float16"): 10}[arr.dtype]
    out += pw.write_field(2, 0, dtype_id)  # data_type
    out += pw.write_field(8, 2, name.encode())  # name
    if use_raw:
        out += pw.write_field(9, 2, arr.tobytes())  # raw_data
    else:
        if arr.dtype == np.int64:
            packed = b"".join(pw.write_varint(int(v) & (2**64 - 1))
                              for v in arr.flatten())
            out += pw.write_field(7, 2, packed)
        else:
            out += pw.write_field(9, 2, arr.tobytes())
    return out


def _node_proto(op, inputs, outputs, name="n"):
    out = b""
    for i in inputs:
        out += pw.write_field(1, 2, i.encode())
    for o in outputs:
        out += pw.write_field(2, 2, o.encode())
    out += pw.write_field(3, 2, name.encode())
    out += pw.write_field(4, 2, op.encode())
    return out


def _value_info(name):
    return pw.write_field(1, 2, name.encode())


def make_onnx(tensors, nodes=(), inputs=(), outputs=(), use_raw=True):
    graph = b""
    for op, ins, outs in nodes:
        graph += pw.write_field(1, 2, _node_proto(op, ins, outs))
    for name, arr in tensors.items():
        graph += pw.write_field(5, 2, _tensor_proto(name, arr, use_raw))
    for n in inputs:
        graph += pw.write_field(11, 2, _value_info(n))
    for n in outputs:
        graph += pw.write_field(12, 2, _value_info(n))
    model = pw.write_field(1, 0, 8)  # ir_version
    model += pw.write_field(7, 2, graph)
    return model


def test_roundtrip_raw_tensors(rng):
    from sherpa_vietnamese_asr_tpu.models.onnx_import import read_onnx
    tensors = {
        "a.weight": rng.standard_normal((3, 4)).astype(np.float32),
        "b.bias": rng.standard_normal((7,)).astype(np.float32),
        "ctx": np.array([5, -3, 2], np.int64),
        "half": rng.standard_normal((2, 2)).astype(np.float16),
    }
    buf = make_onnx(tensors, nodes=[("MatMul", ["x", "a.weight"], ["y"])],
                    inputs=["x"], outputs=["y"])
    parsed = read_onnx(buf)
    assert parsed["inputs"] == ["x"] and parsed["outputs"] == ["y"]
    assert parsed["nodes"][0][0] == "MatMul"
    np.testing.assert_array_equal(parsed["initializers"]["a.weight"],
                                  tensors["a.weight"])
    np.testing.assert_array_equal(parsed["initializers"]["ctx"],
                                  tensors["ctx"])
    # fp16 upcast to fp32
    got = parsed["initializers"]["half"]
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, tensors["half"].astype(np.float32))


def test_int64_packed_field(rng):
    from sherpa_vietnamese_asr_tpu.models.onnx_import import read_onnx
    arr = np.array([1, 2, 300, 70000], np.int64)
    buf = make_onnx({"ids": arr}, use_raw=False)
    np.testing.assert_array_equal(read_onnx(buf)["initializers"]["ids"], arr)


def test_joiner_decoder_mapping(tmp_path, rng):
    """End-to-end: synthesize decoder/joiner ONNX files, load via
    load_zipformer_rnnt (encoder map intentionally pending -> ImportReport
    listing encoder initializers)."""
    import pytest

    from sherpa_vietnamese_asr_tpu.models.onnx_import import (
        ImportReport, load_zipformer_rnnt,
    )
    from sherpa_vietnamese_asr_tpu.models.rnnt import RnntConfig

    rcfg = RnntConfig(vocab_size=30, decoder_dim=16, joiner_dim=12,
                      encoder_out_dim=8)
    jd = {
        "encoder_proj.weight": rng.standard_normal((12, 8)).astype(np.float32),
        "encoder_proj.bias": rng.standard_normal((12,)).astype(np.float32),
        "decoder_proj.weight": rng.standard_normal((12, 16)).astype(np.float32),
        "decoder_proj.bias": rng.standard_normal((12,)).astype(np.float32),
        "output_linear.weight": rng.standard_normal((30, 12)).astype(np.float32),
        "output_linear.bias": rng.standard_normal((30,)).astype(np.float32),
    }
    dd = {
        "embedding.weight": rng.standard_normal((30, 16)).astype(np.float32),
        "conv.weight": rng.standard_normal((16, 4, 2)).astype(np.float32),
    }
    (tmp_path / "encoder-model.onnx").write_bytes(
        make_onnx({"stub": np.zeros((1,), np.float32)}))
    (tmp_path / "decoder-model.onnx").write_bytes(make_onnx(dd))
    (tmp_path / "joiner-model.onnx").write_bytes(make_onnx(jd))

    from sherpa_vietnamese_asr_tpu.models.zipformer import ZipformerConfig
    with pytest.raises(ImportReport, match="expected tensors missing"):
        load_zipformer_rnnt(str(tmp_path), ZipformerConfig(), rcfg)


def test_encoder_roundtrip_via_name_map(tmp_path, rng):
    """Synthesize an encoder ONNX carrying torch-layout versions of a known
    parameter tree (tiny config), load it through the name map, and verify
    the loaded tree equals the original leaf-for-leaf."""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.onnx_import import (
        load_zipformer_rnnt, zipformer_name_map,
    )
    from sherpa_vietnamese_asr_tpu.models.registry import TINY_ZIPFORMER
    from sherpa_vietnamese_asr_tpu.models.rnnt import RnntConfig
    from sherpa_vietnamese_asr_tpu.models.zipformer import (
        init_zipformer_params, zipformer_encoder,
    )

    zcfg = TINY_ZIPFORMER
    ref_params = init_zipformer_params(jax.random.PRNGKey(5), zcfg)
    ref_map = zipformer_name_map(ref_params, zcfg)

    def read_dest(set_fn):
        names = set_fn.__code__.co_freevars
        cells = {n: c.cell_contents
                 for n, c in zip(names, set_fn.__closure__)}
        return np.asarray(cells["node"][cells["key"]])

    tensors = {}
    for src_name, (set_fn, transform) in ref_map.items():
        dest = read_dest(set_fn)
        if transform is None:
            t = dest
        elif "depthwise_conv.weight" in src_name and dest.ndim == 2:
            t = np.ascontiguousarray(dest.T)[:, None, :]  # [C,1,K]
        elif dest.ndim == 2:
            t = np.ascontiguousarray(dest.T)  # torch Linear [out,in]
        elif dest.ndim == 4:
            t = np.ascontiguousarray(np.transpose(dest, (3, 2, 0, 1)))
        else:
            t = dest
        tensors[src_name] = np.asarray(t, np.float32)

    rcfg = RnntConfig(vocab_size=30, decoder_dim=16, joiner_dim=12,
                      encoder_out_dim=zcfg.output_dim)
    jd = {
        "encoder_proj.weight": rng.standard_normal(
            (12, zcfg.output_dim)).astype(np.float32),
        "encoder_proj.bias": rng.standard_normal(12).astype(np.float32),
        "decoder_proj.weight": rng.standard_normal((12, 16)).astype(np.float32),
        "decoder_proj.bias": rng.standard_normal(12).astype(np.float32),
        "output_linear.weight": rng.standard_normal((30, 12)).astype(np.float32),
        "output_linear.bias": rng.standard_normal(30).astype(np.float32),
    }
    dd = {
        "embedding.weight": rng.standard_normal((30, 16)).astype(np.float32),
        "conv.weight": rng.standard_normal((16, 4, 2)).astype(np.float32),
    }
    (tmp_path / "encoder-model.onnx").write_bytes(make_onnx(tensors))
    (tmp_path / "decoder-model.onnx").write_bytes(make_onnx(dd))
    (tmp_path / "joiner-model.onnx").write_bytes(make_onnx(jd))

    enc, dec, joi = load_zipformer_rnnt(str(tmp_path), zcfg, rcfg)
    for a, b in zip(jax.tree.leaves(enc), jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    x = rng.standard_normal((1, 87, 80)).astype(np.float32)
    out, _ = zipformer_encoder(enc, jnp.asarray(x),
                               jnp.asarray(np.array([87])), zcfg)
    assert np.isfinite(np.asarray(out)).all()

# ONNX wire parser tests against synthesized ONNX bytes.
import numpy as np
import pytest

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


def _node_proto(op, inputs, outputs, name="n", attrs=b""):
    out = b""
    for i in inputs:
        out += pw.write_field(1, 2, i.encode())
    for o in outputs:
        out += pw.write_field(2, 2, o.encode())
    out += pw.write_field(3, 2, name.encode())
    out += pw.write_field(4, 2, op.encode())
    out += attrs
    return out


def _const_node(name, arr):
    """(op, ins, outs, attr_bytes) tuple for a Constant node carrying a
    tensor `value` attribute — how some real exports ship weights."""
    attr = pw.write_field(1, 2, b"value") \
        + pw.write_field(5, 2, _tensor_proto("", arr))
    return ("Constant", [], [name], pw.write_field(5, 2, attr))


def _value_info(name):
    return pw.write_field(1, 2, name.encode())


def make_onnx(tensors, nodes=(), inputs=(), outputs=(), use_raw=True):
    graph = b""
    for entry in nodes:
        op, ins, outs = entry[:3]
        attrs = entry[3] if len(entry) > 3 else b""
        graph += pw.write_field(1, 2, _node_proto(op, ins, outs, attrs=attrs))
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


@pytest.mark.slow
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


def _vibert_tensors(src):
    """HF-named torch-layout tensors for a ViBERT param tree."""
    t = {
        "bert.embeddings.word_embeddings.weight": src["word_emb"],
        "bert.embeddings.position_embeddings.weight": src["pos_emb"],
        "bert.embeddings.token_type_embeddings.weight": src["type_emb"],
        "bert.embeddings.LayerNorm.weight": src["emb_ln"]["scale"],
        "bert.embeddings.LayerNorm.bias": src["emb_ln"]["bias"],
        "classifier.weight": src["labels_head"]["weight"].T,
        "classifier.bias": src["labels_head"]["bias"],
        "detector.weight": src["d_tags_head"]["weight"].T,
        "detector.bias": src["d_tags_head"]["bias"],
    }
    for i, lp in enumerate(src["layers"]):
        lb = f"bert.encoder.layer.{i}"
        for hf, ours in (("attention.self.query", "q"),
                         ("attention.self.key", "k"),
                         ("attention.self.value", "v"),
                         ("attention.output.dense", "attn_out"),
                         ("intermediate.dense", "ffn_in"),
                         ("output.dense", "ffn_out")):
            t[f"{lb}.{hf}.weight"] = lp[ours]["weight"].T
            t[f"{lb}.{hf}.bias"] = lp[ours]["bias"]
        for hf, ours in (("attention.output.LayerNorm", "attn_ln"),
                         ("output.LayerNorm", "ffn_ln")):
            t[f"{lb}.{hf}.weight"] = lp[ours]["scale"]
            t[f"{lb}.{hf}.bias"] = lp[ours]["bias"]
    return {k: np.asarray(v) for k, v in t.items()}


def test_vibert_roundtrip_via_name_map(tmp_path, rng):
    """Synthesize a ViBERT ONNX with HF initializer names from random
    params, import it, and check the forward matches the source params."""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.onnx_import import load_vibert
    from sherpa_vietnamese_asr_tpu.models.vibert import (
        TINY_VIBERT, init_vibert_params, vibert_forward,
    )

    src = init_vibert_params(jax.random.PRNGKey(7), TINY_VIBERT)
    t = _vibert_tensors(src)
    p = tmp_path / "vibert-capu.onnx"
    p.write_bytes(make_onnx(t))

    params, cfg = load_vibert(str(p))
    assert cfg.vocab_size == TINY_VIBERT.vocab_size
    assert cfg.layers == TINY_VIBERT.layers
    assert cfg.n_labels == TINY_VIBERT.n_labels
    # heads is inferred (hidden//64 floor 1) — force the true value for
    # the numeric check (same weights, head count changes the reshape).
    import dataclasses
    cfg = dataclasses.replace(cfg, heads=TINY_VIBERT.heads)

    ids = jnp.asarray(rng.integers(0, TINY_VIBERT.vocab_size, (2, 12)),
                      jnp.int32)
    mask = jnp.ones((2, 12), jnp.int32)
    types = jnp.zeros((2, 12), jnp.int32)
    offs = jnp.asarray(np.tile(np.arange(6), (2, 1)), jnp.int32)
    a1, b1 = vibert_forward(src, ids, mask, types, offs, TINY_VIBERT)
    a2, b2 = vibert_forward(params, ids, mask, types, offs, cfg)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)


def test_pyannet_roundtrip_via_name_map(tmp_path, rng):
    """Synthesize a PyanNet ONNX with pyannote state-dict names and check
    the imported forward matches the source params."""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.onnx_import import load_pyannet
    from sherpa_vietnamese_asr_tpu.models.pyannet import (
        PyanNetConfig, init_pyannet_params, pyannet_forward,
    )

    cfg = PyanNetConfig(sinc_filters=16, conv_channels=12, lstm_hidden=16,
                        lstm_layers=2, linear_dim=16)
    src = init_pyannet_params(jax.random.PRNGKey(5), cfg)
    # give the affine norms non-trivial values so the map is exercised
    for i in range(3):
        src["norms"][i]["scale"] = jnp.asarray(
            1.0 + 0.1 * rng.standard_normal(src["norms"][i]["scale"].shape),
            jnp.float32)
        src["norms"][i]["bias"] = jnp.asarray(
            0.1 * rng.standard_normal(src["norms"][i]["bias"].shape),
            jnp.float32)

    t = {
        "sincnet.conv1d.0.low_hz_": src["sinc_low_hz"],
        "sincnet.conv1d.0.band_hz_": src["sinc_band_hz"],
        "sincnet.wav_norm1d.weight": src["wav_norm"]["scale"],
        "sincnet.wav_norm1d.bias": src["wav_norm"]["bias"],
        "classifier.weight": src["classifier"]["weight"].T,
        "classifier.bias": src["classifier"]["bias"],
    }
    for i in range(3):
        t[f"sincnet.norm1d.{i}.weight"] = src["norms"][i]["scale"]
        t[f"sincnet.norm1d.{i}.bias"] = src["norms"][i]["bias"]
    for i, conv in enumerate(src["convs"]):
        t[f"sincnet.conv1d.{i + 1}.weight"] = np.transpose(
            np.asarray(conv["weight"]), (2, 1, 0))
        t[f"sincnet.conv1d.{i + 1}.bias"] = conv["bias"]
    for k, layer in enumerate(src["lstm"]):
        for sfx, d in (("", "fwd"), ("_reverse", "bwd")):
            t[f"lstm.weight_ih_l{k}{sfx}"] = np.asarray(layer[d]["wi"]).T
            t[f"lstm.weight_hh_l{k}{sfx}"] = np.asarray(layer[d]["wh"]).T
            # split our single bias arbitrarily into ih + hh parts
            b = np.asarray(layer[d]["b"])
            t[f"lstm.bias_ih_l{k}{sfx}"] = 0.25 * b
            t[f"lstm.bias_hh_l{k}{sfx}"] = 0.75 * b
    for i in (1, 2):
        t[f"linear.{i - 1}.weight"] = np.asarray(
            src[f"linear{i}"]["weight"]).T
        t[f"linear.{i - 1}.bias"] = src[f"linear{i}"]["bias"]
    t = {k: np.asarray(v) for k, v in t.items()}
    p = tmp_path / "segmentation-community-1.onnx"
    p.write_bytes(make_onnx(t))

    params, got_cfg = load_pyannet(str(p))
    assert got_cfg.sinc_filters == cfg.sinc_filters
    assert got_cfg.lstm_layers == cfg.lstm_layers

    audio = jnp.asarray(rng.standard_normal((1, 160000)).astype(np.float32)
                        * 0.1)
    a = np.asarray(pyannet_forward(src, audio, cfg))
    b = np.asarray(pyannet_forward(params, audio, got_cfg))
    np.testing.assert_allclose(a, b, atol=1e-5)


def _campp_inv_tensors(src):
    """3D-Speaker-named torch-layout tensors for a CAM++ param tree,
    built by inverting the name map's transforms."""
    from sherpa_vietnamese_asr_tpu.models.campplus import TINY_CAMPP
    from sherpa_vietnamese_asr_tpu.models.onnx_import import campp_name_map

    inv = {}
    for name, entry in campp_name_map(src, TINY_CAMPP).items():
        set_fn, transform = entry[0], entry[1]
        node = key = None
        for cell in set_fn.__closure__:
            v = cell.cell_contents
            if isinstance(v, str):
                key = v
            elif isinstance(v, dict):
                node = v
        arr = np.asarray(node[key])
        if transform is None:
            inv[name] = arr
        else:
            tname = transform.__name__
            if tname == "lin_t" or tname == "conv1x1_lin_t":
                inv[name] = arr.T if tname == "lin_t" else arr.T[:, :, None]
            elif tname == "conv2d_t":
                # [kT, kF, I, O] -> [O, I, kF, kT] (self-inverse)
                inv[name] = np.transpose(arr, (3, 2, 1, 0))
            elif tname == "conv1d_t":
                inv[name] = np.transpose(arr, (2, 1, 0))
            else:
                raise AssertionError(tname)
    return inv


def test_campp_roundtrip_via_name_map(tmp_path, rng):
    """Synthesize a CAM++ ONNX with 3D-Speaker state-dict names and check
    the imported embedding matches the source params."""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.campplus import (
        TINY_CAMPP, campp_embed, init_campp_params,
    )
    from sherpa_vietnamese_asr_tpu.models.onnx_import import (
        campp_name_map, load_campp,
    )

    src = init_campp_params(jax.random.PRNGKey(9), TINY_CAMPP)
    # randomize BN stats so the map is exercised
    def walk(node):
        if isinstance(node, dict):
            if "mean" in node and "var" in node:
                node["mean"] = jnp.asarray(
                    0.1 * rng.standard_normal(node["mean"].shape), jnp.float32)
                node["var"] = jnp.asarray(
                    1.0 + 0.1 * rng.random(node["var"].shape), jnp.float32)
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)
    walk(src)

    inv = _campp_inv_tensors(src)
    p = tmp_path / "campplus_cn_en_common_200k.onnx"
    p.write_bytes(make_onnx({k: np.ascontiguousarray(v)
                             for k, v in inv.items()}))

    params, cfg = load_campp(str(p))
    assert cfg.block_layers == TINY_CAMPP.block_layers
    assert cfg.embed_dim == TINY_CAMPP.embed_dim

    fb = jnp.asarray(rng.standard_normal((2, 150, 80)).astype(np.float32))
    a = np.asarray(campp_embed(src, fb, TINY_CAMPP))
    b = np.asarray(campp_embed(params, fb, cfg))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_convtasnet_roundtrip_via_name_map(tmp_path, rng):
    """Synthesize a Conv-TasNet ONNX with asteroid state-dict names and
    check the imported separation matches the source params."""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.convtasnet import (
        TINY_CONVTASNET, convtasnet_separate, init_convtasnet_params,
    )
    from sherpa_vietnamese_asr_tpu.models.onnx_import import (
        convtasnet_name_map, load_convtasnet,
    )

    src = init_convtasnet_params(jax.random.PRNGKey(11), TINY_CONVTASNET)
    # randomize prelus so the alpha mapping is exercised
    src["mask_prelu"] = jnp.asarray([0.1], jnp.float32)
    for blk in src["blocks"]:
        blk["prelu1"] = jnp.asarray([0.3], jnp.float32)
        blk["prelu2"] = jnp.asarray([0.15], jnp.float32)

    inv = {}
    for name, entry in convtasnet_name_map(
            src, TINY_CONVTASNET).items():
        set_fn, transform = entry[0], entry[1]
        node = key = None
        for cell in set_fn.__closure__:
            v = cell.cell_contents
            if isinstance(v, str):
                key = v
            elif isinstance(v, dict):
                node = v
        arr = np.asarray(node[key])
        tname = transform.__name__ if transform else None
        if tname is None:
            inv[name] = arr
        elif tname == "conv1d_t":
            inv[name] = np.transpose(arr, (2, 1, 0))
        elif tname == "squeeze_cn":
            inv[name] = arr.reshape(1, -1, 1)
        elif tname == "filters_dec":
            inv[name] = arr[:, None, :]
        else:
            raise AssertionError(tname)
    p = tmp_path / "convtasnet_16k.onnx"
    p.write_bytes(make_onnx({k: np.ascontiguousarray(v)
                             for k, v in inv.items()}))

    params, cfg = load_convtasnet(str(p))
    assert cfg.n_filters == TINY_CONVTASNET.n_filters
    assert cfg.n_repeats * cfg.n_blocks == (TINY_CONVTASNET.n_repeats
                                            * TINY_CONVTASNET.n_blocks)

    mix = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32) * 0.1)
    a = np.asarray(convtasnet_separate(src, mix, TINY_CONVTASNET))
    b = np.asarray(convtasnet_separate(params, mix, cfg))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_resnet_speaker_roundtrip_via_name_map(tmp_path, rng):
    """Synthesize embedding_encoder.onnx (wespeaker names under 'resnet.')
    + seg_1 .npy files, load, and check frame features + projection match."""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.onnx_import import (
        load_resnet_speaker, resnet_speaker_name_map,
    )
    from sherpa_vietnamese_asr_tpu.models.resnet_speaker import (
        TINY_RESNET, init_resnet_params, project_embedding,
        resnet_frame_features,
    )

    src = init_resnet_params(jax.random.PRNGKey(3), TINY_RESNET)
    # randomize BN stats so the map is exercised
    def walk(node):
        if isinstance(node, dict):
            if "mean" in node and "var" in node:
                node["mean"] = jnp.asarray(
                    0.1 * rng.standard_normal(node["mean"].shape),
                    jnp.float32)
                node["var"] = jnp.asarray(
                    1.0 + 0.1 * rng.random(node["var"].shape), jnp.float32)
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)
    walk(src)

    inv = {}
    for name, entry in resnet_speaker_name_map(
            src, TINY_RESNET).items():
        set_fn, transform = entry[0], entry[1]
        node = key = None
        for cell in set_fn.__closure__:
            v = cell.cell_contents
            if isinstance(v, str):
                key = v
            elif isinstance(v, dict):
                node = v
        arr = np.asarray(node[key])
        if transform is None:
            inv[name] = arr
        else:  # conv_t: [kT, kF, I, O] back to [O, I, kF, kT]
            inv[name] = np.transpose(arr, (3, 2, 1, 0))
    p = tmp_path / "embedding_encoder.onnx"
    p.write_bytes(make_onnx({k: np.ascontiguousarray(v)
                             for k, v in inv.items()}))
    np.save(tmp_path / "resnet_seg_1_weight.npy",
            np.asarray(src["proj"]["weight"]))
    np.save(tmp_path / "resnet_seg_1_bias.npy",
            np.asarray(src["proj"]["bias"]))

    params, cfg = load_resnet_speaker(
        str(p), str(tmp_path / "resnet_seg_1_weight.npy"),
        str(tmp_path / "resnet_seg_1_bias.npy"))
    assert cfg.blocks == TINY_RESNET.blocks
    assert cfg.embed_dim == TINY_RESNET.embed_dim

    fb = jnp.asarray(rng.standard_normal((2, 100, 80)).astype(np.float32))
    a = np.asarray(resnet_frame_features(src, fb, TINY_RESNET))
    b = np.asarray(resnet_frame_features(params, fb, cfg))
    np.testing.assert_allclose(a, b, atol=1e-5)
    stats = jnp.asarray(rng.standard_normal(
        (2, 2 * TINY_RESNET.frame_feature_dim)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(project_embedding(src, stats)),
        np.asarray(project_embedding(params, stats)), atol=1e-5)


# ---- realistic export perturbations (VERDICT round-2 #5b) ----------------
# Real exports differ from idealized synthesized ones: renamed
# initializers, BatchNorm constant-folded into convs, weights shipped as
# Constant nodes (reference build-portable/prepare_offline_build.py
# conversions exhibit all three). Each perturbation is applied to a
# synthesized export and the import must still reproduce the forward.


def test_fallback_match_opaque_renames(tmp_path, rng):
    """Every ViBERT initializer renamed to an opaque symbol (file order =
    state-dict order, as torch exports keep): the importer must resolve
    purely by destination shape + file order."""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.onnx_import import (
        load_vibert, vibert_name_map,
    )
    from sherpa_vietnamese_asr_tpu.models.vibert import (
        TINY_VIBERT, init_vibert_params, vibert_forward,
    )

    src = init_vibert_params(jax.random.PRNGKey(3), TINY_VIBERT)
    t = _vibert_tensors(src)
    order = [k for k in vibert_name_map(src, TINY_VIBERT) if k in t]
    assert len(order) == len(t)  # map covers the whole export
    renamed = {f"p{i:03d}": t[k] for i, k in enumerate(order)}
    p = tmp_path / "vibert-renamed.onnx"
    p.write_bytes(make_onnx(renamed))

    params, cfg = load_vibert(str(p), cfg=TINY_VIBERT)
    ids = jnp.asarray(rng.integers(0, TINY_VIBERT.vocab_size, (2, 12)),
                      jnp.int32)
    mask = jnp.ones((2, 12), jnp.int32)
    types = jnp.zeros((2, 12), jnp.int32)
    offs = jnp.asarray(np.tile(np.arange(6), (2, 1)), jnp.int32)
    a1, b1 = vibert_forward(src, ids, mask, types, offs, TINY_VIBERT)
    a2, b2 = vibert_forward(params, ids, mask, types, offs, cfg)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)


def test_campp_folded_bn_group_defaults(tmp_path, rng):
    """Exporter constant-folds BatchNorm into the preceding conv: the BN
    initializer group vanishes from the file. The importer must fill
    identity stats (scale=1, bias=0, mean=0, var=1-eps) so the folded
    graph is reproduced exactly."""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.campplus import (
        TINY_CAMPP, campp_embed, init_campp_params,
    )
    from sherpa_vietnamese_asr_tpu.models.onnx_import import (
        campp_name_map, load_campp,
    )

    src = init_campp_params(jax.random.PRNGKey(11), TINY_CAMPP)
    # Source BN at exact identity — what a folded graph is equivalent to.
    def walk(node):
        if isinstance(node, dict):
            if "mean" in node and "var" in node:
                node["mean"] = jnp.zeros_like(node["mean"])
                node["var"] = jnp.full_like(node["var"], 1.0 - 1e-5)
                if "scale" in node:
                    node["scale"] = jnp.ones_like(node["scale"])
                if "bias" in node:
                    node["bias"] = jnp.zeros_like(node["bias"])
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)
    walk(src)

    inv = _campp_inv_tensors(src)
    grouped = {k for k, e in campp_name_map(src, TINY_CAMPP).items()
               if len(e) == 4}
    assert grouped  # the map declares BN fold groups
    for k in grouped:
        inv.pop(k)
    p = tmp_path / "campplus_folded.onnx"
    p.write_bytes(make_onnx({k: np.ascontiguousarray(v)
                             for k, v in inv.items()}))

    params, cfg = load_campp(str(p))
    fb = jnp.asarray(rng.standard_normal((2, 150, 80)).astype(np.float32))
    a = np.asarray(campp_embed(src, fb, TINY_CAMPP))
    b = np.asarray(campp_embed(params, fb, cfg))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_campp_partial_bn_group_raises(tmp_path, rng):
    """A PARTIALLY missing BN group is a mapping bug, not a fold — it
    must raise ImportReport, not silently default."""
    import jax
    import pytest

    from sherpa_vietnamese_asr_tpu.models.campplus import (
        TINY_CAMPP, init_campp_params,
    )
    from sherpa_vietnamese_asr_tpu.models.onnx_import import (
        ImportReport, campp_name_map, load_campp,
    )

    src = init_campp_params(jax.random.PRNGKey(12), TINY_CAMPP)
    inv = _campp_inv_tensors(src)
    grouped = sorted(k for k, e in campp_name_map(src, TINY_CAMPP).items()
                     if len(e) == 4 and k.endswith(".running_mean"))
    inv.pop(grouped[0])  # drop ONE member of one group
    p = tmp_path / "campplus_partial.onnx"
    p.write_bytes(make_onnx({k: np.ascontiguousarray(v)
                             for k, v in inv.items()}))
    with pytest.raises(ImportReport):
        load_campp(str(p))


def test_campp_renamed_bn_stats_load_real_values(tmp_path, rng):
    """ALL initializers renamed (incl. BatchNorm stats, which the map
    declares as identity-default groups): the renamed-but-PRESENT stats
    must be fallback-matched and loaded, never silently replaced by the
    identity defaults — defaults are only for genuinely folded groups."""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.campplus import (
        TINY_CAMPP, campp_embed, init_campp_params,
    )
    from sherpa_vietnamese_asr_tpu.models.onnx_import import (
        campp_name_map, load_campp,
    )

    src = init_campp_params(jax.random.PRNGKey(13), TINY_CAMPP)
    # Non-identity BN stats so defaulting them is observable in the output.
    def walk(node):
        if isinstance(node, dict):
            if "mean" in node and "var" in node:
                node["mean"] = jnp.asarray(
                    0.3 * rng.standard_normal(node["mean"].shape), jnp.float32)
                node["var"] = jnp.asarray(
                    1.0 + 0.5 * rng.random(node["var"].shape), jnp.float32)
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)
    walk(src)

    inv = _campp_inv_tensors(src)
    order = [k for k in campp_name_map(src, TINY_CAMPP) if k in inv]
    assert len(order) == len(inv)
    renamed = {f"w{i:04d}": np.ascontiguousarray(inv[k])
               for i, k in enumerate(order)}
    p = tmp_path / "campplus_renamed.onnx"
    p.write_bytes(make_onnx(renamed))

    # cfg passed explicitly: config inference reads anchor tensors by name,
    # which a fully-renamed export cannot satisfy (same as the ViBERT
    # opaque-rename test). The subject here is weight mapping, not
    # inference.
    params, cfg = load_campp(str(p), cfg=TINY_CAMPP)
    fb = jnp.asarray(rng.standard_normal((2, 150, 80)).astype(np.float32))
    a = np.asarray(campp_embed(src, fb, TINY_CAMPP))
    b = np.asarray(campp_embed(params, fb, cfg))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pyannet_fallback_bias_ih_keeps_hh_sum(tmp_path, rng):
    """bias_ih renamed while bias_hh keeps its name: the import must still
    produce gate bias = bias_ih + bias_hh. (Regression: fallback matches
    were once applied AFTER the name pass, so the late bias_ih setter
    overwrote the already-accumulated bias_hh adder contribution.)"""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.onnx_import import load_pyannet
    from sherpa_vietnamese_asr_tpu.models.pyannet import (
        PyanNetConfig, init_pyannet_params, pyannet_forward,
    )

    cfg = PyanNetConfig(sinc_filters=16, conv_channels=12, lstm_hidden=16,
                        lstm_layers=1, linear_dim=16)
    src = init_pyannet_params(jax.random.PRNGKey(6), cfg)
    t = {
        "sincnet.conv1d.0.low_hz_": src["sinc_low_hz"],
        "sincnet.conv1d.0.band_hz_": src["sinc_band_hz"],
        "sincnet.wav_norm1d.weight": src["wav_norm"]["scale"],
        "sincnet.wav_norm1d.bias": src["wav_norm"]["bias"],
        "classifier.weight": src["classifier"]["weight"].T,
        "classifier.bias": src["classifier"]["bias"],
    }
    for i in range(3):
        t[f"sincnet.norm1d.{i}.weight"] = src["norms"][i]["scale"]
        t[f"sincnet.norm1d.{i}.bias"] = src["norms"][i]["bias"]
    for i, conv in enumerate(src["convs"]):
        t[f"sincnet.conv1d.{i + 1}.weight"] = np.transpose(
            np.asarray(conv["weight"]), (2, 1, 0))
        t[f"sincnet.conv1d.{i + 1}.bias"] = conv["bias"]
    for k, layer in enumerate(src["lstm"]):
        for sfx, d in (("", "fwd"), ("_reverse", "bwd")):
            t[f"lstm.weight_ih_l{k}{sfx}"] = np.asarray(layer[d]["wi"]).T
            t[f"lstm.weight_hh_l{k}{sfx}"] = np.asarray(layer[d]["wh"]).T
            b = np.asarray(layer[d]["b"])
            t[f"lstm.bias_ih_l{k}{sfx}"] = 0.25 * b
            t[f"lstm.bias_hh_l{k}{sfx}"] = 0.75 * b
    for i in (1, 2):
        t[f"linear.{i - 1}.weight"] = np.asarray(
            src[f"linear{i}"]["weight"]).T
        t[f"linear.{i - 1}.bias"] = src[f"linear{i}"]["bias"]
    t = {k: np.asarray(v) for k, v in t.items()}
    t["renamed_opaque_0"] = t.pop("lstm.bias_ih_l0")  # the perturbation
    p = tmp_path / "segmentation-community-1.onnx"
    p.write_bytes(make_onnx(t))

    params, got_cfg = load_pyannet(str(p))
    audio = jnp.asarray(rng.standard_normal((1, 80000)).astype(np.float32)
                        * 0.1)
    a = np.asarray(pyannet_forward(src, audio, cfg))
    b = np.asarray(pyannet_forward(params, audio, got_cfg))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_constant_node_weights_fold(tmp_path, rng):
    """Weights shipped as Constant nodes (not graph initializers) must be
    folded into the initializer table by read_onnx; config inference and
    the name map then see them uniformly."""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.onnx_import import load_vibert
    from sherpa_vietnamese_asr_tpu.models.vibert import (
        TINY_VIBERT, init_vibert_params, vibert_forward,
    )

    src = init_vibert_params(jax.random.PRNGKey(4), TINY_VIBERT)
    t = _vibert_tensors(src)
    consts = []
    for name in ("classifier.weight", "detector.weight"):
        consts.append(_const_node(name, t.pop(name)))
    p = tmp_path / "vibert-const.onnx"
    p.write_bytes(make_onnx(t, nodes=consts))

    params, cfg = load_vibert(str(p))  # cfg inference reads the constants
    assert cfg.n_labels == TINY_VIBERT.n_labels
    import dataclasses
    cfg = dataclasses.replace(cfg, heads=TINY_VIBERT.heads)
    ids = jnp.asarray(rng.integers(0, TINY_VIBERT.vocab_size, (2, 12)),
                      jnp.int32)
    mask = jnp.ones((2, 12), jnp.int32)
    types = jnp.zeros((2, 12), jnp.int32)
    offs = jnp.asarray(np.tile(np.arange(6), (2, 1)), jnp.int32)
    a1, b1 = vibert_forward(src, ids, mask, types, offs, TINY_VIBERT)
    a2, b2 = vibert_forward(params, ids, mask, types, offs, cfg)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)

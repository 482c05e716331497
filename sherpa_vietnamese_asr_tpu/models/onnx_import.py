# ONNX checkpoint importer: extract initializers from .onnx files and map
# them into this framework's JAX parameter pytrees.
#
# The reference app distributes every model as ONNX with pinned SHA256
# (reference build-portable/prepare_offline_build.py:21-242). This
# environment has no `onnx` package and no model assets, so the importer is
# built on the minimal wire parser in utils/protowire.py and validated
# against synthesized ONNX bytes in tests. When real checkpoints are present,
# load_zipformer_rnnt() maps torch-export initializer names into the pytrees
# of models/zipformer.py and models/rnnt.py; any unmatched or missing tensors
# raise with a full diagnostic listing so name-map gaps are explicit rather
# than silent.

from __future__ import annotations

import os
import struct

import numpy as np

from sherpa_vietnamese_asr_tpu.utils import protowire as pw

# ONNX field numbers (onnx/onnx.proto)
_MODEL_GRAPH = 7
_GRAPH_NODE = 1
_GRAPH_INITIALIZER = 5
_GRAPH_INPUT = 11
_GRAPH_OUTPUT = 12
_TENSOR_DIMS = 1
_TENSOR_DATA_TYPE = 2
_TENSOR_SEGMENT = 3
_TENSOR_FLOAT_DATA = 4
_TENSOR_INT32_DATA = 5
_TENSOR_STRING_DATA = 6
_TENSOR_INT64_DATA = 7
_TENSOR_NAME = 8
_TENSOR_RAW_DATA = 9
_TENSOR_DOUBLE_DATA = 10
_NODE_INPUT = 1
_NODE_OUTPUT = 2
_NODE_NAME = 3
_NODE_OP_TYPE = 4
_VALUEINFO_NAME = 1

_DTYPE = {
    1: np.dtype("<f4"), 2: np.dtype("u1"), 3: np.dtype("i1"),
    4: np.dtype("<u2"), 5: np.dtype("<i2"), 6: np.dtype("<i4"),
    7: np.dtype("<i8"), 9: np.dtype("bool"), 10: np.dtype("<f2"),
    11: np.dtype("<f8"), 12: np.dtype("<u4"), 13: np.dtype("<u8"),
}


def _decode_tensor(buf: bytes):
    f = pw.parse_fields(buf)
    name = f.get(_TENSOR_NAME, [b""])[0].decode("utf-8")
    dims = []
    for d in f.get(_TENSOR_DIMS, []):
        if isinstance(d, bytes):  # packed repeated
            dims.extend(pw.parse_packed_varints(d))
        else:
            dims.append(d)
    dtype_id = f.get(_TENSOR_DATA_TYPE, [1])[0]
    dt = _DTYPE.get(dtype_id)
    if dt is None:
        raise ValueError(f"tensor {name}: unsupported data_type {dtype_id}")
    if _TENSOR_RAW_DATA in f:
        arr = np.frombuffer(f[_TENSOR_RAW_DATA][0], dt)
    elif _TENSOR_FLOAT_DATA in f:
        vals = f[_TENSOR_FLOAT_DATA]
        if len(vals) == 1 and isinstance(vals[0], bytes):
            arr = np.frombuffer(vals[0], "<f4")
        else:  # unpacked fixed32 values
            arr = np.array([struct.unpack("<f", struct.pack("<I", v))[0]
                            for v in vals], np.float32)
    elif _TENSOR_INT64_DATA in f:
        vals = f[_TENSOR_INT64_DATA]
        if len(vals) == 1 and isinstance(vals[0], bytes):
            arr = np.array(pw.parse_packed_varints(vals[0]), np.int64)
        else:
            arr = np.array(vals, np.int64)
    elif _TENSOR_INT32_DATA in f:
        vals = f[_TENSOR_INT32_DATA]
        if len(vals) == 1 and isinstance(vals[0], bytes):
            raw = np.array(pw.parse_packed_varints(vals[0]), np.int64)
        else:
            raw = np.array(vals, np.int64)
        if dtype_id == 10:  # fp16 stored in int32_data
            arr = raw.astype(np.uint16).view(np.float16)
        else:
            arr = raw.astype(dt)
    elif _TENSOR_DOUBLE_DATA in f:
        vals = f[_TENSOR_DOUBLE_DATA]
        arr = np.array([struct.unpack("<d", struct.pack("<Q", v))[0]
                        for v in vals], np.float64)
    else:
        arr = np.zeros(0, dt)
    shape = tuple(int(d) for d in dims)
    if shape:
        arr = arr.reshape(shape)
    if arr.dtype in (np.float16, np.float64):
        arr = arr.astype(np.float32)
    return name, arr


def read_onnx(path_or_bytes):
    """Parse an ONNX file.

    Returns dict with:
      initializers: {name: np.ndarray}
      nodes: [(op_type, [inputs], [outputs], name)]
      inputs / outputs: [names]
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    model = pw.parse_fields(buf)
    if _MODEL_GRAPH not in model:
        raise ValueError("no graph in ONNX model")
    graph = pw.parse_fields(model[_MODEL_GRAPH][0])

    initializers = {}
    for t in graph.get(_GRAPH_INITIALIZER, []):
        name, arr = _decode_tensor(t)
        initializers[name] = arr

    nodes = []
    for nb in graph.get(_GRAPH_NODE, []):
        nf = pw.parse_fields(nb)
        nodes.append((
            nf.get(_NODE_OP_TYPE, [b""])[0].decode(),
            [x.decode() for x in nf.get(_NODE_INPUT, [])],
            [x.decode() for x in nf.get(_NODE_OUTPUT, [])],
            nf.get(_NODE_NAME, [b""])[0].decode(),
        ))

    def names(field):
        out = []
        for vb in graph.get(field, []):
            vf = pw.parse_fields(vb)
            out.append(vf.get(_VALUEINFO_NAME, [b""])[0].decode())
        return out

    return {
        "initializers": initializers,
        "nodes": nodes,
        "inputs": names(_GRAPH_INPUT),
        "outputs": names(_GRAPH_OUTPUT),
    }


# ---------------------------------------------------------------------------
# Name mapping into framework pytrees
# ---------------------------------------------------------------------------

def _strip_prefixes(initializers):
    """Torch ONNX exports may prefix state-dict names (e.g. 'encoder.');
    normalize by stripping common wrapper prefixes."""
    out = {}
    for k, v in initializers.items():
        k2 = k
        for pre in ("onnx::", "model.", "module."):
            if k2.startswith(pre):
                k2 = k2[len(pre):]
        out[k2] = v
    return out


class ImportReport(Exception):
    pass


def map_initializers(initializers, name_map, strict=True, label=""):
    """Apply {source_name: (set_fn, transform)} over initializers.

    set_fn(np_array) writes into the destination pytree; transform is applied
    first (None = identity). Raises ImportReport listing missing/unused names
    when strict.
    """
    missing, used = [], set()
    for src, (set_fn, transform) in name_map.items():
        if src not in initializers:
            missing.append(src)
            continue
        arr = initializers[src]
        set_fn(arr if transform is None else transform(arr))
        used.add(src)
    if strict and missing:
        unused = sorted(set(initializers) - used)
        raise ImportReport(
            f"[{label}] {len(missing)} expected tensors missing, e.g. "
            f"{missing[:8]}; {len(unused)} unmatched in file, e.g. "
            f"{unused[:8]}")
    return missing


def load_zipformer_rnnt(model_dir, zcfg, rcfg):
    """Load encoder/decoder/joiner ONNX files into framework pytrees.

    File discovery matches the reference (core/asr_engine.py:913-925):
    encoder-*/decoder-*/joiner-*.onnx preferring non-int8 variants.
    NOTE: the initializer name map must be validated against a real
    checkpoint; until then this raises ImportReport with diagnostics that
    list the actual names found, to make completing the map mechanical.
    """
    def find(prefix):
        files = [f for f in os.listdir(model_dir)
                 if f.startswith(prefix) and f.endswith(".onnx")]
        fl = [f for f in files if "int8" not in f]
        pick = (fl or files)
        if not pick:
            raise FileNotFoundError(f"no {prefix}*.onnx in {model_dir}")
        return os.path.join(model_dir, sorted(pick)[0])

    enc = read_onnx(find("encoder-"))
    dec = read_onnx(find("decoder-"))
    joi = read_onnx(find("joiner-"))
    enc_init = _strip_prefixes(enc["initializers"])
    dec_init = _strip_prefixes(dec["initializers"])
    joi_init = _strip_prefixes(joi["initializers"])

    # Joiner: 3 linear layers (encoder_proj/decoder_proj/output_linear).
    from sherpa_vietnamese_asr_tpu.models.rnnt import (
        init_decoder_params, init_joiner_params,
    )
    import jax

    joi_params = init_joiner_params(jax.random.PRNGKey(0), rcfg)
    dec_params = init_decoder_params(jax.random.PRNGKey(0), rcfg)

    import jax.numpy as jnp

    def setter(tree, *path):
        def set_fn(arr):
            node = tree
            for p in path[:-1]:
                node = node[p]
            node[path[-1]] = jnp.asarray(arr)
        return set_fn

    t = np.ascontiguousarray
    joi_map = {
        "encoder_proj.weight": (setter(joi_params, "encoder_proj", "weight"),
                                lambda a: t(a.T)),
        "encoder_proj.bias": (setter(joi_params, "encoder_proj", "bias"), None),
        "decoder_proj.weight": (setter(joi_params, "decoder_proj", "weight"),
                                lambda a: t(a.T)),
        "decoder_proj.bias": (setter(joi_params, "decoder_proj", "bias"), None),
        "output_linear.weight": (setter(joi_params, "output", "weight"),
                                 lambda a: t(a.T)),
        "output_linear.bias": (setter(joi_params, "output", "bias"), None),
    }
    dec_map = {
        "embedding.weight": (setter(dec_params, "embedding"), None),
        "conv.weight": (setter(dec_params, "conv_weight"), None),
    }
    map_initializers(joi_init, joi_map, label="joiner")
    map_initializers(dec_init, dec_map, label="decoder")

    # Encoder mapping is large; raise a diagnostic report until validated
    # against a real checkpoint (no model assets ship in this environment).
    raise ImportReport(
        "Zipformer encoder ONNX name-map pending validation against a real "
        f"checkpoint. Found {len(enc_init)} initializers, e.g. "
        f"{sorted(enc_init)[:12]}")

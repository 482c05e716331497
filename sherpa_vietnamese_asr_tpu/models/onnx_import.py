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
_NODE_ATTRIBUTE = 5
_VALUEINFO_NAME = 1
# AttributeProto fields (onnx/onnx.proto)
_ATTR_NAME = 1
_ATTR_F = 2
_ATTR_I = 3
_ATTR_S = 4
_ATTR_T = 5
_ATTR_FLOATS = 7
_ATTR_INTS = 8
_ATTR_STRINGS = 9
_ATTR_TYPE = 20

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


def _i64(v: int) -> int:
    """Varint-decoded int64 two's-complement sign fix."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _decode_attribute(buf: bytes):
    """AttributeProto -> (name, python value).

    Type resolution follows the wire content rather than the `type` enum so
    synthesized files may omit it: tensor > s > floats > ints > f > i.
    """
    f = pw.parse_fields(buf)
    name = f.get(_ATTR_NAME, [b""])[0].decode()
    if _ATTR_T in f:
        _, arr = _decode_tensor(f[_ATTR_T][0])
        return name, arr
    if _ATTR_STRINGS in f:
        return name, [s.decode("utf-8", "replace") for s in f[_ATTR_STRINGS]]
    if _ATTR_FLOATS in f:
        vals = []
        for v in f[_ATTR_FLOATS]:
            if isinstance(v, bytes):  # packed fixed32
                vals.extend(np.frombuffer(v, "<f4").tolist())
            else:
                vals.append(struct.unpack("<f", struct.pack("<I", v))[0])
        return name, vals
    if _ATTR_INTS in f:
        vals = []
        for v in f[_ATTR_INTS]:
            if isinstance(v, bytes):  # packed varints
                vals.extend(_i64(x) for x in pw.parse_packed_varints(v))
            else:
                vals.append(_i64(v))
        return name, vals
    if _ATTR_S in f:
        return name, f[_ATTR_S][0].decode("utf-8", "replace")
    if _ATTR_F in f:
        return name, struct.unpack("<f", struct.pack("<I", f[_ATTR_F][0]))[0]
    if _ATTR_I in f:
        return name, _i64(f[_ATTR_I][0])
    return name, None


def read_onnx(path_or_bytes):
    """Parse an ONNX file.

    Returns dict with:
      initializers: {name: np.ndarray}
      nodes: [(op_type, [inputs], [outputs], name)]
      attrs: [{attr_name: value}] aligned with nodes
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

    nodes, attrs = [], []
    for nb in graph.get(_GRAPH_NODE, []):
        nf = pw.parse_fields(nb)
        nodes.append((
            nf.get(_NODE_OP_TYPE, [b""])[0].decode(),
            [x.decode() for x in nf.get(_NODE_INPUT, [])],
            [x.decode() for x in nf.get(_NODE_OUTPUT, [])],
            nf.get(_NODE_NAME, [b""])[0].decode(),
        ))
        attrs.append(dict(_decode_attribute(ab)
                          for ab in nf.get(_NODE_ATTRIBUTE, [])))
        # Constant-node weights: some real exports carry tensors as
        # Constant nodes instead of graph initializers — fold them in so
        # importer name maps see them uniformly.
        op, _ins, outs, _nm = nodes[-1]
        if op == "Constant" and outs and "value" in attrs[-1] \
                and outs[0] not in initializers:
            val = attrs[-1]["value"]
            if isinstance(val, np.ndarray):
                initializers[outs[0]] = val

    def names(field):
        out = []
        for vb in graph.get(field, []):
            vf = pw.parse_fields(vb)
            out.append(vf.get(_VALUEINFO_NAME, [b""])[0].decode())
        return out

    return {
        "initializers": initializers,
        "nodes": nodes,
        "attrs": attrs,
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


def _dest_array(set_fn):
    """Read the destination leaf a setter closure writes to (its current
    randomly-initialized value — gives the expected post-transform shape)."""
    fv = set_fn.__code__.co_freevars
    cells = {n: c.cell_contents for n, c in zip(fv, set_fn.__closure__)}
    if "node" in cells and "key" in cells:
        return np.asarray(cells["node"][cells["key"]])
    if "tree" in cells and "path" in cells:
        node = cells["tree"]
        for p in cells["path"][:-1]:
            node = node[p]
        return np.asarray(node[cells["path"][-1]])
    raise TypeError("unrecognized setter closure layout")


def _entry(e):
    """Name-map entry -> (set_fn, transform, group, default). Entries are
    2-tuples normally; 4-tuples add an all-or-nothing default group (e.g.
    BatchNorm folded into the preceding conv by the exporter)."""
    if len(e) == 2:
        return e[0], e[1], None, None
    return e[0], e[1], e[2], e[3]


def _fallback_match(initializers, name_map, missing, used, label=""):
    """Topology/shape-based matching for renamed initializers.

    For each missing expected name, candidate file tensors are those whose
    transformed shape equals the destination leaf's shape; ties resolve by
    Hungarian assignment over name similarity + file-order distance (torch
    exports keep state-dict order). Returns {expected_name: actual_name} or
    raises ImportReport when the assignment is infeasible/ambiguous.
    """
    import difflib

    unused = [k for k in initializers if k not in used]
    if not unused:
        raise ImportReport(
            f"[{label}] {len(missing)} expected tensors missing and no "
            f"unmatched tensors left in the file, e.g. {missing[:8]}")
    exp_pos = {k: i for i, k in enumerate(name_map)}
    act_pos = {k: i for i, k in enumerate(initializers)}
    n_exp = max(len(name_map) - 1, 1)
    n_act = max(len(initializers) - 1, 1)
    big = 1e9
    cost = np.full((len(missing), len(unused)), big, np.float64)
    for i, e in enumerate(missing):
        set_fn, transform, _g, _d = _entry(name_map[e])
        dest_shape = np.shape(_dest_array(set_fn))
        for j, a in enumerate(unused):
            arr = initializers[a]
            try:
                t = arr if transform is None else transform(arr)
            except Exception:
                continue
            if np.shape(np.asarray(t)) != dest_shape:
                continue
            # Order is the reliable signal (torch exports keep state-dict
            # order); name similarity only breaks ties — with opaque
            # renames its noise must stay below one position step.
            sim = difflib.SequenceMatcher(None, e, a).ratio()
            order = abs(exp_pos[e] / n_exp - act_pos[a] / n_act)
            cost[i, j] = order + 0.05 * (1.0 - sim)
    from scipy.optimize import linear_sum_assignment
    # Pad rectangular: scipy handles len(missing) <= len(unused); if more
    # expected than available, it's infeasible anyway.
    if len(missing) > len(unused):
        raise ImportReport(
            f"[{label}] {len(missing)} expected tensors missing but only "
            f"{len(unused)} unmatched tensors in the file")
    rows, cols = linear_sum_assignment(cost)
    out = {}
    for i, j in zip(rows, cols):
        if cost[i, j] >= big:
            raise ImportReport(
                f"[{label}] no shape-compatible tensor in the file for "
                f"expected '{missing[i]}' (fallback matching failed)")
        out[missing[i]] = unused[j]
    return out


def map_initializers(initializers, name_map, strict=True, label="",
                     fallback_match=False):
    """Apply {source_name: (set_fn, transform[, group, default])} over
    initializers.

    set_fn(np_array) writes into the destination pytree; transform is applied
    first (None = identity). Grouped entries with defaults (see _entry) are
    filled with the default when the WHOLE group is absent — e.g. BatchNorm
    stats constant-folded into the conv by the exporter. With
    fallback_match=True, remaining missing names are resolved against
    unmatched file tensors by shape + name-similarity + file order
    (_fallback_match); real exports rename initializers freely. Raises
    ImportReport listing missing/unused names when strict.
    """
    # Two phases: RESOLVE every expected name to a file tensor (or a group
    # default), THEN apply in name_map definition order. Interleaving the
    # two (as an earlier version did) breaks accumulating setters — a
    # fallback-matched `bias_ih` setter applied after the name-matched
    # `bias_hh` adder silently dropped bias_hh from the LSTM gate bias.
    matches = {}  # expected name -> actual file name
    missing = []
    for src in name_map:
        if src in initializers:
            matches[src] = src
        else:
            missing.append(src)
    used = set(matches.values())
    defaulted = set()
    if missing:
        groups = {}
        for src, e in name_map.items():
            _s, _t, g, _d = _entry(e)
            if g is not None:
                groups.setdefault(g, []).append(src)
        # Groups missing in FULL are candidates for defaults (exporter
        # folded them, e.g. BatchNorm into the preceding conv). A partially
        # present group is treated as plain renames: its missing members
        # must fallback-match or the strict check surfaces them.
        whole_groups = [g for g, members in groups.items()
                        if all(m in missing for m in members)]
        in_whole_group = {m for g in whole_groups for m in groups[g]}
        plain_missing = [m for m in missing if m not in in_whole_group]
        if plain_missing and fallback_match:
            matched = _fallback_match(initializers, name_map, plain_missing,
                                      used, label=label)
            matches.update(matched)
            used.update(matched.values())
        if fallback_match:
            # Renamed-but-present beats identity defaults: only default a
            # group when no shape-compatible unused tensors exist for ALL
            # of its members (a renamed BN that still ships its stats must
            # load them — identity stats would be silently wrong).
            for g in whole_groups:
                members = groups[g]
                try:
                    gm = _fallback_match(initializers, name_map, members,
                                         used, label=label)
                except ImportReport:
                    gm = None
                if gm is not None and len(gm) == len(members):
                    matches.update(gm)
                    used.update(gm.values())
                else:
                    defaulted.update(members)
        else:
            defaulted.update(in_whole_group)
    # Apply in name_map order (setters before their adders).
    for src, e in name_map.items():
        set_fn, transform, _g, default = _entry(e)
        if src in matches:
            arr = initializers[matches[src]]
            set_fn(arr if transform is None else transform(arr))
        elif src in defaulted:
            dest = _dest_array(set_fn)
            set_fn(np.full(dest.shape, default, np.float32))
    missing = [m for m in name_map if m not in matches and m not in defaulted]
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
    map_initializers(joi_init, joi_map, label="joiner",
                     fallback_match=True)
    map_initializers(dec_init, dec_map, label="decoder",
                     fallback_match=True)

    import jax

    from sherpa_vietnamese_asr_tpu.models.zipformer import (
        init_zipformer_params,
    )

    enc_params = init_zipformer_params(jax.random.PRNGKey(0), zcfg)
    enc_map = zipformer_name_map(enc_params, zcfg)
    missing = map_initializers(enc_init, enc_map, strict=False,
                               label="encoder")
    if missing:
        # Real exports may rename initializers (wrapper prefixes, opset
        # rewrites); resolve the remainder by shape + file order + name
        # similarity before giving up with a full diagnostic.
        try:
            map_initializers(enc_init, enc_map, strict=True, label="encoder",
                             fallback_match=True)
        except ImportReport:
            unused = sorted(set(enc_init) - set(enc_map))
            raise ImportReport(
                f"[encoder] {len(missing)}/{len(enc_map)} expected tensors "
                f"missing even after shape/topology fallback, e.g. "
                f"{missing[:6]}; {len(unused)} unmatched names in the file, "
                f"e.g. {unused[:12]}")
    return enc_params, dec_params, joi_params


def zipformer_name_map(params, zcfg):
    """Expected torch state-dict initializer names -> pytree setters for the
    Zipformer2 encoder (icefall zipformer.py module naming). Transforms:
    torch Linear [out,in] -> [in,out]; Conv2d [out,in,kh,kw] -> HWIO;
    depthwise Conv1d [ch,1,k] -> [k,ch]."""
    import jax.numpy as jnp
    import numpy as np

    def setter(node, key):
        def set_fn(arr):
            node[key] = jnp.asarray(arr)
        return set_fn

    def lin_t(a):
        return np.ascontiguousarray(a.T)

    def conv2d_t(a):  # [O, I, kh, kw] -> [kh, kw, I, O]
        return np.ascontiguousarray(np.transpose(a, (2, 3, 1, 0)))

    def dw1d_t(a):  # [C, 1, K] -> [K, C]
        return np.ascontiguousarray(np.transpose(a[:, 0, :], (1, 0)))

    m = {}
    emb = params["encoder_embed"]
    # Conv2dSubsampling convs are a Sequential with activations between:
    # indices 0, 2, 4 in icefall's zipformer2 subsampling.
    for src_idx, dst in (("0", "conv1"), ("2", "conv2"), ("4", "conv3")):
        m[f"encoder_embed.conv.{src_idx}.weight"] = (
            setter(emb[dst], "weight"), conv2d_t)
        m[f"encoder_embed.conv.{src_idx}.bias"] = (
            setter(emb[dst], "bias"), None)
    m["encoder_embed.convnext.depthwise_conv.weight"] = (
        setter(emb["convnext_dw"], "weight"), conv2d_t)
    m["encoder_embed.convnext.depthwise_conv.bias"] = (
        setter(emb["convnext_dw"], "bias"), None)
    m["encoder_embed.convnext.pointwise_conv1.weight"] = (
        setter(emb["convnext_pw1"], "weight"),
        lambda a: lin_t(a.reshape(a.shape[0], -1)))
    m["encoder_embed.convnext.pointwise_conv1.bias"] = (
        setter(emb["convnext_pw1"], "bias"), None)
    m["encoder_embed.convnext.pointwise_conv2.weight"] = (
        setter(emb["convnext_pw2"], "weight"),
        lambda a: lin_t(a.reshape(a.shape[0], -1)))
    m["encoder_embed.convnext.pointwise_conv2.bias"] = (
        setter(emb["convnext_pw2"], "bias"), None)
    m["encoder_embed.out.weight"] = (setter(emb["out"], "weight"), lin_t)
    m["encoder_embed.out.bias"] = (setter(emb["out"], "bias"), None)
    m["encoder_embed.out_norm.bias"] = (setter(emb["out_norm"], "bias"), None)
    m["encoder_embed.out_norm.log_scale"] = (
        setter(emb["out_norm"], "log_scale"), None)

    for i, stack in enumerate(params["stacks"]):
        ds = zcfg.downsampling_factor[i]
        # Non-downsampled stacks are Zipformer2Encoder ("encoder.encoders.i.
        # layers.j"); downsampled stacks wrap it ("...i.encoder.layers.j").
        base = f"encoder.encoders.{i}" + ("" if ds == 1 else ".encoder")
        if ds != 1:
            m[f"encoder.encoders.{i}.downsample.bias"] = (
                setter(stack["downsample"], "weights"), None)
            m[f"encoder.encoders.{i}.out_combiner.bypass_scale"] = (
                setter(stack, "out_bypass_scale"), None)
        for j, layer in enumerate(stack["layers"]):
            lb = f"{base}.layers.{j}"
            m[f"{lb}.self_attn_weights.in_proj.weight"] = (
                setter(layer["attn_in_proj"], "weight"), lin_t)
            m[f"{lb}.self_attn_weights.in_proj.bias"] = (
                setter(layer["attn_in_proj"], "bias"), None)
            m[f"{lb}.self_attn_weights.linear_pos.weight"] = (
                setter(layer["attn_pos_proj"], "weight"), lin_t)
            for k in (1, 2):
                m[f"{lb}.self_attn{k}.in_proj.weight"] = (
                    setter(layer[f"self_attn{k}"]["in_proj"], "weight"),
                    lin_t)
                m[f"{lb}.self_attn{k}.in_proj.bias"] = (
                    setter(layer[f"self_attn{k}"]["in_proj"], "bias"), None)
                m[f"{lb}.self_attn{k}.out_proj.weight"] = (
                    setter(layer[f"self_attn{k}"]["out_proj"], "weight"),
                    lin_t)
                m[f"{lb}.self_attn{k}.out_proj.bias"] = (
                    setter(layer[f"self_attn{k}"]["out_proj"], "bias"), None)
            for k, ff in ((1, "ff1"), (2, "ff2"), (3, "ff3")):
                m[f"{lb}.feed_forward{k}.in_proj.weight"] = (
                    setter(layer[ff]["in"], "weight"), lin_t)
                m[f"{lb}.feed_forward{k}.in_proj.bias"] = (
                    setter(layer[ff]["in"], "bias"), None)
                m[f"{lb}.feed_forward{k}.out_proj.weight"] = (
                    setter(layer[ff]["out"], "weight"), lin_t)
                m[f"{lb}.feed_forward{k}.out_proj.bias"] = (
                    setter(layer[ff]["out"], "bias"), None)
            m[f"{lb}.nonlin_attention.in_proj.weight"] = (
                setter(layer["nonlin_attn"]["in_proj"], "weight"), lin_t)
            m[f"{lb}.nonlin_attention.in_proj.bias"] = (
                setter(layer["nonlin_attn"]["in_proj"], "bias"), None)
            m[f"{lb}.nonlin_attention.out_proj.weight"] = (
                setter(layer["nonlin_attn"]["out_proj"], "weight"), lin_t)
            m[f"{lb}.nonlin_attention.out_proj.bias"] = (
                setter(layer["nonlin_attn"]["out_proj"], "bias"), None)
            for k, cv in ((1, "conv1"), (2, "conv2")):
                m[f"{lb}.conv_module{k}.in_proj.weight"] = (
                    setter(layer[cv]["in_proj"], "weight"), lin_t)
                m[f"{lb}.conv_module{k}.in_proj.bias"] = (
                    setter(layer[cv]["in_proj"], "bias"), None)
                m[f"{lb}.conv_module{k}.depthwise_conv.weight"] = (
                    setter(layer[cv], "dw_weight"), dw1d_t)
                m[f"{lb}.conv_module{k}.depthwise_conv.bias"] = (
                    setter(layer[cv], "dw_bias"), None)
                m[f"{lb}.conv_module{k}.out_proj.weight"] = (
                    setter(layer[cv]["out_proj"], "weight"), lin_t)
                m[f"{lb}.conv_module{k}.out_proj.bias"] = (
                    setter(layer[cv]["out_proj"], "bias"), None)
            m[f"{lb}.norm.bias"] = (setter(layer["norm"], "bias"), None)
            m[f"{lb}.norm.log_scale"] = (
                setter(layer["norm"], "log_scale"), None)
            m[f"{lb}.bypass.bypass_scale"] = (
                setter(layer, "bypass_scale"), None)
            m[f"{lb}.bypass_mid.bypass_scale"] = (
                setter(layer, "bypass_mid_scale"), None)
    m["encoder.downsample_output.bias"] = (
        setter(params["downsample_output"], "weights"), None)
    return m


def vibert_name_map(params, cfg):
    """HF-BERT state-dict initializer names -> pytree setters for the
    Seq2Labels ViBERT (reference convert_onnx/export_vibert_onnx.py wraps
    BertModel as `bert` plus `classifier`/`detector` heads — HF module
    paths become the ONNX initializer names)."""
    import jax.numpy as jnp
    import numpy as np

    def setter(node, key):
        def set_fn(arr):
            node[key] = jnp.asarray(arr)
        return set_fn

    def lin_t(a):
        return np.ascontiguousarray(a.T)

    m = {
        "bert.embeddings.word_embeddings.weight":
            (setter(params, "word_emb"), None),
        "bert.embeddings.position_embeddings.weight":
            (setter(params, "pos_emb"), None),
        "bert.embeddings.token_type_embeddings.weight":
            (setter(params, "type_emb"), None),
        "bert.embeddings.LayerNorm.weight":
            (setter(params["emb_ln"], "scale"), None),
        "bert.embeddings.LayerNorm.bias":
            (setter(params["emb_ln"], "bias"), None),
        "classifier.weight": (setter(params["labels_head"], "weight"), lin_t),
        "classifier.bias": (setter(params["labels_head"], "bias"), None),
        "detector.weight": (setter(params["d_tags_head"], "weight"), lin_t),
        "detector.bias": (setter(params["d_tags_head"], "bias"), None),
    }
    for i, lp in enumerate(params["layers"]):
        lb = f"bert.encoder.layer.{i}"
        for src, dst in (("attention.self.query", "q"),
                         ("attention.self.key", "k"),
                         ("attention.self.value", "v"),
                         ("attention.output.dense", "attn_out"),
                         ("intermediate.dense", "ffn_in"),
                         ("output.dense", "ffn_out")):
            m[f"{lb}.{src}.weight"] = (setter(lp[dst], "weight"), lin_t)
            m[f"{lb}.{src}.bias"] = (setter(lp[dst], "bias"), None)
        for src, dst in (("attention.output.LayerNorm", "attn_ln"),
                         ("output.LayerNorm", "ffn_ln")):
            m[f"{lb}.{src}.weight"] = (setter(lp[dst], "scale"), None)
            m[f"{lb}.{src}.bias"] = (setter(lp[dst], "bias"), None)
    return m


def load_vibert(path, cfg=None):
    """Load vibert-capu.onnx (reference core/gec_model.py:133) into
    (params, cfg). Shape-infers vocab/hidden/layers/intermediate from the
    initializers; heads default to hidden // 64 (BERT convention)."""
    import jax

    from sherpa_vietnamese_asr_tpu.models.vibert import (
        ViBertConfig, init_vibert_params,
    )

    g = read_onnx(path)
    init = _strip_prefixes(g["initializers"])
    if cfg is None:
        we = init.get("bert.embeddings.word_embeddings.weight")
        if we is None:
            raise ImportReport(
                "[vibert] bert.embeddings.word_embeddings.weight not found; "
                f"first names: {sorted(init)[:8]}")
        vocab, hidden = we.shape
        layers = 0
        while f"bert.encoder.layer.{layers}.attention.self.query.weight" \
                in init:
            layers += 1
        inter = init[
            "bert.encoder.layer.0.intermediate.dense.weight"].shape[0]
        pos = init["bert.embeddings.position_embeddings.weight"].shape[0]
        n_labels = init["classifier.weight"].shape[0]
        n_d_tags = init["detector.weight"].shape[0]
        cfg = ViBertConfig(vocab_size=vocab, hidden=hidden, layers=layers,
                           heads=max(1, hidden // 64), intermediate=inter,
                           max_position=pos, n_labels=n_labels,
                           n_d_tags=n_d_tags)
    params = init_vibert_params(jax.random.PRNGKey(0), cfg)
    map_initializers(init, vibert_name_map(params, cfg), strict=True,
                     fallback_match=True,
                     label="vibert")
    return params, cfg


def pyannet_name_map(params, cfg):
    """pyannote.audio PyanNet state-dict names -> pytree setters
    (segmentation-community-1.onnx, reference pure_ort.py:441). Torch LSTM
    weight_ih/weight_hh are [4H, in] -> transposed; bias_ih + bias_hh sum
    into our single gate bias, so bias_hh uses an accumulating setter."""
    import jax.numpy as jnp
    import numpy as np

    def setter(node, key):
        def set_fn(arr):
            node[key] = jnp.asarray(arr)
        return set_fn

    def adder(node, key):
        def set_fn(arr):
            node[key] = node[key] + jnp.asarray(arr)
        return set_fn

    def lin_t(a):
        return np.ascontiguousarray(a.T)

    def conv1d_t(a):  # [O, I, K] -> [K, I, O]
        return np.ascontiguousarray(np.transpose(a, (2, 1, 0)))

    m = {
        "sincnet.conv1d.0.low_hz_": (setter(params, "sinc_low_hz"), None),
        "sincnet.conv1d.0.band_hz_": (setter(params, "sinc_band_hz"), None),
        "sincnet.wav_norm1d.weight": (setter(params["wav_norm"], "scale"),
                                      None),
        "sincnet.wav_norm1d.bias": (setter(params["wav_norm"], "bias"), None),
        "classifier.weight": (setter(params["classifier"], "weight"), lin_t),
        "classifier.bias": (setter(params["classifier"], "bias"), None),
    }
    for i in range(3):
        m[f"sincnet.norm1d.{i}.weight"] = (
            setter(params["norms"][i], "scale"), None)
        m[f"sincnet.norm1d.{i}.bias"] = (
            setter(params["norms"][i], "bias"), None)
    for i, conv in enumerate(params["convs"]):
        m[f"sincnet.conv1d.{i + 1}.weight"] = (setter(conv, "weight"),
                                               conv1d_t)
        m[f"sincnet.conv1d.{i + 1}.bias"] = (setter(conv, "bias"), None)
    for k, layer in enumerate(params["lstm"]):
        for suffix, dst in (("", "fwd"), ("_reverse", "bwd")):
            m[f"lstm.weight_ih_l{k}{suffix}"] = (
                setter(layer[dst], "wi"), lin_t)
            m[f"lstm.weight_hh_l{k}{suffix}"] = (
                setter(layer[dst], "wh"), lin_t)
            m[f"lstm.bias_ih_l{k}{suffix}"] = (setter(layer[dst], "b"), None)
            m[f"lstm.bias_hh_l{k}{suffix}"] = (adder(layer[dst], "b"), None)
    for i in (1, 2):
        m[f"linear.{i - 1}.weight"] = (
            setter(params[f"linear{i}"], "weight"), lin_t)
        m[f"linear.{i - 1}.bias"] = (setter(params[f"linear{i}"], "bias"),
                                     None)
    return m


def load_pyannet(path, cfg=None):
    """Load segmentation-community-1.onnx into (params, cfg)."""
    import jax

    from sherpa_vietnamese_asr_tpu.models.pyannet import (
        PyanNetConfig, init_pyannet_params,
    )

    g = read_onnx(path)
    init = _strip_prefixes(g["initializers"])
    if cfg is None:
        low = init.get("sincnet.conv1d.0.low_hz_")
        if low is None:
            raise ImportReport(
                "[pyannet] sincnet.conv1d.0.low_hz_ not found; first names: "
                f"{sorted(init)[:8]}")
        n_lstm = 0
        while f"lstm.weight_ih_l{n_lstm}" in init:
            n_lstm += 1
        cfg = PyanNetConfig(
            sinc_filters=low.shape[0],
            conv_channels=init["sincnet.conv1d.1.weight"].shape[0],
            lstm_hidden=init["lstm.weight_hh_l0"].shape[1],
            lstm_layers=n_lstm,
            linear_dim=init["linear.0.weight"].shape[0],
            num_classes=init["classifier.weight"].shape[0])
    params = init_pyannet_params(jax.random.PRNGKey(0), cfg)
    # bias uses an accumulating setter: zero it before mapping.
    import jax.numpy as jnp
    for layer in params["lstm"]:
        for d in ("fwd", "bwd"):
            layer[d]["b"] = jnp.zeros_like(layer[d]["b"])
    map_initializers(init, pyannet_name_map(params, cfg), strict=True,
                     fallback_match=True,
                     label="pyannet")
    return params, cfg


def campp_name_map(params, cfg):
    """3D-Speaker CAMPPlus state-dict names -> pytree setters (reference
    convert_onnx/export_campplus_onnx.py defines the module tree: head.* FCM,
    xvector.tdnn / block{i}.tdnnd{j} / transit{i} / out_nonlinear / dense;
    get_nonlinear children are named 'batchnorm'/'relu')."""
    import jax.numpy as jnp
    import numpy as np

    def setter(node, key):
        def set_fn(arr):
            node[key] = jnp.asarray(arr)
        return set_fn

    def lin_t(a):
        return np.ascontiguousarray(a.T)

    def conv2d_t(a):
        # torch FCM layout is [B, C, F, T] with kernels [O, I, kF, kT]; our
        # layout is [B, T, F, C] (H=time, W=freq), so the spatial kernel axes
        # swap: -> [kT, kF, I, O]. (Using (2,3,1,0) here put the frequency
        # kernel on the time axis — caught by the torch oracle.)
        return np.ascontiguousarray(np.transpose(a, (3, 2, 1, 0)))

    def conv1d_t(a):  # [O, I, K] -> [K, I, O]
        return np.ascontiguousarray(np.transpose(a, (2, 1, 0)))

    def conv1x1_lin_t(a):  # 1x1 Conv1d [O, I, 1] used as a linear
        return np.ascontiguousarray(a[:, :, 0].T)

    m = {}

    def bn(prefix, node, affine=True):
        # Grouped with identity defaults: exporters may constant-fold BN
        # into the preceding conv, in which case the whole group is absent
        # and identity stats reproduce the folded graph exactly
        # (var = 1 - eps with the model's eps = 1e-5).
        if affine:
            m[f"{prefix}.weight"] = (setter(node, "scale"), None, prefix, 1.0)
            m[f"{prefix}.bias"] = (setter(node, "bias"), None, prefix, 0.0)
        m[f"{prefix}.running_mean"] = (setter(node, "mean"), None, prefix, 0.0)
        m[f"{prefix}.running_var"] = (setter(node, "var"), None, prefix,
                                      1.0 - 1e-5)

    fcm = params["fcm"]
    m["head.conv1.weight"] = (setter(fcm["conv1"], "weight"), conv2d_t)
    bn("head.bn1", fcm["bn1"])
    for li, layer_name in ((1, "layer1"), (2, "layer2")):
        for j, blk in enumerate(fcm[layer_name]):
            pre = f"head.layer{li}.{j}"
            m[f"{pre}.conv1.weight"] = (setter(blk["conv1"], "weight"),
                                        conv2d_t)
            bn(f"{pre}.bn1", blk["bn1"])
            m[f"{pre}.conv2.weight"] = (setter(blk["conv2"], "weight"),
                                        conv2d_t)
            bn(f"{pre}.bn2", blk["bn2"])
            if "shortcut_conv" in blk:
                m[f"{pre}.shortcut.0.weight"] = (
                    setter(blk["shortcut_conv"], "weight"), conv2d_t)
                bn(f"{pre}.shortcut.1", blk["shortcut_bn"])
    m["head.conv2.weight"] = (setter(fcm["conv2"], "weight"), conv2d_t)
    bn("head.bn2", fcm["bn2"])

    m["xvector.tdnn.linear.weight"] = (setter(params["tdnn"], "weight"),
                                       conv1d_t)
    bn("xvector.tdnn.nonlinear.batchnorm", params["tdnn_bn"])
    for bi, block in enumerate(params["blocks"]):
        for j, layer in enumerate(block):
            pre = f"xvector.block{bi + 1}.tdnnd{j + 1}"
            bn(f"{pre}.nonlinear1.batchnorm", layer["bn1"])
            m[f"{pre}.linear1.weight"] = (setter(layer["lin1"], "weight"),
                                          conv1d_t)
            bn(f"{pre}.nonlinear2.batchnorm", layer["bn2"])
            m[f"{pre}.cam_layer.linear_local.weight"] = (
                setter(layer["local"], "weight"), conv1d_t)
            m[f"{pre}.cam_layer.linear1.weight"] = (
                setter(layer["cam1"], "weight"), conv1x1_lin_t)
            m[f"{pre}.cam_layer.linear1.bias"] = (
                setter(layer["cam1"], "bias"), None)
            m[f"{pre}.cam_layer.linear2.weight"] = (
                setter(layer["cam2"], "weight"), conv1x1_lin_t)
            m[f"{pre}.cam_layer.linear2.bias"] = (
                setter(layer["cam2"], "bias"), None)
        pre = f"xvector.transit{bi + 1}"
        bn(f"{pre}.nonlinear.batchnorm", params["transitions"][bi]["bn"])
        m[f"{pre}.linear.weight"] = (
            setter(params["transitions"][bi]["conv"], "weight"), conv1d_t)
    bn("xvector.out_nonlinear.batchnorm", params["final_bn"])
    m["xvector.dense.linear.weight"] = (
        setter(params["dense"]["lin"], "weight"), conv1x1_lin_t)
    bn("xvector.dense.nonlinear.batchnorm", params["dense"]["bn"],
       affine=False)
    return m


def load_campp(path, cfg=None):
    """Load campplus_cn_en_common_200k.onnx into (params, cfg)."""
    import jax

    from sherpa_vietnamese_asr_tpu.models.campplus import (
        CamppConfig, init_campp_params,
    )

    g = read_onnx(path)
    init = _strip_prefixes(g["initializers"])
    if cfg is None:
        tdnn_w = init.get("xvector.tdnn.linear.weight")
        if tdnn_w is None:
            raise ImportReport(
                "[campp] xvector.tdnn.linear.weight not found; first names: "
                f"{sorted(init)[:8]}")
        init_ch, fcm_out = tdnn_w.shape[:2]
        mc = init["head.conv1.weight"].shape[0]
        blocks, layers = [], []
        bi = 1
        while f"xvector.block{bi}.tdnnd1.linear1.weight" in init:
            j = 1
            while f"xvector.block{bi}.tdnnd{j}.linear1.weight" in init:
                j += 1
            layers.append(j - 1)
            bi += 1
        growth = init[
            "xvector.block1.tdnnd1.cam_layer.linear_local.weight"].shape[0]
        bn_ch = init["xvector.block1.tdnnd1.linear1.weight"].shape[0]
        embed = init["xvector.dense.linear.weight"].shape[0]
        cfg = CamppConfig(num_mels=fcm_out // mc * 8, m_channels=mc,
                          init_channels=init_ch, growth_rate=growth,
                          bn_size=bn_ch // growth,
                          block_layers=tuple(layers),
                          dilations=(1, 2, 2)[: len(layers)],
                          embed_dim=embed)
    params = init_campp_params(jax.random.PRNGKey(0), cfg)
    map_initializers(init, campp_name_map(params, cfg), strict=True,
                     fallback_match=True,
                     label="campp")
    return params, cfg


def convtasnet_name_map(params, cfg):
    """asteroid ConvTasNet state-dict names -> pytree setters (reference
    convert_onnx/export_convtasnet_onnx.py exports
    JorisCos/ConvTasNet_Libri2Mix_sepclean_16k; module tree is asteroid's
    encoder/masker/decoder with GlobLN gamma/beta and scalar PReLUs).
    The free-filterbank encoder/decoder have no bias (ours stays zero)."""
    import jax.numpy as jnp
    import numpy as np

    def setter(node, key):
        def set_fn(arr):
            node[key] = jnp.asarray(arr)
        return set_fn

    def conv1d_t(a):  # [O, I, K] -> [K, I, O]
        return np.ascontiguousarray(np.transpose(a, (2, 1, 0)))

    def squeeze_cn(a):  # GlobLN gamma/beta (1, C, 1) -> [C]
        return np.ascontiguousarray(a.reshape(-1))

    def filters_dec(a):  # [N, 1, L] -> [N, L]
        return np.ascontiguousarray(a[:, 0, :])

    m = {
        "encoder.filterbank._filters": (setter(params["encoder"], "weight"),
                                        conv1d_t),
        "masker.bottleneck.0.gamma": (setter(params["ln_in"], "scale"),
                                      squeeze_cn),
        "masker.bottleneck.0.beta": (setter(params["ln_in"], "bias"),
                                     squeeze_cn),
        "masker.bottleneck.1.weight": (
            setter(params["bottleneck_in"], "weight"), conv1d_t),
        "masker.bottleneck.1.bias": (
            setter(params["bottleneck_in"], "bias"), None),
        "masker.mask_net.0.weight": (setter(params, "mask_prelu"), None),
        "masker.mask_net.1.weight": (setter(params["mask_out"], "weight"),
                                     conv1d_t),
        "masker.mask_net.1.bias": (setter(params["mask_out"], "bias"), None),
        "decoder.filterbank._filters": (setter(params, "decoder"),
                                        filters_dec),
    }
    for i, blk in enumerate(params["blocks"]):
        pre = f"masker.TCN.{i}"
        m[f"{pre}.shared_block.0.weight"] = (setter(blk["in_conv"], "weight"),
                                             conv1d_t)
        m[f"{pre}.shared_block.0.bias"] = (setter(blk["in_conv"], "bias"),
                                           None)
        m[f"{pre}.shared_block.1.weight"] = (setter(blk, "prelu1"), None)
        m[f"{pre}.shared_block.2.gamma"] = (setter(blk["ln1"], "scale"),
                                            squeeze_cn)
        m[f"{pre}.shared_block.2.beta"] = (setter(blk["ln1"], "bias"),
                                           squeeze_cn)
        m[f"{pre}.shared_block.3.weight"] = (setter(blk["dw_conv"], "weight"),
                                             conv1d_t)
        m[f"{pre}.shared_block.3.bias"] = (setter(blk["dw_conv"], "bias"),
                                           None)
        m[f"{pre}.shared_block.4.weight"] = (setter(blk, "prelu2"), None)
        m[f"{pre}.shared_block.5.gamma"] = (setter(blk["ln2"], "scale"),
                                            squeeze_cn)
        m[f"{pre}.shared_block.5.beta"] = (setter(blk["ln2"], "bias"),
                                           squeeze_cn)
        m[f"{pre}.res_conv.weight"] = (setter(blk["res_conv"], "weight"),
                                       conv1d_t)
        m[f"{pre}.res_conv.bias"] = (setter(blk["res_conv"], "bias"), None)
        m[f"{pre}.skip_conv.weight"] = (setter(blk["skip_conv"], "weight"),
                                        conv1d_t)
        m[f"{pre}.skip_conv.bias"] = (setter(blk["skip_conv"], "bias"), None)
    return m


def load_convtasnet(path, cfg=None):
    """Load convtasnet_16k.onnx into (params, cfg)."""
    import jax

    from sherpa_vietnamese_asr_tpu.models.convtasnet import (
        ConvTasNetConfig, init_convtasnet_params,
    )

    g = read_onnx(path)
    init = _strip_prefixes(g["initializers"])
    if cfg is None:
        enc = init.get("encoder.filterbank._filters")
        if enc is None:
            raise ImportReport(
                "[convtasnet] encoder.filterbank._filters not found; first "
                f"names: {sorted(init)[:8]}")
        n_filters, _, kernel = enc.shape
        n_tcn = 0
        while f"masker.TCN.{n_tcn}.res_conv.weight" in init:
            n_tcn += 1
        base = ConvTasNetConfig()
        n_blocks = base.n_blocks if n_tcn % base.n_blocks == 0 else n_tcn
        cfg = ConvTasNetConfig(
            n_filters=n_filters, kernel=kernel, stride=kernel // 2,
            bottleneck=init["masker.bottleneck.1.weight"].shape[0],
            hidden=init["masker.TCN.0.shared_block.0.weight"].shape[0],
            skip=init["masker.TCN.0.skip_conv.weight"].shape[0],
            conv_kernel=init["masker.TCN.0.shared_block.3.weight"].shape[2],
            n_blocks=n_blocks, n_repeats=n_tcn // n_blocks,
            n_src=init["masker.mask_net.1.weight"].shape[0] // n_filters)
    params = init_convtasnet_params(jax.random.PRNGKey(0), cfg)
    map_initializers(init, convtasnet_name_map(params, cfg), strict=True,
                     fallback_match=True,
                     label="convtasnet")
    return params, cfg


def load_silero_vad(path, cfg=None):
    """Load silero_vad_16k_op15.onnx (reference core/vad_utils.py:22-37)
    into (params, cfg) for models/silero_vad.py.

    Maps the Silero v5 traced-graph initializer names:
      _model.stft.forward_basis_buffer        [2*n_freq, 1, filter_len]
      _model.encoder.{i}.reparam_conv.weight  [C_out, C_in, 3] (+ .bias)
      _model.decoder.rnn.weight_ih/weight_hh  [4H, in] (torch LSTMCell ifgo)
      _model.decoder.rnn.bias_ih/bias_hh
      _model.decoder.decoder.2.weight         [1, H, 1] conv head (+ .bias)
    The STFT basis rows carry the window, so they replace the synthetic DFT
    basis wholesale (magnitude output is sign-invariant in the imag rows).
    """
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.silero_vad import SileroVadConfig

    g = read_onnx(path)
    init = g["initializers"]

    def pick(suffix):
        hits = [k for k in init if k.endswith(suffix)]
        if len(hits) != 1:
            raise ImportReport(
                f"[silero] expected exactly one *{suffix}, found {hits}; "
                f"names: {sorted(init)[:12]}")
        return init[hits[0]]

    basis = pick("stft.forward_basis_buffer")
    if basis.ndim != 3 or basis.shape[0] % 2:
        raise ImportReport(f"[silero] bad stft basis shape {basis.shape}")
    n_freq = basis.shape[0] // 2
    filt = basis.shape[2]

    enc = []
    i = 0
    while True:
        hits = [k for k in init
                if f"encoder.{i}." in k and k.endswith(".weight")]
        if not hits:
            break
        w = init[hits[0]]
        bkey = hits[0][: -len("weight")] + "bias"
        enc.append({
            "weight": jnp.asarray(
                np.ascontiguousarray(np.transpose(w, (2, 1, 0)))),
            "bias": jnp.asarray(init.get(bkey,
                                         np.zeros(w.shape[0], np.float32))),
        })
        i += 1
    if not enc:
        raise ImportReport(
            f"[silero] no encoder convs found; names: {sorted(init)[:12]}")

    wi = pick("rnn.weight_ih")
    wh = pick("rnn.weight_hh")
    bi_ = pick("rnn.bias_ih")
    bh = pick("rnn.bias_hh")
    head_w = pick("decoder.2.weight")
    head_b = pick("decoder.2.bias")

    t = np.ascontiguousarray
    params = {
        "stft_cos": jnp.asarray(basis[:n_freq, 0, :]),
        "stft_sin": jnp.asarray(basis[n_freq:, 0, :]),
        "encoder": enc,
        "lstm": {"wi": jnp.asarray(t(wi.T)), "wh": jnp.asarray(t(wh.T)),
                 "b": jnp.asarray(bi_ + bh)},
        "out": {"weight": jnp.asarray(t(head_w[:, :, 0].T)),
                "bias": jnp.asarray(head_b)},
    }
    if cfg is None:
        cfg = SileroVadConfig(
            stft_filter_len=filt, n_freq=n_freq,
            encoder_channels=tuple(e["weight"].shape[2] for e in enc),
            lstm_dim=wh.shape[1])
    return params, cfg


def load_dnsmos(path, cfg=None):
    """Load DNSMOS sig_bak_ovr.onnx (reference core/audio_analyzer.py:158)
    into (params, cfg) for models/dnsmos.py.

    The DNSMOS export came from TF/Keras, so initializer names are not
    torch-style; mapping is structural: 3x3 conv kernels in graph order
    (HWIO layout either natively or via [O,I,3,3] transpose), then the two
    dense layers by shape. Raises ImportReport when the structure differs.
    """
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.dnsmos import (
        DnsmosConfig, init_dnsmos_params,
    )

    g = read_onnx(path)
    init = g["initializers"]
    # Keep graph order: iterate nodes, collect weight-bearing inputs.
    order = []
    for _op, ins, _outs, _name in g["nodes"]:
        for name in ins:
            if name in init and name not in order:
                order.append(name)
    for name in init:  # initializers not referenced by parsed nodes
        if name not in order:
            order.append(name)

    convs, denses, biases = [], [], {}
    for name in order:
        a = init[name]
        if a.ndim == 4 and 3 in a.shape[:2] + a.shape[2:]:
            if a.shape[0] == 3 and a.shape[1] == 3:  # HWIO (TF native)
                convs.append(a)
            elif a.shape[2] == 3 and a.shape[3] == 3:  # OIHW (torch-style)
                convs.append(np.ascontiguousarray(
                    np.transpose(a, (2, 3, 1, 0))))
        elif a.ndim == 2:
            denses.append(a)
        elif a.ndim == 1:
            biases[name] = a
    if len(convs) < 2 or len(denses) < 2:
        raise ImportReport(
            f"[dnsmos] structural scan found {len(convs)} convs / "
            f"{len(denses)} denses; names: {sorted(init)[:12]}")

    chain = []
    c_in = 1
    for a in convs:
        if a.shape[2] != c_in:
            a = np.ascontiguousarray(np.transpose(a, (0, 1, 3, 2)))
        if a.shape[2] != c_in:
            raise ImportReport(
                f"[dnsmos] conv chain broken at {a.shape} (want in={c_in})")
        chain.append(a)
        c_in = a.shape[3]

    def dense_to(d, d_in):
        if d.shape[0] == d_in:
            return d
        if d.shape[1] == d_in:
            return np.ascontiguousarray(d.T)
        raise ImportReport(f"[dnsmos] dense {d.shape} does not take {d_in}")

    d1 = dense_to(denses[-2], c_in)
    head = dense_to(denses[-1], d1.shape[1])
    if head.shape[1] != 3:
        raise ImportReport(f"[dnsmos] head {head.shape} is not 3-wide")

    if cfg is None:
        cfg = DnsmosConfig(channels=tuple(a.shape[3] for a in chain),
                           dense=d1.shape[1])
    params = init_dnsmos_params(jax.random.PRNGKey(0), cfg)

    def find_bias(c):
        for name, b in biases.items():
            if b.shape[0] == c and name not in params.get("_used", ()):
                params.setdefault("_used", []).append(name)
                return b
        return np.zeros((c,), np.float32)

    for i, a in enumerate(chain):
        params["convs"][i] = {"weight": jnp.asarray(a),
                              "bias": jnp.asarray(find_bias(a.shape[3]))}
    params["dense1"] = {"weight": jnp.asarray(d1),
                        "bias": jnp.asarray(find_bias(d1.shape[1]))}
    params["head"] = {"weight": jnp.asarray(head),
                      "bias": jnp.asarray(find_bias(3))}
    params.pop("_used", None)
    return params, cfg


def resnet_speaker_name_map(params, cfg):
    """wespeaker ResNet34 state-dict names (under the 'resnet.' prefix the
    pyannote Community-1 embedding export uses — reference
    convert_onnx/split_pyannote_embedding.py extracts resnet.seg_1.* from
    the same graph) -> pytree setters.

    Torch layout is [B, 1, F, T] (kh=freq, kw=time); ours is [B, T, F, 1],
    so conv kernels transpose spatial dims: [O, I, kh, kw] -> [kw, kh, I, O].
    """
    import jax.numpy as jnp
    import numpy as np

    def setter(node, key):
        def set_fn(arr):
            node[key] = jnp.asarray(arr)
        return set_fn

    def conv_t(a):  # [O, I, kF, kT] -> [kT, kF, I, O]
        return np.ascontiguousarray(np.transpose(a, (3, 2, 1, 0)))

    m = {}

    def bn(prefix, node):
        # Identity-default group for exporter-folded BN (eps = 1e-5).
        m[f"{prefix}.weight"] = (setter(node, "scale"), None, prefix, 1.0)
        m[f"{prefix}.bias"] = (setter(node, "bias"), None, prefix, 0.0)
        m[f"{prefix}.running_mean"] = (setter(node, "mean"), None, prefix, 0.0)
        m[f"{prefix}.running_var"] = (setter(node, "var"), None, prefix,
                                      1.0 - 1e-5)

    m["resnet.conv1.weight"] = (setter(params, "conv1"), conv_t)
    bn("resnet.bn1", params["bn1"])
    for stage, blocks in enumerate(params["stages"]):
        for j, blk in enumerate(blocks):
            pre = f"resnet.layer{stage + 1}.{j}"
            m[f"{pre}.conv1.weight"] = (setter(blk, "conv1"), conv_t)
            bn(f"{pre}.bn1", blk["bn1"])
            m[f"{pre}.conv2.weight"] = (setter(blk, "conv2"), conv_t)
            bn(f"{pre}.bn2", blk["bn2"])
            if "down_conv" in blk:
                m[f"{pre}.shortcut.0.weight"] = (setter(blk, "down_conv"),
                                                 conv_t)
                bn(f"{pre}.shortcut.1", blk["down_bn"])
    return m


def load_resnet_speaker(encoder_onnx_path, weight_npy_path, bias_npy_path,
                        cfg=None):
    """Load embedding_encoder.onnx + resnet_seg_1_{weight,bias}.npy
    (reference pure_ort.py:450-485 artifact set) into (params, cfg)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sherpa_vietnamese_asr_tpu.models.resnet_speaker import (
        ResNetSpeakerConfig, init_resnet_params,
    )

    g = read_onnx(encoder_onnx_path)
    init = _strip_prefixes(g["initializers"])
    if cfg is None:
        c1 = init.get("resnet.conv1.weight")
        if c1 is None:
            raise ImportReport(
                "[resnet] resnet.conv1.weight not found; first names: "
                f"{sorted(init)[:8]}")
        blocks = []
        stage = 1
        while f"resnet.layer{stage}.0.conv1.weight" in init:
            j = 0
            while f"resnet.layer{stage}.{j}.conv1.weight" in init:
                j += 1
            blocks.append(j)
            stage += 1
        w = np.load(weight_npy_path)
        cfg = ResNetSpeakerConfig(base_channels=c1.shape[0],
                                  blocks=tuple(blocks),
                                  embed_dim=w.shape[0])
    params = init_resnet_params(jax.random.PRNGKey(0), cfg)
    map_initializers(init, resnet_speaker_name_map(params, cfg), strict=True,
                     fallback_match=True,
                     label="resnet")
    params["proj"] = {"weight": jnp.asarray(np.load(weight_npy_path)),
                      "bias": jnp.asarray(np.load(bias_npy_path))}
    return params, cfg

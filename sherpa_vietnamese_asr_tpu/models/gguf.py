# Minimal first-party GGUF (v3) reader/writer.
#
# The reference's summarizer loads GGUF checkpoints in-process through
# llama-cpp-python (reference web_service/summarizer.py:310-474). Neither
# llama.cpp nor any GGUF library ships in this environment, so this module
# parses the format directly — the same inversion as models/onnx_import.py's
# wire-level ONNX parser. models/llama.py maps the tensors onto a JAX
# llama-family forward; web_service/summarizer.py gates the "local" backend
# on a *.gguf file being present.
#
# Format (ggml GGUF v3): little-endian
#   magic "GGUF" | version u32 | n_tensors u64 | n_kv u64
#   n_kv x (key: string, type: u32, value)       -- string = u64 len + bytes
#   n_tensors x (name: string, n_dims u32, dims u64[n] (innermost first),
#                ggml_type u32, offset u64)
#   padding to general.alignment (default 32), then tensor data blob.
# Quantization: F32/F16 passthrough; Q8_0 = blocks of 32 (f16 scale + 32 i8).

from __future__ import annotations

import struct

import numpy as np

GGUF_MAGIC = b"GGUF"

# GGUF metadata value types
_U8, _I8, _U16, _I16, _U32, _I32, _F32, _BOOL, _STR, _ARR, _U64, _I64, _F64 \
    = range(13)

_SCALAR_FMT = {_U8: "<B", _I8: "<b", _U16: "<H", _I16: "<h", _U32: "<I",
               _I32: "<i", _F32: "<f", _U64: "<Q", _I64: "<q", _F64: "<d"}

# ggml tensor types we read/write
GGML_F32, GGML_F16 = 0, 1
GGML_Q8_0 = 8
_Q8_BLOCK = 32


class _Reader:
    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def take(self, n):
        out = self.buf[self.pos: self.pos + n]
        if len(out) != n:
            raise ValueError("truncated GGUF file")
        self.pos += n
        return out

    def scalar(self, fmt):
        size = struct.calcsize(fmt)
        return struct.unpack(fmt, self.take(size))[0]

    def string(self):
        n = self.scalar("<Q")
        return self.take(n).decode("utf-8")

    def value(self, vtype):
        if vtype in _SCALAR_FMT:
            v = self.scalar(_SCALAR_FMT[vtype])
            return bool(v) if vtype == _BOOL else v
        if vtype == _BOOL:
            return bool(self.scalar("<B"))
        if vtype == _STR:
            return self.string()
        if vtype == _ARR:
            etype = self.scalar("<I")
            n = self.scalar("<Q")
            return [self.value(etype) for _ in range(n)]
        raise ValueError(f"unknown GGUF value type {vtype}")


def _dequant(raw, ggml_type, shape):
    n = int(np.prod(shape)) if shape else 1
    if ggml_type == GGML_F32:
        arr = np.frombuffer(raw, "<f4", count=n)
    elif ggml_type == GGML_F16:
        arr = np.frombuffer(raw, "<f2", count=n).astype(np.float32)
    elif ggml_type == GGML_Q8_0:
        blocks = n // _Q8_BLOCK
        rec = np.frombuffer(raw, dtype=np.dtype(
            [("d", "<f2"), ("q", "i1", (_Q8_BLOCK,))]), count=blocks)
        arr = (rec["d"].astype(np.float32)[:, None]
               * rec["q"].astype(np.float32)).reshape(-1)
    else:
        raise NotImplementedError(f"ggml tensor type {ggml_type}")
    # GGUF dims are innermost-first; numpy shape is outermost-first.
    return arr.reshape(tuple(reversed(shape))).astype(np.float32)


def read_gguf(path_or_bytes, load_tensors=True):
    """Parse a GGUF file -> {"metadata": {...}, "tensors": {name: f32 array}}.

    Supported tensor types: F32, F16, Q8_0 (the llama.cpp types the
    reference's recommended summarizer models ship in; others raise)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    r = _Reader(buf)
    if r.take(4) != GGUF_MAGIC:
        raise ValueError("not a GGUF file")
    version = r.scalar("<I")
    if version not in (2, 3):
        raise ValueError(f"unsupported GGUF version {version}")
    n_tensors = r.scalar("<Q")
    n_kv = r.scalar("<Q")
    meta = {}
    for _ in range(n_kv):
        key = r.string()
        vtype = r.scalar("<I")
        meta[key] = r.value(vtype)
    infos = []
    for _ in range(n_tensors):
        name = r.string()
        n_dims = r.scalar("<I")
        dims = [r.scalar("<Q") for _ in range(n_dims)]
        ggml_type = r.scalar("<I")
        offset = r.scalar("<Q")
        infos.append((name, dims, ggml_type, offset))
    align = int(meta.get("general.alignment", 32))
    data_start = (r.pos + align - 1) // align * align
    tensors = {}
    if load_tensors:
        for name, dims, ggml_type, offset in infos:
            n = int(np.prod(dims)) if dims else 1
            if ggml_type == GGML_F32:
                nbytes = n * 4
            elif ggml_type == GGML_F16:
                nbytes = n * 2
            elif ggml_type == GGML_Q8_0:
                nbytes = (n // _Q8_BLOCK) * (2 + _Q8_BLOCK)
            else:
                raise NotImplementedError(f"ggml tensor type {ggml_type} "
                                          f"for {name}")
            raw = buf[data_start + offset: data_start + offset + nbytes]
            tensors[name] = _dequant(raw, ggml_type, dims)
    return {"metadata": meta, "tensors": tensors,
            "infos": {name: (dims, t) for name, dims, t, _ in infos}}


# ---------------------------------------------------------------------------
# Writer (tests / synthetic checkpoints)
# ---------------------------------------------------------------------------

def _w_string(s):
    b = s.encode("utf-8")
    return struct.pack("<Q", len(b)) + b


def _w_value(v):
    if isinstance(v, (bool, np.bool_)):
        return struct.pack("<I", _BOOL) + struct.pack("<B", int(v))
    if isinstance(v, (int, np.integer)):
        v = int(v)
        return struct.pack("<I", _U32 if 0 <= v < 2 ** 32 else _I64) + (
            struct.pack("<I", v) if 0 <= v < 2 ** 32
            else struct.pack("<q", v))
    if isinstance(v, (float, np.floating)):
        return struct.pack("<I", _F32) + struct.pack("<f", float(v))
    if isinstance(v, str):
        return struct.pack("<I", _STR) + _w_string(v)
    if isinstance(v, (list, tuple)):
        if all(isinstance(x, str) for x in v):
            body = b"".join(_w_string(x) for x in v)
            return (struct.pack("<I", _ARR) + struct.pack("<I", _STR)
                    + struct.pack("<Q", len(v)) + body)
        if all(isinstance(x, (float, np.floating)) for x in v):
            body = b"".join(struct.pack("<f", float(x)) for x in v)
            return (struct.pack("<I", _ARR) + struct.pack("<I", _F32)
                    + struct.pack("<Q", len(v)) + body)
        body = b"".join(struct.pack("<i", int(x)) for x in v)
        return (struct.pack("<I", _ARR) + struct.pack("<I", _I32)
                + struct.pack("<Q", len(v)) + body)
    raise TypeError(f"unsupported GGUF metadata value {v!r}")


def quantize_q8_0(arr):
    """f32 array (size % 32 == 0) -> Q8_0 raw bytes (llama.cpp layout)."""
    flat = np.asarray(arr, np.float32).reshape(-1, _Q8_BLOCK)
    d = np.abs(flat).max(axis=1) / 127.0
    d = np.where(d == 0, 1e-12, d)
    q = np.clip(np.round(flat / d[:, None]), -127, 127).astype(np.int8)
    rec = np.zeros(flat.shape[0], dtype=np.dtype(
        [("d", "<f2"), ("q", "i1", (_Q8_BLOCK,))]))
    rec["d"] = d.astype(np.float16)
    rec["q"] = q
    return rec.tobytes()


def write_gguf(path, metadata, tensors, q8_names=()):
    """Write a GGUF v3 file. tensors: {name: np array (f32)}; names listed in
    q8_names are stored Q8_0 (size % 32 == 0 required), the rest F32."""
    align = int(metadata.get("general.alignment", 32))
    header = bytearray()
    header += GGUF_MAGIC + struct.pack("<I", 3)
    header += struct.pack("<Q", len(tensors))
    header += struct.pack("<Q", len(metadata))
    for k, v in metadata.items():
        header += _w_string(k) + _w_value(v)
    blobs, infos = [], []
    offset = 0
    for name, arr in tensors.items():
        arr = np.asarray(arr, np.float32)
        if name in q8_names:
            raw, ttype = quantize_q8_0(arr), GGML_Q8_0
        else:
            raw, ttype = arr.astype("<f4").tobytes(), GGML_F32
        pad = (-len(raw)) % align
        infos.append((name, list(reversed(arr.shape)), ttype, offset))
        blobs.append(raw + b"\0" * pad)
        offset += len(raw) + pad
    for name, dims, ttype, off in infos:
        header += _w_string(name) + struct.pack("<I", len(dims))
        for dim in dims:
            header += struct.pack("<Q", dim)
        header += struct.pack("<I", ttype) + struct.pack("<Q", off)
    pad = (-len(header)) % align
    with open(path, "wb") as f:
        f.write(bytes(header) + b"\0" * pad + b"".join(blobs))
    return path

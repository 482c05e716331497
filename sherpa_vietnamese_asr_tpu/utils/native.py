# ctypes loaders for the native host-side libraries (native/*.cpp).
#
# Builds the shared libraries on demand with g++ (the toolchain is part of
# the target environment); every entry point has a pure-numpy fallback
# (utils/audio_io.py for audiokit, utils/clustering.py for clusterkit), so
# the framework works without a compiler too.

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "audiokit.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libaudiokit.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build(src=_SRC, lib=_LIB):
    cmd = ["g++", "-O3", "-shared", "-fPIC", src, "-o", lib]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)


def get_lib():
    """Load (building if needed) the audiokit library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB) or (
                    os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.SubprocessError):
            return None
        c = ctypes
        lib.audiokit_wav_decode.restype = c.c_int
        lib.audiokit_wav_decode.argtypes = [
            c.c_char_p, c.c_int64, c.POINTER(c.c_int32),
            c.POINTER(c.c_int32), c.POINTER(c.c_int64),
            c.POINTER(c.c_float)]
        lib.audiokit_resample_len.restype = c.c_int64
        lib.audiokit_resample_len.argtypes = [c.c_int64, c.c_int32, c.c_int32]
        lib.audiokit_resample.restype = c.c_int
        lib.audiokit_resample.argtypes = [
            c.POINTER(c.c_float), c.c_int64, c.c_int32, c.c_int32, c.c_int32,
            c.POINTER(c.c_float)]
        _lib = lib
        return _lib


def wav_decode_native(path):
    """Returns (mono float32 array, rate) or None when native lib missing or
    the file is unsupported."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        buf = f.read()
    rate = ctypes.c_int32()
    channels = ctypes.c_int32()
    frames = ctypes.c_int64()
    rc = lib.audiokit_wav_decode(buf, len(buf), ctypes.byref(rate),
                                 ctypes.byref(channels), ctypes.byref(frames),
                                 None)
    if rc != 0:
        return None
    out = np.empty(frames.value, np.float32)
    rc = lib.audiokit_wav_decode(
        buf, len(buf), ctypes.byref(rate), ctypes.byref(channels),
        ctypes.byref(frames),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    return out, rate.value


_CK_SRC = os.path.join(_NATIVE_DIR, "clusterkit.cpp")
_CK_LIB = os.path.join(_NATIVE_DIR, "libclusterkit.so")
_ck_lib = None
_ck_tried = False


def get_clusterkit():
    """Load (building if needed) the clusterkit library; None if unavailable.

    Hosts the UMAP SGD layout loop and the mutual-reachability Prim MST for
    the Senko long-audio diarization path (see utils/clustering.py)."""
    global _ck_lib, _ck_tried
    with _lock:
        if _ck_lib is not None or _ck_tried:
            return _ck_lib
        _ck_tried = True
        try:
            if not os.path.exists(_CK_LIB) or (
                    os.path.getmtime(_CK_LIB) < os.path.getmtime(_CK_SRC)):
                _build(_CK_SRC, _CK_LIB)
            lib = ctypes.CDLL(_CK_LIB)
        except (OSError, subprocess.SubprocessError):
            return None
        c = ctypes
        lib.ck_umap_layout.restype = c.c_int
        lib.ck_umap_layout.argtypes = [
            c.POINTER(c.c_float), c.c_int64, c.c_int32,
            c.POINTER(c.c_int32), c.POINTER(c.c_int32),
            c.POINTER(c.c_double), c.c_int64, c.c_int32,
            c.c_float, c.c_float, c.c_float, c.c_int32, c.c_uint64]
        lib.ck_mr_mst.restype = c.c_int
        lib.ck_mr_mst.argtypes = [
            c.POINTER(c.c_float), c.POINTER(c.c_float), c.c_int64, c.c_int32,
            c.POINTER(c.c_int32), c.POINTER(c.c_int32), c.POINTER(c.c_float)]
        _ck_lib = lib
        return _ck_lib


def resample_native(x, sr_in, sr_out, num_zeros=16):
    """Polyphase resample via audiokit; None when unavailable."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    out_len = lib.audiokit_resample_len(len(x), sr_in, sr_out)
    out = np.empty(out_len, np.float32)
    rc = lib.audiokit_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        sr_in, sr_out, num_zeros,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    return out

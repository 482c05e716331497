# AOT executable cache: skip Python tracing + lowering on warm process starts.
#
# The persistent XLA compile cache (utils/jax_setup.py) removes COMPILES
# across processes, but a fresh process still pays Python tracing + StableHLO
# lowering for every program before the cache can even be consulted — ~15 s
# for the diarization superblock alone, and a warmed `svt warmup` re-run spent
# ~60 s mostly re-tracing programs whose executables were already on disk
# (round-3 measurement, PERFORMANCE.md "Cold-start story"). This module caches
# the SERIALIZED EXECUTABLE itself (jax.experimental.serialize_executable):
# a warm hit deserializes and loads the binary directly — no tracing, no
# lowering, no XLA compile-cache lookup.
#
# Keying: (program name, package source hash, jax version, backend platform +
# version, flattened arg treedef, per-leaf avals, repr of static kwargs).
# The package source hash makes edits to ANY package file invalidate every
# entry — coarse but sound; the compile cache can hash the traced HLO instead
# precisely because it runs after the tracing this cache exists to skip.
#
# Scope guards: single-device processes only (executables bind a device
# assignment; the sharded path keeps ordinary jit), and only when the
# persistent compile cache itself is enabled (same machine-keying caveats,
# see jax_setup.py). Misses fall through to lower+compile (which the compile
# cache still accelerates) and serialize the result for the next process.
# Every failure path degrades to plain jit — this cache is an optimization
# only.
#
# Reference anchor: the reference's ORT sessions deserialize pre-built graphs
# in seconds (core/asr_engine.py:1877 one-shot CLI UX); this is the compiled-
# TPU-stack analogue of that load path.

from __future__ import annotations

import hashlib
import os
import pickle
import threading

_lock = threading.Lock()
_memo: dict = {}          # key -> loaded jax.stages.Compiled
_negative: set = set()    # keys that failed to compile-via-AOT this process
_src_hash: str | None = None
_stats = {"hits": 0, "misses": 0, "disabled": 0}
_store_threads: list = []  # pending background stores (flush() joins)


def _package_source_hash() -> str:
    global _src_hash
    if _src_hash is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    h.update(fn.encode())
                    try:
                        with open(p, "rb") as f:
                            h.update(f.read())
                    except OSError:
                        pass
        _src_hash = h.hexdigest()[:16]
    return _src_hash


def cache_dir() -> str | None:
    """AOT entries live beside the persistent compile cache entries."""
    override = os.environ.get("SVT_AOT_CACHE_DIR")
    if override:
        return override
    if os.environ.get("SVT_DISABLE_AOT_CACHE") \
            or os.environ.get("SVT_DISABLE_COMPILE_CACHE"):
        return None
    import jax
    try:
        base = jax.config.jax_compilation_cache_dir
    except Exception:
        return None
    if not base:
        return None
    return os.path.join(base, "aot")


def _enabled() -> bool:
    if cache_dir() is None:
        return False
    if os.environ.get("SVT_FORCE_AOT_CACHE"):  # tests: virtual-device CPU
        return True
    import jax
    try:
        return len(jax.devices()) == 1
    except Exception:
        return False


def _leaf_sig(leaf) -> str:
    import jax
    import numpy as np
    if isinstance(leaf, (jax.Array, np.ndarray)):
        return f"a{leaf.shape}{leaf.dtype}"
    if isinstance(leaf, np.generic):
        return f"s{leaf.dtype}"
    return "p" + repr(leaf)


def _key(name: str, args, kwargs, static, key_extra: str) -> str:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(
        (args, kwargs), is_leaf=lambda x: x is None)
    backend = jax.devices()[0].client
    parts = [
        name, _package_source_hash(), jax.__version__,
        backend.platform, getattr(backend, "platform_version", ""),
        str(treedef), repr(sorted(static.items())), key_extra,
    ] + [_leaf_sig(x) for x in leaves]
    return hashlib.sha256("\x1f".join(parts).encode()).hexdigest()[:32]


def _load(path: str):
    import time
    import zlib

    import jax
    from jax.experimental import serialize_executable
    t0 = time.time()
    with open(path, "rb") as f:
        payload, in_tree, out_tree = pickle.loads(zlib.decompress(f.read()))
    # Entries are single-device programs (the _enabled guard); pin execution
    # to device 0 — the default (all backend devices) makes a multi-device
    # process expect per-device shards.
    loaded = serialize_executable.deserialize_and_load(
        payload, in_tree, out_tree,
        execution_devices=jax.devices()[:1])
    _stats["load_s"] = _stats.get("load_s", 0.0) + (time.time() - t0)
    return loaded


def _store(path: str, compiled) -> None:
    import zlib

    from jax.experimental import serialize_executable
    payload, in_tree, out_tree = serialize_executable.serialize(compiled)
    # level-1 zlib: executables compress ~4-5x (150 MB -> ~30 MB for the
    # serving decode program) and entry size is what the load path pays.
    blob = zlib.compress(pickle.dumps((payload, in_tree, out_tree)), 1)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic vs concurrent warmup stages


def call(name: str, jit_fn, args, kwargs=None, static=None,
         key_extra: str = ""):
    """Call a jitted program through the AOT executable cache.

    `args`/`kwargs` are the DYNAMIC (traced) arguments; `static` holds the
    `static_argnames` values by name (AOT-compiled executables bake statics
    in and are invoked with dynamic arguments only — jax.stages.Compiled
    calling convention). `key_extra` must capture any CLOSED-OVER trace-time
    state the program depends on (e.g. configs a factory baked in). On a
    warm process start the executable loads from disk without tracing;
    otherwise this lowers + compiles (persistent-compile-cache-accelerated)
    and serializes for the next process. Any cache failure degrades to a
    plain `jit_fn` call.
    """
    kwargs = kwargs or {}
    static = static or {}
    if not _enabled():
        _stats["disabled"] += 1
        return jit_fn(*args, **kwargs, **static)
    try:
        key = _key(name, args, kwargs, static, key_extra)
    except Exception:
        return jit_fn(*args, **kwargs, **static)
    with _lock:
        compiled = _memo.get(key)
        bad = key in _negative
    if compiled is not None:
        return compiled(*args, **kwargs)
    if bad:
        return jit_fn(*args, **kwargs, **static)

    d = cache_dir()
    path = os.path.join(d, f"{name}-{key}.aotx")
    if os.path.exists(path):
        try:
            compiled = _load(path)
            out = compiled(*args, **kwargs)  # validate convention before memo
            with _lock:
                _memo[key] = compiled
            _stats["hits"] += 1
            return out
        except Exception:
            try:
                os.remove(path)  # stale/corrupt entry: rebuild below
            except OSError:
                pass

    _stats["misses"] += 1
    try:
        import time as _time
        t0 = _time.time()
        compiled = jit_fn.lower(*args, **kwargs, **static).compile()
        _stats["build_s"] = _stats.get("build_s", 0.0) + (_time.time() - t0)
        out = compiled(*args, **kwargs)
    except Exception:
        with _lock:
            _negative.add(key)
        return jit_fn(*args, **kwargs, **static)
    _store_async(path, compiled)
    with _lock:
        _memo[key] = compiled
    return out


def _store_async(path: str, compiled) -> None:
    """Serialize + write in the background: pulling a big executable back
    over the tunneled backend takes MINUTES for the serving decode program
    (measured 500 s) and must not sit on the first real request. One-shot
    processes may exit before a store finishes (daemon threads) — `svt
    warmup` calls flush() so install-time priming is guaranteed."""
    mode = os.environ.get("SVT_AOT_STORE", "async")
    if mode == "off":
        return

    def work():
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            _store(path, compiled)
        except Exception:
            pass  # unserializable program: still reusable in-process

    if mode == "sync":
        work()
        return
    th = threading.Thread(target=work, daemon=True, name="aot-store")
    with _lock:
        _store_threads.append(th)
    th.start()


def flush(timeout: float | None = None) -> None:
    """Join pending background stores (per-thread timeout in seconds)."""
    with _lock:
        pending = list(_store_threads)
        _store_threads.clear()
    for th in pending:
        th.join(timeout)


def stats() -> dict:
    return dict(_stats)


def aot_jit(name: str, static_argnames=()):
    """Decorator: `jax.jit(fn, static_argnames=...)` routed through the AOT
    executable cache. The wrapper binds the call signature, splits static
    from dynamic parameters by name, and lowers/executes everything as
    keyword arguments so the AOT calling convention (dynamic-only) matches
    the live-jit one. Behaves exactly like plain jit when the cache is
    disabled (CPU tests, sharded processes)."""
    import functools
    import inspect

    static_set = frozenset(static_argnames)

    def deco(fn):
        import jax
        jf = jax.jit(fn, static_argnames=tuple(static_argnames))
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            dyn, static = {}, {}
            for k, v in bound.arguments.items():
                (static if k in static_set else dyn)[k] = v
            return call(name, jf, (), kwargs=dyn, static=static)

        wrapper.jitted = jf  # escape hatch (e.g. .lower() callers)
        return wrapper

    return deco

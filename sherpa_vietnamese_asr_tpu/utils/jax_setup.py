# One-time JAX runtime setup for this framework.
#
# Enables the persistent compilation cache (first compiles of the Zipformer /
# PyanNet / beam-search programs take minutes on the TPU backend; cached
# compiles load in seconds across processes). Importing the package calls
# ensure_setup() once; it never overrides explicit user configuration.

from __future__ import annotations

import os

_DONE = False


def ensure_setup():
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    if os.environ.get("SVT_DISABLE_COMPILE_CACHE"):
        return  # e.g. the multichip dryrun: CPU AOT artifacts are
        # machine-feature-specific and unsound to reuse across hosts
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # explicit user choice wins
    # Per-backend subdirectory; the CPU backend is additionally keyed by the
    # host CPU's feature set: CPU AOT artifacts embed machine features, and
    # reusing another machine's entries logs feature-mismatch errors and can
    # SIGILL. TPU artifacts are not machine-sensitive — keyed by backend only.
    backend = os.environ.get("JAX_PLATFORMS", "") or "default"
    try:
        import jax as _jax
        cfg_plat = _jax.config.read("jax_platforms") or ""
    except Exception:
        cfg_plat = ""
    subdir = backend.replace(",", "_") or "default"
    # Key by host whenever the platform set can resolve to CPU — that
    # includes the UNSET/"default" case (no TPU present -> CPU at runtime),
    # not just an explicit "cpu". The /proc/cpuinfo flags+model hash used
    # through round 4 is NOT sufficient: virtualized hosts expose identical
    # generic cpuinfo ("Intel(R) Xeon(R) Processor @ 2.10GHz") while XLA
    # derives the real microarch's tuning features via cpuid (e.g.
    # +prefer-no-scatter on Sapphire Rapids) — two such hosts hash alike
    # and trade AOT artifacts that execute as DIFFERENT binaries (measured:
    # cross-machine loads flipped test_batch_independence numerics past
    # 2e-4 and segfaulted executable deserialization in the warmup tests).
    # boot_id is unique per boot, so CPU artifacts are never shared across
    # machines; same-boot processes (the warm-start path that matters)
    # still share. TPU artifacts stay keyed by backend only.
    plats = (backend + "," + cfg_plat).lower()
    pinned_noncpu = plats.strip(", ") not in ("", "default") \
        and "cpu" not in plats
    if not pinned_noncpu:
        machine = "anycpu"
        try:
            import hashlib
            ident = []
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "model name")):
                        ident.append(line)
                    if len(ident) == 2:
                        break
            try:
                with open("/proc/sys/kernel/random/boot_id") as f:
                    ident.append(f.read())
            except OSError:
                pass
            if ident:
                machine = hashlib.sha256(
                    "".join(ident).encode()).hexdigest()[:12]
        except OSError:
            pass
        subdir += "-" + machine
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache", subdir)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything, including short compiles: on the tunneled axon
        # backend even a jit(squeeze) compile is a ~0.33 s remote round
        # trip, and a one-shot CLI run issues dozens of such tiny programs
        # — at the default 1 s (or any nonzero) threshold they are re-paid
        # in every fresh process.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        # Pallas/Mosaic payloads embed the full Python traceback of the
        # trace site in their MLIR locations, so the SAME program traced
        # from two call sites (e.g. `svt warmup` vs the pipeline) produced
        # two different persistent-cache keys and the warmup never warmed
        # the serving path. Location tracebacks are debug-only metadata —
        # drop them so cache keys depend only on the computation.
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:
        pass  # cache is an optimization only

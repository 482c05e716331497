# svt warmup stage runner: stage isolation + concurrent jobs path.
import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _fresh_jax_state():
    """Drop accumulated in-memory executables before the warmup tests.

    Late in the full fast tier (~230 tests of live compiled programs) the
    warmup thread pool's persistent-cache reads segfaulted inside XLA's
    executable deserialization (reproduced twice at the same spot; the
    same tests pass in isolation and in a back-half-only run). Clearing
    JAX's in-memory caches first removes the accumulated-state trigger;
    recompiles reload from the on-disk persistent cache."""
    import jax

    jax.clear_caches()
    yield


def _tiny_model():
    from sherpa_vietnamese_asr_tpu.models.registry import (
        TINY_ZIPFORMER, random_asr_model,
    )

    return random_asr_model(vocab_size=64, beam_size=2,
                            zip_cfg=TINY_ZIPFORMER)


@pytest.mark.slow
def test_warmup_stages_run_concurrently():
    """jobs>1 runs stages on a thread pool; timings dict still reports
    every requested stage, and a failing stage is isolated to None."""
    from sherpa_vietnamese_asr_tpu.pipeline import warmup as W

    logs = []
    timings = W.warmup_programs(_tiny_model(), stages=("decode", "quality"),
                                log=logs.append, jobs=2)
    assert set(timings) == {"decode", "quality"}
    assert timings["decode"] is not None  # compiled + ran
    assert any("decode" in m for m in logs)


@pytest.mark.slow
def test_warmup_stage_failure_isolated():
    from sherpa_vietnamese_asr_tpu.pipeline import warmup as W

    # An unknown models_dir must not abort other stages; punctuation with
    # a bogus dir either works (random fallback) or is skipped with None —
    # decode must still complete either way.
    timings = W.warmup_programs(_tiny_model(), stages=("decode",),
                                log=lambda *a: None, jobs=1)
    assert timings["decode"] is not None

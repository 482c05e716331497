# Streaming Zipformer: state carrying, shapes, determinism.
import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    import jax

    from sherpa_vietnamese_asr_tpu.models.registry import TINY_ZIPFORMER
    from sherpa_vietnamese_asr_tpu.models.zipformer import (
        init_zipformer_params,
    )
    from sherpa_vietnamese_asr_tpu.models.zipformer_streaming import (
        StreamingConfig, init_streaming_state,
    )

    cfg = TINY_ZIPFORMER
    params = init_zipformer_params(jax.random.PRNGKey(0), cfg)
    scfg = StreamingConfig(chunk_frames=32, left_frames=64)
    return cfg, scfg, params


def test_streaming_shapes_and_state(setup, rng):
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.zipformer_streaming import (
        init_streaming_state, streaming_step,
    )

    cfg, scfg, params = setup
    b = 2
    state = init_streaming_state(cfg, scfg, b)
    chunk = jnp.asarray(rng.standard_normal(
        (b, 2 * scfg.chunk_frames, 80)).astype(np.float32))
    out, state2 = streaming_step(params, state, chunk, cfg, scfg)
    assert out.shape == (b, scfg.chunk_frames // 2, cfg.output_dim)
    assert np.isfinite(np.asarray(out)).all()
    # state changed
    flat1 = np.concatenate([np.asarray(x).ravel() for x in
                            __import__("jax").tree.leaves(state)])
    flat2 = np.concatenate([np.asarray(x).ravel() for x in
                            __import__("jax").tree.leaves(state2)])
    assert not np.allclose(flat1, flat2)


def test_streaming_state_carries_context(setup, rng):
    """Chunk 2's output must depend on chunk 1 (cache works)."""
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.zipformer_streaming import (
        init_streaming_state, streaming_step,
    )

    cfg, scfg, params = setup
    b = 1
    c1 = jnp.asarray(rng.standard_normal((b, 64, 80)).astype(np.float32))
    c2 = jnp.asarray(rng.standard_normal((b, 64, 80)).astype(np.float32))

    s0 = init_streaming_state(cfg, scfg, b)
    _, s1 = streaming_step(params, s0, c1, cfg, scfg)
    out_with_ctx, _ = streaming_step(params, s1, c2, cfg, scfg)
    out_fresh, _ = streaming_step(params, s0, c2, cfg, scfg)
    diff = np.abs(np.asarray(out_with_ctx) - np.asarray(out_fresh)).max()
    assert diff > 1e-4  # context changes the output


def test_streaming_deterministic(setup, rng):
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.zipformer_streaming import (
        init_streaming_state, streaming_step,
    )

    cfg, scfg, params = setup
    b = 1
    chunks = [jnp.asarray(rng.standard_normal((b, 64, 80)).astype(np.float32))
              for _ in range(3)]

    def run():
        s = init_streaming_state(cfg, scfg, b)
        outs = []
        for c in chunks:
            o, s = streaming_step(params, s, c, cfg, scfg)
            outs.append(np.asarray(o))
        return np.concatenate(outs, axis=1)

    a, bb = run(), run()
    np.testing.assert_allclose(a, bb, atol=0)


def test_streaming_jit_compiles(setup, rng):
    import functools

    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.zipformer_streaming import (
        init_streaming_state, streaming_step,
    )

    cfg, scfg, params = setup
    step = jax.jit(functools.partial(streaming_step, cfg=cfg, scfg=scfg))
    s = init_streaming_state(cfg, scfg, 1)
    chunk = jnp.asarray(rng.standard_normal((1, 64, 80)).astype(np.float32))
    out1, s = step(params, s, chunk)
    out2, s = step(params, s, chunk)  # second call reuses the compile
    assert np.isfinite(np.asarray(out2)).all()


def test_streaming_embed_chunking_invariant(rng):
    """The causal cached ConvNeXt makes embed outputs independent of where
    chunk boundaries fall: two chunks processed sequentially == one pass."""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.registry import TINY_ZIPFORMER
    from sherpa_vietnamese_asr_tpu.models.zipformer import init_encoder_embed
    from sherpa_vietnamese_asr_tpu.models.zipformer_streaming import (
        _embed_freq_dim, _streaming_embed,
    )

    cfg = TINY_ZIPFORMER
    p = init_encoder_embed(jax.random.PRNGKey(0), cfg)
    b, look = 2, 7
    c3 = cfg.embed_layer3_channels
    fdim = _embed_freq_dim(cfg)
    # 64+64 fbank frames plus lookback; process as one pass and as 2 chunks
    x = jnp.asarray(rng.standard_normal((b, look + 128, cfg.num_features))
                    .astype(np.float32))
    tail0 = jnp.zeros((b, 6, fdim, c3), jnp.float32)
    full, _ = _streaming_embed(p, x, tail0, cfg)

    h1, tail1 = _streaming_embed(p, x[:, : look + 64], tail0, cfg)
    h2, _ = _streaming_embed(p, x[:, 64:], tail1, cfg)
    got = jnp.concatenate([h1, h2], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               atol=1e-5, rtol=1e-5)

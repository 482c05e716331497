# Conv-TasNet / CAM++ / overlap separation tests (tiny configs).
import numpy as np
import pytest


@pytest.fixture(scope="module")
def separator():
    import jax

    from sherpa_vietnamese_asr_tpu.models.campplus import (
        TINY_CAMPP, init_campp_params,
    )
    from sherpa_vietnamese_asr_tpu.models.convtasnet import (
        TINY_CONVTASNET, init_convtasnet_params,
    )
    from sherpa_vietnamese_asr_tpu.pipeline.overlap import OverlapSeparator

    return OverlapSeparator(
        convtasnet_params=init_convtasnet_params(jax.random.PRNGKey(0),
                                                 TINY_CONVTASNET),
        convtasnet_cfg=TINY_CONVTASNET,
        campp_params=init_campp_params(jax.random.PRNGKey(1), TINY_CAMPP),
        campp_cfg=TINY_CAMPP, embed_pad_sec=4.0)


def test_convtasnet_shapes(rng):
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.convtasnet import (
        TINY_CONVTASNET, convtasnet_separate, init_convtasnet_params,
    )
    params = init_convtasnet_params(jax.random.PRNGKey(0), TINY_CONVTASNET)
    mix = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)
    out = np.asarray(convtasnet_separate(params, mix, TINY_CONVTASNET))
    assert out.shape == (2, 2, 16000)
    assert np.isfinite(out).all()


def test_campp_embedding_shape_and_mask(rng):
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.campplus import (
        TINY_CAMPP, campp_embed, init_campp_params,
    )
    params = init_campp_params(jax.random.PRNGKey(0), TINY_CAMPP)
    fb = rng.standard_normal((2, 200, 80)).astype(np.float32)
    emb = np.asarray(campp_embed(params, jnp.asarray(fb), TINY_CAMPP))
    assert emb.shape == (2, TINY_CAMPP.embed_dim)
    # masked version: padding must not change the valid row's embedding
    fb_pad = np.concatenate([fb, rng.standard_normal((2, 100, 80))
                             .astype(np.float32)], axis=1)
    mask = np.zeros((2, 300), np.float32)
    mask[:, :200] = 1.0
    emb2 = np.asarray(campp_embed(params, jnp.asarray(fb_pad), TINY_CAMPP,
                                  mask=jnp.asarray(mask)))
    # conv leakage at the boundary is bounded; pooled stats dominated by mask
    cos = (emb * emb2).sum(-1) / (np.linalg.norm(emb, axis=-1)
                                  * np.linalg.norm(emb2, axis=-1))
    assert (cos > 0.98).all()


def test_overlap_region_filter(separator):
    # all regions < 1.0 s are dropped
    audio = np.zeros(16000 * 10, np.float32)
    out = separator.process(audio, [], [(1.0, 1.5), (3.0, 3.9)])
    assert out == []


def test_participants_and_clean_segment_selection(separator):
    segs = [{"start": 0.0, "end": 3.0, "speaker": 0},
            {"start": 2.5, "end": 6.0, "speaker": 1},
            {"start": 7.0, "end": 9.0, "speaker": 0}]
    parts = separator.participants_in_region((2.6, 2.9), segs)
    assert parts == [0, 1]
    before = separator._closest_clean_segment(segs, [(2.5, 3.0)], 0, 2.5,
                                              "before")
    assert before is None  # segment 0-3 intersects the overlap region
    after = separator._closest_clean_segment(segs, [(2.5, 3.0)], 0, 3.0,
                                             "after")
    assert after == (7.0, 9.0)


def test_full_overlap_process(separator, rng):
    sr = 16000
    t = np.arange(sr * 12) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    audio[sr * 5: sr * 7] += (0.3 * np.sin(2 * np.pi * 800 * t[: sr * 2])
                              ).astype(np.float32)
    segs = [{"start": 0.0, "end": 5.0, "speaker": 0},
            {"start": 5.0, "end": 7.0, "speaker": 1},
            {"start": 4.8, "end": 7.2, "speaker": 0},
            {"start": 8.0, "end": 11.0, "speaker": 1}]
    out = separator.process(audio, segs, [(5.0, 7.0)])
    assert len(out) == 1
    r = out[0]
    assert r["participants"] == [0, 1]
    for spk in r["participants"]:
        a = r["audio_per_speaker"][spk]
        rs = r["real_start_per_speaker"][spk]
        re = r["real_end_per_speaker"][spk]
        assert len(a) > 0 and 0 <= rs < re <= len(a) / sr + 1e-6


def test_filter_words_in_window():
    from sherpa_vietnamese_asr_tpu.pipeline.overlap import OverlapSeparator
    words = [{"text": "a", "start": 0.5, "end": 0.7},
             {"text": "b", "start": 2.0, "end": 2.2},
             {"text": "c", "start": 5.0, "end": 5.4}]
    out = OverlapSeparator.filter_words_in_window(words, 1.0, 4.0,
                                                  real_offset=10.0)
    assert len(out) == 1 and out[0]["text"] == "b"
    assert abs(out[0]["start"] - 12.0) < 1e-9

# Diarization stack: model shapes, aggregation/binarize replicas, VBx, and
# the full PureDiarizer pipeline on synthetic audio.
import numpy as np
import pytest


def test_pyannet_output_shape():
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.pyannet import (
        PyanNetConfig, init_pyannet_params, pyannet_forward,
    )
    cfg = PyanNetConfig(sinc_filters=16, conv_channels=12, lstm_hidden=16,
                        lstm_layers=1, linear_dim=16)
    params = init_pyannet_params(jax.random.PRNGKey(0), cfg)
    audio = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((2, 160000)).astype(np.float32) * 0.1)
    out = np.asarray(pyannet_forward(params, audio, cfg))
    assert out.shape == (2, 589, 7)  # NUM_SEG_FRAMES x powerset classes
    # log-softmax: probabilities sum to 1
    np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, atol=1e-4)


def test_resnet_frame_features_shape():
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.resnet_speaker import (
        TINY_RESNET, init_resnet_params, resnet_frame_features,
    )
    params = init_resnet_params(jax.random.PRNGKey(0), TINY_RESNET)
    fb = jnp.asarray(np.random.default_rng(0)
                     .standard_normal((2, 998, 80)).astype(np.float32))
    feat = np.asarray(resnet_frame_features(params, fb, TINY_RESNET))
    assert feat.shape == (2, TINY_RESNET.frame_feature_dim,
                          TINY_RESNET.out_time(998))
    assert TINY_RESNET.out_time(998) == 125


def test_masked_stats_pool_matches_reference_formula(rng):
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.ops.stats_pool import masked_stats_pool

    feat = rng.standard_normal((2, 6, 20)).astype(np.float32)
    w = (rng.random((2, 3, 20)) > 0.5).astype(np.float32)
    got = np.asarray(masked_stats_pool(jnp.asarray(feat), jnp.asarray(w)))
    for b in range(2):
        for s in range(3):
            ww = w[b, s][None, :]
            v1 = ww.sum() + 1e-8
            mean = (feat[b] * ww).sum(axis=1) / v1
            dx2 = (feat[b] - mean[:, None]) ** 2
            v2 = (ww * ww).sum()
            var = (dx2 * ww).sum(axis=1) / (v1 - v2 / v1 + 1e-8)
            expect = np.concatenate([mean, np.sqrt(var)])
            np.testing.assert_allclose(got[b, s], expect, atol=1e-4)


def test_aggregate_overlapping_chunks():
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_pure import (
        SW, pyannote_aggregate,
    )
    # two chunks, constant scores 1.0 and 3.0; overlap region averages to 2.0
    chunk_sw = SW(0.0, 10.0, 1.0)
    frame_sw = SW(0.0, 0.0619375, 0.016875)
    data = np.stack([np.full((589, 1), 1.0, np.float32),
                     np.full((589, 1), 3.0, np.float32)])
    out = pyannote_aggregate(data, chunk_sw, frame_sw, missing=0.0)
    vals = out.data[:, 0]
    assert abs(vals[10] - 1.0) < 1e-6       # only chunk 0
    mid = int(5.0 / 0.016875)
    assert abs(vals[mid] - 2.0) < 1e-6      # overlap: mean of 1 and 3
    # skip_average sums instead
    out2 = pyannote_aggregate(data, chunk_sw, frame_sw, skip_average=True,
                              missing=0.0)
    assert abs(out2.data[mid, 0] - 4.0) < 1e-6


def test_binarize_hysteresis():
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_pure import (
        SW, binarize_scores,
    )
    sw = SW(0.0, 0.1, 0.1)
    y = np.zeros((20, 1), np.float32)
    y[5:10, 0] = 0.9
    y[14:17, 0] = 0.9
    segs = binarize_scores(y, sw, onset=0.5, offset=0.5)
    assert len(segs) == 2
    assert all(k == 0 for _, _, k in segs)
    # gap fill with min_duration_off
    segs2 = binarize_scores(y, sw, onset=0.5, offset=0.5,
                            min_duration_off=1.0)
    assert len(segs2) == 1


def test_vbx_clusters_separable_embeddings(rng):
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_pure import (
        vbx_cluster,
    )
    d = 16
    a = rng.standard_normal(d) * 3
    b = rng.standard_normal(d) * 3
    fea = np.stack([a + 0.1 * rng.standard_normal(d) for _ in range(10)]
                   + [b + 0.1 * rng.standard_normal(d) for _ in range(10)])
    ahc = np.array([0] * 10 + [1] * 10)
    gamma, pi = vbx_cluster(fea, np.ones(d) * 4.0, ahc, fa=0.07, fb=0.8)
    labels = gamma.argmax(axis=1)
    assert (labels[:10] == labels[0]).all()
    assert (labels[10:] == labels[10]).all()
    assert labels[0] != labels[10]


def test_pure_diarizer_end_to_end(rng):
    import jax

    from sherpa_vietnamese_asr_tpu.models.pyannet import (
        PyanNetConfig, init_pyannet_params,
    )
    from sherpa_vietnamese_asr_tpu.models.resnet_speaker import TINY_RESNET
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_pure import (
        PureDiarizer,
    )
    seg_cfg = PyanNetConfig(sinc_filters=16, conv_channels=12,
                            lstm_hidden=16, lstm_layers=1, linear_dim=16)
    diar = PureDiarizer(
        seg_params=init_pyannet_params(jax.random.PRNGKey(3), seg_cfg),
        seg_cfg=seg_cfg, emb_cfg=TINY_RESNET,
        segmentation_batch_size=4, embedding_batch_size=4)

    sr = 16000
    t = np.arange(sr * 15) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    audio[sr * 7: sr * 8] = 0.0
    segments = diar.process(audio)
    assert isinstance(segments, list)
    for s in segments:
        assert 0 <= s["start"] <= s["end"]
        assert isinstance(s["speaker"], int)
    # canonical speaker ids start at 0 and are contiguous
    if segments:
        ids = sorted({s["speaker"] for s in segments})
        assert ids == list(range(len(ids)))
    assert isinstance(diar.overlap_regions, list)


def test_canonicalize_clusters():
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_pure import (
        PureDiarizer,
    )
    hard = np.array([[5, -2, 3], [3, 5, -2]], np.int8)
    act = np.zeros((2, 10, 3), np.float32)
    act[0, 2, 0] = 1  # cluster 5 first active at chunk 0 frame 2
    act[0, 0, 2] = 1  # cluster 3 first active at chunk 0 frame 0
    act[1, :, :] = 1
    out, remap = PureDiarizer._canonicalize_clusters(None, hard, act)
    # cluster 3 becomes 0 (earlier first activity), cluster 5 becomes 1
    assert remap == {3: 0, 5: 1}
    np.testing.assert_array_equal(out, [[1, -2, 0], [0, 1, -2]])


def test_fused_superblock_matches_classic(rng):
    """The fused superblock path (one upload per span, in-graph overlapped
    views) must reproduce the classic per-window path: identical binarized
    segmentation, near-identical embeddings."""
    import jax

    from sherpa_vietnamese_asr_tpu.models.pyannet import (
        PyanNetConfig, init_pyannet_params,
    )
    from sherpa_vietnamese_asr_tpu.models.resnet_speaker import TINY_RESNET
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_pure import (
        POWERSET_MAP, PureDiarizer,
    )

    seg_cfg = PyanNetConfig(sinc_filters=16, conv_channels=12,
                            lstm_hidden=16, lstm_layers=1, linear_dim=16)
    kw = dict(seg_params=init_pyannet_params(jax.random.PRNGKey(3), seg_cfg),
              seg_cfg=seg_cfg, emb_cfg=TINY_RESNET,
              segmentation_batch_size=4, embedding_batch_size=4)
    sr = 16000
    t = np.arange(sr * 14) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)
             * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
             + 0.02 * rng.standard_normal(len(t))).astype(np.float32)

    classic = PureDiarizer(fused=False, **kw)
    seg_logits, starts = classic._segment(audio)
    bin_c = POWERSET_MAP[np.argmax(seg_logits, axis=-1)]
    clean = bin_c * (bin_c.sum(axis=2, keepdims=True) < 2)
    import math as _m
    msf = _m.ceil(bin_c.shape[1] * 1680 / 160000)
    emb_c = classic._extract_embeddings(audio, bin_c, clean, starts, msf,
                                        None)

    # exact-dtype path first
    fused = PureDiarizer(fused=True, transfer_dtype="float32", **kw)
    bin_f, starts_f, emb_f = fused._segment_and_embed_fused(audio)
    assert starts_f == starts
    np.testing.assert_array_equal(bin_f, bin_c)
    both = ~np.isnan(emb_c[..., 0]) & ~np.isnan(emb_f[..., 0])
    assert both.any()
    np.testing.assert_array_equal(np.isnan(emb_f[..., 0]),
                                  np.isnan(emb_c[..., 0]))
    cf, cc = emb_f[both], emb_c[both]
    cos = (cf * cc).sum(-1) / (np.linalg.norm(cf, axis=-1)
                               * np.linalg.norm(cc, axis=-1) + 1e-9)
    assert cos.min() > 0.9999

    # int16 transfer: binarization may flip only on near-ties
    fused16 = PureDiarizer(fused=True, transfer_dtype="int16", **kw)
    bin_q, _, emb_q = fused16._segment_and_embed_fused(audio)
    agree = (bin_q == bin_c).mean()
    assert agree > 0.995
    both_q = ~np.isnan(emb_q[..., 0]) & ~np.isnan(emb_c[..., 0])
    cq, cc2 = emb_q[both_q], emb_c[both_q]
    cos_q = (cq * cc2).sum(-1) / (np.linalg.norm(cq, axis=-1)
                                  * np.linalg.norm(cc2, axis=-1) + 1e-9)
    assert cos_q.min() > 0.999


def test_cluster_assignment_with_nan_embedding_rows(rng):
    """An ACTIVE chunk-speaker can still carry a NaN embedding (below the
    min_seg_frames validity floor in the superblock path). The soft-cluster
    assignment must pin such rows to max cosine distance instead of feeding
    NaN into linear_sum_assignment ("matrix contains invalid numeric
    entries" — round-4 flake in the background-overlap pipeline test)."""
    import jax

    from sherpa_vietnamese_asr_tpu.models.pyannet import (
        PyanNetConfig, init_pyannet_params,
    )
    from sherpa_vietnamese_asr_tpu.models.resnet_speaker import TINY_RESNET
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_pure import (
        NUM_SEG_FRAMES, PureDiarizer,
    )

    seg_cfg = PyanNetConfig(sinc_filters=16, conv_channels=12,
                            lstm_hidden=16, lstm_layers=1, linear_dim=16)
    diar = PureDiarizer(
        seg_params=init_pyannet_params(jax.random.PRNGKey(3), seg_cfg),
        seg_cfg=seg_cfg, emb_cfg=TINY_RESNET)

    num_chunks, num_speakers = 6, 3
    dim = TINY_RESNET.embed_dim
    emb = rng.standard_normal((num_chunks, num_speakers, dim)) \
        .astype(np.float32)
    # Two slots are ACTIVE in the segmentation but have NaN embeddings.
    emb[1, 2] = np.nan
    emb[4, 0] = np.nan
    seg = np.zeros((num_chunks, NUM_SEG_FRAMES, num_speakers), np.float32)
    seg[:, :, :] = 1.0  # every slot active -> nothing hidden by const mask
    train_mask = ~np.isnan(emb[..., 0])

    hard = diar._cluster(emb, train_mask, seg)
    assert hard.shape == (num_chunks, num_speakers)
    assert (hard >= -2).all()

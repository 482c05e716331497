# Senko CAM++ diarizer: clustering rules + end-to-end with tiny models.
import numpy as np
import pytest


def _blob(rng, center, n, d=16, spread=0.05):
    return center[None, :] + spread * rng.standard_normal((n, d))


def test_spectral_eigengap_two_speakers(rng):
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_senko import (
        senko_spectral,
    )
    a = rng.standard_normal(16)
    b = rng.standard_normal(16)
    x = np.concatenate([_blob(rng, a, 15), _blob(rng, b, 15)])
    labels = senko_spectral(x.astype(np.float32), pval=0.012,
                            min_num_spks=1, max_num_spks=15)
    assert len(np.unique(labels)) == 2
    assert (labels[:15] == labels[0]).all()
    assert (labels[15:] == labels[15]).all()


def test_senko_cluster_minor_filter_and_merge(rng):
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_senko import (
        senko_cluster,
    )
    a = rng.standard_normal(16) * 3
    # two blobs that are nearly identical -> merged by mer_cos
    x = np.concatenate([
        _blob(rng, a, 12), _blob(rng, a + 0.01, 12),
    ]).astype(np.float32)
    labels = senko_cluster(x, cluster_type="spectral", mer_cos=0.875,
                           min_cluster_size=4, min_num_spks=1,
                           max_num_spks=15, pval=0.012)
    assert len(np.unique(labels)) == 1
    # below cluster_line -> single cluster of ones
    small = _blob(rng, a, 5).astype(np.float32)
    assert (senko_cluster(small, cluster_type="spectral") == 1).all()


def test_umap_hdbscan_long_audio_route(rng):
    """First-party UMAP+HDBSCAN route (utils/clustering.py): separable
    blobs must come back as exactly two clusters."""
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_senko import (
        senko_umap_hdbscan,
    )
    a, b = rng.standard_normal(16) * 4, rng.standard_normal(16) * 4
    x = np.concatenate([_blob(rng, a, 40), _blob(rng, b, 40)]).astype(
        np.float32)
    labels = senko_umap_hdbscan(x, min_samples=5, min_cluster_size=5)
    assert labels.shape == (80,)
    assert len(set(labels[:40].tolist())) == 1
    assert len(set(labels[40:].tolist())) == 1
    assert labels[0] != labels[40]


def test_senko_diarizer_end_to_end(rng):
    import jax

    from sherpa_vietnamese_asr_tpu.models.campplus import (
        TINY_CAMPP, init_campp_params,
    )
    from sherpa_vietnamese_asr_tpu.models.pyannet import (
        PyanNetConfig, init_pyannet_params,
    )
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_senko import (
        SenkoCamppDiarizer,
    )
    seg_cfg = PyanNetConfig(sinc_filters=16, conv_channels=12,
                            lstm_hidden=16, lstm_layers=1, linear_dim=16)
    diar = SenkoCamppDiarizer(
        seg_params=init_pyannet_params(jax.random.PRNGKey(2), seg_cfg),
        seg_cfg=seg_cfg,
        campp_params=init_campp_params(jax.random.PRNGKey(3), TINY_CAMPP),
        campp_cfg=TINY_CAMPP, batch_size=8)
    sr = 16000
    t = np.arange(sr * 12) / sr
    audio = (0.3 * np.sin(2 * np.pi * 240 * t)).astype(np.float32)
    segments = diar.process(audio)
    assert isinstance(segments, list)
    for s in segments:
        assert s["end"] > s["start"] and isinstance(s["speaker"], int)
    # speakers re-ranked by speaking time: ids contiguous from 0
    if segments:
        ids = sorted({s["speaker"] for s in segments})
        assert ids == list(range(len(ids)))
    assert isinstance(diar.overlap_regions, list)


def test_segments_from_labels_merging():
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_senko import (
        SenkoCamppDiarizer,
    )
    d = SenkoCamppDiarizer.__new__(SenkoCamppDiarizer)
    d.min_duration_off = 0.0
    times = [(0.0, 1.5), (0.6, 2.1), (1.2, 2.7), (5.0, 6.5)]
    labels = [0, 0, 1, 1]
    segs = d._segments_from_labels(times, labels)
    assert len(segs) == 3
    assert segs[0] == {"start": 0.0, "end": 2.1, "speaker": 0}
    assert segs[1]["speaker"] == 1


def test_fused_window_blocks_match_classic_batches(rng):
    """The fused superblock path (region fbank uploaded once, overlapped
    window views gathered in-graph) must produce the same embeddings as
    computing each zero-padded window with a direct CAM++ call — including
    across forced block flushes (shrunken block geometry)."""
    import jax
    import jax.numpy as jnp

    from sherpa_vietnamese_asr_tpu.models.campplus import (
        TINY_CAMPP, campp_embed, init_campp_params,
    )
    from sherpa_vietnamese_asr_tpu.ops import fbank as fbank_ops
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_senko import (
        SAMPLE_RATE, SenkoCamppDiarizer,
    )
    from sherpa_vietnamese_asr_tpu.utils.fbank_ref import CAMPP_FBANK

    d = SenkoCamppDiarizer.__new__(SenkoCamppDiarizer)
    d.campp_cfg = TINY_CAMPP
    d.campp_params = init_campp_params(jax.random.PRNGKey(5), TINY_CAMPP)
    d.window, d.step = 1.5, 0.6
    d.batch_size = 8
    # Tiny blocks: a few hundred frames / 4 window slots force many flushes.
    d.block_frames, d.block_windows = 400, 4

    sr = SAMPLE_RATE
    t = np.arange(sr * 9) / sr
    audio = (0.25 * np.sin(2 * np.pi * 300 * t)
             + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    # region 2 is shorter than one window (short-window mask path)
    regions = [(0.5, 4.9), (5.2, 8.4), (8.5, 9.0)]

    embs, times = d._sliding_window_embeddings(audio, regions)
    assert len(times) == embs.shape[0] > 4

    # classic oracle: per-window zero-padded batch of 1
    w_frames = int(d.window * 100)
    k = 0
    for rs, re_ in regions:
        s0, e0 = int(rs * sr), min(int(re_ * sr), len(audio))
        fb = fbank_ops.compute_fbank_streamed(audio[s0:e0], CAMPP_FBANK)
        nf = fb.shape[0]
        wins = []
        if nf < w_frames:
            wins.append((0, nf))
        else:
            pos = 0
            while pos + w_frames < nf:
                wins.append((pos, w_frames))
                pos += int(d.step * 100)
            wins.append((nf - w_frames, w_frames))
        for pos, wlen in wins:
            feats = np.zeros((1, w_frames, 80), np.float32)
            mask = np.zeros((1, w_frames), np.float32)
            feats[0, :wlen] = fb[pos: pos + wlen]
            mask[0, :wlen] = 1.0
            ref = np.asarray(campp_embed(
                d.campp_params, jnp.asarray(feats), TINY_CAMPP,
                mask=jnp.asarray(mask)))[0]
            n = np.linalg.norm(ref)
            ref = ref / n if n > 1e-10 else ref
            np.testing.assert_allclose(embs[k], ref, atol=2e-4,
                                       err_msg=f"window {k}")
            k += 1
    assert k == embs.shape[0]

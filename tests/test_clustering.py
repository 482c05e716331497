# First-party UMAP + HDBSCAN (utils/clustering.py, native/clusterkit.cpp).
#
# Oracle strategy: HDBSCAN is validated EXACTLY (label-permutation-invariant)
# against sklearn's independent implementation; UMAP is validated on
# structure-preservation invariants plus determinism (the reference
# implementation is itself nondeterministic run to run, so a bitwise oracle
# does not exist); the combined Senko long-audio route is pinned to the
# ground-truth partition on synthetic separable speaker embeddings, per the
# reference semantics (speaker_diarization_senko_campp.py:263-281).

import itertools

import numpy as np
import pytest

from sherpa_vietnamese_asr_tpu.utils.clustering import (
    _mr_mst_numpy,
    hdbscan_labels,
    knn,
    umap_embed,
)


def _agree(a, b):
    ua = [x for x in np.unique(a) if x >= 0]
    ub = [x for x in np.unique(b) if x >= 0]
    if len(ua) != len(ub):
        return 0.0
    best = 0.0
    for perm in itertools.permutations(ub):
        m = {x: y for x, y in zip(ua, perm)}
        bb = np.array([m.get(x, -1) for x in a])
        best = max(best, float((bb == b).mean()))
    return best


def _blobs(rng, centers, per, sigma):
    x = np.concatenate(
        [c + sigma * rng.standard_normal((per, centers.shape[1]))
         for c in centers])
    gt = np.repeat(np.arange(len(centers)), per)
    return x, gt


def test_knn_exact():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((200, 7)).astype(np.float32)
    idx, dist = knn(x, 9)
    d2 = ((x[:, None] - x[None]) ** 2).sum(-1)
    ref = np.sort(np.sqrt(d2), axis=1)[:, :9]
    assert np.all(idx[:, 0] == np.arange(200))
    np.testing.assert_allclose(dist, ref, atol=1e-3)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hdbscan_matches_sklearn(seed):
    """Exact label parity with the independent sklearn implementation
    (blobs + uniform noise, several geometries)."""
    from sklearn.cluster import HDBSCAN

    rng = np.random.default_rng(seed)
    centers = 7.0 * rng.standard_normal((4, 10))
    x = np.concatenate(
        [c + rng.standard_normal((120, 10)) for c in centers]
        + [20.0 * rng.uniform(-1, 1, (50, 10))])
    mine = hdbscan_labels(x, min_samples=15, min_cluster_size=10)
    ref = HDBSCAN(min_samples=15, min_cluster_size=10,
                  copy=True).fit_predict(x)
    assert _agree(mine, ref) == 1.0


def test_hdbscan_noise_and_small_clusters():
    rng = np.random.default_rng(3)
    centers = 8.0 * rng.standard_normal((3, 6))
    x, gt = _blobs(rng, centers, 80, 0.5)
    # a 5-point clump: below min_cluster_size -> absorbed or noise
    x = np.concatenate([x, 30.0 + 0.1 * rng.standard_normal((5, 6))])
    labels = hdbscan_labels(x, min_samples=10, min_cluster_size=10)
    assert len(set(labels[labels >= 0].tolist())) == 3
    # each blob maps to exactly one cluster label
    blob_labels = set()
    for lab in range(3):
        got = set(labels[: len(gt)][gt == lab].tolist()) - {-1}
        assert len(got) == 1, (lab, got)
        blob_labels |= got
    assert len(blob_labels) == 3
    # clump points do not form their own cluster
    assert set(labels[240:].tolist()) <= blob_labels | {-1}


def test_mst_numpy_native_same_weight():
    from sherpa_vietnamese_asr_tpu.utils.clustering import _mr_mst
    from sherpa_vietnamese_asr_tpu.utils.native import get_clusterkit

    if get_clusterkit() is None:
        pytest.skip("native clusterkit unavailable")
    rng = np.random.default_rng(4)
    x = rng.standard_normal((300, 12)).astype(np.float32)
    _, dist = knn(x, 6)
    core = dist[:, 5].astype(np.float64)
    w_native = np.sort(_mr_mst(x, core)[:, 2])
    w_numpy = np.sort(_mr_mst_numpy(x, core)[:, 2])
    np.testing.assert_allclose(w_native, w_numpy, rtol=1e-5)


def test_umap_deterministic():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((150, 16)).astype(np.float32)
    a = umap_embed(x, n_neighbors=10, n_components=4)
    b = umap_embed(x, n_neighbors=10, n_components=4)
    np.testing.assert_array_equal(a, b)


def test_umap_separates_clusters():
    """Structure invariant: well-separated blobs stay separated — every
    point's layout-space nearest neighbors share its blob."""
    rng = np.random.default_rng(6)
    centers = rng.standard_normal((3, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x, gt = _blobs(rng, centers, 120, 0.06)
    emb = umap_embed(x, n_neighbors=15, n_components=8)
    idx, _ = knn(emb, 6)
    same = (gt[idx[:, 1:]] == gt[:, None]).mean()
    assert same > 0.99, same


def test_umap_numpy_fallback(monkeypatch):
    """The no-compiler fallback layout still recovers cluster structure."""
    import sherpa_vietnamese_asr_tpu.utils.clustering as C

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((2, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x, gt = _blobs(rng, centers, 60, 0.05)
    import sherpa_vietnamese_asr_tpu.utils.native as native
    monkeypatch.setattr(native, "get_clusterkit", lambda: None)
    emb = umap_embed(x, n_neighbors=10, n_components=4)
    labels = hdbscan_labels(emb, min_samples=10, min_cluster_size=10)
    assert _agree(labels, gt) == 1.0
    del C


def test_senko_long_audio_route_ground_truth():
    """The >= 20 min Senko route (UMAP 60-dim + HDBSCAN + minor-filter +
    merge-by-cos) recovers the exact speaker partition on separable
    CAM++-like embeddings — the reference algorithm's behavior contract."""
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_senko import (
        senko_cluster,
    )

    rng = np.random.default_rng(8)
    centers = rng.standard_normal((4, 192))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    sizes = [260, 200, 150, 90]
    x = np.concatenate(
        [c + 0.09 * rng.standard_normal((s, 192))
         for c, s in zip(centers, sizes)]).astype(np.float32)
    gt = np.concatenate([np.full(s, i) for i, s in enumerate(sizes)])
    labels = senko_cluster(x, cluster_type="umap_hdbscan")
    assert _agree(labels, gt) == 1.0


def test_senko_umap_hdbscan_merges_minor_into_major():
    """A sub-min_cluster_size clump must be reassigned to the closest major
    centroid by filter_minor_cluster, not surface as its own speaker."""
    from sherpa_vietnamese_asr_tpu.pipeline.diarization_senko import (
        senko_cluster,
    )

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((2, 192))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x, gt = _blobs(rng, centers, 150, 0.08)
    # 3 stray points near center 0 (below min_cluster_size=4): noise ->
    # reassigned to the nearest major centroid
    stray = centers[0] + 0.5 * rng.standard_normal((3, 192))
    x = np.concatenate([x, stray]).astype(np.float32)
    labels = senko_cluster(x, cluster_type="umap_hdbscan")
    assert set(labels.tolist()) == {0, 1}
    assert _agree(labels[:300], gt) == 1.0

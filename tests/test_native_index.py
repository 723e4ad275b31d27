import numpy as np
import pytest

native = pytest.importorskip("hairci.native")
if not native.available():
    pytest.skip("native build unavailable", allow_module_level=True)

from hairci.native import METRIC_IP, METRIC_L2, NativeFlatIndex


def test_build_add_search_ip(rng):
    emb = rng.normal(size=(200, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    idx = NativeFlatIndex(32, METRIC_IP)
    idx.add(emb)
    assert len(idx) == 200
    scores, indices = idx.search(emb[:5], k=3)
    np.testing.assert_array_equal(indices[:, 0], np.arange(5))
    np.testing.assert_allclose(scores[:, 0], 1.0, atol=1e-5)
    # exact ordering vs numpy
    ref = np.argsort(-(emb[:5] @ emb.T), axis=1, kind="stable")[:, :3]
    np.testing.assert_array_equal(indices, ref)


def test_l2_metric_ordering(rng):
    emb = rng.normal(size=(50, 8)).astype(np.float32)
    idx = NativeFlatIndex(8, METRIC_L2)
    idx.add(emb)
    q = emb[7:8] + 0.001
    scores, indices = idx.search(q, k=2)
    assert indices[0, 0] == 7
    assert scores[0, 0] <= 0.0  # negative squared distance


def test_matches_gallery_index(rng):
    """Host index and TPU GalleryIndex agree on normalized vectors."""
    from hairci.retrieval.index import GalleryIndex

    emb = rng.normal(size=(120, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.normal(size=(9, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    gi = GalleryIndex(emb, [str(i) for i in range(120)], normalized=True)
    gs, gidx = gi.search(q, k=7, normalized=True)
    ni = NativeFlatIndex(16, METRIC_IP)
    ni.add(emb)
    ns, nidx = ni.search(q, k=7)
    np.testing.assert_array_equal(gidx, nidx)
    np.testing.assert_allclose(gs, ns, rtol=1e-5, atol=1e-5)


def test_persistence_roundtrip(tmp_path, rng):
    emb = rng.normal(size=(30, 8)).astype(np.float32)
    idx = NativeFlatIndex(8, METRIC_IP)
    idx.add(emb)
    path = str(tmp_path / "gallery.hciflat")
    idx.save(path)
    loaded = NativeFlatIndex.load(path)
    assert len(loaded) == 30 and loaded.dim == 8
    s1, i1 = idx.search(emb[:3], 5)
    s2, i2 = loaded.search(emb[:3], 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2)


def test_multithreaded_matches_single(rng):
    emb = rng.normal(size=(500, 16)).astype(np.float32)
    idx = NativeFlatIndex(16, METRIC_IP)
    idx.add(emb)
    q = rng.normal(size=(64, 16)).astype(np.float32)
    s1, i1 = idx.search(q, 10, num_threads=1)
    s8, i8 = idx.search(q, 10, num_threads=8)
    np.testing.assert_array_equal(i1, i8)

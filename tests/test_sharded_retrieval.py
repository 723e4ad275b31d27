import jax.numpy as jnp
import numpy as np
import pytest

from hairci.parallel import create_mesh
from hairci.retrieval.index import GalleryIndex
from hairci.retrieval.sharded import ShardedGalleryIndex, sharded_gallery_search


def _data(rng, n=512, d=32, q=7):
    g = rng.normal(size=(n, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    qq = rng.normal(size=(q, d)).astype(np.float32)
    qq /= np.linalg.norm(qq, axis=1, keepdims=True)
    return g, qq


def test_sharded_matches_single_device(rng):
    mesh = create_mesh()
    g, q = _data(rng)
    single = GalleryIndex(g, [str(i) for i in range(512)], normalized=True)
    s1, i1 = single.search(q, k=10, normalized=True)
    s8, i8 = sharded_gallery_search(mesh, jnp.asarray(q), jnp.asarray(g),
                                    k=10)
    np.testing.assert_array_equal(np.asarray(i8), i1)
    np.testing.assert_allclose(np.asarray(s8), s1, rtol=1e-5, atol=1e-5)


def test_sharded_tie_breaking(rng):
    mesh = create_mesh()
    base = rng.normal(size=(8, 16)).astype(np.float32)
    g = np.concatenate([base] * 8)  # duplicates across shards
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = g[:4]
    s, i = sharded_gallery_search(mesh, jnp.asarray(q), jnp.asarray(g), k=3)
    i = np.asarray(i)
    # lowest global index wins ties
    np.testing.assert_array_equal(i[:, 0], np.arange(4))
    np.testing.assert_array_equal(i[:, 1], np.arange(4) + 8)


def test_sharded_index_facade_with_padding(rng):
    mesh = create_mesh()
    g, q = _data(rng, n=100)  # 100 not divisible by 8 → padded
    idx = ShardedGalleryIndex(mesh, g, [str(i) for i in range(100)],
                              normalized=True)
    assert len(idx) == 100
    s, i = idx.search(q, k=5, normalized=True)
    ref = GalleryIndex(g, [str(i) for i in range(100)], normalized=True)
    rs, ri = ref.search(q, k=5, normalized=True)
    np.testing.assert_array_equal(i, ri)
    np.testing.assert_allclose(s, rs, rtol=1e-5, atol=1e-5)

"""Pallas kernel correctness — interpret mode on CPU (real-TPU execution is
exercised by bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hairci.ops.topk_pallas import topk_gallery_search


def _ref_topk(q, g, k):
    scores = q @ g.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


@pytest.mark.parametrize("Q,N,D,k,chunk", [
    (4, 100, 32, 5, 32),     # padding on every axis + multiple chunks
    (8, 256, 128, 10, 128),  # aligned
    (3, 50, 16, 60, 32),     # k > N → clamped to N
])
def test_pallas_topk_matches_reference(rng, Q, N, D, k, chunk):
    q = rng.normal(size=(Q, D)).astype(np.float32)
    g = rng.normal(size=(N, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    s, i = topk_gallery_search(jnp.asarray(q), jnp.asarray(g), k=k,
                               chunk=chunk, interpret=True)
    rs, ri = _ref_topk(q, g, min(k, N))
    np.testing.assert_allclose(np.asarray(s), rs, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_pallas_topk_tie_breaking(rng):
    # duplicated gallery rows → equal scores; lower index must win
    base = rng.normal(size=(10, 16)).astype(np.float32)
    g = np.concatenate([base, base])  # rows i and i+10 identical
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = g[:4]
    s, i = topk_gallery_search(jnp.asarray(q), jnp.asarray(g), k=2,
                               chunk=8, interpret=True)
    i = np.asarray(i)
    # top-1 = the lower-index duplicate (self), top-2 = the higher duplicate
    np.testing.assert_array_equal(i[:, 0], np.arange(4))
    np.testing.assert_array_equal(i[:, 1], np.arange(4) + 10)


def test_pallas_topk_bf16_ranking(rng):
    q = rng.normal(size=(4, 64)).astype(np.float32)
    g = rng.normal(size=(200, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    s32, i32 = topk_gallery_search(jnp.asarray(q), jnp.asarray(g), k=5,
                                   chunk=64, interpret=True)
    s16, i16 = topk_gallery_search(jnp.asarray(q), jnp.asarray(g), k=5,
                                   chunk=64, interpret=True, bf16=True)
    # top-1 agrees on random (well-separated) data; scores close
    np.testing.assert_array_equal(np.asarray(i32)[:, 0],
                                  np.asarray(i16)[:, 0])
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), atol=0.02)

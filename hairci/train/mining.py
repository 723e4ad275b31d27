"""Cluster-based hard-negative mining — the on-device replacement for the
reference's FAISS utilities (`/root/reference/HairPretraining/src/
pretrain_engine.py:536-600`):

  estimate_k_by_pca : PCA eigen-spectrum → K (faiss.PCAMatrix → jnp.linalg.eigh
                      of the covariance; same cumulative-variance rule)
  run_kmeans        : faiss.Kmeans(niter=20) → jitted Lloyd iterations
                      (one (N, K) distance matmul per iteration on the MXU)
  mine_hard_negatives: 2nd-nearest centroid → random pick among the top-5
                      samples nearest that centroid, self-collisions fixed
                      (`pretrain_engine.py:568-600`)
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def estimate_k_by_pca(X: jnp.ndarray, explained_var_threshold: float = 0.9,
                      scale_factor: float = 2.0, max_k: int = 2000
                      ) -> Tuple[int, int]:
    """K estimate from the PCA cumulative explained-variance ratio."""
    X = jnp.asarray(X, jnp.float32)
    N, D = X.shape
    Xc = X - X.mean(axis=0, keepdims=True)
    cov = (Xc.T @ Xc) / max(N - 1, 1)
    eig = jnp.linalg.eigvalsh(cov)[::-1]  # descending
    eig = jnp.maximum(eig, 0.0)
    ratio = eig / jnp.maximum(jnp.sum(eig), 1e-12)
    cumulative = jnp.cumsum(ratio)
    m_star = int(np.searchsorted(np.asarray(cumulative),
                                 explained_var_threshold) + 1)
    k_est = int(np.clip(scale_factor * m_star, 5, min(max_k, N - 1)))
    return k_est, m_star


@partial(jax.jit, static_argnames=("k", "niter"))
def _lloyd(X: jnp.ndarray, init_idx: jnp.ndarray, k: int, niter: int):
    centroids = X[init_idx]  # (K, D)

    def step(centroids, _):
        # squared L2 via the expanded form: one matmul + norms
        d = (jnp.sum(X**2, axis=1, keepdims=True)
             - 2.0 * jnp.einsum("nd,kd->nk", X, centroids,
                                preferred_element_type=jnp.float32)
             + jnp.sum(centroids**2, axis=1)[None])
        assign = jnp.argmin(d, axis=1)  # (N,)
        onehot = jax.nn.one_hot(assign, k, dtype=X.dtype)  # (N, K)
        counts = jnp.sum(onehot, axis=0)  # (K,)
        sums = jnp.einsum("nk,nd->kd", onehot, X,
                          preferred_element_type=jnp.float32)
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        # keep old centroid for empty clusters (faiss behavior)
        new_c = jnp.where(counts[:, None] > 0, new_c, centroids)
        return new_c, assign

    centroids, assigns = jax.lax.scan(step, centroids, None, length=niter)
    return centroids, assigns[-1]


@partial(jax.jit, static_argnames=("k",))
def _kmeanspp_init(X: jnp.ndarray, key: jax.Array, k: int) -> jnp.ndarray:
    """k-means++ seeding: each next seed sampled ∝ distance² to the nearest
    chosen seed (fixes the split/merge local optima of uniform seeding)."""
    N = X.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, N)
    idxs = jnp.zeros((k,), jnp.int32).at[0].set(first)
    d2 = jnp.sum((X - X[first]) ** 2, axis=1)

    def body(i, carry):
        idxs, d2, key = carry
        key, sub = jax.random.split(key)
        probs = d2 / jnp.maximum(jnp.sum(d2), 1e-12)
        nxt = jax.random.choice(sub, N, p=probs)
        idxs = idxs.at[i].set(nxt)
        d2 = jnp.minimum(d2, jnp.sum((X - X[nxt]) ** 2, axis=1))
        return idxs, d2, key

    idxs, _, _ = jax.lax.fori_loop(1, k, body, (idxs, d2, key))
    return idxs


def run_kmeans(X: jnp.ndarray, k: int, niter: int = 20, seed: int = 0
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd K-means with k-means++ init; returns (centroids (K, D),
    assignments (N,))."""
    X = jnp.asarray(X, jnp.float32)
    init_idx = _kmeanspp_init(X, jax.random.key(seed), k)
    return _lloyd(X, init_idx, k, niter)


@partial(jax.jit, static_argnames=("topk",))
def _mine(anchor: jnp.ndarray, centroids: jnp.ndarray, key: jax.Array,
          topk: int = 5):
    N = anchor.shape[0]
    # 2 nearest centroids per anchor
    d_ac = (jnp.sum(anchor**2, axis=1, keepdims=True)
            - 2.0 * jnp.einsum("nd,kd->nk", anchor, centroids,
                               preferred_element_type=jnp.float32)
            + jnp.sum(centroids**2, axis=1)[None])
    _, top2 = jax.lax.top_k(-d_ac, 2)
    neighbor_cid = top2[:, 1]  # (N,)
    # top-k samples nearest each centroid
    d_cs = d_ac.T  # (K, N)
    _, samp_idx = jax.lax.top_k(-d_cs, topk)  # (K, topk)
    offs = jax.random.randint(key, (N,), 0, topk)
    cand = samp_idx[neighbor_cid]  # (N, topk)
    hard = jnp.take_along_axis(cand, offs[:, None], axis=1)[:, 0]
    # self-collision → first candidate of that centroid
    hard = jnp.where(hard == jnp.arange(N), cand[:, 0], hard)
    return hard


def mine_hard_negatives(anchor: jnp.ndarray, centroids: jnp.ndarray,
                        seed: int = 0, topk: int = 5) -> jnp.ndarray:
    """Hard-negative ids per anchor via the 2nd-nearest-centroid rule."""
    return _mine(jnp.asarray(anchor, jnp.float32),
                 jnp.asarray(centroids, jnp.float32),
                 jax.random.key(seed), topk)

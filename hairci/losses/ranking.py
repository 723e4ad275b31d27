"""Ranking losses.

`S2R2Loss` — differentiable Smooth-AP
(`/root/reference/HairPretraining/utils/losses.py:616-701`): sigmoid-relaxed
rank matrix, O(N³). The reference materializes the full (N, N, N) difference
tensor; that is HBM-hostile on TPU, so the rank sums are computed per-query
with a `lax.map` over queries — same math, O(N²) live memory.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def s2r2_loss(
    embeddings: jnp.ndarray,
    targets: Optional[jnp.ndarray] = None,
    tau: float = 0.01,
    k_views: int = 3,
) -> jnp.ndarray:
    """Smooth-AP over concatenated views [v1 of all; v2 of all; ...].

    loss = 1 - mean_q AP(q) with AP via sigmoid rank approximation.
    """
    z = embeddings / jnp.maximum(
        jnp.linalg.norm(embeddings, axis=-1, keepdims=True), 1e-12)
    n = z.shape[0]
    if targets is None:
        batch_size = n // k_views
        targets = jnp.tile(jnp.arange(batch_size), k_views)
    sim = jnp.einsum("id,jd->ij", z, z, preferred_element_type=jnp.float32)
    pos_mask = (targets[:, None] == targets[None, :]).astype(jnp.float32)
    eye = jnp.eye(n, dtype=jnp.float32)
    pos_mask = pos_mask - eye
    all_mask = 1.0 - eye

    # per-query rank sums via lax.map: the sigmoid matrix for query q only
    # depends on sim[q], so live memory stays O(N²) instead of the
    # reference's O(N³) difference tensor.
    def body(q):
        sim_q = sim[q]
        diff = sim_q[None, :] - sim_q[:, None]
        sig = jax.nn.sigmoid(diff / tau)
        rank_pos = 1.0 + jnp.sum(sig * pos_mask[q][None, :], axis=1)
        rank_all = 1.0 + jnp.sum(sig * all_mask[q][None, :], axis=1)
        ap_ratio = rank_pos / (rank_all + 1e-8)
        ap_sum = jnp.sum(ap_ratio * pos_mask[q])
        num_pos = jnp.sum(pos_mask[q])
        return ap_sum / (num_pos + 1e-8)

    ap_q = jax.lax.map(body, jnp.arange(n))
    return 1.0 - jnp.mean(ap_q)

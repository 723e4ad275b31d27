"""Multi-chip gallery search — SURVEY.md §7 hard-part 7: galleries beyond
one chip's HBM shard their rows over the ``data`` mesh axis; each chip
computes a local top-k over its shard (Pallas streaming kernel on TPU) and
the per-shard candidates merge with one tiled all-gather + a final (Q, k)
top-k. Query replication + the gather ride ICI.

The merge preserves GalleryIndex tie-breaking (lower GLOBAL row index wins)
by keying equal scores on the global index.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hairci.parallel.mesh import DATA_AXIS


def _merge_final(scores: jnp.ndarray, indices: jnp.ndarray, k: int):
    """(Q, n_cand) → top-k with lower-index tie-break."""
    order = jnp.lexsort((indices, -scores), axis=1)[:, :k]
    return (jnp.take_along_axis(scores, order, axis=1),
            jnp.take_along_axis(indices, order, axis=1))


def sharded_gallery_search(
    mesh: Mesh,
    queries: jnp.ndarray,       # (Q, D) normalized, replicated
    gallery: jnp.ndarray,       # (N, D) normalized; N divisible by |data|
    k: int = 5,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Search a row-sharded gallery; returns global (Q, k) scores/indices."""
    n_shards = mesh.shape[DATA_AXIS]
    N = gallery.shape[0]
    assert N % n_shards == 0, "pad the gallery to a multiple of the mesh"
    shard_rows = N // n_shards
    k = min(k, shard_rows)

    # idempotent placement: already-placed arrays are passed through
    gallery = jax.device_put(
        gallery, NamedSharding(mesh, P(DATA_AXIS, None)))
    queries = jax.device_put(queries, NamedSharding(mesh, P()))

    def local_search(q, g_shard):
        # g_shard: (shard_rows, D) local block
        shard_id = jax.lax.axis_index(DATA_AXIS)
        base = shard_id * shard_rows
        if use_pallas:
            from hairci.ops.topk_pallas import topk_gallery_search

            s, i = topk_gallery_search(q, g_shard, k=k)
        else:
            scores = jnp.einsum("qd,nd->qn", q, g_shard,
                                preferred_element_type=jnp.float32)
            s, i = jax.lax.top_k(scores, k)
        i = i + base
        # gather every shard's candidates: (Q, n_shards*k)
        s_all = jax.lax.all_gather(s, DATA_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, DATA_AXIS, axis=1, tiled=True)
        return _merge_final(s_all, i_all, k)

    fn = shard_map(
        local_search, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(queries, gallery)


class ShardedGalleryIndex:
    """GalleryIndex-compatible facade over a mesh-sharded gallery."""

    def __init__(self, mesh: Mesh, embeddings: np.ndarray,
                 paths: Sequence[str], normalized: bool = False):
        from hairci.eval.features import l2_normalize

        self.mesh = mesh
        n_shards = mesh.shape[DATA_AXIS]
        emb = jnp.asarray(embeddings, jnp.float32)
        if not normalized:
            emb = l2_normalize(emb)
        self.n = emb.shape[0]
        pad = (-self.n) % n_shards
        if pad:
            emb = jnp.pad(emb, ((0, pad), (0, 0)))  # zero rows score 0 < 1
        # place the gallery on the mesh ONCE (per-call device_put would
        # re-ship the gallery over ICI every search)
        self.embeddings = jax.device_put(
            emb, NamedSharding(mesh, P(DATA_AXIS, None)))
        self.paths = list(paths)

    def __len__(self) -> int:
        return self.n

    def search(self, queries: np.ndarray, k: int = 5,
               normalized: bool = False) -> Tuple[np.ndarray, np.ndarray]:
        from hairci.eval.features import l2_normalize

        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None]
        if not normalized:
            q = l2_normalize(q)
        s, i = sharded_gallery_search(self.mesh, q, self.embeddings,
                                      k=min(k, self.n))
        # drop any padded-row hits (score 0 on zero rows; only possible when
        # every real score is negative) by re-ranking against validity
        s = np.asarray(s)
        i = np.asarray(i)
        bad = i >= self.n
        s = np.where(bad, -np.inf, s)
        order = np.argsort(-s, axis=1, kind="stable")
        return (np.take_along_axis(s, order, axis=1),
                np.take_along_axis(np.where(bad, 0, i), order, axis=1))

"""Gallery index — the FAISS replacement (SURVEY.md §2.6).

The reference builds `faiss.IndexFlatL2` over L2-normalized features
(`/root/reference/HairPretraining/app/inference.py:79-100`,
`experiments/DualViewHair/scripts/quantitative_eval.py:120-155`) and the
retrieval CLIs use sklearn `cosine_similarity` + argsort
(`src/models/hair_encoder.py:180-198`). On normalized vectors L2 order ==
cosine order == inner-product order, so on TPU the whole index is:

    scores = queries @ galleryᵀ   (one MXU matmul, f32 accumulation)
    top-k  = lax.top_k            (index-stable ties)

Large galleries are searched in chunks with a running top-k merge, so HBM
holds one (Q, chunk) score tile at a time; multi-chip galleries shard the
gallery rows over the ``data`` mesh axis and merge per-shard top-k.
Persistence matches the reference artifacts: `embeddings.npy` +
`image_paths.txt` (`hair_encoder.py:131-142`).
"""

from __future__ import annotations

import os
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hairci.eval.features import l2_normalize


@partial(jax.jit, static_argnames=("k",))
def _search_block(queries: jnp.ndarray, gallery: jnp.ndarray, k: int,
                  base: int):
    scores = jnp.einsum("qd,nd->qn", queries, gallery,
                        preferred_element_type=jnp.float32)
    s, i = jax.lax.top_k(scores, k)
    return s, i + base


@partial(jax.jit, static_argnames=("k",))
def _merge_topk(s1, i1, s2, i2, k: int):
    s = jnp.concatenate([s1, s2], axis=1)
    i = jnp.concatenate([i1, i2], axis=1)
    ss, pos = jax.lax.top_k(s, k)
    return ss, jnp.take_along_axis(i, pos, axis=1)


class GalleryIndex:
    """Flat inner-product index over L2-normalized embeddings."""

    def __init__(self, embeddings: np.ndarray, paths: Sequence[str],
                 normalized: bool = False, chunk: int = 65536,
                 use_pallas: Optional[bool] = None,
                 storage_dtype=jnp.float32):
        """storage_dtype=jnp.bfloat16 halves HBM for large galleries (1M x
        512 → 1 GB); scores still accumulate in f32 so only the 3rd decimal
        of the cosine moves."""
        emb = jnp.asarray(embeddings, jnp.float32)
        if not normalized:
            emb = l2_normalize(emb)
        emb = emb.astype(storage_dtype)
        self.n = int(emb.shape[0])
        self._dim = int(emb.shape[1])
        self.paths = list(paths)
        self.chunk = chunk
        # fused streaming kernel (hairci/ops/topk_pallas.py): avoids the
        # (Q, N) HBM score matrix and wins for small k (1.3x XLA at
        # Q=256, k=5 on 500k x 512; ties at Q=1). Its per-chunk selection
        # is O(k) VPU passes, so XLA matmul+lax.top_k wins from k~10 and
        # the kernel runs out of VMEM near k=50 — auto-enabled on TPU for
        # k <= 8 only (BENCH_RESULTS.md has the measured matrix).
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        if use_pallas:
            # pre-pad rows to the kernel's chunk multiple ONCE — padding in
            # the search path would re-materialize the gallery every query
            pallas_chunk = 1024
            pad = (-self.n) % pallas_chunk
            d_pad = (-emb.shape[1]) % 128
            if pad or d_pad:
                emb = jnp.pad(emb, ((0, pad), (0, d_pad)))
        self.embeddings = emb

    def __len__(self) -> int:
        return self.n  # true row count (embeddings may be kernel-padded)

    @property
    def dim(self) -> int:
        return self._dim

    # ------------------------------------------------------------------
    def search(self, queries: np.ndarray, k: int = 5,
               normalized: bool = False) -> Tuple[np.ndarray, np.ndarray]:
        """(scores (Q, k) cosine sim desc, indices (Q, k))."""
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None]
        if not normalized:
            q = l2_normalize(q)
        n = len(self)
        k = min(k, n)
        if self.use_pallas and k <= 8:
            from hairci.ops.topk_pallas import topk_gallery_search

            s, i = topk_gallery_search(q, self.embeddings, k=k,
                                       n_valid=self.n)
            return np.asarray(s), np.asarray(i)
        scores = indices = None
        for start in range(0, n, self.chunk):
            block = self.embeddings[start:min(start + self.chunk, n)]
            s, i = _search_block(q, block, min(k, block.shape[0]), start)
            if scores is None:
                scores, indices = s, i
                if s.shape[1] < k:  # first block smaller than k
                    pad = k - s.shape[1]
                    scores = jnp.pad(s, ((0, 0), (0, pad)),
                                     constant_values=-jnp.inf)
                    indices = jnp.pad(i, ((0, 0), (0, pad)))
            else:
                if s.shape[1] < k:
                    s = jnp.pad(s, ((0, 0), (0, k - s.shape[1])),
                                constant_values=-jnp.inf)
                    i = jnp.pad(i, ((0, 0), (0, k - i.shape[1])))
                scores, indices = _merge_topk(scores, indices, s, i, k)
        return np.asarray(scores), np.asarray(indices)

    def search_paths(self, queries: np.ndarray, k: int = 5
                     ) -> Tuple[np.ndarray, List[List[str]]]:
        scores, idx = self.search(queries, k)
        return scores, [[self.paths[j] for j in row] for row in idx]

    # ------------------------------------------------------------------
    def save(self, out_dir: str, prefix: str = "") -> None:
        """`embeddings.npy` + `image_paths.txt` (hair_encoder.py:131-142)."""
        os.makedirs(out_dir, exist_ok=True)
        # persist in f32, valid rows/cols only (storage may be bf16 and/or
        # kernel-padded)
        np.save(os.path.join(out_dir, f"{prefix}embeddings.npy"),
                np.asarray(
                    self.embeddings[:self.n, :self._dim].astype(jnp.float32)))
        with open(os.path.join(out_dir, f"{prefix}image_paths.txt"), "w") as f:
            f.write("\n".join(self.paths) + "\n")

    @classmethod
    def load(cls, out_dir: str, prefix: str = "") -> "GalleryIndex":
        emb = np.load(os.path.join(out_dir, f"{prefix}embeddings.npy"))
        with open(os.path.join(out_dir, f"{prefix}image_paths.txt")) as f:
            paths = [l for l in f.read().splitlines() if l]
        return cls(emb, paths, normalized=True)

    @classmethod
    def exists(cls, out_dir: str, prefix: str = "") -> bool:
        return (os.path.exists(os.path.join(out_dir, f"{prefix}embeddings.npy"))
                and os.path.exists(
                    os.path.join(out_dir, f"{prefix}image_paths.txt")))

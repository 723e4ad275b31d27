"""Pallas TPU kernel: fused gallery scoring + streaming top-k.

The retrieval hot op (SURVEY.md §2.6 FAISS replacement). The naive XLA
version materializes the full (Q, N) score matrix in HBM before `top_k` —
for a 1M × 512 gallery and 256 queries that is a 1 GB round-trip. This
kernel streams the gallery through VMEM in chunks (Pallas double-buffers the
chunk DMA automatically across sequential grid steps), computes each
(Q, chunk) score tile on the MXU, and maintains a running per-query top-k in
VMEM scratch — HBM traffic is exactly one gallery read.

Semantics match `GalleryIndex.search`: inner-product scores (cosine on
normalized inputs), descending, ties broken by lower gallery index.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _select_topk(scores, base_col, k: int, n_valid):
    """Per-query top-k of a (Q, C) score tile via k max+mask passes.
    Returns (vals (Q, k), idx (Q, k)) with global column indices."""
    Q, C = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (Q, C), 1)
    gcol = col + base_col
    s = jnp.where(gcol < n_valid, scores, -jnp.inf)  # mask padding rows
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.max(s, axis=1)                       # (Q,)
        am = jnp.argmax(s, axis=1).astype(jnp.int32)  # first max = low idx
        vals.append(m)
        idxs.append(am + base_col)
        s = jnp.where(col == am[:, None], -jnp.inf, s)
    return (jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1))


def _topk_kernel(q_ref, g_ref, nvalid_ref, out_s_ref, out_i_ref,
                 run_s, run_i, *, k: int, chunk: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        run_s[:] = jnp.full_like(run_s[:], -jnp.inf)
        run_i[:] = jnp.zeros_like(run_i[:])

    scores = jax.lax.dot_general(
        q_ref[:], g_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, C) = q @ chunk.T
    base = step * chunk
    c_s, c_i = _select_topk(scores, base, k, nvalid_ref[0])

    # merge running (Q, k) with chunk (Q, k): top-k of the 2k candidates.
    # Tie-break: prefer the lower gallery index → at equal score pick the
    # candidate with smaller index by keying the argmax on (score, -idx).
    comb_s = jnp.concatenate([run_s[:], c_s], axis=1)   # (Q, 2k)
    comb_i = jnp.concatenate([run_i[:], c_i], axis=1)
    Q = comb_s.shape[0]
    col2 = jax.lax.broadcasted_iota(jnp.int32, (Q, 2 * k), 1)
    s = comb_s
    new_s, new_i = [], []
    for _ in range(k):
        m = jnp.max(s, axis=1)
        # among entries equal to the max, pick the smallest gallery index
        is_max = s == m[:, None]
        idx_masked = jnp.where(is_max, comb_i, jnp.int32(2**31 - 1))
        sel_idx = jnp.min(idx_masked, axis=1)
        # position of that winner (to mask it out)
        win = is_max & (comb_i == sel_idx[:, None])
        # Mosaic argmax supports f32 only → cast the boolean mask
        first_win = jnp.argmax(win.astype(jnp.float32), axis=1)
        new_s.append(m)
        new_i.append(sel_idx)
        s = jnp.where(col2 == first_win[:, None], -jnp.inf, s)
    run_s[:] = jnp.stack(new_s, axis=1)
    run_i[:] = jnp.stack(new_i, axis=1)

    out_s_ref[:] = run_s[:]
    out_i_ref[:] = run_i[:]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("k", "chunk", "interpret", "bf16", "n_valid"))
def topk_gallery_search(
    queries: jnp.ndarray,   # (Q, D) L2-normalized
    gallery: jnp.ndarray,   # (N, D) L2-normalized
    k: int = 5,
    chunk: int = 1024,
    interpret: bool = False,
    bf16: bool = False,
    n_valid: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(scores (Q, k), indices (Q, k)) — fused streaming search.

    ``bf16=True`` streams the gallery in bfloat16 (halves the HBM read that
    bounds this kernel; scores still accumulate in f32 on the MXU) — scores
    lose ~3 decimal digits, ranking of well-separated galleries unchanged.
    """
    Q, D = queries.shape
    # n_valid: true row count when the gallery arrives pre-padded
    N = gallery.shape[0] if n_valid is None else n_valid
    k = min(k, N)
    if k > 16 and not interpret:
        # the selection runs k unrolled max+mask VPU passes per chunk; past
        # k~16 the live intermediates blow the ~16 MB scoped-VMEM budget
        # (observed OOM at k=50) and XLA matmul+lax.top_k is faster anyway
        # from k~10 (BENCH_RESULTS.md) — use GalleryIndex, which routes
        # large k to the XLA path
        raise ValueError(
            f"topk_gallery_search supports k <= 16 on TPU (got k={k}); "
            "use GalleryIndex.search or lax.top_k for larger k")
    Qp = _round_up(Q, 8)
    Dp = _round_up(D, 128)
    Np = _round_up(gallery.shape[0], chunk)
    g_dtype = jnp.bfloat16 if bf16 else jnp.float32
    # pad ONLY when needed: re-materializing an already-aligned gallery
    # costs a full HBM round-trip per call (≈25x the kernel itself at 500k
    # rows) — align once at index build (GalleryIndex pads on init)
    if (Qp, Dp) == (Q, D) and queries.dtype == g_dtype:
        q = queries
    else:
        q = jnp.zeros((Qp, Dp), g_dtype).at[:Q, :D].set(
            queries.astype(g_dtype))
    if (Np, Dp) == gallery.shape and gallery.dtype == g_dtype:
        g = gallery
    else:
        g = jnp.zeros((Np, Dp), g_dtype).at[:gallery.shape[0], :D].set(
            gallery.astype(g_dtype))
    n_chunks = Np // chunk
    nvalid = jnp.asarray([N], jnp.int32)

    out_s, out_i = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, chunk=chunk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((Qp, Dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, Dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((Qp, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Qp, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Qp, k), jnp.float32),
            jax.ShapeDtypeStruct((Qp, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Qp, k), jnp.float32),
            pltpu.VMEM((Qp, k), jnp.int32),
        ],
        interpret=interpret,
    )(q, g, nvalid)
    return out_s[:Q], out_i[:Q]

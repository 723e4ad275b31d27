"""Token-masking utilities for masked-image SSL (MAE / SimMIM / MSN /
SiameseIM / DINOv2-iBOT).

Reference behaviors covered:
  - uniform random token masking (`backbone.py:507` random_token_mask via
    lightly; MAE ratio 0.75, MSN ratio 0.15),
  - blockwise masking (`pretrain_engine.py:422` random_block_mask and the
    SiameseIM ``--with_blockwise_mask`` path, `backbone.py:1565-1567`).

All functions are jit-safe: mask counts are Python ints at trace time, shapes
static, randomness via explicit PRNG keys.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def random_token_mask(
    key: jax.Array, batch: int, num_tokens: int, mask_ratio: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MAE-style shuffle masking.

    Returns (ids_keep (B,K), ids_restore (B,N), mask (B,N) with 1=masked).
    """
    num_keep = int(num_tokens * (1 - mask_ratio))
    noise = jax.random.uniform(key, (batch, num_tokens))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :num_keep]
    mask = jnp.ones((batch, num_tokens), dtype=jnp.float32)
    mask = mask.at[:, :num_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return ids_keep, ids_restore, mask


def random_block_mask(
    key: jax.Array, batch: int, grid: int, mask_ratio: float,
    block: int = 4,
) -> jnp.ndarray:
    """Blockwise boolean mask (B, grid*grid), approx ``mask_ratio`` masked.

    Blocks of ``block``x``block`` patches are masked together (coarse grid
    sampled, then upsampled) — the TPU-friendly stand-in for the reference's
    iterative BlockwiseMaskGenerator: identical statistics class (contiguous
    square blocks), fully vectorized.
    """
    # small grids: shrink blocks so the coarse grid keeps >=2 cells per side
    # (otherwise the k>=1 floor masks everything)
    block = max(min(block, grid // 2), 1)
    coarse = max(-(-grid // block), 1)  # ceil: cover grids not divisible
    scores = jax.random.uniform(key, (batch, coarse, coarse))
    k = max(int(round(mask_ratio * coarse * coarse)), 1)
    thresh = jnp.sort(scores.reshape(batch, -1), axis=1)[:, k - 1][:, None, None]
    cmask = scores <= thresh
    mask = jnp.repeat(jnp.repeat(cmask, block, axis=1), block, axis=2)
    mask = mask[:, :grid, :grid]
    return mask.reshape(batch, grid * grid)


def mask_to_ids_keep(mask: jnp.ndarray, num_keep: int) -> jnp.ndarray:
    """Convert a boolean mask (1=masked) to (B, num_keep) kept indices.

    Stable order: kept tokens keep their original ordering (argsort of the
    mask is stable in JAX).
    """
    order = jnp.argsort(mask.astype(jnp.int32), axis=1, stable=True)
    return order[:, :num_keep]

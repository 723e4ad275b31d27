"""Hair-region patch masking — vectorized TPU redesign of the reference's
`PositiveMaskingTransform` (`/root/reference/HairPretraining/utils/transform.py:84-150`)
and `get_hair_region_idx` (`transform.py:246-260`).

The reference loops over the batch in Python and mutates patches on the GPU
tensor one by one (a known hot-loop inefficiency, SURVEY.md §3.2). Here the
whole batch is masked with one static-shape computation:

  1. patch means via a reshape (no unfold),
  2. hair patches = mean > threshold (images have black background, so hair
     pixels are the only non-zero content),
  3. per-image mask ratio ~ U(lo, hi); num_mask = floor(ratio * n_hair),
  4. the masked subset is the num_mask smallest of per-patch uniform scores
     restricted to hair patches (equivalent in distribution to randperm
     selection),
  5. zero the selected patches via an upsampled multiplicative mask.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def patch_means(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, W, C) → (B, P) mean over each patch (and channels)."""
    B, H, W, C = x.shape
    ph, pw = H // patch_size, W // patch_size
    x = x[:, : ph * patch_size, : pw * patch_size, :]
    x = x.reshape(B, ph, patch_size, pw, patch_size, C)
    return x.mean(axis=(2, 4, 5)).reshape(B, ph * pw)


def hair_patch_mask(x: jnp.ndarray, patch_size: int = 16,
                    threshold: float = 0.01) -> jnp.ndarray:
    """Boolean (B, P): True where a patch contains hair content
    (`get_hair_region_idx` parity — patches whose mean exceeds threshold)."""
    return patch_means(x, patch_size) > threshold


def mask_hair_patches(
    key: jax.Array,
    x: jnp.ndarray,
    patch_size: int = 32,
    mask_ratio_range: Tuple[float, float] = (0.1, 0.2),
    threshold: float = 0.01,
) -> jnp.ndarray:
    """Zero a random 10-20% subset of hair-containing patches per image."""
    B, H, W, C = x.shape
    ph, pw = H // patch_size, W // patch_size
    P = ph * pw
    hair = patch_means(x, patch_size) > threshold  # (B, P)
    n_hair = jnp.sum(hair, axis=1)  # (B,)

    k_ratio, k_score = jax.random.split(key)
    ratio = jax.random.uniform(
        k_ratio, (B,), minval=mask_ratio_range[0], maxval=mask_ratio_range[1])
    num_mask = jnp.floor(ratio * n_hair).astype(jnp.int32)  # (B,)

    scores = jax.random.uniform(k_score, (B, P))
    scores = jnp.where(hair, scores, 2.0)  # non-hair can never be selected
    sorted_scores = jnp.sort(scores, axis=1)
    # threshold score = num_mask-th smallest (num_mask==0 → mask nothing)
    kth = jnp.take_along_axis(
        sorted_scores, jnp.clip(num_mask - 1, 0, P - 1)[:, None], axis=1)
    masked = hair & (scores <= kth) & (num_mask[:, None] > 0)  # (B, P)

    keep = 1.0 - masked.astype(x.dtype)  # (B, P): 0 where masked
    keep = keep.reshape(B, ph, pw)
    keep = jnp.repeat(jnp.repeat(keep, patch_size, axis=1), patch_size, axis=2)
    if keep.shape[1] != H or keep.shape[2] != W:
        keep = jnp.pad(
            keep,
            ((0, 0), (0, H - keep.shape[1]), (0, W - keep.shape[2])),
            constant_values=1.0,
        )
    return x * keep[..., None]

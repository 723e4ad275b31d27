"""Reconstruction losses for masked-image modeling.

  - MAE: MSE on masked patch pixels (the reference wires `nn.MSELoss()` to
    the lightly MAE model's (predictions, targets) pair, engine `:72,323`),
  - SimMIM: `nn.L1Loss()` on masked patches (engine `:83,514`),
  - UniGrad (SiameseIM, `backbone.py:1640-1660`): standardized squared-error
    positive term + target-correlation push, where the correlation is
    averaged across replicas — under jit over a sharded batch, computing the
    correlation from the GLOBAL batch reproduces the reference's
    `torch.distributed.all_reduce(correlation)/world_size` without explicit
    collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def patchify(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, W, C) → (B, N, patch*patch*C)."""
    B, H, W, C = images.shape
    p = patch_size
    x = images.reshape(B, H // p, p, W // p, p, C)
    x = jnp.einsum("bhpwqc->bhwpqc", x)
    return x.reshape(B, (H // p) * (W // p), p * p * C)


def unpatchify(patches: jnp.ndarray, patch_size: int, channels: int = 3
               ) -> jnp.ndarray:
    B, N, _ = patches.shape
    p = patch_size
    g = int(N**0.5)
    x = patches.reshape(B, g, g, p, p, channels)
    x = jnp.einsum("bhwpqc->bhpwqc", x)
    return x.reshape(B, g * p, g * p, channels)


def masked_mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    norm_pix: bool = False) -> jnp.ndarray:
    """MSE over (masked) patches. pred/target (B, N, P); mask (B, N) with
    1 = masked (loss counted). mask=None → plain MSELoss parity."""
    if norm_pix:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        target = (target - mean) / jnp.sqrt(var + 1e-6)
    err = jnp.mean(jnp.square(pred - target), axis=-1)  # (B, N)
    if mask is None:
        return jnp.mean(err)
    m = mask.astype(err.dtype)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """L1 over (masked) patches (SimMIM)."""
    err = jnp.mean(jnp.abs(pred - target), axis=-1)
    if mask is None:
        return jnp.mean(err)
    m = mask.astype(err.dtype)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def _standardize(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Non-affine LayerNorm over the feature axis: the reference's
    `teacher_norm` (LayerNorm with `elementwise_affine=False`,
    `backbone.py:1367`), and its optional `student_norm` (LayerNorm with
    frozen affine at init ≡ standardize, `backbone.py:1290-1293`)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def unigrad_loss(pred: jnp.ndarray, target: jnp.ndarray,
                 neg_weight: float = 0.02,
                 online_ln: bool = False) -> jnp.ndarray:
    """UniGrad in the reference form (SiameseIM `compute_unigrad_loss`,
    `backbone.py:1642-1660`):

      pred   = student_norm(pred)           (gradient flows through;
               Identity by DEFAULT — `args.online_ln` is a store_true flag,
               `backbone.py:1289-1295` — pass ``online_ln=True`` for the
               frozen-LayerNorm variant)
      target = teacher_norm(target)         (no grad; always the affine-free
               LayerNorm, `backbone.py:1367`)
      pos    = E[ ||pred - target||² ]
      corr   = E_global[ target targetᵀ ]   (all-reduced mean over replicas —
               computing it from the GLOBAL batch under jit reproduces
               `torch.distributed.all_reduce(correlation)/world_size`)
      neg    = E[ pred corr predᵀ ]
      L      = (pos + neg_weight·neg) / dim
    """
    if online_ln:
        pred = _standardize(pred)
    target = jax.lax.stop_gradient(_standardize(target))
    pos = jnp.mean(jnp.sum(jnp.square(pred - target), axis=-1))
    corr = jnp.einsum("bi,bj->ij", target, target,
                      preferred_element_type=jnp.float32) / target.shape[0]
    neg = jnp.mean(jnp.einsum("bi,ij,bj->b", pred, corr, pred))
    return (pos + neg_weight * neg) / pred.shape[-1]

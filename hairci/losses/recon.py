"""Reconstruction losses for masked-image modeling.

  - MAE: MSE on masked patch pixels (the reference wires `nn.MSELoss()` to
    the lightly MAE model's (predictions, targets) pair, engine `:72,323`),
  - SimMIM: `nn.L1Loss()` on masked patches (engine `:83,514`),
  - UniGrad (SiameseIM, `backbone.py:1640-1660`): positive cosine pull +
    correlation-matrix push, where the correlation is averaged across
    replicas — under jit over a sharded batch, computing the correlation
    from the GLOBAL batch reproduces the reference's
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


def unigrad_loss(z1: jnp.ndarray, z2: jnp.ndarray,
                 lamb: float = 0.02) -> jnp.ndarray:
    """UniGrad (SiameseIM `forward_loss`, `backbone.py:1640-1660`):
    L = -cos(z1, z2) + λ·E[(z1ᵀ corr z1)] with corr = E[z zᵀ] over the
    global batch."""
    z1 = z1 / jnp.maximum(jnp.linalg.norm(z1, axis=-1, keepdims=True), 1e-12)
    z2 = z2 / jnp.maximum(jnp.linalg.norm(z2, axis=-1, keepdims=True), 1e-12)
    pos = jnp.mean(jnp.sum(z1 * z2, axis=-1))
    corr = jnp.einsum("bi,bj->ij", z2, z2,
                      preferred_element_type=jnp.float32) / z2.shape[0]
    corr = jax.lax.stop_gradient(corr)
    neg = jnp.mean(jnp.einsum("bi,ij,bj->b", z1, corr, z1))
    return -pos + lamb * neg

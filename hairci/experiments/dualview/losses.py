"""DualViewHair losses — parity with
`/root/reference/experiments/DualViewHair/src/losses/ntxent_loss.py` and the
`MomentumQueue` of `scripts/train_with_queue.py:17-53`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from hairci.losses import nt_xent_loss


def ntxent_loss_symmetric(z_s: jnp.ndarray, z_t: jnp.ndarray,
                          temperature: float = 0.07) -> jnp.ndarray:
    """Symmetric 2B×2B NT-Xent (`ntxent_loss.py:10-57`)."""
    return nt_xent_loss(z_s, z_t, temperature)


def asymmetric_ntxent_loss(z_s: jnp.ndarray, z_t: jnp.ndarray,
                           temperature: float = 0.07,
                           weight_s2t: float = 0.7) -> jnp.ndarray:
    """Weighted student→teacher / teacher→student InfoNCE
    (`ntxent_loss.py:60-101`)."""
    s = z_s / jnp.maximum(jnp.linalg.norm(z_s, axis=-1, keepdims=True), 1e-12)
    t = z_t / jnp.maximum(jnp.linalg.norm(z_t, axis=-1, keepdims=True), 1e-12)
    logits_st = jnp.einsum("bd,kd->bk", s, t,
                           preferred_element_type=jnp.float32) / temperature
    logits_ts = logits_st.T
    labels = jnp.arange(s.shape[0])

    def ce(logits):
        lp = jax.nn.log_softmax(logits, axis=1)
        return -jnp.mean(jnp.take_along_axis(lp, labels[:, None], axis=1))

    return weight_s2t * ce(logits_st) + (1.0 - weight_s2t) * ce(logits_ts)


class MomentumQueue:
    """4096-negative feature queue (`train_with_queue.py:17-53`) as a pure
    functional ring buffer — state is (bank, ptr) arrays the caller carries
    (checkpointable, jit-safe)."""

    def __init__(self, dim: int, size: int = 4096):
        self.dim = dim
        self.size = size

    def init(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return (jnp.zeros((self.size, self.dim), jnp.float32),
                jnp.zeros((), jnp.int32))

    def enqueue(self, bank: jnp.ndarray, ptr: jnp.ndarray,
                keys: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from hairci.losses import update_memory_bank

        return update_memory_bank(bank, ptr, keys)

    def loss(self, query: jnp.ndarray, key: jnp.ndarray, bank: jnp.ndarray,
             temperature: float = 0.07) -> jnp.ndarray:
        from hairci.losses import memory_bank_infonce

        return memory_bank_infonce(query, key, bank, temperature)

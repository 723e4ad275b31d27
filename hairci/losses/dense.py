"""Dense / patch-level contrastive losses.

Parity targets:
  - `DenseLoss` (`/root/reference/HairPretraining/utils/losses.py:733-766`):
    per-patch InfoNCE where every other patch-positive in the batch is a
    negative,
  - `PatchContrastiveLoss` (`losses.py:521-541`): per-sample NT-Xent over a
    sample's patches — the reference loops over the batch in Python; here it
    is one batched einsum (B-way batched (2N,2N) logits),
  - memory-bank InfoNCE for DenseCL (the reference uses lightly
    `NTXentLoss(memory_bank_size=(4096, D))`, engine `:86-87`): queue of
    negative keys carried in the recipe state.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _normalize(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def dense_loss(anchor_tokens: jnp.ndarray, pos_tokens: jnp.ndarray,
               temperature: float = 0.1) -> jnp.ndarray:
    """`DenseLoss` parity: queries = all anchor patches, positive = matching
    pos patch, negatives = ALL pos patches in the batch (self excluded)."""
    B, K, D = anchor_tokens.shape
    q = anchor_tokens.reshape(B * K, D)
    k_pos = pos_tokens.reshape(B * K, D)
    pos_logits = jnp.sum(q * k_pos, axis=-1, keepdims=True)
    neg_logits = jnp.einsum("id,jd->ij", q, jax.lax.stop_gradient(k_pos),
                            preferred_element_type=jnp.float32)
    neg_logits = jnp.where(jnp.eye(B * K, dtype=bool), -jnp.inf, neg_logits)
    logits = jnp.concatenate([pos_logits, neg_logits], axis=1) / temperature
    return -jnp.mean(jax.nn.log_softmax(logits, axis=1)[:, 0])


def patch_contrastive_loss(patch_s: jnp.ndarray, patch_t: jnp.ndarray,
                           temperature: float = 0.5) -> jnp.ndarray:
    """`PatchContrastiveLoss` parity, vectorized: per-sample symmetric
    NT-Xent over that sample's N patches (batched over B, no Python loop)."""
    B, N, D = patch_s.shape
    s = _normalize(patch_s)
    t = _normalize(patch_t)
    z = jnp.concatenate([s, t], axis=1)  # (B, 2N, D)
    sim = jnp.einsum("bnd,bmd->bnm", z, z,
                     preferred_element_type=jnp.float32) / temperature
    mask = jnp.eye(2 * N, dtype=bool)[None]
    sim = jnp.where(mask, -jnp.inf, sim)
    pos_idx = (jnp.arange(2 * N) + N) % (2 * N)
    logprob = jax.nn.log_softmax(sim, axis=2)
    loss = -jnp.take_along_axis(
        logprob, jnp.broadcast_to(pos_idx[None, :, None], (B, 2 * N, 1)),
        axis=2)
    return jnp.mean(loss)


def memory_bank_infonce(
    query: jnp.ndarray,        # (B, D)
    key: jnp.ndarray,          # (B, D) positives (momentum branch)
    bank: jnp.ndarray,         # (M, D) negative queue (stale keys)
    temperature: float = 0.1,
) -> jnp.ndarray:
    """MoCo-style InfoNCE with a memory bank (lightly NTXentLoss with
    memory_bank_size semantics): positives from `key`, negatives from the
    bank only."""
    q = _normalize(query)
    k = _normalize(jax.lax.stop_gradient(key))
    b = _normalize(jax.lax.stop_gradient(bank))
    pos = jnp.sum(q * k, axis=-1, keepdims=True)
    neg = jnp.einsum("bd,md->bm", q, b, preferred_element_type=jnp.float32)
    logits = jnp.concatenate([pos, neg], axis=1) / temperature
    return -jnp.mean(jax.nn.log_softmax(logits, axis=1)[:, 0])


def update_memory_bank(bank: jnp.ndarray, ptr: jnp.ndarray,
                       keys: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ring-buffer enqueue of new keys; returns (new_bank, new_ptr)."""
    M = bank.shape[0]
    B = keys.shape[0]
    idx = (ptr + jnp.arange(B)) % M
    new_bank = bank.at[idx].set(jax.lax.stop_gradient(keys))
    return new_bank, (ptr + B) % M


def select_most_similar(query_feats: jnp.ndarray, key_feats: jnp.ndarray,
                        key_local: jnp.ndarray) -> jnp.ndarray:
    """DenseCL local-correspondence matching (lightly utils.select_most_similar,
    engine `:301`): for each query spatial position, pick the most similar
    key position's local embedding.

    query_feats/key_feats: (B, N, C) backbone grid features;
    key_local: (B, N, D) key local projections → returns (B, N, D).
    """
    qn = _normalize(query_feats)
    kn = _normalize(key_feats)
    sim = jnp.einsum("bnc,bmc->bnm", qn, kn,
                     preferred_element_type=jnp.float32)
    match = jnp.argmax(sim, axis=2)  # (B, N)
    return jnp.take_along_axis(key_local, match[..., None], axis=1)

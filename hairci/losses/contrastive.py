"""Contrastive losses (pure jnp, global-batch aware).

Parity targets:
  - NT-Xent (lightly `NTXentLoss(temperature)`, used by SimCLR & SHAM,
    `/root/reference/HairPretraining/src/pretrain_engine.py:74,229,715`),
  - `nt_xent_1anchor_2positive` (`utils/losses.py:585-613`),
  - `SupConLoss` (`utils/losses.py:8-101`),
  - triplet margin loss (`torch.nn.TripletMarginLoss`, engine `:79`),
  - `positive_consistency_loss_margin` (`utils/losses.py:544-558`),
  - `bidirectional_margin_loss` (`utils/losses.py:561-580` — broken upstream:
    references undefined `m_n`/`d_un`; re-derived here with explicit pos/neg
    margins),
  - `mse_alignment_loss` (`utils/utils.py:36-44`).

TPU notes: under `jit` with the batch sharded on the ``data`` mesh axis the
(2B, 2B) similarity matrices are computed over the GLOBAL batch — XLA inserts
the collectives, giving cross-replica negatives (the reference's single-device
NT-Xent never sees them; its GatherLayer utility was unused). Matmuls pin
`preferred_element_type=f32` for MXU accumulation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _normalize(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def nt_xent_loss(z0: jnp.ndarray, z1: jnp.ndarray,
                 temperature: float = 0.5) -> jnp.ndarray:
    """Symmetric NT-Xent over 2B views (lightly NTXentLoss semantics).

    z0, z1: (B, D) un- or pre-normalized projections.
    """
    z0 = _normalize(z0)
    z1 = _normalize(z1)
    B = z0.shape[0]
    z = jnp.concatenate([z0, z1], axis=0)  # (2B, D)
    sim = jnp.einsum("id,jd->ij", z, z,
                     preferred_element_type=jnp.float32) / temperature
    mask = jnp.eye(2 * B, dtype=bool)
    sim = jnp.where(mask, -jnp.inf, sim)
    # positive of i is i+B (mod 2B)
    pos_idx = (jnp.arange(2 * B) + B) % (2 * B)
    logprob = jax.nn.log_softmax(sim, axis=1)
    loss = -jnp.take_along_axis(logprob, pos_idx[:, None], axis=1)
    return jnp.mean(loss)


def nt_xent_1anchor_2positive(
    anchor: jnp.ndarray, pos1: jnp.ndarray, pos2: jnp.ndarray,
    temperature: float = 0.5,
) -> jnp.ndarray:
    """One anchor with two positives (`losses.py:585-613`): softmax over the
    3B bank, anchor row attracts both positives."""
    a = _normalize(anchor)
    p1 = _normalize(pos1)
    p2 = _normalize(pos2)
    B = a.shape[0]
    bank = jnp.concatenate([a, p1, p2], axis=0)  # (3B, D)
    sim = jnp.einsum("id,jd->ij", a, bank,
                     preferred_element_type=jnp.float32) / temperature
    mask = jax.nn.one_hot(jnp.arange(B), 3 * B, dtype=bool)  # self at col i
    sim = jnp.where(mask, -jnp.inf, sim)
    logprob = jax.nn.log_softmax(sim, axis=1)
    lp1 = jnp.take_along_axis(logprob, (jnp.arange(B) + B)[:, None], axis=1)
    lp2 = jnp.take_along_axis(logprob, (jnp.arange(B) + 2 * B)[:, None], axis=1)
    return -jnp.mean((lp1 + lp2) / 2.0)


def supcon_loss(
    features: jnp.ndarray,
    labels: Optional[jnp.ndarray] = None,
    temperature: float = 0.07,
    base_temperature: float = 0.07,
    contrast_mode: str = "all",
) -> jnp.ndarray:
    """Supervised contrastive loss (Khosla et al.), `losses.py:8-101` parity.

    features: (B, n_views, D) L2-normalized. labels: (B,) int or None
    (None → SimCLR degenerate case: only the other view is positive).
    """
    B, V, D = features.shape
    # view-major layout like torch.cat(torch.unbind(features, dim=1)):
    # rows [view0 of all samples, view1 of all samples, ...]
    feats = jnp.swapaxes(features, 0, 1).reshape(B * V, D)
    if labels is None:
        mask = jnp.eye(B, dtype=jnp.float32)
    else:
        labels = labels.reshape(B, 1)
        mask = (labels == labels.T).astype(jnp.float32)
    if contrast_mode == "one":
        anchor = features[:, 0]
        anchor_count = 1
    elif contrast_mode == "all":
        anchor = feats
        anchor_count = V
    else:
        raise ValueError(contrast_mode)
    logits = jnp.einsum("id,jd->ij", anchor, feats,
                        preferred_element_type=jnp.float32) / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))
    mask = jnp.tile(mask, (anchor_count, V))
    n_anchor = anchor.shape[0]
    logits_mask = 1.0 - jnp.eye(B * V, dtype=jnp.float32)[:n_anchor]
    mask = mask * logits_mask
    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True) + 1e-12)
    mask_sum = jnp.maximum(jnp.sum(mask, axis=1), 1e-12)
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / mask_sum
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss)


def triplet_margin_loss(
    anchor: jnp.ndarray, positive: jnp.ndarray, negative: jnp.ndarray,
    margin: float = 1.0, p: float = 2.0, eps: float = 1e-6,
) -> jnp.ndarray:
    """torch.nn.TripletMarginLoss parity (pairwise p-norm distance with eps,
    mean reduction). SHAM uses margin staged 0.7→0.5
    (`pretrain_engine.py:716-739`)."""
    d_ap = jnp.power(jnp.sum(jnp.abs(anchor - positive + eps) ** p, axis=-1),
                     1.0 / p)
    d_an = jnp.power(jnp.sum(jnp.abs(anchor - negative + eps) ** p, axis=-1),
                     1.0 / p)
    return jnp.mean(jnp.maximum(d_ap - d_an + margin, 0.0))


def positive_consistency_loss_margin(
    anchor: jnp.ndarray, positive: jnp.ndarray, margin: float = 0.3
) -> jnp.ndarray:
    """Hinge on cosine distance of normalized pairs (`losses.py:544-558`)."""
    a = _normalize(anchor)
    pos = _normalize(positive)
    d = 1.0 - jnp.sum(a * pos, axis=-1)
    return jnp.mean(jnp.maximum(d - margin, 0.0))


def bidirectional_margin_loss(
    anchor: jnp.ndarray, positive: jnp.ndarray, negative: jnp.ndarray,
    margin_pos: float = 0.3, margin_neg: float = 0.7,
) -> jnp.ndarray:
    """Pull positives within margin_pos, push negatives beyond margin_neg
    (cosine distance). The upstream version (`losses.py:561-580`) is broken
    (undefined `m_n`, `d_un`); this is the evident intent, made explicit."""
    a = _normalize(anchor)
    pos = _normalize(positive)
    neg = _normalize(negative)
    d_pos = 1.0 - jnp.sum(a * pos, axis=-1)
    d_neg = 1.0 - jnp.sum(a * neg, axis=-1)
    return jnp.mean(jnp.maximum(d_pos - margin_pos, 0.0)
                    + jnp.maximum(margin_neg - d_neg, 0.0))


def mse_alignment_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MSE between normalized embeddings (`utils/utils.py:36-44`) — the
    masked-positive consistency term of SHAM (weight 0.2,
    `pretrain_engine.py:740-742`)."""
    return jnp.mean(jnp.square(_normalize(pred) - _normalize(target)))


def margin_violation_stats(
    anchor: jnp.ndarray, positive: jnp.ndarray, negative: jnp.ndarray,
    margin: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(pos_dist_mean, neg_dist_mean, violation_count) on L2 distances —
    the stats SHAM logs and adapts k from (`pretrain_engine.py:702-713`)."""
    d_ap = jnp.linalg.norm(anchor - positive, axis=-1)
    d_an = jnp.linalg.norm(anchor - negative, axis=-1)
    violations = jnp.sum((d_ap - d_an + margin) > 0)
    return jnp.mean(d_ap), jnp.mean(d_an), violations

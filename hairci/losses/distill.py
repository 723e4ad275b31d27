"""Distillation-style losses: BYOL negative cosine, cosine distillation,
DINO (with EMA centering), iBOT patch loss, KoLeo, MSN.

Parity targets:
  - lightly `NegativeCosineSimilarity` (BYOL, engine `:90`),
  - `DistillationLoss` (`/root/reference/HairPretraining/utils/losses.py:708-731`),
  - vendored `DINOLoss` with teacher-temp warmup + EMA center
    (`losses.py:119-289`; `center_mean` does a cross-replica all-reduce at
    `losses.py:383-400` — here the center mean over the global batch is
    computed under jit, so XLA inserts the collective automatically),
  - lightly `IBOTPatchLoss` / `KoLeoLoss` (dinov2 mode, engine `:78-81`),
  - lightly `MSNLoss` (engine `:88`).

All are pure functions; mutable quantities (DINO center) are carried in the
recipe's train state and returned as updates.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _normalize(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def negative_cosine_similarity(p: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """BYOL/SimSiam loss: -cos(p, stop_grad(z)), mean over batch."""
    p = _normalize(p)
    z = _normalize(jax.lax.stop_gradient(z))
    return -jnp.mean(jnp.sum(p * z, axis=-1))


def distillation_loss(z_student: jnp.ndarray, z_teacher: jnp.ndarray,
                      reduction: str = "mean") -> jnp.ndarray:
    """`DistillationLoss` parity: 1 - cosine(student, teacher)."""
    s = _normalize(z_student)
    t = _normalize(z_teacher)
    loss = 1.0 - jnp.sum(s * t, axis=-1)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


# ---------------------------------------------------------------------------
# DINO
# ---------------------------------------------------------------------------

def dino_loss(
    teacher_out: Tuple[jnp.ndarray, ...],
    student_out: Tuple[jnp.ndarray, ...],
    center: jnp.ndarray,
    teacher_temp: float | jnp.ndarray = 0.04,
    student_temp: float = 0.1,
    center_momentum: float = 0.9,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DINO cross-entropy between centered/sharpened teacher distributions
    and student log-softmax, skipping same-view pairs.

    teacher_out: tuple of (B, K) logits (global views);
    student_out: tuple of (B, K) logits (all views; first len(teacher_out)
    entries correspond to the same global views).
    Returns (loss, new_center). The center update mean is a GLOBAL-batch mean
    under jit (the reference needs an explicit `dist.all_reduce`,
    `losses.py:397-399`).
    """
    t_probs = [jax.nn.softmax((t - center) / teacher_temp, axis=-1)
               for t in teacher_out]
    s_logp = [jax.nn.log_softmax(s / student_temp, axis=-1)
              for s in student_out]
    total, n_terms = 0.0, 0
    for it, tp in enumerate(t_probs):
        tp = jax.lax.stop_gradient(tp)
        for is_, sl in enumerate(s_logp):
            if it == is_:
                continue  # skip same view
            total = total + jnp.mean(-jnp.sum(tp * sl, axis=-1))
            n_terms += 1
    loss = total / max(n_terms, 1)
    batch_center = jnp.mean(jnp.concatenate(teacher_out, axis=0), axis=0,
                            keepdims=True)
    new_center = center * center_momentum + batch_center * (1 - center_momentum)
    return loss, jax.lax.stop_gradient(new_center)


def ibot_patch_loss(
    teacher_patch_out: jnp.ndarray,   # (B, N, K) logits on masked positions
    student_patch_out: jnp.ndarray,   # (B, N, K)
    mask: jnp.ndarray,                # (B, N) bool, True = masked
    center: jnp.ndarray,
    teacher_temp: float | jnp.ndarray = 0.04,
    student_temp: float = 0.1,
    center_momentum: float = 0.9,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """iBOT masked-patch distillation (lightly IBOTPatchLoss semantics):
    CE between teacher and student distributions on masked patches only."""
    tp = jax.nn.softmax((teacher_patch_out - center) / teacher_temp, axis=-1)
    tp = jax.lax.stop_gradient(tp)
    sl = jax.nn.log_softmax(student_patch_out / student_temp, axis=-1)
    ce = -jnp.sum(tp * sl, axis=-1)  # (B, N)
    m = mask.astype(ce.dtype)
    loss = jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)
    # center over masked teacher logits (global under jit)
    w = m[..., None]
    batch_center = (jnp.sum(teacher_patch_out * w, axis=(0, 1), keepdims=False)
                    / jnp.maximum(jnp.sum(m), 1.0))[None]
    new_center = center * center_momentum + batch_center * (1 - center_momentum)
    return loss, jax.lax.stop_gradient(new_center)


def koleo_loss(z: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Kozachenko-Leonenko differential-entropy regularizer (DINOv2):
    -mean(log(min distance to another sample)).

    Computed as -0.5·mean(log(d² + eps)) — log(sqrt(d²)) has an infinite
    gradient at d=0 (NaNs at init when two embeddings coincide, seen when
    driving the dinov2 CLI); the squared form is smooth everywhere."""
    z = _normalize(z, eps)
    sim = jnp.einsum("id,jd->ij", z, z, preferred_element_type=jnp.float32)
    B = z.shape[0]
    sim = sim - 2.0 * jnp.eye(B, dtype=sim.dtype)  # exclude self
    nn_sim = jnp.max(sim, axis=1)
    d2 = jnp.maximum(2.0 - 2.0 * nn_sim, 0.0)
    return -0.5 * jnp.mean(jnp.log(d2 + eps))


# ---------------------------------------------------------------------------
# MSN
# ---------------------------------------------------------------------------

def msn_loss(
    anchors: jnp.ndarray,      # (A, D) anchor embeddings (masked views)
    targets: jnp.ndarray,      # (T, D) target embeddings (EMA branch)
    prototypes: jnp.ndarray,   # (K, D)
    temperature: float = 0.1,
    sinkhorn_iterations: int = 3,
    me_max_weight: float = 1.0,
) -> jnp.ndarray:
    """lightly MSNLoss semantics: CE(anchor probs, sinkhorn(target probs))
    + me-max regularization. ``anchors`` has A = T * num_anchor_views rows."""
    a = _normalize(anchors)
    t = _normalize(jax.lax.stop_gradient(targets))
    p = _normalize(prototypes)
    a_logits = jnp.einsum("ad,kd->ak", a, p,
                          preferred_element_type=jnp.float32) / temperature
    t_logits = jnp.einsum("td,kd->tk", t, p,
                          preferred_element_type=jnp.float32) / temperature
    a_probs = jax.nn.softmax(a_logits, axis=-1)
    t_probs = jax.nn.softmax(t_logits, axis=-1)
    t_probs = _sinkhorn(t_probs, sinkhorn_iterations)
    reps = anchors.shape[0] // targets.shape[0]
    t_probs = jnp.tile(t_probs, (reps, 1))
    ce = -jnp.mean(jnp.sum(t_probs * jnp.log(a_probs + 1e-12), axis=-1))
    mean_probs = jnp.mean(a_probs, axis=0)
    me_max = jnp.sum(mean_probs * jnp.log(mean_probs + 1e-12)) \
        + jnp.log(float(a_probs.shape[1]))
    return ce + me_max_weight * me_max


def _sinkhorn(probs: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """Sinkhorn-Knopp normalization over (rows=samples, cols=prototypes)."""
    if iterations == 0:
        return probs
    q = probs.T  # (K, T)
    q = q / jnp.sum(q)
    K, T = q.shape

    def body(q, _):
        q = q / jnp.maximum(jnp.sum(q, axis=1, keepdims=True), 1e-12) / K
        q = q / jnp.maximum(jnp.sum(q, axis=0, keepdims=True), 1e-12) / T
        return q, ()

    q, _ = jax.lax.scan(body, q, None, length=iterations)
    q = q * T
    return jax.lax.stop_gradient(q.T)

"""Batched feature extraction — the TPU equivalent of
`Classifier.extracting_features`
(`/root/reference/HairPretraining/src/classification_engine.py:39-69`):
model.extract_features over a loader, L2-normalized, accumulated on host.

Design: one jitted embed step with a fixed batch shape (last batch padded,
padding rows dropped on host) so XLA compiles exactly once; the eval
transform (center-crop+normalize) runs inside the jitted step on device.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12, axis: int = -1) -> jnp.ndarray:
    """torch.nn.functional.normalize parity: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def extract_features(
    embed_fn: Callable[[jnp.ndarray], jnp.ndarray],
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    batch_size: int,
    normalize: bool = True,
    donate: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Run ``embed_fn`` (image batch → (B, D)) over ``batches`` of
    (images, labels). Returns (features (N, D) f32, labels (N,)).

    ``embed_fn`` should already include the eval transform; it is jitted here
    with a fixed (batch_size, ...) shape.
    """
    jitted = jax.jit(embed_fn, donate_argnums=(0,) if donate else ())
    feats, labels = [], []
    for images, lbls in batches:
        n = images.shape[0]
        if n < batch_size:
            pad = batch_size - n
            images = np.concatenate(
                [images, np.repeat(images[-1:], pad, axis=0)], axis=0)
        out = jitted(jnp.asarray(images))
        if normalize:
            out = l2_normalize(out)
        feats.append(np.asarray(out[:n], dtype=np.float32))
        labels.append(np.asarray(lbls))
    return np.concatenate(feats, axis=0), np.concatenate(labels, axis=0)

"""Enhanced dual-view encoders — parity with
`/root/reference/experiments/DualViewHair/src/models/enhanced_dual_view.py`
and `enhanced_model.py`:

  - `SpatialAttention` (`enhanced_dual_view.py:14+`): 1-channel conv
    attention over the spatial map,
  - `MultiScaleHairEncoder`: FPN-ish multi-stage feature fusion,
  - `PartBasedHairEncoder`: horizontal-strip pooling + per-part heads,
  - `CrossViewAlignment`: cross-attention between the two views' features,
  - `EnhancedDualViewModel` + `HybridLoss` (`enhanced_model.py:17-231`):
    encoder selection and contrastive + alignment + uniformity mixture.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hairci.models.resnet import build_resnet


class SpatialAttention(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat):  # (B, H, W, C)
        avg = jnp.mean(feat, axis=-1, keepdims=True)
        mx = jnp.max(feat, axis=-1, keepdims=True)
        attn = nn.Conv(1, (7, 7), padding="SAME", dtype=self.dtype)(
            jnp.concatenate([avg, mx], axis=-1))
        return feat * jax.nn.sigmoid(attn)


class MultiScaleHairEncoder(nn.Module):
    """ResNet trunk with spatial attention + multi-scale pooled fusion."""

    backbone_name: str = "resnet50"
    embedding_dim: int = 256
    projection_dim: int = 128
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_resnet(self.backbone_name, dtype=self.dtype,
                                     with_spatial=True)
        self.attn = SpatialAttention(dtype=self.dtype)
        self.emb = nn.Dense(self.embedding_dim, dtype=self.dtype)
        self.proj1 = nn.Dense(self.embedding_dim, dtype=self.dtype)
        self.proj2 = nn.Dense(self.projection_dim, dtype=self.dtype)

    def __call__(self, x, train: bool = True,
                 return_embedding: bool = False):
        _, spatial = self.backbone(x, train=train)
        spatial = self.attn(spatial)
        gap = jnp.mean(spatial, axis=(1, 2))
        gmp = jnp.max(spatial, axis=(1, 2))
        e = nn.relu(self.emb(jnp.concatenate([gap, gmp], axis=-1)))
        if return_embedding:
            return e.astype(jnp.float32)
        z = self.proj2(nn.relu(self.proj1(e)))
        return z.astype(jnp.float32)


class PartBasedHairEncoder(nn.Module):
    """Horizontal-strip part pooling (`enhanced_dual_view.py` PartBased)."""

    backbone_name: str = "resnet50"
    num_parts: int = 4
    embedding_dim: int = 256
    projection_dim: int = 128
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_resnet(self.backbone_name, dtype=self.dtype,
                                     with_spatial=True)
        self.part_heads = [nn.Dense(self.embedding_dim // self.num_parts,
                                    dtype=self.dtype)
                           for _ in range(self.num_parts)]
        self.proj = nn.Dense(self.projection_dim, dtype=self.dtype)

    def __call__(self, x, train: bool = True,
                 return_embedding: bool = False):
        _, spatial = self.backbone(x, train=train)  # (B, H, W, C)
        B, H, W, C = spatial.shape
        strip = max(H // self.num_parts, 1)
        parts = []
        for i, head in enumerate(self.part_heads):
            band = spatial[:, i * strip:(i + 1) * strip if i
                           < self.num_parts - 1 else H]
            parts.append(nn.relu(head(jnp.mean(band, axis=(1, 2)))))
        e = jnp.concatenate(parts, axis=-1)
        if return_embedding:
            return e.astype(jnp.float32)
        return self.proj(e).astype(jnp.float32)


class CrossViewAlignment(nn.Module):
    """Cross-attention aligning student features to teacher features."""

    dim: int = 256
    heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, student_e, teacher_e):
        s = student_e[:, None, :]  # (B, 1, D)
        t = teacher_e[:, None, :]
        from hairci.models.vit import CrossAttention

        aligned = CrossAttention(self.heads, dtype=self.dtype)(s, t)
        return (student_e + aligned[:, 0]).astype(jnp.float32)


ENCODERS = {
    "multiscale": MultiScaleHairEncoder,
    "partbased": PartBasedHairEncoder,
}


def hybrid_loss(student_proj: jnp.ndarray, teacher_proj: jnp.ndarray,
                temperature: float = 0.07, w_contrastive: float = 1.0,
                w_align: float = 0.5, w_uniform: float = 0.1
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """`HybridLoss` (`enhanced_model.py`): InfoNCE + cosine alignment +
    uniformity (log mean exp of -2||zi-zj||²)."""
    from hairci.experiments.dualview.models import contrastive_loss

    c = contrastive_loss(student_proj, teacher_proj, temperature)
    s = student_proj / jnp.maximum(
        jnp.linalg.norm(student_proj, axis=-1, keepdims=True), 1e-12)
    t = teacher_proj / jnp.maximum(
        jnp.linalg.norm(teacher_proj, axis=-1, keepdims=True), 1e-12)
    align = jnp.mean(1.0 - jnp.sum(s * t, axis=-1))
    d2 = jnp.sum((s[:, None] - s[None]) ** 2, axis=-1)
    B = s.shape[0]
    # jit-safe off-diagonal mean (boolean fancy-indexing has a
    # data-dependent shape and fails under tracing)
    off = 1.0 - jnp.eye(B, dtype=d2.dtype)
    uniform = jnp.log(jnp.sum(jnp.exp(-2.0 * d2) * off)
                      / jnp.maximum(jnp.sum(off), 1.0) + 1e-12)
    total = w_contrastive * c + w_align * align + w_uniform * uniform
    return total, {"contrastive": c, "align": align, "uniform": uniform}

"""Face-recognition ViT family — parity with
`/root/reference/src/models/vit_face.py` and `vits_face.py`:

  - `ViT_face`: einops-style ViT (linear patch-to-embedding, learned pos
    embeds, pre-norm blocks, dim 512 / depth 20 / heads 8 / head_dim 64 /
    mlp 2048 at 112×112, patch 8; LN-only head) (`vit_face.py:338-404`),
  - `ViTs_face`: overlapping patch embedding via unfold(ac_patch_size=12,
    stride=8, pad=4) (`vits_face.py:339-401`),
  - margin-softmax heads Softmax / ArcFace / CosFace / SFace
    (`vit_face.py:30-329`). The reference chunks the (num_class, dim) weight
    across a GPU list with per-GPU `F.linear` + concat (manual tensor
    parallelism, `vit_face.py:97-129`); here the SAME layout is one sharding
    annotation — place the classifier weight with
    `parallel.model_sharding(mesh, axis=0, ndim=2)` and XLA partitions the
    (B, C) logit matmul over the ``model`` mesh axis (93k classes / shard
    count rows per chip).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# margin heads
# ---------------------------------------------------------------------------

def _norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def margin_logits(w: jnp.ndarray, emb: jnp.ndarray, label: jnp.ndarray,
                  loss_type: str, s: float = 64.0, m: float = 0.35,
                  arc_m: float = 0.5,
                  bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Margin-softmax logits given the (num_class, dim) classifier weight —
    the TP-shardable tensor (shard over the ``model`` axis)."""
    num_class = w.shape[0]
    if loss_type == "Softmax":
        out = jnp.einsum("bd,cd->bc", emb, w,
                         preferred_element_type=jnp.float32)
        return out + bias if bias is not None else out
    cos = jnp.einsum("bd,cd->bc", _norm(emb), _norm(w),
                     preferred_element_type=jnp.float32)
    cos = jnp.clip(cos, -1.0, 1.0)
    if label is None:
        return s * cos
    onehot = jax.nn.one_hot(label, num_class, dtype=cos.dtype)
    if loss_type == "CosFace":
        phi = cos - m
    elif loss_type == "ArcFace":
        sine = jnp.sqrt(jnp.maximum(1.0 - cos**2, 0.0))
        phi = cos * jnp.cos(arc_m) - sine * jnp.sin(arc_m)
        # easy-margin guard (`vit_face.py:113-118` semantics)
        phi = jnp.where(cos > jnp.cos(jnp.pi - arc_m), phi,
                        cos - jnp.sin(jnp.pi - arc_m) * arc_m)
    elif loss_type == "SFace":
        # SFace returns scaled cos; the sigmoid gating lives in sface_loss
        phi = cos
    else:
        raise ValueError(f"unknown loss_type {loss_type!r}")
    return s * (onehot * phi + (1.0 - onehot) * cos)


def sface_loss(cos: jnp.ndarray, label: jnp.ndarray, s: float = 64.0,
               k: float = 80.0, a: float = 0.90, b: float = 1.2
               ) -> jnp.ndarray:
    """SFace (`vit_face.py` SFaceLoss semantics): sigmoid-reweighted
    intra-class pull and inter-class push on the cosine logits."""
    onehot = jax.nn.one_hot(label, cos.shape[1], dtype=cos.dtype)
    cos_target = jnp.sum(cos * onehot, axis=1)
    # sigmoid gates are treated as constants (the reference detaches them)
    w_intra = jax.lax.stop_gradient(jax.nn.sigmoid(-k * (cos_target - a)))
    cos_others = jnp.where(onehot > 0, -1.0, cos)
    w_inter = jax.lax.stop_gradient(
        jax.nn.sigmoid(k * (cos_others - (b - 1.0))))
    intra = -jnp.mean(s * w_intra * cos_target)
    inter = jnp.mean(jnp.sum(s * w_inter * jnp.maximum(cos_others, 0.0),
                             axis=1))
    return intra + inter


# ---------------------------------------------------------------------------
# transformer (einops-ViT style: pre-norm, learned pos embed)
# ---------------------------------------------------------------------------

class _PreNormAttention(nn.Module):
    heads: int
    dim_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.heads * self.dim_head
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype)(y)
        B, N, D = x.shape
        qkv = qkv.reshape(B, N, 3, self.heads, self.dim_head)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        q = q.swapaxes(1, 2)
        k = k.swapaxes(1, 2)
        v = v.swapaxes(1, 2)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        # NOTE: the reference scales by MODEL dim, not head dim
        # (`vit_face.py:290,303` self.scale = dim ** -0.5) — kept for
        # checkpoint parity
        attn = jax.nn.softmax(attn * float(D) ** -0.5, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.swapaxes(1, 2).reshape(B, N, inner).astype(x.dtype)
        out = nn.Dense(x.shape[-1], dtype=self.dtype)(out)
        return x + out


class _PreNormFF(nn.Module):
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype)(y)
        # torch nn.GELU (exact) in f32; tanh-approx in bf16 (sub-quantization
        # error, 5x cheaper on the VPU — see models/vit.py:gelu)
        from hairci.models.vit import gelu
        y = gelu(y)
        y = nn.Dense(x.shape[-1], dtype=self.dtype)(y)
        return x + y


class ViTFace(nn.Module):
    """`ViT_face` equivalent. __call__(img, label=None): embeddings (B, dim)
    when label is None, else (margin_logits, embeddings)."""

    image_size: int = 112
    patch_size: int = 8
    dim: int = 512
    depth: int = 20
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 2048
    pool: str = "cls"
    num_class: int = 93431
    loss_type: str = "CosFace"
    overlapping: bool = False       # ViTs_face unfold patches
    ac_patch_size: int = 12
    pad: int = 4
    dtype: Any = jnp.float32

    def _patchify(self, img):
        p = self.patch_size
        B, H, W, C = img.shape
        if not self.overlapping:
            x = img.reshape(B, H // p, p, W // p, p, C)
            x = jnp.einsum("bhpwqc->bhwpqc", x)
            return x.reshape(B, (H // p) * (W // p), p * p * C)
        # nn.Unfold(ac_patch_size, stride=p, padding=pad) equivalent
        # (`vits_face.py:350-351`)
        ac, pad = self.ac_patch_size, self.pad
        padded = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        Hp = (H + 2 * pad - ac) // p + 1
        patches = jax.lax.conv_general_dilated_patches(
            jnp.moveaxis(padded, -1, 1), (ac, ac), (p, p), "VALID")
        # (B, C*ac*ac, Hp, Wp) → (B, Hp*Wp, C*ac*ac)
        patches = patches.reshape(B, -1, Hp * Hp)
        return jnp.moveaxis(patches, 1, 2)

    @nn.compact
    def __call__(self, img, label: Optional[jnp.ndarray] = None):
        x = self._patchify(img.astype(self.dtype))
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_to_embedding")(x)
        B, n, _ = x.shape
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, n + 1, self.dim))
        x = jnp.concatenate([jnp.tile(cls, (B, 1, 1)).astype(x.dtype), x],
                            axis=1)
        x = x + pos.astype(x.dtype)
        for _ in range(self.depth):
            x = _PreNormAttention(self.heads, self.dim_head,
                                  dtype=self.dtype)(x)
            x = _PreNormFF(self.mlp_dim, dtype=self.dtype)(x)
        x = x.mean(axis=1) if self.pool == "mean" else x[:, 0]
        emb = nn.LayerNorm(dtype=jnp.float32, name="mlp_head")(x)
        # head params exist on every call path (the reference builds the
        # margin head in __init__, `vit_face.py:368-379`)
        w = self.param("loss_weight", nn.initializers.xavier_uniform(),
                       (self.num_class, self.dim))
        bias = (self.param("loss_bias", nn.initializers.zeros,
                           (self.num_class,))
                if self.loss_type == "Softmax" else None)
        if label is None:
            return emb
        logits = margin_logits(w, emb, label, self.loss_type, bias=bias)
        return logits, emb


def build_vit_face(model_name: str = "VIT", loss_type: str = "CosFace",
                   num_class: int = 93431, dtype=jnp.float32) -> ViTFace:
    """Factory matching `face_encoder.py:52-87` configs."""
    if model_name == "VIT":
        return ViTFace(loss_type=loss_type, num_class=num_class, dtype=dtype)
    if model_name == "VITs":
        return ViTFace(loss_type=loss_type, num_class=num_class,
                       overlapping=True, dtype=dtype)
    raise ValueError(f"unknown face model {model_name!r}")

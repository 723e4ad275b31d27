"""Projection / prediction / prototype heads shared by the SSL recipes.

Parity targets (shapes follow the lightly heads the reference instantiates):
  - SimCLR projection head (`backbone.py:652-663` SimCLRProjectionHead)
  - BYOL projection + prediction heads (`backbone.py:167-191`)
  - DenseCL global + local heads (`backbone.py:123-161`)
  - DINO head with L2-bottleneck + weight-normalized prototype layer
    (`backbone.py:440-460`, DINOv2 `backbone.py:1021-1109`)
  - MSN head + learnable prototypes (`backbone.py:87-121`)
  - SHAM ranking MLP (`main_backbone.py:166-196`)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class MLPHead(nn.Module):
    """Stack of (Dense [BN] [act]) blocks.

    ``layers``: sequence of (out_dim, use_bn, use_act).
    ``act``: activation for layers with use_act ("relu" or "gelu" — lightly's
    MSN/DINO heads use GELU, the SimCLR/BYOL heads ReLU).
    """

    layers: Sequence[Tuple[int, bool, bool]]
    dtype: Any = jnp.float32
    act: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = nn.relu if self.act == "relu" else (
            lambda v: nn.gelu(v, approximate=False))
        x = x.astype(self.dtype)
        for i, (dim, use_bn, use_act) in enumerate(self.layers):
            x = nn.Dense(dim, use_bias=not use_bn, dtype=self.dtype,
                         name=f"dense{i}")(x)
            if use_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name=f"bn{i}")(x)
            if use_act:
                x = act(x)
        return x.astype(jnp.float32)


def simclr_projection_head(in_dim: int, hidden: int = 2048, out: int = 128,
                           dtype: Any = jnp.float32) -> MLPHead:
    # lightly SimCLRProjectionHead: Dense+BN+ReLU, Dense+BN
    return MLPHead([(hidden, True, True), (out, True, False)], dtype=dtype)


def byol_projection_head(in_dim: int, hidden: int = 4096, out: int = 256,
                         dtype: Any = jnp.float32) -> MLPHead:
    return MLPHead([(hidden, True, True), (out, False, False)], dtype=dtype)


def byol_prediction_head(in_dim: int = 256, hidden: int = 4096, out: int = 256,
                         dtype: Any = jnp.float32) -> MLPHead:
    return MLPHead([(hidden, True, True), (out, False, False)], dtype=dtype)


def densecl_global_head(in_dim: int, hidden: int = 2048, out: int = 128,
                        dtype: Any = jnp.float32) -> MLPHead:
    return MLPHead([(hidden, False, True), (out, False, False)], dtype=dtype)


class DenseCLLocalHead(nn.Module):
    """1x1-conv MLP over the spatial map → (B, HW, out) local embeddings
    (reference `backbone.py:134-140` DenseCLProjectionHead on grid)."""

    hidden: int = 2048
    out: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, spatial, train: bool = True):
        B, H, W, C = spatial.shape
        x = spatial.reshape(B, H * W, C).astype(self.dtype)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x.astype(jnp.float32)


class DINOHead(nn.Module):
    """MLP → L2-normalized bottleneck → weight-normalized prototypes.

    Output = logits over ``out_dim`` prototypes (reference DINO head,
    `backbone.py:445-452`; DINOv2/iBOT share the shape).
    """

    hidden: int = 2048
    bottleneck: int = 256
    out_dim: int = 65536
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.bottleneck, dtype=self.dtype, name="fc3")(x)
        x = x.astype(jnp.float32)
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        # weight-normalized last layer: direction-only prototype vectors
        w = self.param("prototypes", nn.initializers.normal(0.02),
                       (self.out_dim, self.bottleneck))
        w = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-12)
        # rank-agnostic: works for (B, D) cls tokens and (B, N, D) patches
        return jnp.einsum("...d,kd->...k", x, w,
                          preferred_element_type=jnp.float32)


class Prototypes(nn.Module):
    """Learnable prototype bank; returns cosine logits (MSN,
    `backbone.py:99-104`)."""

    num_prototypes: int = 1024
    dim: int = 256

    @nn.compact
    def __call__(self, z):
        w = self.param("protos", nn.initializers.normal(0.02),
                       (self.num_prototypes, self.dim))
        w = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-12)
        z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
        return jnp.einsum("bd,kd->bk", z, w, preferred_element_type=jnp.float32)


class PermuteBN(nn.Module):
    """Token-axis BatchNorm in f32 (`backbone.py:1202-1215` PermuteBN:
    N,L,C → BN over C → N,L,C). In NHWC-free token layout this is BatchNorm
    over the (batch, token) axes per channel."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis=-1,
                         axis_name=None)(x)
        return x.astype(orig_dtype)


class RankingHeadMLP(nn.Module):
    """Scores an (anchor, candidate) embedding pair (reference
    `main_backbone.py:166-196` RankingHeadMLP)."""

    hidden: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        x = jnp.concatenate([a, b, jnp.abs(a - b), a * b], axis=-1)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(1, dtype=self.dtype, name="fc2")(x)
        return x.squeeze(-1).astype(jnp.float32)

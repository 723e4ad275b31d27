"""Flax Vision Transformer family.

Covers the reference's ViT building blocks:
  - `models_vit.VisionTransformer` global-pool variant + `vit_{base,large,huge}`
    factories (`/root/reference/HairPretraining/src/models_vit.py:189-270`),
  - the masked ViT encoder used by MAE/MSN/SHAM/SiameseIM
    (`/root/reference/HairPretraining/src/masked_vision_transformer_timm.py:15-186`),
  - cross-attention blocks (`models_vit.py:CrossAttention/CrossBlock`,
    `backbone.py:711-734 CrossAlignBlock`),
  - 2-D sin-cos positional embeddings (`backbone.py:1153-1199`).

TPU-first notes:
  * Token masking is a static-shape `take_along_axis` gather (keep-count is a
    Python int at trace time) — no dynamic shapes under jit.
  * Attention runs in `dtype` (bf16 on TPU) with f32 softmax accumulation;
    LayerNorm is pinned to f32 like the reference's fp32 LayerNorm
    (`backbone.py:1147`).
  * seq len is ≤ 197 (224/16 + cls) — no sequence parallelism needed
    (SURVEY.md §2.5); batch DP + optional TP on heads is the scaling story.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# positional embeddings
# ---------------------------------------------------------------------------

def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int,
                            cls_token: bool = False) -> np.ndarray:
    """2-D sin-cos position embedding, (grid*grid [+1], D) float32."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    emb_h = _sincos_1d(embed_dim // 2, grid[0])
    emb_w = _sincos_1d(embed_dim // 2, grid[1])
    pos_embed = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos_embed = np.concatenate(
            [np.zeros([1, embed_dim], dtype=np.float32), pos_embed], axis=0
        )
    return pos_embed


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float32) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    pos = pos.reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def resize_pos_embed(pos_embed: jnp.ndarray, new_grid: int,
                     old_grid: int, num_prefix: int = 1) -> jnp.ndarray:
    """Bilinear resize of (1, P+prefix, D) pos embeds to a new grid size.

    Parity with `main_backbone.py:98-126` interpolate_pos_embed.
    """
    prefix = pos_embed[:, :num_prefix]
    patches = pos_embed[:, num_prefix:]
    d = patches.shape[-1]
    patches = patches.reshape(1, old_grid, old_grid, d)
    patches = jax.image.resize(patches, (1, new_grid, new_grid, d), "bilinear")
    patches = patches.reshape(1, new_grid * new_grid, d)
    return jnp.concatenate([prefix, patches], axis=1)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def gelu(x):
    """GELU with dtype-tied precision policy.

    f32 inputs get the exact erf form — timm/torchvision ViT MLPs use
    nn.GELU(default), so torch-checkpoint-import parity is bit-faithful in
    f32. bf16 inputs get the tanh approximation: its error vs exact is
    <= 4.95e-4 — 8x below the bf16 quantization step (2^-8) the output is
    about to be rounded to — and on TPU the erf rational polynomial is
    VPU-bound at 5x the cost (measured 2.48 ms vs 0.50 ms on the ViT-B
    bs-256 MLP hidden tensor; ~24 ms of a 113 ms embed forward was erf).
    """
    return nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with f32 softmax accumulation (parity with
    the fp16-overflow guard in reference `models_vit.py:Attention`).

    TPU perf: the (B, H, N, N) score matrix is the one per-block tensor XLA
    must round-trip through HBM (477 MB at bs 256 / N 197 in f32). When the
    module computes in bf16, scores are emitted in bf16 too — halving that
    traffic — and the softmax still accumulates in f32 via an upcast fused
    into the reduction. bf16 (and only bf16) shares f32's exponent range,
    so the reference's overflow concern doesn't apply to it; the mantissa
    rounding is the same order as the existing bf16 output quantization
    (measured: fwd 2.14 -> 1.74 ms, fwd+bwd 7.54 -> 5.08 ms per ViT-B block
    at bs 256, tools/attn_bench.py). Any other low-precision dtype (e.g.
    f16, whose exponent range IS the overflow case the reference guards)
    takes the safe f32 score path.
    Both matrices carry `checkpoint_name` tags so `remat="selective"` can
    recompute exactly them in the backward pass.
    """

    num_heads: int
    dtype: Any = jnp.float32
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from jax.ad_checkpoint import checkpoint_name

        B, N, D = x.shape
        head_dim = D // self.num_heads
        qkv = nn.Dense(3 * D, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        q = jnp.swapaxes(q, 1, 2)  # B, H, N, hd
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        scale = head_dim**-0.5
        scores_dtype = (jnp.bfloat16 if q.dtype == jnp.bfloat16
                        else jnp.float32)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=scores_dtype) * scale
        attn = checkpoint_name(attn, "attn_scores")
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            q.dtype)
        attn = checkpoint_name(attn, "attn_probs")
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        out = jnp.swapaxes(out, 1, 2).reshape(B, N, D)
        return nn.Dense(D, dtype=self.dtype, name="proj")(out)


class CrossAttention(nn.Module):
    """Query tokens attend to key/value tokens (reference
    `models_vit.py:CrossAttention`, `backbone.py:711-734 CrossAlignBlock`)."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_tokens, kv_tokens):
        B, Nq, D = q_tokens.shape
        Nk = kv_tokens.shape[1]
        head_dim = D // self.num_heads
        q = nn.Dense(D, dtype=self.dtype, name="q")(q_tokens)
        kv = nn.Dense(2 * D, dtype=self.dtype, name="kv")(kv_tokens)
        q = q.reshape(B, Nq, self.num_heads, head_dim).swapaxes(1, 2)
        kv = kv.reshape(B, Nk, 2, self.num_heads, head_dim)
        k, v = jnp.moveaxis(kv, 2, 0)
        k = k.swapaxes(1, 2)
        v = v.swapaxes(1, 2)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * head_dim**-0.5
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        out = out.swapaxes(1, 2).reshape(B, Nq, D)
        return nn.Dense(D, dtype=self.dtype, name="proj")(out)


class LayerScale(nn.Module):
    dim: int
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_values), (self.dim,)
        )
        return x * gamma  # f32 like the reference's fp32-pinned LayerScale


def _ln(name: str):
    return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=name)


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    init_values: Optional[float] = None  # LayerScale (DINOv2 uses it)
    norm: str = "ln"  # "ln" | "permute_bn" (SiameseIM decoder blocks,
    # reference `backbone.py:1280-1292`: `norm_layer if use_*_ln else
    # PermuteBN`, default PermuteBN)

    def _norm(self, name: str, x, train: bool):
        if self.norm == "permute_bn":
            from hairci.models.heads import PermuteBN

            return PermuteBN(name=name)(x, train=train)
        return _ln(name)(x)

    @nn.compact
    def __call__(self, x, train: bool = True):
        D = x.shape[-1]
        y = Attention(self.num_heads, dtype=self.dtype, name="attn")(
            self._norm("norm1", x, train))
        if self.init_values is not None:
            y = LayerScale(D, self.init_values, name="ls1")(y)
        x = x + y
        y = Mlp(int(D * self.mlp_ratio), D, dtype=self.dtype, name="mlp")(
            self._norm("norm2", x, train)
        )
        if self.init_values is not None:
            y = LayerScale(D, self.init_values, name="ls2")(y)
        return x + y


class CrossBlock(nn.Module):
    """Pre-norm cross-attention + MLP (reference `models_vit.py:CrossBlock`)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_tokens, kv_tokens):
        D = q_tokens.shape[-1]
        q_tokens = q_tokens + CrossAttention(
            self.num_heads, dtype=self.dtype, name="xattn"
        )(_ln("norm_q")(q_tokens), _ln("norm_kv")(kv_tokens))
        q_tokens = q_tokens + Mlp(
            int(D * self.mlp_ratio), D, dtype=self.dtype, name="mlp"
        )(_ln("norm2")(q_tokens))
        return q_tokens


class PatchEmbed(nn.Module):
    patch_size: int = 16
    embed_dim: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="proj",
        )(x)
        B, H, W, D = x.shape
        return x.reshape(B, H * W, D)


# ---------------------------------------------------------------------------
# the transformer
# ---------------------------------------------------------------------------

class VisionTransformer(nn.Module):
    """ViT encoder with optional token masking.

    __call__(x, ids_keep=None, pool=False) -> token sequence
    (B, N_vis+1, D) with cls first, or pooled (B, D) features when
    ``pool=True``. When ``ids_keep`` (B, K) int32 is given, only those patch
    tokens are encoded — the MAE-style masked encode
    (`masked_vision_transformer_timm.py:115-130`).

    Pooled features follow the reference `models_vit.VisionTransformer`
    (`models_vit.py:253-258`): mean of patch tokens + fc_norm when
    ``global_pool``, else the final-normed cls token.
    """

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    img_size: int = 224
    dtype: Any = jnp.float32
    sincos_pos_embed: bool = True
    init_values: Optional[float] = None
    global_pool: bool = False  # feature = mean of patch tokens (vs cls)
    # SiameseIM's encoder has no final LayerNorm (`backbone.py:1699-1720`
    # extract_features returns the raw cls token); the param is still
    # created so the tree is layout-stable across configs
    final_norm: bool = True
    # rematerialization of block residuals in the backward pass:
    #   False        save everything (fastest when memory fits)
    #   "selective"  save everything EXCEPT the (B, H, N, N) attention
    #                score/prob matrices — the tensors that dominate
    #                training HBM (12 x 477 MB f32 at bs 256) — and
    #                recompute only the scores einsum + softmax in the
    #                backward pass (~4% extra FLOPs)
    #   True/"full"  jax.checkpoint every block: recompute the whole
    #                forward (~1/3 extra FLOPs) — the r1/r2 setting that
    #                made DINOv2 at bs 256 fit a 16 GB chip
    #   "half"       jax.checkpoint every OTHER block (~1/6 extra FLOPs);
    #                middle ground when memory allows 6 blocks' saved
    #                intermediates — uses plain block remat only, so it
    #                avoids "selective"'s relay-compiler crash
    # Param layout is unchanged by any setting.
    remat: Any = False

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size**2

    def _pos_embed_init(self, key, shape):
        if self.sincos_pos_embed:
            pe = get_2d_sincos_pos_embed(self.embed_dim, self.grid_size,
                                         cls_token=True)
            return jnp.asarray(pe)[None]
        return nn.initializers.normal(0.02)(key, shape)

    @nn.compact
    def __call__(self, x, ids_keep: Optional[jnp.ndarray] = None,
                 train: bool = True, pool: bool = False,
                 token_mask: Optional[jnp.ndarray] = None):
        """token_mask (B, N) bool: True positions get the learned mask token
        substituted after patch embedding (iBOT/SimMIM-style corruption; the
        MAE-style drop is ``ids_keep``)."""
        B = x.shape[0]
        tokens = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype,
                            name="patch_embed")(x.astype(self.dtype))
        # always create the mask token so the param structure is static
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, self.embed_dim))
        if token_mask is not None:
            tokens = jnp.where(token_mask[..., None],
                               mask_token.astype(tokens.dtype), tokens)
        pos_embed = self.param(
            "pos_embed", self._pos_embed_init,
            (1, self.num_patches + 1, self.embed_dim),
        )
        if self.sincos_pos_embed:
            pos_embed = jax.lax.stop_gradient(pos_embed)
        if tokens.shape[1] != self.num_patches:
            # multi-resolution apply (DINO/MSN local crops): bilinear
            # pos-embed interpolation, parity with `main_backbone.py:98-126`
            new_grid = int(tokens.shape[1] ** 0.5)
            pos_embed = resize_pos_embed(pos_embed, new_grid, self.grid_size)
        tokens = tokens + pos_embed[:, 1:].astype(tokens.dtype)
        if ids_keep is not None:
            tokens = jnp.take_along_axis(tokens, ids_keep[..., None], axis=1)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.embed_dim))
        cls = (cls + pos_embed[:, :1]).astype(tokens.dtype)
        tokens = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), tokens], axis=1)
        if self.remat == "selective":
            block_cls = nn.remat(
                Block,
                policy=jax.checkpoint_policies.save_anything_except_these_names(
                    "attn_scores", "attn_probs"),
            )
        elif self.remat:  # True / "full" / "half"
            block_cls = nn.remat(Block)
        else:
            block_cls = Block
        for i in range(self.depth):
            # "half": plain full-block remat (the mode the relay compiler
            # handles, unlike the policy-based "selective") on every OTHER
            # block — ~1/6 extra FLOPs instead of full remat's ~1/3, at the
            # memory cost of 6 blocks' saved intermediates.
            cls_i = (Block if (self.remat == "half" and i % 2 == 1)
                     else block_cls)
            tokens = cls_i(
                self.num_heads, self.mlp_ratio, dtype=self.dtype,
                init_values=self.init_values, name=f"block{i}",
            )(tokens)
        normed = _ln("norm")(tokens)
        tokens_normed = normed if self.final_norm else tokens
        if self.global_pool:
            pooled = _ln("fc_norm")(tokens[:, 1:].mean(axis=1))
        else:
            pooled = tokens_normed[:, 0]
        return pooled if pool else tokens_normed


VIT_CONFIGS = {
    # name: (patch, dim, depth, heads)
    "vit_tiny_patch16": (16, 192, 12, 3),
    "vit_small_patch16": (16, 384, 12, 6),
    "vit_base_patch16": (16, 768, 12, 12),
    "vit_large_patch16": (16, 1024, 24, 16),
    "vit_huge_patch14": (14, 1280, 32, 16),
}


def build_vit(name: str, img_size: int = 224, dtype: Any = jnp.float32,
              **kw) -> VisionTransformer:
    if name not in VIT_CONFIGS:
        raise ValueError(f"unknown vit {name!r}; choices: {sorted(VIT_CONFIGS)}")
    p, d, depth, h = VIT_CONFIGS[name]
    return VisionTransformer(
        patch_size=p, embed_dim=d, depth=depth, num_heads=h,
        img_size=img_size, dtype=dtype, **kw,
    )

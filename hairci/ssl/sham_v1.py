"""SHAM v1 recipe — the ViT-based MAE-style SHAM variant
(`/root/reference/HairPretraining/src/backbone.py:750-990`):

  - masked ViT student + full-view EMA teacher,
  - dual projectors: global (pooled → 1024 → 256, `backbone.py:814-819`)
    and local (patch → 1024, `backbone.py:828-832`),
  - `CrossAlignBlock` (`backbone.py:711-734`): student patch predictions
    cross-attend to teacher patches, with `PosMapping` on the positional
    embeddings (`backbone.py:736`),
  - two modes (`--SHAM_mode`, eval CLI): "embedding" (student's visible
    patch embeddings are the local predictions) and "reconstruction"
    (a depth-2 MAE decoder fills the masked patches, merged back to the
    full grid, `merge_visible_and_masked` `backbone.py:965-990`).

Loss: NT-Xent on global projections + per-sample patch-contrastive on
aligned locals (+ masked-pixel MSE in reconstruction mode), mirroring the
loss library the reference pairs this model with (`PatchContrastiveLoss`,
`utils/losses.py:521`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hairci.aug.pipelines import MultiViewTransform, knn_transform, simclr_transform
from hairci.losses import (
    masked_mse_loss,
    nt_xent_loss,
    patch_contrastive_loss,
    patchify,
)
from hairci.models.masking import random_token_mask
from hairci.models.vit import Block, CrossBlock, build_vit, VIT_CONFIGS
from hairci.ssl.base import register_recipe
from hairci.train.optim import make_optimizer
from hairci.train.state import TrainState, ema_update


class SHAMv1Module(nn.Module):
    backbone_name: str = "vit_base_patch16"
    img_size: int = 224
    mode: str = "embedding"          # embedding | reconstruction
    decoder_depth: int = 2
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_vit(self.backbone_name, img_size=self.img_size,
                                  dtype=self.dtype)
        d = self.backbone.embed_dim
        p = self.backbone.patch_size
        # dual projectors (`backbone.py:814-832`)
        self.proj_global_fc1 = nn.Dense(1024, dtype=self.dtype)
        self.proj_global_ln = nn.LayerNorm(dtype=jnp.float32)
        self.proj_global_fc2 = nn.Dense(256, dtype=self.dtype)
        self.proj_local_fc = nn.Dense(1024, dtype=self.dtype)
        self.proj_local_ln = nn.LayerNorm(dtype=jnp.float32)
        # cross alignment + positional mapping
        self.cross_align = CrossBlock(self.backbone.num_heads,
                                      dtype=self.dtype)
        self.pos_map = nn.Dense(d, dtype=self.dtype)
        # depth-2 decoder + pixel head (reconstruction mode)
        self.decoder_blocks = [Block(8, dtype=self.dtype)
                               for _ in range(self.decoder_depth)]
        self.decoder_pred = nn.Dense(p * p * 3, dtype=self.dtype)
        self.mask_token = self.param("mask_token",
                                     nn.initializers.normal(0.02), (1, 1, d))

    # -- shared encoders -------------------------------------------------
    def encode(self, x, ids_keep=None, train: bool = True):
        tokens = self.backbone(x, ids_keep=ids_keep, train=train)
        cls, patches = tokens[:, 0], tokens[:, 1:]
        pooled = patches.mean(axis=1)
        return cls, pooled, patches

    def proj_global(self, pooled, train: bool = True):
        h = nn.gelu(self.proj_global_ln(self.proj_global_fc1(pooled)))
        return self.proj_global_fc2(h).astype(jnp.float32)

    def proj_local(self, patches, train: bool = True):
        return nn.gelu(
            self.proj_local_ln(self.proj_local_fc(patches))
        ).astype(jnp.float32)

    def decode_masked(self, patches_vis, ids_restore):
        """Depth-2 decode of the full grid; returns (B, N, p*p*3) pixels."""
        B = patches_vis.shape[0]
        N = ids_restore.shape[1]
        n_masked = N - patches_vis.shape[1]
        mask_tokens = jnp.tile(self.mask_token, (B, n_masked, 1)).astype(
            patches_vis.dtype)
        full = jnp.concatenate([patches_vis, mask_tokens], axis=1)
        full = jnp.take_along_axis(full, ids_restore[..., None], axis=1)
        for blk in self.decoder_blocks:
            full = blk(full)
        return self.decoder_pred(full).astype(jnp.float32)

    def align(self, student_patches, teacher_patches, pos_embed):
        s = student_patches + self.pos_map(pos_embed).astype(
            student_patches.dtype)
        t = teacher_patches + pos_embed.astype(teacher_patches.dtype)
        return self.cross_align(s, t)

    def extract_features(self, x, train: bool = False):
        return self.backbone(x, train=train, pool=True)

    def init_all(self, x, ids_keep, ids_restore):
        """Touches every submodule so `init` creates all params."""
        _, pooled, patches = self.encode(x, ids_keep=ids_keep)
        g = self.proj_global(pooled)
        _, _, t_patches = self.encode(x)
        d = patches.shape[-1]
        N = ids_restore.shape[1]
        pe = jnp.zeros((1, N, d))
        aligned = self.align(
            jnp.zeros((x.shape[0], N, d), patches.dtype), t_patches, pe)
        loc = self.proj_local(aligned)
        pix = self.decode_masked(patches, ids_restore)
        return g, loc, pix


@register_recipe("SHAM_v1")
class SHAMv1Recipe:
    def __init__(
        self,
        backbone: str = "vit_base_patch16",
        img_size: int = 224,
        sham_mode: str = "embedding",
        mask_ratio: float = 0.75,
        temperature: float = 0.5,
        learning_rate: float = 1e-3,
        weight_decay: float = 0.0,
        betas=(0.9, 0.999),
        ema_momentum: float = 0.996,
        recon_weight: float = 1.0,
        local_weight: float = 0.5,
        dtype: Any = jnp.bfloat16,
        transform: Optional[MultiViewTransform] = None,
        **_unused,
    ):
        if backbone in ("resnet18", "resnet50", "vit_b_16"):
            backbone = "vit_base_patch16"
        assert sham_mode in ("embedding", "reconstruction")
        self.module = SHAMv1Module(backbone_name=backbone, img_size=img_size,
                                   mode=sham_mode, dtype=dtype)
        self.mode = sham_mode
        self.mask_ratio = mask_ratio
        self.temperature = temperature
        self.ema_momentum = ema_momentum
        self.recon_weight = recon_weight
        self.local_weight = local_weight
        self.img_size = img_size
        p, d, _, _ = VIT_CONFIGS[backbone]
        self.num_patches = (img_size // p) ** 2
        self.patch_size = p
        self.transform = transform or simclr_transform(img_size)
        self.tx = make_optimizer(learning_rate, weight_decay, betas,
                                 grad_clip=1.0)

    def create_state(self, rng, sample_images) -> TrainState:
        v0, _ = self.transform(jax.random.key(0), sample_images)
        ids_keep, ids_restore, _ = random_token_mask(
            jax.random.key(1), v0.shape[0], self.num_patches,
            self.mask_ratio)
        variables = self.module.init(rng, v0, ids_keep, ids_restore,
                                     method=self.module.init_all)
        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params, batch_stats={},
            opt_state=self.tx.init(params), tx=self.tx,
            ema_params=params, ema_batch_stats={})

    def train_step(self, state: TrainState, batch, rng
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        images = batch["image"] if isinstance(batch, dict) else batch
        k_aug, k_mask = jax.random.split(rng)
        v_student, v_teacher = self.transform(k_aug, images)
        B = images.shape[0]
        ids_keep, ids_restore, mask = random_token_mask(
            k_mask, B, self.num_patches, self.mask_ratio)

        ema_params = ema_update(state.ema_params, state.params,
                                self.ema_momentum)
        state = state.replace(ema_params=ema_params)

        # teacher (full view, no grad)
        t_cls, t_pooled, t_patches = self.module.apply(
            {"params": state.ema_params}, v_teacher, train=False,
            method=self.module.encode)
        t_global = self.module.apply({"params": state.ema_params},
                                     jax.lax.stop_gradient(t_pooled),
                                     method=self.module.proj_global)
        t_local = self.module.apply({"params": state.ema_params},
                                    jax.lax.stop_gradient(t_patches),
                                    method=self.module.proj_local)
        t_global = jax.lax.stop_gradient(t_global)
        t_local = jax.lax.stop_gradient(t_local)
        t_patches = jax.lax.stop_gradient(t_patches)

        pe = jnp.zeros((1, self.num_patches, t_patches.shape[-1]),
                       jnp.float32)

        def loss_fn(params):
            _, s_pooled, s_patches = self.module.apply(
                {"params": params}, v_student, ids_keep=ids_keep, train=True,
                method=self.module.encode)
            s_global = self.module.apply({"params": params}, s_pooled,
                                         method=self.module.proj_global)
            metrics = {}
            recon = 0.0
            if self.mode == "reconstruction":
                pixels = self.module.apply(
                    {"params": params}, s_patches, ids_restore,
                    method=self.module.decode_masked)
                target = patchify(v_student, self.patch_size)
                recon = masked_mse_loss(pixels, target, mask)
                # full-grid embeddings for alignment: scatter visible
                n_vis = s_patches.shape[1]
                full = jnp.zeros(
                    (B, self.num_patches, s_patches.shape[-1]),
                    s_patches.dtype)
                full = jax.vmap(lambda f, idx, v: f.at[idx].set(v))(
                    full, ids_keep, s_patches)
                s_pred = full
            else:
                # embedding mode: visible patches scattered to their slots
                full = jnp.zeros(
                    (B, self.num_patches, s_patches.shape[-1]),
                    s_patches.dtype)
                s_pred = jax.vmap(lambda f, idx, v: f.at[idx].set(v))(
                    full, ids_keep, s_patches)

            aligned = self.module.apply({"params": params}, s_pred,
                                        t_patches, pe,
                                        method=self.module.align)
            s_local = self.module.apply({"params": params}, aligned,
                                        method=self.module.proj_local)
            g_loss = nt_xent_loss(s_global, t_global, self.temperature)
            l_loss = patch_contrastive_loss(s_local, t_local,
                                            self.temperature)
            total = g_loss + self.local_weight * l_loss \
                + self.recon_weight * recon
            metrics.update({"loss": total, "global_loss": g_loss,
                            "local_loss": l_loss})
            if self.mode == "reconstruction":
                metrics["recon_loss"] = recon
            return total, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads), metrics

    def extract_features(self, state: TrainState, images) -> jnp.ndarray:
        x = knn_transform(images, self.img_size)
        return self.module.apply({"params": state.params}, x, train=False,
                                 method=self.module.extract_features)

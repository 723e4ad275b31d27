"""MAE recipe — reference `MAE` model
(`/root/reference/HairPretraining/src/backbone.py:462-525`: lightly
MaskedVisionTransformerTIMM encoder + MAEDecoderTIMM depth-8 decoder,
mask ratio 0.75) trained with MSE on masked patches
(`src/pretrain_engine.py:323-344`, criterion `nn.MSELoss` at `:72`).

TPU notes: masked encode is a static-shape gather (keep-count fixed at trace
time); the decoder runs on the full token grid with mask tokens scattered
back via one `take_along_axis` on ids_restore.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hairci.aug.pipelines import MultiViewTransform, knn_transform, mae_transform
from hairci.losses import masked_mse_loss, patchify
from hairci.models.masking import random_token_mask
from hairci.models.vit import Block, VisionTransformer, build_vit, get_2d_sincos_pos_embed, _ln
from hairci.ssl.base import register_recipe
from hairci.train.optim import make_optimizer
from hairci.train.state import TrainState


class MAEDecoder(nn.Module):
    """Depth-8 ViT decoder (lightly MAEDecoderTIMM defaults: dim 512,
    heads 16)."""

    patch_size: int = 16
    embed_dim: int = 512
    depth: int = 8
    num_heads: int = 16
    out_dim: int = 16 * 16 * 3
    grid_size: int = 14
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, enc_tokens, ids_restore):
        """enc_tokens: (B, K+1, D_enc) visible tokens incl cls;
        ids_restore: (B, N). Returns (B, N, out_dim) pixel predictions."""
        B, _, _ = enc_tokens.shape
        N = ids_restore.shape[1]
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="embed")(enc_tokens)
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, self.embed_dim))
        cls, vis = x[:, :1], x[:, 1:]
        n_masked = N - vis.shape[1]
        mask_tokens = jnp.tile(mask_token, (B, n_masked, 1)).astype(x.dtype)
        full = jnp.concatenate([vis, mask_tokens], axis=1)  # (B, N, D)
        full = jnp.take_along_axis(full, ids_restore[..., None], axis=1)
        pe = get_2d_sincos_pos_embed(self.embed_dim, self.grid_size,
                                     cls_token=True)
        pe = jnp.asarray(pe)[None].astype(x.dtype)
        x = jnp.concatenate([cls + pe[:, :1], full + pe[:, 1:]], axis=1)
        for i in range(self.depth):
            x = Block(self.num_heads, dtype=self.dtype, name=f"block{i}")(x)
        x = _ln("norm")(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="pred")(x)
        return x[:, 1:].astype(jnp.float32)  # drop cls


class MAEModule(nn.Module):
    backbone_name: str = "vit_base_patch16"
    img_size: int = 224
    mask_ratio: float = 0.75
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = build_vit(self.backbone_name, img_size=self.img_size,
                                 dtype=self.dtype)
        self.decoder = MAEDecoder(
            patch_size=self.encoder.patch_size,
            out_dim=self.encoder.patch_size**2 * 3,
            grid_size=self.encoder.grid_size, dtype=self.dtype)

    def __call__(self, images, ids_keep, ids_restore, train: bool = True):
        tokens = self.encoder(images, ids_keep=ids_keep, train=train)
        pred = self.decoder(tokens, ids_restore)
        return pred

    def extract_features(self, x, train: bool = False):
        return self.encoder(x, train=train, pool=True)


@register_recipe("mae")
class MAERecipe:
    def __init__(
        self,
        backbone: str = "vit_base_patch16",
        img_size: int = 224,
        mask_ratio: float = 0.75,
        learning_rate: float = 1e-3,
        weight_decay: float = 0.0,
        betas=(0.9, 0.999),
        dtype: Any = jnp.bfloat16,
        transform: Optional[MultiViewTransform] = None,
        norm_pix: bool = False,
        **_unused,
    ):
        if backbone in ("resnet18", "resnet50"):
            backbone = "vit_base_patch16"  # MAE is ViT-only (mainpretrain.py:152)
        self.module = MAEModule(backbone_name=backbone, img_size=img_size,
                                mask_ratio=mask_ratio, dtype=dtype)
        self.mask_ratio = mask_ratio
        self.norm_pix = norm_pix
        self.img_size = img_size
        from hairci.models.vit import VIT_CONFIGS

        self.patch_size = VIT_CONFIGS[backbone][0]
        self.num_patches = (img_size // self.patch_size) ** 2
        self.transform = transform or mae_transform(img_size)
        self.tx = make_optimizer(learning_rate, weight_decay, betas)

    def _mask(self, key, batch_size):
        return random_token_mask(key, batch_size, self.num_patches,
                                 self.mask_ratio)

    def create_state(self, rng, sample_images) -> TrainState:
        (view,) = self.transform(jax.random.key(0), sample_images)
        ids_keep, ids_restore, _ = self._mask(jax.random.key(1), view.shape[0])
        variables = self.module.init(rng, view, ids_keep, ids_restore,
                                     train=True)
        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(params), tx=self.tx)

    def train_step(self, state: TrainState, batch, rng
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        images = batch["image"] if isinstance(batch, dict) else batch
        k_aug, k_mask = jax.random.split(rng)
        (view,) = self.transform(k_aug, images)
        ids_keep, ids_restore, mask = self._mask(k_mask, view.shape[0])
        target = patchify(view, self.patch_size)

        def loss_fn(params):
            pred = self.module.apply({"params": params}, view, ids_keep,
                                     ids_restore, train=True)
            return masked_mse_loss(pred, target, mask, norm_pix=self.norm_pix)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"loss": loss}

    def extract_features(self, state: TrainState, images) -> jnp.ndarray:
        x = knn_transform(images, self.img_size)
        return self.module.apply({"params": state.params}, x, train=False,
                                 method=self.module.extract_features)

"""SimMIM recipe — reference `SimMIM`
(`/root/reference/HairPretraining/src/backbone.py:549-601`: torchvision ViT
encoder with mask-token substitution + linear decoder) trained with L1 on
masked patches (`src/pretrain_engine.py:514-535`, criterion `nn.L1Loss`).

Unlike MAE, the encoder sees ALL positions with masked patch embeddings
replaced by a learned mask token; the decoder is a single linear head.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hairci.aug.pipelines import MultiViewTransform, knn_transform, simmim_transform
from hairci.losses import masked_l1_loss, patchify
from hairci.models.masking import random_token_mask
from hairci.models.vit import Block, PatchEmbed, _ln, build_vit, VIT_CONFIGS, get_2d_sincos_pos_embed
from hairci.ssl.base import register_recipe
from hairci.train.optim import make_optimizer
from hairci.train.state import TrainState


class SimMIMModule(nn.Module):
    backbone_name: str = "vit_base_patch16"
    img_size: int = 224
    dtype: Any = jnp.float32

    @property
    def cfg(self):
        return VIT_CONFIGS[self.backbone_name]

    def setup(self):
        p, d, depth, h = self.cfg
        self.patch_size, self.embed_dim = p, d
        self.grid = self.img_size // p
        self.patch_embed = PatchEmbed(p, d, dtype=self.dtype)
        self.blocks = [Block(h, dtype=self.dtype) for i in range(depth)]
        self.mask_token = self.param("mask_token",
                                     nn.initializers.normal(0.02), (1, 1, d))
        self.decoder = nn.Dense(p * p * 3, dtype=self.dtype)
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)

    def _pos(self):
        pe = get_2d_sincos_pos_embed(self.embed_dim, self.grid,
                                     cls_token=False)
        return jnp.asarray(pe)[None]

    def encode(self, x, mask=None, train: bool = True):
        """mask: (B, N) bool, True = replace with mask token."""
        tokens = self.patch_embed(x.astype(self.dtype))
        if mask is not None:
            mt = self.mask_token.astype(tokens.dtype)
            tokens = jnp.where(mask[..., None], mt, tokens)
        tokens = tokens + self._pos().astype(tokens.dtype)
        for blk in self.blocks:
            tokens = blk(tokens)
        return self.norm(tokens)

    def __call__(self, x, mask, train: bool = True):
        tokens = self.encode(x, mask, train)
        return self.decoder(tokens).astype(jnp.float32)  # (B, N, p*p*3)

    def extract_features(self, x, train: bool = False):
        tokens = self.encode(x, None, train)
        return tokens.mean(axis=1)


@register_recipe("simMIM")
class SimMIMRecipe:
    def __init__(
        self,
        backbone: str = "vit_base_patch16",
        img_size: int = 224,
        mask_ratio: float = 0.6,
        learning_rate: float = 1e-3,
        weight_decay: float = 0.0,
        betas=(0.9, 0.999),
        dtype: Any = jnp.bfloat16,
        transform: Optional[MultiViewTransform] = None,
        **_unused,
    ):
        if backbone in ("resnet18", "resnet50"):
            backbone = "vit_base_patch16"
        self.module = SimMIMModule(backbone_name=backbone, img_size=img_size,
                                   dtype=dtype)
        self.mask_ratio = mask_ratio
        self.img_size = img_size
        self.transform = transform or simmim_transform(img_size)
        self.tx = make_optimizer(learning_rate, weight_decay, betas)

    def create_state(self, rng, sample_images) -> TrainState:
        (view,) = self.transform(jax.random.key(0), sample_images)
        n = (self.img_size // VIT_CONFIGS[self.module.backbone_name][0]) ** 2
        mask = jnp.zeros((view.shape[0], n), bool)
        variables = self.module.init(rng, view, mask, train=True)
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
        p = VIT_CONFIGS[self.module.backbone_name][0]
        n = (self.img_size // p) ** 2
        _, _, maskf = random_token_mask(k_mask, view.shape[0], n,
                                        self.mask_ratio)
        mask = maskf > 0.5
        target = patchify(view, p)

        def loss_fn(params):
            pred = self.module.apply({"params": params}, view, mask,
                                     train=True)
            return masked_l1_loss(pred, target, mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"loss": loss}

    def extract_features(self, state: TrainState, images) -> jnp.ndarray:
        x = knn_transform(images, self.img_size)
        return self.module.apply({"params": state.params}, x, train=False,
                                 method=self.module.extract_features)

"""MSN recipe — reference `MSN`
(`/root/reference/HairPretraining/src/backbone.py:87-121`: masked ViT anchor
branch + EMA target branch + MSN projection heads + 1024 prototypes,
mask_ratio 0.15) trained per `src/pretrain_engine.py:242-276`: targets from
view0, anchors = masked view1 + focal views, `MSNLoss`, momentum 0.996.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hairci.aug.pipelines import MultiViewTransform, knn_transform, msn_transform
from hairci.losses import msn_loss
from hairci.models.heads import MLPHead
from hairci.models.masking import random_token_mask
from hairci.models.vit import build_vit
from hairci.ssl.base import register_recipe
from hairci.train.optim import make_optimizer
from hairci.train.state import TrainState, ema_update


class MSNModule(nn.Module):
    backbone_name: str = "vit_base_patch16"
    img_size: int = 224
    focal_size: int = 96
    proj_hidden: int = 2048
    proj_out: int = 256
    num_prototypes: int = 1024
    dtype: Any = jnp.float32

    def setup(self):
        # ONE backbone for full + focal resolutions (pos-embed interpolated
        # at apply time, like the reference's single ViT)
        self.backbone = build_vit(self.backbone_name, img_size=self.img_size,
                                  dtype=self.dtype)
        # lightly MSNProjectionHead layout (`backbone.py:93`):
        # (Linear+BN+GELU) x2 then Linear, hidden 2048, out 256
        self.projection_head = MLPHead(
            [(self.proj_hidden, True, True), (self.proj_hidden, True, True),
             (self.proj_out, False, False)],
            act="gelu", dtype=self.dtype)
        self.prototypes = self.param(
            "prototypes", nn.initializers.normal(0.02),
            (self.num_prototypes, self.proj_out))

    def encode(self, x, ids_keep=None, train: bool = True):
        tokens = self.backbone(x, ids_keep=ids_keep, train=train)
        return self.projection_head(tokens[:, 0], train=train)

    def extract_features(self, x, train: bool = False):
        return self.backbone(x, train=train, pool=True)


@register_recipe("MSN")
class MSNRecipe:
    def __init__(
        self,
        backbone: str = "vit_base_patch16",
        img_size: int = 224,
        focal_size: int = 96,
        n_focal: int = 10,
        mask_ratio: float = 0.15,
        learning_rate: float = 1e-3,
        weight_decay: float = 0.0,
        betas=(0.9, 0.999),
        ema_momentum: float = 0.996,
        dtype: Any = jnp.bfloat16,
        transform: Optional[MultiViewTransform] = None,
        **_unused,
    ):
        if backbone in ("resnet18", "resnet50"):
            backbone = "vit_base_patch16"
        self.module = MSNModule(backbone_name=backbone, img_size=img_size,
                                focal_size=focal_size, dtype=dtype)
        self.img_size = img_size
        self.n_focal = n_focal
        self.mask_ratio = mask_ratio
        self.ema_momentum = ema_momentum
        from hairci.models.vit import VIT_CONFIGS

        self.num_patches = (img_size // VIT_CONFIGS[backbone][0]) ** 2
        self.transform = transform or msn_transform(img_size, focal_size,
                                                    n_focal)
        self.tx = make_optimizer(learning_rate, weight_decay, betas)

    def create_state(self, rng, sample_images) -> TrainState:
        views = self.transform(jax.random.key(0), sample_images)
        variables = self.module.init(
            rng, views[0], train=True, method=self.module.encode)
        params = variables["params"]
        bs = variables.get("batch_stats", {})
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params, batch_stats=bs,
            opt_state=self.tx.init(params), tx=self.tx,
            ema_params=params, ema_batch_stats=bs)

    def train_step(self, state: TrainState, batch, rng
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        images = batch["image"] if isinstance(batch, dict) else batch
        k_aug, k_mask = jax.random.split(rng)
        views = self.transform(k_aug, images)
        targets_v, anchors_v, focal_vs = views[0], views[1], views[2:]

        # EMA target branch updated FROM the anchor branch
        # (`pretrain_engine.py:248-251`: update_momentum(anchor, target))
        ema_params = ema_update(state.ema_params, state.params,
                                self.ema_momentum)
        ema_bs = ema_update(state.ema_batch_stats, state.batch_stats,
                            self.ema_momentum)
        state = state.replace(ema_params=ema_params, ema_batch_stats=ema_bs)

        B = images.shape[0]
        ids_keep, _, _ = random_token_mask(k_mask, B, self.num_patches,
                                           self.mask_ratio)

        def loss_fn(params):
            target_out = self.module.apply(
                {"params": state.ema_params,
                 "batch_stats": state.ema_batch_stats},
                targets_v, train=False, method=self.module.encode)
            anchor_out, upd1 = self.module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                anchors_v, ids_keep=ids_keep, train=True,
                method=self.module.encode, mutable=["batch_stats"])
            focal_cat = jnp.concatenate(focal_vs, axis=0)
            focal_out, upd2 = self.module.apply(
                {"params": params, "batch_stats": upd1["batch_stats"]},
                focal_cat, train=True, method=self.module.encode,
                mutable=["batch_stats"])
            anchors_all = jnp.concatenate([anchor_out, focal_out], axis=0)
            protos = params["prototypes"]
            loss = msn_loss(anchors_all,
                            jax.lax.stop_gradient(target_out), protos)
            return loss, upd2["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads, batch_stats=new_bs), {"loss": loss}

    def extract_features(self, state: TrainState, images) -> jnp.ndarray:
        """Features from the EMA *target* branch — the reference's
        `MSN.extract_features` uses `self.backbone` (the frozen target, not
        the trainable anchor; `backbone.py:119-121`)."""
        x = knn_transform(images, self.img_size)
        return self.module.apply(
            {"params": state.ema_params, "batch_stats": state.ema_batch_stats},
            x, train=False, method=self.module.extract_features)

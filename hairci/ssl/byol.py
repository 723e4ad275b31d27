"""BYOL recipe — reference `BYOL`
(`/root/reference/HairPretraining/src/backbone.py:167-191`: ResNet-50 trunk +
BYOL projection/prediction heads + momentum copies) trained with symmetric
negative-cosine loss and a cosine momentum schedule 0.996→1
(`src/pretrain_engine.py:345-375`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hairci.aug.pipelines import MultiViewTransform, byol_transform, knn_transform
from hairci.losses import negative_cosine_similarity
from hairci.models import build_backbone
from hairci.models.heads import byol_prediction_head, byol_projection_head
from hairci.ssl.base import backbone_features, register_recipe
from hairci.train.optim import make_optimizer
from hairci.train.schedules import cosine_schedule
from hairci.train.state import TrainState, ema_update


class BYOLModule(nn.Module):
    backbone_name: str = "resnet50"
    img_size: int = 224
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_backbone(self.backbone_name,
                                       img_size=self.img_size,
                                       dtype=self.dtype)
        self.projection_head = byol_projection_head(0, dtype=self.dtype)
        self.prediction_head = byol_prediction_head(dtype=self.dtype)

    def __call__(self, x, train: bool = True):
        """Online branch: p = predictor(projector(backbone(x)))."""
        f = backbone_features(self.backbone, x, train)
        z = self.projection_head(f, train=train)
        return self.prediction_head(z, train=train)

    def project(self, x, train: bool = True):
        """Momentum branch output: z (no predictor)."""
        f = backbone_features(self.backbone, x, train)
        return self.projection_head(f, train=train)

    def extract_features(self, x, train: bool = False):
        return backbone_features(self.backbone, x, train)


@register_recipe("BYOL")
class BYOLRecipe:
    def __init__(
        self,
        backbone: str = "resnet50",
        img_size: int = 224,
        learning_rate: float = 1e-3,
        weight_decay: float = 0.0,
        betas=(0.9, 0.999),
        dtype: Any = jnp.bfloat16,
        transform: Optional[MultiViewTransform] = None,
        epochs: int = 100,
        **_unused,
    ):
        self.module = BYOLModule(backbone_name=backbone, img_size=img_size,
                                 dtype=dtype)
        self.img_size = img_size
        # reference disables blur in both views (`mainpretrain.py:126-128`)
        if transform is None:
            import dataclasses

            t = byol_transform(img_size)
            views = tuple(dataclasses.replace(v, blur_p=0.0) for v in t.views)
            transform = dataclasses.replace(t, views=views)
        self.transform = transform
        self.epochs = epochs
        self.tx = make_optimizer(learning_rate, weight_decay, betas)

    def momentum_for_epoch(self, epoch: int) -> float:
        return cosine_schedule(epoch, self.epochs, 0.996, 1.0)

    def create_state(self, rng, sample_images) -> TrainState:
        views = self.transform(jax.random.key(0), sample_images)
        variables = self.module.init(rng, views[0], train=True)
        params = variables["params"]
        bs = variables.get("batch_stats", {})
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params, batch_stats=bs,
            opt_state=self.tx.init(params), tx=self.tx,
            ema_params=params, ema_batch_stats=bs)

    def train_step(self, state: TrainState, batch, rng,
                   momentum: float | jnp.ndarray = 0.996
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        images = batch["image"] if isinstance(batch, dict) else batch
        (k_aug,) = jax.random.split(rng, 1)
        v0, v1 = self.transform(k_aug, images)

        ema_params = ema_update(state.ema_params, state.params, momentum)
        ema_bs = ema_update(state.ema_batch_stats, state.batch_stats, momentum)
        state = state.replace(ema_params=ema_params, ema_batch_stats=ema_bs)

        def loss_fn(params):
            both = jnp.concatenate([v0, v1], axis=0)
            p_all, updates = self.module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                both, train=True, mutable=["batch_stats"])
            p0, p1 = jnp.split(p_all, 2, axis=0)
            z_all = self.module.apply(
                {"params": state.ema_params,
                 "batch_stats": state.ema_batch_stats},
                both, train=False, method=self.module.project)
            z0, z1 = jnp.split(z_all, 2, axis=0)
            loss = 0.5 * (negative_cosine_similarity(p0, z1)
                          + negative_cosine_similarity(p1, z0))
            return loss, updates.get("batch_stats", state.batch_stats)

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads, batch_stats=new_bs), {"loss": loss}

    def extract_features(self, state: TrainState, images) -> jnp.ndarray:
        x = knn_transform(images, self.img_size)
        return self.module.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False, method=self.module.extract_features)

"""SupCon recipe — reference `SupConResNet`
(`/root/reference/HairPretraining/src/backbone.py:396-424`: from-scratch
CIFAR-style ResNet encoder + MLP head → normalized 128-d features) trained
with `SupConLoss` on two crops + labels
(`src/pretrain_engine.py:376-401` via `--mode simclr_supcon`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hairci.aug.pipelines import (
    MultiViewTransform,
    knn_transform,
    supcon_train_transform,
)
from hairci.losses import supcon_loss
from hairci.models.resnet import build_resnet
from hairci.ssl.base import register_recipe
from hairci.train.optim import make_optimizer
from hairci.train.state import TrainState

# CIFAR-100 stats (`mainpretrain.py:97-99`)
CIFAR_MEAN = (0.5071, 0.4867, 0.4408)
CIFAR_STD = (0.2675, 0.2565, 0.2761)


class SupConModule(nn.Module):
    backbone_name: str = "resnet18"
    head: str = "mlp"
    feat_dim: int = 128
    dtype: Any = jnp.float32

    def setup(self):
        # SupConResNet uses the CIFAR-stem from-scratch ResNet family
        # (`backbone.py:247-381` model_dict)
        self.encoder = build_resnet(self.backbone_name, stem="cifar",
                                    dtype=self.dtype)
        dim_in = self.encoder.num_features
        if self.head == "linear":
            self.head_fc = nn.Dense(self.feat_dim, dtype=self.dtype)
        else:
            self.head_fc1 = nn.Dense(dim_in, dtype=self.dtype)
            self.head_fc2 = nn.Dense(self.feat_dim, dtype=self.dtype)

    def __call__(self, x, train: bool = True):
        f = self.encoder(x, train=train)
        if self.head == "linear":
            z = self.head_fc(f)
        else:
            z = self.head_fc2(nn.relu(self.head_fc1(f)))
        z = z.astype(jnp.float32)
        return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True),
                               1e-12)

    def extract_features(self, x, train: bool = False):
        return self.encoder(x, train=train)


@register_recipe("simclr_supcon")
class SupConRecipe:
    def __init__(
        self,
        backbone: str = "resnet18",
        img_size: int = 224,
        temperature: float = 0.07,
        learning_rate: float = 1e-3,
        weight_decay: float = 0.0,
        betas=(0.9, 0.999),
        dtype: Any = jnp.bfloat16,
        transform: Optional[MultiViewTransform] = None,
        **_unused,
    ):
        self.module = SupConModule(backbone_name=backbone, dtype=dtype)
        self.img_size = img_size
        self.temperature = temperature
        self.transform = transform or supcon_train_transform(
            img_size, CIFAR_MEAN, CIFAR_STD)
        self.tx = make_optimizer(learning_rate, weight_decay, betas)

    def create_state(self, rng, sample_images) -> TrainState:
        views = self.transform(jax.random.key(0), sample_images)
        variables = self.module.init(rng, views[0], train=True)
        params = variables["params"]
        bs = variables.get("batch_stats", {})
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params, batch_stats=bs,
            opt_state=self.tx.init(params), tx=self.tx)

    def train_step(self, state: TrainState, batch, rng
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        images = batch["image"]
        labels = batch["label"]
        (k_aug,) = jax.random.split(rng, 1)
        v0, v1 = self.transform(k_aug, images)

        def loss_fn(params):
            both = jnp.concatenate([v0, v1], axis=0)
            z, updates = self.module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                both, train=True, mutable=["batch_stats"])
            f1, f2 = jnp.split(z, 2, axis=0)
            feats = jnp.stack([f1, f2], axis=1)  # (B, 2, D)
            loss = supcon_loss(feats, labels, self.temperature)
            return loss, updates.get("batch_stats", state.batch_stats)

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads, batch_stats=new_bs), {"loss": loss}

    def extract_features(self, state: TrainState, images) -> jnp.ndarray:
        x = knn_transform(images, self.img_size)
        return self.module.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False, method=self.module.extract_features)

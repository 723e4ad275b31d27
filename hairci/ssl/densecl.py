"""DenseCL recipe — reference `DenseCL`
(`/root/reference/HairPretraining/src/backbone.py:123-161`: ResNet-50 trunk
kept spatial, global + local projection heads, momentum copies) trained with
memory-bank InfoNCE on both global and local branches, λ=0.5, cosine momentum
0.996→1 (`src/pretrain_engine.py:278-322`; banks of 4096 at `:86-87`).

State extras: {"bank_g", "ptr_g", "bank_l", "ptr_l"} ring buffers carried in
`TrainState.extra` (the lightly memory bank equivalent, checkpointed).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hairci.aug.pipelines import MultiViewTransform, densecl_transform, knn_transform
from hairci.losses import (
    memory_bank_infonce,
    select_most_similar,
    update_memory_bank,
)
from hairci.models.heads import DenseCLLocalHead, densecl_global_head
from hairci.models.resnet import build_resnet
from hairci.ssl.base import register_recipe
from hairci.train.optim import make_optimizer
from hairci.train.schedules import cosine_schedule
from hairci.train.state import TrainState, ema_update


class DenseCLModule(nn.Module):
    backbone_name: str = "resnet50"
    # reference: DenseCLProjectionHead(2048, 2048, 512) (`backbone.py:126-127`)
    out_dim: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_resnet(self.backbone_name, dtype=self.dtype,
                                     with_spatial=True)
        self.projection_head_global = densecl_global_head(
            0, out=self.out_dim, dtype=self.dtype)
        self.projection_head_local = DenseCLLocalHead(
            out=self.out_dim, dtype=self.dtype)

    def __call__(self, x, train: bool = True):
        """Returns (grid_features (B,N,C), global (B,D), local (B,N,D))."""
        pooled, spatial = self.backbone(x, train=train)
        B, H, W, C = spatial.shape
        grid = spatial.reshape(B, H * W, C)
        g = self.projection_head_global(pooled, train=train)
        l = self.projection_head_local(spatial, train=train)
        return grid, g, l

    def extract_features(self, x, train: bool = False):
        pooled, _ = self.backbone(x, train=train)
        return pooled


@register_recipe("DenseCL")
class DenseCLRecipe:
    def __init__(
        self,
        backbone: str = "resnet50",
        img_size: int = 224,
        learning_rate: float = 1e-3,
        weight_decay: float = 0.0,
        betas=(0.9, 0.999),
        temperature: float = 0.1,
        bank_size: int = 4096,
        lambda_: float = 0.5,
        dtype: Any = jnp.bfloat16,
        transform: Optional[MultiViewTransform] = None,
        epochs: int = 100,
        **_unused,
    ):
        self.module = DenseCLModule(backbone_name=backbone, dtype=dtype)
        self.img_size = img_size
        self.temperature = temperature
        self.bank_size = bank_size
        self.lambda_ = lambda_
        self.epochs = epochs
        self.transform = transform or densecl_transform(img_size)
        self.tx = make_optimizer(learning_rate, weight_decay, betas)

    def momentum_for_epoch(self, epoch: int) -> float:
        return cosine_schedule(epoch, self.epochs, 0.996, 1.0)

    def create_state(self, rng, sample_images) -> TrainState:
        views = self.transform(jax.random.key(0), sample_images)
        variables = self.module.init(rng, views[0], train=True)
        params = variables["params"]
        bs = variables.get("batch_stats", {})
        d = self.module.out_dim
        extra = {
            "bank_g": jnp.zeros((self.bank_size, d), jnp.float32),
            "ptr_g": jnp.zeros((), jnp.int32),
            "bank_l": jnp.zeros((self.bank_size, d), jnp.float32),
            "ptr_l": jnp.zeros((), jnp.int32),
        }
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params, batch_stats=bs,
            opt_state=self.tx.init(params), tx=self.tx,
            ema_params=params, ema_batch_stats=bs, extra=extra)

    def train_step(self, state: TrainState, batch, rng,
                   momentum: float | jnp.ndarray = 0.996
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        images = batch["image"] if isinstance(batch, dict) else batch
        (k_aug,) = jax.random.split(rng, 1)
        x_query, x_key = self.transform(k_aug, images)

        ema_params = ema_update(state.ema_params, state.params, momentum)
        ema_bs = ema_update(state.ema_batch_stats, state.batch_stats, momentum)
        state = state.replace(ema_params=ema_params, ema_batch_stats=ema_bs)

        # momentum branch (no grad)
        key_grid, key_global, key_local = self.module.apply(
            {"params": state.ema_params, "batch_stats": state.ema_batch_stats},
            x_key, train=False)

        def loss_fn(params):
            (q_grid, q_global, q_local), updates = self.module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x_query, train=True, mutable=["batch_stats"])
            matched_key_local = select_most_similar(q_grid, key_grid,
                                                    key_local)
            B, N, D = q_local.shape
            loss_g = memory_bank_infonce(
                q_global, key_global, state.extra["bank_g"], self.temperature)
            loss_l = memory_bank_infonce(
                q_local.reshape(B * N, D),
                matched_key_local.reshape(B * N, D),
                state.extra["bank_l"], self.temperature)
            loss = (1 - self.lambda_) * loss_g + self.lambda_ * loss_l
            return loss, (loss_g, loss_l,
                          updates.get("batch_stats", state.batch_stats))

        (loss, (loss_g, loss_l, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # enqueue this batch's keys
        bank_g, ptr_g = update_memory_bank(
            state.extra["bank_g"], state.extra["ptr_g"], key_global)
        B, N, D = key_local.shape
        # enqueue the per-image mean local key (bounded bank growth)
        bank_l, ptr_l = update_memory_bank(
            state.extra["bank_l"], state.extra["ptr_l"],
            key_local.mean(axis=1))
        extra = {"bank_g": bank_g, "ptr_g": ptr_g,
                 "bank_l": bank_l, "ptr_l": ptr_l}
        new_state = state.apply_gradients(grads, batch_stats=new_bs,
                                          extra=extra)
        return new_state, {"loss": loss, "global_loss": loss_g,
                           "local_loss": loss_l}

    def extract_features(self, state: TrainState, images) -> jnp.ndarray:
        x = knn_transform(images, self.img_size)
        return self.module.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False, method=self.module.extract_features)

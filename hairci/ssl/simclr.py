"""SimCLR recipe — TPU-native rebuild of the reference's effective `SimCLR`
model (`/root/reference/HairPretraining/src/backbone.py:648-681`: backbone +
SimCLRProjectionHead) and `train_one_epoch_simclr`
(`src/pretrain_engine.py:217-240`: two lightly views → NTXentLoss → Adam).

Improvements over the reference, by construction:
  - the two-view augmentation runs on device inside the jitted step,
  - NT-Xent negatives span the GLOBAL batch when the batch is sharded over
    the ``data`` mesh axis (the reference is single-device),
  - BatchNorm statistics are global-batch (sync-BN) for the same reason,
  - bf16 compute, no GradScaler.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hairci.aug.pipelines import MultiViewTransform, knn_transform, simclr_transform
from hairci.losses import nt_xent_loss
from hairci.models import build_backbone
from hairci.models.heads import simclr_projection_head
from hairci.ssl.base import backbone_features, register_recipe
from hairci.train.optim import make_optimizer
from hairci.train.state import TrainState


# reference SimCLR head: SimCLRProjectionHead(D, D, out) with out per
# backbone (`backbone.py:655-672`)
_PROJ_DIMS = {
    "resnet18": (512, 128),
    "resnet34": (512, 128),
    "resnet50": (2048, 1024),
    "resnet101": (2048, 1024),
    "vit_b_16": (768, 512),
    "vit_base_patch16": (768, 512),
}


class SimCLRModule(nn.Module):
    backbone_name: str = "resnet50"
    img_size: int = 224
    proj_hidden: int = 0  # 0 = backbone feature dim (reference layout)
    proj_out: int = 0     # 0 = reference per-backbone output dim
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_backbone(
            self.backbone_name, img_size=self.img_size, dtype=self.dtype)
        hidden, out = _PROJ_DIMS.get(self.backbone_name, (2048, 128))
        self.head = simclr_projection_head(
            0, hidden=self.proj_hidden or hidden,
            out=self.proj_out or out, dtype=self.dtype)

    def __call__(self, x, train: bool = True):
        f = backbone_features(self.backbone, x, train)
        return self.head(f, train=train)

    def extract_features(self, x, train: bool = False):
        """(B, D) pooled backbone features (`backbone.py:680`)."""
        return backbone_features(self.backbone, x, train)


@register_recipe("simclr")
class SimCLRRecipe:
    def __init__(
        self,
        backbone: str = "resnet50",
        img_size: int = 224,
        temperature: float = 0.5,
        learning_rate: float = 1e-3,
        weight_decay: float = 0.0,
        betas=(0.9, 0.999),
        dtype: Any = jnp.bfloat16,
        transform: MultiViewTransform | None = None,
        proj_out: int = 0,
        s2r2_weight: float = 0.0,
    ):
        self.module = SimCLRModule(
            backbone_name=backbone, img_size=img_size, proj_out=proj_out,
            dtype=dtype)
        self.temperature = temperature
        # `--mode S2R2` / `--S2R2`: Smooth-AP regularizer on the projections.
        # The reference advertises the mode (`mainpretrain.py:61`) but has no
        # model branch for it, so it crashes with a NameError; hairci wires it
        # as SimCLR + s2r2_loss over the two views (the same pairing SHAM uses
        # for its `--S2R2` flag, `pretrain_engine.py:98-99`).
        self.s2r2_weight = s2r2_weight
        self.transform = transform or simclr_transform(img_size)
        self.tx = make_optimizer(learning_rate, weight_decay, betas)
        self.img_size = img_size

    def create_state(self, rng, sample_images) -> TrainState:
        views = self.transform(jax.random.key(0), sample_images)
        variables = self.module.init(rng, views[0], train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            tx=self.tx,
        )

    def train_step(
        self, state: TrainState, batch, rng
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        images = batch["image"] if isinstance(batch, dict) else batch
        k_aug, _ = jax.random.split(rng)
        v0, v1 = self.transform(k_aug, images)

        def loss_fn(params):
            both = jnp.concatenate([v0, v1], axis=0)
            out, updates = self.module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                both, train=True, mutable=["batch_stats"],
            )
            z0, z1 = jnp.split(out, 2, axis=0)
            loss = nt_xent_loss(z0, z1, self.temperature)
            if self.s2r2_weight > 0:
                from hairci.losses import s2r2_loss

                loss = loss + self.s2r2_weight * s2r2_loss(out, k_views=2)
            return loss, updates.get("batch_stats", state.batch_stats)

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, batch_stats=new_bs)
        return new_state, {"loss": loss}

    def extract_features(self, state: TrainState, images) -> jnp.ndarray:
        x = knn_transform(images, self.img_size)
        return self.module.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False, method=self.module.extract_features,
        )

"""SHAM / HSimCLR recipe — the paper's method, TPU-native.

Reference parity map:
  - model `SHAM2` (`/root/reference/HairPretraining/src/main_backbone.py:565-637`):
    backbone + SimCLRProjectionHead + frozen momentum copies, with
    forward / forward_momentum / extract_features / extract_features_ema.
    Projection dims: resnet18 (512,512,128), resnet50 (2048,2048,1024),
    vit_b_16 (768,768,512) (`main_backbone.py:571-586`).
  - training step `train_one_epoch_SHAM` (`src/pretrain_engine.py:602-757`):
    per-batch EMA update; staged negative mining (random derangement during
    warm-up → k-th-nearest-neighbor indices from EMA features mined once at
    the warm-up boundary, cached per batch and reused);
    loss = NTXent(pos, anchor) + 0.5·Triplet(margin 0.7→0.5) +
    0.2·MSE(pos, masked_pos via momentum branch); grad-clip 1.0; ablations.
  - negative samplers (`src/neg_sampling.py:10-53`).

TPU redesign decisions:
  - EMA copies live in `TrainState.ema_params/ema_batch_stats` pytrees and
    are updated inside the jitted step (one fused tree-map, no module
    surgery).
  - The mined index cache is a (num_batches, B) device array in
    `TrainState.neg_indices` — checkpointed with the state, FIXING the
    reference's resume gap (`pretrain_engine.py:169-171` never restores it).
  - Epoch staging is host-side; the jitted step takes a static ``stage``
    ("warmup" | "mine" | "mined") → exactly three compiled variants.
  - The 4 backbone passes are batched into ONE forward of 3B rows for the
    online branch (negatives/positives/anchors concatenated) so the MXU sees
    a 3× bigger matmul batch, plus one momentum pass.
  - positive_transform (rotate±15 + blur) and the hair-patch masking run
    on device inside the step (the reference loops per image in Python).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hairci.aug.pipelines import (
    MultiViewTransform,
    knn_transform,
    positive_masking_transform,
    positive_transform,
    simclr_transform,
)
from hairci.eval.features import l2_normalize
from hairci.losses import (
    margin_violation_stats,
    nt_xent_loss,
    triplet_margin_loss,
)
from hairci.models import build_backbone
from hairci.models.heads import MLPHead
from hairci.ssl.base import backbone_features, register_recipe
from hairci.train.optim import make_optimizer
from hairci.train.state import TrainState, ema_update

_PROJ_DIMS = {
    "resnet18": (512, 512, 128),
    "resnet50": (2048, 2048, 1024),
    "vit_b_16": (768, 768, 512),
    "vit_base_patch16": (768, 768, 512),
}


class SHAMModule(nn.Module):
    """Online branch: backbone + projection head (the momentum branch reuses
    the same module with the EMA param pytree)."""

    backbone_name: str = "resnet18"
    img_size: int = 224
    dtype: Any = jnp.float32
    # ViT remat mode (models/vit.py): the SHAM step runs 3 grad-carrying
    # backbone passes; without block remat the saved attention matrices
    # alone are 3B·H·N² per block (~21 GB f32 for ViT-B at bs 256) — OOM
    # on a 16 GB chip, hence full remat by default. "selective" recomputes
    # only the attention matrices — the faster setting when the per-chip
    # batch is small (multi-chip DP); "half" remats every other block
    # (~1/6 extra FLOPs vs full's ~1/3) where 6 blocks' saved activations
    # fit. ResNets ignore this (conv residuals are the activations
    # themselves).
    remat: Any = True

    def setup(self):
        name = ("vit_base_patch16" if self.backbone_name == "vit_b_16"
                else self.backbone_name)
        kw = {}
        if name.startswith("vit"):
            kw["remat"] = self.remat
        self.backbone = build_backbone(
            name, img_size=self.img_size, dtype=self.dtype, **kw)
        _, hidden, out = _PROJ_DIMS[self.backbone_name]
        self.projection_head = MLPHead(
            [(hidden, True, True), (out, True, False)], dtype=self.dtype)

    def __call__(self, x, train: bool = True):
        f = backbone_features(self.backbone, x, train)
        return self.projection_head(f, train=train)

    def extract_features(self, x, train: bool = False):
        return backbone_features(self.backbone, x, train)


def derangement(key: jax.Array, batch: int) -> jnp.ndarray:
    """`NegSamplerRandomly` parity (`neg_sampling.py:10-23`): random
    permutation with self-matches shifted by one."""
    perm = jax.random.permutation(key, batch)
    idx = jnp.arange(batch)
    return jnp.where(perm == idx, (perm + 1) % batch, perm)


def kth_neighbor_indices(features: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """`NegSamplerStatic` parity (`neg_sampling.py:26-53`): cosine-sim matrix
    over EMA features, per-row sort descending, return the k-th most similar
    index (1-based; k=1 is self)."""
    z = l2_normalize(features, eps=1e-8)
    sim = jnp.einsum("id,jd->ij", z, z, preferred_element_type=jnp.float32)
    order = jnp.argsort(-sim, axis=1)  # descending, index-stable
    k0 = jnp.clip(k - 1, 0, features.shape[0] - 1)
    return jax.lax.dynamic_index_in_dim(order.T, k0, axis=0, keepdims=False)


@register_recipe("SHAM")
class SHAMRecipe:
    def __init__(
        self,
        backbone: str = "resnet18",
        img_size: int = 224,
        temperature: float = 0.5,
        learning_rate: float = 1e-3,
        weight_decay: float = 0.0,
        betas=(0.9, 0.999),
        ema_momentum: float = 0.99,
        warm_up_epochs: int = 10,
        margin_stage1: float = 0.7,
        margin_stage2: float = 0.5,
        triplet_w: float = 0.5,
        mse_w: float = 0.2,
        ablation: str = "None",
        num_batches: int = 1,
        dtype: Any = jnp.float32,
        transform: Optional[MultiViewTransform] = None,
        mask_ratio_range: Tuple[float, float] = (0.1, 0.5),
        s2r2_weight: float = 0.0,
        remat: Any = True,
    ):
        # `--S2R2` adds the Smooth-AP regularizer; the reference constructs
        # S2R2Loss(tau=0.01, k_views=3) for it (`pretrain_engine.py:99`) —
        # the 3 views are [anchor; positive; negative]
        # Trainer instantiates PositiveMaskingTransform(mask_ratio_range=
        # (0.1, 0.5)) (`pretrain_engine.py:100`); fixed-margin ablations pin
        # both stages (`pretrain_engine.py:102-104`)
        if ablation == "fixed_margin_0_7":
            margin_stage1 = margin_stage2 = 0.7
        elif ablation == "fixed_margin_0_5":
            margin_stage1 = margin_stage2 = 0.5
        self.module = SHAMModule(backbone_name=backbone, img_size=img_size,
                                 dtype=dtype, remat=remat)
        self.temperature = temperature
        self.ema_momentum = ema_momentum
        self.warm_up_epochs = warm_up_epochs
        self.margin_stage1 = margin_stage1
        self.margin_stage2 = margin_stage2
        self.triplet_w = triplet_w
        self.mse_w = mse_w
        self.ablation = ablation
        self.num_batches = num_batches
        self.img_size = img_size
        self.mask_ratio_range = tuple(mask_ratio_range)
        self.s2r2_weight = s2r2_weight
        # SHAM uses the SimCLR two-view transform (`mainpretrain.py:130`)
        self.transform = transform or simclr_transform(img_size)
        self.tx = make_optimizer(learning_rate, weight_decay, betas,
                                 grad_clip=1.0)

    # ------------------------------------------------------------------
    def create_state(self, rng, sample_images) -> TrainState:
        views = self.transform(jax.random.key(0), sample_images)
        variables = self.module.init(rng, views[0], train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        B = sample_images.shape[0]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            tx=self.tx,
            ema_params=params,
            ema_batch_stats=batch_stats,
            neg_indices=jnp.zeros((self.num_batches, B), jnp.int32),
        )

    # ------------------------------------------------------------------
    def _apply(self, params, batch_stats, x, train, mutable):
        return self.module.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=train,
            mutable=mutable)

    def train_step(
        self,
        state: TrainState,
        batch,
        rng,
        stage: str = "warmup",          # static: warmup | mine | mined
        batch_id: jnp.ndarray | int = 0,  # traced
        k: jnp.ndarray | int = 7,         # traced (mine stage only)
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        images = batch["image"] if isinstance(batch, dict) else batch
        B = images.shape[0]
        k_aug, k_neg, k_pt, k_mask = jax.random.split(rng, 4)

        # two SimCLR views: anchor + pos1 (CustomDataset our_method=True,
        # `utils/dataloader.py:36-38`)
        x_anchor, x_pos1 = self.transform(k_aug, images)

        # per-batch EMA update BEFORE forward (`pretrain_engine.py:621-622`)
        ema_params = ema_update(state.ema_params, state.params,
                                self.ema_momentum)
        ema_bs = ema_update(state.ema_batch_stats, state.batch_stats,
                            self.ema_momentum)
        state = state.replace(ema_params=ema_params, ema_batch_stats=ema_bs)

        # ---------------- negative selection (staged) ----------------
        if stage == "warmup":
            neg_idx = derangement(k_neg, B)
            margin = self.margin_stage1
        elif stage == "mine":
            feats = self.module.apply(
                {"params": state.ema_params,
                 "batch_stats": state.ema_batch_stats},
                x_pos1, train=False, method=self.module.extract_features)
            neg_idx = kth_neighbor_indices(feats, jnp.asarray(k))
            state = state.replace(neg_indices=jax.lax.dynamic_update_index_in_dim(
                state.neg_indices, neg_idx.astype(jnp.int32), batch_id, axis=0))
            margin = self.margin_stage2
        elif stage == "mined":
            neg_idx = jax.lax.dynamic_index_in_dim(
                state.neg_indices, batch_id, axis=0, keepdims=False)
            margin = self.margin_stage2
        else:
            raise ValueError(f"unknown stage {stage!r}")

        negative_samples = jnp.take(x_pos1, neg_idx, axis=0)

        # positive transform + masking (`pretrain_engine.py:684-696`)
        if self.ablation == "No_pos_transform":
            pos_samples = x_pos1
        else:
            pos_samples = positive_transform(k_pt, x_pos1)
        if self.ablation == "No masked positive":
            masked_pos = pos_samples
        else:
            masked_pos = positive_masking_transform(
                k_mask, pos_samples, mask_ratio_range=self.mask_ratio_range)

        def loss_fn(params):
            # one fused online forward over [neg; pos; anchor] (3B rows)
            stacked = jnp.concatenate(
                [negative_samples, pos_samples, x_anchor], axis=0)
            out, updates = self._apply(params, state.batch_stats, stacked,
                                       True, ["batch_stats"])
            neg_b, pos_b, anchor_b = jnp.split(out, 3, axis=0)
            # momentum branch, no grad (`pretrain_engine.py:694-696`)
            masked_b = self._apply(
                jax.lax.stop_gradient(state.ema_params),
                state.ema_batch_stats, masked_pos, False, False)

            neg_b = l2_normalize(neg_b)
            pos_b = l2_normalize(pos_b)
            anchor_b = l2_normalize(anchor_b)
            masked_b = l2_normalize(masked_b)

            contrastive = nt_xent_loss(pos_b, anchor_b, self.temperature)
            triplet = triplet_margin_loss(anchor_b, pos_b, neg_b, margin)
            mse = jnp.mean(jnp.square(pos_b - jax.lax.stop_gradient(masked_b)))

            if self.ablation == "No_Triplet":
                total = contrastive + self.mse_w * mse
            elif self.ablation == "No_MSE":
                total = contrastive + self.triplet_w * triplet
            else:
                total = (contrastive + self.triplet_w * triplet
                         + self.mse_w * mse)
            if self.s2r2_weight > 0:
                from hairci.losses import s2r2_loss

                emb = jnp.concatenate([anchor_b, pos_b, neg_b], axis=0)
                total = total + self.s2r2_weight * s2r2_loss(
                    emb, tau=0.01, k_views=3)

            pos_d, neg_d, violations = margin_violation_stats(
                jax.lax.stop_gradient(anchor_b),
                jax.lax.stop_gradient(pos_b),
                jax.lax.stop_gradient(neg_b), margin)
            aux = {
                "loss": total,
                "contrastive_loss": contrastive,
                "triplet_loss": triplet,
                "mse_loss": mse,
                "pos_dist": pos_d,
                "neg_dist": neg_d,
                "margin_violations": violations,
                "batch_stats": updates.get("batch_stats", state.batch_stats),
            }
            return total, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_bs = aux.pop("batch_stats")
        new_state = state.apply_gradients(grads, batch_stats=new_bs)
        return new_state, aux

    # ------------------------------------------------------------------
    def extract_features(self, state: TrainState, images) -> jnp.ndarray:
        x = knn_transform(images, self.img_size)
        return self.module.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False, method=self.module.extract_features)

    def extract_features_ema(self, state: TrainState, images) -> jnp.ndarray:
        x = knn_transform(images, self.img_size)
        return self.module.apply(
            {"params": state.ema_params, "batch_stats": state.ema_batch_stats},
            x, train=False, method=self.module.extract_features)

    @staticmethod
    def adapt_k(prev_margin_violations: float, batch_size: int) -> int:
        """k adaptation at the warm-up boundary (`pretrain_engine.py:637-643`):
        v = violations/B; k = max(2, round((1-v)*10))."""
        v = prev_margin_violations / batch_size
        return max(2, round((1.0 - v) * 10))

    def stage_for_epoch(self, epoch: int) -> str:
        """Staging schedule (`pretrain_engine.py:629-655`, 1-based epoch+1
        comparisons)."""
        if self.ablation == "randomly":
            return "warmup"
        if self.warm_up_epochs > epoch + 1:
            return "warmup"
        if epoch + 1 == self.warm_up_epochs:
            return "mine"
        return "mined"

"""DINOv2 recipe — reference `DINOv2`
(`/root/reference/HairPretraining/src/backbone.py:1021-1109`: timm ViT-S
student/teacher + DINO head + iBOT head) trained per
`src/pretrain_engine.py:402-512`:
  - 2 global views (blockwise-masked for the student) + local views,
  - DINO CE on cls tokens + iBOT CE on masked patches + 0.1·KoLeo,
  - teacher-temp linear warmup 0.04→0.07, weight-decay cosine 0.04→0.4,
  - teacher momentum cosine 0.992→1.0, per-step.

Centers for the DINO and iBOT losses live in `TrainState.extra` and are
updated in the jitted step (global-batch mean under jit replaces the
reference's `dist.all_reduce` centering).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hairci.aug.pipelines import MultiViewTransform, dino_transform, knn_transform
from hairci.losses import dino_loss, koleo_loss
from hairci.models.heads import DINOHead
from hairci.models.masking import random_block_mask
from hairci.models.vit import build_vit
from hairci.ssl.base import register_recipe
from hairci.train.optim import make_optimizer
from hairci.train.schedules import cosine_schedule, linear_warmup_schedule
from hairci.train.state import TrainState, ema_update


class DINOv2Module(nn.Module):
    backbone_name: str = "vit_small_patch16"
    img_size: int = 224
    head_out: int = 65536
    bottleneck: int = 256
    # reference default: the iBOT head IS the DINO head
    # (`backbone.py:1070-1076` ibot_separate_head=False)
    ibot_separate_head: bool = False
    dtype: Any = jnp.float32
    # 10 views/step: full block remat keeps bs-256 single-chip in HBM;
    # "selective" (recompute only attention matrices) and "half" (remat
    # every other block) are faster where the per-chip batch is small
    # (multi-chip DP) — see models/vit.py remat
    remat: Any = True

    def setup(self):
        self.backbone = build_vit(self.backbone_name, img_size=self.img_size,
                                  dtype=self.dtype, init_values=1e-5,
                                  remat=self.remat)
        self.dino_head = DINOHead(out_dim=self.head_out,
                                  bottleneck=self.bottleneck,
                                  dtype=self.dtype)
        if self.ibot_separate_head:
            self.ibot_head = DINOHead(out_dim=self.head_out,
                                      bottleneck=self.bottleneck,
                                      dtype=self.dtype)
        else:
            self.ibot_head = self.dino_head

    def forward_tokens(self, x, train: bool = True, token_mask=None):
        # token_mask: iBOT corruption — the STUDENT's global views are
        # blockwise-masked (`pretrain_engine.py:436-437` forward_student
        # with mask); the teacher always sees clean inputs
        return self.backbone(x, train=train, token_mask=token_mask)

    def cls_logits(self, cls_tokens, train: bool = True):
        return self.dino_head(cls_tokens, train=train)

    def patch_logits(self, patch_tokens, train: bool = True):
        return self.ibot_head(patch_tokens, train=train)

    def extract_features(self, x, train: bool = False):
        return self.backbone(x, train=train, pool=True)


@register_recipe("dinov2")
class DINOv2Recipe:
    def __init__(
        self,
        backbone: str = "vit_small_patch16",
        img_size: int = 224,
        local_size: int = 96,
        n_local: int = 8,
        head_out: int = 65536,
        learning_rate: float = 1e-3,
        weight_decay: float = 0.04,
        betas=(0.9, 0.999),
        mask_ratio: float = 0.3,
        dtype: Any = jnp.bfloat16,
        transform: Optional[MultiViewTransform] = None,
        epochs: int = 100,
        steps_per_epoch: int = 100,
        koleo_weight: float = 0.1,
        remat: Any = True,
        **_unused,
    ):
        if backbone in ("resnet18", "resnet50", "vit_b_16"):
            backbone = "vit_small_patch16"  # DINOv2() is ViT-S (`backbone.py:1021`)
        self.module = DINOv2Module(backbone_name=backbone, img_size=img_size,
                                   head_out=head_out, dtype=dtype,
                                   remat=remat)
        self.img_size = img_size
        self.head_out = head_out
        self.mask_ratio = mask_ratio
        self.epochs = epochs
        self.steps_per_epoch = steps_per_epoch
        # 0.1·KoLeo like the reference DINOv2 head loss; exposed because
        # KoLeo's nearest-neighbor min is numerically degenerate at init
        # (LayerScale 1e-5 leaves all cls embeddings almost tied), which
        # equivalence tests must exclude (tests/test_dp_equivalence.py)
        self.koleo_weight = koleo_weight
        from hairci.models.vit import VIT_CONFIGS

        p, d, _, _ = VIT_CONFIGS[backbone]
        self.grid = img_size // p
        self.embed_dim = d
        # static upper bound on masked tokens per image, mirroring
        # random_block_mask's construction (k coarse blocks of block^2
        # patches, cropped to the grid) — lets the iBOT path gather masked
        # tokens into a fixed-shape array instead of running the 65536-way
        # head on every patch (which materializes a (2B, N, 65536) f32
        # tensor: 26 GB at B=256 — OOM on a 16 GB chip)
        block = max(min(4, self.grid // 2), 1)
        coarse = max(-(-self.grid // block), 1)
        k_blocks = max(int(round(mask_ratio * coarse * coarse)), 1)
        self.n_masked = min(k_blocks * block * block, self.grid * self.grid)
        self.ibot_chunk_rows = 16
        # reference crop scales (`mainpretrain.py:109-116`)
        self.transform = transform or dino_transform(img_size, local_size,
                                                     n_local)
        self.tx = make_optimizer(learning_rate, weight_decay, betas)

    # schedules (`pretrain_engine.py:450-509`)
    def teacher_temp(self, global_step: int) -> float:
        total = self.epochs * self.steps_per_epoch
        warmup = int(30 / max(self.epochs, 1) * total)
        return linear_warmup_schedule(global_step, warmup, 0.04, 0.07)

    def momentum(self, global_step: int) -> float:
        total = self.epochs * self.steps_per_epoch
        return cosine_schedule(global_step, total, 0.992, 1.0)

    def create_state(self, rng, sample_images) -> TrainState:
        views = self.transform(jax.random.key(0), sample_images)
        variables = self.module.init(rng, views[0], train=True,
                                     method=self.module.forward_tokens)
        tokens = jnp.zeros((2, 5, self.embed_dim))
        v2 = self.module.init(jax.random.fold_in(rng, 1), tokens[:, 0],
                              method=self.module.cls_logits)
        v3 = self.module.init(jax.random.fold_in(rng, 2), tokens,
                              method=self.module.patch_logits)
        params = {**variables["params"], **v2["params"], **v3["params"]}
        extra = {
            "dino_center": jnp.zeros((1, self.head_out), jnp.float32),
            "ibot_center": jnp.zeros((self.head_out,), jnp.float32)[None],
        }
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params, batch_stats={},
            opt_state=self.tx.init(params), tx=self.tx,
            ema_params=params, ema_batch_stats={}, extra=extra)

    def train_step(self, state: TrainState, batch, rng,
                   teacher_temp: float | jnp.ndarray = 0.04,
                   momentum: float | jnp.ndarray = 0.992,
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        images = batch["image"] if isinstance(batch, dict) else batch
        k_aug, k_mask = jax.random.split(rng)
        views = self.transform(k_aug, images)
        g1, g2 = views[0], views[1]
        locals_ = views[2:]
        B = images.shape[0]
        grid = self.grid
        block_mask = random_block_mask(k_mask, 2 * B, grid, self.mask_ratio)

        def loss_fn(params):
            glob = jnp.concatenate([g1, g2], axis=0)  # (2B, ...)
            # teacher forward on global views
            t_tokens = self.module.apply(
                {"params": state.ema_params}, glob, train=False,
                method=self.module.forward_tokens)
            t_cls = jax.lax.stop_gradient(t_tokens[:, 0])
            t_patch = jax.lax.stop_gradient(t_tokens[:, 1:])
            t_cls_out = self.module.apply({"params": state.ema_params},
                                          t_cls, method=self.module.cls_logits)
            # student forward on MASKED global views (iBOT corruption)
            s_tokens = self.module.apply({"params": params}, glob, train=True,
                                         token_mask=block_mask,
                                         method=self.module.forward_tokens)
            s_cls_g = s_tokens[:, 0]
            s_patch = s_tokens[:, 1:]
            s_cls_out_g = self.module.apply({"params": params}, s_cls_g,
                                            method=self.module.cls_logits)
            # iBOT: gather the (statically-bounded) masked positions before
            # the 65536-way head — the head + CE never see unmasked tokens
            mask_i = block_mask.reshape(2 * B, grid * grid).astype(jnp.int32)
            w_m, idx = jax.lax.top_k(mask_i, self.n_masked)  # masked first
            t_m = jnp.take_along_axis(t_patch, idx[..., None], axis=1)
            s_m = jnp.take_along_axis(s_patch, idx[..., None], axis=1)
            loc = jnp.concatenate(locals_, axis=0)
            s_tokens_l = self.module.apply({"params": params}, loc, train=True,
                                           method=self.module.forward_tokens)
            s_cls_out_l = self.module.apply(
                {"params": params}, s_tokens_l[:, 0],
                method=self.module.cls_logits)

            t_chunks = tuple(jnp.split(t_cls_out, 2, axis=0))
            s_chunks = tuple(jnp.split(s_cls_out_g, 2, axis=0)) + tuple(
                jnp.split(s_cls_out_l, len(locals_), axis=0))
            d_loss, new_dino_center = dino_loss(
                t_chunks, s_chunks, state.extra["dino_center"],
                teacher_temp=teacher_temp)
            i_loss, new_ibot_center = self._ibot_loss_chunked(
                params, state.ema_params, t_m, s_m,
                w_m.astype(jnp.float32), state.extra["ibot_center"],
                teacher_temp)
            k_loss = self.koleo_weight * sum(koleo_loss(t) for t in
                                             jnp.split(s_cls_g, 2, axis=0))
            total = d_loss + i_loss + k_loss
            aux = {
                "loss": total, "dino_loss": d_loss, "ibot_loss": i_loss,
                "koleo_loss": k_loss,
                "extra": {"dino_center": new_dino_center,
                          "ibot_center": new_ibot_center},
            }
            return total, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        extra = aux.pop("extra")
        new_state = state.apply_gradients(grads, extra=extra)
        # teacher momentum update AFTER the optimizer step
        # (`pretrain_engine.py:503-509`)
        new_state = new_state.replace(
            ema_params=ema_update(new_state.ema_params, new_state.params,
                                  momentum))
        return new_state, aux

    def _ibot_loss_chunked(self, params, ema_params, t_m, s_m, w, center,
                           teacher_temp, student_temp: float = 0.1,
                           center_momentum: float = 0.9):
        """iBOT masked-patch CE (lightly IBOTPatchLoss semantics) streamed
        over row chunks.

        t_m/s_m are masked-position backbone tokens (R, M, D), w (R, M) is
        1 for real masked tokens / 0 for padding. The 65536-prototype head
        + softmax CE run per chunk under `jax.checkpoint` inside `lax.map`,
        so neither forward nor backward ever materializes the full
        (R, M, 65536) logits; per-chunk peak is chunk_rows*M*65536 f32.
        Numerically identical to the unchunked loss (same masked set, same
        centering) up to fp summation order."""
        rows = self.ibot_chunk_rows
        R = t_m.shape[0]
        n_chunks = -(-R // rows)
        pad = n_chunks * rows - R
        if pad:
            t_m = jnp.pad(t_m, ((0, pad), (0, 0), (0, 0)))
            s_m = jnp.pad(s_m, ((0, pad), (0, 0), (0, 0)))
            w = jnp.pad(w, ((0, pad), (0, 0)))
        t_c = t_m.reshape(n_chunks, rows, *t_m.shape[1:])
        s_c = s_m.reshape(n_chunks, rows, *s_m.shape[1:])
        w_c = w.reshape(n_chunks, rows, -1)

        @jax.checkpoint
        def chunk(args):
            t, s, wc = args
            t_out = jax.lax.stop_gradient(self.module.apply(
                {"params": ema_params}, t, method=self.module.patch_logits))
            s_out = self.module.apply({"params": params}, s,
                                      method=self.module.patch_logits)
            tp = jax.nn.softmax((t_out - center) / teacher_temp, axis=-1)
            sl = jax.nn.log_softmax(s_out / student_temp, axis=-1)
            ce = -jnp.sum(tp * sl, axis=-1)  # (rows, M)
            return (jnp.sum(ce * wc), jnp.sum(wc),
                    jnp.sum(t_out * wc[..., None], axis=(0, 1)))

        ce_sum, w_sum, t_sum = jax.lax.map(chunk, (t_c, s_c, w_c))
        total_w = jnp.maximum(jnp.sum(w_sum), 1.0)
        loss = jnp.sum(ce_sum) / total_w
        batch_center = (jnp.sum(t_sum, axis=0) / total_w)[None]
        new_center = (center * center_momentum
                      + batch_center * (1 - center_momentum))
        return loss, jax.lax.stop_gradient(new_center)

    def extract_features(self, state: TrainState, images) -> jnp.ndarray:
        x = knn_transform(images, self.img_size)
        return self.module.apply({"params": state.params}, x, train=False,
                                 method=self.module.extract_features)

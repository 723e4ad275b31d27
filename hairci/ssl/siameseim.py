"""SiameseIM recipe — reference `SiameseIMViT`
(`/root/reference/HairPretraining/src/backbone.py:1217-1719`):
  - online ViT encoder on a blockwise-masked view (`forward_sim`,
    `backbone.py:1563-1584`),
  - online projector = ``decoder_embed`` + ``projector_decoder_blocks`` at
    the decoder width (`backbone.py:1584-1588`) — gradient-trained, because
    the predictor consumes its output,
  - predictor = visible tokens (+ fixed sincos decoder pos-embeds) and mask
    tokens at the OTHER view's patch positions (relative sincos embeds
    through ``decoder_pos_mlp``), run through ``predictor_decoder_blocks``
    and ``decoder_pred`` (`backbone.py:1590-1612`),
  - momentum branch (`mm_*` modules, `mm_update` at `backbone.py:1461-1490`):
    EMA copies of encoder AND of the gradient-trained projector; the target
    is the momentum projector's patch tokens (`backbone.py:1614-1632`),
  - UniGrad loss in the reference form (`compute_unigrad_loss`,
    `backbone.py:1642-1660`): student/teacher standardization, squared-error
    positive term, target-correlation negative term all-reduced across
    replicas (the global-batch correlation under jit reproduces that
    collective), `(pos + neg_weight*neg)/dim` scaling.

Blockwise masking is gated like `--with_blockwise_mask`
(`scripts/train_hair_repsentation.sh`). Projector/predictor block norms
default to PermuteBN like the reference's `norm_layer if use_*_ln else
PermuteBN` with store_true flags (`backbone.py:1280-1292`);
``block_norm="ln"`` selects the `use_*_ln` variant.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hairci.aug import ops
from hairci.aug.pipelines import knn_transform
from hairci.losses import unigrad_loss
from hairci.models.masking import mask_to_ids_keep, random_block_mask
from hairci.models.vit import Block, build_vit, get_2d_sincos_pos_embed
from hairci.ssl.base import register_recipe
from hairci.train.optim import make_optimizer
from hairci.train.schedules import cosine_schedule
from hairci.train.state import TrainState, ema_update


def sim_two_view_transform(key: jax.Array, x: jnp.ndarray, size: int = 224):
    """SiameseIM aug (`DataAugmentationForSIM`, `transform.py:421-466`):
    per-view RRC (params returned) + flip + color jitter + blur + normalize.
    Returns (v1, v2, boxes1, boxes2)."""
    x = ops.to_float(x)
    ks = jax.random.split(key, 8)
    v1, b1 = ops.random_resized_crop_with_params(ks[0], x, size,
                                                 scale=(0.2, 1.0))
    v2, b2 = ops.random_resized_crop_with_params(ks[1], x, size,
                                                 scale=(0.2, 1.0))
    v1 = ops.color_jitter(ks[2], v1, 0.4, 0.4, 0.2, 0.1, p=0.8)
    v2 = ops.color_jitter(ks[3], v2, 0.4, 0.4, 0.2, 0.1, p=0.8)
    v1 = ops.gaussian_blur(ks[4], v1, 23, (0.1, 2.0), p=0.5)
    v2 = ops.gaussian_blur(ks[5], v2, 23, (0.1, 2.0), p=0.5)
    return ops.normalize(v1), ops.normalize(v2), b1, b2


def relative_pos_embed(boxes_src: jnp.ndarray, boxes_tgt: jnp.ndarray,
                       grid: int, dim: int) -> jnp.ndarray:
    """Sin-cos embeddings of the TARGET view's patch centers expressed in the
    SOURCE view's crop frame (B, grid*grid, dim) — the
    `get_2d_sincos_pos_embed_relative` input to `decoder_pos_mlp`
    (`backbone.py:1592-1594`; the helper itself lives in the external
    SiameseIM repo)."""
    # patch centers in [0,1] of the target crop
    centers = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid
    cy, cx = jnp.meshgrid(centers, centers, indexing="ij")
    cy = cy.reshape(-1)  # (N,)
    cx = cx.reshape(-1)

    def one(bs, bt):
        top_s, left_s, h_s, w_s = bs
        top_t, left_t, h_t, w_t = bt
        # absolute coords of target patch centers
        ay = top_t + cy * h_t
        ax = left_t + cx * w_t
        # express in source-crop units of patches
        ry = (ay - top_s) / h_s * grid
        rx = (ax - left_s) / w_s * grid
        return ry, rx

    ry, rx = jax.vmap(one)(boxes_src, boxes_tgt)  # (B, N)
    half = dim // 2
    omega = 1.0 / 10000 ** (jnp.arange(half // 2, dtype=jnp.float32)
                            / (half / 2.0))
    def enc(v):
        out = v[..., None] * omega  # (B, N, half/2)
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)

    return jnp.concatenate([enc(ry), enc(rx)], axis=-1)


class SiameseIMModule(nn.Module):
    backbone_name: str = "vit_base_patch16"
    img_size: int = 224
    decoder_dim: int = 512
    decoder_num_heads: int = 16
    projector_depth: int = 2
    predictor_depth: int = 4
    block_norm: str = "permute_bn"  # reference default: `norm_layer if
    # args.use_proj_ln/use_pred_ln else PermuteBN` with store_true flags
    # (`backbone.py:1280-1292`) -> PermuteBN; "ln" = the use_*_ln variant
    dtype: Any = jnp.float32

    def setup(self):
        # no final encoder LayerNorm — `forward_sim` never applies one
        # (`backbone.py:1578-1584`; `extract_features` at `:1699-1719`
        # returns the raw cls)
        self.encoder = build_vit(self.backbone_name, img_size=self.img_size,
                                 final_norm=False, dtype=self.dtype)
        self.decoder_embed = nn.Dense(self.decoder_dim, dtype=self.dtype)
        self.projector_blocks = [
            Block(self.decoder_num_heads, dtype=self.dtype,
                  norm=self.block_norm)
            for _ in range(self.projector_depth)]
        self.predictor_blocks = [
            Block(self.decoder_num_heads, dtype=self.dtype,
                  norm=self.block_norm)
            for _ in range(self.predictor_depth)]
        # decoder_pred: decoder_dim -> decoder_dim (`backbone.py:1289`)
        self.decoder_pred = nn.Dense(self.decoder_dim, dtype=self.dtype)
        # decoder_pos_mlp: 2*decoder_dim relative sincos -> decoder_dim
        # (`backbone.py:1301-1303`)
        self.decoder_pos_mlp = nn.Dense(self.decoder_dim, dtype=self.dtype)
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02),
            (1, 1, self.decoder_dim))

    def _project(self, tokens, train: bool = True):
        """``decoder_embed`` + projector blocks. Gradient-trained on the
        online path (`backbone.py:1584-1588`); applied with ``ema_params``
        it IS the reference's `mm_decoder_embed`/`mm_projector_decoder_blocks`
        (`backbone.py:1625-1631`) — one set of modules, two parameter trees."""
        t = self.decoder_embed(tokens)
        for blk in self.projector_blocks:
            t = blk(t, train=train)
        return t

    def _decoder_pos(self) -> jnp.ndarray:
        grid = self.img_size // self.encoder.patch_size
        return jnp.asarray(get_2d_sincos_pos_embed(
            self.decoder_dim, grid, cls_token=True))  # (N+1, dec)

    def online_forward(self, x, ids_keep, rel_pos, train: bool = True):
        """Masked encode of view1 → projector → predictor decoding at
        view2's positions. rel_pos (B, N, 2*decoder_dim) raw relative
        sincos."""
        tokens = self.encoder(x, ids_keep=ids_keep, train=train)  # (B,K+1,D)
        tokens = self._project(tokens, train=train)         # (B, K+1, dec)
        pe = self._decoder_pos().astype(tokens.dtype)
        vis_pe = jnp.take(pe[1:], ids_keep, axis=0)         # (B, K, dec)
        x2_pe = self.decoder_pos_mlp(rel_pos.astype(tokens.dtype))
        B = x.shape[0]
        N = rel_pos.shape[1]
        queries = jnp.tile(self.mask_token, (B, N, 1)).astype(tokens.dtype)
        seq = jnp.concatenate([
            tokens[:, :1] + pe[None, :1],
            tokens[:, 1:] + vis_pe,
            queries + x2_pe,
        ], axis=1)
        for blk in self.predictor_blocks:
            seq = blk(seq, train=train)
        pred = self.decoder_pred(seq[:, -N:])
        return pred.astype(jnp.float32)  # (B, N, dec)

    def target_forward(self, x, train: bool = False):
        """Full encode of view2 through the SAME encoder + projector modules
        — the caller applies this with ``ema_params`` to realize the
        reference's momentum branch (`backbone.py:1614-1632`). Returns the
        patch tokens (cls dropped)."""
        tokens = self.encoder(x, train=train)
        tokens = self._project(tokens, train=train)
        return tokens[:, 1:].astype(jnp.float32)  # (B, N, dec)

    def extract_features(self, x, train: bool = False):
        return self.encoder(x, train=train, pool=True)


@register_recipe("siameseim")
class SiameseIMRecipe:
    def __init__(
        self,
        backbone: str = "vit_base_patch16",
        img_size: int = 224,
        mask_ratio: float = 0.6,
        with_blockwise_mask: bool = True,
        learning_rate: float = 1e-3,
        weight_decay: float = 0.05,
        betas=(0.9, 0.999),
        neg_weight: float = 0.02,
        lamb: float | None = None,  # legacy alias for neg_weight
        decoder_dim: int = 512,
        decoder_num_heads: int = 16,
        projector_depth: int = 2,
        predictor_depth: int = 4,
        block_norm: str = "permute_bn",
        online_ln: bool = False,  # `args.online_ln` store_true default:
        # student_norm = Identity (`backbone.py:1289-1295`)
        dtype: Any = jnp.bfloat16,
        epochs: int = 100,
        **_unused,
    ):
        if backbone in ("resnet18", "resnet50", "vit_b_16"):
            backbone = "vit_base_patch16"  # sim_vit_base_patch16 (`backbone.py:1723`)
        self.module = SiameseIMModule(
            backbone_name=backbone, img_size=img_size,
            decoder_dim=decoder_dim, decoder_num_heads=decoder_num_heads,
            projector_depth=projector_depth, predictor_depth=predictor_depth,
            block_norm=block_norm, dtype=dtype)
        self.img_size = img_size
        self.mask_ratio = mask_ratio
        self.with_blockwise_mask = with_blockwise_mask
        self.neg_weight = neg_weight if lamb is None else lamb
        self.online_ln = online_ln
        self.block_norm = block_norm
        self.decoder_dim = decoder_dim
        self.epochs = epochs
        from hairci.models.vit import VIT_CONFIGS

        p, d, _, _ = VIT_CONFIGS[backbone]
        self.grid = img_size // p
        self.embed_dim = d
        self.tx = make_optimizer(learning_rate, weight_decay, betas)

    def momentum_for_epoch(self, epoch: int) -> float:
        return cosine_schedule(epoch, self.epochs, 0.996, 1.0)

    def _masks(self, key, B):
        grid = self.grid
        n = grid * grid
        num_keep = int(n * (1 - self.mask_ratio))
        if self.with_blockwise_mask:
            mask = random_block_mask(key, B, grid, self.mask_ratio)
            ids_keep = mask_to_ids_keep(jnp.asarray(mask), num_keep)
        else:
            from hairci.models.masking import random_token_mask

            ids_keep, _, _ = random_token_mask(key, B, n, self.mask_ratio)
        return ids_keep

    def _rel(self, b1, b2):
        return relative_pos_embed(b1, b2, self.grid, 2 * self.decoder_dim)

    def create_state(self, rng, sample_images) -> TrainState:
        v1, v2, b1, b2 = sim_two_view_transform(jax.random.key(0),
                                                sample_images, self.img_size)
        ids_keep = self._masks(jax.random.key(1), v1.shape[0])
        rel = self._rel(b1, b2)
        # online_forward reaches every module (encoder, projector, predictor,
        # heads); target_forward shares encoder+projector, so one init covers
        # the whole tree — and ema_params starts as an exact copy, matching
        # the reference's `load_state_dict` into the mm_ branch
        # (`backbone.py:1337-1367`).
        variables = self.module.init(rng, v1, ids_keep, rel, train=True,
                                     method=self.module.online_forward)
        params = variables["params"]
        # PermuteBN decoder blocks carry running stats; the mm branch gets
        # an exact copy like the reference's load_state_dict
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params), tx=self.tx,
            ema_params=params, ema_batch_stats=batch_stats)

    def train_step(self, state: TrainState, batch, rng,
                   momentum: float | jnp.ndarray = 0.996
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        images = batch["image"] if isinstance(batch, dict) else batch
        k_aug, k_mask = jax.random.split(rng)
        v1, v2, b1, b2 = sim_two_view_transform(k_aug, images, self.img_size)
        ids_keep = self._masks(k_mask, v1.shape[0])
        rel = self._rel(b1, b2)

        # mm_update BEFORE the target forward, like `forward_sim`
        # (`backbone.py:1615-1617`); running BN stats track like params
        ema_params = ema_update(state.ema_params, state.params, momentum)
        ema_bs = ema_update(state.ema_batch_stats, state.batch_stats,
                            momentum)
        state = state.replace(ema_params=ema_params, ema_batch_stats=ema_bs)

        # train=True so the mm projector's PermuteBN normalizes the target
        # with the CURRENT batch's statistics, like the reference's mm
        # blocks running in module-train mode under torch.no_grad
        # (`backbone.py:1611-1630`); the running-stat updates are discarded
        # (ema_batch_stats tracks the online stats for eval instead)
        target, _ = self.module.apply(
            {"params": state.ema_params, "batch_stats": state.ema_batch_stats},
            v2, train=True, mutable=["batch_stats"],
            method=self.module.target_forward)
        target = jax.lax.stop_gradient(target)

        def loss_fn(params):
            pred, updates = self.module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                v1, ids_keep, rel, train=True, mutable=["batch_stats"],
                method=self.module.online_forward)
            B, N, D = pred.shape
            loss = unigrad_loss(pred.reshape(B * N, D),
                                target.reshape(B * N, D), self.neg_weight,
                                online_ln=self.online_ln)
            return loss, updates.get("batch_stats", state.batch_stats)

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return (state.apply_gradients(grads, batch_stats=new_bs),
                {"loss": loss})

    def extract_features(self, state: TrainState, images) -> jnp.ndarray:
        x = knn_transform(images, self.img_size)
        return self.module.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False, method=self.module.extract_features)

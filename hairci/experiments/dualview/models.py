"""Dual-view models — parity with
`/root/reference/experiments/DualViewHair/src/models/dual_view_model.py`:

  - `HairstyleEncoder` (`:13-95`): ResNet-50 trunk → 256-d embedding head
    (Linear+BN+ReLU) → 128-d projection head (Linear+BN+ReLU+Linear+BN),
  - `DualViewHairModel` (`:98-227`): teacher (hair-only view) EMA-updated
    from student (full image); here the teacher is an EMA param tree in the
    train state rather than a deep-copied module,
  - `ContrastiveLoss` (`:230-277`): InfoNCE with diagonal positives,
  - `HairstyleRetrievalModel` (`:280-334`): cosine-similarity retrieval over
    stored embeddings (delegates to hairci.retrieval.GalleryIndex).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hairci.models.resnet import build_resnet
from hairci.retrieval.index import GalleryIndex
from hairci.train.state import TrainState, ema_update


class HairstyleEncoder(nn.Module):
    backbone_name: str = "resnet50"
    embedding_dim: int = 256
    projection_dim: int = 128
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_resnet(self.backbone_name, dtype=self.dtype)
        self.emb_fc = nn.Dense(self.embedding_dim, dtype=self.dtype)
        self.emb_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                   dtype=self.dtype, use_running_average=None)
        self.proj_fc1 = nn.Dense(self.embedding_dim, dtype=self.dtype)
        self.proj_bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype, use_running_average=None)
        self.proj_fc2 = nn.Dense(self.projection_dim, dtype=self.dtype)
        self.proj_bn2 = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype, use_running_average=None)

    def __call__(self, x, train: bool = True,
                 return_embedding: bool = False):
        f = self.backbone(x, train=train)
        e = nn.relu(self.emb_bn(self.emb_fc(f),
                                use_running_average=not train))
        if return_embedding:
            return e.astype(jnp.float32)
        z = nn.relu(self.proj_bn1(self.proj_fc1(e),
                                  use_running_average=not train))
        z = self.proj_bn2(self.proj_fc2(z), use_running_average=not train)
        return z.astype(jnp.float32)


def contrastive_loss(student_proj: jnp.ndarray, teacher_proj: jnp.ndarray,
                     temperature: float = 0.07) -> jnp.ndarray:
    """`ContrastiveLoss` parity: InfoNCE with diagonal positives."""
    s = student_proj / jnp.maximum(
        jnp.linalg.norm(student_proj, axis=-1, keepdims=True), 1e-12)
    t = teacher_proj / jnp.maximum(
        jnp.linalg.norm(teacher_proj, axis=-1, keepdims=True), 1e-12)
    logits = jnp.einsum("bd,kd->bk", s, t,
                        preferred_element_type=jnp.float32) / temperature
    labels = jnp.arange(s.shape[0])
    logprob = jax.nn.log_softmax(logits, axis=1)
    return -jnp.mean(jnp.take_along_axis(logprob, labels[:, None], axis=1))


class DualViewHairModel:
    """Teacher-student recipe: student sees the full image, teacher (EMA of
    the student) sees the hair-only crop; InfoNCE between projections."""

    def __init__(self, backbone: str = "resnet50", embedding_dim: int = 256,
                 projection_dim: int = 128, momentum: float = 0.999,
                 temperature: float = 0.07, learning_rate: float = 1e-3,
                 dtype: Any = jnp.float32, encoder: str = "resnet"):
        import optax

        if encoder == "resnet":
            self.encoder = HairstyleEncoder(backbone, embedding_dim,
                                            projection_dim, dtype)
        else:
            # enhanced encoder selection (`enhanced_model.py:17-231`)
            from hairci.experiments.dualview.enhanced import ENCODERS

            self.encoder = ENCODERS[encoder](
                backbone_name=backbone, embedding_dim=embedding_dim,
                projection_dim=projection_dim, dtype=dtype)
        self.encoder_type = encoder
        self.momentum = momentum
        self.temperature = temperature
        self.tx = optax.adam(learning_rate)

    def create_state(self, rng, sample_images) -> TrainState:
        variables = self.encoder.init(rng, sample_images, train=True)
        params = variables["params"]
        bs = variables.get("batch_stats", {})
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params, batch_stats=bs,
            opt_state=self.tx.init(params), tx=self.tx,
            ema_params=params, ema_batch_stats=bs)

    def train_step(self, state: TrainState, batch, rng
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        full = batch["full"]       # student input (B, H, W, 3) float
        hair = batch["hair"]       # teacher input

        ema_params = ema_update(state.ema_params, state.params, self.momentum)
        ema_bs = ema_update(state.ema_batch_stats, state.batch_stats,
                            self.momentum)
        state = state.replace(ema_params=ema_params, ema_batch_stats=ema_bs)

        teacher_proj = self.encoder.apply(
            {"params": state.ema_params, "batch_stats": state.ema_batch_stats},
            hair, train=False)
        teacher_proj = jax.lax.stop_gradient(teacher_proj)

        def loss_fn(params):
            student_proj, updates = self.encoder.apply(
                {"params": params, "batch_stats": state.batch_stats},
                full, train=True, mutable=["batch_stats"])
            loss = contrastive_loss(student_proj, teacher_proj,
                                    self.temperature)
            return loss, updates.get("batch_stats", state.batch_stats)

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads, batch_stats=new_bs), {"loss": loss}

    def get_embeddings(self, state: TrainState, images,
                       use_teacher: bool = False) -> jnp.ndarray:
        params = state.ema_params if use_teacher else state.params
        bs = state.ema_batch_stats if use_teacher else state.batch_stats
        return self.encoder.apply({"params": params, "batch_stats": bs},
                                  images, train=False, return_embedding=True)


class HairstyleRetrievalModel:
    """Retrieval wrapper (`dual_view_model.py:280-334`): stores normalized
    embeddings and retrieves by cosine similarity."""

    def __init__(self, model: DualViewHairModel, state: TrainState,
                 use_teacher: bool = True):
        self.model = model
        self.state = state
        self.use_teacher = use_teacher
        self.index: Optional[GalleryIndex] = None

    def build_database(self, images: np.ndarray, paths) -> GalleryIndex:
        emb = np.asarray(self.model.get_embeddings(
            self.state, jnp.asarray(images), self.use_teacher))
        self.index = GalleryIndex(emb, paths)
        return self.index

    def retrieve(self, query_images: np.ndarray, k: int = 10):
        assert self.index is not None, "call build_database first"
        q = np.asarray(self.model.get_embeddings(
            self.state, jnp.asarray(query_images), self.use_teacher))
        return self.index.search_paths(q, k)

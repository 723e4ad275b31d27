"""SSL recipe protocol.

Each recipe (simclr, sham, mae, ...) is a small object that owns its Flax
modules and exposes:

  - ``create_state(rng, sample_images) -> TrainState``
  - ``train_step(state, batch, rng) -> (TrainState, metrics dict)`` — a pure
    jittable function; the engine jits it once with shardings over the mesh.
  - ``extract_features(state, images) -> (B, D)`` — the uniform embedding API
    every reference model exposes (`backbone.py:680`, `main_backbone.py:624`).

Augmentation runs INSIDE the jitted train step (batch = raw uint8 images):
one H2D transfer per step and the whole aug+forward+backward graph fuses
under XLA — the reference pays per-sample CPU transforms in DataLoader
workers instead (`mainpretrain.py:102-144`).
"""

from __future__ import annotations

from typing import Any, Dict, Protocol, Tuple

import flax.linen as nn
import jax.numpy as jnp

from hairci.models.vit import VisionTransformer
from hairci.train.state import TrainState


def backbone_features(backbone: nn.Module, x: jnp.ndarray, train: bool):
    """Uniform pooled-feature call across ResNet/ViT backbones (inside a
    parent module's method)."""
    if isinstance(backbone, VisionTransformer):
        return backbone(x, train=train, pool=True)
    return backbone(x, train=train)


class SSLRecipe(Protocol):
    name: str

    def create_state(self, rng, sample_images) -> TrainState: ...

    def train_step(
        self, state: TrainState, batch: Any, rng
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]: ...

    def extract_features(self, state: TrainState, images) -> jnp.ndarray: ...


RECIPES: Dict[str, Any] = {}


def register_recipe(name: str):
    def deco(cls):
        RECIPES[name] = cls
        cls.name = name
        return cls
    return deco


def build_recipe(mode: str, **kwargs):
    """Factory keyed on the reference `--mode` strings
    (`mainpretrain.py:100-173`: simclr, msn, mae, denseCL, BYOL, supcon,
    dinov2, simMIM, SHAM)."""
    # import recipes lazily to register them
    from hairci import ssl as _ssl  # noqa: F401

    if mode not in RECIPES:
        raise ValueError(f"unknown mode {mode!r}; choices: {sorted(RECIPES)}")
    return RECIPES[mode](**kwargs)

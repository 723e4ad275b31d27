"""Flax ResNet backbones.

Capability parity with the reference's two ResNet families:
  - torchvision-style ImageNet ResNet-18/34/50/101 used by the SimCLR/SHAM
    recipes (`/root/reference/HairPretraining/src/backbone.py:655-662`,
    `main_backbone.py:573-580` strip the fc and use the pooled trunk), and
  - the from-scratch CIFAR-style ResNet family with `model_dict` feature dims
    (`/root/reference/HairPretraining/src/backbone.py:247-381`).

TPU-first notes:
  * NHWC layout (XLA:TPU's native conv layout).
  * BatchNorm batch statistics are computed over the *global* batch: under
    `jit` with the batch sharded on the ``data`` mesh axis, the mean/variance
    reductions become cross-replica collectives automatically — i.e. sync-BN
    for free (the reference is single-device BN).
  * `dtype` controls compute precision (bf16 on TPU); params stay f32.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from hairci.models.norm import BatchNorm

ModuleDef = Any


class BasicBlock(nn.Module):
    filters: int
    strides: Tuple[int, int]
    conv: ModuleDef
    norm: ModuleDef
    act: Callable

    @nn.compact
    def __call__(self, x):
        # explicit torch-style symmetric padding: XLA "SAME" pads
        # asymmetrically for stride 2 on even inputs, which would break
        # torch-checkpoint parity (window alignment differs)
        residual = x
        y = self.conv(self.filters, (3, 3), self.strides,
                      padding=[(1, 1), (1, 1)])(x)
        y = self.norm()(y)
        y = self.act(y)
        y = self.conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)])(y)
        y = self.norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1), self.strides,
                                 padding="VALID", name="conv_proj")(residual)
            residual = self.norm(name="norm_proj")(residual)
        return self.act(residual + y)


class BottleneckBlock(nn.Module):
    filters: int
    strides: Tuple[int, int]
    conv: ModuleDef
    norm: ModuleDef
    act: Callable

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1), padding="VALID")(x)
        y = self.norm()(y)
        y = self.act(y)
        # torchvision v1.5 puts the stride on the 3x3 conv
        y = self.conv(self.filters, (3, 3), self.strides,
                      padding=[(1, 1), (1, 1)])(y)
        y = self.norm()(y)
        y = self.act(y)
        y = self.conv(self.filters * 4, (1, 1), padding="VALID")(y)
        y = self.norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = self.conv(
                self.filters * 4, (1, 1), self.strides, padding="VALID",
                name="conv_proj",
            )(residual)
            residual = self.norm(name="norm_proj")(residual)
        return self.act(residual + y)


class ResNet(nn.Module):
    """ResNet trunk; `__call__` returns pooled (B, D) features.

    stem:
      "imagenet" — 7x7/2 conv + 3x3/2 maxpool (torchvision layout)
      "cifar"    — 3x3/1 conv, no maxpool (reference backbone.py:300-306)
    """

    stage_sizes: Sequence[int]
    block_cls: ModuleDef
    num_filters: int = 64
    stem: str = "imagenet"
    dtype: Any = jnp.float32
    act: Callable = nn.relu
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5

    @property
    def num_features(self) -> int:
        mult = 4 if self.block_cls is BottleneckBlock else 1
        return self.num_filters * (2 ** (len(self.stage_sizes) - 1)) * mult

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(
            BatchNorm,
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
        )
        x = x.astype(self.dtype)
        if self.stem == "imagenet":
            x = conv(self.num_filters, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                     name="conv_init")(x)
            x = norm(name="bn_init")(x)
            x = self.act(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        elif self.stem == "cifar":
            x = conv(self.num_filters, (3, 3), (1, 1), padding=[(1, 1), (1, 1)],
                     name="conv_init")(x)
            x = norm(name="bn_init")(x)
            x = self.act(x)
        else:
            raise ValueError(f"unknown stem {self.stem!r}")
        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = self.block_cls(
                    filters=self.num_filters * 2**i,
                    strides=strides,
                    conv=conv,
                    norm=norm,
                    act=self.act,
                )(x)
        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)

    def spatial_features(self, x, train: bool = True):
        """Unpooled (B, H, W, C) feature map (DenseCL local head input)."""
        raise NotImplementedError("use ResNetFeatures for spatial maps")


class ResNetFeatures(ResNet):
    """Variant returning (pooled, spatial) for dense/local SSL heads."""

    @nn.compact
    def __call__(self, x, train: bool = True):  # type: ignore[override]
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(
            BatchNorm,
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
        )
        x = x.astype(self.dtype)
        if self.stem == "imagenet":
            x = conv(self.num_filters, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                     name="conv_init")(x)
            x = norm(name="bn_init")(x)
            x = self.act(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        else:
            x = conv(self.num_filters, (3, 3), (1, 1), padding=[(1, 1), (1, 1)],
                     name="conv_init")(x)
            x = norm(name="bn_init")(x)
            x = self.act(x)
        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = self.block_cls(
                    filters=self.num_filters * 2**i,
                    strides=strides,
                    conv=conv,
                    norm=norm,
                    act=self.act,
                )(x)
        spatial = x.astype(jnp.float32)
        pooled = jnp.mean(spatial, axis=(1, 2))
        return pooled, spatial


_STAGES = {
    "resnet18": ([2, 2, 2, 2], BasicBlock),
    "resnet34": ([3, 4, 6, 3], BasicBlock),
    "resnet50": ([3, 4, 6, 3], BottleneckBlock),
    "resnet101": ([3, 4, 23, 3], BottleneckBlock),
}

# feature dims, mirrors reference model_dict (backbone.py:383-394)
MODEL_DICT = {
    "resnet18": 512,
    "resnet34": 512,
    "resnet50": 2048,
    "resnet101": 2048,
}


def build_resnet(
    name: str,
    stem: str = "imagenet",
    dtype: Any = jnp.float32,
    with_spatial: bool = False,
) -> ResNet:
    if name not in _STAGES:
        raise ValueError(f"unknown resnet {name!r}; choices: {sorted(_STAGES)}")
    stages, block = _STAGES[name]
    cls = ResNetFeatures if with_spatial else ResNet
    return cls(stage_sizes=stages, block_cls=block, stem=stem, dtype=dtype)

from hairci.models.resnet import (
    ResNet,
    ResNetFeatures,
    BasicBlock,
    BottleneckBlock,
    build_resnet,
    MODEL_DICT,
)
from hairci.models.vit import (
    VisionTransformer,
    build_vit,
    VIT_CONFIGS,
    get_2d_sincos_pos_embed,
    resize_pos_embed,
)
from hairci.models import heads, masking


def backbone_feature_dim(name: str) -> int:
    """Feature dim of a backbone by name (resnet* or vit_*)."""
    if name in MODEL_DICT:
        return MODEL_DICT[name]
    if name in VIT_CONFIGS:
        return VIT_CONFIGS[name][1]
    raise ValueError(f"unknown backbone {name!r}")


def build_backbone(name: str, img_size: int = 224, dtype=None, **kw):
    """Uniform backbone factory. Returns a Flax module whose feature API is
    normalized by the SSL recipes (see hairci/ssl/base.py)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    if name in MODEL_DICT:
        return build_resnet(name, dtype=dtype, **kw)
    if name in VIT_CONFIGS:
        return build_vit(name, img_size=img_size, dtype=dtype, **kw)
    raise ValueError(f"unknown backbone {name!r}")

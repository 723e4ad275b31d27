from hairci.aug import ops
from hairci.aug.hair_masking import (
    hair_patch_mask,
    mask_hair_patches,
    patch_means,
)
from hairci.aug.pipelines import (
    MultiViewTransform,
    ViewConfig,
    TRANSFORMS,
    simclr_transform,
    mae_transform,
    simmim_transform,
    byol_transform,
    densecl_transform,
    dino_transform,
    msn_transform,
    supcon_train_transform,
    positive_transform,
    positive_masking_transform,
    knn_transform,
    test_transform,
)

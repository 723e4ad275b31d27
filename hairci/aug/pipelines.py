"""Augmentation pipelines — batched, jitted equivalents of the per-sample
torchvision/lightly stacks the reference builds in
`/root/reference/HairPretraining/mainpretrain.py:102-130` and
`utils/transform.py`.

Every pipeline is a pure function ``(key, uint8/float batch) -> views`` that
can be jitted and runs on device. View counts/shapes are static.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hairci.aug import ops
from hairci.aug.hair_masking import mask_hair_patches


def _blur_kernel_size(input_size: int) -> int:
    # lightly uses kernel ≈ 0.1 * input size, odd
    k = int(0.1 * input_size)
    return k + 1 if k % 2 == 0 else max(k, 3)


@dataclasses.dataclass(frozen=True)
class ViewConfig:
    """One augmented view. Defaults = lightly SimCLRTransform view."""

    size: int = 224
    crop_scale: Tuple[float, float] = (0.08, 1.0)
    hflip_p: float = 0.5
    cj_p: float = 0.8
    cj_strength: float = 1.0
    cj_bright: float = 0.8
    cj_contrast: float = 0.8
    cj_sat: float = 0.8
    cj_hue: float = 0.2
    grayscale_p: float = 0.2
    blur_p: float = 0.5
    blur_sigma: Tuple[float, float] = (0.1, 2.0)
    blur_kernel: int | None = None  # None → lightly's 0.1*size rule
    solarize_p: float = 0.0
    normalize: bool = True

    def __call__(self, key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        x = ops.to_float(x)
        ks = jax.random.split(key, 6)
        x = ops.random_resized_crop(ks[0], x, self.size, scale=self.crop_scale)
        x = ops.random_hflip(ks[1], x, p=self.hflip_p)
        if self.cj_p > 0:
            s = self.cj_strength
            x = ops.color_jitter(
                ks[2], x, self.cj_bright * s, self.cj_contrast * s,
                self.cj_sat * s, self.cj_hue * s, p=self.cj_p)
        if self.grayscale_p > 0:
            x = ops.random_grayscale(ks[3], x, p=self.grayscale_p)
        if self.blur_p > 0:
            x = ops.gaussian_blur(
                ks[4], x, self.blur_kernel or _blur_kernel_size(self.size),
                sigma_range=self.blur_sigma, p=self.blur_p)
        if self.solarize_p > 0:
            x = ops.random_solarize(ks[5], x, p=self.solarize_p)
        if self.normalize:
            x = ops.normalize(x)
        return x


@dataclasses.dataclass(frozen=True)
class MultiViewTransform:
    """N views from N ViewConfigs (lightly MultiViewTransform shape)."""

    views: Tuple[ViewConfig, ...]

    def __call__(self, key: jax.Array, x: jnp.ndarray):
        keys = jax.random.split(key, len(self.views))
        return [v(k, x) for v, k in zip(self.views, keys)]


def simclr_transform(size: int = 224) -> MultiViewTransform:
    """lightly SimCLRTransform(input_size=size) two-view equivalent
    (`mainpretrain.py:103`)."""
    v = ViewConfig(size=size)
    return MultiViewTransform((v, v))


def mae_transform(size: int = 224) -> MultiViewTransform:
    """lightly MAETransform: RandomResizedCrop(scale=(0.2,1)) + hflip only
    (`mainpretrain.py:105`)."""
    v = ViewConfig(size=size, crop_scale=(0.2, 1.0), cj_p=0.0,
                   grayscale_p=0.0, blur_p=0.0)
    return MultiViewTransform((v,))


def simmim_transform(size: int = 224) -> MultiViewTransform:
    """SiaMIM/SimMIM transform (`transform.py:33-38`): rrc(0.2,1) bicubic +
    hflip + normalize."""
    return mae_transform(size)


def byol_transform(size: int = 224) -> MultiViewTransform:
    """lightly BYOLTransform: asymmetric blur/solarize between views."""
    v1 = ViewConfig(size=size, crop_scale=(0.08, 1.0), cj_bright=0.4,
                    cj_contrast=0.4, cj_sat=0.2, cj_hue=0.1, blur_p=1.0,
                    solarize_p=0.0)
    v2 = dataclasses.replace(v1, blur_p=0.1, solarize_p=0.2)
    return MultiViewTransform((v1, v2))


def densecl_transform(size: int = 224) -> MultiViewTransform:
    """lightly DenseCLTransform ≈ SimCLR views with 0.5 jitter strength."""
    v = ViewConfig(size=size, cj_bright=0.4, cj_contrast=0.4, cj_sat=0.4,
                   cj_hue=0.1)
    return MultiViewTransform((v, v))


def dino_transform(global_size: int = 224, local_size: int = 96,
                   n_local: int = 6) -> MultiViewTransform:
    """lightly DINOTransform: 2 global crops (second solarized) + n local
    crops (`mainpretrain.py:113-118` uses DINOTransform and MSNTransform)."""
    g1 = ViewConfig(size=global_size, crop_scale=(0.4, 1.0), cj_bright=0.4,
                    cj_contrast=0.4, cj_sat=0.2, cj_hue=0.1, blur_p=1.0)
    g2 = dataclasses.replace(g1, blur_p=0.1, solarize_p=0.2)
    loc = dataclasses.replace(g1, size=local_size, crop_scale=(0.05, 0.4),
                              blur_p=0.5)
    return MultiViewTransform((g1, g2) + (loc,) * n_local)


def msn_transform(size: int = 224, focal_size: int = 96,
                  n_focal: int = 10) -> MultiViewTransform:
    """lightly MSNTransform: 2 random views + n focal (small-crop) views."""
    v = ViewConfig(size=size, crop_scale=(0.3, 1.0), cj_bright=0.8,
                   cj_contrast=0.8, cj_sat=0.8, cj_hue=0.2, blur_p=0.5)
    f = dataclasses.replace(v, size=focal_size, crop_scale=(0.05, 0.3))
    return MultiViewTransform((v, v) + (f,) * n_focal)


def supcon_train_transform(size: int = 224,
                           mean=ops.IMAGENET_MEAN,
                           std=ops.IMAGENET_STD) -> MultiViewTransform:
    """TwoCropTransform(get_train_transform) (`transform.py:39-76`):
    hflip + RandomApply(ColorJitter(0.4,0.4,0.4,0.1), p=0.8) + resize —
    no random crop (commented out in the reference)."""

    @dataclasses.dataclass(frozen=True)
    class _SupConView:
        size: int
        mean: tuple
        std: tuple

        def __call__(self, key, x):
            x = ops.to_float(x)
            k1, k2 = jax.random.split(key)
            x = ops.random_hflip(k1, x, p=0.5)
            x = ops.color_jitter(k2, x, 0.4, 0.4, 0.4, 0.1, p=0.8)
            x = ops.resize(x, (self.size, self.size))
            return ops.normalize(x, self.mean, self.std)

    v = _SupConView(size, tuple(mean), tuple(std))
    return MultiViewTransform((v, v))


# ---------------------------------------------------------------------------
# SHAM extras (`pretrain_engine.py:602-757` inner-loop transforms)
# ---------------------------------------------------------------------------

def positive_transform(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Rotation ±15° + GaussianBlur(3, σ∈[0.1,0.5]) applied to the positive
    view inside the SHAM step (`transform.py:21-24`). Operates on the
    already-normalized batch like the reference does.

    On TPU both ops fuse into one Pallas kernel (one HBM round trip,
    `hairci/ops/rotate_pallas.py`); the RNG draws match the composed
    path exactly."""
    k1, k2 = jax.random.split(key)
    if jax.default_backend() == "tpu" and x.ndim == 4:
        import math as _math

        from hairci.ops.rotate_pallas import rotate_shear_pallas

        B = x.shape[0]
        theta = jax.random.uniform(
            k1, (B,), minval=-15.0, maxval=15.0) * (_math.pi / 180.0)
        _, k_sigma = jax.random.split(k2)  # gaussian_blur's draw order
        sigma = jax.random.uniform(k_sigma, (B,), minval=0.1, maxval=0.5)
        return rotate_shear_pallas(x, theta, max_degrees=15.0,
                                   blur_sigma=sigma)
    x = ops.random_rotate(k1, x, degrees=15.0)
    x = ops.gaussian_blur(k2, x, 3, sigma_range=(0.1, 0.5), p=1.0)
    return x


def negative_transform(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """`negative_transform` (`transform.py:26-30`, unused in the reference's
    main path but part of its surface): hflip + very mild color jitter."""
    k1, k2 = jax.random.split(key)
    x = ops.random_hflip(k1, x, p=0.5)
    return ops.color_jitter(k2, x, 0.1, 0.1, 0.1, 0.02, p=1.0)


def positive_masking_transform(
    key: jax.Array, x: jnp.ndarray, patch_size: int = 32,
    mask_ratio_range: Tuple[float, float] = (0.1, 0.2),
    threshold: float = 0.01,
) -> jnp.ndarray:
    """Vectorized PositiveMaskingTransform (`transform.py:84-150`)."""
    return mask_hair_patches(key, x, patch_size, mask_ratio_range, threshold)


# ---------------------------------------------------------------------------
# deterministic eval transform
# ---------------------------------------------------------------------------

def knn_transform(x: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """Exact `knn_transform` (`transform.py:10-14`): CenterCrop(224) +
    ToTensor + ImageNet normalize. Deterministic — this is the transform the
    kNN-parity target depends on (SURVEY.md §3.3)."""
    x = ops.to_float(x)
    x = ops.center_crop(x, size)
    return ops.normalize(x)


def test_transform(x: jnp.ndarray, size: int = 224,
                   mean=ops.IMAGENET_MEAN, std=ops.IMAGENET_STD) -> jnp.ndarray:
    """`get_test_transform` (`transform.py:63-68`): Resize + normalize."""
    x = ops.to_float(x)
    x = ops.resize(x, (size, size))
    return ops.normalize(x, mean, std)


TRANSFORMS = {
    "simclr": simclr_transform,
    "SHAM": simclr_transform,  # SHAM uses SimCLRTransform (mainpretrain.py:130)
    "mae": mae_transform,
    "simMIM": simmim_transform,
    "BYOL": byol_transform,
    "denseCL": densecl_transform,
    "dinov2": dino_transform,
    "msn": msn_transform,
    "supcon": supcon_train_transform,
}

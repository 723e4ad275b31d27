import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hairci.aug import ops, pipelines
from hairci.aug.hair_masking import hair_patch_mask, mask_hair_patches, patch_means


def test_knn_transform_exact():
    """CenterCrop(224) + /255 + ImageNet normalize, exact math."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(1, 250, 260, 3), dtype=np.uint8)
    out = np.asarray(pipelines.knn_transform(jnp.asarray(img)))
    top = int(round((250 - 224) / 2.0))
    left = int(round((260 - 224) / 2.0))
    ref = img[0, top:top + 224, left:left + 224].astype(np.float32) / 255.0
    ref = (ref - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0], ref, rtol=1e-5, atol=1e-5)


def test_center_crop_pads_small_images():
    x = jnp.ones((1, 100, 100, 3))
    out = ops.center_crop(x, 224)
    assert out.shape == (1, 224, 224, 3)


def test_random_resized_crop_shape_and_range():
    key = jax.random.key(0)
    x = jax.random.uniform(key, (4, 120, 160, 3))
    out = ops.random_resized_crop(key, x, 64)
    assert out.shape == (4, 64, 64, 3)
    assert np.asarray(out).min() >= -0.3  # antialias can ring slightly


def test_hflip_deterministic_flip():
    x = jnp.arange(2 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 4, 1)
    out = ops.random_hflip(jax.random.key(0), x, p=1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x[:, :, ::-1, :]))


def test_color_jitter_identity_at_zero_strength():
    x = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
    out = ops.color_jitter(jax.random.key(1), x, 0.0, 0.0, 0.0, 0.0, p=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_hue_rotation_invertible():
    x = jax.random.uniform(jax.random.key(0), (1, 8, 8, 3))
    y = ops.adjust_hue(x, 0.25)
    z = ops.adjust_hue(y, -0.25)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-3)


def test_grayscale_channels_equal():
    x = jax.random.uniform(jax.random.key(0), (2, 8, 8, 3))
    g = ops.rgb_to_grayscale(x)
    np.testing.assert_allclose(np.asarray(g[..., 0]), np.asarray(g[..., 1]))


def test_gaussian_blur_preserves_mean():
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    out = ops.gaussian_blur(jax.random.key(1), x, 5, (1.0, 1.0), p=1.0)
    assert out.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(out).mean(), np.asarray(x).mean(), atol=0.01)
    # blur reduces variance
    assert np.asarray(out).var() < np.asarray(x).var()


def test_rotation_zero_is_identity():
    x = jax.random.uniform(jax.random.key(0), (1, 16, 16, 3))
    out = ops.random_rotate(jax.random.key(1), x, degrees=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def _direct_rotate_nearest(img, t):
    """Direct inverse-map nearest rotation — the oracle for rotate_shear."""
    H, W, _ = img.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    cos, sin = jnp.cos(t), jnp.sin(t)
    ys = cos * (yy - cy) - sin * (xx - cx) + cy
    xs = sin * (yy - cy) + cos * (xx - cx) + cx
    yi = jnp.round(ys).astype(jnp.int32)
    xi = jnp.round(xs).astype(jnp.int32)
    valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
    vals = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
    return jnp.where(valid[..., None], vals, 0.0)


def test_rotate_shear_vs_direct_nearest():
    """3-shear rotation realizes the same map as direct nearest sampling:
    pixels agree except where composed rounding picks an adjacent source."""
    x = jax.random.uniform(jax.random.key(0), (4, 64, 64, 3))
    for deg in (10.0, -14.0):
        theta = jnp.full((4,), math.radians(deg))
        got = ops.rotate_shear(x, theta, order=0, max_degrees=15.0)
        want = jax.vmap(_direct_rotate_nearest)(x, theta)
        equal = jnp.mean(jnp.all(got == want, axis=-1))
        assert equal > 0.6, f"deg={deg}: only {equal:.2f} pixels agree"
        # differing pixels must come from the image (or fill), never garbage
        assert float(jnp.max(got)) <= float(jnp.max(x)) + 1e-6
        # interior is filled, corners are zeroed like torchvision fill=0
        assert float(jnp.mean(jnp.all(got == 0.0, axis=-1))) < 0.1


def test_rotate_shear_linear_close_to_bilinear_map():
    """order=1 shear rotation stays close to the exact bilinear rotation on
    a smooth image (gradient ramp — resampling differences are sub-pixel)."""
    H = 64
    ramp = jnp.linspace(0, 1, H)
    img = (ramp[:, None, None] * 0.5 + ramp[None, :, None] * 0.5)
    x = jnp.broadcast_to(img, (2, H, H, 1)).astype(jnp.float32)
    x = jnp.concatenate([x, x, x], axis=-1)
    theta = jnp.full((2,), math.radians(12.0))
    got = ops.rotate_shear(x, theta, order=1, max_degrees=15.0)
    # compare against the direct nearest map on the smooth ramp: any
    # resampling of the same rotation agrees to ~1 pixel of ramp slope.
    # Boundary fill regions differ by up to a pixel → compare the centre.
    oracle = jax.vmap(_direct_rotate_nearest)(x, theta)
    c = H // 4
    err = jnp.abs(got - oracle)[:, c:-c, c:-c]
    assert float(err.max()) < 2.5 / H


def test_rotate_pallas_matches_shear():
    """The fused Pallas rotation (interpret mode on CPU) is bit-identical
    to the XLA 3-shear path it replaces on TPU."""
    from unittest import mock

    from jax.experimental import pallas as pl

    from hairci.ops import rotate_pallas as rp

    x = jax.random.uniform(jax.random.key(3), (3, 32, 32, 3))
    theta = jnp.asarray([0.2, -0.25, 0.0])
    want = ops.rotate_shear(x, theta, order=0, max_degrees=15.0)
    orig = pl.pallas_call
    interp = lambda *a, **k: orig(*a, **{**k, "interpret": True})  # noqa: E731
    with mock.patch.object(rp.pl, "pallas_call", interp):
        got = rp.rotate_shear_pallas(x, theta, max_degrees=15.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_rotate_blur_fused_matches_composed():
    """rotate_shear_pallas(blur_sigma=...) == rotate_shear + gaussian_blur
    with the same per-image parameters (positive_transform's TPU fusion)."""
    import math
    from unittest import mock

    from jax.experimental import pallas as pl

    from hairci.ops import rotate_pallas as rp

    key = jax.random.key(7)
    x = jax.random.uniform(jax.random.key(0), (3, 32, 32, 3))
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, (3,), minval=-15.0, maxval=15.0) \
        * (math.pi / 180.0)
    _, ks = jax.random.split(k2)
    sigma = jax.random.uniform(ks, (3,), minval=0.1, maxval=0.5)
    want = ops.rotate_shear(x, theta, order=0, max_degrees=15.0)
    want = ops.gaussian_blur(k2, want, 3, sigma_range=(0.1, 0.5), p=1.0)
    orig = pl.pallas_call
    interp = lambda *a, **k: orig(*a, **{**k, "interpret": True})  # noqa: E731
    with mock.patch.object(rp.pl, "pallas_call", interp):
        got = rp.rotate_shear_pallas(x, theta, max_degrees=15.0,
                                     blur_sigma=sigma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_solarize():
    x = jnp.array([[[[0.2, 0.8, 0.5]]]])
    out = ops.solarize(x, 0.5)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], [0.2, 0.2, 0.5])


def test_patch_means_and_hair_mask():
    x = np.zeros((1, 64, 64, 3), dtype=np.float32)
    x[0, :32, :32] = 0.5  # hair in top-left 32x32 patch only
    pm = np.asarray(patch_means(jnp.asarray(x), 32))
    np.testing.assert_allclose(pm[0], [0.5, 0.0, 0.0, 0.0])
    hm = np.asarray(hair_patch_mask(jnp.asarray(x), 32, 0.01))
    np.testing.assert_array_equal(hm[0], [True, False, False, False])


def test_mask_hair_patches_only_masks_hair():
    rng = np.random.default_rng(0)
    x = np.zeros((8, 224, 224, 3), dtype=np.float32)
    # hair occupies left half
    x[:, :, :112] = rng.uniform(0.2, 1.0, size=(8, 224, 112, 3))
    out = np.asarray(mask_hair_patches(
        jax.random.key(3), jnp.asarray(x), patch_size=32,
        mask_ratio_range=(0.3, 0.5)))
    # background stays zero
    np.testing.assert_array_equal(out[:, :, 112:], 0.0)
    # some hair patches fully zeroed
    pm_in = np.asarray(patch_means(jnp.asarray(x), 32))
    pm_out = np.asarray(patch_means(jnp.asarray(out), 32))
    hair = pm_in > 0.01
    zeroed = hair & (pm_out == 0.0)
    frac = zeroed.sum(axis=1) / hair.sum(axis=1)
    assert np.all(frac >= 0.2) and np.all(frac <= 0.55)


def test_simclr_pipeline_two_views():
    t = pipelines.simclr_transform(size=64)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (2, 96, 96, 3), dtype=np.uint8))
    views = t(jax.random.key(0), x)
    assert len(views) == 2
    for v in views:
        assert v.shape == (2, 64, 64, 3)
        assert np.isfinite(np.asarray(v)).all()
    # views differ (random aug)
    assert not np.allclose(np.asarray(views[0]), np.asarray(views[1]))


def test_dino_pipeline_view_shapes():
    t = pipelines.dino_transform(global_size=64, local_size=32, n_local=2)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (2, 96, 96, 3), dtype=np.uint8))
    views = t(jax.random.key(0), x)
    assert [v.shape[1] for v in views] == [64, 64, 32, 32]


def test_pipeline_jittable():
    t = pipelines.simclr_transform(size=32)
    fn = jax.jit(lambda k, x: t(k, x))
    x = jnp.zeros((2, 48, 48, 3), dtype=jnp.uint8)
    views = fn(jax.random.key(0), x)
    assert views[0].shape == (2, 32, 32, 3)

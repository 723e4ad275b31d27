"""Batched on-device augmentation primitives.

The reference augments per-sample on CPU with PIL/torchvision inside
DataLoader workers (`/root/reference/HairPretraining/mainpretrain.py:102-130`).
TPU-first redesign: images arrive as a uint8/float batch and the whole
augmentation stack runs as jitted batched jnp ops on device — XLA fuses the
elementwise chain, and the random parameters come from explicit PRNG keys
(per-image via key folding), so a step is fully deterministic given its key.

Conventions: images are (B, H, W, C) float32 in [0, 1] (NHWC, TPU conv
layout). All ops are vmapped/batched and static-shaped.

Parity note (SURVEY.md §7 hard-part 1): training augs target distributional
equivalence with torchvision; eval transforms (center_crop + normalize) are
exact.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def to_float(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] → float32 [0,1] (torchvision ToTensor)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x.astype(jnp.float32)


def normalize(x: jnp.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jnp.ndarray:
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    return (x - mean) / std


def denormalize(x: jnp.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jnp.ndarray:
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    return x * std + mean


def center_crop(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Exact torchvision CenterCrop for H,W >= size (pads if smaller)."""
    B, H, W, C = x.shape
    if H < size or W < size:
        ph, pw = max(size - H, 0), max(size - W, 0)
        x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                        (pw // 2, pw - pw // 2), (0, 0)))
        B, H, W, C = x.shape
    top = int(round((H - size) / 2.0))
    left = int(round((W - size) / 2.0))
    return x[:, top:top + size, left:left + size, :]


def resize(x: jnp.ndarray, size: Tuple[int, int], method: str = "bilinear",
           antialias: bool = True) -> jnp.ndarray:
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, size[0], size[1], C), method,
                            antialias=antialias)


# ---------------------------------------------------------------------------
# random resized crop
# ---------------------------------------------------------------------------

def _sample_crop_params(key, H: int, W: int, scale, ratio, attempts: int = 10):
    """torchvision RandomResizedCrop.get_params, vectorized over attempts.

    Returns (top, left, h, w) floats for ONE image.
    """
    area = float(H * W)
    k_area, k_ratio, k_i, k_j = jax.random.split(key, 4)
    target_area = area * jax.random.uniform(
        k_area, (attempts,), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        k_ratio, (attempts,), minval=math.log(ratio[0]), maxval=math.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    w = jnp.sqrt(target_area * aspect)
    h = jnp.sqrt(target_area / aspect)
    valid = (w <= W) & (h <= H) & (w > 0) & (h > 0)
    # first valid attempt, else torchvision's central fallback crop
    idx = jnp.argmax(valid)
    any_valid = jnp.any(valid)
    in_ratio = float(W) / float(H)
    if in_ratio < ratio[0]:
        fb_w, fb_h = float(W), W / ratio[0]
    elif in_ratio > ratio[1]:
        fb_h, fb_w = float(H), H * ratio[1]
    else:
        fb_w, fb_h = float(W), float(H)
    w_sel = jnp.where(any_valid, w[idx], fb_w)
    h_sel = jnp.where(any_valid, h[idx], fb_h)
    u_i = jax.random.uniform(k_i, ())
    u_j = jax.random.uniform(k_j, ())
    top = jnp.where(any_valid, u_i * (H - h_sel), (H - h_sel) / 2.0)
    left = jnp.where(any_valid, u_j * (W - w_sel), (W - w_sel) / 2.0)
    return top, left, h_sel, w_sel


def random_resized_crop(
    key: jax.Array,
    x: jnp.ndarray,
    size: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    method: str = "bilinear",
) -> jnp.ndarray:
    """Per-image random crop + resize to (size, size).

    Implemented with `jax.image.scale_and_translate` so output shape is
    static; per-image crop boxes become per-image scale/translate params
    (vmapped) — this keeps everything on the MXU-friendly fused path instead
    of dynamic slicing.
    """
    B, H, W, C = x.shape
    keys = jax.random.split(key, B)

    def one(img, k):
        top, left, h, w = _sample_crop_params(k, H, W, scale, ratio)
        sy = size / h
        sx = size / w
        out = jax.image.scale_and_translate(
            img, (size, size, C), (0, 1),
            jnp.stack([sy, sx]),
            jnp.stack([-top * sy, -left * sx]),
            method=method, antialias=True,
        )
        return out

    return jax.vmap(one)(x, keys)


def random_resized_crop_with_params(
    key: jax.Array,
    x: jnp.ndarray,
    size: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    method: str = "bilinear",
):
    """Like `random_resized_crop` but also returns the crop boxes
    (top, left, h, w) per image — the SiameseIM augmentation contract
    (`SingleRandomResizedCrop` returning params,
    `/root/reference/HairPretraining/utils/transform.py:421-466`)."""
    B, H, W, C = x.shape
    keys = jax.random.split(key, B)

    def one(img, k):
        top, left, h, w = _sample_crop_params(k, H, W, scale, ratio)
        sy = size / h
        sx = size / w
        out = jax.image.scale_and_translate(
            img, (size, size, C), (0, 1),
            jnp.stack([sy, sx]), jnp.stack([-top * sy, -left * sx]),
            method=method, antialias=True)
        return out, jnp.stack([top, left, h, w])

    out, boxes = jax.vmap(one)(x, keys)
    return out, boxes


# ---------------------------------------------------------------------------
# flips / grayscale / solarize
# ---------------------------------------------------------------------------

def random_hflip(key: jax.Array, x: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    B = x.shape[0]
    flip = jax.random.uniform(key, (B, 1, 1, 1)) < p
    return jnp.where(flip, x[:, :, ::-1, :], x)


def rgb_to_grayscale(x: jnp.ndarray, keep_channels: bool = True) -> jnp.ndarray:
    # ITU-R 601-2 luma (PIL convert("L"))
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=x.dtype)
    g = jnp.einsum("bhwc,c->bhw", x, w)[..., None]
    return jnp.repeat(g, 3, axis=-1) if keep_channels else g


def random_grayscale(key: jax.Array, x: jnp.ndarray, p: float = 0.2) -> jnp.ndarray:
    B = x.shape[0]
    sel = jax.random.uniform(key, (B, 1, 1, 1)) < p
    return jnp.where(sel, rgb_to_grayscale(x), x)


def solarize(x: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    return jnp.where(x >= threshold, 1.0 - x, x)


def random_solarize(key: jax.Array, x: jnp.ndarray, p: float = 0.2,
                    threshold: float = 0.5) -> jnp.ndarray:
    B = x.shape[0]
    sel = jax.random.uniform(key, (B, 1, 1, 1)) < p
    return jnp.where(sel, solarize(x, threshold), x)


# ---------------------------------------------------------------------------
# color jitter
# ---------------------------------------------------------------------------

def _blend(a, b, f):
    return jnp.clip(a * f + b * (1.0 - f), 0.0, 1.0)


def adjust_brightness(x, factor):
    return _blend(x, jnp.zeros_like(x), factor)


def adjust_contrast(x, factor):
    # torchvision: blend with mean of grayscale image
    g = rgb_to_grayscale(x, keep_channels=False)
    mean = jnp.mean(g, axis=(1, 2, 3), keepdims=True)
    return _blend(x, mean, factor)


def adjust_saturation(x, factor):
    return _blend(x, rgb_to_grayscale(x), factor)


def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(x, factor):
    """factor in [-0.5, 0.5] — hue rotation via HSV (torchvision semantics)."""
    h, s, v = _rgb_to_hsv(x)
    h = (h + factor) % 1.0
    return _hsv_to_rgb(h, s, v)


def color_jitter(
    key: jax.Array,
    x: jnp.ndarray,
    brightness: float = 0.8,
    contrast: float = 0.8,
    saturation: float = 0.8,
    hue: float = 0.2,
    p: float = 0.8,
) -> jnp.ndarray:
    """torchvision ColorJitter wrapped in RandomApply(p): per-image random
    factors AND random op order (the order is randomized per batch — the
    per-image order randomization of torchvision is approximated at batch
    granularity, which is distributionally equivalent across steps)."""
    B = x.shape[0]
    k_apply, k_b, k_c, k_s, k_h, k_perm = jax.random.split(key, 6)
    fb = jax.random.uniform(k_b, (B, 1, 1, 1), minval=max(0, 1 - brightness),
                            maxval=1 + brightness)
    fc = jax.random.uniform(k_c, (B, 1, 1, 1), minval=max(0, 1 - contrast),
                            maxval=1 + contrast)
    fs = jax.random.uniform(k_s, (B, 1, 1, 1), minval=max(0, 1 - saturation),
                            maxval=1 + saturation)
    fh = jax.random.uniform(k_h, (B, 1, 1), minval=-hue, maxval=hue)

    ops = [
        lambda im: adjust_brightness(im, fb),
        lambda im: adjust_contrast(im, fc),
        lambda im: adjust_saturation(im, fs),
        lambda im: adjust_hue(im, fh),
    ]
    order = jax.random.permutation(k_perm, 4)
    y = x
    for step in range(4):
        y = jax.lax.switch(order[step], ops, y)
    apply = jax.random.uniform(k_apply, (B, 1, 1, 1)) < p
    return jnp.where(apply, y, x)


# ---------------------------------------------------------------------------
# gaussian blur
# ---------------------------------------------------------------------------

def gaussian_blur(
    key: jax.Array,
    x: jnp.ndarray,
    kernel_size: int,
    sigma_range: Tuple[float, float] = (0.1, 2.0),
    p: float = 0.5,
) -> jnp.ndarray:
    """Separable depthwise Gaussian blur with per-image random sigma.

    Static kernel size; sigma is traced (kernel weights computed on device).
    Implemented as two grouped 1-D convs with batch folded into channels —
    one fused XLA conv per axis instead of per-image python loops (the
    reference blurs per-sample on CPU via PIL).
    """
    B, H, W, C = x.shape
    k_apply, k_sigma = jax.random.split(key)
    sigma = jax.random.uniform(k_sigma, (B,), minval=sigma_range[0],
                               maxval=sigma_range[1])
    half = kernel_size // 2
    grid = jnp.arange(-half, half + 1, dtype=jnp.float32)  # (K,)
    kern = jnp.exp(-(grid[None, :] ** 2) / (2.0 * sigma[:, None] ** 2))
    kern = kern / jnp.sum(kern, axis=1, keepdims=True)  # (B, K)
    # per-image kernel broadcast over that image's C channels
    kern_bc = jnp.repeat(kern, C, axis=0).T  # (K, B*C)

    # fold batch into channels: (1, H, W, B*C)
    folded = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, H, W, B * C)
    folded = jnp.pad(folded, ((0, 0), (half, half), (half, half), (0, 0)),
                     mode="reflect")
    rhs_v = kern_bc.reshape(kernel_size, 1, 1, B * C)
    rhs_h = kern_bc.reshape(1, kernel_size, 1, B * C)
    dn = jax.lax.conv_dimension_numbers(folded.shape, rhs_v.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        folded, rhs_v, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=B * C)
    dn = jax.lax.conv_dimension_numbers(out.shape, rhs_h.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        out, rhs_h, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=B * C)
    blurred = jnp.transpose(out.reshape(H, W, B, C), (2, 0, 1, 3))
    apply = jax.random.uniform(k_apply, (B, 1, 1, 1)) < p
    return jnp.where(apply, blurred, x)


# ---------------------------------------------------------------------------
# rotation (positive_transform parity: RandomRotation ±15°)
# ---------------------------------------------------------------------------

def _axis_shift(x: jnp.ndarray, t: jnp.ndarray, axis: int, max_shift: int,
                order: int, fill: float, pos: jnp.ndarray | None = None,
                unit: int = 1) -> jnp.ndarray:
    """Shift rows of a batch along `axis` by per-(image,row) amounts `t`
    (inverse mapping: out[i] = in[i - t]), out-of-range → fill.

    TPU-native: gathers over the image axes are pathologically slow on TPU
    (a direct per-pixel gather rotation measures ~740 ms for a 256×224² batch
    — see BENCH_RESULTS.md), so the integer part of the shift is applied as a
    composition of log2(range) power-of-two `jnp.roll`s selected per row by
    the shift's bits — pure lane/sublane copies and selects, no gather. The
    fractional part (order=1) is one extra roll-by-1 blend.

    `t` must be full-rank broadcastable against x with extent 1 on `axis`
    (e.g. (B, H, 1, 1) for axis=2 of an NHWC batch).

    `pos`/`unit` support shifting a MERGED trailing axis: with x viewed as
    (B, H, W·C), a shift of one image column is `unit=C` roll elements and
    `pos` is the per-element column index (lane // C). `t` stays in column
    units.
    """
    # half-UP rounding (not jnp.round's half-to-even): must match the Pallas
    # kernel's `floor(t + 0.5)` so the two paths stay bit-identical at
    # exactly-half-integer shear shifts (ADVICE r1).
    n = jnp.floor(t + 0.5) if order == 0 else jnp.floor(t)
    f = t - n  # 0 when order == 0
    n = n.astype(jnp.int32)
    if pos is None:
        size = x.shape[axis]
        idx_shape = [1] * x.ndim
        idx_shape[axis] = size
        pos = jax.lax.broadcasted_iota(jnp.int32, tuple(idx_shape), axis)
    else:
        size = x.shape[axis] // unit

    # start from a uniform roll by -max_shift, then add bits of (n+max_shift)
    y = jnp.roll(x, -max_shift * unit, axis=axis)
    n_pos = jnp.clip(n + max_shift, 0, 2 * max_shift)
    bits = max(1, (2 * max_shift).bit_length())
    for k in range(bits):
        sel = ((n_pos >> k) & 1) == 1
        y = jnp.where(sel, jnp.roll(y, (1 << k) * unit, axis=axis), y)

    src = pos - n  # source coordinate of the integer-shifted value
    if order == 0:
        valid = (src >= 0) & (src <= size - 1)
        return jnp.where(valid, y, fill)
    y1 = jnp.roll(y, unit, axis=axis)  # integer shift n+1
    valid0 = (src >= 0) & (src <= size - 1)
    valid1 = (src - 1 >= 0) & (src - 1 <= size - 1)
    y = jnp.where(valid0, y, fill)
    y1 = jnp.where(valid1, y1, fill)
    return y * (1.0 - f) + y1 * f


def rotate_shear(x: jnp.ndarray, theta: jnp.ndarray, order: int = 0,
                 fill: float = 0.0, max_degrees: float = 45.0) -> jnp.ndarray:
    """Per-image rotation by `theta` (radians, (B,)) via the Paeth 3-shear
    decomposition — gather-free, each pass is `_axis_shift`.

    order=0 (nearest) matches torchvision RandomRotation's default
    interpolation; order=1 is bilinear-per-pass. The shear path resamples
    once per pass instead of once total, so outputs differ from a direct
    sampled rotation by at most neighbouring-pixel choices — fine for an
    augmentation (SURVEY.md §7 hard-part 1: training augs target
    distributional, not bitwise, equivalence).

    `max_degrees` is the STATIC bound on |theta| (sizes the roll
    decomposition — smaller bound, fewer roll passes).

    Layout: the passes run on a (B, H, W·C) view. With C minor and small
    (3), every roll on the raw NHWC array pays TPU tile padding of the
    3-wide lane dimension (~40× traffic amplification — measured 20.3 ms
    for a 256×224² batch); merging W·C into the lane axis and rolling in
    units of C makes the shifts dense (measured ~6× faster)."""
    B, H, W, C = x.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    alpha = -jnp.tan(theta / 2.0)  # x-shear coefficient
    beta = jnp.sin(theta)          # y-shear coefficient

    rows_y = jnp.arange(H, dtype=jnp.float32) - cy  # (H,)

    # static shift bounds for |theta| <= max_degrees
    t_max = math.radians(max_degrees)
    mx = int(math.ceil(math.tan(t_max / 2) * (H / 2))) + 1
    my = int(math.ceil(math.sin(t_max) * (W / 2))) + 1

    v = x.reshape(B, H, W * C)
    lane_col = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, W * C), 2)
                // C)                                         # image column
    tx = (alpha[:, None] * rows_y[None, :])[:, :, None]       # (B, H, 1)
    ty = beta[:, None, None] * (lane_col.astype(jnp.float32) - cx)
    row_pos = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
    v = _axis_shift(v, tx, axis=2, max_shift=mx, order=order, fill=fill,
                    pos=lane_col, unit=C)
    v = _axis_shift(v, ty, axis=1, max_shift=my, order=order, fill=fill,
                    pos=row_pos, unit=1)
    v = _axis_shift(v, tx, axis=2, max_shift=mx, order=order, fill=fill,
                    pos=lane_col, unit=C)
    return v.reshape(B, H, W, C)


def random_rotate(
    key: jax.Array, x: jnp.ndarray, degrees: float = 15.0,
    fill: float = 0.0, method: str = "auto",
) -> jnp.ndarray:
    """Per-image random rotation in [-degrees, degrees], zero fill
    (reference `transform.py:21-24` positive_transform; torchvision
    RandomRotation defaults to NEAREST interpolation).

    method="auto": on a TPU backend, the fused Pallas 3-shear kernel
    (`hairci/ops/rotate_pallas.py` — all passes in VMEM, 4.5 ms vs 20.6 ms
    for the XLA roll chain on a 256×224² batch, bit-identical); elsewhere
    the XLA "shear" path. method="shear": gather-free 3-shear roll chain.
    method="gather": direct bilinear inverse-map sampling (exact rotation
    map; pathologically slow on TPU, kept for CPU use and as the test
    oracle)."""
    if method == "auto":
        method = ("pallas" if jax.default_backend() == "tpu" else "shear")
    if method in ("shear", "pallas"):
        B = x.shape[0]
        theta = jax.random.uniform(
            key, (B,), minval=-degrees, maxval=degrees) * (math.pi / 180.0)
        if method == "pallas":
            from hairci.ops.rotate_pallas import rotate_shear_pallas

            return rotate_shear_pallas(x, theta, fill=fill,
                                       max_degrees=max(degrees, 1e-3))
        return rotate_shear(x, theta, order=0, fill=fill,
                            max_degrees=max(degrees, 1e-3))
    B, H, W, C = x.shape
    angles = jax.random.uniform(key, (B,), minval=-degrees, maxval=degrees)
    theta = angles * (math.pi / 180.0)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")

    def one(img, t):
        cos, sin = jnp.cos(t), jnp.sin(t)
        # inverse mapping: output pixel ← input coords
        ys = cos * (yy - cy) - sin * (xx - cx) + cy
        xs = sin * (yy - cy) + cos * (xx - cx) + cx
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        wy = ys - y0
        wx = xs - x0

        def gather(yi, xi):
            valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            yi = jnp.clip(yi, 0, H - 1)
            xi = jnp.clip(xi, 0, W - 1)
            vals = img[yi, xi]  # (H, W, C)
            return jnp.where(valid[..., None], vals, fill)

        out = (
            gather(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
            + gather(y0, x0 + 1) * ((1 - wy) * wx)[..., None]
            + gather(y0 + 1, x0) * (wy * (1 - wx))[..., None]
            + gather(y0 + 1, x0 + 1) * (wy * wx)[..., None]
        )
        return out

    return jax.vmap(one)(x, theta)

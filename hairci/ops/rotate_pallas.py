"""Pallas TPU kernel: fused 3-shear nearest rotation.

The XLA shear path (`hairci/aug/ops.py:rotate_shear`) lowers to ~21
roll+select passes, each a full HBM round-trip — 20.4 ms for a 256×224²
f32 batch (tools/sham_step_decomp.py). This kernel keeps one image in
VMEM and runs all three shear passes there: HBM traffic is exactly one
read + one write of the batch (~1.2 GB/s·ms → ~0.4 ms floor).

Semantics: identical to `rotate_shear(..., order=0)` — Paeth 3-shear
decomposition, nearest rounding per pass, out-of-range → fill (reference
parity target: torchvision RandomRotation's NEAREST default,
`/root/reference/HairPretraining/utils/transform.py:21-24`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_lanes(v, t, col, width: int, max_shift: int, unit: int,
                 fill: float):
    """out[., col] = v[., col - round(t)] on the merged (H, W·C) lane axis;
    roll unit = C elements per image column. Bit-decomposed static rolls."""
    n = jnp.floor(t + 0.5).astype(jnp.int32)
    size = v.shape[1]
    y = pltpu.roll(v, (-max_shift * unit) % size, 1)  # roll is mod size
    n_pos = jnp.clip(n + max_shift, 0, 2 * max_shift)
    for k in range(max(1, (2 * max_shift).bit_length())):
        sel = ((n_pos >> k) & 1) == 1
        y = jnp.where(sel, pltpu.roll(y, ((1 << k) * unit) % size, 1), y)
    src = col - n
    return jnp.where((src >= 0) & (src <= width - 1), y, fill)


def _shift_rows(v, t, row, height: int, max_shift: int, fill: float):
    """Same along the sublane (row) axis."""
    n = jnp.floor(t + 0.5).astype(jnp.int32)
    size = v.shape[0]
    y = pltpu.roll(v, (-max_shift) % size, 0)  # roll is mod size
    n_pos = jnp.clip(n + max_shift, 0, 2 * max_shift)
    for k in range(max(1, (2 * max_shift).bit_length())):
        sel = ((n_pos >> k) & 1) == 1
        y = jnp.where(sel, pltpu.roll(y, (1 << k) % size, 0), y)
    src = row - n
    return jnp.where((src >= 0) & (src <= height - 1), y, fill)


def _blur3(v, w0, w1, row, col, H: int, W: int, C: int):
    """Separable 3-tap Gaussian blur in VMEM, reflect boundaries (parity
    with `gaussian_blur`'s reflect-padded grouped convs)."""
    sub, lane = v.shape
    u = pltpu.roll(v, 1, 0)            # row i-1
    d = pltpu.roll(v, sub - 1, 0)      # row i+1
    u, d = (jnp.where(row == 0, d, u),
            jnp.where(row == H - 1, u, d))
    v = w1 * v + w0 * (u + d)
    lft = pltpu.roll(v, C, 1)          # col j-1
    rgt = pltpu.roll(v, lane - C, 1)   # col j+1
    lft, rgt = (jnp.where(col == 0, rgt, lft),
                jnp.where(col == W - 1, lft, rgt))
    return w1 * v + w0 * (lft + rgt)


def _rotate_kernel(theta_ref, sigma_ref, x_ref, out_ref, *, H: int, W: int,
                   C: int, mx: int, my: int, fill: float, blur: bool):
    theta = theta_ref[pl.program_id(0)]
    alpha = -jnp.tan(theta / 2.0)
    beta = jnp.sin(theta)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0

    col = jax.lax.broadcasted_iota(jnp.int32, (H, W * C), 1) // C
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W * C), 0)
    tx = alpha * (row.astype(jnp.float32) - cy)   # (H, WC), row-constant
    ty = beta * (col.astype(jnp.float32) - cx)    # (H, WC), col-constant

    v = x_ref[0]
    v = _shift_lanes(v, tx, col, W, mx, C, fill)
    v = _shift_rows(v, ty, row, H, my, fill)
    v = _shift_lanes(v, tx, col, W, mx, C, fill)
    if blur:
        sigma = sigma_ref[pl.program_id(0)]
        w0 = jnp.exp(-1.0 / (2.0 * sigma * sigma))
        denom = 1.0 + 2.0 * w0
        v = _blur3(v, w0 / denom, 1.0 / denom, row, col, H, W, C)
    out_ref[0] = v


@functools.partial(jax.jit, static_argnames=("fill", "max_degrees"))
def rotate_shear_pallas(x: jnp.ndarray, theta: jnp.ndarray,
                        fill: float = 0.0, max_degrees: float = 45.0,
                        blur_sigma: jnp.ndarray | None = None) -> jnp.ndarray:
    """Fused nearest 3-shear rotation. x (B, H, W, C) f32, theta (B,) rad,
    |theta| <= max_degrees (static bound sizing the roll decomposition).

    blur_sigma (B,) additionally applies a separable 3-tap Gaussian blur
    (reflect boundary) in the same kernel — the whole
    `positive_transform` (rotate ±15° + GaussianBlur(3, σ)) in one HBM
    round trip."""
    B, H, W, C = x.shape
    t_max = math.radians(max_degrees)
    mx = int(math.ceil(math.tan(t_max / 2) * (H / 2))) + 1
    my = int(math.ceil(math.sin(t_max) * (W / 2))) + 1

    blur = blur_sigma is not None
    sigma = (blur_sigma if blur else jnp.ones((B,))).astype(jnp.float32)
    kernel = functools.partial(_rotate_kernel, H=H, W=W, C=C, mx=mx, my=my,
                               fill=fill, blur=blur)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # theta, whole-array
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sigma, whole-array
            pl.BlockSpec((1, H, W * C), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W * C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W * C), x.dtype),
    )(theta.astype(jnp.float32), sigma, x.reshape(B, H, W * C))
    return out.reshape(B, H, W, C)

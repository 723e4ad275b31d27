"""Microbenchmark: per-channel BatchNorm statistics over a large bf16
NHWC activation tensor — XLA convert+reduce (what flax BatchNorm lowers
to; the ~110 ms/step `convert_reduce_fusion` ops in the SimCLR train-step
profile, BENCH_RESULTS.md) vs a Pallas one-pass f32 accumulator.

Run on the real TPU: `python tools/bn_stats_bench.py`
Timing uses the in-jit lax.scan differencing harness (CLAUDE.md: the axon
relay's block_until_ready does not block).
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (N*H*W, C) view of a conv activation; resnet50 layer1-ish size
M, C = 512 * 56 * 56, 256
BLOCK_M = 4096


def _stats_kernel(x_ref, sum_ref, sq_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    x = x_ref[:].astype(jnp.float32)
    sum_ref[0, :] += jnp.sum(x, axis=0)
    sq_ref[0, :] += jnp.sum(x * x, axis=0)


def pallas_stats(x2d):
    m, c = x2d.shape
    s, sq = pl.pallas_call(
        _stats_kernel,
        grid=(m // BLOCK_M,),
        in_specs=[pl.BlockSpec((BLOCK_M, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
    )(x2d)
    n = jnp.float32(m)
    mean = s[0] / n
    var = sq[0] / n - mean * mean
    return mean, var


def xla_stats(x2d):
    # what flax BatchNorm does: promote to f32, mean + mean-of-squares
    xf = x2d.astype(jnp.float32)
    mean = jnp.mean(xf, axis=0)
    var = jnp.mean(xf * xf, axis=0) - mean * mean
    return mean, var


def read_floor(x2d):
    # single-pass reduce with no convert: bandwidth floor for one read
    return jnp.max(x2d), jnp.max(x2d)


def timed_loop(fn, x2d, iters):
    def body(carry, _):
        xi = x2d + carry.astype(x2d.dtype) * jnp.zeros((), x2d.dtype)
        a, b = fn(xi)
        return jnp.sum(a, dtype=jnp.float32) + jnp.sum(b, dtype=jnp.float32), ()

    carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
    return carry


def measure(name, fn, x2d, small=2, large=12, repeats=2):
    # x2d must be a jit ARGUMENT — closing over it would bake an 822MB
    # constant into the graph and blow up compile time
    loop = jax.jit(partial(timed_loop, fn), static_argnames="iters")

    def run(it):
        return float(loop(x2d, iters=it))

    for it in (small, large):
        t0 = time.perf_counter()
        run(it)
        print(f"  [{name}] compile+run iters={it}: "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
    ts = min(_t(run, small) for _ in range(repeats))
    tl = min(_t(run, large) for _ in range(repeats))
    per = max((tl - ts) / (large - small), 1e-9)
    gb = M * C * 2 / 1e9
    print(f"{name}: {per*1e3:.2f} ms  ({gb/per:.0f} GB/s effective)")
    return per


def _t(run, it):
    t0 = time.perf_counter()
    run(it)
    return time.perf_counter() - t0


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                    dtype=jnp.bfloat16)

    # correctness first
    pm, pv = jax.jit(pallas_stats)(x)
    xm, xv = jax.jit(xla_stats)(x)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(xm),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(xv),
                               rtol=1e-3, atol=1e-3)
    print("correctness OK", file=sys.stderr)

    measure("read_floor(max)", read_floor, x)
    measure("xla_convert_reduce", xla_stats, x)
    measure("pallas_onepass", pallas_stats, x)


if __name__ == "__main__":
    main()

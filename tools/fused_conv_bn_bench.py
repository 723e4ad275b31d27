#!/usr/bin/env python
"""The deferred fused-conv+BN Pallas experiment (VERDICT r1 #5).

Round-1 analysis (BENCH_RESULTS.md "BN-reduce investigation") put the
SimCLR RN50 train step within ~10% of this chip's combined roofline and
named one untried lever: hand-fused conv+BN Pallas kernels. This tool
measures that lever directly on a representative ResNet stage shape
(bs 256, 56x56x64 -> 64, 3x3) on the real TPU:

  1. XLA conv fwd                      (the baseline the MXU gives us)
  2. XLA conv + BN(train) + ReLU fwd   (what the step actually runs)
  3. Pallas fused conv(+bias) fwd      (im2col-free 9-matmul VMEM kernel)
  4. Pallas fused conv + BN-stat accumulation (saves the stat re-read)
  5. XLA conv fwd+bwd                  (the backward roofline check —
     backward is where the transposed-layout traffic lives)

If (3) <= (1) and the (2)-(1) overhead is near the intrinsic BN traffic
bound, the fusion lever is dead: a hand kernel can only match the MXU on
the conv and can't remove backward-layout traffic it doesn't own.

Timing uses the repo's relay-safe methodology: loops inside one jit via
`lax.scan` with a data dependency, differenced iteration counts
(.claude/skills/verify/SKILL.md).

Run: python -m tools.fused_conv_bn_bench  (TPU; ~10 min incl. compiles)
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, CIN, COUT = 256, 56, 56, 64, 64
CONV_FLOPS = 2 * B * H * W * 9 * CIN * COUT  # 59.2 GFLOP


# ---------------------------------------------------------------------------
# Pallas fused 3x3 conv (+ optional BN-stat accumulation)
# ---------------------------------------------------------------------------

def _conv_kernel(x_ref, w_ref, b_ref, out_ref, *, stats: bool,
                 sum_ref=None, sq_ref=None):
    """One image per grid step. x (1, H+2, W+2, CIN) pre-padded in VMEM;
    out (1, H*W, COUT). 9 shifted (H*W, CIN) @ (CIN, COUT) matmuls
    accumulate in f32 — the MXU path; no im2col materialization."""
    acc = jnp.zeros((H * W, COUT), jnp.float32)
    x = x_ref[0]  # (H+2, W+2, CIN)
    for dy in range(3):
        for dx in range(3):
            win = x[dy:dy + H, dx:dx + W, :].reshape(H * W, CIN)
            acc += jnp.dot(win, w_ref[dy, dx],
                           preferred_element_type=jnp.float32)
    acc += b_ref[:].astype(jnp.float32)
    if stats:
        # accumulate per-channel sum / sum-of-squares across the batch grid
        # (grid steps are sequential on TPU, read-modify-write is safe)
        @pl.when(pl.program_id(0) == 0)
        def _init():
            sum_ref[:] = jnp.zeros_like(sum_ref)
            sq_ref[:] = jnp.zeros_like(sq_ref)

        sum_ref[:] += jnp.sum(acc, axis=0, keepdims=True)
        sq_ref[:] += jnp.sum(acc * acc, axis=0, keepdims=True)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames="stats")
def pallas_conv3x3(x, w, b, stats: bool = False):
    """x (B, H, W, CIN) bf16 -> (B, H*W, COUT) bf16 [+ (1, COUT) sum, sumsq].
    Input is padded here (same work XLA's conv does internally)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kernel = functools.partial(_conv_kernel, stats=stats)
    out_shape = [jax.ShapeDtypeStruct((B, H * W, COUT), x.dtype)]
    out_specs = [pl.BlockSpec((1, H * W, COUT), lambda i: (i, 0, 0))]
    if stats:
        out_shape += [jax.ShapeDtypeStruct((1, COUT), jnp.float32)] * 2
        out_specs += [pl.BlockSpec((1, COUT), lambda i: (0, 0))] * 2

        def kern(x_ref, w_ref, b_ref, out_ref, sum_ref, sq_ref):
            _conv_kernel(x_ref, w_ref, b_ref, out_ref, stats=True,
                         sum_ref=sum_ref, sq_ref=sq_ref)
    else:
        def kern(x_ref, w_ref, b_ref, out_ref):
            _conv_kernel(x_ref, w_ref, b_ref, out_ref, stats=False)

    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, CIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(xp, w, b)


# ---------------------------------------------------------------------------
# XLA reference paths
# ---------------------------------------------------------------------------

def xla_conv(x, w):
    # bf16-out like the model path (flax conv): MXU accumulates f32
    # internally, the materialized activation is bf16 — and the conv
    # transpose keeps consistent dtypes for the bwd benchmark
    return jax.lax.conv_general_dilated(
        x, w.reshape(3, 3, CIN, COUT), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def xla_conv_bn_relu(x, w, scale, bias):
    y = xla_conv(x, w).astype(jnp.float32)
    mu = jnp.mean(y, axis=(0, 1, 2))
    var = jnp.var(y, axis=(0, 1, 2))
    y = (y - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    return jax.nn.relu(y).astype(x.dtype)


# ---------------------------------------------------------------------------
# relay-safe timing
# ---------------------------------------------------------------------------

def timed(make_loop, small=2, large=12, repeats=2):
    run = jax.jit(make_loop, static_argnames="iters")

    def go(it):
        return float(run(iters=it))

    for it in (small, large):
        t0 = time.perf_counter()
        go(it)
        print(f"  compile+run iters={it}: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
    t_s = min(_t(go, small) for _ in range(repeats))
    t_l = min(_t(go, large) for _ in range(repeats))
    return max((t_l - t_s) / (large - small), 1e-9)


def _t(go, it):
    t0 = time.perf_counter()
    go(it)
    return time.perf_counter() - t0


def main():
    # relay compiles are slow and uncached: --only lets a rerun finish the
    # variants a timeout cut off (comma-separated substrings)
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, H, W, CIN)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, CIN, COUT)).astype(np.float32)
                    * 0.05).astype(jnp.bfloat16)
    bias = jnp.zeros((COUT,), jnp.bfloat16)
    scale = jnp.ones((COUT,), jnp.float32)
    beta = jnp.zeros((COUT,), jnp.float32)

    if only is None:
        # correctness first
        ref = np.asarray(xla_conv(x0, w)).astype(np.float32).reshape(
            B, H * W, COUT)
        got = np.asarray(pallas_conv3x3(x0, w, bias)[0]).astype(np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"pallas vs XLA conv rel err: {err:.2e}", file=sys.stderr)
        assert err < 2e-2, "pallas conv mismatch"

    results = {}

    def bench(name, fn):
        if only is not None and not any(s in name for s in only):
            return
        def loop(iters):
            def body(c, _):
                y = fn(x0 + c.astype(x0.dtype))
                return jnp.sum(y.astype(jnp.float32)) * 0.0, ()

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c

        print(f"[{name}]", file=sys.stderr)
        dt = timed(lambda iters: loop(iters))
        tflops = CONV_FLOPS / dt / 1e12
        results[name] = (dt * 1e3, tflops)
        print(f"  {dt * 1e3:.2f} ms  {tflops:.1f} TFLOP/s (conv FLOPs only)",
              file=sys.stderr)

    bench("xla_conv_fwd", lambda x: xla_conv(x, w))
    bench("xla_conv_bn_relu_fwd", lambda x: xla_conv_bn_relu(
        x, w, scale, beta))
    bench("pallas_fused_conv_fwd", lambda x: pallas_conv3x3(x, w, bias)[0])
    bench("pallas_fused_conv_bnstats_fwd",
          lambda x: pallas_conv3x3(x, w, bias, stats=True)[0])

    grad = jax.grad(lambda x, w: jnp.sum(xla_conv_bn_relu(
        x, w, scale, beta).astype(jnp.float32)), argnums=(0, 1))
    bench("xla_conv_bn_fwd_bwd", lambda x: grad(x, w)[0])

    print("\nRESULTS (ms | conv-TFLOP/s):")
    for k, (ms, tf) in results.items():
        print(f"  {k:32s} {ms:7.2f} ms  {tf:6.1f}")
    if {"xla_conv_fwd", "xla_conv_bn_relu_fwd",
            "pallas_fused_conv_fwd"} <= set(results):
        conv_ms = results["xla_conv_fwd"][0]
        fused_ms = results["pallas_fused_conv_fwd"][0]
        bn_overhead = results["xla_conv_bn_relu_fwd"][0] - conv_ms
        print(f"\nBN+ReLU overhead over bare conv: {bn_overhead:.2f} ms")
        print(f"pallas/xla conv fwd ratio: {fused_ms / conv_ms:.2f}x "
              f"({'pallas SLOWER — lever dead' if fused_ms > conv_ms else 'pallas faster — lever live'})")


if __name__ == "__main__":
    main()

"""ResNet-50 embed roofline decomposition + stem levers on the real TPU.

The ViT family got its roofline treatment in r3 (tools/vit_bench.py);
this closes the symmetric gap for the ResNet embed headline — the one
bench.py metric whose MFU has only ever been quoted from the 4.1 GFLOP
MAC-count convention (VERDICT r2's "~43% of sustain"). Sections:

  embed    ResNet-50 embed + compiled-HLO FLOP count -> honest MFU in the
           same 2*MAC convention every other number in BENCH_RESULTS uses
  decomp   per-stage attribution by differencing prefix graphs
           (stem / stage1..4 / pool), each with its own compiled FLOPs
  stem     the classic TPU stem lever, measured: 7x7/2 conv on
           (B,224,224,3) vs space-to-depth 2x2 + the mathematically
           equivalent 4x4/1 conv on (B,112,112,12) (MLPerf-style; the
           3-channel input starves the 128-lane MXU contraction axis),
           plus the maxpool and full-stem context

Timing: bench.py methodology — in-jit lax.scan with a data dependency,
fixed overhead removed by differencing two iteration counts (the axon
relay's block_until_ready does not block; CLAUDE.md).

Reference surface matched: the eval/extract path of
`/root/reference/HairPretraining/src/main_backbone.py:624-637`
(`extract_features`) over the torchvision ResNet-50 trunk.

Run: `python -m tools.resnet_bench [embed decomp stem ...]`
"""
from __future__ import annotations

import sys
from functools import partial

from hairci.utils import apply_platform_env

apply_platform_env()  # HAIRCI_PLATFORM=cpu routes off the relay

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from hairci.models.resnet import BottleneckBlock, ResNet  # noqa: E402
from tools.vit_bench import (OBSERVED_SUSTAIN_FLOPS, V5E_PEAK_FLOPS,
                             compiled_flops, timed)

BATCH = 256


def _fwd_fn(model, variables):
    def fwd(x):
        return model.apply(variables, x, train=False)

    return fwd


def _time_fwd(fwd, x, small=2, large=12):
    @partial(jax.jit, static_argnames="iters")
    def loop(x, iters):
        def body(carry, _):
            out = fwd(x + carry.astype(x.dtype) * 0)
            return jnp.sum(out.astype(jnp.float32)), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    def run(it):
        return float(loop(x, iters=it))

    return timed(run, small, large)


def _prefix_model(n_stages: int) -> ResNet:
    """ResNet-50 prefix: stem + the first `n_stages` stages (+ mean pool).

    `stage_sizes` truncation preserves per-stage widths (64*2^i), so each
    prefix is byte-identical in shape to the full model up to its cut."""
    return ResNet(stage_sizes=[3, 4, 6, 3][:n_stages],
                  block_cls=BottleneckBlock, stem="imagenet",
                  dtype=jnp.bfloat16)


def section_embed(x):
    model = _prefix_model(4)
    variables = model.init(jax.random.key(0), x[:8], train=False)
    fwd = _fwd_fn(model, variables)
    per = _time_fwd(fwd, x)
    f = compiled_flops(fwd, x)
    ips = BATCH / per
    line = f"ResNet-50 embed (transform excluded): {ips:.1f} img/s/chip"
    if f == f:
        tf = f / per / 1e12
        line += (f"  [{f/BATCH/1e9:.2f} GFLOP/img compiled; {tf:.1f} TF/s = "
                 f"{tf*1e12/OBSERVED_SUSTAIN_FLOPS:.2f} of measured sustain, "
                 f"{tf*1e12/V5E_PEAK_FLOPS:.2f} of v5e peak]")
    print(line)
    return per


def section_decomp(x):
    """Per-stage cost: difference prefix forwards. Prefixes share the stem
    and widths, so prefix(k) - prefix(k-1) isolates stage k plus the delta
    between pooling a (H,W,C) map vs the next one (the pools are ~0.1 ms)."""
    labels = ["stem (7x7/2 conv + BN + relu + maxpool) [+pool]",
              "stage1 3x bottleneck 56x56x256", "stage2 4x 28x28x512",
              "stage3 6x 14x14x1024", "stage4 3x 7x7x2048"]
    prev_t, prev_f = 0.0, 0.0
    rows = []
    for k in range(5):
        model = _prefix_model(k)
        variables = model.init(jax.random.key(0), x[:8], train=False)
        fwd = _fwd_fn(model, variables)
        per = _time_fwd(fwd, x)
        f = compiled_flops(fwd, x)
        dt, df = per - prev_t, (f - prev_f if f == f else float("nan"))
        tf = df / dt / 1e12 if df == df else float("nan")
        rows.append((labels[k], dt * 1e3, df / BATCH / 1e9, tf))
        print(f"prefix<= {labels[k]}: cum {per*1e3:.2f} ms | "
              f"delta {dt*1e3:.2f} ms, {df/BATCH/1e9:.2f} GFLOP/img, "
              f"{tf:.1f} TF/s ({tf*1e12/OBSERVED_SUSTAIN_FLOPS:.0%} of "
              f"sustain)")
        prev_t, prev_f = per, f


def _s2d(x):
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _embed_w7_into_w4(w7: np.ndarray) -> np.ndarray:
    """Embed a (7,7,3,O) stride-2 kernel into the equivalent (4,4,12,O)
    stride-1 kernel over the 2x2 space-to-depth input.

    Output (i,j) of the original conv reads padded rows 2i+di-3, di in
    0..6; in s2d coordinates row r = 2p+a, so p = i-2+dp with
    di = 2*dp+a-1 — a 4-tap window at padding (2,1)."""
    o = w7.shape[-1]
    w4 = np.zeros((4, 4, 12, o), w7.dtype)
    for dp in range(4):
        for a in range(2):
            di = 2 * dp + a - 1
            if not 0 <= di < 7:
                continue
            for dq in range(4):
                for b in range(2):
                    dj = 2 * dq + b - 1
                    if not 0 <= dj < 7:
                        continue
                    ch = (a * 2 + b) * 3
                    w4[dp, dq, ch:ch + 3, :] = w7[di, dj, :, :]
    return w4


def _measure(label, fn, x):
    @partial(jax.jit, static_argnames="iters")
    def loop(x, iters):
        def body(carry, _):
            out = fn(x + carry.astype(x.dtype) * 0)
            return jnp.sum(out.astype(jnp.float32)), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    def run(it):
        return float(loop(x, iters=it))

    per = timed(run, 2, 12)
    print(f"{label}: {per*1e3:.3f} ms")
    return per


def section_stem(x):
    rng = np.random.default_rng(0)
    w7n = (rng.normal(size=(7, 7, 3, 64)) * 0.05).astype(np.float32)
    w7 = jnp.asarray(w7n, jnp.bfloat16)
    w4 = jnp.asarray(_embed_w7_into_w4(w7n), jnp.bfloat16)
    dn = ("NHWC", "HWIO", "NHWC")

    def conv7(x):
        return jax.lax.conv_general_dilated(
            x, w7, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn)

    def conv_s2d(x):
        return jax.lax.conv_general_dilated(
            _s2d(x), w4, (1, 1), [(2, 1), (2, 1)], dimension_numbers=dn)

    # numerical equivalence (same products, different summation order)
    a = np.asarray(jax.jit(conv7)(x[:4]), np.float32)
    b = np.asarray(jax.jit(conv_s2d)(x[:4]), np.float32)
    err = float(np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-9))
    print(f"s2d-vs-7x7 max rel err: {err:.2e} "
          f"({'EQUIVALENT' if err < 2e-2 else 'MISMATCH'} at bf16)")

    t7 = _measure("7x7/2 conv (B,224,224,3)->(B,112,112,64)", conv7, x)
    ts = _measure("s2d 2x2 + 4x4/1 conv (B,112,112,12)", conv_s2d, x)

    def maxpool(y):
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])

    y = jax.jit(conv7)(x)
    _measure("3x3/2 maxpool (B,112,112,64)", maxpool, y)

    scale = jnp.ones((64,), jnp.bfloat16)
    shift = jnp.zeros((64,), jnp.bfloat16)

    def stem7(x):
        return maxpool(jax.nn.relu(conv7(x) * scale + shift))

    def stem_s2d(x):
        return maxpool(jax.nn.relu(conv_s2d(x) * scale + shift))

    tf7 = _measure("full stem 7x7 (conv+foldedBN+relu+maxpool)", stem7, x)
    tfs = _measure("full stem s2d (s2d+conv+foldedBN+relu+maxpool)",
                   stem_s2d, x)
    print(f"stem lever: isolated conv {t7/ts:.2f}x, full stem "
          f"{tf7/tfs:.2f}x ({'s2d wins' if tfs < tf7 else 's2d loses'})")


def main(argv):
    global BATCH
    argv = list(argv)
    if "--batch" in argv:
        i = argv.index("--batch")
        BATCH = int(argv[i + 1])
        del argv[i:i + 2]
    sections = argv or ["embed", "decomp", "stem"]
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    # post-knn_transform distribution: zero-mean unit-ish normalized images
    x = jnp.asarray(rng.normal(size=(BATCH, 224, 224, 3)).astype(np.float32),
                    jnp.bfloat16)

    if "embed" in sections:
        section_embed(x)
    if "decomp" in sections:
        section_decomp(x)
    if "stem" in sections:
        section_stem(x)


if __name__ == "__main__":
    main(sys.argv[1:])

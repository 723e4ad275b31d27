"""TPU-tuned BatchNorm.

Drop-in replacement for `flax.linen.BatchNorm` (same params: scale/bias;
same batch_stats: mean/var; same call convention) for NHWC feature maps,
with every reduction and the normalize computed on a 2-D ``(N*H*W, C)``
reshape of the input.

Why a custom module: the SimCLR ResNet-50 train step spends ~107 ms of a
242 ms step in `convert_reduce_fusion` kOutput fusions that re-emit whole
activations in transposed layouts (profiled; see BENCH_RESULTS.md). This
module expresses every reduction and the normalize on the 2-D view with
the scale/shift folded to per-channel f32 (w, b), which keeps the lowering
explicit and gives a single place to swap in a Pallas kernel later.
Measured on the real chip it matches flax BatchNorm's step time exactly
(942 img/s both ways) — the relayouts turn out to be intrinsic to XLA's
conv-backward layout choices, and the step is within ~10% of the chip's
combined conv-FLOPs + BN-traffic roofline (tools/bn_stats_bench.py: the
isolated 4-D stat reduce itself streams at ~900 GB/s).

Statistics are computed in f32 over the *global* batch: under jit with the
batch sharded on the ``data`` mesh axis the reductions lower to
cross-replica collectives (sync-BN for free, like the rest of hairci;
reference is single-device BN).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


class BatchNorm(nn.Module):
    """Flax-compatible BatchNorm with 2-D-view reductions (see module doc).

    Only the features used by hairci are implemented: channel-last inputs,
    optional scale/bias, running stats in the ``batch_stats`` collection.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    use_scale: bool = True
    use_bias: bool = True
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: Array,
                 use_running_average: Optional[bool] = None) -> Array:
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        c = x.shape[-1]
        dtype = self.dtype or x.dtype
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (c,))

        x2 = x.reshape(-1, c)
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x2.astype(jnp.float32)
            mean = jnp.mean(xf, axis=0)
            var = jnp.mean(xf * xf, axis=0) - mean * mean
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var

        w = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        if self.use_scale:
            w = w * self.param("scale", self.scale_init, (c,), jnp.float32)
        b = -mean * w
        if self.use_bias:
            b = b + self.param("bias", self.bias_init, (c,), jnp.float32)
        y2 = x2.astype(jnp.float32) * w + b
        return y2.reshape(x.shape).astype(dtype)

"""Metric logging utilities — `SmoothedValue` / `MetricLogger` parity
(`/root/reference/src/util/misc.py:29-173`, MAE lineage) plus label-smoothing
cross-entropy (`misc.py:539+`).

The distributed synchronization (`synchronize_between_processes`) uses
`jax.experimental.multihost_utils` instead of `torch.distributed.barrier` +
all_reduce.
"""

from __future__ import annotations

import time
from collections import defaultdict, deque
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class SmoothedValue:
    """Windowed + global average tracker."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return float(max(self.deque)) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def synchronize_between_processes(self) -> None:
        """Cross-host sum of (count, total) — torch.dist.all_reduce parity."""
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        arr = multihost_utils.process_allgather(
            np.asarray([self.count, self.total], np.float64))
        self.count = int(arr[:, 0].sum())
        self.total = float(arr[:, 1].sum())

    def __str__(self) -> str:
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self) -> str:
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items())

    def synchronize_between_processes(self) -> None:
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def log_every(self, iterable, print_freq: int, header: str = ""):
        start = time.time()
        for i, obj in enumerate(iterable):
            yield obj
            if i % print_freq == 0:
                elapsed = time.time() - start
                print(f"{header} [{i}]  {self}  ({elapsed:.1f}s)")


def label_smoothing_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                                  smoothing: float = 0.1) -> jnp.ndarray:
    """LabelSmoothingCrossEntropy parity (`misc.py:539+`)."""
    n = logits.shape[-1]
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, labels[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logprobs, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)

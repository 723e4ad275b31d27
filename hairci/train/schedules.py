"""Schedules — parity with the lightly schedules the reference calls
(`cosine_schedule`, `linear_warmup_schedule` in
`/root/reference/HairPretraining/src/pretrain_engine.py:283,402-512`) and
the local `margin_decay` / `linear_increase_alpha`
(`/root/reference/HairPretraining/utils/utils.py:73-102`).
"""

from __future__ import annotations

import math


def cosine_schedule(step: int, max_steps: int, start_value: float,
                    end_value: float) -> float:
    """lightly cosine_schedule: cosine interpolation start→end."""
    if max_steps == 1:
        return end_value
    step = min(step, max_steps - 1)
    cos = 0.5 * (1 + math.cos(math.pi * step / (max_steps - 1)))
    return end_value - (end_value - start_value) * cos


def linear_warmup_schedule(step: int, warmup_steps: int, start_value: float,
                           end_value: float) -> float:
    if warmup_steps <= 0 or step >= warmup_steps:
        return end_value
    return start_value + (end_value - start_value) * step / warmup_steps


def margin_decay(epoch: int, total_epochs: int, start: float = 0.7,
                 end: float = 0.5) -> float:
    """`margin_decay` parity (`utils/utils.py:73-86`): linear decay."""
    if total_epochs <= 1:
        return end
    t = min(epoch / (total_epochs - 1), 1.0)
    return start + (end - start) * t


def linear_increase_alpha(epoch: int, total_epochs: int, start: float = 0.0,
                          end: float = 1.0) -> float:
    """`linear_increase_alpha` parity (`utils/utils.py:88-102`)."""
    if total_epochs <= 1:
        return end
    t = min(epoch / (total_epochs - 1), 1.0)
    return start + (end - start) * t

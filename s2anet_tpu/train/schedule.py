"""LR schedules: step / cosine / linear with linear warmup.

Parity with the reference's schedules:
  * step: x0.1 at epochs 8/12 and 11/12 (utils/general.py:479-501, the
    default — train.py:486);
  * cosine "one_cycle" (general.py:505-507);
  * linear (train.py:188);
  * warmup: 500-iteration linear ramp from lr0/3 (train.py:326-330 with
    hyp warmup_iters; the reference ramps from warmup_bias_lr=0 for biases
    and 0 for weights — we use a single ramp from ``warmup_init_factor*lr``).
All are step-indexed (not epoch-indexed): under jit the LR is a traced
function of the global step.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp


def build_lr_schedule(
    lr0: float,
    total_steps: int,
    steps_per_epoch: int,
    schedule: str = "step",
    decay_epochs_frac: Sequence[float] = (8 / 12, 11 / 12),
    decay_factor: float = 0.1,
    lrf: float = 0.1,
    warmup_iters: int = 500,
    warmup_init_factor: float = 1.0 / 3.0,
) -> Callable:
    total_epochs = max(total_steps // max(steps_per_epoch, 1), 1)

    def base(step):
        epoch = step / steps_per_epoch
        if schedule == "step":
            lr = lr0
            mult = jnp.ones(())
            for frac in decay_epochs_frac:
                boundary = frac * total_epochs
                mult = mult * jnp.where(epoch >= boundary, decay_factor, 1.0)
            return lr * mult
        if schedule == "cosine":
            t = jnp.clip(epoch / total_epochs, 0.0, 1.0)
            return lr0 * (((1 + jnp.cos(t * math.pi)) / 2) * (1 - lrf) + lrf)
        if schedule == "linear":
            t = jnp.clip(epoch / total_epochs, 0.0, 1.0)
            return lr0 * ((1 - t) * (1.0 - lrf) + lrf)
        raise ValueError(f"unknown schedule {schedule}")

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_init_factor + (1 - warmup_init_factor) * jnp.clip(
            step / max(warmup_iters, 1), 0.0, 1.0
        )
        return base(step) * jnp.where(step < warmup_iters, warm, 1.0)

    return lr_fn

"""Train state: params + batch stats + optimizer state + EMA, one pytree.

Replaces the reference's mutable torch Module/optimizer/ModelEMA trio
(train.py:128-199, utils/torch_utils.py:276-307) with a single immutable
pytree that jit/shard_map transform cleanly.

EMA parity: decay 0.9999 with the ramp ``d * (1 - exp(-updates / 2000))``
(torch_utils.py:292), applied to params AND batch stats (torch EMA deep-copies
the full model incl. buffers).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any
    best_fitness: jnp.ndarray

    def ema_decay_at(self, base_decay: float, ramp: int):
        upd = self.step.astype(jnp.float32)
        return base_decay * (1.0 - jnp.exp(-upd / ramp))


def create_train_state(params, batch_stats, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        ema_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        best_fitness=jnp.zeros((), jnp.float32),
    )


def ema_update(state: TrainState, new_params, new_batch_stats,
               base_decay: float = 0.9999, ramp: int = 2000,
               accumulate: int = 1) -> TrainState:
    """Blend EMA toward the current params.

    With gradient accumulation (``accumulate`` micro-steps per optimizer
    update, train.py:152-155/383 parity) the EMA only moves on sync
    micro-steps — the decay ramp counts optimizer updates, and non-sync
    steps use d=1 (a no-op blend), matching the reference's
    ``ema.update(model)`` placement inside the accumulate branch.
    """
    if accumulate > 1:
        upd = (state.step // accumulate).astype(jnp.float32)
        d = base_decay * (1.0 - jnp.exp(-upd / ramp))
        sync = (state.step % accumulate) == 0
        d = jnp.where(sync, d, 1.0)
    else:
        d = state.ema_decay_at(base_decay, ramp)

    def blend(ema, new):
        return ema * d + new.astype(ema.dtype) * (1.0 - d)

    return state.replace(
        ema_params=jax.tree_util.tree_map(blend, state.ema_params, new_params),
        ema_batch_stats=jax.tree_util.tree_map(
            blend, state.ema_batch_stats, new_batch_stats
        ),
    )

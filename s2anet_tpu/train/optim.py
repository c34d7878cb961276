"""Optimizer construction: SGD + momentum + weight decay + clipping + freeze.

Parity with the reference recipe (train.py:160-196, hyp yaml): SGD with
momentum 0.9, weight decay 1e-4 applied to conv/linear kernels only (the
reference puts BN weights and biases in no-decay param groups,
train.py:166-180), global grad-norm clip 35 (train.py:364-366).

Backbone stage freezing (backbone.py:324-331) is an optimizer mask here:
frozen parameters get zero updates, keeping the train step purely functional.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax


def _is_decay_param(path) -> bool:
    """Weight decay only on conv kernels, not biases/BN scales."""
    leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return leaf in ("kernel", "align_weight", "or_weight")


def decay_mask(params):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _is_decay_param(path), params
    )


def freeze_mask(params, frozen_stages: int = -1):
    """True = trainable. Freezes the ResNet stem + layers up to frozen_stages
    (reference semantics: frozen_stages=1 freezes conv1/bn1 and layer1)."""

    def trainable(path, _):
        if frozen_stages < 0:
            return True
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        if "backbone" not in keys:
            return True
        # only the module directly under `backbone` decides the stage —
        # blocks also contain submodules named conv1/bn1
        sub = keys[keys.index("backbone") + 1]
        if sub in ("conv1", "bn1"):
            return False  # stem frozen whenever frozen_stages >= 0
        if sub.startswith("layer"):
            stage = int(sub[5])
            return stage > frozen_stages
        return True

    return jax.tree_util.tree_map_with_path(trainable, params)


def build_optimizer(
    lr_schedule: Callable,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    grad_clip_norm: float = 35.0,
    params_example=None,
    frozen_stages: int = -1,
    accumulate: int = 1,
):
    txs = []
    if grad_clip_norm and grad_clip_norm > 0:
        txs.append(optax.clip_by_global_norm(grad_clip_norm))
    if weight_decay and weight_decay > 0:
        txs.append(
            optax.add_decayed_weights(
                weight_decay,
                mask=decay_mask(params_example) if params_example is not None else None,
            )
        )
    txs.append(optax.sgd(lr_schedule, momentum=momentum, nesterov=False))
    tx = optax.chain(*txs)
    if frozen_stages >= 0 and params_example is not None:
        frozen = jax.tree_util.tree_map(
            lambda t: "trainable" if t else "frozen",
            freeze_mask(params_example, frozen_stages),
        )
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, frozen
        )
    if accumulate > 1:
        # gradient accumulation to a nominal batch (train.py:152-155:
        # accumulate = max(round(nbs / batch_size), 1)); MultiSteps averages
        # micro-batch grads and applies the chain every `accumulate` steps
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx

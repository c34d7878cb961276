"""Detection losses — elementwise, mask-weighted, reduction left to callers.

Parity targets:
  * Focal loss: TF-addons-style sigmoid focal modulation of BCE-with-logits
    (/root/reference/utils/loss.py:31-58), gamma=2.0 alpha=0.5 in S2ANet
    (models/head.py:133-134).
  * Smooth L1: beta = 1/9, summed over the 5 box parameters per box
    (utils/loss.py:87-126).

Both are written against logits with numerically stable primitives and return
per-element / per-box values; the head applies masks and the
positives-count normalization (head.py:420-423).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits, targets):
    """Elementwise binary cross entropy on logits (stable)."""
    # max(x,0) - x*t + log(1 + exp(-|x|))
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def focal_loss_with_logits(logits, targets, gamma: float = 2.0, alpha: float = 0.5):
    """Sigmoid focal loss, elementwise (no reduction).

    ``loss = BCE(x, t) * (t*alpha + (1-t)*(1-alpha)) * (1 - p_t)^gamma`` with
    ``p_t = t*p + (1-t)*(1-p)``.
    """
    bce = bce_with_logits(logits, targets)
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1.0 - targets) * (1.0 - p)
    alpha_f = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    return bce * alpha_f * jnp.power(1.0 - p_t, gamma)


def smooth_l1_loss(pred, target, beta: float = 1.0 / 9.0):
    """Per-box smooth L1: elementwise Huber summed over the last axis.

    pred/target: ``[..., 5]`` -> ``[...]``.
    """
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return loss.sum(axis=-1)

import numpy as np
import jax.numpy as jnp
import torch

from s2anet_tpu.models.losses import (
    bce_with_logits,
    focal_loss_with_logits,
    smooth_l1_loss,
)


def torch_focal(pred, true, gamma=2.0, alpha=0.5):
    """Independent torch oracle of the reference FocalLoss (utils/loss.py:31-58)."""
    pred = torch.tensor(pred)
    true = torch.tensor(true)
    loss = torch.nn.functional.binary_cross_entropy_with_logits(
        pred, true, reduction="none"
    )
    p = torch.sigmoid(pred)
    p_t = true * p + (1 - true) * (1 - p)
    alpha_f = true * alpha + (1 - true) * (1 - alpha)
    return (loss * alpha_f * (1 - p_t) ** gamma).sum().item()


def torch_smooth_l1(pred, target, beta=1.0 / 9.0):
    pred = torch.tensor(pred)
    target = torch.tensor(target)
    diff = (pred - target).abs()
    loss = torch.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return loss.sum(dim=1).sum().item()


def test_bce_matches_torch(rng):
    x = rng.normal(size=(50, 15)).astype(np.float32) * 3
    t = (rng.uniform(size=(50, 15)) > 0.5).astype(np.float32)
    got = float(np.asarray(bce_with_logits(jnp.asarray(x), jnp.asarray(t)).sum()))
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(x), torch.tensor(t), reduction="sum"
    ).item()
    assert abs(got - want) / abs(want) < 1e-5


def test_focal_matches_torch(rng):
    x = rng.normal(size=(100, 15)).astype(np.float32) * 4
    t = (rng.uniform(size=(100, 15)) > 0.9).astype(np.float32)
    got = float(
        np.asarray(focal_loss_with_logits(jnp.asarray(x), jnp.asarray(t)).sum())
    )
    want = torch_focal(x, t)
    assert abs(got - want) / abs(want) < 1e-4


def test_smooth_l1_matches_torch(rng):
    p = rng.normal(size=(40, 5)).astype(np.float32)
    t = rng.normal(size=(40, 5)).astype(np.float32)
    got = float(np.asarray(smooth_l1_loss(jnp.asarray(p), jnp.asarray(t)).sum()))
    want = torch_smooth_l1(p, t)
    assert abs(got - want) / abs(want) < 1e-5


def test_smooth_l1_regimes():
    beta = 1.0 / 9.0
    # quadratic region
    got = float(np.asarray(smooth_l1_loss(
        jnp.zeros((1, 5)), jnp.full((1, 5), 0.05), beta)))
    assert abs(got - 5 * 0.5 * 0.05 ** 2 / beta) < 1e-6
    # linear region
    got = float(np.asarray(smooth_l1_loss(
        jnp.zeros((1, 5)), jnp.full((1, 5), 1.0), beta)))
    assert abs(got - 5 * (1.0 - 0.5 * beta)) < 1e-6

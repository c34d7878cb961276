"""End-to-end integration: tiny synthetic training run + eval round trip.

The framework's answer to the reference using full DOTA val as its de-facto
acceptance test (SURVEY §4): synthesize chips with crisp rotated boxes, run
real train steps through the data-parallel step function, check the loss
moves, then run the eval pipeline (decode + NMS + polygon mAP) end to end.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from s2anet_tpu.models.detector import S2ANet
from s2anet_tpu.models.head import compute_s2anet_loss
from s2anet_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from s2anet_tpu.parallel.step import make_eval_step, make_train_step
from s2anet_tpu.train.optim import build_optimizer
from s2anet_tpu.train.schedule import build_lr_schedule
from s2anet_tpu.train.state import create_train_state

IMG = 128
NC = 3


def synth_batch(rng, batch=8, g=8):
    """Images with one bright rotated rectangle each on dark noise."""
    imgs = rng.uniform(0.0, 0.15, (batch, IMG, IMG, 3)).astype(np.float32)
    gtb = np.zeros((batch, g, 5), np.float32)
    gtc = np.zeros((batch, g), np.int32)
    gtm = np.zeros((batch, g), bool)
    for b in range(batch):
        cx, cy = rng.uniform(35, IMG - 35, 2)
        w, h = rng.uniform(30, 50), rng.uniform(12, 22)
        th = rng.uniform(-0.7, 2.3)
        cls = int(rng.integers(0, NC))
        # paint the box interior
        ys, xs = np.mgrid[0:IMG, 0:IMG]
        dx = xs - cx
        dy = ys - cy
        u = dx * np.cos(th) + dy * np.sin(th)
        v = -dx * np.sin(th) + dy * np.cos(th)
        mask = (np.abs(u) < w / 2) & (np.abs(v) < h / 2)
        imgs[b][mask] = 0.2 + 0.25 * cls
        gtb[b, 0] = [cx, cy, w, h, th]
        gtc[b, 0] = cls
        gtm[b, 0] = True
    return {
        "imgs": imgs,
        "gt_boxes": gtb,
        "gt_classes": gtc,
        "gt_mask": gtm,
    }


@pytest.mark.slow
def test_train_eval_roundtrip(rng):
    model = S2ANet(backbone_name="resnet18", num_classes=NC)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), train=False
    )
    lr_fn = build_lr_schedule(0.01, 100, 10, warmup_iters=0)
    tx = build_optimizer(lr_fn, params_example=variables["params"],
                         weight_decay=0.0)
    state = create_train_state(
        variables["params"], variables.get("batch_stats", {}), tx
    )
    mesh = make_mesh()
    state = replicate_state(mesh, state)
    step = make_train_step(
        model, tx, imgs_size=(IMG, IMG), num_classes=NC,
        compute_dtype=jnp.float32, mesh=mesh, donate=False,
    )

    losses = []
    for i in range(8):
        batch = shard_batch(mesh, synth_batch(rng))
        state, items = step(state, batch)
        losses.append(float(np.asarray(items).sum()))
    assert np.isfinite(losses).all()
    # optimization must make progress on this trivial task
    assert np.mean(losses[-2:]) < np.mean(losses[:2]), losses

    # eval path end to end (shapes + on-device NMS + host conversion)
    eval_step = make_eval_step(model, compute_dtype=jnp.float32, mesh=mesh,
                               use_ema=True, max_per_img=50)
    det_boxes, det_labels, det_valid = eval_step(
        state, shard_batch(mesh, synth_batch(rng)["imgs"])
    )
    det_boxes = np.asarray(jax.device_get(det_boxes))
    assert det_boxes.shape == (8, 50, 6)
    assert np.isfinite(det_boxes).all()

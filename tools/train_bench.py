#!/usr/bin/env python
"""Train-step wall/device benchmark on one chip (the BENCH.md methodology).

Measures the full production train step — forward + assignment + loss +
backward + clip + SGD + EMA — for S2ANet R-50 at 1024^2, batch 8 bf16:

  * forced-sync ms/step (np.asarray on the loss items every step; includes
    the tunnel's dispatch stall — comparable to BENCH.md's per-step walls);
  * pipelined ms/step (sync only at the end — the Trainer's real rate);
  * optionally an xplane trace of a few steps (--trace DIR).

Knobs mirror the round-4 experiments: --bn-stats-images (SampledBatchNorm),
--clamp (align_offset_clamp), --deform {auto,hat,gather}, --batch, --size,
--backbone. Earlier rounds ran this from uncommitted _dbg/ scripts; this is
the committed version so numbers stay reproducible.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# runnable as `python tools/train_bench.py` from the repo root (PYTHONPATH
# breaks the axon TPU plugin — see .claude/skills/verify/SKILL.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--bn-stats-images", type=int, default=0)
    p.add_argument("--bn-impl", default="auto",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--clamp", type=float, default=6.0)
    p.add_argument("--deform", default="auto",
                   choices=["auto", "hat", "gather"])
    p.add_argument("--trace", default="", help="xplane trace output dir")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from s2anet_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from s2anet_tpu.models.detector import S2ANet
    from s2anet_tpu.parallel.step import make_train_step
    from s2anet_tpu.train.optim import build_optimizer
    from s2anet_tpu.train.schedule import build_lr_schedule
    from s2anet_tpu.train.state import create_train_state
    from s2anet_tpu.utils.config import ModelConfig

    b, s = args.batch, args.size
    model = S2ANet(
        backbone_name=args.backbone, num_classes=15,
        deform_impl=args.deform, align_offset_clamp=args.clamp,
        bn_stats_images=args.bn_stats_images, bn_impl=args.bn_impl,
    )
    mc = ModelConfig(backbone=args.backbone,
                     align_offset_clamp=args.clamp,
                     bn_stats_images=args.bn_stats_images,
                     bn_impl=args.bn_impl)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, s, s, 3), jnp.bfloat16),
                           train=False)
    lr_fn = build_lr_schedule(0.005, 1000, 100, warmup_iters=0)
    tx = build_optimizer(lr_fn, params_example=variables["params"],
                         grad_clip_norm=35.0)
    state = create_train_state(
        variables["params"], variables.get("batch_stats", {}), tx)

    rng = np.random.default_rng(0)
    n_distinct = 4  # distinct batches so nothing is loop-invariant
    batches = []
    for i in range(n_distinct):
        gtb = np.zeros((b, 64, 5), np.float32)
        gtc = np.zeros((b, 64), np.int32)
        gtm = np.zeros((b, 64), bool)
        for k in range(b):
            n_gt = int(rng.integers(2, 20))
            gtb[k, :n_gt, 0] = rng.uniform(100, s - 100, n_gt)
            gtb[k, :n_gt, 1] = rng.uniform(100, s - 100, n_gt)
            gtb[k, :n_gt, 2] = rng.uniform(20, 200, n_gt)
            gtb[k, :n_gt, 3] = rng.uniform(10, 100, n_gt)
            gtb[k, :n_gt, 4] = rng.uniform(-1.5, 1.5, n_gt)
            gtm[k, :n_gt] = True
        batches.append({
            "imgs": jnp.asarray(
                rng.uniform(size=(b, s, s, 3)).astype(np.float32)
            ).astype(jnp.bfloat16),
            "gt_boxes": jnp.asarray(gtb),
            "gt_classes": jnp.asarray(gtc),
            "gt_mask": jnp.asarray(gtm),
        })

    step = make_train_step(
        model, tx, imgs_size=(s, s), num_classes=15, model_cfg=mc,
        compute_dtype=jnp.bfloat16, donate=True,
    )

    t0 = time.perf_counter()
    state, items = step(state, batches[0])
    np.asarray(items)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # forced-sync per-step walls
    walls = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, items = step(state, batches[i % n_distinct])
        np.asarray(items)
        walls.append((time.perf_counter() - t0) * 1e3)
    walls = sorted(walls)
    med = walls[len(walls) // 2]

    # pipelined rate: dispatch back-to-back, sync once
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, items = step(state, batches[i % n_distinct])
    np.asarray(items)
    pipe = (time.perf_counter() - t0) / args.steps * 1e3

    print(f"forced-sync: median {med:.1f} ms/step (min {walls[0]:.1f}), "
          f"pipelined {pipe:.1f} ms/step = {1e3 * b / pipe:.1f} img/s "
          f"(bn_stats_images={args.bn_stats_images}, bn_impl={args.bn_impl}, "
          f"clamp={args.clamp}, deform={args.deform})")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for i in range(3):
                state, items = step(state, batches[i % n_distinct])
            np.asarray(items)
        print(f"trace written to {args.trace}", file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""End-to-end inference throughput benchmark on one TPU chip.

Measures the BASELINE.json headline: 1024x1024-chip detection throughput
(chips/sec/chip) for S2ANet R-50-FPN — backbone + FPN + FAM/ODM head with
AlignConv deformable sampling and ARF conv + decode + multiclass rotated NMS,
all inside one jit region, bf16 compute, batch 16 (the reference eval
protocol: fp16 batch 16, val.py:437-440).

``vs_baseline`` normalizes against 25 chips/sec — the reference PyTorch
implementation's approximate fp16 batch-16 throughput on its published
setup (it publishes no latency numbers; 25/s is the common measured figure
for torch R-50-FPN S2ANet at 1024^2 on a V100-class GPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_CHIPS_PER_SEC = 25.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from s2anet_tpu.models.detector import S2ANet
    from s2anet_tpu.models.head import s2anet_get_bboxes

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = 1024
    model = S2ANet(backbone_name="resnet50", num_classes=15)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.uniform(size=(batch, size, size, 3)).astype(np.float32)
    )
    print(f"init (batch={batch}, {size}x{size}, "
          f"{jax.devices()[0].platform})...", file=sys.stderr)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3), jnp.bfloat16),
                           train=False)

    @jax.jit
    def infer(variables, imgs):
        out = model.apply(variables, imgs.astype(jnp.bfloat16), train=False)
        return s2anet_get_bboxes(out)

    t0 = time.perf_counter()
    det = infer(variables, imgs)
    jax.block_until_ready(det)
    print(f"compile+first batch: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # warmup
    for _ in range(2):
        jax.block_until_ready(infer(variables, imgs))

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        det = infer(variables, imgs)
    jax.block_until_ready(det)
    dt = time.perf_counter() - t0
    chips_per_sec = batch * iters / dt

    print(json.dumps({
        "metric": "s2anet_r50_1024_infer_throughput",
        "value": round(chips_per_sec, 2),
        "unit": "chips/sec/chip",
        "vs_baseline": round(chips_per_sec / BASELINE_CHIPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

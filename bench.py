#!/usr/bin/env python
"""End-to-end inference throughput benchmark on one TPU chip.

Measures the BASELINE.json headline: 1024x1024-chip detection throughput
(chips/sec/chip) for S2ANet R-50-FPN — backbone + FPN + FAM/ODM head with
AlignConv deformable sampling and ARF conv + decode + multiclass rotated NMS,
all inside one jit region, bf16 compute, batch 8 (the reference eval protocol
is fp16 batch 16, val.py:437-440; batch has little effect at this size).

Methodology: the whole pipeline is scanned over n batches *inside one jit
region* and two scan lengths are differenced — this removes host->device
dispatch and transfer overhead (which on tunneled devices can exceed the
compute itself) and measures pure device throughput, the number that governs
production serving where weights stay resident.

``vs_baseline`` normalizes against 25 chips/sec — the reference PyTorch
implementation publishes no latency numbers; 25/s is the typical measured
fp16 batch-16 figure for torch S2ANet R-50-FPN at 1024^2 on a V100-class GPU.

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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    size = 1024
    n_short, n_long = 2, 6
    model = S2ANet(backbone_name="resnet50", num_classes=15)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.uniform(size=(n_long, batch, size, size, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    print(f"init (batch={batch}, {size}x{size}, "
          f"{jax.devices()[0].platform})...", file=sys.stderr)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3), jnp.bfloat16),
                           train=False)

    def make_scan(n):
        @jax.jit
        def fn(variables, imgs):
            def body(c, im):
                out = model.apply(variables, im, train=False)
                det_boxes, det_labels, det_valid = s2anet_get_bboxes(
                    out, pre_nms_cap=2048
                )
                return c + det_boxes.sum().astype(jnp.float32), ()
            s, _ = jax.lax.scan(body, 0.0, imgs)
            return s
        return fn

    f_short = make_scan(n_short)
    f_long = make_scan(n_long)
    t0 = time.perf_counter()
    float(f_short(variables, imgs[:n_short]))
    float(f_long(variables, imgs))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    ts, tl = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f_short(variables, imgs[:n_short]))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(f_long(variables, imgs))
        tl.append(time.perf_counter() - t0)
    dt = min(tl) - min(ts)
    chips = (n_long - n_short) * batch
    chips_per_sec = chips / dt

    print(json.dumps({
        "metric": "s2anet_r50_1024_infer_throughput_e2e",
        "value": round(chips_per_sec, 2),
        "unit": "chips/sec/chip",
        "vs_baseline": round(chips_per_sec / BASELINE_CHIPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

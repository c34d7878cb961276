#!/usr/bin/env python
"""Visualize ground-truth labels and/or detections on chips.

Parity: /root/reference/visual_labels_and_detect_results.py — draws rotated
ground truth (green-coded by class) and model detections onto images.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from s2anet_tpu.data.dota import DotaDataset
from s2anet_tpu.data.split import DOTA_CLASSES
from s2anet_tpu.utils.plots import draw_rboxes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True, help="images dir or list txt")
    p.add_argument("--out-dir", default="runs/visual")
    p.add_argument("--weights", default="", help="optional checkpoint to draw detections")
    p.add_argument("--num", type=int, default=20)
    p.add_argument("--img-size", type=int, default=1024)
    p.add_argument("--conf", type=float, default=0.3)
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--num-classes", type=int, default=15)
    p.add_argument("--names", default="dota",
                   help="class preset (dota, dota-v1.5, dota-v2.0, hrsc) "
                        "or ignored when it matches --num-classes")
    a = p.parse_args()

    import cv2

    out_dir = Path(a.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    from s2anet_tpu.utils.config import NAMES_PRESETS

    names = NAMES_PRESETS.get(a.names.lower(), DOTA_CLASSES)
    if len(names) != a.num_classes:  # fall back to numeric labels
        names = [str(i) for i in range(a.num_classes)]
    ds = DotaDataset(a.data_root, img_size=a.img_size, augment=False,
                     class_names=names)

    eval_fn = None
    if a.weights:
        import jax
        import jax.numpy as jnp

        from s2anet_tpu.models.detector import S2ANet
        from s2anet_tpu.models.head import s2anet_get_bboxes
        from s2anet_tpu.train.checkpoint import load_checkpoint
        from s2anet_tpu.train.optim import build_optimizer
        from s2anet_tpu.train.state import create_train_state

        model = S2ANet(backbone_name=a.backbone,
                       num_classes=a.num_classes)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, a.img_size, a.img_size, 3)), train=False)
        tx = build_optimizer(lambda _: 0.0, params_example=variables["params"])
        state = load_checkpoint(
            a.weights,
            create_train_state(variables["params"],
                               variables.get("batch_stats", {}), tx))

        @jax.jit
        def infer(imgs):
            out = model.apply(
                {"params": state.ema_params,
                 "batch_stats": state.ema_batch_stats},
                imgs.astype(jnp.bfloat16), train=False)
            return s2anet_get_bboxes(out)

        eval_fn = infer

    for i in range(min(a.num, len(ds))):
        s = ds.get_sample(i)
        img = (s["imgs"][:, :, ::-1] * 255).astype(np.uint8)  # RGB->BGR
        gt = s["gt_boxes"][s["gt_mask"]]
        gt_cls = s["gt_classes"][s["gt_mask"]]
        vis = draw_rboxes(img, gt, gt_cls, names=names)
        if eval_fn is not None:
            det_boxes, det_labels, det_valid = map(
                np.asarray, eval_fn(s["imgs"][None]))
            keep = det_valid[0] & (det_boxes[0, :, 5] >= a.conf)
            vis = draw_rboxes(vis, det_boxes[0][keep][:, :5],
                              det_labels[0][keep],
                              det_boxes[0][keep][:, 5], names=names)
        name = Path(s["path"]).stem
        cv2.imwrite(str(out_dir / f"{name}.jpg"), vis)
    print(f"wrote {min(a.num, len(ds))} visualizations to {out_dir}")


if __name__ == "__main__":
    main()

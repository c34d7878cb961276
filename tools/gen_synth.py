#!/usr/bin/env python
"""Generate the synthetic acceptance dataset (BENCH.md "End-to-end training
acceptance").

Chips with 1-3 crisp, class-colored rotated rectangles on dark noise —
trivially learnable, so a from-scratch R-18 run through the real train.py
CLI must converge to mAP50 ~ 1.0 (the framework's closed-loop train->val
acceptance test; the reference's analogue is training on full DOTA).

Layout matches the YOLO-OBB convention data/dota.py expects:

    <out>/train/images/*.png   <out>/train/labels/*.txt
    <out>/val/images/*.png     <out>/val/labels/*.txt

with one label line per box: ``cls x1 y1 x2 y2 x3 y3 x4 y4`` (normalized
polygon corners).

Usage (the round-4 acceptance recipe — 800 imgs x 48 epochs = 4800 steps):

    python tools/gen_synth.py --out /tmp/synth_accept
    python train.py --config configs/synth_accept.yaml \
        --data-root /tmp/synth_accept/train/images \
        --val-root /tmp/synth_accept/val/images \
        --save-dir runs/accept/clamp6
"""

from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import numpy as np

# distinct fill colors per class (BGR for cv2), bright vs the dark noise
CLASS_COLORS = [
    (60, 60, 230),    # class 0: red-ish
    (80, 220, 80),    # class 1: green-ish
    (230, 160, 60),   # class 2: blue-ish
    (60, 220, 220),   # class 3: yellow-ish
    (220, 80, 220),   # class 4: magenta-ish
    (230, 230, 230),  # class 5: white-ish
    (60, 140, 250),   # class 6: orange-ish
    (200, 230, 140),  # class 7: teal-ish
    (120, 90, 250),   # class 8: pink-ish
    (250, 220, 200),  # class 9: pale-blue-ish
]


def rbox_corners(cx, cy, w, h, th):
    """[4, 2] polygon corners of a rotated rect, consistent ring order."""
    c, s = np.cos(th), np.sin(th)
    dx, dy = w / 2.0, h / 2.0
    pts = np.array([[-dx, -dy], [dx, -dy], [dx, dy], [-dx, dy]], np.float64)
    rot = np.array([[c, -s], [s, c]])
    return pts @ rot.T + [cx, cy]


def synth_image(rng, size, num_classes, max_boxes, min_boxes=1,
                box_scale=(0.15, 0.38), crowd=False):
    """One chip: dark noise + min..max_boxes filled rotated rects.

    ``crowd=True`` is the DENSE-SCENE regime (DOTA chips routinely carry
    100+ instances): small boxes, random z-order, overlap PERMITTED up to
    a near-touch spacing (0.35x circumcircles vs the sparse mode's 0.62x
    clear separation) so crowd suppression, the assigner's gt_tier>64
    branch, the NMS small-tier large branch and the per-image caps all get
    real work. Boxes are drawn back-to-front; a label is kept only while
    its box stays mostly visible (the later fills overwrite earlier pixels,
    mimicking occlusion, so the discriminator is NOT saturated — mAP sits
    off the 1.0 ceiling, giving accuracy A/Bs a usable operating point).
    """
    img = rng.integers(0, 50, (size, size, 3)).astype(np.uint8)
    n = int(rng.integers(min_boxes, max_boxes + 1))
    lines = []
    centers = []
    sep = 0.35 if crowd else 0.62
    for _ in range(n):
        for _attempt in range(40):
            w = rng.uniform(*box_scale) * size
            h = rng.uniform(0.35, 0.8) * w
            margin = 0.6 * np.hypot(w, h)
            if size - 2 * margin <= 1:
                continue
            cx, cy = rng.uniform(margin, size - margin, 2)
            # spacing rule: sparse mode keeps circumcircles clearly apart;
            # crowd mode only forbids near-total overlap
            if all(np.hypot(cx - x, cy - y) > sep * (np.hypot(w, h) + d)
                   for x, y, d in centers):
                break
        else:
            continue
        th = rng.uniform(-np.pi / 2, np.pi / 2)
        cls = int(rng.integers(0, num_classes))
        corners = rbox_corners(cx, cy, w, h, th)
        cv2.fillPoly(img, [np.round(corners).astype(np.int32)],
                     CLASS_COLORS[cls % len(CLASS_COLORS)])
        centers.append((cx, cy, np.hypot(w, h)))
        coords = " ".join(f"{v / size:.6f}" for v in corners.reshape(-1))
        lines.append(f"{cls} {coords}")
    return img, lines


def write_split(root: Path, n: int, rng, size, num_classes, max_boxes,
                min_boxes=1, box_scale=(0.15, 0.38), crowd=False):
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "labels").mkdir(parents=True, exist_ok=True)
    for i in range(n):
        img, lines = synth_image(rng, size, num_classes, max_boxes,
                                 min_boxes, box_scale, crowd)
        cv2.imwrite(str(root / "images" / f"im{i:05d}.png"), img)
        (root / "labels" / f"im{i:05d}.txt").write_text(
            "\n".join(lines) + "\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/synth_accept")
    p.add_argument("--n-train", type=int, default=800)
    p.add_argument("--n-val", type=int, default=160)
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--num-classes", type=int, default=3)
    p.add_argument("--max-boxes", type=int, default=3)
    p.add_argument("--min-boxes", type=int, default=1)
    p.add_argument("--dense", action="store_true",
                   help="dense-scene preset (configs/synth_accept_dense."
                        "yaml): 100-140 small overlapping boxes/chip, "
                        "8 classes — exercises gt_tier>64, the NMS "
                        "small-tier large branch and the per-image caps")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if args.dense:
        args.num_classes = max(args.num_classes, 8)
        if args.max_boxes <= 3:  # untouched default -> dense preset counts
            args.min_boxes, args.max_boxes = 100, 140
        box_scale, crowd = (0.04, 0.11), True
    else:
        box_scale, crowd = (0.15, 0.38), False

    rng = np.random.default_rng(args.seed)
    out = Path(args.out)
    kw = dict(min_boxes=args.min_boxes, box_scale=box_scale, crowd=crowd)
    write_split(out / "train", args.n_train, rng, args.img_size,
                args.num_classes, args.max_boxes, **kw)
    write_split(out / "val", args.n_val, rng, args.img_size,
                args.num_classes, args.max_boxes, **kw)
    print(f"wrote {args.n_train} train + {args.n_val} val chips "
          f"({args.img_size}^2, {args.num_classes} classes, "
          f"{args.min_boxes}-{args.max_boxes} boxes) under {out}")


if __name__ == "__main__":
    main()

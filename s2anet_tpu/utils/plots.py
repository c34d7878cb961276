"""Visualization: rotated-box overlays, batch mosaics, label stats, PR curves.

Parity: /root/reference/utils/plots.py:175 (plot_images_rotate),
:338 (plot_labels_rotate), :394 (plot_results) and val.py:359-368 (PR curves).
matplotlib/cv2 are imported lazily; all functions are host-side.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from ..ops.polyiou_ref import rbox_vertices_np

# Ultralytics-style color palette
_PALETTE = [
    (255, 56, 56), (255, 157, 151), (255, 112, 31), (255, 178, 29),
    (207, 210, 49), (72, 249, 10), (146, 204, 23), (61, 219, 134),
    (26, 147, 52), (0, 212, 187), (44, 153, 168), (0, 194, 255),
    (52, 69, 147), (100, 115, 255), (0, 24, 236), (132, 56, 255),
]


def color(i: int):
    return _PALETTE[i % len(_PALETTE)]


def draw_rboxes(img: np.ndarray, rboxes, classes=None, scores=None,
                names: Optional[Sequence[str]] = None, thickness: int = 2):
    """Draw rotated boxes onto an image (BGR uint8, modified copy returned)."""
    import cv2

    img = img.copy()
    rboxes = np.asarray(rboxes, np.float64).reshape(-1, 5)
    polys = rbox_vertices_np(rboxes).astype(np.int32)
    for k, poly in enumerate(polys):
        cid = int(classes[k]) if classes is not None else 0
        cv2.polylines(img, [poly.reshape(-1, 1, 2)], True, color(cid), thickness)
        if names is not None or scores is not None:
            label = names[cid] if names is not None else str(cid)
            if scores is not None:
                label += f" {float(scores[k]):.2f}"
            org = (int(poly[:, 0].min()), max(int(poly[:, 1].min()) - 3, 10))
            cv2.putText(img, label, org, cv2.FONT_HERSHEY_SIMPLEX, 0.45,
                        color(cid), 1, cv2.LINE_AA)
    return img


def plot_images_grid(imgs: np.ndarray, targets_per_img, save_path,
                     names=None, max_images: int = 16, max_size: int = 640):
    """Mosaic of training batch images with rotated gt overlays
    (plot_images_rotate analogue). imgs: [B,H,W,3] float 0..1 RGB."""
    import cv2

    b = min(len(imgs), max_images)
    n = int(np.ceil(np.sqrt(b)))
    h, w = imgs.shape[1:3]
    scale = min(max_size / max(h, w), 1.0)
    hs, ws = int(h * scale), int(w * scale)
    mosaic = np.full((n * hs, n * ws, 3), 255, np.uint8)
    for k in range(b):
        img = (imgs[k, :, :, ::-1] * 255).astype(np.uint8)  # RGB->BGR
        boxes, classes = targets_per_img[k]
        if scale != 1.0:
            img = cv2.resize(img, (ws, hs))
            boxes = np.asarray(boxes, np.float64).copy()
            if len(boxes):
                boxes[:, :4] *= scale
        img = draw_rboxes(img, boxes, classes, names=names, thickness=1)
        r, c = divmod(k, n)
        mosaic[r * hs:(r + 1) * hs, c * ws:(c + 1) * ws] = img
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(save_path), mosaic)
    return mosaic


def plot_label_stats(all_boxes: np.ndarray, all_classes: np.ndarray,
                     save_path, num_classes: int = 15):
    """Label distribution histograms (plot_labels_rotate analogue)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(10, 8))
    axes[0, 0].hist(all_classes, bins=np.arange(num_classes + 1) - 0.5)
    axes[0, 0].set_title("classes")
    if len(all_boxes):
        axes[0, 1].hist2d(all_boxes[:, 0], all_boxes[:, 1], bins=50)
        axes[0, 1].set_title("xy centers")
        axes[1, 0].hist2d(all_boxes[:, 2], all_boxes[:, 3], bins=50)
        axes[1, 0].set_title("wh")
        axes[1, 1].hist(all_boxes[:, 4], bins=60)
        axes[1, 1].set_title("theta")
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=120)
    plt.close(fig)


def plot_pr_curves(per_class_results: dict, save_path):
    """Per-class PR curves + mean (val.py:359-368 analogue)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    for cname, res in per_class_results.items():
        if len(res["rec"]):
            ax.plot(res["rec"], res["prec"], alpha=0.6,
                    label=f"{cname} {res['ap']:.3f}")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1.02)
    ax.legend(fontsize=7, loc="lower left")
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=120)
    plt.close(fig)


def plot_results_csv(csv_path, save_path):
    """Training curves from results.csv (plot_results analogue)."""
    import csv as _csv

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(csv_path) as f:
        rows = list(_csv.DictReader(f))
    if not rows:
        return
    keys = [k for k in rows[0] if k != "epoch_or_step"]
    n = len(keys)
    cols = 4
    r = int(np.ceil(n / cols))
    fig, axes = plt.subplots(r, cols, figsize=(4 * cols, 3 * r), squeeze=False)
    xs = [float(row["epoch_or_step"]) for row in rows]
    for i, k in enumerate(keys):
        ax = axes[i // cols][i % cols]
        try:
            ys = [float(row[k]) for row in rows]
        except (ValueError, TypeError):
            continue
        ax.plot(xs, ys, marker=".")
        ax.set_title(k, fontsize=9)
    fig.tight_layout()
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=120)
    plt.close(fig)

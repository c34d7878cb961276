#!/usr/bin/env python
"""DOTA labelTxt -> YOLO-rotated label converter (offline data prep step 2).

Parity: /root/reference/DOTA_devkit/2_convert_dota_to_yolo.py:15-104 —
polygons normalized by image size, one line per instance
``cls x1 y1 x2 y2 x3 y3 x4 y4``; difficult in {1, 2} filtered out; images
without remaining labels moved aside (optional here: --keep-empty).
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from s2anet_tpu.data.split import DOTA_CLASSES, parse_dota_label


def convert(image_dir, label_dir, out_label_dir, class_names=DOTA_CLASSES,
            max_difficult: int = 0, keep_empty: bool = False,
            empty_dir: str = ""):
    import cv2

    out = Path(out_label_dir)
    out.mkdir(parents=True, exist_ok=True)
    name_to_id = {n: i for i, n in enumerate(class_names)}
    n_imgs = n_objs = n_empty = 0
    for img_path in sorted(Path(image_dir).iterdir()):
        if img_path.suffix.lower() not in (".png", ".jpg", ".jpeg", ".tif", ".bmp"):
            continue
        lbl = Path(label_dir) / (img_path.stem + ".txt")
        img = cv2.imread(str(img_path))
        if img is None:
            continue
        h, w = img.shape[:2]
        lines = []
        for obj in (parse_dota_label(lbl) if lbl.exists() else []):
            if obj["difficult"] > max_difficult:
                continue
            cid = name_to_id.get(obj["name"])
            if cid is None:
                continue
            poly = obj["poly"].astype(float).copy()
            poly[0::2] /= w
            poly[1::2] /= h
            poly = poly.clip(0.0, 1.0)
            coords = " ".join(f"{v:.6f}" for v in poly)
            lines.append(f"{cid} {coords}")
            n_objs += 1
        if lines or keep_empty:
            (out / (img_path.stem + ".txt")).write_text("\n".join(lines))
            n_imgs += 1
        else:
            n_empty += 1
            if empty_dir:
                Path(empty_dir).mkdir(parents=True, exist_ok=True)
                shutil.move(str(img_path), str(Path(empty_dir) / img_path.name))
    return n_imgs, n_objs, n_empty


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-dir", required=True)
    p.add_argument("--label-dir", required=True)
    p.add_argument("--out-label-dir", required=True)
    p.add_argument("--max-difficult", type=int, default=0)
    p.add_argument("--keep-empty", action="store_true")
    p.add_argument("--empty-dir", default="")
    a = p.parse_args()
    n_imgs, n_objs, n_empty = convert(
        a.image_dir, a.label_dir, a.out_label_dir,
        max_difficult=a.max_difficult, keep_empty=a.keep_empty,
        empty_dir=a.empty_dir,
    )
    print(f"converted {n_imgs} images / {n_objs} objects; {n_empty} empty")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Convert HRSC2016 annotations to the YOLO-rotated layout this framework
trains on — making HRSC a fully trainable dataset end to end (the reference
only ships a — mmdet-broken — HRSC *evaluation* script,
/root/reference/DOTA_devkit/hrsc2016_evaluation.py; its training story for
HRSC does not exist).

Input layout (official HRSC2016):
  <root>/AllImages/100000001.bmp ...      (or .jpg/.png)
  <root>/Annotations/100000001.xml ...    (HRSC_Object mbox_* rotated boxes)
  <root>/ImageSets/trainval.txt, test.txt (image ids, one per line; optional)

Output (images symlinked/copied, labels written):
  <out>/images/<id>.<ext>
  <out>/labels/<id>.txt        "0 x1 y1 x2 y2 x3 y3 x4 y4" normalized
  <out>/train.txt / val.txt    image-path lists (when ImageSets exist)

Difficult objects are dropped by default (the DOTA converter's policy,
DOTA_devkit/2_convert_dota_to_yolo.py); keep them with --keep-difficult.
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from s2anet_tpu.eval.hrsc import parse_hrsc_xml  # noqa: E402

IMG_EXTS = (".bmp", ".jpg", ".jpeg", ".png", ".tif")


def _image_size(root) -> tuple:
    w = root.find("Img_SizeWidth")
    h = root.find("Img_SizeHeight")
    if w is not None and h is not None:
        return int(w.text), int(h.text)
    return 0, 0


def convert_one(xml_path: Path, img_path: Path, out_images: Path,
                out_labels: Path, keep_difficult: bool,
                link_images: bool) -> int:
    import xml.etree.ElementTree as ET

    root = ET.parse(str(xml_path)).getroot()
    w0, h0 = _image_size(root)
    if not (w0 and h0):
        from PIL import Image

        with Image.open(img_path) as im:
            w0, h0 = im.size

    rows = []
    for obj in parse_hrsc_xml(xml_path):
        if obj["difficult"] and not keep_difficult:
            continue
        poly = np.asarray(obj["poly"], np.float64).copy()
        poly[0::2] /= w0
        poly[1::2] /= h0
        if (poly < -0.01).any() or (poly > 1.01).any():
            continue  # degenerate / out-of-frame annotation
        poly = poly.clip(0.0, 1.0)
        rows.append("0 " + " ".join(f"{v:.6f}" for v in poly))

    dst_img = out_images / img_path.name
    if not dst_img.exists():
        if link_images:
            try:
                dst_img.symlink_to(img_path.resolve())
            except OSError:
                shutil.copy2(img_path, dst_img)
        else:
            shutil.copy2(img_path, dst_img)
    (out_labels / f"{img_path.stem}.txt").write_text(
        "\n".join(rows) + ("\n" if rows else "")
    )
    return len(rows)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hrsc-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--keep-difficult", action="store_true")
    p.add_argument("--copy-images", action="store_true",
                   help="copy instead of symlink")
    opt = p.parse_args()

    root = Path(opt.hrsc_root)
    images = root / "AllImages"
    annos = root / "Annotations"
    out = Path(opt.out)
    out_images, out_labels = out / "images", out / "labels"
    out_images.mkdir(parents=True, exist_ok=True)
    out_labels.mkdir(parents=True, exist_ok=True)

    n_img = n_obj = 0
    by_id = {}
    for img in sorted(images.iterdir()):
        if img.suffix.lower() not in IMG_EXTS:
            continue
        xml = annos / f"{img.stem}.xml"
        if not xml.exists():
            continue
        n_obj += convert_one(xml, img, out_images, out_labels,
                             opt.keep_difficult, not opt.copy_images)
        by_id[img.stem] = out_images / img.name
        n_img += 1

    sets = root / "ImageSets"
    for split, out_name in (("trainval", "train.txt"), ("train", "train.txt"),
                            ("val", "val.txt"), ("test", "val.txt")):
        f = sets / f"{split}.txt"
        if f.exists():
            ids = [l.strip() for l in f.read_text().splitlines() if l.strip()]
            paths = [str(by_id[i]) for i in ids if i in by_id]
            (out / out_name).write_text("\n".join(paths) + "\n")
    print(f"converted {n_img} images / {n_obj} objects -> {out}")


if __name__ == "__main__":
    main()

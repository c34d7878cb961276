#!/usr/bin/env python
"""One-shot DOTA data prep: split into chips + convert labels + write lists.

Parity with the reference's 3-step offline pipeline
(/root/reference/DOTA_devkit/1_prepare_dota1_ms.py, 2_convert_dota_to_yolo.py,
3_create_txt.py): multi-scale chip splitting (gap 200, 1024^2), YOLO label
conversion, and train/val list files.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from s2anet_tpu.data.split import split_dataset
from convert_dota_to_yolo import convert


def prepare(src_root, out_root, subsize=1024, gap=200, rates=(1.0,),
            splits=("train", "val"), workers=8):
    src_root = Path(src_root)
    out_root = Path(out_root)
    for split in splits:
        img_dir = src_root / split / "images"
        lbl_dir = src_root / split / "labelTxt"
        split_out = out_root / f"{split}_split"
        n = split_dataset(img_dir, lbl_dir if lbl_dir.exists() else None,
                          split_out, subsize=subsize, gap=gap, rates=rates,
                          num_workers=workers)
        print(f"{split}: {n} chips")
        convert(split_out / "images", split_out / "labelTxt",
                split_out / "labels", keep_empty=(split != "train"))
        # image list txt (3_create_txt.py analogue)
        imgs = sorted((split_out / "images").iterdir())
        (out_root / f"{split}_split.txt").write_text(
            "\n".join(str(p) for p in imgs)
        )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="DOTA root with {train,val}/{images,labelTxt}")
    p.add_argument("--out", required=True)
    p.add_argument("--subsize", type=int, default=1024)
    p.add_argument("--gap", type=int, default=200)
    p.add_argument("--rates", type=float, nargs="+", default=[1.0])
    p.add_argument("--workers", type=int, default=8)
    a = p.parse_args()
    prepare(a.src, a.out, a.subsize, a.gap, tuple(a.rates), workers=a.workers)


if __name__ == "__main__":
    main()

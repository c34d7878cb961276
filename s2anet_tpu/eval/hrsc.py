"""HRSC2016 ship-detection evaluation.

Parity: /root/reference/DOTA_devkit/hrsc2016_evaluation.py:25-299 — parses
HRSC XML annotations (rotated boxes: cx, cy, w, h, ang), converts to polygons,
runs the same VOC evaluation as DOTA (the reference's copy additionally
imports mmdet and is broken standalone; this one is self-contained).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Dict, List, Sequence

import numpy as np

from ..ops.polyiou_ref import rbox_vertices_np
from .voc_eval import voc_eval_class

HRSC_CLASSES = ("ship",)


def parse_hrsc_xml(path) -> List[dict]:
    """Parse one HRSC2016 Annotation xml -> list of rotated-box objects."""
    root = ET.parse(str(path)).getroot()
    objs = []
    for obj in root.iter("HRSC_Object"):
        def g(tag, default=0.0):
            el = obj.find(tag)
            return float(el.text) if el is not None and el.text else default

        cx, cy = g("mbox_cx"), g("mbox_cy")
        w, h = g("mbox_w"), g("mbox_h")
        ang = g("mbox_ang")
        difficult = int(g("difficult", 0))
        rbox = np.array([cx, cy, w, h, ang])
        poly = rbox_vertices_np(rbox[None])[0].reshape(8)
        objs.append({"poly": poly, "rbox": rbox, "difficult": bool(difficult),
                     "name": "ship"})
    return objs


def load_hrsc_ground_truth(anno_dir, image_ids: Sequence[str]) -> Dict:
    gt: Dict[str, list] = {}
    for img_id in image_ids:
        path = Path(anno_dir) / f"{img_id}.xml"
        gt[img_id] = []
        if path.exists():
            for obj in parse_hrsc_xml(path):
                gt[img_id].append((obj["poly"], obj["difficult"]))
    return gt


def evaluate_hrsc(detections, anno_dir, image_ids,
                  ovthresh: float = 0.5, use_07_metric: bool = True):
    """Evaluate ship detections.

    Args:
      detections: iterable of (image_id, score, poly[8]).
      anno_dir: directory of HRSC xml annotations.
      image_ids: evaluation image ids.

    Returns the voc_eval_class result dict (ap, rec, prec, ...).
    """
    gt = load_hrsc_ground_truth(anno_dir, image_ids)
    return voc_eval_class(detections, gt, ovthresh, use_07_metric)

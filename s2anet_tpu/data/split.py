"""DOTA chip splitter — offline spatial tiling with overlap.

Re-implementation of the reference's ImgSplit pipeline
(/root/reference/DOTA_devkit/ImgSplit_multi_process.py:47-317) without the
shapely dependency (polygon clipping comes from our double-precision oracle):

  * slide a ``subsize`` x ``subsize`` window with stride ``subsize - gap``
    (train prep: 1024/gap 200 -> stride 824; splitter default gap 512);
  * per instance, clip its polygon against the window: fully-inside polygons
    pass through; partially-cut ones are kept iff the kept-area fraction
    exceeds ``thresh`` (0.5), with 5-vertex clips repaired to 4 by merging the
    shortest edge (ImgSplit:143-163) and vertex order re-matched to the
    original (:20-37);
  * edge chips are zero-padded to full size (:136-139);
  * multiprocessing across images.

This is the "long-context" axis of this framework: huge aerial images are
streamed as overlapping spatial tiles, detected per-tile, then re-merged
(:mod:`s2anet_tpu.data.merge`) — the detection analogue of sequence chunking.
"""

from __future__ import annotations

from concurrent.futures import ProcessPoolExecutor
from pathlib import Path
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from ..ops.polyiou_ref import clip_polygon, polygon_area, _ensure_ccw

DOTA_CLASSES = (
    "plane", "baseball-diamond", "bridge", "ground-track-field",
    "small-vehicle", "large-vehicle", "ship", "tennis-court",
    "basketball-court", "storage-tank", "soccer-ball-field", "roundabout",
    "harbor", "swimming-pool", "helicopter",
)


def parse_dota_label(path) -> List[Dict]:
    """Parse a DOTA labelTxt file -> list of {poly[8], name, difficult}."""
    objs = []
    for line in Path(path).read_text().splitlines():
        parts = line.strip().split()
        if len(parts) < 9:
            continue  # imagesource / gsd headers
        try:
            poly = [float(v) for v in parts[:8]]
        except ValueError:
            continue
        name = parts[8]
        difficult = int(parts[9]) if len(parts) > 9 and parts[9].isdigit() else 0
        objs.append({"poly": np.array(poly), "name": name, "difficult": difficult})
    return objs


def _dedupe_poly(pts: np.ndarray, tol: float = 1e-7) -> np.ndarray:
    """Drop duplicate and collinear vertices (mirrors shapely's minimal rings)."""
    if len(pts) == 0:
        return pts
    out = []
    n = len(pts)
    for i in range(n):
        if not out or np.linalg.norm(pts[i] - out[-1]) > tol:
            out.append(pts[i])
    if len(out) > 1 and np.linalg.norm(out[0] - out[-1]) <= tol:
        out.pop()
    pts = np.asarray(out)
    # remove collinear vertices
    keep = []
    n = len(pts)
    for i in range(n):
        a, b, c = pts[i - 1], pts[i], pts[(i + 1) % n]
        cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        scale = max(np.linalg.norm(b - a) * np.linalg.norm(c - a), 1e-12)
        if abs(cross) / scale > 1e-7:
            keep.append(i)
    return pts[keep] if keep else pts[:0]


def _repair_poly5(poly: np.ndarray) -> np.ndarray:
    """5-vertex clip -> 4 vertices by merging the endpoints of the shortest
    edge (ImgSplit:143-163 GetPoly4FromPoly5)."""
    dists = [
        np.linalg.norm(poly[(i + 1) % 5] - poly[i]) for i in range(5)
    ]
    pos = int(np.argmin(dists))
    out = []
    i = 0
    while i < 5:
        if i == pos:
            out.append((poly[i] + poly[(i + 1) % 5]) / 2)
            i += 2
        else:
            out.append(poly[i])
            i += 1
    return np.asarray(out[:4])


def _best_point_order(poly: np.ndarray, ref_poly: np.ndarray) -> np.ndarray:
    """Cyclic rotation of ``poly`` minimizing total vertex distance to
    ``ref_poly`` (choose_best_pointorder_fit_another, ImgSplit:20-37)."""
    best, best_d = poly, np.inf
    for k in range(4):
        cand = np.roll(poly, -k, axis=0)
        d = np.linalg.norm(cand - ref_poly, axis=1).sum()
        if d < best_d:
            best, best_d = cand, d
    return best


def clip_objects_to_window(
    objects: Sequence[Dict],
    left: float,
    up: float,
    subsize: int,
    thresh: float = 0.5,
) -> List[Dict]:
    """Clip instances against a chip window; coordinates become chip-local."""
    win = np.array(
        [[left, up], [left + subsize, up], [left + subsize, up + subsize],
         [left, up + subsize]], dtype=np.float64
    )
    out = []
    for obj in objects:
        poly = np.asarray(obj["poly"], dtype=np.float64).reshape(4, 2)
        area = abs(polygon_area(_ensure_ccw(poly)))
        if area <= 0:
            continue
        inter = clip_polygon(poly, win)
        if len(inter) < 3:
            continue
        inter_area = abs(polygon_area(inter))
        frac = inter_area / area
        if frac >= 1.0 - 1e-9:
            new_poly = poly - np.array([left, up])
            out.append({**obj, "poly": new_poly.reshape(8).copy()})
            continue
        if frac <= thresh:
            continue
        cut = _dedupe_poly(_ensure_ccw(inter))
        if len(cut) < 4 or len(cut) > 5:
            continue
        if len(cut) == 5:
            cut = _repair_poly5(cut)
        cut = _best_point_order(cut, poly)
        cut = cut - np.array([left, up])
        cut = np.clip(cut, 1.0, float(subsize))
        out.append({**obj, "poly": cut.reshape(8).copy()})
    return out


def window_origins(h: int, w: int, subsize: int, slide: int):
    """Top-left corners of the sliding windows covering an (h, w) image."""
    lefts = list(range(0, max(w - subsize, 0) + 1, slide))
    if lefts[-1] + subsize < w:
        lefts.append(w - subsize)
    ups = list(range(0, max(h - subsize, 0) + 1, slide))
    if ups[-1] + subsize < h:
        ups.append(h - subsize)
    # images smaller than subsize still get one (0, 0) window
    return [(l, u) for u in ups for l in lefts]


def split_image(
    img: np.ndarray,
    objects: Sequence[Dict],
    name: str,
    subsize: int = 1024,
    gap: int = 200,
    rate: float = 1.0,
    thresh: float = 0.5,
    pad: bool = True,
) -> Iterator[Tuple[str, np.ndarray, List[Dict]]]:
    """Yield (chip_name, chip_img, chip_objects) covering the image.

    Chip names follow the reference scheme ``name__rate__left___up`` so the
    merger can invert the tiling (ResultMerge:178-224).
    """
    if rate != 1.0:
        import cv2

        img = cv2.resize(img, None, fx=rate, fy=rate,
                         interpolation=cv2.INTER_CUBIC)
        objects = [{**o, "poly": np.asarray(o["poly"]) * rate} for o in objects]
    h, w = img.shape[:2]
    slide = subsize - gap
    for left, up in window_origins(h, w, subsize, slide):
        chip = img[up: up + subsize, left: left + subsize]
        if pad and (chip.shape[0] < subsize or chip.shape[1] < subsize):
            padded = np.zeros((subsize, subsize) + chip.shape[2:], chip.dtype)
            padded[: chip.shape[0], : chip.shape[1]] = chip
            chip = padded
        chip_objs = clip_objects_to_window(objects, left, up, subsize, thresh)
        yield f"{name}__{rate}__{left}___{up}", chip, chip_objs


def _split_one(args):
    (img_path, label_path, out_images, out_labels, subsize, gap, rate,
     thresh, ext) = args
    import cv2

    img = cv2.imread(str(img_path))
    if img is None:
        return 0
    objects = parse_dota_label(label_path) if label_path else []
    n = 0
    for chip_name, chip, objs in split_image(
        img, objects, Path(img_path).stem, subsize, gap, rate, thresh
    ):
        cv2.imwrite(str(Path(out_images) / (chip_name + ext)), chip)
        lines = []
        for o in objs:
            coords = " ".join(f"{v}" for v in o["poly"])
            lines.append(f"{coords} {o['name']} {o['difficult']}")
        (Path(out_labels) / (chip_name + ".txt")).write_text("\n".join(lines))
        n += 1
    return n


def split_dataset(
    image_dir,
    label_dir,
    out_dir,
    subsize: int = 1024,
    gap: int = 200,
    rates: Sequence[float] = (1.0,),
    thresh: float = 0.5,
    num_workers: int = 8,
    ext: str = ".png",
) -> int:
    """Split a whole DOTA-layout dataset; returns total chips written."""
    out_images = Path(out_dir) / "images"
    out_labels = Path(out_dir) / "labelTxt"
    out_images.mkdir(parents=True, exist_ok=True)
    out_labels.mkdir(parents=True, exist_ok=True)
    tasks = []
    for img_path in sorted(Path(image_dir).iterdir()):
        if img_path.suffix.lower() not in (".png", ".jpg", ".jpeg", ".tif", ".bmp"):
            continue
        lbl = Path(label_dir) / (img_path.stem + ".txt") if label_dir else None
        if lbl is not None and not lbl.exists():
            lbl = None
        for rate in rates:
            tasks.append((img_path, lbl, out_images, out_labels, subsize, gap,
                          rate, thresh, ext))
    total = 0
    if num_workers > 1:
        with ProcessPoolExecutor(num_workers) as pool:
            for n in pool.map(_split_one, tasks):
                total += n
    else:
        for t in tasks:
            total += _split_one(t)
    return total

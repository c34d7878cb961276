"""Image/label augmentations for rotated-box training (NumPy/cv2, data plane).

The reproduced-70.7 recipe uses only horizontal flip (p=0.5) and random
90-degree-multiple rotation (hyp.scratch.s2anet.yaml via
/root/reference/utils/augmentations.py:115-118, :171) — both are exact
symmetries of the chip, so polygons transform losslessly. HSV jitter,
letterbox and mosaic are provided for the full capability surface
(augmentations.py:15, :59, datasets_rotation.py:603) though the recipe
disables them by default.

All polygon work happens on [N, 8] corner arrays; conversion to rotated boxes
happens once at the end of the pipeline (datasets_rotation.py:516).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def hsv_augment(img: np.ndarray, h_gain=0.5, s_gain=0.5, v_gain=0.5,
                rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Random HSV jitter via LUTs (augmentations.py:15-31). img: BGR uint8."""
    if not (h_gain or s_gain or v_gain):
        return img
    import cv2

    rng = rng or np.random.default_rng()
    r = rng.uniform(-1, 1, 3) * [h_gain, s_gain, v_gain] + 1
    if not img.flags["C_CONTIGUOUS"]:
        img = np.ascontiguousarray(img)  # cv2 needs contiguous input
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
    x = np.arange(0, 256, dtype=r.dtype)
    lut_hue = ((x * r[0]) % 180).astype(img.dtype)
    lut_sat = np.clip(x * r[1], 0, 255).astype(img.dtype)
    lut_val = np.clip(x * r[2], 0, 255).astype(img.dtype)
    img_hsv = cv2.merge(
        (cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val))
    )
    return cv2.cvtColor(img_hsv, cv2.COLOR_HSV2BGR)


def letterbox(
    img: np.ndarray,
    new_shape: Tuple[int, int],
    pad_value: int = 114,
    scaleup: bool = True,
) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    """Aspect-preserving resize + center pad (augmentations.py:59-90).

    Returns (img, ratio, (dw, dh)) where dw/dh are the left/top pads.
    """
    import cv2

    shape = img.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))
    dw = (new_shape[1] - new_unpad[0]) / 2
    dh = (new_shape[0] - new_unpad[1]) / 2
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right,
                             cv2.BORDER_CONSTANT,
                             value=(pad_value,) * 3)
    return img, r, (left, top)


def scale_polys(polys: np.ndarray, ratio: float, pad: Tuple[float, float]):
    polys = polys.copy()
    polys[:, 0::2] = polys[:, 0::2] * ratio + pad[0]
    polys[:, 1::2] = polys[:, 1::2] * ratio + pad[1]
    return polys


def unletterbox_rboxes(rboxes: np.ndarray, ratio: float,
                       pad: Tuple[float, float],
                       orig_shape: Optional[Tuple[int, int]] = None):
    """Map rotated boxes from letterboxed coords back to the original image
    (scale_coords_rotated analogue, utils/general.py:629): remove padding,
    divide centers and sides by the resize ratio, clip centers to the image.
    """
    out = np.asarray(rboxes, np.float64).reshape(-1, 5).copy()
    out[:, 0] = (out[:, 0] - pad[0]) / ratio
    out[:, 1] = (out[:, 1] - pad[1]) / ratio
    out[:, 2:4] /= ratio
    if orig_shape is not None:
        h, w = orig_shape
        out[:, 0] = out[:, 0].clip(0, w)
        out[:, 1] = out[:, 1].clip(0, h)
    return out


def fliplr_polys(img_w: int, polys: np.ndarray) -> np.ndarray:
    polys = polys.copy()
    polys[:, 0::2] = img_w - polys[:, 0::2]
    return polys


def flipud_polys(img_h: int, polys: np.ndarray) -> np.ndarray:
    polys = polys.copy()
    polys[:, 1::2] = img_h - polys[:, 1::2]
    return polys


def rot90_image_and_polys(img: np.ndarray, polys: np.ndarray, k: int):
    """Rotate image + polygons by k*90 degrees counter-clockwise (exact).

    The reference realizes this as a degenerate warp of
    random_perspective_rotation restricted to {0, +-90, 180}
    (augmentations.py:115-118); here it's an exact index permutation.
    """
    k = k % 4
    if k == 0:
        return img, polys
    h, w = img.shape[:2]
    img = np.rot90(img, k)  # view — the pipeline's final float32 conversion
    # materializes one contiguous copy for everything
    xs = polys[:, 0::2].copy()
    ys = polys[:, 1::2].copy()
    for _ in range(k):
        # (x, y) -> (y, w-1-x) for CCW rot90 of an array with shape (h, w)
        xs, ys = ys, (w - 1) - xs
        h, w = w, h
    out = polys.copy()
    out[:, 0::2] = xs
    out[:, 1::2] = ys
    return img, out


def filter_polys_center_inside(polys: np.ndarray, img_h: int, img_w: int):
    """Keep boxes whose center remains inside the image
    (box_candidates_rotation_filter_center, augmentations.py:265-277)."""
    cx = polys[:, 0::2].mean(axis=1)
    cy = polys[:, 1::2].mean(axis=1)
    return (cx >= 0) & (cx < img_w) & (cy >= 0) & (cy < img_h)


def random_perspective_rotation(
    img: np.ndarray,
    polys: np.ndarray,
    degrees: float = 0.0,
    translate: float = 0.0,
    scale: float = 0.0,
    rng: Optional[np.random.Generator] = None,
):
    """Affine warp of image + polygon corners (rotated-box analogue of the
    reference's random_perspective_rotation, augmentations.py:93-229).

    Free rotation is sampled in 90-degree multiples when ``degrees > 0``
    (augmentations.py:115-118 — arbitrary angles would distort the min-area
    rectangles); translate/scale apply continuous jitter. Boxes whose center
    leaves the canvas are dropped by the caller via
    :func:`filter_polys_center_inside`.
    """
    import cv2

    rng = rng or np.random.default_rng()
    h, w = img.shape[:2]
    if degrees > 0:
        img, polys = rot90_image_and_polys(img, polys, int(rng.integers(0, 4)))
        h, w = img.shape[:2]

    s = 1.0 + rng.uniform(-scale, scale) if scale > 0 else 1.0
    tx = rng.uniform(0.5 - translate, 0.5 + translate) * w - w / 2 if translate else 0.0
    ty = rng.uniform(0.5 - translate, 0.5 + translate) * h - h / 2 if translate else 0.0
    if s == 1.0 and tx == 0.0 and ty == 0.0:
        return img, polys
    m = np.array([[s, 0, tx + (1 - s) * w / 2],
                  [0, s, ty + (1 - s) * h / 2]], np.float64)
    if not img.flags["C_CONTIGUOUS"]:
        img = np.ascontiguousarray(img)  # cv2 needs contiguous input
    img = cv2.warpAffine(img, m, (w, h), borderValue=(114, 114, 114))
    if len(polys):
        pts = polys.reshape(-1, 4, 2)
        pts = pts * s + np.array([m[0, 2], m[1, 2]])
        polys = pts.reshape(-1, 8)
    return img, polys


def mixup(img1, polys1, cls1, img2, polys2, cls2,
          rng: Optional[np.random.Generator] = None):
    """Beta(32, 32) image blend with label union (augmentations.py:230-238)."""
    rng = rng or np.random.default_rng()
    r = rng.beta(32.0, 32.0)
    img = (img1.astype(np.float32) * r
           + img2.astype(np.float32) * (1 - r)).astype(img1.dtype)
    polys = np.concatenate([polys1, polys2], 0)
    cls = np.concatenate([cls1, cls2], 0)
    return img, polys, cls


def mosaic4(samples, img_size: int, pad_value: int = 114,
            rng: Optional[np.random.Generator] = None):
    """4-image mosaic (datasets_rotation.py:603-660 analogue).

    Args:
      samples: list of 4 (img BGR uint8, polys [N,8] px, cls [N]) at any size.

    Returns:
      (mosaic img [2*img_size]^2, polys, cls) — the caller typically follows
      with a random crop/letterbox back to img_size.
    """
    import cv2

    rng = rng or np.random.default_rng()
    s = img_size
    yc = int(rng.uniform(s * 0.5, s * 1.5))
    xc = int(rng.uniform(s * 0.5, s * 1.5))
    canvas = np.full((2 * s, 2 * s, 3), pad_value, np.uint8)
    out_polys, out_cls = [], []
    for i, (img, polys, cls) in enumerate(samples):
        h, w = img.shape[:2]
        if i == 0:   # top-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
        elif i == 1:  # top-right
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, 2 * s), yc
            x1b, y1b = 0, h - (y2a - y1a)
        elif i == 2:  # bottom-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(yc + h, 2 * s)
            x1b, y1b = w - (x2a - x1a), 0
        else:         # bottom-right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, 2 * s), min(yc + h, 2 * s)
            x1b, y1b = 0, 0
        canvas[y1a:y2a, x1a:x2a] = img[y1b:y1b + (y2a - y1a),
                                       x1b:x1b + (x2a - x1a)]
        if len(polys):
            p = polys.copy()
            p[:, 0::2] += x1a - x1b
            p[:, 1::2] += y1a - y1b
            out_polys.append(p)
            out_cls.append(cls)
    polys = np.concatenate(out_polys, 0) if out_polys else np.zeros((0, 8))
    cls = np.concatenate(out_cls, 0) if out_cls else np.zeros((0,), np.int32)
    keep = filter_polys_center_inside(polys, 2 * s, 2 * s)
    return canvas, polys[keep], cls[keep]


def mosaic_center_crop(canvas: np.ndarray, polys: np.ndarray, cls: np.ndarray,
                       img_size: int):
    """Center-crop the 2s x 2s mosaic canvas back to s x s.

    Parity: the reference feeds the 2s canvas through
    random_perspective_rotation with ``border=mosaic_border=(-s/2, -s/2)``
    (datasets_rotation.py:655-660, augmentations.py:100-137) — with the warp
    params at zero that is exactly a center crop, and crucially it PRESERVES
    object scale (a resize would halve it). Boxes whose center falls outside
    the crop are dropped (box_candidates_rotation_filter_center).
    """
    s = img_size
    off = s // 2
    img = canvas[off:off + s, off:off + s]  # view; copied at float conversion
    if len(polys):
        polys = polys.copy()
        polys[:, 0::2] -= off
        polys[:, 1::2] -= off
        keep = filter_polys_center_inside(polys, s, s)
        polys, cls = polys[keep], cls[keep]
    return img, polys, cls

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
    img = np.ascontiguousarray(np.rot90(img, k))
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

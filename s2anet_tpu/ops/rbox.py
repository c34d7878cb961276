"""Rotated-box geometry core (pure JAX, fully vectorized, static shapes).

Conventions (matching the S2ANet reference):
  * A rotated box is ``(x_ctr, y_ctr, w, h, theta)`` in pixels; ``w`` is the long
    side, ``h`` the short side; ``theta`` (radians) is the angle from the +x axis
    to the long side, clockwise-positive in image coordinates (y points down),
    normalized into ``[-pi/4, 3*pi/4)``.
  * Box deltas encode xy offsets *rotated into the anchor frame*
    (``is_encode_relative=True``), wh in log-space, angle normalized by pi.

Parity references (behavioral, re-derived here — not translated code):
  /root/reference/utils/general.py:925 (norm_angle)
  /root/reference/models/boxes.py:166 (rboxes_encode), :223 (rboxes_decode),
  :82 (delta2bbox_rotated)
  /root/reference/utils/box_iou_rotated/src/box_iou_rotated_utils.h:56
  (get_rotated_vertices)
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

PI = math.pi


def norm_angle(angle):
    """Normalize angle(s) into ``[-pi/4, 3*pi/4)``.

    Works on JAX arrays, NumPy arrays and Python floats.
    """
    return (angle + PI / 4) % PI - PI / 4


def rbox_vertices(rboxes):
    """Corner points of rotated boxes.

    Args:
      rboxes: ``[..., 5]`` array of ``(x, y, w, h, theta)``.

    Returns:
      ``[..., 4, 2]`` vertices in the same order as the reference CUDA kernel
      (box_iou_rotated_utils.h:56-75): p0/p1 on the "left" short edge,
      p2/p3 their central reflections. Consecutive vertices share an edge.
    """
    x, y, w, h, a = jnp.split(rboxes, 5, axis=-1)
    c2 = jnp.cos(a) * 0.5
    s2 = jnp.sin(a) * 0.5
    p0 = jnp.concatenate([x - s2 * h - c2 * w, y + c2 * h - s2 * w], axis=-1)
    p1 = jnp.concatenate([x + s2 * h - c2 * w, y - c2 * h - s2 * w], axis=-1)
    p2 = jnp.concatenate([2 * x - p0[..., :1], 2 * y - p0[..., 1:]], axis=-1)
    p3 = jnp.concatenate([2 * x - p1[..., :1], 2 * y - p1[..., 1:]], axis=-1)
    return jnp.stack([p0, p1, p2, p3], axis=-2)


def rbox_to_poly(rboxes):
    """``[..., 5]`` rotated boxes -> ``[..., 8]`` polygons (x0,y0,...,x3,y3)."""
    verts = rbox_vertices(rboxes)
    return verts.reshape(*verts.shape[:-2], 8)


def poly_to_rbox_np(polys: np.ndarray) -> np.ndarray:
    """``[N, 8]`` polygons -> ``[N, 5]`` rotated boxes (NumPy, data plane).

    Minimum-area enclosing rectangle of the 4 points via rotating calipers over
    the convex hull, long-side-first with theta normalized to ``[-pi/4, 3pi/4)``.
    Matches the reference's cv2.minAreaRect-based conversion
    (utils/general.py:845-880) up to minAreaRect's integer-cast quirk, which we
    deliberately do NOT reproduce (the reference casts corners to int64 first,
    losing sub-pixel precision; we keep float precision).
    """
    polys = np.asarray(polys, dtype=np.float64).reshape(-1, 8)
    out = np.zeros((polys.shape[0], 5), dtype=np.float64)
    for i, p in enumerate(polys):
        pts = p.reshape(4, 2)
        out[i] = _min_area_rect(pts)
    return out


def _min_area_rect(pts: np.ndarray) -> np.ndarray:
    """Minimum-area rectangle of a point set; returns (x, y, w_long, h_short, theta)."""
    hull = _convex_hull(pts)
    n = len(hull)
    if n == 1:
        return np.array([hull[0, 0], hull[0, 1], 0.0, 0.0, 0.0])
    if n == 2:
        d = hull[1] - hull[0]
        c = hull.mean(axis=0)
        ang = math.atan2(d[1], d[0])
        return np.array([c[0], c[1], float(np.hypot(*d)), 0.0, norm_angle(ang)])
    best = None
    for k in range(n):
        e = hull[(k + 1) % n] - hull[k]
        ln = np.hypot(e[0], e[1])
        if ln < 1e-12:
            continue
        ux, uy = e / ln  # edge direction
        # rotate all hull points into the edge frame
        xs = hull[:, 0] * ux + hull[:, 1] * uy
        ys = -hull[:, 0] * uy + hull[:, 1] * ux
        x0, x1 = xs.min(), xs.max()
        y0, y1 = ys.min(), ys.max()
        area = (x1 - x0) * (y1 - y0)
        if best is None or area < best[0]:
            cx_e, cy_e = (x0 + x1) / 2, (y0 + y1) / 2
            # back to image frame
            cx = cx_e * ux - cy_e * uy
            cy = cx_e * uy + cy_e * ux
            best = (area, cx, cy, x1 - x0, y1 - y0, math.atan2(uy, ux))
    _, cx, cy, w, h, ang = best
    if h > w:
        w, h = h, w
        ang += PI / 2
    return np.array([cx, cy, w, h, float(norm_angle(ang))])


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone-chain convex hull (counter-clockwise in math coords)."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        h = []
        for p in points:
            while len(h) >= 2 and (h[-1][0]-h[-2][0])*(p[1]-h[-2][1]) - (h[-1][1]-h[-2][1])*(p[0]-h[-2][0]) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def poly_to_rbox(polys):
    """JAX-traceable ``[..., 8]`` polygon -> ``[..., 5]`` rbox for *rectangular*
    polygons (vertices already describe a rotated rectangle, e.g. produced by
    augmentation warps of rboxes). For arbitrary quadrilaterals use
    :func:`poly_to_rbox_np` on the data plane.

    Uses the first edge pair to recover (w, h, theta) and renormalizes so w is
    the long side.
    """
    p = polys.reshape(*polys.shape[:-1], 4, 2)
    ctr = p.mean(axis=-2)
    e01 = p[..., 1, :] - p[..., 0, :]
    e12 = p[..., 2, :] - p[..., 1, :]
    l01 = jnp.linalg.norm(e01, axis=-1)
    l12 = jnp.linalg.norm(e12, axis=-1)
    ang01 = jnp.arctan2(e01[..., 1], e01[..., 0])
    ang12 = jnp.arctan2(e12[..., 1], e12[..., 0])
    w = jnp.maximum(l01, l12)
    h = jnp.minimum(l01, l12)
    theta = jnp.where(l01 >= l12, ang01, ang12)
    theta = norm_angle(theta)
    return jnp.concatenate(
        [ctr, w[..., None], h[..., None], theta[..., None]], axis=-1
    )


def rboxes_encode(anchors, gt_rboxes, is_encode_relative: bool = True):
    """Encode gt rotated boxes as deltas w.r.t. anchors.

    Args:
      anchors:   ``[..., 5]`` (x, y, w, h, theta), pixels/radians.
      gt_rboxes: ``[..., 5]`` same layout, broadcast-compatible with anchors.

    Returns:
      ``[..., 5]`` deltas (dx, dy, dw, dh, da).

    Parity: /root/reference/models/boxes.py:166-220. The xy offset is rotated
    into the anchor frame and normalized by anchor w/h; wh is log-ratio; the
    angle delta is norm_angle'd then divided by pi.
    """
    ax, ay, aw, ah, aa = [anchors[..., i] for i in range(5)]
    gx, gy, gw, gh, ga = [gt_rboxes[..., i] for i in range(5)]
    ox = gx - ax
    oy = gy - ay
    if is_encode_relative:
        cosa = jnp.cos(aa)
        sina = jnp.sin(aa)
        dx = (cosa * ox + sina * oy) / aw
        dy = (-sina * ox + cosa * oy) / ah
    else:
        dx = ox / aw
        dy = oy / ah
    dw = jnp.log(gw / aw)
    dh = jnp.log(gh / ah)
    da = norm_angle(ga - aa) / PI
    return jnp.stack([dx, dy, dw, dh, da], axis=-1)


def rboxes_decode(
    anchors,
    deltas,
    is_encode_relative: bool = True,
    wh_ratio_clip: float = 16 / 1000,
):
    """Decode predicted deltas against anchors into rotated boxes.

    Inverse of :func:`rboxes_encode`; dw/dh clamped to ``|log(wh_ratio_clip)|``.
    Parity: /root/reference/models/boxes.py:82-162 (delta2bbox_rotated).
    """
    ax, ay, aw, ah, aa = [anchors[..., i] for i in range(5)]
    dx, dy, dw, dh, da = [deltas[..., i] for i in range(5)]
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    if is_encode_relative:
        cosa = jnp.cos(aa)
        sina = jnp.sin(aa)
        gx = dx * aw * cosa - dy * ah * sina + ax
        gy = dx * aw * sina + dy * ah * cosa + ay
    else:
        gx = dx * aw + ax
        gy = dy * ah + ay
    gw = aw * jnp.exp(dw)
    gh = ah * jnp.exp(dh)
    ga = norm_angle(PI * da + aa)
    return jnp.stack([gx, gy, gw, gh, ga], axis=-1)

"""Pairwise rotated-box IoU on TPU — branchless, fully vectorized.

Computes exact IoU of rotated rectangles, replacing the reference's CUDA
kernel (/root/reference/utils/box_iou_rotated/src/box_iou_rotated_cuda.cu and
the 24-candidate polygon-clip + Graham-scan routine in
box_iou_rotated_utils.h:78-324) with a formulation that needs **no sort, no
hull, and no candidate buffers**:

The boundary of A∩B (convex) consists of the sub-segments of A's edges inside
B plus the sub-segments of B's edges inside A. The shoelace sum of a closed
polygon is exactly the sum of ``cross(start, end)`` over its *directed* edges
— and that sum is order-independent. So

    2 * area(A∩B) = sum over the 8 edges e of A and B of
                      (t1_e - t0_e) * cross(p_e, d_e)

where ``[t0, t1]`` is the parametric interval of edge ``p + t*d`` inside the
other box — four half-plane constraints, i.e. a 1-D interval clip. Per pair
that is ~32 fused multiply-adds + 32 selects: pure VPU work on [N, M] tiles,
with no [*, 24, 24] intermediates and no data movement.

Degenerate (shared/collinear-edge) pairs are handled by an orientation-aware
epsilon tie-break on the exact-zero feasibility crosses. Twin edges running
the same direction (identical boxes, grid-aligned anchors — interiors on the
same side) must be tallied exactly once: pass A clips against closed
half-planes (+eps), pass B against open ones (-eps). Twins running opposite
directions (boxes touching edge-to-edge — the shared line separates the
interiors, so the intersection is degenerate) must be tallied zero times:
both passes use -eps there. Off the exact-zero set the two passes' twin
feasibilities are exact negations (same-direction) or equal (opposite), so
float noise keeps the tallied boundary closed either way — the failure mode
that forces other implementations into hull sorting.

Precision: float32 with the same pair-midpoint centering as the reference
(box_iou_rotated_utils.h:335-351) — identical boxes land on bitwise-identical
vertices, making the epsilon tie-breaks exact.

The same ``iou_pairs`` routine backs the Pallas tile kernel
(ops/pallas/iou_kernel.py), which adds a bounding-circle tile-skip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_PARALLEL_TOL2 = 1e-12  # relative (cos angle)^2 cutoff for parallel edges
_SIDE_EPS = 1e-6  # half-plane tie-break; triggers only on exact-zero crosses


def _corners_centered(w, h, a):
    """Corner offsets of a centered rotated rect, stacked on a leading axis.

    Returns ``(px, py)``, each ``[4, *shape]``, tracing the rectangle so that
    the interior satisfies ``cross(edge_dir, p - corner) >= 0``.
    """
    c2 = jnp.cos(a) * 0.5
    s2 = jnp.sin(a) * 0.5
    p0x = -s2 * h - c2 * w
    p0y = c2 * h - s2 * w
    p1x = s2 * h - c2 * w
    p1y = -c2 * h - s2 * w
    return (jnp.stack([p0x, p1x, -p0x, -p1x]),
            jnp.stack([p0y, p1y, -p0y, -p1y]))


def _clip_pass(pts_p, vec_p, pts_q, vec_q, eps):
    """Sum of cross(start, end) over sub-segments of P's edges inside Q.

    Each of P's four edges ``p + t*d, t in [0, 1]`` is clipped against Q's
    four half-planes ``cross(e_m, x - q_m) >= -eps`` (a 1-D interval
    intersection); its contribution is ``(t1 - t0) * cross(p, d)``.

    Vectorized over both quartets: inputs are ``(x, y)`` pairs of ``[4, *S]``
    arrays; the P-edge axis stays axis 0 and the Q-constraint quartet is
    broadcast on a new axis 1, so the 4x4 clip is ~40 fused array ops instead
    of 32 unrolled scalar iterations (a ~12x jaxpr/compile-size win — NMS
    traces this block twice). Numerics are unchanged: max/min/all reductions
    are order-independent, and the edge-contribution sum keeps the original
    left-to-right association.
    """
    px, py = (a[:, None] for a in pts_p)
    dx, dy = (a[:, None] for a in vec_p)
    qx, qy = (a[None, :] for a in pts_q)
    ex, ey = (a[None, :] for a in vec_q)
    d2 = dx * dx + dy * dy
    c1 = ex * dy - ey * dx
    # opposite-direction collinear twins -> always-drop bias
    tie = jnp.where(ex * dx + ey * dy > 0, eps, -_SIDE_EPS)
    c0 = ex * (py - qy) - ey * (px - qx) + tie
    para = c1 * c1 <= _PARALLEL_TOL2 * (ex * ex + ey * ey) * d2
    t = -c0 / jnp.where(para, 1.0, c1)
    lo = jnp.maximum(0.0, jnp.max(jnp.where(~para & (c1 > 0), t, 0.0), axis=1))
    hi = jnp.minimum(1.0, jnp.min(jnp.where(~para & (c1 < 0), t, 1.0), axis=1))
    ok = jnp.all(~para | (c0 >= 0), axis=1)
    dt = jnp.where(ok, jnp.maximum(hi - lo, 0.0), 0.0)
    contrib = dt * (pts_p[0] * vec_p[1] - pts_p[1] * vec_p[0])
    return contrib[0] + contrib[1] + contrib[2] + contrib[3]


def iou_pairs(params1, params2):
    """Elementwise rotated IoU over broadcast box-parameter arrays.

    Args:
      params1: tuple (x, y, w, h, theta) of mutually broadcastable arrays.
      params2: same, broadcastable against params1.

    Returns:
      IoU array of the broadcast shape, float32 semantics.

    This is the single mathematical core shared by the XLA entry point below
    and the Pallas TPU kernel — both paths are numerically identical.
    """
    x1, y1, w1, h1, a1 = params1
    x2, y2, w2, h2, a2 = params2
    # pair-midpoint centering: exact zeros for identical boxes
    sx = (x1 - x2) * 0.5
    sy = (y1 - y2) * 0.5
    cax, cay = _corners_centered(w1, h1, a1)
    cbx, cby = _corners_centered(w2, h2, a2)
    pa = (cax + sx, cay + sy)  # [4, *broadcast-shape] corner quartets
    pb = (cbx - sx, cby - sy)
    va = tuple(jnp.roll(p, -1, axis=0) - p for p in pa)  # directed edges
    vb = tuple(jnp.roll(p, -1, axis=0) - p for p in pb)

    acc = _clip_pass(pa, va, pb, vb, _SIDE_EPS) + _clip_pass(
        pb, vb, pa, va, -_SIDE_EPS
    )
    inter = 0.5 * jnp.abs(acc)

    area1 = w1 * h1
    area2 = w2 * h2
    union = area1 + area2 - inter
    iou = inter / jnp.where(union > 0, union, 1.0)
    return jnp.where((area1 < 1e-14) | (area2 < 1e-14), 0.0, iou)


def _iou_block(boxes1, boxes2):
    """[N,5] x [M,5] -> [N,M] rotated IoU, no chunking."""
    boxes1 = boxes1.astype(jnp.float32)
    boxes2 = boxes2.astype(jnp.float32)
    p1 = tuple(boxes1[:, None, k] for k in range(5))
    p2 = tuple(boxes2[None, :, k] for k in range(5))
    return iou_pairs(p1, p2)


@functools.partial(jax.jit, static_argnames=("block_n",))
def box_iou_rotated(boxes1, boxes2, block_n: int = 2048):
    """Pairwise IoU of rotated boxes.

    Args:
      boxes1: ``[N, 5]`` (x, y, w, h, theta) — pixels / radians.
      boxes2: ``[M, 5]``.
      block_n: chunk size over N; bounds peak memory at ``O(block_n * M)``
        floats times the ~16 live temporaries of the clip. Must be static.

    Returns:
      ``[N, M]`` float32 IoU matrix.
    """
    n = boxes1.shape[0]
    if n == 0 or boxes2.shape[0] == 0:
        return jnp.zeros((n, boxes2.shape[0]), jnp.float32)
    if n <= block_n:
        return _iou_block(boxes1, boxes2)
    pad = (-n) % block_n
    b1 = jnp.pad(boxes1, ((0, pad), (0, 0)))
    b1 = b1.reshape(-1, block_n, 5)
    out = jax.lax.map(lambda blk: _iou_block(blk, boxes2), b1)
    return out.reshape(-1, boxes2.shape[0])[:n]

"""Pairwise rotated-box IoU on TPU — branchless, fully vectorized JAX.

Computes exact IoU of rotated rectangles via convex-polygon intersection,
replacing the reference's CUDA kernel
(/root/reference/utils/box_iou_rotated/src/box_iou_rotated_cuda.cu and the
polygon-clip routine in box_iou_rotated_utils.h:78-324) with a data-parallel
formulation XLA can tile onto the VPU:

  1. 16 edge-pair line intersections + 8 vertex-containment tests give up to
     24 candidate points per box pair, carried in fixed [*, 24, 2] buffers with
     validity masks (the CUDA code uses the same fixed 24-slot arrays).
  2. The intersection of two convex polygons is convex, so instead of a Graham
     scan (branchy, serial) we order candidates by angle around their masked
     centroid with a single 24-wide sort, pad invalid slots with the first
     valid vertex, and apply the shoelace formula. Same result, no control flow.

Precision: all math in float32 with the same center-shift trick as the
reference (boxes are translated so box1 sits at the origin;
box_iou_rotated_utils.h:335-351 shifts to the pair midpoint) — intersection
area is translation invariant.

Memory: intermediates are O(N*M*24); the public entry point tiles over N in
``block_n`` chunks via ``lax.map`` so peak VMEM/HBM stays bounded for the
training-time [~22k anchors x gt] and NMS-time [2k x 2k] workloads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .rbox import rbox_vertices


def _cross(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _dot(a, b):
    return (a * b).sum(-1)


def _intersection_candidates(pts1, pts2):
    """Candidate intersection-polygon vertices for each box pair.

    Args:
      pts1: [..., 4, 2] vertices of box1 (broadcast against pts2's pair dims).
      pts2: [..., 4, 2] vertices of box2.

    Returns:
      (cand [..., 24, 2], valid [..., 24]) — 16 edge-edge intersections followed
      by 4 box1-in-box2 and 4 box2-in-box1 vertex containments.
    """
    vec1 = jnp.roll(pts1, -1, axis=-2) - pts1
    vec2 = jnp.roll(pts2, -1, axis=-2) - pts2

    # --- 16 edge-pair intersections ---------------------------------------
    # i indexes box1 edges (axis -3), j indexes box2 edges (axis -2).
    p1 = pts1[..., :, None, :]
    v1 = vec1[..., :, None, :]
    p2 = pts2[..., None, :, :]
    v2 = vec2[..., None, :, :]
    det = _cross(v2, v1)
    det_ok = jnp.abs(det) > 1e-14
    safe_det = jnp.where(det_ok, det, 1.0)
    d12 = p2 - p1
    t1 = _cross(v2, d12) / safe_det
    t2 = _cross(v1, d12) / safe_det
    hit = det_ok & (t1 >= 0.0) & (t1 <= 1.0) & (t2 >= 0.0) & (t2 <= 1.0)
    ipt = p1 + v1 * t1[..., None]
    batch = ipt.shape[:-3]
    edge_pts = ipt.reshape(*batch, 16, 2)
    edge_ok = hit.reshape(*batch, 16)

    # --- vertices of box1 inside box2 (projection test) -------------------
    def _contained(points, box_pts, box_vec):
        # Projection test with a small *relative* tolerance: float32 rounding
        # makes nominally-perpendicular edge dot-products land at +-ulp scale,
        # which would randomly reject on-boundary vertices (e.g. of identical
        # boxes). Points admitted by the tolerance sit within ~1e-4 edge
        # lengths of the true boundary, so the polygon-area error is ~ulp.
        tol = 1e-4
        ab = box_vec[..., 0:1, :]
        da = box_vec[..., 3:4, :]
        ap = points - box_pts[..., 0:1, :]
        ap_ab = _dot(ap, ab)
        ap_ad = -_dot(ap, da)
        ab2 = _dot(ab, ab)
        ad2 = _dot(da, da)
        return (
            (ap_ab >= -tol * ab2)
            & (ap_ad >= -tol * ad2)
            & (ap_ab <= (1 + tol) * ab2)
            & (ap_ad <= (1 + tol) * ad2)
        )

    in2 = _contained(pts1, pts2, vec2)  # [..., 4]
    in1 = _contained(pts2, pts1, vec1)  # [..., 4]

    cand = jnp.concatenate(
        [edge_pts, jnp.broadcast_to(pts1, (*batch, 4, 2)), pts2], axis=-2
    )
    valid = jnp.concatenate([edge_ok, in2, in1], axis=-1)
    return cand, valid


def _convex_area_from_candidates(cand, valid):
    """Area of the convex polygon spanned by masked candidate points.

    The candidates of a convex intersection can be ordered by angle around
    their masked centroid. Instead of an argsort + gather (XLA sorts are
    ~100x slower than elementwise work on TPU — they made this op take
    seconds), ranks come from an all-pairs comparison matrix and the shoelace
    sum is evaluated directly through a successor-selection matrix:

      rank_i   = #{j : ang_j < ang_i, ties by slot index}
      succ_i   = (rank_i + 1) mod num_valid
      area     = 0.5 * | sum_{i,j} [rank_j == succ_i] * cross(p_i, p_j) |

    Everything is comparisons + masked sums over fixed [*, 24, 24] tiles —
    pure VPU work with no data movement.
    """
    nslot = cand.shape[-2]
    num = valid.sum(-1)
    w = valid.astype(cand.dtype)
    denom = jnp.maximum(num.astype(cand.dtype), 1.0)
    ctr = (cand * w[..., None]).sum(-2) / denom[..., None]
    rel = jnp.where(valid[..., None], cand - ctr[..., None, :], 0.0)
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    big = jnp.asarray(1e30, ang.dtype)
    ang = jnp.where(valid, ang, big)  # invalid slots rank last

    idx = jnp.arange(nslot)
    ang_i = ang[..., :, None]  # i rows
    ang_j = ang[..., None, :]  # j cols
    less = (ang_j < ang_i) | ((ang_j == ang_i) & (idx[None, :] < idx[:, None]))
    rank = less.sum(-1)  # [*, 24] — 0..num-1 for valid slots

    succ = jnp.where(rank == num[..., None] - 1, 0, rank + 1)
    sel = (
        valid[..., :, None]
        & valid[..., None, :]
        & (rank[..., None, :] == succ[..., :, None])
    )
    # cross(p_i, p_j) over all pairs, masked by the successor matrix
    xi = rel[..., :, 0:1]
    yi = rel[..., :, 1:2]
    xj = rel[..., None, :, 0]
    yj = rel[..., None, :, 1]
    cross_ij = xi * yj - xj * yi  # [*, i, j]
    area = 0.5 * jnp.abs(jnp.where(sel, cross_ij, 0.0).sum((-1, -2)))
    return jnp.where(num > 2, area, 0.0)


def _iou_block(boxes1, boxes2):
    """[N,5] x [M,5] -> [N,M] rotated IoU, no chunking."""
    boxes1 = boxes1.astype(jnp.float32)
    boxes2 = boxes2.astype(jnp.float32)

    # Translate each pair so the pair midpoint sits at the origin. Besides the
    # precision win, this makes *identical* boxes land on bitwise-identical
    # vertices, so their collinear edges get det == 0 exactly and the
    # containment tests fire on the boundary — same trick as the reference
    # (box_iou_rotated_utils.h:335-351).
    c1 = boxes1[:, :2]
    c2 = boxes2[:, :2]
    shift1 = (c1[:, None, :] - c2[None, :, :]) * 0.5  # c1 - (c1+c2)/2, exact 0 for c1==c2
    v1o = rbox_vertices(boxes1.at[:, :2].set(0.0))  # [N,4,2], centered at origin
    v2o = rbox_vertices(boxes2.at[:, :2].set(0.0))  # [M,4,2]
    pts1 = v1o[:, None] + shift1[:, :, None, :]  # [N,M,4,2]
    pts2 = v2o[None] - shift1[:, :, None, :]

    cand, valid = _intersection_candidates(pts1, pts2)
    inter = _convex_area_from_candidates(cand, valid)

    area1 = boxes1[:, 2] * boxes1[:, 3]
    area2 = boxes2[:, 2] * boxes2[:, 3]
    union = area1[:, None] + area2[None, :] - inter
    iou = inter / jnp.where(union > 0, union, 1.0)
    degenerate = (area1[:, None] < 1e-14) | (area2[None, :] < 1e-14)
    return jnp.where(degenerate, 0.0, iou)


@functools.partial(jax.jit, static_argnames=("block_n",))
def box_iou_rotated(boxes1, boxes2, block_n: int = 512):
    """Pairwise IoU of rotated boxes.

    Args:
      boxes1: ``[N, 5]`` (x, y, w, h, theta) — pixels / radians.
      boxes2: ``[M, 5]``.
      block_n: chunk size over N; bounds peak memory at
        ``O(block_n * M * 24)`` floats. Must be static.

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

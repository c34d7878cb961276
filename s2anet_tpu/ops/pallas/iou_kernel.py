"""Pallas TPU kernel: pairwise rotated-box IoU.

The framework's flagship custom kernel, playing the role the reference's
box_iou_rotated CUDA kernel plays (utils/box_iou_rotated/src/
box_iou_rotated_cuda.cu — 32x16 shared-memory tiles of the polygon-clip
routine). TPU-native design:

  * the grid tiles the [N, M] pair matrix into [8, 128] blocks — exactly one
    VPU vreg per per-pair scalar, so the polygon-clip math runs as plain
    vector ops and only the final IoU tile is written to HBM (the XLA
    formulation materializes [*, 24, 24] intermediates in HBM);
  * the 24 candidate vertices live in a [32, 8, 128] VMEM scratch; the convex
    ordering is a Batcher odd-even-merge sorting network executed as a
    fori_loop over its compare-exchange list (kept in VMEM) with a
    *pseudo-angle* key — monotone in atan2 but division-only — so the whole
    ordering needs no XLA sort, no gather, and only 3 live vregs;
  * keeping slots in scratch (not unrolled SSA values) keeps Mosaic's spill
    stack tiny — a fully unrolled version wanted 64 MB of scoped VMEM.

Numerics match ops.iou_rotated._iou_block: pair-midpoint centering, 1e-14
parallel-edge cutoff, relative-tolerance containment, shoelace area.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 8
TN = 128
NSLOT = 24
NSORT = 32  # next power of two (sentinel-padded for the Batcher network)
_BIG = 1.0e30


@functools.lru_cache(maxsize=None)
def _batcher_network(n: int):
    """Compare-exchange pairs of Batcher's odd-even mergesort (power of two)."""
    assert n & (n - 1) == 0
    pairs = []

    def merge(lo, cnt, r):
        step = r * 2
        if step < cnt:
            merge(lo, cnt, step)
            merge(lo + r, cnt, step)
            for i in range(lo + r, lo + cnt - r, step):
                pairs.append((i, i + r))
        else:
            pairs.append((lo, lo + r))

    def sort(lo, cnt):
        if cnt > 1:
            m = cnt // 2
            sort(lo, m)
            sort(lo + m, m)
            merge(lo, cnt, 1)

    sort(0, n)
    return tuple(pairs)


def _pseudo_angle(x, y):
    """Monotone surrogate of atan2(y, x): maps angle to [0, 4)."""
    denom = jnp.abs(x) + jnp.abs(y) + 1e-30
    p = x / denom
    return jnp.where(y >= 0, 1.0 - p, 3.0 + p)


def _kernel(net_ref, b1_ref, b2_ref, out_ref, kx, ky, kkey, geo):
    """One [TM, TN] tile of pairs.

    Scratch:
      kx/ky/kkey — [NSORT, TM, TN] candidate x, y, sort key.
      geo — [16, TM, TN]: vertex/edge data (px1, py1, vx1, vy1 for the 4 box1
        corners, then the same for box2) so phase 1 can run as a fori_loop.
    net_ref — [n_ce, 2] compare-exchange index pairs (SMEM).
    """
    rows = b1_ref[:]  # [TM, 8]
    cols = b2_ref[:]  # [TN, 8]
    x1, y1, w1, h1, a1 = (rows[:, k][:, None] for k in range(5))
    x2, y2, w2, h2, a2 = (cols[:, k][None, :] for k in range(5))

    # pair-midpoint centering: intersection is translation invariant and
    # identical boxes land on bitwise-identical vertices
    sx = (x1 - x2) * 0.5
    sy = (y1 - y2) * 0.5

    def corners(w, h, a):
        c2 = jnp.cos(a) * 0.5
        s2 = jnp.sin(a) * 0.5
        p0 = (-s2 * h - c2 * w, c2 * h - s2 * w)
        p1 = (s2 * h - c2 * w, -c2 * h - s2 * w)
        return (p0, p1, (-p0[0], -p0[1]), (-p1[0], -p1[1]))

    c1 = corners(w1, h1, a1)  # [TM, 1] coords around the origin
    c2_ = corners(w2, h2, a2)  # [1, TN]
    for k in range(4):
        geo[k * 2] = jnp.broadcast_to(c1[k][0] + sx, (TM, TN))
        geo[k * 2 + 1] = jnp.broadcast_to(c1[k][1] + sy, (TM, TN))
        geo[8 + k * 2] = jnp.broadcast_to(c2_[k][0] - sx, (TM, TN))
        geo[8 + k * 2 + 1] = jnp.broadcast_to(c2_[k][1] - sy, (TM, TN))

    def pt1(k):
        return geo[(k % 4) * 2], geo[(k % 4) * 2 + 1]

    def pt2(k):
        return geo[8 + (k % 4) * 2], geo[8 + (k % 4) * 2 + 1]

    def vec_of(pt, k):
        ax, ay = pt(k)
        bx, by = pt(k + 1)
        return bx - ax, by - ay

    # --- phase 1a: 16 edge-pair intersections (fori over i*4+j) -----------
    def edge_body(s, carry):
        nval, sum_x, sum_y = carry
        i = s // 4
        j = s - i * 4
        p1x, p1y = pt1(i)
        v1x, v1y = vec_of(pt1, i)
        p2x, p2y = pt2(j)
        v2x, v2y = vec_of(pt2, j)
        det = v2x * v1y - v2y * v1x
        det_ok = jnp.abs(det) > 1e-14
        inv = 1.0 / jnp.where(det_ok, det, 1.0)
        dx = p2x - p1x
        dy = p2y - p1y
        t1 = (v2x * dy - v2y * dx) * inv
        t2 = (v1x * dy - v1y * dx) * inv
        ok = det_ok & (t1 >= 0) & (t1 <= 1) & (t2 >= 0) & (t2 <= 1)
        ex = jnp.where(ok, p1x + v1x * t1, 0.0)
        ey = jnp.where(ok, p1y + v1y * t1, 0.0)
        kx[s] = ex
        ky[s] = ey
        kkey[s] = ok.astype(jnp.float32)
        return (nval + ok.astype(jnp.float32), sum_x + ex, sum_y + ey)

    zero = jnp.zeros((TM, TN), jnp.float32)
    nval, sum_x, sum_y = jax.lax.fori_loop(
        0, 16, edge_body, (zero, zero, zero)
    )

    # --- phase 1b: vertex containments (fori over 8 vertices) -------------
    def contain_body(s, carry):
        nval, sum_x, sum_y = carry
        first = s < 4  # vertices of box1 tested against box2
        k = s % 4
        px = jnp.where(first, pt1(k)[0], pt2(k)[0])
        py = jnp.where(first, pt1(k)[1], pt2(k)[1])
        ox, oy = pt2(0)
        o1x, o1y = pt1(0)
        ox = jnp.where(first, ox, o1x)
        oy = jnp.where(first, oy, o1y)
        abx1, aby1 = vec_of(pt2, 0)
        abx2, aby2 = vec_of(pt1, 0)
        abx = jnp.where(first, abx1, abx2)
        aby = jnp.where(first, aby1, aby2)
        dax1, day1 = vec_of(pt2, 3)
        dax2, day2 = vec_of(pt1, 3)
        dax = jnp.where(first, dax1, dax2)
        day = jnp.where(first, day1, day2)

        tol = 1e-4
        apx = px - ox
        apy = py - oy
        ap_ab = apx * abx + apy * aby
        ap_ad = -(apx * dax + apy * day)
        ab2 = abx * abx + aby * aby
        ad2 = dax * dax + day * day
        ok = (
            (ap_ab >= -tol * ab2)
            & (ap_ad >= -tol * ad2)
            & (ap_ab <= (1 + tol) * ab2)
            & (ap_ad <= (1 + tol) * ad2)
        )
        ex = jnp.where(ok, px, 0.0)
        ey = jnp.where(ok, py, 0.0)
        kx[16 + s] = ex
        ky[16 + s] = ey
        kkey[16 + s] = ok.astype(jnp.float32)
        return (nval + ok.astype(jnp.float32), sum_x + ex, sum_y + ey)

    nval, sum_x, sum_y = jax.lax.fori_loop(
        0, 8, contain_body, (nval, sum_x, sum_y)
    )

    # --- phase 2: recenter + sort keys ------------------------------------
    cx = sum_x / jnp.maximum(nval, 1.0)
    cy = sum_y / jnp.maximum(nval, 1.0)

    def key_body(k, _):
        ok = kkey[k] > 0.5
        rx = jnp.where(ok, kx[k] - cx, 0.0)
        ry = jnp.where(ok, ky[k] - cy, 0.0)
        kx[k] = rx
        ky[k] = ry
        kkey[k] = jnp.where(ok, _pseudo_angle(rx, ry), _BIG)
        return 0

    jax.lax.fori_loop(0, NSLOT, key_body, 0)
    for k in range(NSLOT, NSORT):  # sentinels
        kx[k] = jnp.zeros((TM, TN), jnp.float32)
        ky[k] = jnp.zeros((TM, TN), jnp.float32)
        kkey[k] = jnp.full((TM, TN), _BIG, jnp.float32)

    # --- phase 3: Batcher network as a loop over the CE list --------------
    def ce_body(s, _):
        i = net_ref[s, 0]
        j = net_ref[s, 1]
        ki = kkey[i]
        kj = kkey[j]
        swap = ki > kj
        xi = kx[i]
        xj = kx[j]
        yi = ky[i]
        yj = ky[j]
        kkey[i] = jnp.where(swap, kj, ki)
        kkey[j] = jnp.where(swap, ki, kj)
        kx[i] = jnp.where(swap, xj, xi)
        kx[j] = jnp.where(swap, xi, xj)
        ky[i] = jnp.where(swap, yj, yi)
        ky[j] = jnp.where(swap, yi, yj)
        return 0

    jax.lax.fori_loop(0, net_ref.shape[0], ce_body, 0)

    # --- phase 4: shoelace over ordered slots ------------------------------
    q0x = kx[0]
    q0y = ky[0]

    def pad_body(k, _):
        ok = kkey[k] < _BIG * 0.5
        kx[k] = jnp.where(ok, kx[k], q0x)
        ky[k] = jnp.where(ok, ky[k], q0y)
        return 0

    jax.lax.fori_loop(1, NSLOT, pad_body, 0)

    def shoe_body(k, acc):
        k2 = jnp.where(k == NSLOT - 1, 0, k + 1)
        return acc + (kx[k] * ky[k2] - kx[k2] * ky[k])

    area2 = jax.lax.fori_loop(
        0, NSLOT, shoe_body, jnp.zeros((TM, TN), jnp.float32)
    )
    inter = jnp.where(nval > 2, 0.5 * jnp.abs(area2), 0.0)

    area_a = w1 * h1
    area_b = w2 * h2
    union = area_a + area_b - inter
    iou = inter / jnp.where(union > 0, union, 1.0)
    out_ref[:] = jnp.where((area_a < 1e-14) | (area_b < 1e-14), 0.0, iou)


def _pad_boxes(boxes, mult):
    n = boxes.shape[0]
    padn = (-n) % mult
    b = jnp.pad(boxes.astype(jnp.float32), ((0, padn), (0, 0)))
    return jnp.pad(b, ((0, 0), (0, 3))), n  # feature dim 5 -> 8


@functools.partial(jax.jit, static_argnames=("interpret",))
def box_iou_rotated_pallas(boxes1, boxes2, interpret: bool = False):
    """Pairwise rotated IoU via the Pallas kernel.

    Args:
      boxes1: [N, 5], boxes2: [M, 5] (x, y, w, h, theta), any float dtype.
      interpret: run in interpreter mode (CPU tests).

    Returns:
      [N, M] float32.
    """
    b1, n = _pad_boxes(boxes1, TM)
    b2, m = _pad_boxes(boxes2, TN)
    np_, mp_ = b1.shape[0], b2.shape[0]
    net = jnp.asarray(np.array(_batcher_network(NSORT), dtype=np.int32))
    out = pl.pallas_call(
        _kernel,
        grid=(np_ // TM, mp_ // TN),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # CE network indices
            pl.BlockSpec((TM, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, mp_), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NSORT, TM, TN), jnp.float32),  # kx
            pltpu.VMEM((NSORT, TM, TN), jnp.float32),  # ky
            pltpu.VMEM((NSORT, TM, TN), jnp.float32),  # kkey
            pltpu.VMEM((16, TM, TN), jnp.float32),     # geo (pts of both boxes)
        ],
        interpret=interpret,
    )(net, b1, b2)
    return out[:n, :m]

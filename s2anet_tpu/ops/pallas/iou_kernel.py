"""Pallas TPU kernel: pairwise rotated-box IoU with bounding-circle tile skip.

Plays the role of the reference's box_iou_rotated CUDA kernel
(utils/box_iou_rotated/src/box_iou_rotated_cuda.cu — 32x16 shared-memory
tiles of a 24-candidate polygon-clip + hull routine). TPU-native design:

  * the [N, M] pair matrix is tiled into [TM, TN] = [32, 128] blocks and each
    tile evaluates the *sort-free* segment-clip IoU: the same boundary-tally
    algorithm as the XLA path (ops.iou_rotated.iou_pairs — see its docstring
    for the math and the orientation-aware epsilon tie-breaks; formulas here
    mirror it term for term and the test suite pins the two paths to
    bitwise-close agreement);
  * assignment workloads are spatially local (anchors arrive in grid order,
    gts cluster inside the chip), so most tiles contain no feasible pair at
    all. A bounding-circle test + one any-reduction guards the clip: miss
    tiles cost ~15 vector ops. This per-tile branch is the thing XLA cannot
    express — and why the kernel beats the already-fused XLA formulation
    (score-ordered NMS inputs are spatially shuffled, so the skip does NOT
    help there — NMS stays on the XLA path);
  * inputs arrive box-major [N, 8] for rows but TRANSPOSED [8, M] for
    columns, and the 8 box edges live in tiny [8, TM, TN] VMEM scratch
    arrays walked by fori_loops: per-tile sublane->lane transposes and
    Mosaic's scoped-VMEM accounting of a fully unrolled clip (51 MB charged
    vs the 16 MB stack) were each ~6x slowdowns.

v5e, fp32 (scan-differenced): assignment [21824 anchors x 64 gts] 0.40 ms
(XLA path 1.14 ms); dense random [2048 x 2048] 1.57 ms (XLA 1.70 ms; the
round-1 sort-based kernel and the round-1 XLA path both took 34-39 ms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..iou_rotated import _PARALLEL_TOL2, _SIDE_EPS

TM = 32
TN = 128


def _kernel(b1_ref, b2t_ref, out_ref, qx_s, qy_s, ex_s, ey_s, *, tm, tn):
    # b1 block is [TM, 8] (param k read as a sublane vector -> [TM, 1]);
    # b2 arrives TRANSPOSED as [8, TN] so param k is a native lane vector —
    # reading a column of a [TN, 8] block would force a 128-sublane->lane
    # transpose in every tile (it dominated the kernel's runtime).
    rows = b1_ref[:]  # [TM, 8]
    cols = b2t_ref[:]  # [8, TN]
    p1 = tuple(rows[:, k][:, None] for k in range(5))
    p2 = tuple(cols[k][None, :] for k in range(5))
    x1, y1, w1, h1, a1 = p1
    x2, y2, w2, h2, a2 = p2

    dxc = x1 - x2
    dyc = y1 - y2
    rr = 0.5 * (jnp.sqrt(w1 * w1 + h1 * h1) + jnp.sqrt(w2 * w2 + h2 * h2))
    feasible = (
        (dxc * dxc + dyc * dyc <= rr * rr)
        & (w1 * h1 > 1e-14)
        & (w2 * h2 > 1e-14)
    )
    hit = jnp.any(feasible)

    @pl.when(jnp.logical_not(hit))
    def _miss():
        out_ref[:] = jnp.zeros((tm, tn), jnp.float32)

    @pl.when(hit)
    def _hit():
        # pair-midpoint centering (exact zeros for identical boxes)
        sx = dxc * 0.5
        sy = dyc * 0.5

        def corners(w, h, a):
            c2 = jnp.cos(a) * 0.5
            s2 = jnp.sin(a) * 0.5
            p0 = (-s2 * h - c2 * w, c2 * h - s2 * w)
            p1_ = (s2 * h - c2 * w, -c2 * h - s2 * w)
            return (p0, p1_, (-p0[0], -p0[1]), (-p1_[0], -p1_[1]))

        shape = (tm, tn)
        ca = corners(w1, h1, a1)
        cb = corners(w2, h2, a2)
        pa = [(jnp.broadcast_to(px + sx, shape), jnp.broadcast_to(py + sy, shape))
              for px, py in ca]
        pb = [(jnp.broadcast_to(px - sx, shape), jnp.broadcast_to(py - sy, shape))
              for px, py in cb]
        # slots 0..3: box1 edges, 4..7: box2 edges
        for k in range(4):
            qx_s[k] = pa[k][0]
            qy_s[k] = pa[k][1]
            ex_s[k] = pa[(k + 1) % 4][0] - pa[k][0]
            ey_s[k] = pa[(k + 1) % 4][1] - pa[k][1]
            qx_s[4 + k] = pb[k][0]
            qy_s[4 + k] = pb[k][1]
            ex_s[4 + k] = pb[(k + 1) % 4][0] - pb[k][0]
            ey_s[4 + k] = pb[(k + 1) % 4][1] - pb[k][1]

        def make_edge_body(qbase, eps):
            # the four clip planes are STATIC indices (the edge fori is split
            # into a box1 half and a box2 half) so the inner loop unrolls to a
            # straight-line ~120-op body — small enough for Mosaic's scoped
            # dataflow accounting, big enough to stay in vregs.
            def edge_body(k, acc):
                px = qx_s[k]
                py = qy_s[k]
                dx = ex_s[k]
                dy = ey_s[k]
                d2 = dx * dx + dy * dy
                lo = jnp.zeros(shape, jnp.float32)
                hi = jnp.ones(shape, jnp.float32)
                ok = jnp.ones(shape, jnp.float32)
                for m in range(qbase, qbase + 4):
                    ex = ex_s[m]
                    ey = ey_s[m]
                    qx = qx_s[m]
                    qy = qy_s[m]
                    c1 = ex * dy - ey * dx
                    # opposite-direction collinear twins -> always-drop bias
                    tie = jnp.where(ex * dx + ey * dy > 0, eps, -_SIDE_EPS)
                    c0 = ex * (py - qy) - ey * (px - qx) + tie
                    para = (
                        c1 * c1 <= _PARALLEL_TOL2 * (ex * ex + ey * ey) * d2
                    )
                    t = -c0 / jnp.where(para, 1.0, c1)
                    lo = jnp.maximum(lo, jnp.where(~para & (c1 > 0), t, 0.0))
                    hi = jnp.minimum(hi, jnp.where(~para & (c1 < 0), t, 1.0))
                    # float-carried: Mosaic can't legalize i1-vector loop args
                    ok = jnp.minimum(
                        ok, jnp.where(~para | (c0 >= 0), 1.0, 0.0)
                    )
                dt = ok * jnp.maximum(hi - lo, 0.0)
                return acc + dt * (px * dy - py * dx)

            return edge_body

        acc = jax.lax.fori_loop(
            0, 4, make_edge_body(4, _SIDE_EPS),
            jnp.zeros(shape, jnp.float32),
        )
        acc = jax.lax.fori_loop(
            4, 8, make_edge_body(0, -_SIDE_EPS), acc
        )
        inter = 0.5 * jnp.abs(acc)
        area1 = w1 * h1
        area2 = w2 * h2
        union = area1 + area2 - inter
        iou = inter / jnp.where(union > 0, union, 1.0)
        out_ref[:] = jnp.where(feasible, iou, 0.0)


def _pad_boxes(boxes, mult):
    n = boxes.shape[0]
    padn = (-n) % mult
    b = jnp.pad(boxes.astype(jnp.float32), ((0, padn), (0, 0)))
    return jnp.pad(b, ((0, 0), (0, 3))), n  # feature dim 5 -> 8


@functools.partial(jax.jit, static_argnames=("interpret", "tm", "tn"))
def box_iou_rotated_pallas(boxes1, boxes2, interpret: bool = False,
                           tm: int = TM, tn: int = TN):
    """Pairwise rotated IoU via the Pallas kernel.

    Args:
      boxes1: [N, 5], boxes2: [M, 5] (x, y, w, h, theta), any float dtype.
      interpret: run in interpreter mode (CPU tests).

    Returns:
      [N, M] float32.
    """
    b1, n = _pad_boxes(boxes1, tm)
    b2, m = _pad_boxes(boxes2, tn)
    np_, mp_ = b1.shape[0], b2.shape[0]
    out = pl.pallas_call(
        functools.partial(_kernel, tm=tm, tn=tn),
        grid=(np_ // tm, mp_ // tn),
        in_specs=[
            pl.BlockSpec((tm, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, mp_), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, tm, tn), jnp.float32),  # qx
            pltpu.VMEM((8, tm, tn), jnp.float32),  # qy
            pltpu.VMEM((8, tm, tn), jnp.float32),  # ex
            pltpu.VMEM((8, tm, tn), jnp.float32),  # ey
        ],
        interpret=interpret,
    )(b1, b2.T)
    return out[:n, :m]

import numpy as np
import jax.numpy as jnp
import pytest

from s2anet_tpu.ops import box_iou_rotated
from s2anet_tpu.ops.polyiou_ref import box_iou_rotated_np, iou_poly
from s2anet_tpu.ops.rbox import PI


def random_boxes(rng, n, span=1024.0, wmax=200.0):
    return np.stack(
        [
            rng.uniform(0, span, n),
            rng.uniform(0, span, n),
            rng.uniform(2, wmax, n),
            rng.uniform(1, wmax / 2, n),
            rng.uniform(-PI / 4, 3 * PI / 4, n),
        ],
        axis=1,
    ).astype(np.float32)


def test_identical_boxes():
    b = jnp.array([[50.0, 50.0, 20.0, 10.0, 0.3]])
    iou = np.asarray(box_iou_rotated(b, b))
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-5)


def test_disjoint_boxes():
    b1 = jnp.array([[0.0, 0.0, 10.0, 10.0, 0.0]])
    b2 = jnp.array([[100.0, 100.0, 10.0, 10.0, 0.7]])
    iou = np.asarray(box_iou_rotated(b1, b2))
    np.testing.assert_allclose(iou, [[0.0]], atol=1e-7)


def test_contained_box():
    outer = jnp.array([[0.0, 0.0, 20.0, 20.0, 0.0]])
    inner = jnp.array([[0.0, 0.0, 10.0, 10.0, PI / 4]])
    iou = np.asarray(box_iou_rotated(outer, inner))[0, 0]
    np.testing.assert_allclose(iou, 100.0 / 400.0, atol=1e-5)


def test_crossed_rectangles():
    # two long thin boxes crossing at 90 degrees: intersection = 4x4 square
    b1 = jnp.array([[0.0, 0.0, 20.0, 4.0, 0.0]])
    b2 = jnp.array([[0.0, 0.0, 20.0, 4.0, PI / 2]])
    iou = np.asarray(box_iou_rotated(b1, b2))[0, 0]
    np.testing.assert_allclose(iou, 16.0 / (80 + 80 - 16), atol=1e-5)


def test_degenerate_zero_area():
    b1 = jnp.array([[0.0, 0.0, 0.0, 0.0, 0.0]])
    b2 = jnp.array([[0.0, 0.0, 10.0, 10.0, 0.0]])
    iou = np.asarray(box_iou_rotated(b1, b2))
    np.testing.assert_allclose(iou, [[0.0]])


def test_vs_oracle_random(rng):
    b1 = random_boxes(rng, 64)
    b2 = random_boxes(rng, 48)
    got = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    want = box_iou_rotated_np(b1, b2)
    np.testing.assert_allclose(got, want, atol=2e-3)
    assert got.min() >= -1e-6 and got.max() <= 1 + 1e-5


def test_vs_oracle_clustered(rng):
    # heavy-overlap regime (NMS-like): boxes clustered around few centers
    centers = rng.uniform(100, 200, (8, 2))
    idx = rng.integers(0, 8, 80)
    b = np.stack(
        [
            centers[idx, 0] + rng.normal(0, 4, 80),
            centers[idx, 1] + rng.normal(0, 4, 80),
            rng.uniform(10, 60, 80),
            rng.uniform(5, 30, 80),
            rng.uniform(-PI / 4, 3 * PI / 4, 80),
        ],
        axis=1,
    ).astype(np.float32)
    got = np.asarray(box_iou_rotated(jnp.asarray(b), jnp.asarray(b)))
    want = box_iou_rotated_np(b, b)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_chunked_matches_unchunked(rng):
    b1 = random_boxes(rng, 70)
    b2 = random_boxes(rng, 20)
    full = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2), block_n=128))
    chunked = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2), block_n=16))
    np.testing.assert_allclose(full, chunked, atol=1e-6)


def test_oracle_self_consistency():
    # iou_poly agrees with analytic answer on a known pair
    p1 = np.array([0, 0, 10, 0, 10, 10, 0, 10], dtype=float)
    p2 = np.array([5, 0, 15, 0, 15, 10, 5, 10], dtype=float)
    np.testing.assert_allclose(iou_poly(p1, p2), 50.0 / 150.0, atol=1e-12)


def test_large_coordinates_precision():
    # far from origin — the center-shift trick must keep fp32 honest
    b1 = jnp.array([[8000.0, 8000.0, 30.0, 10.0, 0.4]])
    b2 = jnp.array([[8003.0, 8001.0, 28.0, 12.0, 0.5]])
    got = float(np.asarray(box_iou_rotated(b1, b2))[0, 0])
    want = box_iou_rotated_np(np.asarray(b1), np.asarray(b2))[0, 0]
    assert abs(got - want) < 5e-3


# --- adversarial cases for the segment-clip formulation -------------------
# The no-sort boundary tally relies on a signed-epsilon tie-break for
# collinear twin edges; these cases hit every branch of that argument.

def test_grid_aligned_touching_anchors():
    """Same-size boxes on a grid whose edges touch EXACTLY (anchor vs anchor:
    w == 4*stride means anchors 4 cells apart share an edge bitwise)."""
    s = 8.0
    boxes = np.array(
        [[x * s, y * s, 4 * s, 4 * s, 0.0] for x in range(6) for y in range(6)],
        np.float32,
    )
    got = np.asarray(box_iou_rotated(jnp.asarray(boxes), jnp.asarray(boxes)))
    want = box_iou_rotated_np(boxes.astype(np.float64), boxes.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=2e-4)
    # diagonal must be exactly 1 (identical boxes)
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-6)


def test_stacked_touching_different_sizes():
    """Edge-to-edge touching boxes of different heights: opposite-direction
    collinear twin edges (the both-keep-and-cancel branch)."""
    a = np.array([[100.0, 100.0, 80.0, 40.0, 0.0]], np.float32)
    b = np.array([[100.0, 130.0, 60.0, 20.0, 0.0]], np.float32)  # touches y=120
    got = float(box_iou_rotated(jnp.asarray(a), jnp.asarray(b))[0, 0])
    assert abs(got) < 1e-5


def test_near_identical_jitter():
    """NMS duplicate pairs: boxes differing by sub-pixel jitter. Every edge
    pair is collinear to float noise — IoU must stay near 1, never collapse."""
    rng = np.random.default_rng(5)
    base = random_boxes(rng, 200)
    jit = base.copy()
    jit[:, :2] += rng.uniform(-1e-3, 1e-3, (200, 2)).astype(np.float32)
    jit[:, 4] += rng.uniform(-1e-5, 1e-5, 200).astype(np.float32)
    got = np.asarray(
        box_iou_rotated(jnp.asarray(base), jnp.asarray(jit))
    ).diagonal()
    # worst case is a high-aspect box (143x12) where the near-parallel edge
    # crossing parameter t = c0/c1 hits fp32 cancellation (~1% IoU error —
    # the same precision class the reference CUDA clamps around,
    # models/utils.py:89-98). NMS/assignment thresholds sit at 0.4-0.5.
    assert got.min() > 0.97
    assert got.mean() > 0.995


def test_shared_edge_partial_overlap():
    """Boxes sharing a collinear edge segment while overlapping in area
    (same-direction twins: the exactly-one-pass-keeps branch)."""
    a = np.array([[50.0, 50.0, 100.0, 40.0, 0.0]], np.float32)
    b = np.array([[80.0, 50.0, 60.0, 40.0, 0.0]], np.float32)  # same top/bottom lines
    got = float(box_iou_rotated(jnp.asarray(a), jnp.asarray(b))[0, 0])
    want = box_iou_rotated_np(a.astype(np.float64), b.astype(np.float64))[0, 0]
    assert abs(got - want) < 1e-4


def test_rotated_near_parallel(rng):
    """Rotated pairs with nearly-parallel edges (parallel-tolerance branch)."""
    n = 256
    b1 = random_boxes(rng, n)
    b2 = b1.copy()
    b2[:, 4] += rng.uniform(-1e-6, 1e-6, n).astype(np.float32)
    b2[:, :2] += rng.uniform(-30, 30, (n, 2)).astype(np.float32)
    got = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    want = box_iou_rotated_np(b1.astype(np.float64), b2.astype(np.float64))
    np.testing.assert_allclose(np.diag(got), np.diag(want), atol=5e-3)

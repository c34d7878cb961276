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

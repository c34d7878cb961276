import math

import numpy as np
import jax.numpy as jnp
import pytest

from s2anet_tpu.ops import (
    norm_angle,
    rbox_vertices,
    rbox_to_poly,
    poly_to_rbox,
    rboxes_encode,
    rboxes_decode,
)
from s2anet_tpu.ops.rbox import poly_to_rbox_np, PI


def test_norm_angle_range():
    angles = np.linspace(-10, 10, 2001)
    out = np.asarray(norm_angle(angles))
    assert np.all(out >= -PI / 4 - 1e-9)
    assert np.all(out < 3 * PI / 4 + 1e-9)
    # identity inside the range
    inside = np.linspace(-PI / 4 + 1e-3, 3 * PI / 4 - 1e-3, 101)
    np.testing.assert_allclose(np.asarray(norm_angle(inside)), inside, atol=1e-9)
    # periodicity
    np.testing.assert_allclose(
        np.asarray(norm_angle(inside + PI)), inside, atol=1e-6
    )


def test_vertices_axis_aligned():
    # axis-aligned box: theta=0, w along x
    box = jnp.array([[10.0, 20.0, 8.0, 4.0, 0.0]])
    v = np.asarray(rbox_vertices(box))[0]
    expect = {(6.0, 18.0), (6.0, 22.0), (14.0, 18.0), (14.0, 22.0)}
    got = {(round(float(x), 5), round(float(y), 5)) for x, y in v}
    assert got == expect
    # consecutive vertices must share edges of length h,w alternating
    d = np.linalg.norm(np.roll(v, -1, 0) - v, axis=1)
    np.testing.assert_allclose(sorted(d), [4, 4, 8, 8], atol=1e-5)


def test_vertices_rotated_area_preserved(rng):
    boxes = np.stack(
        [
            rng.uniform(0, 100, 50),
            rng.uniform(0, 100, 50),
            rng.uniform(2, 30, 50),
            rng.uniform(1, 20, 50),
            rng.uniform(-PI / 4, 3 * PI / 4, 50),
        ],
        axis=1,
    )
    v = np.asarray(rbox_vertices(jnp.asarray(boxes)))
    # shoelace area == w*h
    x, y = v[..., 0], v[..., 1]
    area = 0.5 * np.abs(
        np.sum(x * np.roll(y, -1, axis=1) - np.roll(x, -1, axis=1) * y, axis=1)
    )
    np.testing.assert_allclose(area, boxes[:, 2] * boxes[:, 3], rtol=1e-4)


def test_poly_rbox_roundtrip(rng):
    boxes = np.stack(
        [
            rng.uniform(0, 1000, 100),
            rng.uniform(0, 1000, 100),
            rng.uniform(10, 200, 100),
            rng.uniform(5, 100, 100),
            rng.uniform(-PI / 4 + 0.01, 3 * PI / 4 - 0.01, 100),
        ],
        axis=1,
    )
    boxes[:, 2] = np.maximum(boxes[:, 2], boxes[:, 3] + 1.0)  # w strictly long
    polys = np.asarray(rbox_to_poly(jnp.asarray(boxes)))
    back = poly_to_rbox_np(polys)
    np.testing.assert_allclose(back[:, :4], boxes[:, :4], atol=1e-3)
    dang = np.asarray(norm_angle(back[:, 4] - boxes[:, 4]))
    dang = np.minimum(np.abs(dang), np.abs(np.abs(dang) - PI))
    assert np.max(dang) < 1e-3


def test_poly_to_rbox_jax_matches_np(rng):
    boxes = np.stack(
        [
            rng.uniform(0, 1000, 64),
            rng.uniform(0, 1000, 64),
            rng.uniform(20, 200, 64),
            rng.uniform(5, 15, 64),
            rng.uniform(-PI / 4 + 0.01, 3 * PI / 4 - 0.01, 64),
        ],
        axis=1,
    )
    polys = rbox_to_poly(jnp.asarray(boxes))
    back = np.asarray(poly_to_rbox(polys))
    np.testing.assert_allclose(back[:, :4], boxes[:, :4], rtol=1e-3, atol=1e-3)


def test_encode_decode_roundtrip(rng):
    n = 200
    anchors = np.stack(
        [
            rng.uniform(0, 1000, n),
            rng.uniform(0, 1000, n),
            rng.uniform(16, 128, n),
            rng.uniform(16, 128, n),
            np.zeros(n),
        ],
        axis=1,
    ).astype(np.float32)
    gt = np.stack(
        [
            rng.uniform(0, 1000, n),
            rng.uniform(0, 1000, n),
            rng.uniform(10, 300, n),
            rng.uniform(5, 150, n),
            rng.uniform(-PI / 4 + 0.01, 3 * PI / 4 - 0.01, n),
        ],
        axis=1,
    ).astype(np.float32)
    deltas = rboxes_encode(jnp.asarray(anchors), jnp.asarray(gt))
    rec = np.asarray(
        rboxes_decode(jnp.asarray(anchors), deltas, wh_ratio_clip=1e-6)
    )
    np.testing.assert_allclose(rec[:, :4], gt[:, :4], rtol=1e-3, atol=1e-2)
    dang = np.abs(np.asarray(norm_angle(rec[:, 4] - gt[:, 4])))
    assert dang.max() < 1e-3


def test_decode_reference_values():
    """Hand-checked decode against the reference formula (boxes.py:82-162)."""
    anchors = jnp.array([[100.0, 100.0, 32.0, 32.0, 0.0]])
    deltas = jnp.array([[0.25, -0.5, math.log(2.0), math.log(0.5), 0.25]])
    out = np.asarray(rboxes_decode(anchors, deltas))[0]
    # theta_anchor=0: gx = dx*w + x, gy = dy*h + y
    np.testing.assert_allclose(out[0], 100 + 0.25 * 32, rtol=1e-5)
    np.testing.assert_allclose(out[1], 100 - 0.5 * 32, rtol=1e-5)
    np.testing.assert_allclose(out[2], 64.0, rtol=1e-5)
    np.testing.assert_allclose(out[3], 16.0, rtol=1e-5)
    np.testing.assert_allclose(out[4], norm_angle(PI * 0.25), rtol=1e-5)


def test_decode_wh_clip():
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0, 0.0]])
    deltas = jnp.array([[0.0, 0.0, 100.0, -100.0, 0.0]])
    out = np.asarray(rboxes_decode(anchors, deltas, wh_ratio_clip=16 / 1000))
    max_ratio = abs(math.log(16 / 1000))
    np.testing.assert_allclose(out[0, 2], 10 * math.exp(max_ratio), rtol=1e-5)
    np.testing.assert_allclose(out[0, 3], 10 * math.exp(-max_ratio), rtol=1e-5)

"""Golden tests: native C++ polygon kernels vs the NumPy oracle."""

import os

import numpy as np
import pytest

from s2anet_tpu import native
from s2anet_tpu.ops.rbox import PI


needs_native = pytest.mark.skipif(
    native.get_lib() is None, reason="native lib unavailable"
)


@needs_native
def test_native_builds():
    assert native.get_lib() is not None


@needs_native
def test_native_iou_poly_matches_numpy(rng):
    os.environ.pop("S2ANET_NO_NATIVE", None)
    from s2anet_tpu.ops import polyiou_ref as ref

    for _ in range(50):
        c1 = rng.uniform(0, 100, 2)
        c2 = c1 + rng.normal(0, 10, 2)
        a1, a2 = rng.uniform(0, PI, 2)
        w1, h1, w2, h2 = rng.uniform(5, 40, 4)

        def mk(c, w, h, a):
            pts = np.array([[-w / 2, -h / 2], [w / 2, -h / 2],
                            [w / 2, h / 2], [-w / 2, h / 2]])
            R = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
            return (pts @ R.T + c).reshape(8)

        p1, p2 = mk(c1, w1, h1, a1), mk(c2, w2, h2, a2)
        got = native.iou_poly_native(p1, p2)
        # force the numpy path
        want_inter = ref.poly_intersection_area(p1.reshape(4, 2), p2.reshape(4, 2))
        area1 = w1 * h1
        area2 = w2 * h2
        want = want_inter / (area1 + area2 - want_inter) if want_inter else 0.0
        assert abs(got - want) < 1e-9


@needs_native
def test_native_rbox_matrix_matches_numpy(rng):
    from s2anet_tpu.ops import polyiou_ref as ref

    boxes = np.stack(
        [
            rng.uniform(0, 200, 20),
            rng.uniform(0, 200, 20),
            rng.uniform(5, 80, 20),
            rng.uniform(2, 40, 20),
            rng.uniform(-PI / 4, 3 * PI / 4, 20),
        ],
        axis=1,
    )
    got = native.rbox_iou_matrix_native(boxes, boxes)
    os.environ["S2ANET_NO_NATIVE"] = "1"
    try:
        # rebuild-free numpy path: call internals directly
        v = ref.rbox_vertices_np(boxes)
        want = np.zeros((20, 20))
        for i in range(20):
            a1 = boxes[i, 2] * boxes[i, 3]
            for j in range(20):
                a2 = boxes[j, 2] * boxes[j, 3]
                inter = ref.poly_intersection_area(v[i], v[j])
                want[i, j] = inter / (a1 + a2 - inter)
    finally:
        os.environ.pop("S2ANET_NO_NATIVE", None)
    np.testing.assert_allclose(got, want, atol=1e-9)
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-12)


@needs_native
def test_native_poly_nms(rng):
    polys = np.array(
        [
            [0, 0, 10, 0, 10, 10, 0, 10],
            [1, 1, 11, 1, 11, 11, 1, 11],
            [50, 50, 60, 50, 60, 60, 50, 60],
        ],
        float,
    )
    keep = native.poly_nms_native(polys, np.array([0.9, 0.8, 0.7]), 0.5)
    assert sorted(keep) == [0, 2]

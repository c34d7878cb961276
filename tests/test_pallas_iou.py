"""Pallas rotated-IoU kernel vs the XLA path (interpreter mode on CPU).

The kernel mirrors ops.iou_rotated.iou_pairs term for term; these tests pin
the two backends to near-bitwise agreement, including the degenerate
geometries the epsilon tie-breaks exist for, and exercise the bounding-circle
tile-skip and the vmap batching rule used by the assigner.
"""

import numpy as np
import jax
import jax.numpy as jnp

from s2anet_tpu.ops.iou_rotated import box_iou_rotated
from s2anet_tpu.ops.pallas.iou_kernel import box_iou_rotated_pallas
from s2anet_tpu.ops.polyiou_ref import box_iou_rotated_np


def _pallas(b1, b2, **kw):
    return box_iou_rotated_pallas(
        jnp.asarray(b1), jnp.asarray(b2), interpret=True, **kw
    )


def _rand(rng, n, span=300.0):
    return np.stack(
        [
            rng.uniform(0, span, n),
            rng.uniform(0, span, n),
            rng.uniform(4, 80, n),
            rng.uniform(4, 40, n),
            rng.uniform(-np.pi / 4, 3 * np.pi / 4, n),
        ],
        axis=1,
    ).astype(np.float32)


def test_matches_xla_random(rng):
    b1 = _rand(rng, 70)
    b2 = _rand(rng, 50)
    got = np.asarray(_pallas(b1, b2))
    want = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_matches_oracle_random(rng):
    b1 = _rand(rng, 40)
    b2 = _rand(rng, 30)
    got = np.asarray(_pallas(b1, b2))
    want = box_iou_rotated_np(b1.astype(np.float64), b2.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_tile_skip_far_apart_exact_zero(rng):
    """Pairs whose bounding circles cannot touch: the skipped tile must
    write exact zeros (and agree with the XLA path)."""
    b1 = _rand(rng, 40, span=100.0)
    b2 = _rand(rng, 40, span=100.0)
    b2[:, 0] += 5000.0
    got = np.asarray(_pallas(b1, b2))
    assert (got == 0.0).all()


def test_mixed_near_far_tiles(rng):
    """One tile row mixing overlapping and impossible pairs — the skip
    branch must not leak across lanes."""
    b1 = _rand(rng, 16, span=60.0)
    b2 = np.concatenate([_rand(rng, 8, span=60.0), _rand(rng, 8, span=60.0)])
    b2[8:, 1] += 4000.0
    got = np.asarray(_pallas(b1, b2))
    want = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert (got[:, 8:] == 0.0).all()


def test_degenerate_geometries():
    """Identical, grid-touching, stacked-touching, shared-edge, contained."""
    s = 8.0
    grid = np.array(
        [[x * s, y * s, 4 * s, 4 * s, 0.0] for x in range(4) for y in range(4)],
        np.float32,
    )
    stacked = np.array(
        [[100.0, 100.0, 80.0, 40.0, 0.0], [100.0, 130.0, 60.0, 20.0, 0.0]],
        np.float32,
    )
    shared = np.array(
        [[50.0, 50.0, 100.0, 40.0, 0.0], [80.0, 50.0, 60.0, 40.0, 0.0]],
        np.float32,
    )
    contained = np.array(
        [[10.0, 10.0, 50.0, 30.0, 0.3], [10.0, 10.0, 20.0, 10.0, 0.3]],
        np.float32,
    )
    padded = np.zeros((3, 5), np.float32)  # padded gt slots must give 0
    boxes = np.concatenate([grid, stacked, shared, contained, padded])
    got = np.asarray(_pallas(boxes, boxes))
    want = np.asarray(box_iou_rotated(jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(got, want, atol=1e-6)
    real = len(boxes) - 3
    np.testing.assert_allclose(np.diag(got)[:real], 1.0, atol=1e-6)
    assert (got[:, real:] == 0.0).all()


def test_vmap_batching(rng):
    """The assigner vmaps the kernel over the batch dimension."""
    b1 = np.stack([_rand(rng, 24) for _ in range(3)])
    b2 = np.stack([_rand(rng, 16) for _ in range(3)])
    got = np.asarray(
        jax.vmap(lambda a, b: box_iou_rotated_pallas(a, b, interpret=True))(
            jnp.asarray(b1), jnp.asarray(b2)
        )
    )
    want = np.asarray(
        jax.vmap(box_iou_rotated)(jnp.asarray(b1), jnp.asarray(b2))
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_assigner_pallas_impl_matches(rng):
    """assign_labels(iou_impl='pallas') == assign_labels(iou_impl='xla')."""
    from s2anet_tpu.models.assigner import assign_labels

    anchors = jnp.asarray(_rand(rng, 200, span=800.0))
    gts = jnp.asarray(_rand(rng, 12, span=800.0))
    mask = jnp.ones(12, bool)
    # interpret mode can't be threaded through assign_labels; on the CPU
    # backend pallas_call falls back to interpret only if asked — so compare
    # through the public flag only when a TPU is present, else via the IoU.
    if jax.default_backend() == "tpu":
        a1, _ = assign_labels(anchors, gts, mask, iou_impl="pallas")
        a2, _ = assign_labels(anchors, gts, mask, iou_impl="xla")
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    else:
        from s2anet_tpu.models.assigner import assign_from_iou

        iou_p = _pallas(np.asarray(anchors), np.asarray(gts))
        iou_x = box_iou_rotated(anchors, gts)
        valid = jnp.ones(200, bool)
        a1, _ = assign_from_iou(jnp.asarray(iou_p), valid, mask)
        a2, _ = assign_from_iou(iou_x, valid, mask)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

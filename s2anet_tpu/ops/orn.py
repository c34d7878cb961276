"""Oriented Response Networks ops: Active Rotating Filters + invariant pooling.

The ARF "kernel" in the reference is a CUDA scatter that materializes nRotation
rotated copies of each filter through a precomputed permutation table
(/root/reference/models/orn/src/cuda/ActiveRotatingFilter_cuda.cu:20-46, table
built in models/orn/modules/ORConv.py:41-75). On TPU this is just a static
weight gather that XLA folds into the convolution — no kernel needed.

Output layout matches the CUDA kernel exactly:
  expanded[cout * nRot + r, cin * nOrient + o, ky, kx]
i.e. rotation is the fastest-varying output-channel axis, which is what
RotationInvariantPooling's ``view(N, C/8, 8, H, W)`` + max assumes
(models/orn/functions/rotation_invariant_pooling.py:19-27).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# 45-degree-step rotations of a 3x3 (and trivial 1x1) kernel grid, expressed as
# 1-indexed source positions: after rotating the filter by `angle`, output tap j
# reads input tap table[angle][j]. This is the standard ORN permutation table.
_KERNEL_ROTATIONS = {
    1: {a: (1,) for a in range(0, 360, 45)},
    3: {
        0: (1, 2, 3, 4, 5, 6, 7, 8, 9),
        45: (2, 3, 6, 1, 5, 9, 4, 7, 8),
        90: (3, 6, 9, 2, 5, 8, 1, 4, 7),
        135: (6, 9, 8, 3, 5, 7, 2, 1, 4),
        180: (9, 8, 7, 6, 5, 4, 3, 2, 1),
        225: (8, 7, 4, 9, 5, 1, 6, 3, 2),
        270: (7, 4, 1, 8, 5, 2, 9, 6, 3),
        315: (4, 1, 2, 7, 5, 3, 8, 9, 6),
    },
}


@functools.lru_cache(maxsize=None)
def arf_indices(n_orientation: int = 8, n_rotation: int = 8, kernel_size: int = 3):
    """Forward scatter indices, shape [nEntry, nRotation], 0-based.

    ``scatter_idx[l, k]`` is the flat (orientation, ky, kx) entry of rotated
    copy ``k`` that receives weight entry ``l``. Parity with ORConv.py:41-75
    (which stores them 1-based).
    """
    assert n_orientation & (n_orientation - 1) == 0
    assert n_rotation & (n_rotation - 1) == 0
    kk = kernel_size * kernel_size
    n_entry = n_orientation * kk
    delta_orient = 360 // n_orientation
    delta_rot = 360 // n_rotation
    idx = np.zeros((n_entry, n_rotation), dtype=np.int64)
    for o in range(n_orientation):
        for j in range(kk):
            for k in range(n_rotation):
                angle = (delta_rot * k) % 360
                layer = (o + angle // delta_orient) % n_orientation
                tap = _KERNEL_ROTATIONS[kernel_size][angle][j]  # 1-based
                idx[o * kk + j, k] = layer * kk + (tap - 1)
    return idx


@functools.lru_cache(maxsize=None)
def _arf_gather_indices(n_orientation: int, n_rotation: int, kernel_size: int):
    """Inverse permutation: gather_idx[k, e] = source entry for output entry e."""
    scatter = arf_indices(n_orientation, n_rotation, kernel_size)
    n_entry = scatter.shape[0]
    gather = np.zeros((n_rotation, n_entry), dtype=np.int64)
    for k in range(n_rotation):
        gather[k, scatter[:, k]] = np.arange(n_entry)
    return gather


def rotate_arf(weight, n_rotation: int = 8):
    """Expand an ARF weight into its rotated copies.

    Args:
      weight: ``[Cout, Cin, nOrient, kH, kW]``.
      n_rotation: number of rotated copies.

    Returns:
      ``[Cout * nRot, Cin * nOrient, kH, kW]`` (OIHW), rotation fastest on the
      output-channel axis — byte-compatible with the reference CUDA layout.
    """
    cout, cin, n_orient, kh, kw = weight.shape
    assert kh == kw
    gather = jnp.asarray(_arf_gather_indices(n_orient, n_rotation, kh))
    # jnp conversion first: a plain-numpy weight (e.g. a checkpoint closed
    # over by a jitted fn) indexed with a traced constant would fail
    flat = jnp.asarray(weight).reshape(cout, cin, n_orient * kh * kw)
    # [Cout, Cin, nRot, nEntry]
    expanded = flat[:, :, gather]
    expanded = expanded.transpose(0, 2, 1, 3)  # [Cout, nRot, Cin, nEntry]
    return expanded.reshape(cout * n_rotation, cin * n_orient, kh, kw)


def rotation_invariant_pooling(x, n_orientation: int = 8):
    """Max-pool over the orientation axis of ARF features (NHWC).

    ``[B, H, W, C]`` -> ``[B, H, W, C // nOrient]`` taking the max across each
    channel's nOrient rotated responses (channel = feature * nOrient + rot).
    Parity: models/orn/functions/rotation_invariant_pooling.py:19-27.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, c // n_orientation, n_orientation)
    return x.max(axis=-1)

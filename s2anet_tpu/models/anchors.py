"""Rotated anchor generation — static, precomputed at trace time.

The reference regenerates grid anchors on CPU every forward and ships them to
the GPU (/root/reference/models/head.py:315-326, models/anchors.py:75-126 — a
known inefficiency). Here anchor grids are pure functions of static feature
shapes, so under jit they constant-fold into the compiled program and live in
HBM once.

Anchor semantics (parity with models/anchors.py:6-126):
  * base size = featmap stride; one anchor per cell by default with
    scale 4, ratio 1 (square), angle 0 (head.py:66-68).
  * center offset ``0.5 * (stride - 1)`` puts anchors on pixel centers.
  * ratio >= 1 interpreted as long/short side; w gets sqrt(ratio), h gets
    1/sqrt(ratio) so area is preserved.
"""

from __future__ import annotations

import itertools
import math
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class AnchorGeneratorRotated:
    base_size: float
    scales: tuple = (4.0,)
    ratios: tuple = (1.0,)
    angles: tuple = (0.0,)

    def __post_init__(self):
        assert all(s >= 1.0 for s in self.scales)
        assert all(-math.pi < a <= math.pi for a in self.angles)

    @property
    def num_base_anchors(self) -> int:
        return len(self.scales) * len(self.ratios) * len(self.angles)

    def base_anchors(self) -> np.ndarray:
        """[num_base, 3] of (w, h, angle)."""
        out = []
        for r, s, a in itertools.product(self.ratios, self.scales, self.angles):
            wr = math.sqrt(r)
            out.append(
                (self.base_size * wr * s, self.base_size / wr * s, a)
            )
        return np.array(out, dtype=np.float32).reshape(-1, 3)

    def grid_anchors(self, featmap_size, stride) -> np.ndarray:
        """[H*W*num_base, 5] anchors (x, y, w, h, theta) in image pixels."""
        h, w = featmap_size
        base = self.base_anchors()
        xs = np.arange(w, dtype=np.float32) * stride + 0.5 * (stride - 1)
        ys = np.arange(h, dtype=np.float32) * stride + 0.5 * (stride - 1)
        xx = np.tile(xs, h)
        yy = np.repeat(ys, w)
        ctr = np.stack([xx, yy], axis=1)  # [H*W, 2]
        na = base.shape[0]
        anchors = np.concatenate(
            [
                np.repeat(ctr[:, None, :], na, axis=1),
                np.broadcast_to(base[None], (h * w, na, 3)),
            ],
            axis=-1,
        )
        return anchors.reshape(-1, 5)


def grid_anchors(featmap_size, stride, scales=(4.0,), ratios=(1.0,), angles=(0.0,)):
    """Convenience wrapper returning [H*W*A, 5] float32 anchors."""
    gen = AnchorGeneratorRotated(float(stride), tuple(scales), tuple(ratios), tuple(angles))
    return gen.grid_anchors(featmap_size, stride)

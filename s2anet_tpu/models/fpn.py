"""FPN / PAN necks (flax, NHWC).

Parity: /root/reference/models/neck.py:5-160 — 1x1 laterals, nearest-2x
top-down additive fusion, 3x3 output convs, extra P6 (stride-2 conv on C5) and
P7 (stride-2 conv on P6); Xavier-uniform init. The PAN variant adds a
bottom-up path with stride-2 convs.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.quant import conv_ctor

_xavier = nn.initializers.xavier_uniform()


def _upsample_nearest_2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    dtype: Optional[Any] = None   # None = compute in the inputs' dtype
    quant: str = "none"           # int8 PTQ mode (ops/quant.py)

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        Conv = conv_ctor(self.quant)
        dtype = self.dtype if self.dtype is not None else inputs[0].dtype
        n_in = len(self.in_channels)
        n_extra = max(self.num_outs - n_in, 0)

        laterals = [
            Conv(self.out_channels, (1, 1), kernel_init=_xavier,
                 dtype=dtype, name=f"lateral_{i}")(inputs[i])
            for i in range(n_in)
        ]
        for i in range(n_in - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_2x(laterals[i])

        outs = [
            Conv(self.out_channels, (3, 3), padding="SAME",
                 kernel_init=_xavier, dtype=dtype, name=f"fpn_{i}")(laterals[i])
            for i in range(n_in)
        ]
        for i in range(n_extra):
            src = inputs[-1] if i == 0 else outs[-1]
            outs.append(
                Conv(self.out_channels, (3, 3), (2, 2), [(1, 1), (1, 1)],
                     kernel_init=_xavier, dtype=dtype,
                     name=f"fpn_{n_in + i}")(src)
            )
        return tuple(outs)


class PAN(nn.Module):
    """FPN + bottom-up aggregation path (neck.py:99-160)."""

    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    dtype: Optional[Any] = None
    quant: str = "none"

    @nn.compact
    def __call__(self, inputs):
        Conv = conv_ctor(self.quant)
        dtype = self.dtype if self.dtype is not None else inputs[0].dtype
        outs = list(
            FPN(self.in_channels, self.out_channels, self.num_outs,
                dtype=dtype, quant=self.quant, name="fpn")(inputs)
        )
        n_in = len(self.in_channels)
        for i in range(1, n_in):
            down = Conv(self.out_channels, (3, 3), (2, 2), [(1, 1), (1, 1)],
                        dtype=dtype, name=f"pan_down_{i - 1}")(outs[i - 1])
            outs[i] = outs[i] + nn.relu(down)
            outs[i] = nn.relu(
                Conv(self.out_channels, (3, 3), padding="SAME",
                     dtype=dtype, name=f"pan_out_{i - 1}")(outs[i])
            )
        for i in range(n_in, self.num_outs):
            outs[i] = nn.relu(
                Conv(self.out_channels, (3, 3), padding="SAME",
                     dtype=dtype, name=f"pan_out_{i - 1}")(outs[i])
            )
        return tuple(outs)

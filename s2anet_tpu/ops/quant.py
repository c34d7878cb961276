"""Post-training int8 quantization (PTQ) for TPU inference.

The v5e MXU runs int8 at 2x its bf16 rate (measured 357 TOP/s vs 182
TFLOP/s on a realistic quantized conv chain *including* the quant/dequant
epilogues — BENCH.md round-3 int8 probe; the 394-TOPS spec within 10%).
This module makes that rate available to the conv-dominated inference path
(backbone + FPN + head stacks ~= 85% of device time) without touching
training, checkpoints, or the reference semantics of the float path:

  * :class:`QuantConv` is a drop-in for ``flax.linen.Conv`` with an
    IDENTICAL parameter tree ("kernel" [kh,kw,cin,cout] f32, optional
    "bias") — any trained/imported checkpoint loads unchanged;
  * activations use per-tensor ASYMMETRIC int8 (zero-point), calibrated
    offline from a handful of batches (:func:`calibrate`) — post-ReLU
    feature maps are non-negative, so a symmetric scheme would waste half
    the 8-bit range;
  * weights use per-output-channel symmetric scales, quantized on the fly
    from the float params (one cheap pass over weights per forward —
    negligible next to activations);
  * accumulation is int32 on the MXU; the zero-point correction
    ``zp * sum(wq)`` is a per-output-channel constant, and SAME padding is
    applied with the zero-point value (the int8 representation of real
    0.0) so padded borders stay exact — the classic PTQ zero-pad bug is
    structurally impossible here.

This is an inference-only mode (no QAT): the reference has no
quantization story at all, so there is no reference file to cite — the
float path (``quant="none"``) remains the parity-tested default.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# quantized values stay in [-QMAX, QMAX] (symmetric clip; avoids the -128
# asymmetry so the negated range is always representable)
QMAX = 127.0


def _resolve_pads(x_shape, kernel_size, strides, padding):
    """Explicit per-spatial-dim (lo, hi) pads for NHWC convs."""
    if isinstance(padding, str):
        return jax.lax.padtype_to_pads(
            x_shape[1:3], kernel_size, strides, padding.upper()
        )
    return [tuple(p) for p in padding]


def _act_qparams(amin, amax):
    """Per-tensor asymmetric (scale, zero_point) from a calibrated range.

    The range is widened to include 0 so that real 0.0 is exactly
    representable (required for zero-point padding; TFLite does the same).
    """
    lo = jnp.minimum(amin.astype(jnp.float32), 0.0)
    hi = jnp.maximum(amax.astype(jnp.float32), 0.0)
    scale = jnp.maximum((hi - lo) / (2.0 * QMAX), 1e-8)
    zp = jnp.round(-QMAX - lo / scale)  # maps lo -> -QMAX, hi -> +QMAX
    return scale, zp


class QuantConv(nn.Module):
    """``nn.Conv``-compatible conv computing through int8 on request.

    mode="calib": float forward (identical math to ``nn.Conv``) that also
    records the input's running min/max into the mutable ``"quant"``
    collection (variables ``act_min`` / ``act_max``).

    mode="int8": static PTQ forward — requires the ``"quant"`` collection
    (from :func:`calibrate`) among the apply variables.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[Any] = None
    mode: str = "int8"  # "calib" | "int8"

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, cin, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        dtype = self.dtype if self.dtype is not None else x.dtype

        if self.mode == "calib":
            is_init = not self.has_variable("quant", "act_min")
            amin = self.variable(
                "quant", "act_min", lambda: jnp.zeros((), jnp.float32))
            amax = self.variable(
                "quant", "act_max", lambda: jnp.zeros((), jnp.float32))
            xf32 = x.astype(jnp.float32)
            bmin, bmax = jnp.min(xf32), jnp.max(xf32)
            if is_init:  # first batch: take its range outright
                amin.value, amax.value = bmin, bmax
            else:
                amin.value = jnp.minimum(amin.value, bmin)
                amax.value = jnp.maximum(amax.value, bmax)
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype),
                tuple(self.strides),
                _resolve_pads(x.shape, self.kernel_size, self.strides,
                              self.padding),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        elif self.mode == "int8":
            if not self.has_variable("quant", "act_min"):
                if not self.is_initializing():
                    raise ValueError(
                        f"QuantConv {self.name!r} in int8 mode but the "
                        "'quant' collection (calibrated activation ranges) "
                        "was not passed to apply(); run "
                        "ops.quant.calibrate() first"
                    )
                # init: create placeholder ranges so the parameter/variable
                # trees exist; real ranges come from calibrate()
                self.variable("quant", "act_min",
                              lambda: jnp.float32(-1.0))
                self.variable("quant", "act_max", lambda: jnp.float32(1.0))
            amin = self.get_variable("quant", "act_min")
            amax = self.get_variable("quant", "act_max")
            s, zp = _act_qparams(amin, amax)
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / s) + zp, -QMAX, QMAX
            ).astype(jnp.int8)
            # per-output-channel symmetric weight scales
            kf = kernel.astype(jnp.float32)
            sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / QMAX,
                             1e-12)
            wq = jnp.clip(jnp.round(kf / sw), -QMAX, QMAX).astype(jnp.int8)
            # pad with the zero point (the int8 encoding of real 0.0), then
            # a VALID conv: padded positions contribute w*(zp - zp) = 0
            # after the zero-point correction — exact zero padding
            pads = _resolve_pads(x.shape, self.kernel_size, self.strides,
                                 self.padding)
            zp8 = zp.astype(jnp.int8)
            xq = jax.lax.pad(
                xq, zp8,
                ((0, 0, 0),) + tuple((p[0], p[1], 0) for p in pads)
                + ((0, 0, 0),),
            )
            acc = jax.lax.conv_general_dilated(
                xq, wq, tuple(self.strides), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            sumw = jnp.sum(wq.astype(jnp.int32), axis=(0, 1, 2))  # [cout]
            corr = zp.astype(jnp.int32) * sumw
            y = ((acc - corr).astype(jnp.float32) * (s * sw)).astype(dtype)
        else:
            raise ValueError(f"unknown QuantConv mode {self.mode!r}")

        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


def conv_ctor(quant: str = "none"):
    """The conv constructor for a module's ``quant`` setting.

    "none"/"" -> ``nn.Conv``; "calib"/"int8" -> :class:`QuantConv` in that
    mode. Model modules call this once and use the result everywhere a
    quantizable conv sits, so the parameter tree is identical across modes.
    """
    if quant in ("", "none"):
        return nn.Conv
    if quant in ("calib", "int8"):
        return functools.partial(QuantConv, mode=quant)
    raise ValueError(f"unknown quant mode {quant!r} "
                     "(expected none | calib | int8)")


def calibrate(model, variables, images, train: bool = False):
    """Calibrate activation ranges for int8 inference.

    Runs ``model.clone(quant="calib")`` over the calibration images inside
    ONE jitted scan (a single compile) and folds the per-batch ranges.

    Args:
      model: the detector module (any ``quant`` setting; cloned to calib).
      variables: apply variables (``params`` + ``batch_stats``) — the
        float weights to calibrate against.
      images: ``[K, B, H, W, C]`` stacked calibration batches (>= 1 batch;
        a handful of val batches is plenty for per-tensor ranges).
      train: phase flag passed to apply (False for eval-mode BN).

    Returns:
      The ``"quant"`` collection (host numpy), to pass alongside params to
      an int8-mode apply.
    """
    import numpy as np

    calib = model.clone(quant="calib")
    images = jnp.asarray(images)
    assert images.ndim >= 2, "images must be [K, B, ...] stacked batches"

    def one_batch(v, imgs):
        _, upd = calib.apply(v, imgs, train=train, mutable=["quant"])
        return upd["quant"]

    # leaf identity (min vs max) by variable name, via the flattened tree
    from flax.traverse_util import flatten_dict, unflatten_dict

    q_shape = jax.eval_shape(one_batch, variables, images[0])
    flat_keys = list(flatten_dict(q_shape).keys())

    @jax.jit
    def run(v, images):
        def body(carry, imgs):
            q = one_batch(v, imgs)
            fq, fc = flatten_dict(q), flatten_dict(carry)
            merged = {
                k: (jnp.minimum if k[-1] == "act_min" else jnp.maximum)(
                    fc[k], fq[k])
                for k in fq
            }
            return unflatten_dict(merged), None

        init = unflatten_dict({
            k: (jnp.full((), jnp.inf, jnp.float32) if k[-1] == "act_min"
                else jnp.full((), -jnp.inf, jnp.float32))
            for k in flat_keys
        })
        final, _ = jax.lax.scan(body, init, images)
        return final

    return jax.device_get(jax.tree_util.tree_map(np.asarray,
                                                 run(variables, images)))

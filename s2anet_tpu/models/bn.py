"""Training BatchNorm with Pallas moment reductions.

Drop-in replacement for ``nn.BatchNorm`` in TRAINING mode (identical
parameter/statistics trees: "scale"/"bias" params, "mean"/"var" batch_stats;
identical math: f32 batch stats, E[x^2]-E[x]^2 variance, momentum-0.9
running averages, f32 normalize cast to the compute dtype). The difference
is purely WHERE the reductions run:

  * forward mean/E[x^2]: one Pallas pass over the activation
    (:func:`..ops.pallas.moments.channel_moments`) instead of XLA's
    convert+reduce fusions;
  * backward dgamma/dbeta: one Pallas pass over (g, x)
    (:func:`..ops.pallas.moments.grad_channel_sums`) via a custom VJP that
    also emits the closed-form dx (the standard BN backward), so XLA never
    builds the autodiff reduction chain at all.

The elementwise normalize/dx expressions stay plain jnp — XLA fuses them
into neighboring producers/consumers as before; only the reductions moved.

Parity note: the reference trains BN in every stage
(/root/reference/models/detector.py:20 ``frozen_stages=-1``,
``norm_eval=False``), which is why the stat passes exist at all. Eval-mode
BN (running averages) is unaffected — this module defers to the plain
affine there.

Data-parallel: under the GSPMD-jitted train step the activations are
batch-sharded and a ``pallas_call`` cannot be partitioned by GSPMD; with a
``mesh`` the reductions run under ``jax.shard_map`` with an explicit
``psum``, reproducing global-batch statistics exactly (the single-chip
semantics, same policy as the loss normalization in parallel/step.py).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Optional[Any]


def _moments_local(x, interpret: bool):
    from ..ops.pallas.moments import (channel_moments,
                                      pallas_moments_supported)

    c = x.shape[-1]
    if pallas_moments_supported(x.size // c, c, x.dtype.itemsize):
        return channel_moments(x, interpret=interpret)
    xf = x.astype(jnp.float32).reshape(-1, c)
    return xf.sum(axis=0), (xf * xf).sum(axis=0)


def _pair_local(g, x, interpret: bool):
    from ..ops.pallas.moments import (grad_channel_sums,
                                      pallas_moments_supported)

    c = x.shape[-1]
    if pallas_moments_supported(x.size // c, c, x.dtype.itemsize):
        return grad_channel_sums(g, x, interpret=interpret)
    gf = g.astype(jnp.float32).reshape(-1, c)
    xf = x.astype(jnp.float32).reshape(-1, c)
    return gf.sum(axis=0), (gf * xf).sum(axis=0)


def _shard_specs(mesh, ndim):
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    return axis, P(axis, *([None] * (ndim - 1))), P()


def _global_moments(x, mesh, interpret: bool):
    if mesh is None or mesh.devices.size <= 1:
        return _moments_local(x, interpret)
    axis, in_spec, rep = _shard_specs(mesh, x.ndim)

    def body(xs):
        s, q = _moments_local(xs, interpret)
        return jax.lax.psum(s, axis), jax.lax.psum(q, axis)

    return jax.shard_map(body, mesh=mesh, in_specs=(in_spec,),
                         out_specs=(rep, rep), check_vma=False)(x)


def _global_pair(g, x, mesh, interpret: bool):
    if mesh is None or mesh.devices.size <= 1:
        return _pair_local(g, x, interpret)
    axis, in_spec, rep = _shard_specs(mesh, x.ndim)

    def body(gs, xs):
        sg, sgx = _pair_local(gs, xs, interpret)
        return jax.lax.psum(sg, axis), jax.lax.psum(sgx, axis)

    return jax.shard_map(body, mesh=mesh, in_specs=(in_spec, in_spec),
                         out_specs=(rep, rep), check_vma=False)(g, x)


def _bn_fwd_math(x, scale, bias, eps, mesh, interpret, dtype):
    c = x.shape[-1]
    n = x.size // c
    s, q = _global_moments(x, mesh, interpret)
    mean = s / n
    var = jnp.maximum(q / n - mean * mean, 0.0)
    mul = scale * jax.lax.rsqrt(var + eps)
    y = ((x.astype(jnp.float32) - mean) * mul + bias).astype(dtype)
    return y, mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def bn_train_apply(x, scale, bias, eps, mesh, interpret, dtype):
    """Training-mode BN: ``(y, mean, var)`` with Pallas-reduced statistics.

    ``mean``/``var`` are the BATCH statistics (f32 [C]) for the caller's
    running-average update. ``dtype`` is the output compute dtype (flax
    semantics: normalize in f32, cast the result).
    """
    return _bn_fwd_math(x, scale, bias, eps, mesh, interpret, dtype)


def _bn_fwd(x, scale, bias, eps, mesh, interpret, dtype):
    y, mean, var = _bn_fwd_math(x, scale, bias, eps, mesh, interpret, dtype)
    return (y, mean, var), (x, scale, mean, var)


def _bn_bwd(eps, mesh, interpret, dtype, res, cts):
    x, scale, mean, var = res
    gy, gmean, gvar = cts
    c = x.shape[-1]
    n = x.size // c
    rstd = jax.lax.rsqrt(var + eps)
    sg, sgx = _global_pair(gy, x, mesh, interpret)
    dbeta = sg
    dgamma = (sgx - mean * sg) * rstd
    gyf = gy.astype(jnp.float32)
    xc = x.astype(jnp.float32) - mean
    # standard BN backward: dx = s*rstd * (g - mean(g) - xhat * mean(g*xhat))
    dx = (scale * rstd) * (gyf - dbeta / n - xc * (rstd * dgamma / n))
    # cotangents of the mean/var outputs (running-average taps; zero when
    # only the loss is differentiated — XLA folds the zero constants away)
    dx = dx + gmean / n + xc * (2.0 / n) * gvar
    return (dx.astype(x.dtype), dgamma.astype(scale.dtype),
            dbeta.astype(scale.dtype))


bn_train_apply.defvjp(_bn_fwd, _bn_bwd)


class PallasBatchNorm(nn.Module):
    """``nn.BatchNorm``-compatible module using :func:`bn_train_apply` for
    training-mode statistics (see module docstring). Parameter and
    batch_stats trees match ``nn.BatchNorm`` exactly, so checkpoints are
    interchangeable and the ``bn_impl`` knob is a pure performance switch.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = None
    mesh: Optional[Any] = None
    interpret: bool = False

    @nn.compact
    def __call__(self, x):
        feats = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feats,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feats,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feats,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feats,), jnp.float32))
        dtype = self.dtype if self.dtype is not None else x.dtype
        if self.use_running_average:
            mul = (scale * jax.lax.rsqrt(ra_var.value + self.epsilon))
            return ((x.astype(jnp.float32) - ra_mean.value) * mul
                    + bias).astype(dtype)
        if self.is_initializing():
            # init runs eagerly — keep it kernel-free (shapes only)
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = xf.mean(axis=axes)
            var = jnp.maximum((xf * xf).mean(axis=axes) - mean * mean, 0.0)
            mul = scale * jax.lax.rsqrt(var + self.epsilon)
            return ((xf - mean) * mul + bias).astype(dtype)
        y, mean, var = bn_train_apply(x, scale, bias, self.epsilon,
                                      self.mesh, self.interpret, dtype)
        m = self.momentum
        ra_mean.value = m * ra_mean.value + (1 - m) * mean
        ra_var.value = m * ra_var.value + (1 - m) * var
        return y

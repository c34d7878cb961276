"""Pallas TPU kernels: per-channel moment reductions for training BatchNorm.

Why: the BN-stat reductions are the largest non-MXU block of the train step
(39 ms of 183.6 ms device time at R-50 1024^2 batch 8 — BENCH.md round-3
trace): the forward reads every conv output once more for mean/E[x^2], and
the backward reads the gradient and the activation once more for
dgamma/dbeta. Those bytes are irreducible (variance is quadratic in the
conv weights, so it cannot be folded into the conv algebraically), but the
byte ARITHMETIC says ~11 GB/step -> ~14-16 ms at HBM speed, i.e. XLA's
`convert_reduce_fusion` passes run at well under half the roofline. These
kernels do the same reductions as single-read, f32-accumulating Pallas
programs:

  * :func:`channel_moments`   — x -> (sum, sum_sq) per channel (BN forward)
  * :func:`grad_channel_sums` — (g, x) -> (sum_g, sum_gx) per channel
    (BN backward: dbeta = sum_g, dgamma = (sum_gx - mean*sum_g)*rstd)

Both keep the channel axis on the VPU lanes (the natural NHWC minor dim) and
block the flattened batch*space rows across a 1-D grid, accumulating into a
single [1, C] f32 output block (constant index_map: Mosaic keeps it resident
in VMEM across grid steps). Channels < 128 are viewed as [N/f, f*C] so the
lanes stay full, then the f sub-sums fold on the host side of the call.

Consumed by :class:`s2anet_tpu.models.bn.PallasBatchNorm` (the train-time
BatchNorm swap-in; reference trains BN everywhere —
/root/reference/models/detector.py:20 ``frozen_stages=-1``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# target per-input-block bytes (double-buffered by Mosaic across grid steps)
_BLOCK_BYTES = 2 * 1024 * 1024
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)


def _moments_kernel(x_ref, sum_ref, sq_ref):
    i = pl.program_id(0)
    xf = x_ref[...].astype(jnp.float32)  # [R, C]
    s = xf.sum(axis=0, keepdims=True)
    q = (xf * xf).sum(axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        sum_ref[...] = s
        sq_ref[...] = q

    @pl.when(i > 0)
    def _acc():
        sum_ref[...] = sum_ref[...] + s
        sq_ref[...] = sq_ref[...] + q


def _pair_kernel(g_ref, x_ref, sg_ref, sgx_ref):
    i = pl.program_id(0)
    gf = g_ref[...].astype(jnp.float32)
    xf = x_ref[...].astype(jnp.float32)
    s = gf.sum(axis=0, keepdims=True)
    q = (gf * xf).sum(axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        sg_ref[...] = s
        sgx_ref[...] = q

    @pl.when(i > 0)
    def _acc():
        sg_ref[...] = sg_ref[...] + s
        sgx_ref[...] = sgx_ref[...] + q


def _fold_geometry(n: int, c: int, itemsize: int):
    """(rows, lanes, fold, block_rows) for viewing [n, c] with full lanes,
    or None when the shape doesn't tile cleanly (caller falls back to XLA).

    fold = 128 // c lane-packing factor for narrow channels; block_rows is
    the largest power of two dividing rows with block bytes <= _BLOCK_BYTES.
    """
    if c >= 128:
        if c % 128:
            return None
        fold, rows, lanes = 1, n, c
    else:
        if 128 % c or n % (128 // c):
            return None
        fold = 128 // c
        rows, lanes = n // fold, c * fold
    target = max(_BLOCK_BYTES // (lanes * itemsize), 8)
    br = 1
    while br * 2 <= target and rows % (br * 2) == 0:
        br *= 2
    if rows % br or br < 8:
        return None
    return rows, lanes, fold, br


def pallas_moments_supported(n: int, c: int, itemsize: int = 2) -> bool:
    """True when [n, c] has a clean lane/block tiling for these kernels."""
    return _fold_geometry(n, c, itemsize) is not None


def channel_moments(x, interpret: bool = False):
    """Per-channel ``(sum, sum_of_squares)`` of ``x [..., C]``, f32 [C].

    One pass over ``x`` (its only read), f32 accumulation regardless of the
    input dtype — the same numbers flax's ``_compute_stats`` produces, minus
    the extra convert/materialize traffic.
    """
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    geom = _fold_geometry(x2.shape[0], c, x2.dtype.itemsize)
    assert geom is not None, (
        f"channel_moments: no clean tiling for {x2.shape} — guard with "
        "pallas_moments_supported()")
    rows, lanes, fold, br = geom
    xv = x2.reshape(rows, lanes)
    s, q = pl.pallas_call(
        _moments_kernel,
        grid=(rows // br,),
        in_specs=[pl.BlockSpec((br, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, lanes), jnp.float32),
            jax.ShapeDtypeStruct((1, lanes), jnp.float32),
        ),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(xv)
    if fold > 1:
        s = s.reshape(fold, c).sum(axis=0)
        q = q.reshape(fold, c).sum(axis=0)
    return s.reshape(c), q.reshape(c)


def grad_channel_sums(g, x, interpret: bool = False):
    """Per-channel ``(sum(g), sum(g * x))`` over ``g, x [..., C]``, f32 [C].

    The BN backward's two reductions in one read of each operand.
    """
    assert g.shape == x.shape, (g.shape, x.shape)
    c = x.shape[-1]
    g2 = g.reshape(-1, c)
    x2 = x.reshape(-1, c)
    geom = _fold_geometry(x2.shape[0], c, x2.dtype.itemsize)
    assert geom is not None, (
        f"grad_channel_sums: no clean tiling for {x2.shape} — guard with "
        "pallas_moments_supported()")
    rows, lanes, fold, br = geom
    gv = g2.reshape(rows, lanes)
    xv = x2.reshape(rows, lanes)
    spec = pl.BlockSpec((br, lanes), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    sg, sgx = pl.pallas_call(
        _pair_kernel,
        grid=(rows // br,),
        in_specs=[spec, spec],
        out_specs=(
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, lanes), jnp.float32),
            jax.ShapeDtypeStruct((1, lanes), jnp.float32),
        ),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(gv, xv)
    if fold > 1:
        sg = sg.reshape(fold, c).sum(axis=0)
        sgx = sgx.reshape(fold, c).sum(axis=0)
    return sg.reshape(c), sgx.reshape(c)


@functools.lru_cache(maxsize=None)
def _moments_trial(backend: str) -> bool:
    """Trial-compile both kernels at a production-like geometry (this
    environment's remote TPU compile service has rejected valid Mosaic
    programs before — the hat kernel's guard caught one; same policy here).
    One tiny compile per process, cached."""
    try:
        x = jnp.zeros((8, 32, 32, 256), jnp.bfloat16)
        g = jnp.zeros((8, 32, 32, 256), jnp.bfloat16)

        def f(xx, gg):
            s, q = channel_moments(xx)
            sg, sgx = grad_channel_sums(gg, xx)
            return (s + q + sg + sgx).sum()

        jax.jit(f).lower(x, g).compile()
        return True
    except Exception as e:
        import logging

        logging.getLogger(__name__).warning(
            "pallas moment kernels failed their trial compile on %s "
            "(%s: %s); bn_impl='auto' falls back to the XLA reductions",
            backend, type(e).__name__, str(e)[:500],
        )
        return False


def moments_kernel_supported() -> bool:
    """True iff the Pallas moment kernels compile on the default backend."""
    backend = jax.default_backend()
    if backend != "tpu":
        return False  # non-TPU runs Pallas only in interpret mode (explicit)
    return _moments_trial(backend)

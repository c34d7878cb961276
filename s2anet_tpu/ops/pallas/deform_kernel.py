"""Pallas TPU kernel: gather-free deformable conv as bilinear *hat matmuls*.

Plays the role of the reference's deformable_im2col / col2im CUDA kernels
(models/dcn/src/deform_conv_cuda.cpp:152-260,
deform_conv_cuda_kernel.cu:83-433) for AlignConv, the sole in-model consumer
(models/alignconv.py:8-98; offsets are stop-gradient there).

Why this shape: XLA's bilinear patch-gather moves 4*C bytes per sample and is
measured AT the HBM/DMA roofline (BENCH.md), and Mosaic has no usable
in-kernel gather/scatter in this environment (dynamic_gather crashes the
remote TPU compiler; scatter has no lowering at all). But the bilinear
sampling operator is a 4-sparse MATRIX, and on TPU a matrix you cannot
gather you can *generate*: for an output tile whose samples all fall inside
a local window of the feature map, build

    hat[i, j] = relu(1 - |jy(j) - py(i)|) * relu(1 - |jx(j) - px(i)|)

over the window's flattened cells j with two broadcast iotas (pure VPU, no
memory traffic), then ride the MXU:

    samples_t = hat_t @ window          # forward sampling
    out      += samples_t @ W_t         # conv tap fused in VMEM
    dwindow  += hat_t^T @ (g @ W_t^T)   # backward: the dx *scatter* becomes
                                        # a transposed matmul
    dW_t     += samples_t^T @ g

The hat form IS zero-pad bilinear semantics exactly: corners beyond +-1 get
weight 0, so samples fully outside the image are exact zeros with no special
casing, and the window's zero-padded margin realizes partial overlaps.

Window locality is not an approximation bet: FPN's scale assignment puts
objects of extent <= ~8 strides on each level, so AlignConv's analytic grid
(anchor-sized, alignconv.py:30-86) stays within a fixed margin of its cell
for every in-distribution anchor. Exactness is still unconditional — a cheap
XLA predicate checks every tap of every position and a batch-level
``lax.cond`` falls back to the exact gather path when any refined anchor
strays (the dispatch lives in :func:`deform_conv2d_hat`).

v5e, bf16, P3 shapes (8x128x128x256): see BENCH.md round-3 log.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile geometry: TH x TW output cells per grid step, window = tile + margin
# cells of context on every side. MARGIN=8 covers anchors up to ~16 strides
# of extent (FPN assigns <= ~8); raise via the `margin` argument if a custom
# dataset needs it (cost grows ~linearly with window area).
TILE_H = 16
TILE_W = 32
MARGIN = 8

# window delivery: "stack" = XLA materializes the [BT, Wf, C] window stack
# (simple, ~3x input bytes of extra traffic); "dma" = the kernel
# double-buffers each window straight out of the padded feature map in HBM
# (no stack materialization). Env knob for A/B: S2A_HAT_WIN.
WIN_MODE = os.environ.get("S2A_HAT_WIN", "stack")

# Mosaic's default scoped-VMEM budget is 16 MiB; the backward kernel's
# resident set at P3 geometry (f32 dwin accumulator + double-buffered window
# and grad blocks once the grid has >1 step) measures 16.9 MiB — just over.
# v5e has 128 MiB of VMEM per core; grant the kernels a third of it.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=40 * 1024 * 1024)


def _geometry(h, w, margin):
    """Tile/window geometry. The backward's overlap-add fold lays each tile
    parity group out on a 2-tile pitch, which requires window <= 2*tile on
    any axis that actually tiles — so the margin is clamped to tile/2 there
    (default margin 8 == TILE_H/2: no clamp at product sizes). Single-tile
    axes keep the full margin (the window is the whole padded axis)."""
    th = min(TILE_H, h)
    tw = min(TILE_W, w)
    ty = -(-h // th)
    tx = -(-w // tw)
    my = margin if ty == 1 else min(margin, th // 2)
    mx = margin if tx == 1 else min(margin, tw // 2)
    wh = th + 2 * my
    ww = tw + 2 * mx
    return th, tw, ty, tx, my, mx, wh, ww


def _tap_coords(offsets, h, w, k, dtype=None):
    """Per-tap absolute sample coordinates, [B, KK, H, W] each for (y, x).

    ALWAYS f32: adding the fractional offset to a grid coordinate in bf16
    would quantize the sample position by the ulp at that magnitude (0.5
    cell at rows >= 64). The hat weights built from these coordinates are
    cast to the compute dtype only at the MXU matmul, where their [0, 1]
    range makes bf16 harmless. ``dtype`` is ignored (kept for callers).
    """
    del dtype
    f32 = jnp.float32
    b = offsets.shape[0]
    pad = (k - 1) // 2
    gy = jnp.arange(h, dtype=f32)[None, None, :, None]
    gx = jnp.arange(w, dtype=f32)[None, None, None, :]
    kk = jnp.arange(k * k)
    ky = (kk // k - pad).astype(f32)[None, :, None, None]
    kx = (kk % k - pad).astype(f32)[None, :, None, None]
    off = offsets.reshape(b, h, w, k * k, 2).transpose(0, 3, 1, 2, 4)
    py = gy + ky + off[..., 0].astype(f32)
    px = gx + kx + off[..., 1].astype(f32)
    return py, px


def _tile_order(arr, b, kk, ty, th, tx, tw, fill):
    """[B, KK, H, W] -> [B*TY*TX, KK, TH*TW], right/bottom padded with fill."""
    h, w = arr.shape[-2:]
    arr = jnp.pad(arr, ((0, 0), (0, 0), (0, ty * th - h), (0, tx * tw - w)),
                  constant_values=fill)
    arr = arr.reshape(b, kk, ty, th, tx, tw)
    arr = arr.transpose(0, 2, 4, 1, 3, 5)
    return arr.reshape(b * ty * tx, kk, th * tw)


def _window_ok(py, px, h, w, th, tw, ty, tx, my, mx):
    """Exactness predicate: every image cell a hat touches is in-window.

    A sample at p touches image rows r in {floor(p), floor(p)+1} with
    |p - r| < 1 and 0 <= r <= n-1; each such row must satisfy
    base <= r <= base + window - 1 (base = tile_origin - margin). Samples
    fully outside the image touch nothing — exact zeros on both paths.
    """
    f32 = jnp.float32
    ok = jnp.bool_(True)
    for (p, n, tsz, ntiles, m) in ((py, h, th, ty, my), (px, w, tw, tx, mx)):
        axis = 2 if p is py else 3
        for i in range(ntiles):
            sl = slice(i * tsz, min((i + 1) * tsz, n))
            pf = (p[:, :, sl, :] if axis == 2 else p[:, :, :, sl]).astype(f32)
            lo, hi = i * tsz - m, i * tsz + tsz - 1 + m
            r0 = jnp.floor(pf)
            for r in (r0, r0 + 1.0):
                touched = (jnp.abs(pf - r) < 1.0) & (r >= 0) & (r <= n - 1)
                ok &= jnp.all(~touched | ((r >= lo) & (r <= hi)))
    return ok


def _prep(x, offsets, k, margin, stack_windows=True, compute_ok=False):
    """Window stack + window-local float sample coords (+ optional predicate).

    Returns (windows [BT, WH*WW, C], lpy, lpx [BT, KK, P], ok scalar bool or
    None); with ``stack_windows=False`` the first element is instead the
    padded feature map [B, TY*TH+2my, TX*TW+2mx, C] for in-kernel DMA
    windowing. The kernel callers pass ``compute_ok=False``: the exactness
    predicate is evaluated once OUTSIDE the ``lax.cond`` by
    :func:`deform_conv2d_hat`; recomputing it inside the taken branch would
    only be dead work for XLA to eliminate.
    """
    b, h, w, c = x.shape
    th, tw, ty, tx, my, mx, wh, ww = _geometry(h, w, margin)
    kk = k * k

    py, px = _tap_coords(offsets, h, w, k, x.dtype)
    ok = (_window_ok(py, px, h, w, th, tw, ty, tx, my, mx)
          if compute_ok else None)

    # window-local coordinates: lp = p - (tile_origin - margin). Padded
    # (beyond-image) positions are filled so that after base subtraction
    # lp <= -2 for every tile -> every hat weight is exactly 0.
    fill = jnp.array(-2.0 * max(my, mx) - 2.0, jnp.float32)
    lpy = _tile_order(py, b, kk, ty, th, tx, tw, fill) - (
        jnp.repeat(jnp.tile(jnp.arange(ty, dtype=jnp.float32) * th - my, b),
                   tx)
    )[:, None, None]
    lpx = _tile_order(px, b, kk, ty, th, tx, tw, fill) - (
        jnp.tile(jnp.arange(tx, dtype=jnp.float32) * tw - mx, b * ty)
    )[:, None, None]

    # padded feature map; "stack" mode additionally materializes the window
    # stack via TY*TX static slices — a dense, fusible copy (~3x input
    # bytes) — while "dma" mode hands xp to the kernel to window itself
    xp = jnp.pad(x, ((0, 0), (my, ty * th - h + my),
                     (mx, tx * tw - w + mx), (0, 0)))
    if not stack_windows:
        return xp, lpy, lpx, ok
    wins = [xp[:, i * th:i * th + wh, j * tw:j * tw + ww]
            for i in range(ty) for j in range(tx)]
    windows = jnp.stack(wins, 1).reshape(b * ty * tx, wh * ww, c)
    return windows, lpy, lpx, ok


def _hat(coord_row, lp_col):
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord_row - lp_col))


def _fwd_kernel(lpy_ref, lpx_ref, win_ref, wconv_ref, out_ref, *,
                kk, wh, ww, p, cout):
    # lp refs arrive [1, P, KK] so each tap's coordinates read as a NATIVE
    # sublane vector [P, 1] (reading a [KK, P] row then reshaping to [P, 1]
    # would be a lane->sublane transpose per tap)
    dt = win_ref.dtype
    wf = wh * ww
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, wf), 1)
    jy = (iota // ww).astype(jnp.float32)  # [1, Wf]; hat built in f32, cast
    jx = (iota % ww).astype(jnp.float32)   # to the MXU dtype only at matmul
    win = win_ref[0]              # [Wf, C]
    acc = jnp.zeros((p, cout), jnp.float32)
    for t in range(kk):
        lpy = lpy_ref[0, :, t:t + 1]  # [P, 1]
        lpx = lpx_ref[0, :, t:t + 1]
        hat = (_hat(jy, lpy) * _hat(jx, lpx)).astype(dt)       # [P, Wf]
        s = jnp.dot(hat, win, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(s.astype(dt), wconv_ref[t],
                            preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _fwd_kernel_dma(lpy_ref, lpx_ref, xp_ref, wconv_ref, out_ref,
                    win_scr, sems, *, kk, th, tw, ty, tx, wh, ww, p, cout, n):
    """Forward with the window double-buffered straight from HBM.

    The grid is sequential on TPU, so slot (i+1)%2 was consumed at step i-1
    and is free to prefetch step i+1's window while step i computes."""
    dt = win_scr.dtype
    wf = wh * ww
    i = pl.program_id(0)
    ntiles = ty * tx

    def win_dma(step, slot):
        b = step // ntiles
        r = step % ntiles
        return pltpu.make_async_copy(
            xp_ref.at[b, pl.ds((r // tx) * th, wh),
                      pl.ds((r % tx) * tw, ww), :],
            win_scr.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _warmup():
        win_dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _prefetch():
        win_dma(i + 1, (i + 1) % 2).start()

    win_dma(i, i % 2).wait()
    win = win_scr[i % 2].reshape(wf, win_scr.shape[-1])

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, wf), 1)
    jy = (iota // ww).astype(jnp.float32)
    jx = (iota % ww).astype(jnp.float32)
    acc = jnp.zeros((p, cout), jnp.float32)
    for t in range(kk):
        lpy = lpy_ref[0, :, t:t + 1]
        lpx = lpx_ref[0, :, t:t + 1]
        hat = (_hat(jy, lpy) * _hat(jx, lpx)).astype(dt)
        s = jnp.dot(hat, win, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(s.astype(dt), wconv_ref[t],
                            preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _bwd_kernel(lpy_ref, lpx_ref, win_ref, wconv_ref, g_ref,
                dwin_ref, dw_ref, *, kk, wh, ww, p, cout):
    dt = win_ref.dtype
    wf = wh * ww
    iota = jax.lax.broadcasted_iota(jnp.int32, (wf, 1), 0)
    jy = (iota // ww).astype(jnp.float32)  # [Wf, 1]; hat in f32, cast at MXU
    jx = (iota % ww).astype(jnp.float32)
    win = win_ref[0]
    g = g_ref[0]                  # [P, Cout]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dwin = jnp.zeros((wf, win.shape[-1]), jnp.float32)
    for t in range(kk):
        lpy = lpy_ref[0, t, :][None, :]  # [1, P]
        lpx = lpx_ref[0, t, :][None, :]
        hat_t = (_hat(jy, lpy) * _hat(jx, lpx)).astype(dt)     # [Wf, P]
        # dL/d(sample_t) = g @ W_t^T
        dsamp = jax.lax.dot_general(
            g, wconv_ref[t], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # [P, C]
        dwin = dwin + jnp.dot(hat_t, dsamp.astype(dt),
                              preferred_element_type=jnp.float32)
        # dW_t = samples_t^T @ g  (samples recomputed on the MXU)
        s = jax.lax.dot_general(
            hat_t, win, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # [P, C]
        dw_ref[t] += jax.lax.dot_general(
            s.astype(dt), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dwin_ref[0] = dwin.astype(dwin_ref.dtype)


def _fold_windows(dwin, b, h, w, c, th, tw, ty, tx, my, mx, wh, ww, dtype):
    """Overlap-add [BT, Wf, C] window grads back into [B, H, W, C].

    Windows overlap only adjacent tiles (margin <= tile/2 on tiled axes, see
    _geometry), so tiles split into four parity groups with disjoint
    windows; each group lays out densely (window padded to the 2*tile
    pitch) and the groups shift-add — the same dense-fold trick as the
    gather backward's parity tilings, no scatter anywhere.
    """
    hp, wp = ty * th, tx * tw
    dwin = dwin.reshape(b, ty, tx, wh, ww, c)
    full = jnp.zeros((b, hp + 2 * my + th, wp + 2 * mx + tw, c), dwin.dtype)
    for py_ in (0, 1):
        ny = -(-(ty - py_) // 2)
        for px_ in (0, 1):
            nx = -(-(tx - px_) // 2)
            if ny <= 0 or nx <= 0:
                continue
            grp = dwin[:, py_::2][:, :, px_::2]
            # pad each window to the layout pitch (2 tiles; a single-tile
            # axis may carry a window wider than that — use it directly)
            pay = max(2 * th, wh) if ny == 1 else 2 * th
            pax = max(2 * tw, ww) if nx == 1 else 2 * tw
            grp = jnp.pad(grp, ((0, 0), (0, 0), (0, 0),
                                (0, pay - wh), (0, pax - ww), (0, 0)))
            grp = grp.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, ny * pay, nx * pax, c)
            oy, ox = py_ * th, px_ * tw
            full = full.at[:, oy:oy + ny * pay,
                           ox:ox + nx * pax].add(grp)
    return full[:, my:my + h, mx:mx + w].astype(dtype)


def _call_fwd(x, offsets, weight, margin, interpret):
    b, h, w, c = x.shape
    k = weight.shape[0]
    kk = k * k
    cout = weight.shape[-1]
    th, tw, ty, tx, my, mx, wh, ww = _geometry(h, w, margin)
    p = th * tw
    wf = wh * ww
    dma = WIN_MODE == "dma"
    feat, lpy, lpx, ok = _prep(x, offsets, k, margin, stack_windows=not dma)
    bt = b * ty * tx
    lpy = lpy.transpose(0, 2, 1)  # [BT, P, KK]: tap coords as sublane vectors
    lpx = lpx.transpose(0, 2, 1)
    wconv = weight.reshape(kk, c, cout).astype(x.dtype)
    lp_spec = pl.BlockSpec((1, p, kk), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((kk, c, cout), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, p, cout), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    if dma:
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_dma, kk=kk, th=th, tw=tw, ty=ty,
                              tx=tx, wh=wh, ww=ww, p=p, cout=cout, n=bt),
            grid=(bt,),
            in_specs=[lp_spec, lp_spec,
                      pl.BlockSpec(memory_space=pltpu.ANY), w_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((bt, p, cout), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, wh, ww, c), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(lpy, lpx, feat, wconv)
    else:
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, kk=kk, wh=wh, ww=ww, p=p,
                              cout=cout),
            grid=(bt,),
            in_specs=[
                lp_spec, lp_spec,
                pl.BlockSpec((1, wf, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                w_spec,
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((bt, p, cout), x.dtype),
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(lpy, lpx, feat, wconv)
    out = out.reshape(b, ty, tx, th, tw, cout).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, ty * th, tx * tw, cout)[:, :h, :w]
    return out, ok


def _call_bwd(x, offsets, weight, g, margin, interpret):
    b, h, w, c = x.shape
    k = weight.shape[0]
    kk = k * k
    cout = weight.shape[-1]
    th, tw, ty, tx, my, mx, wh, ww = _geometry(h, w, margin)
    p = th * tw
    wf = wh * ww
    windows, lpy, lpx, _ = _prep(x, offsets, k, margin)
    bt = windows.shape[0]
    wconv = weight.reshape(kk, c, cout).astype(x.dtype)
    gt = _tile_order(
        g.astype(x.dtype).transpose(0, 3, 1, 2), b, cout, ty, th, tx, tw, 0.0
    ).transpose(0, 2, 1)  # [BT, P, Cout]
    dwin, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, kk=kk, wh=wh, ww=ww, p=p, cout=cout),
        grid=(bt,),
        in_specs=[
            pl.BlockSpec((1, kk, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kk, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wf, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kk, c, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, wf, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kk, c, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bt, wf, c), x.dtype),
            jax.ShapeDtypeStruct((kk, c, cout), jnp.float32),
        ),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(lpy, lpx, windows, wconv, gt)
    dx = _fold_windows(dwin.astype(jnp.float32), b, h, w, c,
                       th, tw, ty, tx, my, mx, wh, ww, x.dtype)
    return dx, dw.reshape(weight.shape).astype(weight.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _hat_core(x, offsets, weight, margin, interpret):
    out, _ = _call_fwd(x, offsets, weight, margin, interpret)
    return out


def _hat_core_fwd(x, offsets, weight, margin, interpret):
    out, _ = _call_fwd(x, offsets, weight, margin, interpret)
    return out, (x, offsets, weight)


def _hat_core_bwd(margin, interpret, res, g):
    x, offsets, weight = res
    dx, dw = _call_bwd(x, offsets, weight, g, margin, interpret)
    # offsets are stop-gradient at the only consumer (AlignConv); generic
    # offset gradients stay on the gather path (ops.deform_conv)
    return dx, jnp.zeros_like(offsets), dw


_hat_core.defvjp(_hat_core_fwd, _hat_core_bwd)


@functools.partial(jax.jit, static_argnames=("kernel_size", "margin",
                                              "interpret", "unconditional"))
def deform_conv2d_hat(x, offsets, weight, bias=None, kernel_size: int = 3,
                      margin: int = MARGIN, interpret: bool = False,
                      unconditional: bool = False):
    """Deformable conv on the hat-matmul kernel, with exact gather fallback.

    Drop-in for :func:`s2anet_tpu.ops.deform_conv.deform_conv2d` with
    ``offset_grad=False`` (offset gradients are zero — AlignConv semantics).
    A batch-level ``lax.cond`` dispatches to the Pallas kernel when every
    sample's support is window-local (the overwhelmingly common case — FPN
    scale assignment) and to the exact XLA gather path otherwise, so the
    result is exact for EVERY input, not just in-distribution ones.

    ``unconditional=True`` drops the predicate AND the fallback branch from
    the program entirely. This matters beyond the predicate's cost: XLA
    reserves conditional temp space as the max over branches, so the unused
    gather backward's multi-GB scatter transients still count against peak
    HBM in a training step. Only pass it when the caller guarantees
    window-locality — e.g. offsets clamped to ``margin - 2`` cells (every
    sample then sits within margin-1 of its cell, and the two rows/cols a
    bilinear sample touches stay inside the window); out-of-window taps
    would otherwise silently lose their out-of-window corners.
    """
    from ..deform_conv import _deform_core_nooff

    assert weight.shape[0] == kernel_size
    b, h, w, _ = x.shape
    if unconditional:
        out = _hat_core(x, offsets, weight, margin, interpret)
    else:
        th, tw, ty, tx, my, mx, _, _ = _geometry(h, w, margin)
        py, px = _tap_coords(offsets, h, w, kernel_size, x.dtype)
        ok = _window_ok(py, px, h, w, th, tw, ty, tx, my, mx)
        out = jax.lax.cond(
            ok,
            lambda xx, oo, ww: _hat_core(xx, oo, ww, margin, interpret),
            lambda xx, oo, ww: _deform_core_nooff(None, xx, oo, ww),
            x, offsets, weight,
        )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


@functools.lru_cache(maxsize=None)
def _hat_trial(backend: str) -> bool:
    """Trial-compile a tiny hat fwd+bwd program on the current backend.

    The hat kernels use only iota/select/matmul Mosaic features, but this
    environment's *remote* TPU compile service has rejected other valid
    Mosaic programs (BENCH.md scatter/gather cost model) — so "auto" mode
    proves the kernel compiles before committing the whole detector program
    to it. One tiny compile per process, cached.
    """
    try:
        # a 2x2 grid of production-geometry tiles (TILE_H x TILE_W, C=256 as
        # at P3): tiny channel counts would compile where the real kernel's
        # VMEM footprint fails, and a SINGLE tile (grid=1) certifies nothing
        # about the multi-step grid either — Mosaic double-buffers every
        # in/out block once the grid pipelines, which is what pushed the
        # backward past the scoped-VMEM budget the first time this ran on
        # real hardware
        x = jnp.zeros((1, 2 * TILE_H, 2 * TILE_W, 256), jnp.bfloat16)
        off = jnp.zeros((1, 2 * TILE_H, 2 * TILE_W, 18), jnp.bfloat16)
        wgt = jnp.zeros((3, 3, 256, 256), jnp.bfloat16)

        def f(xx, ww):
            out = deform_conv2d_hat(xx, off, ww, unconditional=True)
            return out.astype(jnp.float32).sum()

        jax.jit(jax.grad(f, argnums=(0, 1))).lower(x, wgt).compile()
        return True
    except Exception as e:  # compiler rejection, missing lowering, ...
        import logging

        logging.getLogger(__name__).warning(
            "hat deform kernel failed its trial compile on %s (%s: %s); "
            "deform_impl='auto' falls back to the XLA gather path",
            backend, type(e).__name__, str(e)[:500],
        )
        return False


def hat_kernel_supported() -> bool:
    """True iff the Pallas hat kernel compiles on the default backend."""
    backend = jax.default_backend()
    if backend != "tpu":
        return False  # non-TPU runs Pallas only in interpret mode (explicit)
    return _hat_trial(backend)

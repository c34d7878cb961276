"""Deformable convolution as bilinear-gather + MXU matmuls (NHWC).

The reference implements DCNv1 as a CUDA ``deformable_im2col`` gather followed
by a grouped GEMM (/root/reference/models/dcn/src/deform_conv_cuda.cpp:152-260,
deform_conv_cuda_kernel.cu:83-232). On TPU we keep exactly that structure but
let XLA own it: for each of the K*K kernel taps we bilinear-sample the feature
map at ``base_grid + tap + offset`` (zero padding outside, matching
``deformable_im2col_bilinear``) and accumulate ``sample @ W_tap`` — K*K large
``[B*H*W, Cin] x [Cin, Cout]`` matmuls that map straight onto the MXU, with the
gathers fused into the surrounding jit region.

Only the configuration S2ANet uses is supported: stride 1, 'same' padding,
dilation 1, deformable_groups 1 (AlignConv is the sole consumer —
/root/reference/models/alignconv.py:8-98).

``align_conv_offsets`` computes AlignConv's analytic offsets from refined
anchors (parity: alignconv.py:30-86) directly in the ``[..., K*K, 2]`` (dy, dx)
layout this op consumes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# dx scatter tap-chunking: 0/9 = one fused scatter over all 9 taps (fastest
# in isolation); 1..8 = that many taps per scatter — each extra scatter pays
# a read-modify-write pass over the blocks operand but divides the updates
# transient, which matters when the whole train step sits at the HBM remat
# cliff (BENCH.md). Overridable for experiments via S2A_DX_CHUNK.
DX_SCATTER_CHUNK = int(os.environ.get("S2A_DX_CHUNK", "0") or 0)
# dx-scatter updates construction: "outer" ([.., 4, C] outer product) or
# "concat" (4 weighted copies concatenated along the minor axis).
UPD_LAYOUT = os.environ.get("S2A_DEFORM_UPD", "outer")

# forward sampling layout: "tap" = 9 separate gather+matmul passes (small
# transients); "batched" = ONE gather over all 9 taps + ONE [B*HW, 9C] x
# [9C, Cout] matmul (fewer dispatches, bigger MXU contraction, but a
# [B, HW, 9, C]-sized samples transient). Env: S2A_DEFORM_FWD.
FWD_MODE = os.environ.get("S2A_DEFORM_FWD", "tap")


def bilinear_sample_nhwc(feat, py, px):
    """Bilinear sample with zero padding outside the image.

    Args:
      feat: ``[B, H, W, C]``.
      py, px: ``[B, ...]`` float sample coordinates (pixel units, y=row).

    Returns:
      ``[B, ..., C]`` sampled values; 0 where the 2x2 support lies fully outside.
    """
    b, h, w, c = feat.shape
    out_shape = py.shape[1:]
    py = py.reshape(b, -1)
    px = px.reshape(b, -1)

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    ly = py - y0
    lx = px - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    flat = feat.reshape(b, h * w, c)

    def corner(yi, xi, wgt):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * (wgt * inside)[..., None]

    out = (
        corner(y0i, x0i, hy * hx)
        + corner(y0i, x0i + 1, hy * lx)
        + corner(y0i + 1, x0i, ly * hx)
        + corner(y0i + 1, x0i + 1, ly * lx)
    )
    return out.reshape(b, *out_shape, c)


def bilinear_patch_sample(feat, py, px):
    """Bilinear sampling via ONE 2x2xC patch gather per position.

    Four separate row gathers run at ~50 GB/s on TPU; a single `lax.gather`
    with slice_sizes (1, 2, 2, C) moves the same bytes at ~2x the rate and
    one quarter of the op count. Zero-padding outside the image is realized
    through the interpolation weights: corner row r contributes
    ``max(0, 1 - |py - r|)``, which vanishes for out-of-range coordinates,
    while the patch origin is clamped into the array.

    Args:
      feat: ``[B, H, W, C]``.
      py, px: ``[B, P]`` float sample coordinates.

    Returns:
      ``[B, P, C]``.
    """
    b, h, w, c = feat.shape
    if h < 2 or w < 2:
        # degenerate maps (e.g. P7 of tiny test images): zero-pad to 2x2 —
        # identical to zero-pad sampling semantics (the reference DeformConv
        # pads sub-kernel inputs too, models/dcn/deform_conv.py:254-263)
        feat = jnp.pad(feat, ((0, 0), (0, max(2 - h, 0)), (0, max(2 - w, 0)),
                              (0, 0)))
        h, w = max(h, 2), max(w, 2)
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    cy = jnp.clip(y0.astype(jnp.int32), 0, h - 2)
    cx = jnp.clip(x0.astype(jnp.int32), 0, w - 2)

    idx = jnp.stack([cy, cx], axis=-1)  # [B, P, 2]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patch = jax.lax.gather(
        feat, idx, dn, slice_sizes=(1, 2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [B, P, 2, 2, C]

    ry = cy.astype(py.dtype)
    rx = cx.astype(px.dtype)
    wy = jnp.stack(
        [jnp.maximum(0.0, 1.0 - jnp.abs(py - ry)),
         jnp.maximum(0.0, 1.0 - jnp.abs(py - (ry + 1.0)))], axis=-1
    )  # [B, P, 2]
    wx = jnp.stack(
        [jnp.maximum(0.0, 1.0 - jnp.abs(px - rx)),
         jnp.maximum(0.0, 1.0 - jnp.abs(px - (rx + 1.0)))], axis=-1
    )
    wgt = (wy[..., :, None] * wx[..., None, :]).astype(patch.dtype)
    return (patch * wgt[..., None]).sum(axis=(2, 3))


def _tap_positions(x_shape, offsets, t, k, dtype=None):
    """Absolute sample coordinates of tap t — ALWAYS f32.

    The grid coordinate is large (up to H-1): adding the fractional offset
    in bf16 would quantize the sample position by the ulp at that magnitude
    (0.5 cell at rows >= 64), a spatially varying sampling bias. Coordinates
    and bilinear weights are therefore computed in f32; consumers cast the
    resulting WEIGHTS (range [0, 1], where bf16 ulp is harmless) back to the
    compute dtype at use, so matmul/scatter byte costs are unchanged.
    ``dtype`` is accepted for call-site compatibility and ignored.
    """
    del dtype
    b, h, w, _ = x_shape
    pad = (k - 1) // 2
    f32 = jnp.float32
    gy = jnp.arange(h, dtype=f32)[None, :, None]
    gx = jnp.arange(w, dtype=f32)[None, None, :]
    ky = t // k - pad
    kx = t % k - pad
    py = (gy + ky + offsets[..., t, 0].astype(f32)).reshape(b, h * w)
    px = (gx + kx + offsets[..., t, 1].astype(f32)).reshape(b, h * w)
    return py, px


def _corner_data(x_shape, py, px):
    """Clamped patch origins + the 2-point weights along each axis."""
    _, h, w, _ = x_shape
    h2, w2 = max(h, 2), max(w, 2)
    cy = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, h2 - 2)
    cx = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, w2 - 2)
    ry = cy.astype(py.dtype)
    rx = cx.astype(px.dtype)
    wy = (jnp.maximum(0.0, 1.0 - jnp.abs(py - ry)),
          jnp.maximum(0.0, 1.0 - jnp.abs(py - (ry + 1.0))))
    wx = (jnp.maximum(0.0, 1.0 - jnp.abs(px - rx)),
          jnp.maximum(0.0, 1.0 - jnp.abs(px - (rx + 1.0))))
    # d(weight)/d(position): -sign(p - r) where the hat is active
    dwy = (jnp.where(jnp.abs(py - ry) < 1.0, -jnp.sign(py - ry), 0.0),
           jnp.where(jnp.abs(py - ry - 1.0) < 1.0,
                     -jnp.sign(py - ry - 1.0), 0.0))
    dwx = (jnp.where(jnp.abs(px - rx) < 1.0, -jnp.sign(px - rx), 0.0),
           jnp.where(jnp.abs(px - rx - 1.0) < 1.0,
                     -jnp.sign(px - rx - 1.0), 0.0))
    return cy, cx, wy, wx, dwy, dwx


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _deform_core(mode, x, offsets, weight):
    """Deformable conv core (no bias), custom VJP.

    The autodiff transpose of the patch gather is an XLA scatter per
    tap-corner with 2x2 slice windows — measured 5.8 s/call at P3 on v5e. The
    hand-written backward recomputes the cheap forward gathers and issues one
    parity-blocked row-scatter, plus MXU matmuls for the weight grad and
    closed-form bilinear derivatives for the offset grad (same math as the
    reference's col2im/col2im_coord CUDA kernels,
    models/dcn/src/deform_conv_cuda_kernel.cu:279-433, re-derived).
    """
    out, _ = _deform_fwd(mode, x, offsets, weight)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _deform_core_nooff(mode, x, offsets, weight):
    """Deform core whose VJP returns zero offset gradients.

    AlignConv derives its offsets under stop-gradient (the reference computes
    them inside ``@torch.no_grad`` — alignconv.py:29), so the closed-form
    coordinate-gradient pass (a second f32 patch product + reductions, ~1 GB
    of transients at P3) is provably dead there; this variant skips building
    it rather than trusting DCE through the custom_vjp boundary.
    """
    out, _ = _deform_fwd(mode, x, offsets, weight)
    return out


def _deform_fwd(mode, x, offsets, weight):
    b, h, w, cin = x.shape
    k = weight.shape[0]
    cout = weight.shape[-1]
    w_taps = weight.reshape(k * k, cin, cout)

    if (mode or FWD_MODE) == "batched":
        # all taps in one gather + one big MXU contraction
        pys, pxs = zip(*(
            _tap_positions(x.shape, offsets, t, k, x.dtype)
            for t in range(k * k)
        ))
        py = jnp.stack(pys, -1).reshape(b, h * w * k * k)
        px = jnp.stack(pxs, -1).reshape(b, h * w * k * k)
        s = bilinear_patch_sample(x, py, px)          # [B, HW*KK, Cin]
        s = s.reshape(b * h * w, k * k * cin)
        w_all = w_taps.reshape(k * k * cin, cout)
        out = jax.lax.dot_general(
            s, w_all, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(b, h, w, cout)
        return out.astype(x.dtype), (x, offsets, weight)

    acc = jnp.zeros((b, h, w, cout), jnp.promote_types(x.dtype, jnp.float32))
    for t in range(k * k):
        py, px = _tap_positions(x.shape, offsets, t, k, x.dtype)
        s = bilinear_patch_sample(x, py, px)  # [B, H*W, Cin]
        acc = acc + jax.lax.dot_general(
            s.reshape(b * h * w, cin),
            w_taps[t],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(b, h, w, cout)
    return acc.astype(x.dtype), (x, offsets, weight)


def _deform_bwd(mode, res, g, with_offset_grad: bool = True):
    del mode  # forward sampling layout does not change the backward
    x, offsets, weight = res
    b, h, w, cin = x.shape
    k = weight.shape[0]
    cout = weight.shape[-1]
    hw = h * w
    h2, w2 = max(h, 2), max(w, 2)
    w_taps = weight.reshape(k * k, cin, cout)

    g_flat = g.reshape(b, hw, cout).astype(jnp.float32)
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]

    # dx accumulates through a scatter. XLA TPU scatter-add is fast only in
    # canonical row form (scalar row index, fixed row width) and is bound by
    # row count + operand/update traffic, so the naive form's 36 corner rows
    # per position dominate the backward. Instead scatter ONE row per
    # (tap, position): a 2x2 corner window always lies inside exactly one
    # block of one of the FOUR parity-shifted 2x2 block tilings of the image
    # (parity = (cy%2, cx%2)), making the whole [2, 2, C] window a single
    # contiguous row of a [4 * B * Hb * Wb, 4C] operand. 4x fewer rows; the
    # tilings fold back into dx with dense shifted adds. Accumulation dtype
    # follows the input: bf16 training accumulates dx in bf16, ANALOGOUS to
    # (not bit-equivalent with) the reference's fp16 atomicAdd under AMP
    # (deform_conv_cuda_kernel.cu:279-338; bf16 has 7 mantissa bits vs fp16's
    # 10). The end-to-end bf16 acceptance run converges to the same mAP50 as
    # fp32 (BENCH.md "training acceptance"); pass f32 inputs for exact-f32
    # accumulation.
    acc_dt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    hb, wb = h2 // 2 + 1, w2 // 2 + 1

    # dL/d(sample_t) for ALL taps in ONE matmul: g [B*HW, cout] against the
    # stacked [cout, 9*cin] weight, so the scatter's updates are a single
    # fused elementwise expression over its output — no per-tap concatenate
    # (which materialized ~2.4 GB per step as pure data movement)
    w_all = jnp.transpose(w_taps, (2, 0, 1)).reshape(cout, k * k * cin)
    ds_all = jax.lax.dot_general(
        g_flat.reshape(b * hw, cout).astype(acc_dt), w_all.astype(acc_dt),
        (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dt,
    ).reshape(b, hw, k * k, cin)

    dw = jnp.zeros((k * k, cin, cout), jnp.float32)
    d_off = []
    rows = []
    w4s = []
    for t in range(k * k):
        py, px = _tap_positions(x.shape, offsets, t, k, x.dtype)
        cy, cx, wy, wx, dwy, dwx = _corner_data(x.shape, py, px)
        dsamp = ds_all[:, :, t, :].astype(jnp.float32)

        # weight grad: dW_t = s_t^T @ g
        s = bilinear_patch_sample(x, py, px).reshape(b * hw, cin)
        dw = dw.at[t].set(
            jax.lax.dot_general(
                s.astype(jnp.float32), g_flat.reshape(b * hw, cout),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )

        # input grad: one blocked row per tap-position (see scatter below)
        par_y, par_x = cy % 2, cx % 2
        yb, xb = (cy - par_y) // 2, (cx - par_x) // 2
        copy = par_y * 2 + par_x
        rows.append(((copy * b + bidx) * hb + yb) * wb + xb)     # [B, HW]
        w4s.append(jnp.stack(
            [(wy[dy_] * wx[dx_]).astype(acc_dt)
             for dy_ in (0, 1) for dx_ in (0, 1)], -1))           # [B,HW,4]

        if with_offset_grad:
            # offset grad: dL/dpy = sum_c dsamp_c * sum_corners v * dwy * wx
            patch = _gather_patch(x, cy, cx).astype(jnp.float32)
            v_dot = (patch * dsamp[:, :, None, None, :]).sum(-1)  # [B,HW,2,2]
            gy_ = sum(
                v_dot[..., dy_, dx_] * dwy[dy_].astype(jnp.float32)
                * wx[dx_].astype(jnp.float32)
                for dy_ in (0, 1) for dx_ in (0, 1)
            )
            gx_ = sum(
                v_dot[..., dy_, dx_] * wy[dy_].astype(jnp.float32)
                * dwx[dx_].astype(jnp.float32)
                for dy_ in (0, 1) for dx_ in (0, 1)
            )
            d_off.append(jnp.stack([gy_, gx_], axis=-1))  # [B, HW, 2]

    # scatter the tap updates: updates [B, HW, T, 4, cin] = outer product of
    # the corner weights with ds_all, in (b, p, t) row order matching `rows`.
    # DX_SCATTER_CHUNK splits the taps over several scatters — slower in
    # isolation (extra operand RMW passes) but each divides the updates
    # transient by 9/chunk, which can pull the whole step under the HBM
    # remat cliff.
    kk = k * k
    chunk = DX_SCATTER_CHUNK if 0 < DX_SCATTER_CHUNK < kk else kk
    w4 = jnp.stack(w4s, 2)                                # [B, HW, 9, 4]
    blocks = jnp.zeros((4 * b * hb * wb, 4 * cin), acc_dt)
    for t0 in range(0, kk, chunk):
        sl = slice(t0, min(t0 + chunk, kk))
        if UPD_LAYOUT == "concat":
            # build the [.., 4*cin] rows by concatenating the 4 weighted
            # corner copies along the minor axis instead of the outer-product
            # reshape. Hypothesis was that this matches the scatter's
            # [rows, 4C] T(8,128) layout and kills a 2.4 GB re-tile copy;
            # measured WORSE e2e (291 vs 274 ms/step train R50 @1024) — the
            # concatenate pays its own materialization. Kept as a documented
            # knob (S2A_DEFORM_UPD=concat); "outer" stays the default.
            ds_c = ds_all[:, :, sl, :].astype(acc_dt)
            upd = jnp.concatenate(
                [ds_c * w4[:, :, sl, i, None] for i in range(4)], axis=-1
            ).reshape(-1, 4 * cin)
        else:
            upd = (ds_all[:, :, sl, None, :].astype(acc_dt)
                   * w4[:, :, sl, :, None]).reshape(-1, 4 * cin)
        idx = jnp.stack(rows[sl], -1).reshape(-1)
        blocks = blocks.at[idx].add(upd)
    # fold the 4 parity tilings back: copy (py,px) tiles pixels
    # (2*yb + py + r, 2*xb + px + s); realize each as a dense image on a
    # [2hb, 2wb] grid shifted by (py, px) and sum the overlaps
    blocks = blocks.reshape(4, b, hb, wb, 2, 2, cin)
    dx_full = jnp.zeros((b, 2 * hb + 1, 2 * wb + 1, cin), acc_dt)
    for par_y in (0, 1):
        for par_x in (0, 1):
            img = blocks[par_y * 2 + par_x].transpose(0, 1, 3, 2, 4, 5)
            img = img.reshape(b, 2 * hb, 2 * wb, cin)
            dx_full = dx_full.at[:, par_y:par_y + 2 * hb,
                                 par_x:par_x + 2 * wb].add(img)
    dx = dx_full[:, :h, :w].astype(x.dtype)
    if with_offset_grad:
        d_offsets = jnp.stack(d_off, axis=2).reshape(offsets.shape).astype(
            offsets.dtype
        )
    else:
        d_offsets = jnp.zeros_like(offsets)
    return dx, d_offsets, dw.reshape(weight.shape).astype(weight.dtype)


def _deform_bwd_nooff(mode, res, g):
    return _deform_bwd(mode, res, g, with_offset_grad=False)


def _gather_patch(feat, cy, cx):
    """[B, H, W, C] + clamped origins [B, P] -> [B, P, 2, 2, C] patches."""
    b, h, w, c = feat.shape
    if h < 2 or w < 2:
        feat = jnp.pad(feat, ((0, 0), (0, max(2 - h, 0)), (0, max(2 - w, 0)),
                              (0, 0)))
    idx = jnp.stack([cy, cx], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        feat, idx, dn, slice_sizes=(1, 2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )


_deform_core.defvjp(_deform_fwd, _deform_bwd)
_deform_core_nooff.defvjp(_deform_fwd, _deform_bwd_nooff)


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "offset_grad", "fwd_mode")
)
def deform_conv2d(x, offsets, weight, bias=None, kernel_size: int = 3,
                  offset_grad: bool = True, fwd_mode: str | None = None):
    """Deformable conv, stride 1, same padding, NHWC.

    Args:
      x:       ``[B, H, W, Cin]``.
      offsets: ``[B, H, W, K*K, 2]`` — (dy, dx) added to each standard tap.
      weight:  ``[K, K, Cin, Cout]`` (HWIO).
      bias:    optional ``[Cout]``.
      offset_grad: pass False when the offsets carry no gradient (AlignConv:
        offsets come from stop-gradient anchors) — skips building the
        coordinate-gradient pass in the backward.
      fwd_mode: sampling layout — "tap" (9 gather+matmul passes, small
        transients; right under grad where the primal pass shares HBM with
        the backward) or "batched" (one gather + one [BHW, 9C] x [9C, Cout]
        MXU contraction, ~12% faster at P3 but with a [B, HW, 9, C]
        transient; right for inference). None = the S2A_DEFORM_FWD env
        default ("tap").

    Returns:
      ``[B, H, W, Cout]``.
    """
    assert weight.shape[0] == kernel_size
    core = _deform_core if offset_grad else _deform_core_nooff
    out = core(fwd_mode, x, offsets, weight)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def align_conv_offsets(anchors, featmap_size, stride: float, kernel_size: int = 3):
    """Analytic deformable offsets from refined anchors (AlignConv).

    Scales the anchor (w, h) down to the K x K kernel window, rotates the
    standard sampling grid by the anchor angle, and subtracts the standard
    grid positions. Parity: /root/reference/models/alignconv.py:30-86 (the
    reference computes these under ``no_grad``; callers should
    ``lax.stop_gradient`` the anchors).

    Args:
      anchors: ``[B, H*W, 5]`` refined anchors in image pixels/radians.
      featmap_size: (H, W) of the feature level.
      stride: downsample factor of this level.

    Returns:
      ``[B, H, W, K*K, 2]`` (dy, dx) offsets for :func:`deform_conv2d`.
    """
    h, w = featmap_size
    k = kernel_size
    pad = (k - 1) // 2
    dtype = anchors.dtype

    idx = jnp.arange(-pad, pad + 1, dtype=dtype)
    yy, xx = jnp.meshgrid(idx, idx, indexing="ij")
    xx = xx.reshape(-1)  # [K*K]
    yy = yy.reshape(-1)

    yc, xc = jnp.meshgrid(
        jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype), indexing="ij"
    )
    x_conv = xc.reshape(-1)[:, None] + xx[None, :]  # [H*W, K*K]
    y_conv = yc.reshape(-1)[:, None] + yy[None, :]

    x_ctr, y_ctr, aw, ah, a = [anchors[..., i] for i in range(5)]
    x_ctr, y_ctr, aw, ah = (
        x_ctr / stride,
        y_ctr / stride,
        aw / stride,
        ah / stride,
    )
    cos, sin = jnp.cos(a), jnp.sin(a)
    dw = aw / k
    dh = ah / k
    # [B, H*W, K*K]
    xk = dw[..., None] * xx
    yk = dh[..., None] * yy
    xr = cos[..., None] * xk - sin[..., None] * yk
    yr = sin[..., None] * xk + cos[..., None] * yk
    x_anchor = xr + x_ctr[..., None]
    y_anchor = yr + y_ctr[..., None]

    off_y = y_anchor - y_conv[None]
    off_x = x_anchor - x_conv[None]
    off = jnp.stack([off_y, off_x], axis=-1)  # [B, H*W, K*K, 2]
    return off.reshape(anchors.shape[0], h, w, k * k, 2)

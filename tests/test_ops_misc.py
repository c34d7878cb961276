import numpy as np
import jax
import jax.numpy as jnp

from s2anet_tpu.ops import (
    arf_indices,
    rotate_arf,
    rotation_invariant_pooling,
    deform_conv2d,
    align_conv_offsets,
)
from s2anet_tpu.ops.deform_conv import bilinear_sample_nhwc


# ---------------------------------------------------------------- ORN / ARF
def arf_scatter_oracle(weight, n_rotation=8):
    """Direct NumPy emulation of the CUDA scatter semantics
    (ActiveRotatingFilter_cuda.cu:20-46): out[i,k,j,indices[l,k]] = w[i,j,l]."""
    cout, cin, n_orient, kh, kw = weight.shape
    n_entry = n_orient * kh * kw
    idx = arf_indices(n_orient, n_rotation, kh)  # [nEntry, nRot], 0-based
    flat = weight.reshape(cout, cin, n_entry)
    out = np.zeros((cout, n_rotation, cin, n_entry), weight.dtype)
    for l in range(n_entry):
        for k in range(n_rotation):
            out[:, k, :, idx[l, k]] = flat[:, :, l]
    return out.reshape(cout * n_rotation, cin * n_orient, kh, kw)


def test_rotate_arf_matches_cuda_scatter(rng):
    w = rng.normal(size=(2, 3, 8, 3, 3)).astype(np.float32)
    got = np.asarray(rotate_arf(jnp.asarray(w), 8))
    want = arf_scatter_oracle(w, 8)
    np.testing.assert_allclose(got, want)


def test_arf_indices_are_permutations():
    idx = arf_indices(8, 8, 3)
    for k in range(8):
        assert sorted(idx[:, k].tolist()) == list(range(72))
    # rotation 0 is the identity
    assert (idx[:, 0] == np.arange(72)).all()


def test_arf_180_rotation_flips_kernel():
    # one orientation channel, check the 180-degree copy is the spatially
    # flipped kernel of the orientation-shifted channel
    w = np.zeros((1, 1, 8, 3, 3), np.float32)
    w[0, 0, 0] = np.arange(9, dtype=np.float32).reshape(3, 3)
    out = np.asarray(rotate_arf(jnp.asarray(w), 8)).reshape(8, 8, 3, 3)
    # rotation k=4 (180 deg): orientation channel shifts by 4, kernel reversed
    np.testing.assert_allclose(
        out[4, 4], np.arange(9, dtype=np.float32)[::-1].reshape(3, 3)
    )


def test_rotation_invariant_pooling():
    x = jnp.arange(2 * 1 * 1 * 16, dtype=jnp.float32).reshape(2, 1, 1, 16)
    out = np.asarray(rotation_invariant_pooling(x, 8))
    assert out.shape == (2, 1, 1, 2)
    np.testing.assert_allclose(out[0, 0, 0], [7, 15])


# ------------------------------------------------------------- deform conv
def test_bilinear_sample_exact_grid():
    feat = jnp.arange(2 * 4 * 5 * 3, dtype=jnp.float32).reshape(2, 4, 5, 3)
    yy, xx = jnp.meshgrid(jnp.arange(4.0), jnp.arange(5.0), indexing="ij")
    out = bilinear_sample_nhwc(
        feat, jnp.broadcast_to(yy, (2, 4, 5)), jnp.broadcast_to(xx, (2, 4, 5))
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(feat))


def test_bilinear_sample_midpoint_and_outside():
    feat = jnp.zeros((1, 2, 2, 1)).at[0, :, :, 0].set(
        jnp.array([[1.0, 2.0], [3.0, 4.0]])
    )
    py = jnp.array([[0.5]])
    px = jnp.array([[0.5]])
    out = float(np.asarray(bilinear_sample_nhwc(feat, py, px))[0, 0, 0])
    assert abs(out - 2.5) < 1e-6
    out2 = float(
        np.asarray(bilinear_sample_nhwc(feat, jnp.array([[-5.0]]), px))[0, 0, 0]
    )
    assert out2 == 0.0
    # half-in: at y=-0.5 only the y=0 row contributes with weight 0.5
    out3 = float(
        np.asarray(
            bilinear_sample_nhwc(feat, jnp.array([[-0.5]]), jnp.array([[0.0]]))
        )[0, 0, 0]
    )
    assert abs(out3 - 0.5) < 1e-6


def test_deform_conv_zero_offsets_is_conv(rng):
    b, h, w, cin, cout = 2, 8, 8, 4, 6
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32))
    weight = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    offsets = jnp.zeros((b, h, w, 9, 2))
    got = deform_conv2d(x, offsets, weight)
    want = jax.lax.conv_general_dilated(
        x, weight, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_deform_conv_integer_shift(rng):
    # constant offset of (+1, 0) everywhere == conv over the y-shifted image
    b, h, w, cin, cout = 1, 10, 10, 3, 2
    x = rng.normal(size=(b, h, w, cin)).astype(np.float32)
    weight = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    offsets = jnp.zeros((b, h, w, 9, 2)).at[..., 0].set(1.0)
    got = np.asarray(deform_conv2d(jnp.asarray(x), offsets, weight))
    x_shift = np.zeros_like(x)
    x_shift[:, :-1] = x[:, 1:]  # sampling y+1 pulls rows up
    want = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x_shift), weight, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    # interior rows must match exactly (border rows differ by zero-pad policy)
    np.testing.assert_allclose(got[:, 1:-2], want[:, 1:-2], atol=1e-4)


def test_align_conv_offsets_identity():
    """An axis-aligned anchor of size 3*stride centred on its cell gives zero
    offsets — the anchor window coincides with the standard 3x3 conv grid."""
    h = w = 4
    stride = 8.0
    yc, xc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    anchors = np.stack(
        [
            (xc * stride).ravel(),
            (yc * stride).ravel(),
            np.full(h * w, 3 * stride),
            np.full(h * w, 3 * stride),
            np.zeros(h * w),
        ],
        axis=1,
    ).astype(np.float32)[None]
    off = np.asarray(align_conv_offsets(jnp.asarray(anchors), (h, w), stride))
    assert off.shape == (1, h, w, 9, 2)
    np.testing.assert_allclose(off, 0.0, atol=1e-5)


def test_align_conv_offsets_rotation_geometry():
    """For a rotated anchor the sampled points must be the anchor's rotated
    kernel grid: check the centre tap is the anchor centre."""
    h = w = 3
    stride = 8.0
    anchors = np.zeros((1, 9, 5), np.float32)
    anchors[0, :, 0] = 20.0  # x centre in pixels
    anchors[0, :, 1] = 12.0
    anchors[0, :, 2] = 48.0
    anchors[0, :, 3] = 24.0
    anchors[0, :, 4] = 0.7
    off = np.asarray(align_conv_offsets(jnp.asarray(anchors), (h, w), stride))
    # centre tap (index 4): sample position = anchor centre in feat coords
    yc, xc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    sample_y = yc + off[0, :, :, 4, 0]
    sample_x = xc + off[0, :, :, 4, 1]
    np.testing.assert_allclose(sample_y, 12.0 / stride, atol=1e-5)
    np.testing.assert_allclose(sample_x, 20.0 / stride, atol=1e-5)


def _deform_naive(x, offsets, weight, kernel_size=3):
    """Reference implementation via plain autodiff-able per-corner sampling."""
    b, h, w, cin = x.shape
    k = kernel_size
    cout = weight.shape[-1]
    w_taps = weight.reshape(k * k, cin, cout)
    gy = jnp.arange(h, dtype=x.dtype)[None, :, None]
    gx = jnp.arange(w, dtype=x.dtype)[None, None, :]
    pad = (k - 1) // 2
    acc = jnp.zeros((b, h, w, cout), jnp.float32)
    for t in range(k * k):
        ky, kx = t // k - pad, t % k - pad
        py = gy + ky + offsets[..., t, 0]
        px = gx + kx + offsets[..., t, 1]
        s = bilinear_sample_nhwc(x, py, px)
        acc = acc + jnp.einsum("bhwc,co->bhwo", s, w_taps[t])
    return acc


def test_deform_conv_custom_vjp_matches_autodiff(rng):
    b, h, w, cin, cout = 2, 6, 7, 4, 3
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32))
    off = jnp.asarray(rng.normal(size=(b, h, w, 9, 2)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.2)
    g_out = jnp.asarray(rng.normal(size=(b, h, w, cout)).astype(np.float32))

    def loss_custom(x, off, wgt):
        return (deform_conv2d(x, off, wgt) * g_out).sum()

    def loss_naive(x, off, wgt):
        return (_deform_naive(x, off, wgt) * g_out).sum()

    gc = jax.grad(loss_custom, argnums=(0, 1, 2))(x, off, wgt)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(x, off, wgt)
    np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(gn[0]),
                               rtol=1e-4, atol=1e-4)  # d/dx
    np.testing.assert_allclose(np.asarray(gc[2]), np.asarray(gn[2]),
                               rtol=1e-4, atol=1e-4)  # d/dweight
    # offset grads: hat-function kinks make isolated points ambiguous between
    # implementations; compare where positions are safely non-integral
    frac_ok = np.asarray(
        (jnp.abs(off - jnp.round(off)) > 1e-3).all(-1)
    )
    d_off_c = np.asarray(gc[1])[frac_ok]
    d_off_n = np.asarray(gn[1])[frac_ok]
    np.testing.assert_allclose(d_off_c, d_off_n, rtol=1e-3, atol=1e-3)


def test_deform_conv_no_offset_grad_matches_dx_dw(rng):
    """offset_grad=False must give identical dx/dw and zero offset grads
    (AlignConv path: offsets are stop-gradient, alignconv.py:29)."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(rng.standard_normal((1, 6, 6, 8)).astype(np.float32))
    off = jnp.asarray(rng.uniform(-1, 1, (1, 6, 6, 9, 2)).astype(np.float32))
    wgt = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * .2)

    def loss(og):
        def f(x, off, wgt):
            return (deform_conv2d(x, off, wgt, offset_grad=og) ** 2).sum()
        return jax.grad(f, argnums=(0, 1, 2))

    gx1, go1, gw1 = loss(True)(x, off, wgt)
    gx0, go0, gw0 = loss(False)(x, off, wgt)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw0), np.asarray(gw1), rtol=1e-5)
    assert np.all(np.asarray(go0) == 0)
    assert np.any(np.asarray(go1) != 0)


def test_deform_bwd_upd_layouts_match(rng, monkeypatch):
    """The "concat" dx-updates construction (layout experiment) must produce
    the same gradients as the outer-product baseline."""
    import s2anet_tpu.ops.deform_conv as dc

    x = jnp.asarray(rng.normal(size=(2, 9, 11, 8)).astype(np.float32))
    off = jnp.asarray(rng.normal(size=(2, 9, 11, 9, 2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 4)).astype(np.float32) * 0.1)

    def loss(x, off, w):
        return (dc.deform_conv2d(x, off, w) ** 2).sum()

    grads = {}
    for layout in ("outer", "concat"):
        monkeypatch.setattr(dc, "UPD_LAYOUT", layout)
        # deform_conv2d is jit'd and UPD_LAYOUT is read at TRACE time: with
        # identical avals the second call would silently reuse the first
        # layout's cached jaxpr and compare "outer" against itself
        jax.clear_caches()
        grads[layout] = jax.grad(loss, argnums=(0, 1, 2))(x, off, w)
    for a, b in zip(grads["outer"], grads["concat"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

"""Parity tests: Pallas hat-matmul deformable conv vs the XLA gather path.

The hat kernel (ops/pallas/deform_kernel.py) must agree with
ops.deform_conv.deform_conv2d — the proven-parity gather implementation —
for every input: in-window offsets ride the kernel, out-of-window ones take
the exact fallback through the built-in lax.cond. Run in interpreter mode
(CPU); TPU execution is covered by the benchmark scripts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2anet_tpu.ops.deform_conv import deform_conv2d
from s2anet_tpu.ops.pallas.deform_kernel import (
    _geometry,
    _tap_coords,
    _window_ok,
    deform_conv2d_hat,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _case(rng, b, h, w, c, cout, k=3, off_scale=1.5, dtype=np.float32):
    x = rng.normal(size=(b, h, w, c)).astype(dtype)
    off = (rng.normal(size=(b, h, w, k * k, 2)) * off_scale).astype(dtype)
    wgt = (rng.normal(size=(k, k, c, cout)) * 0.1).astype(dtype)
    return jnp.asarray(x), jnp.asarray(off), jnp.asarray(wgt)


@pytest.mark.parametrize("shape", [(2, 32, 32, 8, 4), (1, 9, 11, 8, 4),
                                   (2, 16, 48, 8, 8)])
def test_hat_fwd_matches_gather(rng, shape):
    b, h, w, c, cout = shape
    x, off, wgt = _case(rng, b, h, w, c, cout)
    ref = deform_conv2d(x, off, wgt, offset_grad=False)
    got = deform_conv2d_hat(x, off, wgt, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_hat_fwd_with_bias(rng):
    x, off, wgt = _case(rng, 1, 16, 16, 8, 4)
    bias = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    ref = deform_conv2d(x, off, wgt, bias=bias, offset_grad=False)
    got = deform_conv2d_hat(x, off, wgt, bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_hat_grads_match_gather(rng):
    x, off, wgt = _case(rng, 2, 32, 32, 8, 4)

    def loss_ref(x, w):
        return (deform_conv2d(x, off, w, offset_grad=False) ** 2).sum()

    def loss_hat(x, w):
        return (deform_conv2d_hat(x, off, w, interpret=True) ** 2).sum()

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wgt)
    gx_h, gw_h = jax.grad(loss_hat, argnums=(0, 1))(x, wgt)
    np.testing.assert_allclose(np.asarray(gx_h), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_h), np.asarray(gw_r),
                               rtol=1e-3, atol=1e-3)


def test_hat_grads_odd_sizes(rng):
    """Non-divisible H/W exercise tile padding in both kernel directions."""
    x, off, wgt = _case(rng, 1, 19, 41, 8, 4)

    def loss_ref(x, w):
        return (deform_conv2d(x, off, w, offset_grad=False) ** 2).sum()

    def loss_hat(x, w):
        return (deform_conv2d_hat(x, off, w, interpret=True) ** 2).sum()

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wgt)
    gx_h, gw_h = jax.grad(loss_hat, argnums=(0, 1))(x, wgt)
    np.testing.assert_allclose(np.asarray(gx_h), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_h), np.asarray(gw_r),
                               rtol=1e-3, atol=1e-3)


def test_out_of_window_falls_back_exactly(rng):
    """A single stray tap flips the cond to the gather path — same result."""
    x, off, wgt = _case(rng, 1, 32, 32, 8, 4)
    # y reaches ~25 cells down: beyond tile 0's window (rows -8..23) but
    # still inside the image -> must fall back. (x is a single 32-cell tile
    # whose window spans the whole image — x offsets can never violate.)
    off = off.at[0, 5, 5, 3, 0].set(25.0)
    h, w = 32, 32
    th, tw, ty, tx, my, mx, _, _ = _geometry(h, w, 8)
    py, px = _tap_coords(off, h, w, 3, off.dtype)
    assert not bool(_window_ok(py, px, h, w, th, tw, ty, tx, my, mx))
    ref = deform_conv2d(x, off, wgt, offset_grad=False)
    got = deform_conv2d_hat(x, off, wgt, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_far_outside_samples_are_exact_zero_and_stay_fast(rng):
    """Samples fully outside the image contribute 0 on both paths and do NOT
    force a fallback (they touch no image cell)."""
    x, off, wgt = _case(rng, 1, 32, 32, 8, 4, off_scale=0.0)
    off = off.at[0, 2, 2, :, 0].set(-500.0)
    h, w = 32, 32
    th, tw, ty, tx, my, mx, _, _ = _geometry(h, w, 8)
    py, px = _tap_coords(off, h, w, 3, off.dtype)
    assert bool(_window_ok(py, px, h, w, th, tw, ty, tx, my, mx))
    ref = deform_conv2d(x, off, wgt, offset_grad=False)
    got = deform_conv2d_hat(x, off, wgt, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_window_ok_edge_samples_fast(rng):
    """Border positions sampling just outside the image (the normal conv-pad
    case) stay on the fast path — the margin covers them."""
    x, off, wgt = _case(rng, 1, 32, 32, 8, 4, off_scale=0.9)
    ref = deform_conv2d(x, off, wgt, offset_grad=False)
    h, w = 32, 32
    th, tw, ty, tx, my, mx, _, _ = _geometry(h, w, 8)
    py, px = _tap_coords(off, h, w, 3, off.dtype)
    assert bool(_window_ok(py, px, h, w, th, tw, ty, tx, my, mx))
    got = deform_conv2d_hat(x, off, wgt, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_hat_bf16_close_to_f32(rng):
    x, off, wgt = _case(rng, 1, 16, 16, 8, 4)
    ref = deform_conv2d_hat(x, off, wgt, interpret=True)
    got = deform_conv2d_hat(x.astype(jnp.bfloat16),
                            off.astype(jnp.bfloat16),
                            wgt.astype(jnp.bfloat16), interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=0.1, atol=0.3)


def test_head_hat_matches_gather(rng):
    """The full S2ANetHead produces identical outputs under both AlignConv
    implementations (the hat path is wired via the deform_impl knob)."""
    from s2anet_tpu.models.head import S2ANetHead

    feats = tuple(
        jnp.asarray(rng.normal(size=(1, s, s, 16)).astype(np.float32))
        for s in (16, 8)
    )
    kw = dict(num_classes=2, feat_channels=16, stacked_convs=1,
              featmap_strides=(8, 16), with_orconv=True)
    head_g = S2ANetHead(deform_impl="gather", **kw)
    var = head_g.init(jax.random.PRNGKey(0), feats)
    out_g = head_g.apply(var, feats)
    out_h = S2ANetHead(deform_impl="hat", **kw).apply(var, feats)
    for key in ("odm_cls", "odm_bbox"):
        for a, b in zip(out_g[key], out_h[key]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3)


def test_pin_deform_for_mesh():
    """On multi-device meshes the step attaches the mesh (the head then runs
    the hat kernel under shard_map over the batch axis — GSPMD cannot
    partition a Pallas custom call); the gather path needs nothing."""
    from s2anet_tpu.models.detector import S2ANet
    from s2anet_tpu.parallel.mesh import make_mesh
    from s2anet_tpu.parallel.step import _pin_deform_for_mesh

    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    auto = S2ANet(deform_impl="auto")
    hat = S2ANet(deform_impl="hat")
    gather = S2ANet(deform_impl="gather")
    if mesh.devices.size > 1:
        assert _pin_deform_for_mesh(auto, mesh).deform_mesh is mesh
        assert _pin_deform_for_mesh(hat, mesh).deform_mesh is mesh
        assert _pin_deform_for_mesh(gather, mesh).deform_mesh is None
    assert _pin_deform_for_mesh(auto, None).deform_mesh is None


def test_head_hat_shard_map_matches_unsharded(rng):
    """The hat AlignConv under shard_map over the mesh's batch axis equals
    the single-device hat head (per-image op — the batch split is free)."""
    from s2anet_tpu.models.head import S2ANetHead
    from s2anet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    if mesh.devices.size < 2:
        pytest.skip("needs a multi-device mesh")
    b = mesh.devices.size
    feats = (jnp.asarray(rng.normal(size=(b, 16, 16, 16)).astype(np.float32)),)
    kw = dict(num_classes=2, feat_channels=16, stacked_convs=1,
              featmap_strides=(8,), with_orconv=False, deform_impl="hat")
    head = S2ANetHead(**kw)
    var = head.init(jax.random.PRNGKey(0), feats)
    out_1 = head.apply(var, feats)
    out_m = S2ANetHead(deform_mesh=mesh, **kw).apply(var, feats)
    for key in ("odm_cls", "odm_bbox"):
        for a, b_ in zip(out_1[key], out_m[key]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-3)


def test_train_step_hat_shard_map(rng):
    """A full data-parallel train step with the hat AlignConv (shard_map
    path) runs on the 8-device mesh and produces finite grads/loss."""
    from s2anet_tpu.models.detector import S2ANet
    from s2anet_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from s2anet_tpu.parallel.step import make_train_step
    from s2anet_tpu.train.optim import build_optimizer
    from s2anet_tpu.train.schedule import build_lr_schedule
    from s2anet_tpu.train.state import create_train_state

    mesh = make_mesh()
    if mesh.devices.size < 2:
        pytest.skip("needs a multi-device mesh")
    img, batch = 64, mesh.devices.size
    model = S2ANet(backbone_name="resnet18", num_classes=2,
                   deform_impl="hat")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3), jnp.float32),
        train=False)
    lr_fn = build_lr_schedule(0.005, 100, 10)
    tx = build_optimizer(lr_fn, params_example=variables["params"])
    state = replicate_state(mesh, create_train_state(
        variables["params"], variables.get("batch_stats", {}), tx))
    step_fn = make_train_step(model, tx, imgs_size=(img, img), num_classes=2,
                              compute_dtype=jnp.float32, mesh=mesh)
    npr = np.random.default_rng(0)
    batch_data = shard_batch(mesh, {
        "imgs": npr.uniform(size=(batch, img, img, 3)).astype(np.float32),
        "gt_boxes": np.tile(np.array([[30, 30, 20, 8, 0.4]], np.float32),
                            (batch, 2, 1)),
        "gt_classes": np.zeros((batch, 2), np.int32),
        "gt_mask": np.ones((batch, 2), bool),
    })
    state, items = step_fn(state, batch_data)
    assert np.isfinite(np.asarray(items)).all()


def test_align_offset_clamp_guarantees_fast_path(rng):
    """With align_offset_clamp <= margin-2, even wild offsets keep every tap
    window-local, so the hat kernel never needs the fallback."""
    h = w = 32
    off = jnp.asarray((rng.normal(size=(1, h, w, 9, 2)) * 100).astype(np.float32))
    off = jnp.clip(off, -6.0, 6.0)
    th, tw, ty, tx, my, mx, _, _ = _geometry(h, w, 8)
    py, px = _tap_coords(off, h, w, 3, off.dtype)
    assert bool(_window_ok(py, px, h, w, th, tw, ty, tx, my, mx))


def test_head_align_offset_clamp(rng):
    """The clamp knob changes head outputs only where offsets exceed it, and
    runs through the public module API."""
    from s2anet_tpu.models.head import S2ANetHead

    feats = (jnp.asarray(rng.normal(size=(1, 16, 16, 16)).astype(np.float32)),)
    kw = dict(num_classes=2, feat_channels=16, stacked_convs=1,
              featmap_strides=(8,), with_orconv=False)
    head = S2ANetHead(align_offset_clamp=0.0, **kw)
    var = head.init(jax.random.PRNGKey(0), feats)
    out0 = head.apply(var, feats)
    out6 = S2ANetHead(align_offset_clamp=6.0, **kw).apply(var, feats)
    # random-init deltas are tiny -> offsets well under 6 cells -> identical
    np.testing.assert_allclose(np.asarray(out0["odm_bbox"][0]),
                               np.asarray(out6["odm_bbox"][0]), rtol=1e-6)


def test_dma_window_mode_matches_stack(rng, monkeypatch):
    """The in-kernel DMA window delivery must equal the XLA window stack."""
    import s2anet_tpu.ops.pallas.deform_kernel as dk

    x, off, wgt = _case(rng, 2, 32, 48, 8, 4)
    ref = deform_conv2d_hat(x, off, wgt, interpret=True)
    monkeypatch.setattr(dk, "WIN_MODE", "dma")
    deform_conv2d_hat.clear_cache()
    got = deform_conv2d_hat(x, off, wgt, interpret=True)
    deform_conv2d_hat.clear_cache()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_unconditional_matches_cond_under_clamp(rng):
    """With offsets clamped to margin-2 cells, the unconditional hat path
    (no predicate, no fallback branch) equals both the cond'd hat path and
    the gather reference."""
    x, off, wgt = _case(rng, 1, 32, 48, 8, 4, off_scale=40.0)
    off = jnp.clip(off, -6.0, 6.0)
    ref = deform_conv2d(x, off, wgt, offset_grad=False)
    cond = deform_conv2d_hat(x, off, wgt, interpret=True)
    unc = deform_conv2d_hat(x, off, wgt, interpret=True, unconditional=True)
    np.testing.assert_allclose(np.asarray(unc), np.asarray(cond),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(unc), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_head_clamp_selects_unconditional(rng):
    """Head with align_offset_clamp=6 + hat impl runs (unconditional path)
    and matches the gather head with the same clamp."""
    from s2anet_tpu.models.head import S2ANetHead

    feats = (jnp.asarray(rng.normal(size=(1, 16, 16, 16)).astype(np.float32)),)
    kw = dict(num_classes=2, feat_channels=16, stacked_convs=1,
              featmap_strides=(8,), with_orconv=False,
              align_offset_clamp=6.0)
    head_g = S2ANetHead(deform_impl="gather", **kw)
    var = head_g.init(jax.random.PRNGKey(0), feats)
    out_g = head_g.apply(var, feats)
    out_h = S2ANetHead(deform_impl="hat", **kw).apply(var, feats)
    for key in ("odm_cls", "odm_bbox"):
        for a, b in zip(out_g[key], out_h[key]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3)


def test_auto_impl_guarded_by_trial_compile(rng, monkeypatch):
    """deform_impl='auto' commits to the hat kernel only after the cached
    trial compile proves the backend accepts it; on CPU (no TPU Mosaic
    backend) it must resolve to the gather path and still run."""
    from s2anet_tpu.models.head import S2ANetHead
    from s2anet_tpu.ops.pallas import deform_kernel as dk

    monkeypatch.delenv("S2A_DEFORM_IMPL", raising=False)
    assert dk.hat_kernel_supported() is False  # cpu backend in tests

    feats = (jnp.asarray(rng.normal(size=(1, 16, 16, 16)).astype(np.float32)),)
    kw = dict(num_classes=2, feat_channels=16, stacked_convs=1,
              featmap_strides=(8,), with_orconv=False)
    head = S2ANetHead(deform_impl="auto", **kw)
    var = head.init(jax.random.PRNGKey(0), feats)
    out_a = head.apply(var, feats)
    out_g = S2ANetHead(deform_impl="gather", **kw).apply(var, feats)
    for key in ("odm_cls", "odm_bbox"):
        for a, b in zip(out_a[key], out_g[key]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_hat_trial_compile_is_cached(monkeypatch):
    """The per-backend trial runs once; subsequent calls hit the cache."""
    from s2anet_tpu.ops.pallas import deform_kernel as dk

    dk._hat_trial.cache_clear()
    calls = []
    real = dk.deform_conv2d_hat

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(dk, "deform_conv2d_hat", counting)
    r1 = dk._hat_trial("faketpu")
    n1 = len(calls)
    r2 = dk._hat_trial("faketpu")
    assert r1 == r2 and len(calls) == n1  # cached, no second trial
    dk._hat_trial.cache_clear()


def test_hat_full_p3_tile_grid(rng):
    """Full P3 tile GRID geometry (128x128 -> 8x4 tiles of 16x32): the
    multi-tile overlap-add fold and window addressing match the gather path
    at fp32 tolerance on both fwd and bwd. Channels kept tiny so interpret
    mode stays fast; the tile/window/fold geometry is exactly production's."""
    b, h, w, c, co = 1, 128, 128, 4, 4
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    off = jnp.asarray(
        np.clip(rng.normal(size=(b, h, w, 9, 2)) * 2, -5, 5).astype(np.float32)
    )
    wgt = jnp.asarray((rng.normal(size=(3, 3, c, co)) * 0.1).astype(np.float32))

    from s2anet_tpu.ops.pallas import deform_kernel as dk

    th, tw, ty, tx, my, mx, _, _ = dk._geometry(h, w, 8)
    assert (ty, tx) == (8, 4)
    py, px = dk._tap_coords(off, h, w, 3, x.dtype)
    assert bool(dk._window_ok(py, px, h, w, th, tw, ty, tx, my, mx))

    ref = deform_conv2d(x, off, wgt, offset_grad=False)
    hat = dk.deform_conv2d_hat(x, off, wgt, interpret=True,
                               unconditional=True)
    np.testing.assert_allclose(np.asarray(hat), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_r(x, w):
        return (deform_conv2d(x, off, w, offset_grad=False) ** 2).sum()

    def loss_h(x, w):
        return (dk.deform_conv2d_hat(x, off, w, interpret=True,
                                     unconditional=True) ** 2).sum()

    gr = jax.grad(loss_r, argnums=(0, 1))(x, wgt)
    gh = jax.grad(loss_h, argnums=(0, 1))(x, wgt)
    for a, b_ in zip(gr, gh):
        rel = float(jnp.abs(a - b_).max() / (jnp.abs(a).max() + 1e-9))
        assert rel < 2e-5


def test_bf16_inputs_keep_f32_sample_coords():
    """Sample coordinates must be computed in f32 even for bf16 inputs: a
    bf16 coordinate at x ~ 120 has ulp 0.5, so a +0.25-cell offset would
    snap to .0 or .5 and the bilinear weights would degenerate to
    {0, 0.5, 1}. Checks both paths' coordinate builders and the derived
    weights at the far edge of a 128-wide map."""
    import jax.numpy as jnp

    from s2anet_tpu.ops import deform_conv as dc
    from s2anet_tpu.ops.pallas import deform_kernel as dk

    b, h, w = 1, 4, 128
    off = np.zeros((b, h, w, 9, 2), np.float32)
    off[..., 1] = 0.25
    off_bf = jnp.asarray(off).astype(jnp.bfloat16)

    # gather path: tap 4 (centre), x offset +0.25
    py, px = dc._tap_positions((b, h, w, 8), off_bf, 4, 3, jnp.bfloat16)
    assert px.dtype == jnp.float32
    px = np.asarray(px).reshape(h, w)
    np.testing.assert_allclose(px[1], np.arange(w) + 0.25, atol=1e-6)

    # derived bilinear weights stay exact at large x
    cy, cx, wy, wx, _, _ = dc._corner_data(
        (b, h, w, 8), jnp.asarray(py), jnp.asarray(px.reshape(1, -1))
    )
    wx0 = np.asarray(wx[0]).reshape(h, w)
    np.testing.assert_allclose(wx0[1, 1:-2], 0.75, atol=1e-6)

    # hat path coordinate builder
    hpy, hpx = dk._tap_coords(off_bf, h, w, 3, jnp.bfloat16)
    assert hpx.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(hpx)[0, 4, 1], np.arange(w) + 0.25, atol=1e-6
    )

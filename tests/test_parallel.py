"""Multi-chip data-parallel tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2anet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_state,
    shard_batch,
)


def test_virtual_mesh_has_8_devices():
    assert jax.device_count() == 8


def test_mesh_and_shardings():
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)
    batch = {"imgs": np.zeros((8, 16, 16, 3), np.float32)}
    sharded = shard_batch(mesh, batch)
    assert sharded["imgs"].sharding.spec == batch_sharding(mesh).spec


def test_data_parallel_psum_semantics():
    """A sharded-batch jit computes global-batch math: gradient of a summed
    loss over a sharded batch equals the single-device gradient."""
    mesh = make_mesh()
    w = jnp.ones((4, 4))
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)

    def loss(w, x):
        return ((x @ w) ** 2).sum()

    g_single = jax.grad(loss)(w, jnp.asarray(x))

    from jax.sharding import NamedSharding, PartitionSpec as P

    g_fn = jax.jit(
        jax.grad(loss),
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))),
        out_shardings=NamedSharding(mesh, P()),
    )
    g_multi = g_fn(w, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_multi), np.asarray(g_single),
                               rtol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_smoke():
    """entry() must return a jittable fn + args (tiny variant here: we only
    check the callable traces, not the 1024^2 flagship compile)."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    jax.eval_shape(fn, *args)  # trace without compiling


@pytest.mark.slow
def test_spatial_sharded_inference_matches_single_device(rng):
    """Whole-image inference with the HEIGHT axis sharded over the mesh must
    equal the unsharded result — XLA SPMD inserts conv halos and decode/NMS
    collectives; no host-side chipping or merge (the reference's only path
    for large images)."""
    import jax.numpy as jnp

    from s2anet_tpu.models.detector import S2ANet
    from s2anet_tpu.models.head import s2anet_get_bboxes
    from s2anet_tpu.parallel.spatial import make_spatial_eval_step, shard_image
    from s2anet_tpu.utils.config import ModelConfig

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")

    size = 2 * len(jax.devices()) * 128  # 2 stride-128 rows per shard
    mc = ModelConfig(num_classes=3, max_per_img=32, pre_nms_cap=128,
                     max_before_nms_per_level=64)
    model = S2ANet(backbone_name="resnet18", num_classes=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)), train=False)
    imgs = jnp.asarray(
        rng.uniform(size=(1, size, size, 3)).astype(np.float32))

    step, mesh = make_spatial_eval_step(
        model, model_cfg=mc, compute_dtype=jnp.float32)
    boxes_sh, labels_sh, valid_sh = step(variables, shard_image(mesh, imgs))

    ref = jax.jit(lambda v, x: s2anet_get_bboxes(
        model.apply(v, x, train=False),
        score_thr=mc.score_thr, iou_thr=mc.nms_iou_thr,
        max_before_nms_per_level=mc.max_before_nms_per_level,
        max_per_img=mc.max_per_img, pre_nms_cap=mc.pre_nms_cap,
    ))(variables, imgs)
    boxes_ref, labels_ref, valid_ref = ref

    np.testing.assert_array_equal(np.asarray(valid_sh), np.asarray(valid_ref))
    np.testing.assert_array_equal(np.asarray(labels_sh),
                                  np.asarray(labels_ref))
    np.testing.assert_allclose(np.asarray(boxes_sh), np.asarray(boxes_ref),
                               rtol=1e-4, atol=1e-3)


def test_spatial_hat_halo_matches_unsharded(rng):
    """_spatial_hat (height-axis shard_map + halo exchange around the hat
    deform kernel) must equal the unsharded kernel for clamp-bounded
    offsets, including the all-gather path for shards thinner than the
    halo."""
    import functools

    from s2anet_tpu.models.head import _spatial_hat
    from s2anet_tpu.ops.pallas.deform_kernel import deform_conv2d_hat

    mesh = make_mesh()
    n = mesh.devices.size
    clamp = 6.0
    hat = functools.partial(deform_conv2d_hat, interpret=True,
                            unconditional=True)

    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 8, 8)).astype(np.float32))
    for h in (16 * n,   # per-shard height 16 > halo: ppermute halo path
              2 * n):   # per-shard height 2 <= halo: all-gather path
        x = jnp.asarray(rng.normal(0, 1, (1, h, 16, 8)).astype(np.float32))
        off = jnp.asarray(
            rng.uniform(-clamp, clamp, (1, h, 16, 18)).astype(np.float32))
        y_ref = deform_conv2d_hat(x, off, w, interpret=True,
                                  unconditional=True)
        y_sh = _spatial_hat(hat, mesh, clamp)(x, off, w)
        np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_spatial_sharded_inference_hat_clamp(rng):
    """Spatial mode with the flagship clamp preset keeps the hat AlignConv
    (halo-exchange shard_map) instead of pinning the slow gather path, and
    still matches the single-device result."""
    import jax.numpy as jnp

    from s2anet_tpu.models.detector import S2ANet
    from s2anet_tpu.models.head import s2anet_get_bboxes
    from s2anet_tpu.parallel.spatial import make_spatial_eval_step, shard_image
    from s2anet_tpu.utils.config import ModelConfig

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")

    size = len(jax.devices()) * 128
    mc = ModelConfig(num_classes=3, max_per_img=32, pre_nms_cap=128,
                     max_before_nms_per_level=64, align_offset_clamp=6.0)
    model = S2ANet(backbone_name="resnet18", num_classes=3,
                   deform_impl="hat", align_offset_clamp=6.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)), train=False)
    imgs = jnp.asarray(
        rng.uniform(size=(1, size, size, 3)).astype(np.float32))

    step, mesh = make_spatial_eval_step(
        model, model_cfg=mc, compute_dtype=jnp.float32)
    boxes_sh, labels_sh, valid_sh = step(variables, shard_image(mesh, imgs))

    ref = jax.jit(lambda v, x: s2anet_get_bboxes(
        model.apply(v, x, train=False),
        score_thr=mc.score_thr, iou_thr=mc.nms_iou_thr,
        max_before_nms_per_level=mc.max_before_nms_per_level,
        max_per_img=mc.max_per_img, pre_nms_cap=mc.pre_nms_cap,
    ))(variables, imgs)
    boxes_ref, labels_ref, valid_ref = ref

    np.testing.assert_array_equal(np.asarray(valid_sh), np.asarray(valid_ref))
    np.testing.assert_array_equal(np.asarray(labels_sh),
                                  np.asarray(labels_ref))
    np.testing.assert_allclose(np.asarray(boxes_sh), np.asarray(boxes_ref),
                               rtol=1e-4, atol=1e-3)

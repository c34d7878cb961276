import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2anet_tpu.models import S2ANet, ResNetBackbone, FPN
from s2anet_tpu.models.anchors import grid_anchors
from s2anet_tpu.models.head import (
    S2ANetHead,
    compute_s2anet_loss,
    s2anet_get_bboxes,
)


IMG = 128  # small image for fast CPU tests; strides still (8..128)


@pytest.fixture(scope="module")
def model_and_vars():
    model = S2ANet(backbone_name="resnet18", num_classes=15)
    imgs = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    return model, variables


def test_anchor_grid_values():
    a = grid_anchors((2, 3), 8)
    assert a.shape == (6, 5)
    # first anchor: center 0.5*(8-1)=3.5, size 4*8=32, angle 0
    np.testing.assert_allclose(a[0], [3.5, 3.5, 32, 32, 0])
    np.testing.assert_allclose(a[1], [11.5, 3.5, 32, 32, 0])
    np.testing.assert_allclose(a[3], [3.5, 11.5, 32, 32, 0])


def test_backbone_shapes():
    m = ResNetBackbone(arch="resnet18")
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vars_, x)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512)]


def test_fpn_shapes():
    m = FPN(in_channels=(128, 256, 512), out_channels=256, num_outs=5)
    ins = [jnp.zeros((1, 16, 16, 128)), jnp.zeros((1, 8, 8, 256)),
           jnp.zeros((1, 4, 4, 512))]
    vars_ = m.init(jax.random.PRNGKey(0), ins)
    outs = m.apply(vars_, ins)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]
    assert all(o.shape[-1] == 256 for o in outs)


def test_detector_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    imgs = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    out = model.apply(variables, imgs, train=False)
    sizes = [IMG // s for s in (8, 16, 32, 64, 128)]
    for lvl, hw in enumerate(sizes):
        assert out["fam_cls"][lvl].shape == (2, hw, hw, 15)
        assert out["fam_bbox"][lvl].shape == (2, hw, hw, 5)
        assert out["odm_cls"][lvl].shape == (2, hw, hw, 15)
        assert out["odm_bbox"][lvl].shape == (2, hw, hw, 5)
        assert out["init_anchors"][lvl].shape == (hw * hw, 5)
        assert out["refine_anchors"][lvl].shape == (2, hw * hw, 5)


def test_loss_finite_and_grads_flow(model_and_vars):
    model, variables = model_and_vars
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}
    imgs = jnp.zeros((2, IMG, IMG, 3), jnp.float32) + 0.5

    gt_boxes = jnp.zeros((2, 8, 5)).at[0, 0].set(
        jnp.array([60.0, 60.0, 50.0, 20.0, 0.4])
    ).at[0, 1].set(jnp.array([30.0, 90.0, 30.0, 10.0, 1.0]))
    gt_classes = jnp.zeros((2, 8), jnp.int32)
    gt_mask = jnp.zeros((2, 8), bool).at[0, 0].set(True).at[0, 1].set(True)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, **other}, imgs, train=True, mutable=["batch_stats"]
        )
        total, items = compute_s2anet_loss(
            out, gt_boxes, gt_classes, gt_mask,
            imgs_size=(IMG, IMG), num_classes=15,
        )
        return total, items

    (total, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert np.isfinite(np.asarray(items)).all()
    flat = jax.tree_util.tree_leaves(grads)
    norms = [float(jnp.abs(g).max()) for g in flat]
    assert np.isfinite(norms).all()
    # gradients reach the backbone, the head and the custom params
    g = grads
    assert float(jnp.abs(g["head"]["align_weight"]).max()) > 0
    assert float(jnp.abs(g["head"]["or_weight"]).max()) > 0
    assert float(jnp.abs(g["backbone"]["conv1"]["kernel"]).max()) > 0


def test_loss_empty_batch_no_nans(model_and_vars):
    """No gt at all: cls loss from negatives only, reg loss 0 — grads defined
    (the masked-zero answer to DDP find_unused_parameters, train.py:272)."""
    model, variables = model_and_vars
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}
    imgs = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    gt_boxes = jnp.zeros((1, 8, 5))
    gt_classes = jnp.zeros((1, 8), jnp.int32)
    gt_mask = jnp.zeros((1, 8), bool)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, **other}, imgs, train=True, mutable=["batch_stats"]
        )
        total, items = compute_s2anet_loss(
            out, gt_boxes, gt_classes, gt_mask, imgs_size=(IMG, IMG))
        return total, items

    (total, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    items = np.asarray(items)
    assert items[1] == 0.0 and items[3] == 0.0  # reg losses zero
    assert items[0] > 0.0  # negatives still train the classifier
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_get_bboxes_shapes(model_and_vars):
    model, variables = model_and_vars
    imgs = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    out = model.apply(variables, imgs, train=False)
    det_boxes, det_labels, det_valid = s2anet_get_bboxes(
        out, max_before_nms_per_level=100, max_per_img=50, pre_nms_cap=256
    )
    assert det_boxes.shape == (2, 50, 6)
    assert det_labels.shape == (2, 50)
    assert det_valid.shape == (2, 50)


def test_stem_s2d_conv_exact_vs_plain_conv(rng):
    """Space-to-depth stem (resnet.py _stem_s2d_conv) must equal the plain
    7x7/s2/pad3 convolution exactly (up to fp reassociation)."""
    import jax
    import jax.numpy as jnp

    from s2anet_tpu.models.resnet import _stem_s2d_conv

    for h, w in ((64, 64), (128, 96), (65, 64)):  # odd h exercises fallback
        x = jnp.asarray(rng.standard_normal((2, h, w, 3)).astype(np.float32))
        k = jnp.asarray(
            rng.standard_normal((7, 7, 3, 16)).astype(np.float32) * 0.1)
        ref = jax.lax.conv_general_dilated(
            x, k, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = _stem_s2d_conv(x, k)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

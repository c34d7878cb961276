"""The reference-checkpoint importer must produce trees the model accepts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2anet_tpu.models.detector import S2ANet
from s2anet_tpu.models.torch_import import convert_reference_s2anet


def reference_shaped_state_dict(nc=15, fc=256):
    """Synthesize a state dict with the reference's key layout + shapes
    (models/detector.py composition; resnet50 backbone)."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = rng.normal(size=(cout, cin, k, k)).astype("f4") * 0.05

    def convb(name, cout, cin, k):
        conv(name, cout, cin, k)
        sd[name + ".bias"] = np.zeros(cout, "f4")

    def bn(name, c):
        sd[name + ".weight"] = np.ones(c, "f4")
        sd[name + ".bias"] = np.zeros(c, "f4")
        sd[name + ".running_mean"] = np.zeros(c, "f4")
        sd[name + ".running_var"] = np.ones(c, "f4")

    # backbone: Sequential(Sequential(conv1,bn1,relu), Sequential(maxpool,layer1), l2, l3, l4)
    conv("backbone.backbone.0.0", 64, 3, 7)
    bn("backbone.backbone.0.1", 64)
    layer_cfg = {1: (3, 64, 64), 2: (4, 128, 256), 3: (6, 256, 512),
                 4: (3, 512, 1024)}
    for stage, (nblocks, planes, cin0) in layer_cfg.items():
        prefix = ("backbone.backbone.1.1" if stage == 1
                  else f"backbone.backbone.{stage + 0}")
        cin = cin0 if stage > 1 else 64
        for b in range(nblocks):
            base = f"{prefix}.{b}"
            conv(f"{base}.conv1", planes, cin if b == 0 else planes * 4, 1)
            bn(f"{base}.bn1", planes)
            conv(f"{base}.conv2", planes, planes, 3)
            bn(f"{base}.bn2", planes)
            conv(f"{base}.conv3", planes * 4, planes, 1)
            bn(f"{base}.bn3", planes * 4)
            if b == 0:
                conv(f"{base}.downsample.0", planes * 4,
                     cin if b == 0 else planes * 4, 1)
                bn(f"{base}.downsample.1", planes * 4)

    # neck
    for i, cin in enumerate((512, 1024, 2048)):
        convb(f"neck.lateral_convs.{i}", 256, cin, 1)
        convb(f"neck.fpn_convs.{i}", 256, 256, 3)
    convb("neck.fpn_convs.3", 256, 2048, 3)
    convb("neck.fpn_convs.4", 256, 256, 3)

    # head
    for branch in ("fam_reg_ls", "fam_cls_ls", "odm_reg_ls", "odm_cls_ls"):
        for i in range(2):
            cin = fc // 8 if branch == "odm_cls_ls" and i == 0 else fc
            convb(f"head.{branch}.{i}.0", fc, cin, 3)
    convb("head.fam_reg_head", 5, fc, 1)
    convb("head.fam_cls_head", nc, fc, 1)
    conv("head.align_conv.deform_conv", fc, fc, 3)
    sd["head.or_conv.weight"] = rng.normal(
        size=(fc // 8, fc, 1, 3, 3)).astype("f4") * 0.05
    sd["head.or_conv.bias"] = np.zeros(fc, "f4")
    convb("head.odm_reg_head", 5, fc, 3)
    convb("head.odm_cls_head", nc, fc, 3)
    return sd


@pytest.mark.slow
def test_reference_import_loads_and_runs():
    sd = reference_shaped_state_dict()
    variables = convert_reference_s2anet(sd, arch="resnet50")

    model = S2ANet(backbone_name="resnet50", num_classes=15)
    init_vars = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False
    )
    # converted tree must structurally match the model's own params
    conv_paths = {
        jax.tree_util.keystr(k)
        for k, _ in jax.tree_util.tree_leaves_with_path(variables["params"])
    }
    init_paths = {
        jax.tree_util.keystr(k)
        for k, _ in jax.tree_util.tree_leaves_with_path(init_vars["params"])
    }
    assert conv_paths == init_paths, (
        sorted(init_paths - conv_paths)[:5], sorted(conv_paths - init_paths)[:5]
    )
    for (k1, a), (k2, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(variables["params"]),
               key=lambda kv: jax.tree_util.keystr(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(init_vars["params"]),
               key=lambda kv: jax.tree_util.keystr(kv[0])),
    ):
        assert np.shape(a) == np.shape(b), (jax.tree_util.keystr(k1),
                                            np.shape(a), np.shape(b))

    # batch_stats too
    bs_conv = {
        jax.tree_util.keystr(k)
        for k, _ in jax.tree_util.tree_leaves_with_path(variables["batch_stats"])
    }
    bs_init = {
        jax.tree_util.keystr(k)
        for k, _ in jax.tree_util.tree_leaves_with_path(init_vars["batch_stats"])
    }
    assert bs_conv == bs_init

    # and the model must run with the imported weights
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.zeros((1, 128, 128, 3)), train=False,
    )
    assert out["odm_cls"][0].shape == (1, 16, 16, 15)

"""int8 post-training quantization (ops/quant.py).

The reference has no quantization story; these tests pin the TPU-native
extra: QuantConv's drop-in compatibility with nn.Conv (identical parameter
tree, bit-identical calib forward), the zero-point padding correctness that
naive PTQ gets wrong, calibration range folding, and the detector-level
calib -> int8 flow incl. the eval-runner wiring.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2anet_tpu.models.detector import S2ANet
from s2anet_tpu.ops.quant import QuantConv, calibrate, conv_ctor


def _rand(shape, seed=0, loc=0.0, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(loc, scale, shape).astype(np.float32)
    )


class TestQuantConv:
    def _pair(self, **kw):
        ref = nn.Conv(12, (3, 3), (2, 2), [(1, 1), (1, 1)], name="c", **kw)
        cal = QuantConv(12, (3, 3), (2, 2), [(1, 1), (1, 1)], name="c",
                        mode="calib", **kw)
        q = QuantConv(12, (3, 3), (2, 2), [(1, 1), (1, 1)], name="c",
                      mode="int8", **kw)
        return ref, cal, q

    def test_param_tree_identical(self):
        x = _rand((2, 16, 16, 8))
        ref, cal, q = self._pair()
        v_ref = ref.init(jax.random.PRNGKey(0), x)
        v_cal = cal.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(v_ref["params"])
                == jax.tree_util.tree_structure(v_cal["params"]))
        for a, b in zip(jax.tree_util.tree_leaves(v_ref["params"]),
                        jax.tree_util.tree_leaves(v_cal["params"])):
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b)  # same init fns, same key

    def test_calib_forward_matches_conv(self):
        x = _rand((2, 16, 16, 8), loc=0.7)
        ref, cal, _ = self._pair()
        v = ref.init(jax.random.PRNGKey(1), x)
        y_ref = ref.apply(v, x)
        y_cal, upd = cal.apply(v, x, mutable=["quant"])
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_cal),
                                   atol=1e-5)
        ranges = jax.tree_util.tree_leaves(upd["quant"])
        assert float(min(np.asarray(r) for r in ranges)) == pytest.approx(
            float(x.min()), abs=1e-6)
        assert float(max(np.asarray(r) for r in ranges)) == pytest.approx(
            float(x.max()), abs=1e-6)

    def test_int8_close_to_float(self):
        x = _rand((2, 16, 16, 8), loc=0.5)
        ref, cal, q = self._pair()
        v = ref.init(jax.random.PRNGKey(2), x)
        y_ref = np.asarray(ref.apply(v, x))
        _, upd = cal.apply(v, x, mutable=["quant"])
        y_q = np.asarray(q.apply({**v, "quant": upd["quant"]}, x))
        rel = np.linalg.norm(y_q - y_ref) / np.linalg.norm(y_ref)
        assert rel < 0.03, rel

    def test_zero_point_padding_exact(self):
        """SAME padding must inject real 0.0, not the int8 raw zero.

        A strictly positive input makes the asymmetric zero point large;
        padding the int8 tensor with literal 0 would dequantize the border
        to a negative value and corrupt every edge output. The per-border
        error must stay at quantization scale, same as the interior.
        """
        x = jnp.asarray(
            np.random.default_rng(3).uniform(2.0, 4.0, (1, 8, 8, 4))
            .astype(np.float32))
        ref = nn.Conv(4, (3, 3), padding="SAME", name="c")
        cal = QuantConv(4, (3, 3), padding="SAME", name="c", mode="calib")
        q = QuantConv(4, (3, 3), padding="SAME", name="c", mode="int8")
        v = ref.init(jax.random.PRNGKey(3), x)
        y_ref = np.asarray(ref.apply(v, x))
        _, upd = cal.apply(v, x, mutable=["quant"])
        y_q = np.asarray(q.apply({**v, "quant": upd["quant"]}, x))
        err = np.abs(y_q - y_ref)
        # border rows/cols see the padding; they must not be worse than
        # the interior by more than the quantization noise floor
        assert err[:, 0].max() < 0.15 and err[:, -1].max() < 0.15
        assert err[:, :, 0].max() < 0.15 and err[:, :, -1].max() < 0.15

    def test_int8_without_ranges_raises(self):
        x = _rand((1, 8, 8, 4))
        _, _, q = self._pair(use_bias=False)
        v = q.init(jax.random.PRNGKey(0), x)
        with pytest.raises(ValueError, match="quant"):
            q.apply({"params": v["params"]}, x)

    def test_conv_ctor(self):
        assert conv_ctor("none") is nn.Conv
        assert conv_ctor("") is nn.Conv
        assert conv_ctor("calib")(4, (1, 1)).mode == "calib"
        assert conv_ctor("int8")(4, (1, 1)).mode == "int8"
        with pytest.raises(ValueError):
            conv_ctor("fp4")


class TestDetectorQuant:
    @pytest.fixture(scope="class")
    def setup(self):
        model = S2ANet(backbone_name="resnet18", num_classes=3,
                       deform_impl="gather")
        imgs = jnp.asarray(
            np.random.default_rng(0).uniform(size=(2, 64, 64, 3))
            .astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
        return model, variables, imgs

    def test_param_tree_unchanged(self, setup):
        model, variables, imgs = setup
        v_q = model.clone(quant="int8").init(
            jax.random.PRNGKey(0), imgs, train=False)
        assert (jax.tree_util.tree_structure(v_q["params"])
                == jax.tree_util.tree_structure(variables["params"]))

    def test_calibrate_and_int8_forward(self, setup):
        model, variables, imgs = setup
        quant = calibrate(model, variables,
                          jnp.stack([imgs, imgs * 1.1]))
        # every quantized conv contributes an (act_min, act_max) pair
        leaves = jax.tree_util.tree_leaves(quant)
        assert len(leaves) >= 2 and len(leaves) % 2 == 0
        out_f = model.apply(variables, imgs, train=False)
        out_q = model.clone(quant="int8").apply(
            {**variables, "quant": quant}, imgs, train=False)
        for k in ("odm_cls", "odm_bbox"):
            for lvl in range(len(out_f[k])):
                a = np.asarray(out_f[k][lvl], np.float32)
                b = np.asarray(out_q[k][lvl], np.float32)
                # random-init bbox deltas sit near 0 (scale ~1e-4); floor
                # the denominator so the check is absolute there and
                # relative where outputs have real magnitude (cls bias)
                scale = max(np.abs(a).max(), 0.05)
                assert np.abs(a - b).max() / scale < 0.05, (k, lvl)

    def test_eval_step_quant(self, setup):
        from s2anet_tpu.parallel.step import make_eval_step
        from s2anet_tpu.train.optim import build_optimizer
        from s2anet_tpu.train.state import create_train_state
        from s2anet_tpu.utils.config import ModelConfig

        model, variables, imgs = setup
        quant = calibrate(model, variables, imgs[None])
        tx = build_optimizer(lambda _: 0.0,
                             params_example=variables["params"])
        state = create_train_state(
            variables["params"], variables.get("batch_stats", {}), tx)
        mc = ModelConfig(backbone="resnet18", num_classes=3,
                         max_before_nms_per_level=64, max_per_img=32,
                         pre_nms_cap=128)
        step = make_eval_step(model.clone(quant="int8"), model_cfg=mc,
                              compute_dtype=jnp.float32, use_ema=False,
                              quant_vars=quant)
        det_boxes, det_labels, det_valid = step(state, imgs)
        assert det_boxes.shape == (2, 32, 6)
        assert np.isfinite(np.asarray(det_boxes)).all()


class TestQuantScope:
    """Per-module quant scope (ModelConfig.quant_scope) + per-level
    activation ranges — round-5 recovery of the round-4 int8 regression
    (quantizing everything measured SLOWER than float; the scope knob keeps
    the shipped set at the measured argmax, BENCH.md)."""

    @pytest.fixture(scope="class")
    def setup(self):
        model = S2ANet(backbone_name="resnet18", num_classes=3,
                       deform_impl="gather")
        imgs = jnp.asarray(
            np.random.default_rng(5).uniform(size=(2, 64, 64, 3))
            .astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
        return model, variables, imgs

    def _quant_keys(self, quant):
        from flax.traverse_util import flatten_dict

        return set(flatten_dict(quant).keys())

    def test_scope_limits_quant_collection(self, setup):
        model, variables, imgs = setup
        q_bb = calibrate(model.clone(quant_scope=("backbone",)),
                         variables, imgs[None])
        keys = self._quant_keys(q_bb)
        assert keys and all(k[0] == "backbone" for k in keys)

        q_stacks = calibrate(model.clone(quant_scope=("head_stacks",)),
                             variables, imgs[None])
        keys = self._quant_keys(q_stacks)
        assert keys and all(
            k[0] == "head" and k[1].endswith("_ls") for k in keys)
        # no orconv ranges unless "orconv" is in scope
        assert not any(k[-1].startswith("or_act") for k in keys)

        q_or = calibrate(model.clone(quant_scope=("orconv",)),
                         variables, imgs[None])
        keys = self._quant_keys(q_or)
        assert keys == {("head", "or_act_min"), ("head", "or_act_max")}

    def test_head_ranges_are_per_level(self, setup):
        from flax.traverse_util import flatten_dict

        model, variables, imgs = setup
        nlv = len(model.strides)
        q = calibrate(
            model.clone(quant_scope=("head_stacks", "orconv", "heads")),
            variables, imgs[None])
        flat = flatten_dict(q)
        for k, v in flat.items():
            assert np.asarray(v).shape == (nlv,), k
            assert np.isfinite(np.asarray(v)).all(), (
                k, "every level slot must be calibrated")
        # the FPN levels see genuinely different distributions: at least one
        # range variable must differ across slots (a union/shared range
        # would be constant)
        assert any(len(np.unique(np.asarray(v))) > 1 for v in flat.values())

    @pytest.mark.parametrize("scope", [
        ("backbone", "neck", "head_stacks"),
        ("backbone", "neck", "head_stacks", "orconv", "heads"),
    ])
    def test_scoped_int8_forward_close(self, setup, scope):
        model, variables, imgs = setup
        mdl = model.clone(quant_scope=scope)
        quant = calibrate(mdl, variables, imgs[None])
        out_f = model.apply(variables, imgs, train=False)
        out_q = mdl.clone(quant="int8").apply(
            {**variables, "quant": quant}, imgs, train=False)
        for k in ("odm_cls", "odm_bbox"):
            for lvl in range(len(out_f[k])):
                a = np.asarray(out_f[k][lvl], np.float32)
                b = np.asarray(out_q[k][lvl], np.float32)
                scale = max(np.abs(a).max(), 0.05)
                assert np.abs(a - b).max() / scale < 0.05, (scope, k, lvl)

    def test_param_tree_identical_across_scopes(self, setup):
        model, variables, imgs = setup
        for scope in [(), ("backbone",), ("orconv", "heads")]:
            v_q = model.clone(quant="int8", quant_scope=scope).init(
                jax.random.PRNGKey(0), imgs, train=False)
            assert (jax.tree_util.tree_structure(v_q["params"])
                    == jax.tree_util.tree_structure(variables["params"]))

    def test_runner_rejects_unknown_scope(self, setup, tmp_path):
        from s2anet_tpu.eval.runner import evaluate_on_chips
        from s2anet_tpu.utils.config import load_config

        model, variables, imgs = setup
        cfg = load_config(overrides={
            "model": {"quant": "int8", "quant_scope": ["backbone", "typo"]},
        })
        with pytest.raises(ValueError, match="typo"):
            evaluate_on_chips(model, None, cfg, dataset=object())


class TestUnsupportedKwargs:
    def test_grouped_conv_rejected_clearly(self):
        x = _rand((1, 8, 8, 8))
        q = QuantConv(8, (3, 3), feature_group_count=2, mode="int8", name="c")
        with pytest.raises(NotImplementedError, match="feature_group_count"):
            q.init(jax.random.PRNGKey(0), x)

    def test_dilated_conv_rejected_clearly(self):
        x = _rand((1, 8, 8, 8))
        q = QuantConv(8, (3, 3), kernel_dilation=(2, 2), mode="calib",
                      name="c")
        with pytest.raises(NotImplementedError, match="dilation"):
            q.init(jax.random.PRNGKey(0), x)


class TestBnFold:
    """Serving-time conv+BN weight folding (models/fold.py; reference
    fuse_conv_and_bn, utils/torch_utils.py:206-230)."""

    @pytest.fixture(scope="class")
    def setup(self):
        from flax.traverse_util import flatten_dict, unflatten_dict

        model = S2ANet(backbone_name="resnet18", num_classes=3,
                       deform_impl="gather")
        imgs = jnp.asarray(
            np.random.default_rng(7).uniform(size=(2, 64, 64, 3))
            .astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), imgs, train=False)
        # non-trivial BN affine + running stats, so the fold has real work
        rng = np.random.default_rng(8)
        bs = flatten_dict(v["batch_stats"])
        for k in bs:
            if k[-1] == "mean":
                bs[k] = jnp.asarray(
                    rng.normal(0, 0.3, bs[k].shape).astype(np.float32))
            if k[-1] == "var":
                bs[k] = jnp.asarray(
                    rng.uniform(0.5, 2.0, bs[k].shape).astype(np.float32))
        p = flatten_dict(v["params"])
        for k in p:
            if k[-1] == "scale":
                p[k] = jnp.asarray(
                    rng.uniform(0.5, 1.5, p[k].shape).astype(np.float32))
        v = {"params": unflatten_dict(p), "batch_stats": unflatten_dict(bs)}
        return model, v, imgs

    def test_fold_forward_exact(self, setup):
        from s2anet_tpu.models.fold import fold_bn_for_eval

        model, v, imgs = setup
        out_ref = model.apply(v, imgs, train=False)
        fmodel, fv = fold_bn_for_eval(model, v)
        out_fold = fmodel.apply(fv, imgs, train=False)
        for key in ("odm_cls", "odm_bbox", "fam_bbox"):
            for lvl in range(len(out_ref[key])):
                np.testing.assert_allclose(
                    np.asarray(out_ref[key][lvl]),
                    np.asarray(out_fold[key][lvl]), atol=2e-4)

    def test_fold_removes_bn_work(self, setup):
        from s2anet_tpu.models.fold import fold_bn_for_eval

        model, v, imgs = setup
        fmodel, fv = fold_bn_for_eval(model, v)
        # every BN's scale/mean/var is consumed; only the bias remains
        from flax.traverse_util import flatten_dict

        fp = flatten_dict(fv["params"])
        assert not any(k[-1] == "scale" and k[-2].startswith(("bn", "downsample"))
                       for k in fp)
        assert not flatten_dict(fv.get("batch_stats", {}))

    def test_fold_returns_device_arrays(self, setup):
        """Regression: the fold math runs in host numpy; returning numpy
        leaves made every jit call RE-UPLOAD the full parameter set (a 12x
        serving slowdown through the TPU tunnel, BENCH.md round-4 log)."""
        from s2anet_tpu.models.fold import fold_bn_for_eval

        model, v, imgs = setup
        _, fv = fold_bn_for_eval(model, v)
        for leaf in jax.tree_util.tree_leaves(fv):
            assert isinstance(leaf, jax.Array), type(leaf)

    def test_fold_train_raises(self, setup):
        from s2anet_tpu.models.fold import fold_bn_for_eval

        model, v, imgs = setup
        fmodel, fv = fold_bn_for_eval(model, v)
        with pytest.raises(ValueError, match="serving-time"):
            fmodel.apply(fv, imgs, train=True, mutable=["batch_stats"])

    def test_fold_composes_with_int8(self, setup):
        """fold -> calibrate -> int8: the serving pipeline end to end."""
        from s2anet_tpu.models.fold import fold_bn_for_eval

        model, v, imgs = setup
        out_f = model.apply(v, imgs, train=False)
        fmodel, fv = fold_bn_for_eval(model, v)
        quant = calibrate(fmodel, fv, imgs[None])
        out_q = fmodel.clone(quant="int8").apply(
            {**fv, "quant": quant}, imgs, train=False)
        for k in ("odm_cls", "odm_bbox"):
            for lvl in range(len(out_f[k])):
                a = np.asarray(out_f[k][lvl], np.float32)
                b = np.asarray(out_q[k][lvl], np.float32)
                scale = max(np.abs(a).max(), 0.05)
                assert np.abs(a - b).max() / scale < 0.07, (k, lvl)


"""Pallas training BatchNorm (models/bn.py + ops/pallas/moments.py).

The reference trains BN in every backbone stage
(/root/reference/models/detector.py:20 ``frozen_stages=-1``), making the
BN-stat reductions the train step's largest non-MXU block (BENCH.md). These
tests pin the swap-in's contract: bit-level-close forward/backward/running-
average parity with flax ``nn.BatchNorm`` (identical trees), moment-kernel
correctness incl. the narrow-channel lane fold, the XLA fallback on
unfriendly shapes, and the shard_map+psum global-stats path on the 8-device
CPU mesh (kernels run in interpret mode off-TPU).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2anet_tpu.models.bn import PallasBatchNorm, bn_train_apply
from s2anet_tpu.ops.pallas.moments import (_fold_geometry, channel_moments,
                                           grad_channel_sums,
                                           pallas_moments_supported)


def _rand(shape, seed=0, loc=0.0, scale=1.0, dtype=np.float32):
    return jnp.asarray(np.random.default_rng(seed)
                       .normal(loc, scale, shape).astype(dtype))


class TestMomentKernels:
    @pytest.mark.parametrize("shape", [
        (4, 8, 8, 64),     # narrow channels -> lane fold (f=2)
        (2, 16, 16, 128),  # exact lane width
        (2, 4, 4, 256),    # wide channels
    ])
    def test_channel_moments_matches_numpy(self, shape):
        x = _rand(shape, seed=1, loc=0.7, scale=1.3)
        s, q = channel_moments(x, interpret=True)
        xf = np.asarray(x, np.float64).reshape(-1, shape[-1])
        np.testing.assert_allclose(np.asarray(s), xf.sum(0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(q), (xf * xf).sum(0),
                                   rtol=1e-5)

    def test_channel_moments_bf16_accumulates_f32(self):
        # 4096 bf16 ones: naive bf16 accumulation would saturate (bf16 has
        # 8 mantissa bits); f32 accumulation is exact here
        x = jnp.ones((8, 8, 8, 128), jnp.bfloat16)
        s, q = channel_moments(x, interpret=True)
        assert s.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(s), 512.0)
        np.testing.assert_array_equal(np.asarray(q), 512.0)

    def test_grad_channel_sums_matches_numpy(self):
        g = _rand((4, 8, 8, 64), seed=2)
        x = _rand((4, 8, 8, 64), seed=3, loc=0.5)
        sg, sgx = grad_channel_sums(g, x, interpret=True)
        gf = np.asarray(g, np.float64).reshape(-1, 64)
        xf = np.asarray(x, np.float64).reshape(-1, 64)
        np.testing.assert_allclose(np.asarray(sg), gf.sum(0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sgx), (gf * xf).sum(0),
                                   rtol=1e-5)

    def test_fold_geometry(self):
        # C=64 folds two rows into the 128 lanes
        rows, lanes, fold, br = _fold_geometry(256, 64, 4)
        assert (rows, lanes, fold) == (128, 128, 2) and 128 % br == 0
        # C % 128 != 0 -> unsupported (XLA fallback)
        assert _fold_geometry(256, 96, 4) is None
        assert not pallas_moments_supported(256, 96)
        # odd row counts with narrow channels -> unsupported
        assert _fold_geometry(255, 64, 4) is None

    def test_unfriendly_shape_falls_back_in_module(self):
        # C=96 has no clean tiling: PallasBatchNorm must still be correct
        # (jnp fallback inside bn_train_apply)
        x = _rand((2, 4, 4, 96), seed=4)
        scale = jnp.ones((96,), jnp.float32)
        bias = jnp.zeros((96,), jnp.float32)
        y, mean, var = bn_train_apply(x, scale, bias, 1e-5, None, True,
                                      jnp.float32)
        xf = np.asarray(x, np.float64).reshape(-1, 96)
        np.testing.assert_allclose(np.asarray(mean), xf.mean(0), atol=1e-6)
        np.testing.assert_allclose(np.asarray(var), xf.var(0), atol=1e-5)


class TestPallasBatchNorm:
    def _variables(self, c=64, seed=7):
        rng = np.random.default_rng(seed)
        return {
            "params": {
                "scale": jnp.asarray(rng.uniform(0.5, 1.5, c)
                                     .astype(np.float32)),
                "bias": jnp.asarray(rng.normal(0, 0.3, c)
                                    .astype(np.float32)),
            },
            "batch_stats": {
                "mean": jnp.asarray(rng.normal(0, 0.2, c)
                                    .astype(np.float32)),
                "var": jnp.asarray(rng.uniform(0.5, 2.0, c)
                                   .astype(np.float32)),
            },
        }

    def test_train_forward_and_ra_match_flax(self):
        x = _rand((4, 8, 8, 64), seed=8, loc=1.0, scale=2.0)
        v = self._variables()
        ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5)
        pal = PallasBatchNorm(use_running_average=False, interpret=True)
        y_ref, upd_ref = ref.apply(v, x, mutable=["batch_stats"])
        y_pal, upd_pal = pal.apply(v, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_pal),
                                   atol=1e-5)
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(upd_ref["batch_stats"][k]),
                np.asarray(upd_pal["batch_stats"][k]), atol=1e-6)

    def test_grads_match_flax(self):
        x = _rand((4, 8, 8, 64), seed=9, loc=1.0, scale=2.0)
        v = self._variables()

        def loss(mod):
            def f(params, x):
                y, _ = mod.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    x, mutable=["batch_stats"])
                return jnp.sin(y).sum()
            return f

        ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5)
        pal = PallasBatchNorm(use_running_average=False, interpret=True)
        g_ref = jax.grad(loss(ref), argnums=(0, 1))(v["params"], x)
        g_pal = jax.grad(loss(pal), argnums=(0, 1))(v["params"], x)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_pal)):
            scale = max(float(jnp.abs(a).max()), 1.0)
            assert float(jnp.abs(a - b).max()) / scale < 1e-5

    def test_eval_mode_matches_flax(self):
        x = _rand((2, 8, 8, 64), seed=10)
        v = self._variables()
        ref = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
        pal = PallasBatchNorm(use_running_average=True, interpret=True)
        np.testing.assert_allclose(
            np.asarray(ref.apply(v, x)), np.asarray(pal.apply(v, x)),
            atol=1e-5)

    def test_bf16_output_dtype_and_value(self):
        x = _rand((4, 8, 8, 64), seed=11, loc=1.0).astype(jnp.bfloat16)
        v = self._variables()
        ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5)
        pal = PallasBatchNorm(use_running_average=False, interpret=True)
        y_ref, _ = ref.apply(v, x, mutable=["batch_stats"])
        y_pal, _ = pal.apply(v, x, mutable=["batch_stats"])
        assert y_pal.dtype == jnp.bfloat16
        d = jnp.abs(y_ref.astype(jnp.float32) - y_pal.astype(jnp.float32))
        assert float(d.max()) < 0.05  # one bf16 ulp at the output magnitude

    def test_mesh_global_stats_match_single_device(self):
        """shard_map+psum stats on the 8-device CPU mesh == single-device
        global-batch stats (the GSPMD-partitioning answer; models/bn.py)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        x = _rand((8, 4, 4, 128), seed=12, loc=0.5)
        v = self._variables(c=128, seed=12)
        mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
        pal1 = PallasBatchNorm(use_running_average=False, interpret=True)
        palm = PallasBatchNorm(use_running_average=False, interpret=True,
                               mesh=mesh)

        def run(mod, xs):
            def f(params, xx):
                y, upd = mod.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    xx, mutable=["batch_stats"])
                return y, upd["batch_stats"]
            return f

        y1, bs1 = run(pal1, x)(v["params"], x)
        xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
        fm = jax.jit(run(palm, xs))
        ym, bsm = fm(v["params"], xs)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(ym),
                                   atol=1e-5)
        for k in ("mean", "var"):
            np.testing.assert_allclose(np.asarray(bs1[k]),
                                       np.asarray(bsm[k]), atol=1e-6)
        # gradient path through the mesh'd custom VJP
        def g(params, xx):
            y, _ = palm.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                xx, mutable=["batch_stats"])
            return jnp.sin(y).sum()
        gm = jax.jit(jax.grad(g, argnums=(0, 1)))(v["params"], xs)
        g1 = jax.grad(
            lambda p, xx: jnp.sin(run(pal1, xx)(p, xx)[0]).sum(),
            argnums=(0, 1))(v["params"], x)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(gm)):
            scale = max(float(jnp.abs(a).max()), 1.0)
            assert float(jnp.abs(a - b).max()) / scale < 1e-5


class TestBackboneIntegration:
    def test_bn_impl_pallas_matches_xla_through_detector(self):
        """Full-detector train-mode forward+grads: bn_impl='pallas'
        (interpret) == bn_impl='xla' — the knob is a pure perf switch."""
        from s2anet_tpu.models.detector import S2ANet
        from s2anet_tpu.models.head import compute_s2anet_loss

        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.uniform(size=(2, 64, 64, 3))
                           .astype(np.float32))
        gtb = jnp.asarray([[[32, 32, 20, 10, 0.3]]] * 2, jnp.float32)
        gtc = jnp.zeros((2, 1), jnp.int32)
        gtm = jnp.ones((2, 1), bool)

        def items_grads(bn_impl, v):
            model = S2ANet(backbone_name="resnet18", num_classes=3,
                           deform_impl="gather", bn_impl=bn_impl)

            def f(params):
                out, _ = model.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    imgs, train=True, mutable=["batch_stats"])
                total, items = compute_s2anet_loss(
                    out, gtb, gtc, gtm, imgs_size=(64, 64), num_classes=3,
                    iou_impl="xla")
                return total, items
            (_, items), grads = jax.value_and_grad(f, has_aux=True)(
                v["params"])
            return items, grads

        v = S2ANet(backbone_name="resnet18", num_classes=3,
                   deform_impl="gather").init(
            jax.random.PRNGKey(0), imgs[:1], train=False)
        it_x, g_x = items_grads("xla", v)
        it_p, g_p = items_grads("pallas", v)
        np.testing.assert_allclose(np.asarray(it_x), np.asarray(it_p),
                                   rtol=1e-4, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g_x),
                        jax.tree_util.tree_leaves(g_p)):
            scale = max(float(jnp.abs(a).max()), 1e-3)
            assert float(jnp.abs(a - b).max()) / scale < 5e-4

    def test_variable_trees_identical(self):
        from s2anet_tpu.models.detector import S2ANet

        imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
        v_x = S2ANet(backbone_name="resnet18", num_classes=3,
                     deform_impl="gather", bn_impl="xla").init(
            jax.random.PRNGKey(0), imgs, train=False)
        v_p = S2ANet(backbone_name="resnet18", num_classes=3,
                     deform_impl="gather", bn_impl="pallas").init(
            jax.random.PRNGKey(0), imgs, train=False)
        assert (jax.tree_util.tree_structure(v_x)
                == jax.tree_util.tree_structure(v_p))

"""Round-4 features: SampledBatchNorm (prefix-batch BN statistics), the
int8 ORConv/head coverage, and eval-runner fold/quant wiring guards."""

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from s2anet_tpu.models.resnet import SampledBatchNorm


class TestSampledBatchNorm:
    def _pair(self, train=True):
        ref = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, name="bn")
        return ref

    def test_matches_batchnorm_when_k_is_batch(self):
        """stats_images >= batch == exact flax BatchNorm (same math)."""
        x = jnp.asarray(
            np.random.default_rng(0).normal(1.0, 2.0, (4, 8, 8, 16))
            .astype(np.float32))
        ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5, name="bn")
        sam = SampledBatchNorm(use_running_average=False, stats_images=4,
                               name="bn")
        v = ref.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(
                       sam.init(jax.random.PRNGKey(0), x)))
        y_ref, upd_ref = ref.apply(v, x, mutable=["batch_stats"])
        y_sam, upd_sam = sam.apply(v, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_sam),
                                   atol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(upd_ref),
                        jax.tree_util.tree_leaves(upd_sam)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_prefix_stats(self):
        """stats_images=k normalizes with the first-k images' statistics."""
        rng = np.random.default_rng(1)
        x = np.concatenate([
            rng.normal(0.0, 1.0, (2, 4, 4, 8)),   # the stats prefix
            rng.normal(5.0, 3.0, (6, 4, 4, 8)),   # excluded from stats
        ]).astype(np.float32)
        sam = SampledBatchNorm(use_running_average=False, stats_images=2,
                               name="bn")
        v = sam.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y, upd = sam.apply(v, jnp.asarray(x), mutable=["batch_stats"])
        xs = x[:2]
        mean = xs.mean((0, 1, 2))
        var = (xs * xs).mean((0, 1, 2)) - mean ** 2
        expect = (x - mean) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(np.asarray(y), expect, atol=2e-4)
        # running stats updated from the SAME prefix statistics
        np.testing.assert_allclose(np.asarray(upd["batch_stats"]["mean"]),
                                   0.1 * mean, atol=1e-5)

    def test_eval_uses_running_stats(self):
        x = jnp.asarray(
            np.random.default_rng(2).normal(0, 1, (4, 4, 4, 8))
            .astype(np.float32))
        sam = SampledBatchNorm(use_running_average=True, stats_images=2,
                               name="bn")
        ref = nn.BatchNorm(use_running_average=True, momentum=0.9,
                           epsilon=1e-5, name="bn")
        v = ref.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(np.asarray(sam.apply(v, x)),
                                   np.asarray(ref.apply(v, x)), atol=1e-6)

    def test_detector_train_step_with_sampled_stats(self):
        """bn_stats_images threads through the detector and trains."""
        from s2anet_tpu.models.detector import S2ANet
        from s2anet_tpu.models.head import compute_s2anet_loss

        model = S2ANet(backbone_name="resnet18", num_classes=2,
                       deform_impl="gather", bn_stats_images=2)
        imgs = jnp.asarray(
            np.random.default_rng(3).uniform(size=(4, 64, 64, 3))
            .astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), imgs, train=False)
        gtb = jnp.tile(jnp.asarray([32.0, 32.0, 20.0, 10.0, 0.3]), (4, 2, 1))
        gtc = jnp.zeros((4, 2), jnp.int32)
        gtm = jnp.ones((4, 2), bool)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                imgs, train=True, mutable=["batch_stats"])
            total, _ = compute_s2anet_loss(
                out, gtb, gtc, gtm, imgs_size=(64, 64), num_classes=2)
            return total

        g = jax.grad(loss_fn)(v["params"])
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g))


class TestCliConfigPrecedence:
    """An untyped CLI flag must never stomp a --config value (the argparse
    defaults used to silently override the yaml: a clamp6 synthetic config's
    resnet18/3-class/256px setup was rebuilt as resnet50/15/1024, making
    every checkpoint restore fail with a tree mismatch)."""

    def test_prune_overrides_drops_none_and_empty_subdicts(self):
        from s2anet_tpu.utils.config import prune_overrides

        assert prune_overrides({
            "model": {"backbone": None, "num_classes": 3},
            "data": {"root": None},
            "eval": {"rect": True},
        }) == {"model": {"num_classes": 3}, "eval": {"rect": True}}

    def test_config_survives_untyped_flags(self, tmp_path):
        from s2anet_tpu.utils.config import load_config, prune_overrides

        p = tmp_path / "c.yaml"
        p.write_text(
            "model: {backbone: resnet18, num_classes: 3}\n"
            "data: {img_size: 256, names: [a, b, c]}\n"
            "train: {epochs: 48}\n"
            "eval: {batch_size: 16, rect: true}\n"
        )
        # what val.py builds when ONLY --config is typed
        overrides = prune_overrides({
            "model": {"backbone": None, "num_classes": None,
                      "score_thr": None, "quant": None},
            "data": {"val_list": None, "root": None, "img_size": None},
            "eval": {"batch_size": None, "is_map_split": None,
                     "task": None, "rect": None},
        })
        cfg = load_config(str(p), overrides)
        assert cfg.model.backbone == "resnet18"
        assert cfg.model.num_classes == 3
        assert cfg.data.img_size == 256
        assert cfg.train.epochs == 48
        assert cfg.eval.rect is True
        # an explicitly typed flag still wins over the config
        cfg = load_config(str(p), prune_overrides(
            {"model": {"backbone": "resnet34"}}))
        assert cfg.model.backbone == "resnet34"

    def test_cli_defaults_match_dataclass_defaults(self):
        """The None-pruning refactor is only behavior-preserving for
        config-less invocations if the dataclass defaults equal the old
        argparse defaults — pin the load-bearing ones."""
        from s2anet_tpu.utils.config import Config

        cfg = Config()
        assert cfg.model.backbone == "resnet50"
        assert cfg.model.num_classes == 15
        assert cfg.data.img_size == 1024
        assert cfg.train.epochs == 12
        assert cfg.train.batch_size == 8
        assert cfg.train.lr0 == 0.005
        assert cfg.train.dtype == "bfloat16"
        assert cfg.train.save_dir == "runs/train/exp"
        assert cfg.eval.batch_size == 16

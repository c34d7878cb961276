"""Round-3 feature tests: W&B plumbing, val-loss padding fix, backbone
remat wiring, disk-cache staleness.

Covers the reference behaviors at utils/loggers/wandb/wandb_utils.py:106-180
(W&B run with config), val.py:255 (val losses — here without padded-batch
dilution), and the round-2 advisor findings on cache staleness and the
unwired remat flag.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- W&B stub
class _StubRun:
    def __init__(self):
        self.logged = []
        self.finished = False

    def log(self, metrics, step=None):
        self.logged.append((step, dict(metrics)))

    def finish(self):
        self.finished = True


def _install_stub_wandb(monkeypatch):
    calls = {}
    run = _StubRun()

    mod = types.ModuleType("wandb")

    def init(**kwargs):
        calls.update(kwargs)
        return run

    mod.init = init
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return calls, run


def test_wandb_logger_init_log_finish(tmp_path, monkeypatch):
    from s2anet_tpu.utils.loggers import Loggers

    calls, run = _install_stub_wandb(monkeypatch)
    lg = Loggers(
        tmp_path, use_tensorboard=False, use_wandb=True,
        wandb_project="proj-x", wandb_entity="team-y",
        run_config={"train": {"lr0": 0.005}},
    )
    assert calls["project"] == "proj-x"
    assert calls["entity"] == "team-y"
    assert calls["config"] == {"train": {"lr0": 0.005}}
    lg.log_metrics({"train/fam_cls_loss": 1.25, "notnum": "x"}, 3)
    lg.close()
    assert run.finished
    step, metrics = run.logged[0]
    assert step == 3
    assert metrics["train/fam_cls_loss"] == 1.25
    assert "notnum" not in metrics  # only numeric keys forwarded


def test_wandb_off_by_default(tmp_path, monkeypatch):
    from s2anet_tpu.utils.loggers import Loggers

    calls, _ = _install_stub_wandb(monkeypatch)
    lg = Loggers(tmp_path, use_tensorboard=False)
    assert lg.wandb is None and not calls
    lg.close()


def test_trainer_plumbs_wandb_and_remat(tmp_path, monkeypatch):
    """cfg.train.wandb_project reaches Loggers; cfg.model.backbone_remat
    reaches the model (round-2 verdict item 5 + advisor finding 4)."""
    from s2anet_tpu.train.trainer import Trainer
    from s2anet_tpu.utils.config import load_config

    calls, run = _install_stub_wandb(monkeypatch)
    cfg = load_config(None, {
        "model": {"backbone": "resnet18", "backbone_remat": True},
        "train": {"save_dir": str(tmp_path / "run"),
                  "wandb_project": "s2a-tests", "batch_size": 2},
        "data": {"img_size": 64},
    })
    tr = Trainer(cfg)
    assert tr.model.backbone_remat is True
    assert tr.loggers.wandb is run
    assert calls["project"] == "s2a-tests"
    assert calls["config"]["model"]["backbone_remat"] is True
    tr.loggers.close()


# -------------------------------------------------- val-loss padding fix
def test_val_loss_weighted_by_real_batch(tmp_path, rng):
    """The final partial batch is zero-padded to the static batch size; its
    loss items must enter the mean weighted by the REAL image count
    (runner.py padding fix — round-2 verdict weak item 5)."""
    import cv2

    from s2anet_tpu.data.dota import DotaDataset
    from s2anet_tpu.eval.runner import evaluate_on_chips
    from s2anet_tpu.utils.config import load_config

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir(); lbl_dir.mkdir()
    for i in range(3):  # batch_size 2 -> one full batch + one padded batch
        cv2.imwrite(str(img_dir / f"im{i}.png"),
                    rng.integers(0, 255, (64, 64, 3)).astype(np.uint8))
        (lbl_dir / f"im{i}.txt").write_text(
            "0 0.2 0.2 0.6 0.2 0.6 0.4 0.2 0.4\n")
    cfg = load_config(None, {
        "data": {"img_size": 64, "max_gt": 8,
                 "names": ["a", "b"]},
        "eval": {"batch_size": 2},
    })
    ds = DotaDataset(img_dir, img_size=64, max_gt=8, augment=False)

    losses = iter([1.0, 4.0])

    def fake_eval_step(state, batch):
        b = batch["imgs"].shape[0]
        k = 16
        return (np.zeros((b, k, 6), np.float32),
                np.zeros((b, k), np.int32),
                np.zeros((b, k), bool),
                np.full(4, next(losses), np.float32))

    out = evaluate_on_chips(
        model=None, state=None, cfg=cfg, dataset=ds,
        eval_step=fake_eval_step, with_loss=True,
    )
    # weighted: (2*1.0 + 1*4.0) / 3 = 2.0 — NOT the unweighted 2.5
    assert out["val/fam_cls_loss"] == pytest.approx(2.0)
    assert out["n_images"] == 3


# -------------------------------------------------- backbone remat path
@pytest.mark.slow
def test_backbone_remat_grad_step():
    """nn.remat over the backbone composes with mutable BatchNorm stats in
    train mode: one grad step must run and produce finite grads equal to the
    un-rematerialized model's (remat changes memory, not math)."""
    from s2anet_tpu.models.detector import S2ANet

    img = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 128, 128, 3)), jnp.float32
    )

    def run(remat: bool):
        model = S2ANet(backbone_name="resnet18", num_classes=3,
                       backbone_remat=remat)
        variables = model.init(jax.random.PRNGKey(0), img, train=False)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                img, train=True, mutable=["batch_stats"],
            )
            return sum(jnp.sum(c.astype(jnp.float32) ** 2)
                       for c in out["odm_cls"]), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        return loss, grads, mut["batch_stats"]

    loss_r, grads_r, bs_r = run(remat=True)
    loss_n, grads_n, bs_n = run(remat=False)
    assert np.isfinite(float(loss_r))
    np.testing.assert_allclose(float(loss_r), float(loss_n), rtol=1e-5)
    flat_r = jax.tree_util.tree_leaves(grads_r)
    flat_n = jax.tree_util.tree_leaves(grads_n)
    for a, b in zip(flat_r, flat_n):
        assert np.isfinite(np.asarray(a)).all()
        # remat reorders fusions, so near-zero grad elements differ by a few
        # ulp of the O(1-10) values feeding them — atol covers that; a real
        # math change under remat would show O(1) differences
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    # batch stats advanced under remat too
    for a, b in zip(jax.tree_util.tree_leaves(bs_r),
                    jax.tree_util.tree_leaves(bs_n)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


# -------------------------------------------------- multi-host wiring
def test_loader_shards_partition_exactly(tmp_path, rng):
    """Sharded BatchLoader = DistributedSampler analogue: equal per-shard
    lengths (multi-host step counts must match or collectives deadlock),
    disjoint samples, same permutation for the same epoch."""
    import cv2

    from s2anet_tpu.data.dota import BatchLoader, DotaDataset

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for i in range(11):  # deliberately not divisible by 4 shards
        cv2.imwrite(str(img_dir / f"im{i:02d}.png"),
                    rng.integers(0, 255, (16, 16, 3)).astype(np.uint8))
    ds = DotaDataset(img_dir, img_size=16, max_gt=4, cache_labels=False)

    all_paths = []
    lengths = []
    for shard in range(4):
        ld = BatchLoader(ds, 1, shuffle=True, seed=7, shard=shard,
                         num_shards=4, num_workers=1)
        ld.set_epoch(3)
        batches = list(ld)
        lengths.append(len(batches))
        assert len(batches) == len(ld)
        all_paths += [b["paths"][0] for b in batches]
    assert lengths == [2, 2, 2, 2]          # 11 // 4 each, equalized
    assert len(set(all_paths)) == len(all_paths)  # disjoint across shards


def test_maybe_initialize_distributed_gated(monkeypatch):
    from s2anet_tpu.parallel.mesh import maybe_initialize_distributed

    monkeypatch.delenv("S2A_MULTIHOST", raising=False)
    assert maybe_initialize_distributed() is False  # env-gated: no-op
    monkeypatch.setenv("S2A_MULTIHOST", "0")
    assert maybe_initialize_distributed() is False


def test_trainer_nonmain_process_writes_nothing(tmp_path, monkeypatch):
    """Non-main processes must not create run dirs, configs or loggers
    (rank-0-only work, reference train.py:93,199,245)."""
    import s2anet_tpu.train.trainer as trainer_mod
    from s2anet_tpu.utils.config import load_config

    monkeypatch.setattr(trainer_mod, "is_main_process", lambda: False)
    run_dir = tmp_path / "run"
    cfg = load_config(None, {
        "model": {"backbone": "resnet18"},
        "train": {"save_dir": str(run_dir), "batch_size": 2},
        "data": {"img_size": 64},
    })
    tr = trainer_mod.Trainer(cfg)
    assert tr.is_main is False
    assert not run_dir.exists()
    assert isinstance(tr.loggers, trainer_mod._NullLoggers)
    tr.loggers.log_metrics({"x": 1.0}, 0)  # API-compatible no-op
    tr.loggers.close()


# -------------------------------------------------- host input pipeline
def _tiny_dataset(tmp_path, rng, n=7, size=32):
    import cv2

    from s2anet_tpu.data.dota import DotaDataset

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir(exist_ok=True); lbl_dir.mkdir(exist_ok=True)
    for i in range(n):
        cv2.imwrite(str(img_dir / f"im{i:02d}.png"),
                    rng.integers(0, 255, (size, size, 3)).astype(np.uint8))
        (lbl_dir / f"im{i:02d}.txt").write_text(
            "0 0.2 0.2 0.6 0.2 0.6 0.4 0.2 0.4\n")
    return img_dir


def test_process_loader_matches_thread_loader(tmp_path, rng):
    """Process mode must produce bit-identical batches in the same order as
    the thread mode (rng is keyed on batch index, not worker identity)."""
    from s2anet_tpu.data.dota import BatchLoader, DotaDataset

    img_dir = _tiny_dataset(tmp_path, rng)
    ds = DotaDataset(img_dir, img_size=32, max_gt=4, augment=True,
                     fliplr=0.5, rot90=True, cache_labels=False)
    kw = dict(batch_size=2, shuffle=True, seed=11, drop_last=True)
    a = list(BatchLoader(ds, num_workers=1, **kw))
    b = list(BatchLoader(ds, num_workers=3, mode="process", prefetch=2, **kw))
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        assert x["paths"] == y["paths"]
        assert x["orig_shapes"] == y["orig_shapes"]
        for k in ("imgs", "gt_boxes", "gt_classes", "gt_mask"):
            np.testing.assert_array_equal(x[k], y[k])


def test_process_loader_worker_error_propagates(tmp_path, rng):
    from s2anet_tpu.data.dota import BatchLoader, DotaDataset

    img_dir = _tiny_dataset(tmp_path, rng, n=4)
    ds = DotaDataset(img_dir, img_size=32, max_gt=4, cache_labels=False)
    (img_dir / "im00.png").unlink()  # decode will fail in the worker
    ld = BatchLoader(ds, 2, shuffle=False, mode="process", num_workers=2)
    with pytest.raises(RuntimeError, match="loader worker failed"):
        list(ld)


def test_packed_cache_roundtrip_and_invalidation(tmp_path, rng):
    import cv2

    from s2anet_tpu.data.packed_cache import PackedImageCache

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    imgs = []
    for i, (h, w) in enumerate([(16, 24), (32, 8), (20, 20)]):
        img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"p{i}.png"), img)
        imgs.append(cv2.imread(str(img_dir / f"p{i}.png")))
    paths = sorted(img_dir.glob("*.png"))
    pack = PackedImageCache(paths)
    assert not pack.valid()
    pack.build()
    assert pack.valid()
    for i in range(3):
        np.testing.assert_array_equal(pack.get(i), imgs[i])
    # rebuild is a no-op; source change invalidates
    pack.build()
    import os
    import time

    cv2.imwrite(str(paths[1]), np.zeros((8, 8, 3), np.uint8))
    t = time.time() + 5
    os.utime(paths[1], (t, t))
    pack2 = PackedImageCache(paths)
    assert not pack2.valid()
    pack2.build()
    assert pack2.get(1).shape == (8, 8, 3)
    assert (pack2.get(1) == 0).all()


def test_dataset_packed_cache_serves_views(tmp_path, rng):
    from s2anet_tpu.data.dota import DotaDataset

    img_dir = _tiny_dataset(tmp_path, rng, n=3)
    ds_plain = DotaDataset(img_dir, img_size=32, max_gt=4, cache_labels=False)
    ds_pack = DotaDataset(img_dir, img_size=32, max_gt=4, cache_labels=False,
                          cache_images="packed")
    for i in range(3):
        np.testing.assert_array_equal(ds_pack.load_image(i),
                                      ds_plain.load_image(i))
    s = ds_pack.get_sample(0, np.random.default_rng(0))
    assert s["imgs"].shape == (32, 32, 3)


# -------------------------------------------------- rect-batch eval
def _rect_dataset(tmp_path, sizes):
    """Non-square images with one white axis-aligned box at a fixed
    relative position + matching YOLO labels."""
    import cv2

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir(); lbl_dir.mkdir()
    rel = (0.25, 0.25, 0.625, 0.5)  # x0, y0, x1, y1
    for i, (h, w) in enumerate(sizes):
        img = np.full((h, w, 3), 20, np.uint8)
        x0, y0, x1, y1 = (int(rel[0] * w), int(rel[1] * h),
                          int(rel[2] * w), int(rel[3] * h))
        img[y0:y1, x0:x1] = 255
        cv2.imwrite(str(img_dir / f"im{i:02d}.png"), img)
        fx0, fy0, fx1, fy1 = x0 / w, y0 / h, x1 / w, y1 / h
        (lbl_dir / f"im{i:02d}.txt").write_text(
            f"0 {fx0} {fy0} {fx1} {fy0} {fx1} {fy1} {fx0} {fy1}\n")
    return img_dir


def _box_finder_step(state, imgs):
    """Fake eval step: recover the white box from the letterboxed pixels."""
    imgs = np.asarray(imgs)
    b, k = imgs.shape[0], 8
    boxes = np.zeros((b, k, 6), np.float32)
    labels = np.zeros((b, k), np.int32)
    valid = np.zeros((b, k), bool)
    for n in range(b):
        ys, xs = np.where(imgs[n].sum(-1) > 1.5)
        if len(xs):
            x0, x1, y0, y1 = xs.min(), xs.max(), ys.min(), ys.max()
            boxes[n, 0] = [(x0 + x1 + 1) / 2, (y0 + y1 + 1) / 2,
                           x1 - x0 + 1, y1 - y0 + 1, 0.0, 0.9]
            valid[n, 0] = True
    return boxes, labels, valid


def test_rect_batch_plan_buckets():
    """Shape-ordered batches, per-batch minimal target shapes rounded to
    the stride (datasets_rotation.py:250-420 semantics)."""
    from s2anet_tpu.data.dota import BatchLoader

    class FakeDS:
        img_size = 1024
        max_gt = 4

        def __len__(self):
            return 8

        def shapes(self):
            # landscape ar 0.5 x4, ar 0.75 x4
            return np.array([[512, 1024]] * 4 + [[768, 1024]] * 4)

    ld = BatchLoader(FakeDS(), 4, shuffle=False, rect=True, rect_stride=32)
    plan = ld._batch_plan()
    assert len(plan) == 2
    # reference formula (datasets_rotation.py): ceil(shape*s/stride+pad)*stride
    # ar 0.5: ceil(0.5*32+0.5)*32 = 17*32 = 544; width ceil(32.5)*32 = 1056
    assert plan[0][1] == (544, 1056)
    # ar 0.75: ceil(24.5)*32 = 800
    assert plan[1][1] == (800, 1056)
    # each batch is homogeneous in aspect-ratio ordering
    assert all(len(bi) == 4 for bi, _ in plan)


def test_rect_eval_matches_square_map(tmp_path):
    """rect=True must give the same (perfect) mAP as square eval while
    batching non-square images at reduced shapes."""
    from s2anet_tpu.data.dota import DotaDataset
    from s2anet_tpu.eval.runner import evaluate_on_chips
    from s2anet_tpu.utils.config import load_config

    img_dir = _rect_dataset(
        tmp_path, [(96, 256), (128, 256), (96, 256), (192, 256), (256, 256)]
    )
    results = {}
    shapes_seen = {}
    for rect in (False, True):
        cfg = load_config(None, {
            "data": {"img_size": 256, "max_gt": 8, "names": ["a"]},
            "eval": {"batch_size": 2, "rect": rect, "rect_stride": 32},
        })
        ds = DotaDataset(img_dir, img_size=256, max_gt=8, augment=False,
                         cache_labels=False)
        seen = []

        def step(state, imgs, _seen=seen):
            _seen.append(tuple(np.asarray(imgs).shape[1:3]))
            return _box_finder_step(state, imgs)

        out = evaluate_on_chips(model=None, state=None, cfg=cfg, dataset=ds,
                                eval_step=step)
        results[rect] = out
        shapes_seen[rect] = seen
    assert results[False]["map50"] == pytest.approx(1.0)
    assert results[True]["map50"] == pytest.approx(1.0)
    assert set(shapes_seen[False]) == {(256, 256)}
    # rect mode: smaller shapes for the wide images, >1 bucket
    assert len(set(shapes_seen[True])) >= 2
    assert min(h for h, w in shapes_seen[True]) < 256
    # and it reduces total processed pixels
    px = lambda ss: sum(h * w for h, w in ss)  # noqa: E731
    assert px(shapes_seen[True]) < px(shapes_seen[False])


def test_rect_loader_process_mode_matches_thread(tmp_path):
    from s2anet_tpu.data.dota import BatchLoader, DotaDataset

    img_dir = _rect_dataset(
        tmp_path, [(96, 256), (128, 256), (192, 256), (256, 256)]
    )
    ds = DotaDataset(img_dir, img_size=256, max_gt=8, augment=False,
                     cache_labels=False)
    kw = dict(batch_size=2, shuffle=False, drop_last=False, rect=True,
              rect_stride=32)
    a = list(BatchLoader(ds, num_workers=1, **kw))
    b = list(BatchLoader(ds, num_workers=2, mode="process", **kw))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x["img_shapes"] == y["img_shapes"]
        assert x["imgs"].shape == y["imgs"].shape
        for k in ("imgs", "gt_boxes", "gt_classes", "gt_mask"):
            np.testing.assert_array_equal(x[k], y[k])


# -------------------------------------------------- disk cache staleness
def test_disk_cache_refreshes_on_source_change(tmp_path):
    import os
    import time

    import cv2

    from s2anet_tpu.data.dota import DotaDataset

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    p = img_dir / "im0.png"
    cv2.imwrite(str(p), np.full((8, 8, 3), 10, np.uint8))
    ds = DotaDataset(img_dir, img_size=8, cache_images="disk",
                     cache_labels=False)
    a = ds.load_image(0)
    assert (a == 10).all()
    assert p.with_suffix(".npy").exists()

    # re-chip the image: newer source must invalidate the sidecar
    cv2.imwrite(str(p), np.full((8, 8, 3), 77, np.uint8))
    future = time.time() + 5
    os.utime(p, (future, future))
    b = ds.load_image(0)
    assert (b == 77).all()
    # and the sidecar itself was refreshed for the next epoch
    assert (np.load(p.with_suffix(".npy")) == 77).all()


# -------------------------------------------------- approx top-k prefilter

def test_approx_topk_knob_decodes(monkeypatch, rng):
    """S2A_APPROX_TOPK routes the decode prefilter through approx_max_k
    (exact fallback off-TPU, so CPU results must match the exact path);
    '0'/'' leave the exact lax.top_k path."""
    import jax
    import jax.numpy as jnp

    from s2anet_tpu.models.anchors import grid_anchors
    from s2anet_tpu.models.head import s2anet_get_bboxes

    h = w = 16
    n = h * w
    anchors = jnp.asarray(grid_anchors((h, w), 8))
    outputs = {
        "odm_cls": [jnp.asarray(rng.normal(size=(2, n, 3)) * 2,
                                jnp.float32)],
        "odm_bbox": [jnp.asarray(rng.normal(size=(2, n, 5)) * 0.1,
                                 jnp.float32)],
        "refine_anchors": [jnp.broadcast_to(anchors[None], (2, n, 5))],
    }
    kw = dict(max_before_nms_per_level=64, max_per_img=32, pre_nms_cap=128)

    monkeypatch.setenv("S2A_APPROX_TOPK", "0")
    exact = s2anet_get_bboxes(outputs, **kw)
    monkeypatch.setenv("S2A_APPROX_TOPK", "1")
    approx = s2anet_get_bboxes(outputs, **kw)
    for a, b in zip(exact, approx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

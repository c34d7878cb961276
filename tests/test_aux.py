"""Tests for auxiliary subsystems: config, schedule, optimizer, EMA,
checkpointing, callbacks, loggers, plots, HRSC parsing, dataset loader."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2anet_tpu.utils.config import Config, load_config
from s2anet_tpu.utils.callbacks import Callbacks
from s2anet_tpu.utils.loggers import Loggers
from s2anet_tpu.train.schedule import build_lr_schedule
from s2anet_tpu.train.optim import build_optimizer, decay_mask, freeze_mask
from s2anet_tpu.train.state import create_train_state, ema_update


# ----------------------------------------------------------------- config
def test_config_roundtrip(tmp_path):
    cfg = Config()
    cfg.train.epochs = 7
    p = tmp_path / "c.yaml"
    cfg.save(p)
    cfg2 = load_config(p)
    assert cfg2.train.epochs == 7
    assert cfg2.model.backbone == "resnet50"
    cfg3 = load_config(p, {"train": {"lr0": 0.1}})
    assert cfg3.train.lr0 == 0.1 and cfg3.train.epochs == 7


# --------------------------------------------------------------- schedule
def test_step_schedule_reference_recipe():
    # 12 epochs, 100 steps/epoch: x0.1 at epochs 8 and 11, 500-iter warmup
    lr = build_lr_schedule(0.005, 1200, 100, "step", (8 / 12, 11 / 12), 0.1,
                           warmup_iters=500, warmup_init_factor=1 / 3)
    assert abs(float(lr(0)) - 0.005 / 3) < 1e-9
    assert abs(float(lr(500)) - 0.005) < 1e-8
    assert abs(float(lr(799)) - 0.005) < 1e-8
    assert abs(float(lr(801)) - 0.0005) < 1e-8
    assert abs(float(lr(1101)) - 0.00005) < 1e-9


def test_cosine_schedule_endpoints():
    lr = build_lr_schedule(0.01, 1000, 100, "cosine", lrf=0.1, warmup_iters=0)
    assert abs(float(lr(0)) - 0.01) < 1e-8
    assert abs(float(lr(1000)) - 0.001) < 1e-8


# -------------------------------------------------------------- optimizer
def make_params():
    return {
        "backbone": {
            "conv1": {"kernel": jnp.ones((3, 3, 3, 8))},
            "bn1": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
            "layer1_0": {"conv1": {"kernel": jnp.ones((3, 3, 8, 8))}},
            "layer2_0": {"conv1": {"kernel": jnp.ones((3, 3, 8, 8))}},
        },
        "head": {"align_weight": jnp.ones((3, 3, 8, 8)),
                 "fam_reg_head": {"kernel": jnp.ones((1, 1, 8, 5)),
                                  "bias": jnp.zeros(5)}},
    }


def test_decay_mask_excludes_bias_and_bn():
    params = make_params()
    mask = decay_mask(params)
    assert mask["backbone"]["conv1"]["kernel"]
    assert not mask["backbone"]["bn1"]["scale"]
    assert not mask["backbone"]["bn1"]["bias"]
    assert mask["head"]["align_weight"]
    assert not mask["head"]["fam_reg_head"]["bias"]


def test_freeze_mask_stages():
    params = make_params()
    m = freeze_mask(params, frozen_stages=1)
    assert not m["backbone"]["conv1"]["kernel"]
    assert not m["backbone"]["layer1_0"]["conv1"]["kernel"]
    assert m["backbone"]["layer2_0"]["conv1"]["kernel"]
    assert m["head"]["align_weight"]
    m_all = freeze_mask(params, frozen_stages=-1)
    assert all(jax.tree_util.tree_leaves(m_all))


def test_frozen_params_do_not_update():
    params = make_params()
    tx = build_optimizer(lambda s: 0.1, weight_decay=0.0,
                         params_example=params, frozen_stages=1)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["backbone"]["conv1"]["kernel"]).max()) == 0
    assert float(jnp.abs(updates["backbone"]["layer2_0"]["conv1"]["kernel"]).max()) > 0


def test_grad_clip_norm():
    params = {"w": jnp.zeros(4)}
    tx = build_optimizer(lambda s: 1.0, weight_decay=0.0, grad_clip_norm=1.0,
                         params_example=params)
    state = tx.init(params)
    big = {"w": jnp.full(4, 100.0)}
    updates, _ = tx.update(big, state, params)
    norm = float(jnp.linalg.norm(updates["w"]))
    assert abs(norm - 1.0) < 1e-5


# -------------------------------------------------------------------- EMA
def test_ema_ramp_and_blend():
    params = {"w": jnp.zeros(3)}
    tx = build_optimizer(lambda s: 0.1, params_example=params, weight_decay=0)
    state = create_train_state(params, {}, tx)
    state = state.replace(step=jnp.asarray(2000, jnp.int32))
    d = float(state.ema_decay_at(0.9999, 2000))
    assert abs(d - 0.9999 * (1 - np.exp(-1.0))) < 1e-6
    new = {"w": jnp.ones(3)}
    state2 = ema_update(state, new, {}, 0.9999, 2000)
    expect = 0.0 * d + 1.0 * (1 - d)
    np.testing.assert_allclose(np.asarray(state2.ema_params["w"]),
                               expect, rtol=1e-5)


# ------------------------------------------------------------- checkpoint
def test_checkpoint_roundtrip(tmp_path):
    from s2anet_tpu.train.checkpoint import (load_checkpoint,
                                             load_metadata, save_checkpoint)

    params = {"w": jnp.arange(4.0)}
    tx = build_optimizer(lambda s: 0.1, params_example=params, weight_decay=0)
    state = create_train_state(params, {"bn": jnp.ones(2)}, tx)
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    path = tmp_path / "ckpt"
    save_checkpoint(path, state, {"epoch": 3})
    restored = load_checkpoint(path, state)
    assert int(restored.step) == 42
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.arange(4.0))
    assert load_metadata(path)["epoch"] == 3


# ---------------------------------------------------- callbacks / loggers
def test_callbacks_fire():
    cb = Callbacks()
    hits = []
    cb.register_action("on_train_start", "t", lambda: hits.append(1))
    cb.run("on_train_start")
    assert hits == [1]
    with pytest.raises(AssertionError):
        cb.run("bogus_hook")


def test_csv_logger(tmp_path):
    lg = Loggers(tmp_path, use_tensorboard=False)
    lg.log_metrics({"a": 1.0, "b": 2.0}, step=0)
    lg.log_metrics({"a": 3.0, "b": 4.0}, step=1)
    rows = (tmp_path / "results.csv").read_text().splitlines()
    assert len(rows) == 3
    assert rows[0].startswith("epoch_or_step,a,b")


# ------------------------------------------------------------------ plots
def test_plots_smoke(tmp_path, rng):
    from s2anet_tpu.utils.plots import (draw_rboxes, plot_images_grid,
                                        plot_label_stats, plot_pr_curves)

    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    boxes = np.array([[32, 32, 30, 10, 0.5]])
    out = draw_rboxes(img, boxes, [3], [0.9], names=[f"c{i}" for i in range(15)])
    assert out.shape == img.shape and (out != img).any()

    imgs = rng.uniform(size=(4, 64, 64, 3)).astype(np.float32)
    targets = [(boxes, np.array([1]))] * 4
    plot_images_grid(imgs, targets, tmp_path / "mosaic.jpg")
    assert (tmp_path / "mosaic.jpg").exists()

    plot_label_stats(np.tile(boxes, (10, 1)), np.arange(10) % 3,
                     tmp_path / "labels.png")
    assert (tmp_path / "labels.png").exists()

    res = {"ship": {"rec": np.linspace(0, 1, 5), "prec": np.ones(5),
                    "ap": 1.0}}
    plot_pr_curves(res, tmp_path / "pr.png")
    assert (tmp_path / "pr.png").exists()


# ------------------------------------------------------------------- HRSC
def test_hrsc_xml_parse(tmp_path):
    from s2anet_tpu.eval.hrsc import evaluate_hrsc, parse_hrsc_xml
    from s2anet_tpu.ops.polyiou_ref import rbox_vertices_np

    xml = """<HRSC_Image><HRSC_Objects>
      <HRSC_Object><mbox_cx>100</mbox_cx><mbox_cy>80</mbox_cy>
        <mbox_w>60</mbox_w><mbox_h>20</mbox_h><mbox_ang>0.3</mbox_ang>
        <difficult>0</difficult></HRSC_Object>
    </HRSC_Objects></HRSC_Image>"""
    (tmp_path / "100000001.xml").write_text(xml)
    objs = parse_hrsc_xml(tmp_path / "100000001.xml")
    assert len(objs) == 1
    np.testing.assert_allclose(objs[0]["rbox"], [100, 80, 60, 20, 0.3])

    det_poly = rbox_vertices_np(np.array([[100, 80, 60, 20, 0.3]]))[0].reshape(8)
    res = evaluate_hrsc([("100000001", 0.9, det_poly)], tmp_path,
                        ["100000001"])
    assert abs(res["ap"] - 1.0) < 1e-9


# ---------------------------------------------------------------- dataset
def test_dota_dataset_and_loader(tmp_path, rng):
    import cv2

    from s2anet_tpu.data.dota import BatchLoader, DotaDataset

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    for i in range(5):
        img = rng.integers(0, 255, (200, 300, 3)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"im{i}.png"), img)
        # one box per image, normalized polygon
        (lbl_dir / f"im{i}.txt").write_text(
            "2 0.30 0.30 0.50 0.30 0.50 0.40 0.30 0.40\n"
        )
    ds = DotaDataset(img_dir, img_size=128, max_gt=8, augment=True)
    assert len(ds) == 5
    s = ds.get_sample(0, np.random.default_rng(0))
    assert s["imgs"].shape == (128, 128, 3)
    assert s["imgs"].dtype == np.float32
    assert s["gt_mask"].sum() == 1
    box = s["gt_boxes"][0]
    assert 0 < box[2] <= 128 and 0 < box[3] <= box[2] + 1e-6

    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    b = batches[0]
    assert b["imgs"].shape == (2, 128, 128, 3)
    assert b["gt_boxes"].shape == (2, 8, 5)
    # sharding: 2 shards see disjoint samples
    l0 = BatchLoader(ds, 1, shard=0, num_shards=2)
    l1 = BatchLoader(ds, 1, shard=1, num_shards=2)
    p0 = {b["paths"][0] for b in l0}
    p1 = {b["paths"][0] for b in l1}
    assert not (p0 & p1)


def test_dataset_verify_drops_corrupt(tmp_path, rng):
    import cv2

    from s2anet_tpu.data.dota import DotaDataset

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "good.png"),
                rng.integers(0, 255, (32, 32, 3)).astype(np.uint8))
    (img_dir / "bad.png").write_bytes(b"not a png at all")
    ds = DotaDataset(img_dir, img_size=32, verify=True)
    assert len(ds) == 1
    ds2 = DotaDataset(img_dir, img_size=32, verify=False)
    assert len(ds2) == 2


# ----------------------------------------------------------------- flops
def test_flop_counter_closed_forms():
    """Analytic FLOP counter matches hand-computed conv/matmul/scan counts."""
    from s2anet_tpu.utils.flops import count_fn_flops

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    x = jnp.zeros((2, 16, 16, 8))
    w = jnp.zeros((3, 3, 8, 4))
    assert count_fn_flops(conv, x, w) == 2 * 2 * 16 * 16 * 4 * 9 * 8

    a, b = jnp.zeros((64, 128)), jnp.zeros((128, 32))
    assert count_fn_flops(lambda a, b: a @ b, a, b) == 2 * 64 * 128 * 32

    def scanned(m):
        out, _ = jax.lax.scan(lambda c, _: (c @ m, ()), m, (), length=5)
        return out

    m = jnp.zeros((16, 16))
    assert count_fn_flops(scanned, m) == 5 * 2 * 16**3


def test_flop_counter_dce_drops_dead_branches():
    """Unused compute (e.g. FAM cls at inference) must not inflate MFU."""
    from s2anet_tpu.utils.flops import count_fn_flops

    def f(a, b):
        dead = a @ b  # noqa: F841 — not returned
        return (a * 2.0).sum()

    a, b = jnp.zeros((32, 32)), jnp.zeros((32, 32))
    assert count_fn_flops(f, a, b) == 0
    assert count_fn_flops(f, a, b, dce=False) == 2 * 32**3


def test_flop_counter_strided_grouped_conv():
    from s2anet_tpu.utils.flops import count_fn_flops

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), "SAME", feature_group_count=4,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    x = jnp.zeros((1, 8, 8, 16))
    w = jnp.zeros((3, 3, 4, 8))  # 16 in / 4 groups = 4 per group
    # out 4x4x8; per output elem: 3*3*4 MACs
    assert count_fn_flops(conv, x, w) == 2 * 1 * 4 * 4 * 8 * 9 * 4


def test_count_flops_pallas_grid_multiplied():
    """pallas_call kernel FLOPs are multiplied by the grid size (the kernel
    body runs once per grid step); exact closed form for the hat fwd."""
    import jax.numpy as jnp

    from s2anet_tpu.ops.pallas.deform_kernel import (
        _geometry, deform_conv2d_hat,
    )
    from s2anet_tpu.utils.flops import count_fn_flops

    b, h, w, c, cout, k = 2, 24, 40, 8, 8, 3
    x = jnp.zeros((b, h, w, c), jnp.float32)
    off = jnp.zeros((b, h, w, 2 * k * k), jnp.float32)
    wgt = jnp.zeros((k, k, c, cout), jnp.float32)

    got = count_fn_flops(
        lambda x, wgt: deform_conv2d_hat(
            x, off, wgt, interpret=True, unconditional=True
        ),
        x, wgt,
    )
    th, tw, ty, tx, my, mx, wh, ww = _geometry(h, w, 8)
    p, wf, grid = th * tw, wh * ww, b * ty * tx
    # per grid step and tap: samples = hat[P,WF] @ window[WF,C], then
    # out += samples[P,C] @ W_t[C,COUT]
    expect = grid * k * k * (2 * p * wf * c + 2 * p * c * cout)
    assert got == expect

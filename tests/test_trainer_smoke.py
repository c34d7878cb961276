"""Trainer end-to-end smoke: files -> dataset -> train -> checkpoint -> val."""

import numpy as np
import pytest

from s2anet_tpu.utils.config import Config


def make_tiny_dataset(tmp_path, rng, n=4, size=128):
    import cv2

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    for i in range(n):
        img = rng.integers(0, 60, (size, size, 3)).astype(np.uint8)
        # paint a bright axis-aligned box
        img[40:60, 30:90] = 220
        cv2.imwrite(str(img_dir / f"im{i}.png"), img)
        (lbl_dir / f"im{i}.txt").write_text(
            "0 0.234 0.312 0.703 0.312 0.703 0.469 0.234 0.469\n"
        )
    return img_dir


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path, rng):
    img_dir = make_tiny_dataset(tmp_path, rng)

    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.num_classes = 2
    cfg.model.max_per_img = 50
    cfg.model.pre_nms_cap = 256
    cfg.model.max_before_nms_per_level = 100
    cfg.data.root = str(img_dir)
    cfg.data.train_list = str(img_dir)
    cfg.data.val_list = str(img_dir)
    cfg.data.img_size = 128
    cfg.data.max_gt = 8
    cfg.train.epochs = 1
    cfg.train.batch_size = 2
    cfg.train.warmup_iters = 0
    cfg.train.dtype = "float32"
    cfg.train.save_dir = str(tmp_path / "run")
    cfg.eval.batch_size = 2

    from s2anet_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    state = trainer.train()

    # checkpoints + logs written
    assert (tmp_path / "run" / "weights" / "last").exists()
    assert (tmp_path / "run" / "weights" / "deploy").exists()
    assert (tmp_path / "run" / "results.csv").exists()
    assert (tmp_path / "run" / "config.yaml").exists()

    # resume restores the step counter
    import jax

    from s2anet_tpu.train.checkpoint import load_checkpoint

    restored = load_checkpoint(
        tmp_path / "run" / "weights" / "last", jax.device_get(state)
    )
    assert int(restored.step) == int(jax.device_get(state.step)) == 2

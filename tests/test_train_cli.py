"""End-to-end CLI training test on a real (generated) file dataset: CSV trace
+ PNG wide images + map tiles -> windows -> train 2 epochs -> checkpoints."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest


def _make_file_dataset(root: Path, n=14, views=2, vh=16, vw=16):
    from PIL import Image

    (root / "rgb").mkdir(parents=True)
    (root / "map").mkdir(parents=True)
    rows = []
    ts = 1_700_000_000_000_000
    rng = np.random.default_rng(0)
    for i in range(n):
        rows.append([ts, 0, 500.0 + i, 400.0 + i, -10.0, 0.0, 0.0, 0.1 * i])
        wide = rng.uniform(0, 255, (vh, views * vw, 3)).astype(np.uint8)
        Image.fromarray(wide).save(root / "rgb" / f"{ts}.png")
        tile = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
        Image.fromarray(tile).save(root / "map" / f"{ts}.png")
        ts += 250_000
    np.savetxt(root / "gps.csv", np.asarray(rows, dtype=np.float64), delimiter=",")


@pytest.mark.slow
def test_cli_trains_on_file_dataset(tmp_path):
    from bevrender_tpu.config import Config, tiny_model_config
    from bevrender_tpu import train as train_mod

    root = tmp_path / "data"
    _make_file_dataset(root)

    cfg = Config()
    cfg.model = tiny_model_config(num_views=2)
    cfg.data.gps_file_path = str(root / "gps.csv")
    cfg.data.rgb_img_dir = str(root / "rgb")
    cfg.data.map_img_dir = str(root / "map")
    cfg.data.map_jgw_info = (1.0, 0.0, 0.0, -1.0, 0.0, 1000.0)
    cfg.data.map_width = 1200
    cfg.data.map_height = 1200
    cfg.data.window_timespin = 1.0  # seconds
    cfg.data.window_num_imgs = 2
    cfg.data.overlap = True  # sliding windows -> enough samples from 14 frames
    cfg.data.num_views = 2
    cfg.data.resize_img = True
    cfg.data.resize_img_height = 32
    cfg.data.resize_img_width = 64
    cfg.train.batch_size = 2
    cfg.train.total_epochs = 2
    cfg.train.k_fold = 2
    cfg.train.epoch_per_fold = 1
    cfg.train.loss_type = "MSE"
    cfg.train.ckpt_dir = str(tmp_path / "ckpt")

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(cfg.to_json())

    train_mod.main(["--config", str(cfg_path), "--epochs", "2"])

    runs = list((tmp_path / "ckpt").iterdir())
    assert runs, "no work dir created"
    work = runs[0]
    assert (work / "config.yaml").exists()
    assert (work / "last_epoch").exists() or list(work.glob("best_epoch_*"))

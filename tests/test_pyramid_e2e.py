"""Reference-default pyramid config (56 -> 28 -> 14 -> 7 -> 14 -> 28 -> 56,
encoder.py:23-38) end to end: init, forward, one train step. The flagship
uniform-28 config gets the bench coverage; this guards the pyramid path's
stage transitions (stride-2 convs / transpose convs) at full depth.
Scaled-down images keep the single-core CPU runtime tolerable.
"""

import numpy as np
import pytest
import jax

from bevrender_tpu.config import Config
from bevrender_tpu.data.dataset import SyntheticDataset
from bevrender_tpu.models.bevrender import BEVRenderModel
from bevrender_tpu.training.trainer import Trainer


@pytest.mark.slow
def test_default_pyramid_config_trains_one_step():
    cfg = Config()  # reference defaults: pyramid shapes, ResNet18
    # keep the 56->28->14->7->14->28->56 shape pyramid, heads, groups,
    # strides and kernels of encoder.py:23-38 but scale widths 4x down:
    # XLA-CPU compile of the 512-wide stages runs tens of minutes, and the
    # pyramid-specific code paths (stage transitions, odd-height stage-7 key
    # plane, per-stage img width fix) are width-independent.
    cfg.model.embed_dims = (16, 32, 64, 128, 64, 32, 16, 16)
    cfg.model.img_height = 64
    cfg.model.img_width = 64
    cfg.model.ori_img_height = 64
    cfg.model.ori_img_width = 64
    cfg.model.drop_path_rate = 0.0
    cfg.data.window_num_imgs = 1  # T=2 keeps the recurrence exercised
    cfg.train.batch_size = 1
    cfg.train.loss_type = "MSE"
    cfg.train.ckpt_dir = "/tmp/pyr_ckpt"

    model = BEVRenderModel(cfg)
    ds = SyntheticDataset(
        n_items=1, num_views=3, window_num_imgs=1,
        img_height=64, img_width=64, map_tile=224,
    )
    batch = {k: np.stack([ds[0][k]]) for k in ds[0]}
    trainer = Trainer(model, cfg, ds)
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    state, metrics, render = trainer._train_step(
        state, batch, jax.random.PRNGKey(1)
    )
    loss = float(metrics["train_batch_loss"])
    assert np.isfinite(loss)
    assert render.shape[0] == 1 and render.shape[-1] == 3
    print(f"pyramid train step OK: loss={loss:.4f} render={render.shape}")

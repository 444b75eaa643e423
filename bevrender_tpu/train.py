"""Training entry point — the rebuild of the reference's ``train.py`` main
path (train.py:733-888) plus the CLI the reference lacks (SURVEY section 1:
"no CLI/flag parser").

Flow parity with ``process_train``: config -> work dir + config snapshot ->
seeds -> model/optimizer/schedule -> dataset processing -> optional
train/inference split (saved to disk) -> Trainer.train. Multi-process spawn +
NCCL setup become ``jax.distributed.initialize`` + mesh construction; rank-0
gating becomes ``jax.process_index() == 0``.

Usage::

    python -m bevrender_tpu.train --synthetic --epochs 2      # smoke run
    python -m bevrender_tpu.train --config cfg.json           # real dataset
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import numpy as np


def build_dataset(config, logger):
    from bevrender_tpu.data.dataset import GPSDeniedDataset
    from bevrender_tpu.data.processor import DatasetProcessor

    dc = config.data
    processor = DatasetProcessor(
        gps_file_path=dc.gps_file_path,
        rgb_img_dir=dc.rgb_img_dir,
        map_img_dir=dc.map_img_dir,
        jgw_info=dc.map_jgw_info,
        map_width=dc.map_width,
        map_height=dc.map_height,
        window_timespin=dc.window_timespin * 1e6,  # s -> us (train.py:759)
        window_num_imgs=dc.window_num_imgs,
        overlap=dc.overlap,
        map_resize_scale=dc.map_resize_scale,
        dataset_dir=dc.dataset_dir,
        logger=logger,
    )
    windows = processor.process_windows()
    logger.info("overlapping: %s, dataset size: %d", dc.overlap, len(windows))
    return GPSDeniedDataset(
        windows,
        mode="train",
        data_augmentation=dc.augmentation,
        num_views=dc.num_views,
        window_num_imgs=dc.window_num_imgs,
        resize_cmr_img=dc.resize_img,
        resize_img_height=dc.resize_img_height,
        resize_img_width=dc.resize_img_width,
        img_norm_mean=dc.camera_norm_mean,
        img_norm_std=dc.camera_norm_std,
        map_norm_mean=dc.map_norm_mean,
        map_norm_std=dc.map_norm_std,
        seed=config.train.seed,
        logger=logger,
        raw_uint8=dc.on_device_preprocess,
        cache_mb=dc.frame_cache_mb,
        native_min_pixels=dc.native_min_pixels,
    )


def main(argv=None):
    from bevrender_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from bevrender_tpu.config import Config, flagship_config, tiny_model_config
    from bevrender_tpu.data.dataset import SyntheticDataset
    from bevrender_tpu.data.prefetch import collate
    from bevrender_tpu.models.bevrender import BEVRenderModel
    from bevrender_tpu.parallel.mesh import initialize_distributed, make_mesh
    from bevrender_tpu.training.metrics import get_logger
    from bevrender_tpu.training.trainer import Trainer

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", help="JSON config (Config.to_json format)")
    ap.add_argument("--synthetic", action="store_true",
                    help="train on synthetic data (smoke/benchmark)")
    ap.add_argument("--tiny", action="store_true", help="tiny model config")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--restore", help="checkpoint path to resume from")
    ap.add_argument("--distributed", action="store_true")
    ap.add_argument(
        "--steps-per-dispatch", type=int, default=None, metavar="K",
        help="run K train steps per device dispatch (lax.scan over K stacked "
             "batches); amortizes per-step dispatch/copy cost — see "
             "TrainConfig.steps_per_dispatch",
    )
    args = ap.parse_args(argv)

    logger = get_logger()
    if args.config:
        config = Config.from_json(Path(args.config).read_text())
    elif args.tiny:
        config = Config()
        config.model = tiny_model_config()
        config.data.window_num_imgs = 2
    else:
        config = flagship_config()
    if args.epochs:
        config.train.total_epochs = args.epochs
    if args.steps_per_dispatch:
        config.train.steps_per_dispatch = args.steps_per_dispatch

    if args.distributed or config.train.distributed:
        initialize_distributed()
        config.train.distributed = True

    # work dir + config snapshot (train.py:847-849, utils/utils.py:88-96)
    work_dir = Path(config.train.ckpt_dir) / str(int(time.time()))
    work_dir.mkdir(parents=True, exist_ok=True)
    config.train.work_dir = str(work_dir)
    config.save_config_given_dir(str(work_dir))
    logger.info("Working directory: %s", work_dir)
    logger.info("Loss type: %s", config.train.loss_type)

    np.random.seed(config.train.seed)  # train.py:852-853
    rng = jax.random.PRNGKey(config.train.seed)

    if args.synthetic or args.tiny:
        m = config.model
        dataset = SyntheticDataset(
            n_items=max(4 * config.train.batch_size, 16),
            num_views=m.num_views,
            window_num_imgs=config.data.window_num_imgs,
            img_height=m.img_height,
            img_width=m.img_width,
            map_tile=(
                224 if m.bev_shapes[-1] in (14, 28, 56) else m.bev_shapes[-1] * 4
            ),
        )
    else:
        dataset = build_dataset(config, logger)

    # optional inference split (train.py:784-806)
    inf_indices = None
    if config.train.split_inf_set:
        from sklearn.model_selection import train_test_split

        idx = np.arange(len(dataset))
        train_idx, inf_indices = train_test_split(
            idx, test_size=config.train.inf_set_ratio,
            random_state=config.train.seed,
        )
        if jax.process_index() == 0:
            np.save(work_dir / "inference_indices.npy", inf_indices)
        dataset = _Subset(dataset, train_idx)

    mesh = make_mesh() if config.train.distributed else None
    model = BEVRenderModel(config)
    trainer = Trainer(model, config, dataset, logger=logger, mesh=mesh)

    sample = collate([dataset[i] for i in range(config.train.batch_size)])
    state = trainer.create_state(rng, sample)
    logger.info("model parameters : %.2fM",
                model.param_count({"params": state.params}) / 1e6)
    if args.restore:
        state = trainer.restore_checkpoint(state, args.restore)
        logger.info("restored from %s", args.restore)

    state = trainer.train(state)
    return state


class _Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]


if __name__ == "__main__":
    main()

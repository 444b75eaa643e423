"""Prove the Trainer host loop keeps the chip busy (de-synced logging).

Round-2 verdict: `float()`-ing every metric each step serialized host and
device, defeating `device_prefetch`'s overlap. Round 3 accumulates the loss
on device and syncs only every `log_every_steps`. This script measures, on
the TPU, the same jitted train step driven two ways:

  A. raw `lax.fori_loop` (no host involvement — the device ceiling),
  B. the real `Trainer._run_epoch` loop (DataLoader threads ->
     device_prefetch -> per-step dispatch + cadenced logging),

and reports the overhead of B over A. Pass: within ~10%.

Run:  python scripts/trainer_overlap_bench.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

from bevrender_tpu.utils import enable_compilation_cache


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    from scripts.recall_demo import make_config
    from bevrender_tpu.data.dataset import SyntheticGeoDataset
    from bevrender_tpu.data.prefetch import collate
    from bevrender_tpu.models.bevrender import BEVRenderModel
    from bevrender_tpu.training.trainer import Trainer

    bs = 16
    n_steps = 50
    cfg = make_config("mid", bs)  # same shapes as the recall demo: cached
    cfg.train.save_ckpt = False
    cfg.train.apply_validation = False
    cfg.train.k_fold = 50  # train split ~= (1 - 1/50) of the data
    cfg.train.epoch_per_fold = 1
    cfg.train.log_every_steps = 10
    n_items = bs * n_steps * 50 // 49 + bs  # >= n_steps train batches
    ds = SyntheticGeoDataset(
        n_items=n_items, num_views=2, window_num_imgs=1,
        img_height=64, img_width=64, map_tile=64, world=4096, noise=0.02,
        seed=0,
    )
    model = BEVRenderModel(cfg)
    trainer = Trainer(model, cfg, ds)
    batch = collate([ds[i] for i in range(bs)])
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # --- A: device ceiling (raw fori_loop over the same jitted step) ---
    @jax.jit
    def train_loop(state, batch, n):
        def body(i, st):
            b = dict(batch)
            b["camera"] = batch["camera"] + i.astype(batch["camera"].dtype) * 1e-9
            st, _, _ = trainer._train_step_impl(
                st, b, jax.random.fold_in(jax.random.PRNGKey(2), i)
            )
            return st
        st = jax.lax.fori_loop(0, n, body, state)
        return jnp.sum(jax.tree_util.tree_leaves(st.params)[0].ravel()[:1])

    def timed(n):
        t0 = time.perf_counter()
        float(train_loop(state, dev_batch, jnp.int32(n)))
        return time.perf_counter() - t0

    timed(1)
    t1, t2 = timed(5), timed(5 + n_steps)
    raw_ms = (t2 - t1) / n_steps * 1e3

    # --- B: the real Trainer epoch loop (fresh state, same step count) ---
    state_b = trainer.create_state(jax.random.PRNGKey(0), batch)
    # warm the epoch-path compiles (jitted _train_step with donation)
    warm_iter = iter([{k: np.asarray(v) for k, v in batch.items()}])
    from bevrender_tpu.data.prefetch import device_prefetch

    wb = next(device_prefetch(warm_iter))
    state_b, _, _ = trainer._train_step(state_b, wb, jax.random.PRNGKey(3))

    t0 = time.perf_counter()
    state_b = trainer.train(state_b, apply_validation=False, max_epochs=2)
    jax.block_until_ready(jax.tree_util.tree_leaves(state_b.params)[0])
    wall = time.perf_counter() - t0
    steps_done = int(state_b.step) - 1  # minus the warm step
    loop_ms = wall / max(steps_done, 1) * 1e3

    out = {
        "raw_fori_loop_ms_per_step": round(raw_ms, 2),
        "trainer_loop_ms_per_step": round(loop_ms, 2),
        "trainer_loop_steps": steps_done,
        "overhead_pct": round((loop_ms / raw_ms - 1.0) * 100.0, 1),
        "log_every_steps": cfg.train.log_every_steps,
    }
    print(json.dumps(out), flush=True)
    path = ROOT / "TRAINER_OVERLAP.json"
    path.write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

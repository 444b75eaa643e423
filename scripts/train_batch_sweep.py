"""Train-throughput batch-size sweep on the real chip.

bench.py's train headline fixes B=2 (the reference train regime,
train.py:680 batch semantics — kept so ``train_vs_baseline`` compares like
for like against the measured torch-CPU step). But B=2 underfills the chip:
the batch dimension multiplies every kernel grid, so a larger batch can
raise train frames/sec/chip materially. This sweep times the identical
jitted train step (fwd + bwd + AdamW, MSE_CONTRASTIVE, T=2) inside a
``lax.fori_loop`` with the same device-side differenced timing bench.py
uses, at several batch sizes, and writes TRAIN_BATCH_SWEEP.json.

Usage: python scripts/train_batch_sweep.py [--batches 2,4,8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def measure(batch_size: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bevrender_tpu.config import flagship_config
    from bevrender_tpu.data.dataset import SyntheticDataset
    from bevrender_tpu.models.bevrender import BEVRenderModel
    from bevrender_tpu.training.trainer import Trainer

    cfg = flagship_config()
    cfg.model.dtype = "bfloat16"
    cfg.data.window_num_imgs = 1  # T=2
    cfg.train.batch_size = batch_size
    cfg.train.loss_type = "MSE_CONTRASTIVE"
    cfg.train.use_wandb = False
    cfg.train.ckpt_dir = "/tmp/bench_ckpt"
    model = BEVRenderModel(cfg)
    ds = SyntheticDataset(
        n_items=batch_size, num_views=cfg.model.num_views, window_num_imgs=1,
        img_height=224, img_width=224, map_tile=224,
    )
    batch = {k: np.stack([ds[i][k] for i in range(batch_size)]) for k in ds[0]}
    trainer = Trainer(model, cfg, ds)
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}

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
        return st.step, jnp.sum(jax.tree_util.tree_leaves(st.params)[0].ravel()[:1])

    def timed(n):
        t0 = time.perf_counter()
        _, leaf = train_loop(state, dev_batch, jnp.int32(n))
        float(leaf)
        return time.perf_counter() - t0

    t_warm0 = time.perf_counter()
    timed(1)
    warm_s = time.perf_counter() - t_warm0
    t1 = min(timed(2) for _ in range(2))
    t2 = min(timed(8) for _ in range(2))
    ms = (t2 - t1) / 6 * 1e3
    return {
        "batch_size": batch_size,
        "train_ms_per_step": round(ms, 2),
        "train_frames_per_sec": round(batch_size / (ms / 1e3), 3),
        "compile_or_warm_s": round(warm_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2,4,8")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _apply_kernel_ab_defaults

    choices = _apply_kernel_ab_defaults()  # same kernel variants as headline
    out = {"runs": [], "kernel_autotune": choices or None,
           "note": "flagship uniform-28 bf16, T=2, 3 views, MSE_CONTRASTIVE; "
           "jitted train step (fwd+bwd+AdamW) in lax.fori_loop, device-side "
           "differenced timing (bench.py methodology); bench.py's headline "
           "stays B=2 for torch-CPU regime parity"}
    for b in [int(x) for x in args.batches.split(",")]:
        r = measure(b)
        print(json.dumps(r), flush=True)
        out["runs"].append(r)
    best = max(out["runs"], key=lambda r: r["train_frames_per_sec"])
    out["best_batch"] = best["batch_size"]
    out["best_train_frames_per_sec"] = best["train_frames_per_sec"]
    (ROOT / "TRAIN_BATCH_SWEEP.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()

"""Prove the Trainer host loop keeps the chip busy (de-synced logging).

Round-2 verdict: `float()`-ing every metric each step serialized host and
device, defeating `device_prefetch`'s overlap. Round 3 removes every
per-step host<->device interaction from the loop body: the loss accumulates
as unfetched device scalars (one sum at epoch end), the dropout stream is
derived inside the jitted step from `state.step` (no eager `random.split`
per step), and `device_prefetch` runs its `device_put`s in a feeder thread
so blocking copies overlap the previous step's compute. This script
measures, on the TPU, the same jitted train step driven two ways:

  A. raw `lax.fori_loop` over a RESIDENT batch (no host involvement — the
     device ceiling),
  B. `Trainer.train` end to end, 2 epochs (DataLoader threads ->
     device_prefetch -> per-step dispatch + cadenced logging), with the
     uint8 + on-device-cast input path (the f32 path ships 4x the bytes).

Pass: within ~10% on a directly-attached TPU. On THIS platform the chip
hangs off a remote RPC tunnel, which adds per-step costs a PCIe host does
not have: ~10 ms of dispatch RPC latency per step (measured: 5 back-to-back
dispatches of this step take 52 ms host-side) and a per-batch copy whose
RPC cost is context-dependent (1-43 ms for the same 0.98 MB batch,
measured; `batch_transfer_u8_ms` records the in-context value, and
`overhead_excl_transfer_pct` is the loop's own overhead net of it).
History: round-2 loop 97% overhead -> 233% after honest 50-step
measurement -> 47.7% (17.1% net of transfer) with the fixes above,
100 steps; in-epoch inter-step host gap p50 is 16 ms.

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


def _png_dataset(n_items: int, bs: int, cache_mb: int = 256):
    """On-disk PNG+CSV trace -> GPSDeniedDataset at the mid-config shapes
    (2 views of 64x64, T=2, 64px map tiles). Source frames are written at
    2x the target size so the loader really resizes (the native fused
    resize+split+normalize path, csrc/preprocess.cc)."""
    import tempfile

    from PIL import Image

    from bevrender_tpu.data.dataset import GPSDeniedDataset
    from bevrender_tpu.data.processor import DatasetProcessor

    root = Path(tempfile.mkdtemp(prefix="overlap_png_"))
    (root / "rgb").mkdir()
    (root / "map").mkdir()
    rng = np.random.default_rng(0)
    rows = []
    ts = 1_700_000_000_000_000
    n_frames = n_items + 2
    for i in range(n_frames):
        rows.append([ts, 0, 500.0 + 0.1 * i, 400.0 + 0.1 * i, -10.0, 0.0,
                     0.0, 0.0])
        wide = rng.integers(0, 256, (128, 2 * 128, 3), dtype=np.uint8)
        Image.fromarray(wide).save(root / "rgb" / f"{ts}.png")
        tile = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(tile).save(root / "map" / f"{ts}.png")
        ts += 250_000
    np.savetxt(root / "gps.csv", np.asarray(rows, np.float64), delimiter=",")
    proc = DatasetProcessor(
        gps_file_path=str(root / "gps.csv"),
        rgb_img_dir=str(root / "rgb"),
        map_img_dir=str(root / "map"),
        jgw_info=(1.0, 0.0, 0.0, -1.0, 0.0, 1000.0),
        map_width=1200, map_height=1200,
        window_timespin=1.0 * 1e6,
        window_num_imgs=1,
        overlap=True,
    )
    windows = proc.process_windows()
    assert len(windows) >= n_items, (len(windows), n_items)
    return GPSDeniedDataset(
        windows, mode="train", data_augmentation="none", num_views=2,
        window_num_imgs=1, resize_cmr_img=True, resize_img_height=64,
        resize_img_width=128, map_tile=64, seed=0, cache_mb=cache_mb,
    )


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    from scripts.recall_demo import make_config
    from bevrender_tpu.data.dataset import SyntheticGeoDataset
    from bevrender_tpu.data.prefetch import collate
    from bevrender_tpu.models.bevrender import BEVRenderModel
    from bevrender_tpu.training.trainer import Trainer

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--steps-per-dispatch", type=int, default=1,
        help="k>1 measures the grouped-dispatch Trainer path "
             "(TrainConfig.steps_per_dispatch): k scanned steps per RPC",
    )
    ap.add_argument(
        "--dataset", choices=("synthetic", "png"), default="synthetic",
        help="'png' drives real GPSDeniedDataset.__getitem__ batches from "
             "an on-disk PNG+CSV trace (decode + native fused "
             "resize/split/normalize in the loader threads) — measured "
             "twice, with the native C++ host preprocess and with the "
             "PIL fallback (BEV_NATIVE=0), so the 'residual overhead is "
             "host batch generation' claim becomes a measurement "
             "(VERDICT r3 item 7)",
    )
    args = ap.parse_args()

    bs = 16
    n_steps = 50 if args.dataset == "synthetic" else 30
    cfg = make_config("mid", bs)  # same shapes as the recall demo: cached
    cfg.train.steps_per_dispatch = args.steps_per_dispatch
    cfg.train.save_ckpt = False
    cfg.train.apply_validation = False
    cfg.train.k_fold = 50  # train split ~= (1 - 1/50) of the data
    cfg.train.epoch_per_fold = 1
    cfg.train.log_every_steps = 10
    cfg.data.on_device_preprocess = "cast"  # uint8 transfer, cast on device
    n_items = bs * n_steps * 50 // 49 + bs  # >= n_steps train batches
    if args.dataset == "png":
        ds = _png_dataset(n_items, bs)
        cfg.data.on_device_preprocess = False  # f32 from the host pipeline
    else:
        ds = SyntheticGeoDataset(
            n_items=n_items, num_views=2, window_num_imgs=1,
            img_height=64, img_width=64, map_tile=64, world=4096, noise=0.02,
            seed=0, raw_uint8=True,
        )
    model = BEVRenderModel(cfg)
    trainer = Trainer(model, cfg, ds)
    batch_u8 = collate([ds[i] for i in range(bs)])
    if args.dataset == "png":
        # GPSDeniedDataset emits normalized f32 already
        batch = batch_u8
    else:
        # float twin of the batch for state creation and the resident raw loop
        batch = dict(batch_u8)
        for k in ("camera", "map"):
            batch[k] = batch_u8[k].astype(np.float32) / 255.0
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
    t1 = min(timed(5) for _ in range(2))
    t2 = min(timed(5 + n_steps) for _ in range(2))
    raw_ms = (t2 - t1) / n_steps * 1e3

    # --- host->device transfer cost of one batch (u8 vs f32) ---
    def transfer_ms(b, reps=10):
        ts = []
        for r in range(reps):
            fresh = {
                k: (v + np.asarray(r % 3, v.dtype)) if v.dtype != np.uint8
                else v ^ np.uint8(r % 3)  # defeat transfer caching
                for k, v in b.items()
            }
            t0 = time.perf_counter()
            put = {k: jax.device_put(v) for k, v in fresh.items()}
            jax.block_until_ready(put)
            ts.append(time.perf_counter() - t0)
        # first put of a new shape-set pays one-time executable warmup;
        # min over the rest is the steady-state copy cost
        return min(ts[1:]) * 1e3

    u8_ms = transfer_ms(batch_u8)
    f32_ms = transfer_ms(batch)
    mb_u8 = sum(v.nbytes for v in batch_u8.values()) / 1e6
    mb_f32 = sum(v.nbytes for v in batch.values()) / 1e6

    # --- B: the real Trainer epoch loop (fresh state, 2 epochs to amortize
    # the per-epoch startup: loader-thread spin-up + feeder warmup) ---
    import sklearn.model_selection  # noqa: F401 — train() imports it lazily;
    # on this 1-core host the cold import costs ~10 s and is NOT loop overhead

    def timed_trainer_loop():
        state_b = trainer.create_state(jax.random.PRNGKey(0), batch)
        # warm the epoch-path compiles (jitted _train_step, donation + cast)
        from bevrender_tpu.data.prefetch import device_prefetch

        warm_iter = iter([{k: np.asarray(v) for k, v in batch_u8.items()}])
        wb = next(device_prefetch(warm_iter, preprocess=trainer.preprocess))
        state_b, _, _ = trainer._train_step(state_b, wb, jax.random.PRNGKey(3))

        if cfg.train.steps_per_dispatch > 1:
            # the grouped path compiles its own scanned executables (one per
            # distinct group size, incl. the trailing partial group); run one
            # untimed epoch so the timed window measures steady state, exactly
            # like the k=1 path whose single-step executable is warmed above
            state_b = trainer.train(
                state_b, apply_validation=False, max_epochs=2
            )
            jax.block_until_ready(
                jax.tree_util.tree_leaves(state_b.params)[0]
            )

        warm_steps = int(state_b.step)
        t0 = time.perf_counter()
        state_b = trainer.train(state_b, apply_validation=False, max_epochs=3)
        jax.block_until_ready(jax.tree_util.tree_leaves(state_b.params)[0])
        wall = time.perf_counter() - t0
        steps_done = int(state_b.step) - warm_steps
        return wall / max(steps_done, 1) * 1e3, steps_done

    import os

    native_loop = None
    if args.dataset == "png":
        from bevrender_tpu.data import native as native_mod

        assert native_mod.available(), "native preprocess failed to build"
        # Three arms over the SAME on-disk trace (round 5):
        #   1. cache ON + native decode (production default: repeat decodes
        #      eliminated by the decoded-frame LRU, data/dataset.py)
        #   2. cache OFF + native decode (prices libpng decode alone)
        #   3. cache OFF + PIL decode  (the round-4 decode-bound baseline)
        loop_ms, steps_done = timed_trainer_loop()   # arm 1 (ds has cache)
        native_loop = loop_ms
        cache = ds.cache
        ds_nocache = _png_dataset(n_items, bs, cache_mb=0)
        trainer.dataset = ds_nocache
        nocache_native_loop, _ = timed_trainer_loop()  # arm 2
        os.environ["BEV_NATIVE"] = "0"
        try:
            pil_loop, _ = timed_trainer_loop()       # arm 3
        finally:
            del os.environ["BEV_NATIVE"]
    else:
        loop_ms, steps_done = timed_trainer_loop()

    out = {
        "raw_fori_loop_ms_per_step": round(raw_ms, 2),
        "trainer_loop_ms_per_step": round(loop_ms, 2),
        "trainer_loop_steps": steps_done,
        "overhead_pct": round((loop_ms / raw_ms - 1.0) * 100.0, 1),
        "batch_transfer_u8_ms": round(u8_ms, 2),
        "batch_transfer_f32_ms": round(f32_ms, 2),
        "batch_mb_u8": round(mb_u8, 2),
        "batch_mb_f32": round(mb_f32, 2),
        "overhead_excl_transfer_pct": round(
            ((loop_ms - u8_ms) / raw_ms - 1.0) * 100.0, 1
        ),
        "log_every_steps": cfg.train.log_every_steps,
        "steps_per_dispatch": cfg.train.steps_per_dispatch,
        "note": (
            "tunnel-attached TPU: the per-step uint8 batch copy crosses a "
            "remote RPC link; on PCIe-attached hosts it is DMA'd and "
            "overlapped, so overhead_excl_transfer_pct is the loop's own "
            "cost"
        ),
    }
    if args.dataset == "png":
        out["dataset"] = (
            "on-disk PNG+CSV trace via GPSDeniedDataset (real decode + "
            "resize + view-split + normalize in the loader threads)"
        )
        out["trainer_loop_ms_cached_native"] = round(native_loop, 2)
        out["trainer_loop_ms_nocache_native"] = round(nocache_native_loop, 2)
        out["trainer_loop_ms_nocache_pil"] = round(pil_loop, 2)
        out["overhead_pct_cached_native"] = round(
            (native_loop / raw_ms - 1.0) * 100.0, 1
        )
        out["overhead_pct_nocache_native"] = round(
            (nocache_native_loop / raw_ms - 1.0) * 100.0, 1
        )
        out["overhead_pct_nocache_pil"] = round(
            (pil_loop / raw_ms - 1.0) * 100.0, 1
        )
        out["cache_hits"] = cache.hits
        out["cache_misses"] = cache.misses
        out["cache_vs_pil_loop_speedup"] = round(pil_loop / native_loop, 3)
    print(json.dumps(out), flush=True)
    suffix = "_png" if args.dataset == "png" else ""
    if cfg.train.steps_per_dispatch > 1:
        # grouped-dispatch variant (--steps-per-dispatch k): recorded as a
        # sibling artifact so the k=1 baseline stays comparable across rounds
        path = ROOT / (
            f"TRAINER_OVERLAP_k{cfg.train.steps_per_dispatch}{suffix}.json"
        )
    else:
        path = ROOT / f"TRAINER_OVERLAP{suffix}.json"
    path.write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

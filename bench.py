"""Benchmark: end-to-end render+register + train-step throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N,
   "eval_ms_per_batch": ..., "train_ms_per_step": ..., "mfu": ...,
   "runs_ms": [...], ...}

Measured flows (north-star loop, BASELINE.json):
  eval:  surround-camera window -> BEVRender forward (recurrent history +
         encoder + render decoder) -> L2-normalized embedding -> correlation
         against a resident aerial-tile database -> argmin.
  train: jitted Trainer train step (forward + backward + AdamW update),
         MSE_CONTRASTIVE losses, B=2 T=2 (reference train regime).

Timing methodology (important on this platform): host-side
``block_until_ready`` loops are unreliable through the remote-TPU tunnel
(repeated identical dispatches can be elided), so each measurement runs the
step inside a jitted ``lax.fori_loop`` whose body perturbs the input by the
iteration index (preventing loop-invariant hoisting), fetches one scalar, and
reports (t(n2) - t(n1)) / (n2 - n1) so fixed sync costs cancel. Multiple runs
give min/mean.

MFU = analytic forward FLOPs (XLA cost analysis) / measured time / peak.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

PEAK_BF16_TFLOPS = 197.0  # TPU v5e


def _torch_baseline_fps() -> float:
    cache = ROOT / "BASELINE_MEASURED.json"
    if cache.exists():
        return json.loads(cache.read_text())["torch_cpu_render_register_fps"]
    proc = subprocess.run(
        [sys.executable, str(ROOT / "baselines" / "torch_cpu_baseline.py"),
         "--frames", "3"],
        capture_output=True, text=True, timeout=3600,
    )
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        return float("nan")
    return json.loads(cache.read_text())["torch_cpu_render_register_fps"]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from bevrender_tpu.config import flagship_config
    from bevrender_tpu.data.dataset import SyntheticDataset
    from bevrender_tpu.models.bevrender import BEVRenderModel
    from bevrender_tpu.training.trainer import Trainer

    batch_size = 4
    n_tiles = 64
    cfg = flagship_config()
    cfg.model.dtype = "bfloat16"  # bf16 compute path (params stay f32)
    cfg.data.window_num_imgs = 1  # T=2, matching the torch baseline
    cfg.train.batch_size = batch_size

    model = BEVRenderModel(cfg)
    ds = SyntheticDataset(
        n_items=batch_size, num_views=cfg.model.num_views,
        window_num_imgs=cfg.data.window_num_imgs,
        img_height=cfg.model.img_height, img_width=cfg.model.img_width,
        map_tile=224,
    )
    batch = {k: np.stack([ds[i][k] for i in range(batch_size)]) for k in ds[0]}
    variables = model.init(jax.random.PRNGKey(0), batch)

    tiles = jax.random.normal(jax.random.PRNGKey(1), (n_tiles, 3 * 224 * 224))
    tiles = tiles / jnp.linalg.norm(tiles, axis=-1, keepdims=True)

    camera = jnp.asarray(batch["camera"])
    pose = jnp.asarray(batch["vehicle_pose"])
    vtype = jnp.asarray(batch["vehicle_type"])

    def render_register(variables, camera, pose, vtype, tiles):
        out = model.apply(variables, camera, pose, vtype, train=False)
        emb = out.reshape(out.shape[0], -1)
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
        )
        dist = 2.0 - 2.0 * emb @ tiles.T
        return jnp.argmin(dist, axis=-1)

    @jax.jit
    def eval_loop(variables, camera, pose, vtype, tiles, n):
        def body(i, acc):
            cam = camera + i.astype(camera.dtype) * 1e-9
            idx = render_register(variables, cam, pose, vtype, tiles)
            return acc + idx[0].astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        t0 = time.perf_counter()
        float(eval_loop(variables, camera, pose, vtype, tiles, jnp.int32(n)))
        return time.perf_counter() - t0

    timed(1)  # compile + warm
    runs = []
    N1, N2 = 2, 10  # 3 runs x 8 counted iters = 24 timed iterations
    for _ in range(3):
        t1 = timed(N1)
        t2 = timed(N2)
        runs.append((t2 - t1) / (N2 - N1))
    eval_ms = min(runs) * 1e3
    fps = batch_size / (eval_ms / 1e3)

    # forward FLOPs for MFU (XLA cost analysis of the un-looped step)
    mfu = None
    try:
        lowered = jax.jit(render_register).lower(
            variables, camera, pose, vtype, tiles
        )
        ca = lowered.cost_analysis()  # pre-compile host analysis
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            mfu = flops / (eval_ms / 1e3) / (PEAK_BF16_TFLOPS * 1e12)
    except Exception:
        pass

    baseline = _torch_baseline_fps()
    vs = fps / baseline if baseline == baseline and baseline > 0 else None

    def result_json(train_ms):
        return {
            "metric": (
                "BEV render+register throughput "
                "(flagship uniform-28 bf16, B=4, T=2, 3 views)"
            ),
            "value": round(fps, 3),
            "unit": "frames/sec/chip",
            "vs_baseline": round(vs, 2) if vs else None,
            "eval_ms_per_batch": round(eval_ms, 2),
            "eval_runs_ms": [round(r * 1e3, 2) for r in runs],
            "train_ms_per_step": round(train_ms, 2) if train_ms else None,
            "train_frames_per_sec": (
                round(2 / (train_ms / 1e3), 3) if train_ms else None
            ),
            "mfu": round(mfu, 5) if mfu else None,
            "baseline_fps": (
                round(baseline, 5) if baseline == baseline else None
            ),
        }

    # emit the eval-only line immediately so a hung/failed train compile
    # cannot zero the whole bench; the final line re-emits with train fields
    print(json.dumps(result_json(None)), flush=True)

    # ---- training step (B=2, T=2, MSE_CONTRASTIVE) ----
    train_ms = None
    try:
        tcfg = flagship_config()
        tcfg.model.dtype = "bfloat16"
        tcfg.data.window_num_imgs = 1
        tcfg.train.batch_size = 2
        tcfg.train.loss_type = "MSE_CONTRASTIVE"
        tcfg.train.use_wandb = False
        tcfg.train.ckpt_dir = "/tmp/bench_ckpt"
        tmodel = BEVRenderModel(tcfg)
        tds = SyntheticDataset(
            n_items=2, num_views=tcfg.model.num_views, window_num_imgs=1,
            img_height=224, img_width=224, map_tile=224,
        )
        tbatch = {k: np.stack([tds[i][k] for i in range(2)]) for k in tds[0]}
        trainer = Trainer(tmodel, tcfg, tds)
        state = trainer.create_state(jax.random.PRNGKey(0), tbatch)
        dev_batch = {k: jnp.asarray(v) for k, v in tbatch.items()}

        @jax.jit
        def train_loop(state, batch, n):
            def body(i, st):
                b = dict(batch)
                b["camera"] = batch["camera"] + i.astype(
                    batch["camera"].dtype
                ) * 1e-9
                st, _, _ = trainer._train_step_impl(
                    st, b, jax.random.fold_in(jax.random.PRNGKey(2), i)
                )
                return st
            st = jax.lax.fori_loop(0, n, body, state)
            return st.step, jnp.sum(
                jax.tree_util.tree_leaves(st.params)[0].ravel()[:1]
            )

        def ttimed(n):
            t0 = time.perf_counter()
            s, leaf = train_loop(state, dev_batch, jnp.int32(n))
            float(leaf)
            return time.perf_counter() - t0

        ttimed(1)
        tr_runs = []
        for _ in range(2):
            t1 = ttimed(2)
            t2 = ttimed(8)
            tr_runs.append((t2 - t1) / 6)
        train_ms = min(tr_runs) * 1e3
    except Exception as e:  # pragma: no cover - keep the headline alive
        print(f"train-step bench failed: {e!r}", file=sys.stderr)

    print(json.dumps(result_json(train_ms)), flush=True)


if __name__ == "__main__":
    main()

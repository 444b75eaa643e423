"""Benchmark: end-to-end render+register throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

The measured flow is the north-star loop (BASELINE.json): surround-camera
window -> BEVRender forward (recurrent history + encoder + render decoder) ->
L2-normalized embedding -> correlation against a resident aerial-tile database
-> argmin. Baseline = the same architecture/strategy in PyTorch on CPU
(baselines/torch_cpu_baseline.py), measured once and cached in
BASELINE_MEASURED.json.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))


def _torch_baseline_fps() -> float:
    cache = ROOT / "BASELINE_MEASURED.json"
    if cache.exists():
        return json.loads(cache.read_text())["torch_cpu_render_register_fps"]
    proc = subprocess.run(
        [sys.executable, str(ROOT / "baselines" / "torch_cpu_baseline.py"),
         "--frames", "1"],
        capture_output=True, text=True, timeout=3600,
    )
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        return float("nan")
    return json.loads(cache.read_text())["torch_cpu_render_register_fps"]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bevrender_tpu.config import flagship_config
    from bevrender_tpu.data.dataset import SyntheticDataset
    from bevrender_tpu.models.bevrender import BEVRenderModel

    batch_size = 4
    n_tiles = 64
    cfg = flagship_config()
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

    @jax.jit
    def render_register(variables, camera, pose, vtype, tiles):
        out = model.apply(variables, camera, pose, vtype, train=False)
        emb = out.reshape(out.shape[0], -1)
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        dist = 2.0 - 2.0 * emb @ tiles.T
        return jnp.argmin(dist, axis=-1)

    args = (variables, batch["camera"], batch["vehicle_pose"],
            batch["vehicle_type"], tiles)
    # compile + warmup
    render_register(*args)[0].block_until_ready()

    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        idx = render_register(*args)
    idx.block_until_ready()
    dt = time.perf_counter() - t0
    fps = n_iters * batch_size / dt

    baseline = _torch_baseline_fps()
    vs = fps / baseline if baseline == baseline and baseline > 0 else None
    print(json.dumps({
        "metric": "BEV render+register throughput (flagship uniform-28, B=4, T=2, 3 views)",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()

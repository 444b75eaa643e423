"""Streaming-serving throughput: carried-BEV encode_step + decode per frame.

The reference recomputes the whole T-frame history window for every sample
(its training data is shuffled windows, /root/reference/bevrender.py:124-134),
so its per-frame inference cost includes T-1 redundant encoder passes. A
deployed stream has ordered frames: BEVRenderNet.encode_step carries the BEV
state across frames and runs ONE encoder pass + decode + register per new
frame (bevrender_tpu/inference/register.py:make_streaming_step).

This measures that serving loop on the real chip with the carried-state
dependency chain intact (the fori_loop threads the BEV through iterations,
so no cross-iteration elision is possible) and writes STREAMING_BENCH.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import _apply_kernel_ab_defaults
from bevrender_tpu.config import flagship_config
from bevrender_tpu.data.dataset import SyntheticDataset
from bevrender_tpu.inference.register import RegistrationPipeline
from bevrender_tpu.models.bevrender import BEVRenderModel


def main() -> None:
    # serving should run the measured-best kernel variants, same as the
    # headline bench (trace-time env knobs; must be set before model build)
    kernel_choices = _apply_kernel_ab_defaults()
    B = 4
    n_tiles = 64
    cfg = flagship_config()
    cfg.model.dtype = "bfloat16"
    cfg.data.window_num_imgs = 1
    cfg.train.batch_size = B

    model = BEVRenderModel(cfg)
    ds = SyntheticDataset(
        n_items=B, num_views=cfg.model.num_views,
        window_num_imgs=cfg.data.window_num_imgs,
        img_height=cfg.model.img_height, img_width=cfg.model.img_width,
        map_tile=224,
    )
    batch = {k: np.stack([ds[i][k] for i in range(B)]) for k in ds[0]}
    variables = model.init(jax.random.PRNGKey(0), batch)

    pipe = RegistrationPipeline(cfg, variables)
    step = pipe.make_streaming_step()

    tiles = jax.random.normal(jax.random.PRNGKey(1), (n_tiles, 3 * 224 * 224))
    tiles = tiles / jnp.linalg.norm(tiles, axis=-1, keepdims=True)

    camera = jnp.asarray(batch["camera"])
    frame = camera[:, -1]  # (B, V, H, W, 3) current surround frame
    pose_pair = jnp.asarray(batch["vehicle_pose"])[:, -2:]
    vtype = jnp.asarray(batch["vehicle_type"])
    H0 = cfg.model.bev_shapes[0]
    C0 = cfg.model.embed_dims[0]
    bev0 = jnp.zeros((B, H0, H0, C0), camera.dtype)

    @jax.jit
    def stream_loop(variables, frame, bev0, pose_pair, vtype, tiles, n):
        def body(i, carry):
            bev, acc = carry
            f = frame * (1.0 + i.astype(jnp.float32) * 1e-9).astype(frame.dtype)
            bev, _, idx = step(variables, f, bev, pose_pair, vtype, tiles)
            return (bev, acc + idx[0].astype(jnp.float32) * 1e-9)

        _, acc = jax.lax.fori_loop(0, n, body, (bev0, jnp.float32(0.0)))
        return acc

    def timed(n: int) -> float:
        t0 = time.perf_counter()
        float(stream_loop(variables, frame, bev0, pose_pair, vtype, tiles,
                          jnp.int32(n)))
        return time.perf_counter() - t0

    print("compiling streaming step...", flush=True)
    timed(1)
    # min each absolute time separately, then difference once
    # (bevrender_tpu/utils/timing.py rationale)
    N1, N2 = 4, 24
    t1 = min(timed(N1) for _ in range(3))
    t2 = min(timed(N2) for _ in range(3))
    ms = (t2 - t1) / (N2 - N1) * 1e3
    fps = B / (ms / 1e3)

    out = {
        "config": "flagship uniform-28 bf16, streaming encode_step+decode"
                  "+register, B=4, 3 views",
        "ms_per_frame_batch": round(ms, 2),
        "frames_per_sec": round(fps, 3),
        "kernel_autotune": kernel_choices or None,
        "note": "carried-BEV serving loop: one encoder pass per new frame "
                "(full-window eval re-runs T=2 passes per frame; the "
                "reference cannot stream at all)",
    }
    print(json.dumps(out), flush=True)

    # --- trace replay (make_replay_scan): ONE dispatch re-localizes a whole
    # recorded T-frame trace, vs the per-frame host dispatch a live caller
    # of make_streaming_step pays. The device math is identical (proven by
    # tests/test_inference.py::test_replay_scan_matches_streaming_chain);
    # the delta is dispatch/RPC amortization, which on a tunnel-attached
    # TPU is material. Wall-clock timing INCLUDING dispatch, as a real
    # caller experiences it.
    T = 16
    replay = pipe.make_replay_scan()
    frames = jnp.stack(
        [frame * jnp.asarray(1.0 + t * 1e-9, frame.dtype) for t in range(T)]
    )
    pose_pairs = jnp.broadcast_to(pose_pair[None], (T,) + pose_pair.shape)

    def replay_timed() -> float:
        t0 = time.perf_counter()
        _, idx, _ = replay(variables, frames, pose_pairs, vtype, tiles)
        jax.block_until_ready(idx)
        return time.perf_counter() - t0

    print("compiling replay scan...", flush=True)
    replay_timed()
    replay_s = min(replay_timed() for _ in range(3))

    def chain_timed() -> float:
        bev = bev0
        t0 = time.perf_counter()
        for t in range(T):
            bev, _, idx = step(variables, frames[t], bev, pose_pair, vtype,
                               tiles)
        jax.block_until_ready(idx)
        return time.perf_counter() - t0

    print("compiling per-frame step...", flush=True)
    chain_timed()
    chain_s = min(chain_timed() for _ in range(3))

    out["replay"] = {
        "trace_len": T,
        "replay_ms_per_frame_batch": round(replay_s / T * 1e3, 2),
        "replay_frames_per_sec": round(B * T / replay_s, 3),
        "per_frame_dispatch_ms_per_frame_batch": round(chain_s / T * 1e3, 2),
        "per_frame_dispatch_frames_per_sec": round(B * T / chain_s, 3),
        "note": "wall-clock incl. host dispatch: one jitted lax.scan per "
                "trace vs one RPC per frame (same device math)",
    }
    (ROOT / "STREAMING_BENCH.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out["replay"]), flush=True)


if __name__ == "__main__":
    main()

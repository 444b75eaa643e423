"""Eval-throughput batch-size sweep on the real chip.

The headline bench fixes B=4 (bench.py). If the B=4 kernel grids underfill
the chip, a larger batch raises frames/sec/chip for free (more grid tiles
amortize pipeline fill/drain and small-op overhead). This sweep times the
identical render+register loop at several batch sizes and writes
EVAL_BATCH_SWEEP.json so the headline batch can be chosen on evidence.

Timing: same device-side differenced lax.fori_loop as bench.py (tunnel-noise
proof — see bevrender_tpu/utils/timing.py and the bench.py docstring).

Usage: python scripts/eval_batch_sweep.py [--batches 4,8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def time_eval(batch_size: int) -> dict:
    import jax
    import jax.numpy as jnp

    from bench import _build_eval_setup

    model, batch, tiles, render_register, _ = _build_eval_setup(batch_size)
    variables = model.init(jax.random.PRNGKey(0), batch)
    camera = jnp.asarray(batch["camera"])
    pose = jnp.asarray(batch["vehicle_pose"])
    vtype = jnp.asarray(batch["vehicle_type"])

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

    t_compile = time.perf_counter()
    timed(1)
    t_compile = time.perf_counter() - t_compile
    N1, N2 = 2, 10
    t1s = [timed(N1) for _ in range(3)]
    t2s = [timed(N2) for _ in range(3)]
    eval_ms = (min(t2s) - min(t1s)) / (N2 - N1) * 1e3
    return {
        "batch_size": batch_size,
        "eval_ms_per_batch": round(eval_ms, 3),
        "fps_per_chip": round(batch_size / (eval_ms / 1e3), 3),
        "compile_or_warm_s": round(t_compile, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="4,8")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    out = {"runs": [], "note": "flagship uniform-28 bf16, T=2, 3 views; "
           "device-side differenced timing (see bench.py)"}
    for b in [int(x) for x in args.batches.split(",")]:
        r = time_eval(b)
        print(json.dumps(r), flush=True)
        out["runs"].append(r)

    best = max(out["runs"], key=lambda r: r["fps_per_chip"])
    out["best_batch"] = best["batch_size"]
    out["best_fps_per_chip"] = best["fps_per_chip"]
    (ROOT / "EVAL_BATCH_SWEEP.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

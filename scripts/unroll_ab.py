"""Depth-scan unroll A/B on the full flagship eval forward (r5 glue work).

Round-4 attribution charged 5.06 ms/pass to "glue inside the encoder"
(EVAL_ATTRIBUTION.json) — embedding broadcast, prev_bev plumbing, stage
scan overhead. Round 5 (a) hoisted the history warp out of the layers (one
warp per pass instead of depth x stages identical ones) and (b) unrolls the
depth scan at eval so the per-iteration dynamic param slices become static
and XLA fuses across the stage's layers. This bench prices (b) directly:
full eval forward (B=4, T=2, flagship bf16) with BEVRENDER_UNROLL_DEPTH=1
vs =0, each arm a fresh process (trace-time knob).

Writes UNROLL_AB.json.  Run on the TPU: python scripts/unroll_ab.py
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def run_arm() -> dict:
    import jax
    import jax.numpy as jnp

    from bevrender_tpu.utils import enable_compilation_cache
    from bevrender_tpu.utils.timing import device_bench

    enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    from bevrender_tpu.config import flagship_config
    from bevrender_tpu.data.dataset import SyntheticDataset
    from bevrender_tpu.data.prefetch import collate
    from bevrender_tpu.models.bevrender import BEVRenderModel

    cfg = flagship_config()
    cfg.model.dtype = "bfloat16"
    cfg.data.window_num_imgs = 1
    B = 4
    ds = SyntheticDataset(
        n_items=B, num_views=3, window_num_imgs=1,
        img_height=224, img_width=224, map_tile=224,
    )
    batch = collate([ds[i] for i in range(B)])
    model = BEVRenderModel(cfg, mode="inference")
    variables = model.init(jax.random.PRNGKey(0), batch)

    f = jax.jit(
        lambda c, p, t: model.apply(variables, c, p, t, train=False)
    )
    c = jnp.asarray(batch["camera"], jnp.bfloat16)
    p = jnp.asarray(batch["vehicle_pose"])
    t = jnp.asarray(batch["vehicle_type"])
    y = f(c, p, t)
    ms = device_bench(f, c, p, t)
    return {
        "full_fwd_ms": round(ms, 3),
        "checksum": float(jnp.sum(y.astype(jnp.float32))),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=("rolled", "unrolled"), default=None)
    args = ap.parse_args()
    if args.arm:
        os.environ["BEVRENDER_UNROLL_DEPTH"] = (
            "1" if args.arm == "unrolled" else "0"
        )
        print("ARM_RESULT " + json.dumps(run_arm()), flush=True)
        return 0

    results = {}
    for arm in ("rolled", "unrolled"):
        p = subprocess.run(
            [sys.executable, __file__, "--arm", arm],
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("ARM_RESULT ")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-2000:])
            raise RuntimeError(f"arm {arm} failed")
        results[arm] = json.loads(line[-1][len("ARM_RESULT "):])

    art = {
        "note": (
            "full flagship eval forward (B=4, T=2, bf16, history warp "
            "hoisted) with the stage depth-scan rolled vs unrolled "
            "(BEVRENDER_UNROLL_DEPTH; params stay depth-stacked either "
            "way). Fresh process per arm."
        ),
        "rolled_ms": results["rolled"]["full_fwd_ms"],
        "unrolled_ms": results["unrolled"]["full_fwd_ms"],
        "unroll_speedup": round(
            results["rolled"]["full_fwd_ms"]
            / results["unrolled"]["full_fwd_ms"], 3
        ),
        "checksum_rel_diff": abs(
            results["rolled"]["checksum"] - results["unrolled"]["checksum"]
        ) / max(abs(results["rolled"]["checksum"]), 1e-6),
    }
    (ROOT / "UNROLL_AB.json").write_text(json.dumps(art, indent=1))
    print(json.dumps(art, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())

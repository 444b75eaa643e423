"""Fold-views x g-major A/B (round-5 ask: VERDICT r4 'next' #4).

Round 3 measured BEVRENDER_FOLD_VIEWS=1 (all V views batched into ONE site
call, batch B*V) as a loss at every flagship stage (g8 0.94x / g4 0.96x /
g1 0.81x vs the per-view loop) — but that predates the g-major grid order
(BEVRENDER_SH_GMAJOR, default for G>1 since round 4), which keeps the ~8 MB
staged lattice table resident across consecutive grid cells. Folding views
triples the batch the resident table serves, which is exactly the traffic
the old A/B paid three times. This bench re-runs the A/B with g-major live.

Both knobs are TRACE-time env reads, so each arm runs in a fresh subprocess;
the parent collects per-stage on-chip timings + an output checksum for
parity and writes FOLD_VIEWS_AB.json.

Run on the TPU:  python scripts/fold_views_ab.py
One arm (internal): python scripts/fold_views_ab.py --arm fold
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

# flagship encoder stages: (label, G, heads)
STAGES = [("g1_h2", 1, 2), ("g2_h4", 2, 4), ("g4_h8", 4, 8), ("g8_h16", 8, 16)]
B, H, C, V, D = 4, 28, 64, 3, 5  # eval batch, BEV, width, views, depth


def run_arm() -> dict:
    import jax
    import jax.numpy as jnp

    from bevrender_tpu.utils import enable_compilation_cache
    from bevrender_tpu.utils.timing import device_bench

    enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    from bevrender_tpu.models.attention import SCADeformableAttention
    from bevrender_tpu.models.layers import set_default_compute_dtype

    set_default_compute_dtype("bfloat16")
    dt = jnp.bfloat16
    # reference points at the stage key-plane shape, same synthetic grid as
    # scripts/eval_attribution.py (both arms share it; only relative cost
    # matters here)
    H2 = H // 2
    refs = jnp.stack(
        jnp.meshgrid(
            jnp.linspace(-0.9, 0.9, H2),
            jnp.linspace(-0.9, 0.9, H * D),
            indexing="ij",
        ),
        axis=-1,
    )[..., ::-1]
    refs = jnp.broadcast_to(refs[None], (V, H2, H * D, 2)).astype(dt)

    out = {}
    rng = jax.random.PRNGKey(0)
    for label, g, heads in STAGES:
        mod = SCADeformableAttention(
            dim=C, n_heads=heads, n_groups=g, bev_depth_dim=D, n_views=V
        )
        q = jax.random.normal(rng, (B, H, H, C), dt)
        feat = jax.random.normal(rng, (B, V, 28, 28, C), dt)
        variables = mod.init(jax.random.PRNGKey(1), q, feat, refs)
        f = jax.jit(lambda q, ft: mod.apply(variables, q, ft, refs))
        y = f(q, feat)
        ms = device_bench(f, q, feat)
        out[label] = {
            "ms": round(ms, 3),
            "checksum": float(jnp.sum(y.astype(jnp.float32))),
        }
    from bevrender_tpu.ops.pallas import fused_attn

    out["traced_gmajor"] = fused_attn.LAST_TRACED_GMAJOR
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=("loop", "fold"), default=None)
    args = ap.parse_args()
    if args.arm:
        os.environ["BEVRENDER_FOLD_VIEWS"] = "1" if args.arm == "fold" else "0"
        print("ARM_RESULT " + json.dumps(run_arm()), flush=True)
        return 0

    results = {}
    for arm in ("loop", "fold"):
        env = dict(os.environ)
        env["BEVRENDER_FOLD_VIEWS"] = "1" if arm == "fold" else "0"
        p = subprocess.run(
            [sys.executable, __file__, "--arm", arm],
            capture_output=True, text=True, env=env, timeout=1800,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("ARM_RESULT ")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-2000:])
            raise RuntimeError(f"arm {arm} failed")
        results[arm] = json.loads(line[-1][len("ARM_RESULT "):])

    art = {
        "note": (
            "SCADeformableAttention one-layer eval forward at flagship "
            "stage shapes, B=4, 3 views, bf16, fused sh sites with "
            "round-4 g-major staging live; fold = one site call for all "
            "views (B*V batch), loop = per-view calls (round-3 default). "
            "Each arm a fresh process (trace-time knobs)."
        ),
        "traced_gmajor": {a: results[a].pop("traced_gmajor") for a in results},
    }
    for label, *_ in STAGES:
        lo, fo = results["loop"][label], results["fold"][label]
        art[label] = {
            "loop_ms": lo["ms"],
            "fold_ms": fo["ms"],
            "fold_speedup": round(lo["ms"] / fo["ms"], 3),
            "checksum_rel_diff": abs(lo["checksum"] - fo["checksum"])
            / max(abs(lo["checksum"]), 1e-6),
        }
    (ROOT / "FOLD_VIEWS_AB.json").write_text(json.dumps(art, indent=1))
    print(json.dumps(art, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())

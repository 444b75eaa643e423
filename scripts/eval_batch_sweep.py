"""Eval-throughput batch-size sweep on the real chip.

The headline bench fixes B=4 (bench.py). If the B=4 kernel grids underfill
the chip, a larger batch raises frames/sec/chip for free (more grid tiles
amortize pipeline fill/drain and small-op overhead). This sweep times the
identical render+register loop at several batch sizes — via bench.py's own
``timed_eval_flow`` so the methodology cannot drift from the headline — and
writes EVAL_BATCH_SWEEP.json so the headline batch can be chosen on evidence.

Usage: python scripts/eval_batch_sweep.py [--batches 4,8]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="4,8")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _apply_kernel_ab_defaults, timed_eval_flow

    choices = _apply_kernel_ab_defaults()  # same variants as the headline
    out = {"runs": [], "kernel_autotune": choices or None,
           "note": "flagship uniform-28 bf16, T=2, 3 views; "
           "bench.py timed_eval_flow (device-side differenced timing)"}
    for b in [int(x) for x in args.batches.split(",")]:
        flow = timed_eval_flow(b)
        r = {
            "batch_size": b,
            "eval_ms_per_batch": round(flow["eval_ms"], 3),
            "fps_per_chip": round(flow["fps"], 3),
            "compile_or_warm_s": round(flow["warm_s"], 1),
        }
        print(json.dumps(r), flush=True)
        out["runs"].append(r)

    best = max(out["runs"], key=lambda r: r["fps_per_chip"])
    out["best_batch"] = best["batch_size"]
    out["best_fps_per_chip"] = best["fps_per_chip"]
    (ROOT / "EVAL_BATCH_SWEEP.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

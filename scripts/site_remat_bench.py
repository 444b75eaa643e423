"""A/B the site remat policy for the TRAINING step on the real chip.

The XLA site paths wrap their body in ``jax.checkpoint`` (ops/deform_attn.py
``_site_remat``). The round-2 default, ``nothing_saveable``, makes the
backward recompute every site forward (scores + lattice bias + softmax) —
maximal recompute for minimal memory. At the flagship train regime (B=2,
T=2, history stop_gradient'd so only ONE encoder pass saves activations)
there may be HBM headroom to save the matmul outputs (``dots_saveable``) or
skip remat entirely, cutting the backward's recompute.

Times the jitted train step (same fori-loop differenced methodology as
bench.py) under BEVRENDER_SITE_REMAT in {nothing, dots, none} and writes
SITE_REMAT_BENCH.json. The knob is trace-time; each mode builds a fresh
Trainer so the step re-traces under its policy. An OOM/compile failure is
recorded as {"error": ...} for that mode rather than aborting the sweep.

Usage: python scripts/site_remat_bench.py [--modes nothing,dots,none]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="nothing,dots,none")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _apply_kernel_ab_defaults
    from scripts.train_batch_sweep import measure

    choices = _apply_kernel_ab_defaults()
    out = {"runs": [], "kernel_autotune": choices or None,
           "note": "flagship uniform-28 bf16, B=2, T=2, MSE_CONTRASTIVE; "
           "jitted train step in lax.fori_loop, device-side differenced "
           "timing; BEVRENDER_SITE_REMAT is read at trace time"}
    prev = os.environ.get("BEVRENDER_SITE_REMAT")
    try:
        for mode in args.modes.split(","):
            os.environ["BEVRENDER_SITE_REMAT"] = mode
            try:
                r = {"mode": mode, **measure(2)}
            except Exception as e:  # OOM / compile failure: record, continue
                r = {"mode": mode, "error": repr(e)}
            print(json.dumps(r), flush=True)
            out["runs"].append(r)
    finally:
        if prev is None:
            os.environ.pop("BEVRENDER_SITE_REMAT", None)
        else:
            os.environ["BEVRENDER_SITE_REMAT"] = prev
    ok = [r for r in out["runs"] if "train_ms_per_step" in r]
    if ok:
        best = min(ok, key=lambda r: r["train_ms_per_step"])
        out["best_mode"] = best["mode"]
        out["best_train_ms_per_step"] = best["train_ms_per_step"]
    (ROOT / "SITE_REMAT_BENCH.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({"best": out.get("best_mode")}), flush=True)


if __name__ == "__main__":
    main()

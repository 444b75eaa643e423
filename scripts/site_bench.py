"""Microbench: one deformable-attention site, fused kernel vs XLA consumer.

Times (device-side differenced fori_loop, same methodology as bench.py):
  A. fused_site_attention          (bias+scores+softmax+AV in one kernel)
  B. _site_xla(use_kernel=True)    (Pallas bias kernel + XLA consumer)
  C. _site_xla(use_kernel=False)   (all-XLA lattice path)
at the flagship's dominant G=8 narrow-channel site and the G=1 wide site.

Run:  python scripts/site_bench.py [--bwd]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from bevrender_tpu.utils import enable_compilation_cache
from bevrender_tpu.utils.timing import device_bench as bench_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bwd", action="store_true", help="also time fwd+bwd")
    args = ap.parse_args()
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    import os

    from bevrender_tpu.ops.deform_attn import (
        _site_xla,
        fused_site_attention,
        lattice_shift_class,
        use_shift_replica,
    )

    results = {}
    for name, B, G, Hpg, H, W, d, ch in (
        ("g8_narrow", 4, 8, 2, 28, 28, 4, 4),
        ("g4_ch8", 4, 4, 2, 28, 28, 4, 8),
        ("g2_ch16", 4, 2, 2, 28, 28, 4, 16),
        ("g1_wide", 4, 1, 2, 28, 28, 4, 32),
    ):
        N = (H // 2) * W * d
        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        table = jax.random.normal(ks[0], (G, Hpg, 2 * H - 1, 2 * W * d - 1)) * 0.1
        k_pos = jax.random.uniform(ks[1], (B, G, N, 2), minval=-0.98, maxval=0.98)
        cls = lattice_shift_class(table.shape, k_pos, H, W)
        order = jnp.argsort(cls, axis=-1, stable=True)
        k_pos = jnp.take_along_axis(k_pos, order[..., None], axis=2)
        dt = jnp.bfloat16
        q = (jax.random.normal(ks[2], (B, G, Hpg, H * W, ch)) * 0.5).astype(dt)
        k = (jax.random.normal(ks[3], (B, G, Hpg, N, ch)) * 0.5).astype(dt)
        v = (jax.random.normal(ks[4], (B, G, Hpg, N, ch)) * 0.5).astype(dt)
        scale = ch ** -0.5

        fns = {
            "fused": lambda q, k, v, p, t: fused_site_attention(
                q, k, v, p, t, H, W, scale, False
            ),
            "bias_kernel+xla": lambda q, k, v, p, t: _site_xla(
                q, k, v, p, t, H, W, scale=scale, use_kernel=True
            ),
            "all_xla": lambda q, k, v, p, t: _site_xla(
                q, k, v, p, t, H, W, scale=scale, use_kernel=False
            ),
        }
        entry = {}
        for fname, fn in fns.items():
            entry[f"{fname}_fwd_ms"] = round(
                bench_fn(fn, q, k, v, k_pos, table), 3
            )
            if args.bwd:
                def fb(q, k, v, p, t, fn=fn):
                    def loss(q, k, v, p, t):
                        return jnp.sum(fn(q, k, v, p, t) ** 2)
                    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q, k, v, p, t)
                    return g[0]
                entry[f"{fname}_fwdbwd_ms"] = round(
                    bench_fn(fb, q, k, v, k_pos, table), 3
                )
            print(f"{name}/{fname}: {entry}", flush=True)
        # stamp WHICH kernel the production dispatcher routed 'fused' to
        # (ops/deform_attn._fused_site_impl): the sh/resolve gate is shape-
        # dependent and artifact readers must not have to infer it
        entry["fused_dispatch"] = (
            "sh (shift-replicated, fused_site_call_sh)"
            if use_shift_replica(table.shape, H, W)
            else "resolve (plain staging, fused_site_call)"
        )
        results[name] = entry
    results["env_knobs"] = {
        k: os.environ.get(k)
        for k in ("BEVRENDER_SHIFT_REPLICA", "BEVRENDER_SITE_DMA",
                  "BEVRENDER_SITE_SH2", "BEVRENDER_FUSED_BWD",
                  "BEVRENDER_TRAIN_FWD_V2")
    }
    results["note"] = (
        "ms per call, B=4, v5e chip, device_bench auto-calibrated; fused = "
        "the PRODUCTION dispatcher fused_site_attention (fused_dispatch "
        "stamps the kernel it selected), bias_kernel+xla = Pallas bias + "
        "XLA consumer (the training path), all_xla = no Pallas"
    )
    (ROOT / "SITE_BENCH.json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

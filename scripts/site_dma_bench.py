"""A/B the DMA-prefetched fused site kernel against the inline-extract one.

Times both kernels at the flagship g8/g4 SCA eval shapes (on-chip parity
asserted first at a small shape) and writes SITE_DMA_BENCH.json. If the DMA
variant wins, flip production via BEVRENDER_SITE_DMA=1 (ops/deform_attn.py)
and re-run bench.py.

Run on the chip:  python scripts/site_dma_bench.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bevrender_tpu.ops.deform_attn import _kernel_inputs
from bevrender_tpu.ops.pallas.fused_attn import (
    fused_site_call,
    fused_site_call_dma,
    fused_site_call_v2,
)


def make_inputs(B, G, Hpg, H, W, N, ch, seed=0):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(
        rng.standard_normal((G, Hpg, 2 * H - 1, 2 * W * 4 - 1)), jnp.float32
    )
    k_pos = jnp.asarray(rng.uniform(-0.95, 0.95, (B, G, N, 2)), jnp.float32)
    staged = _kernel_inputs(table, k_pos, H, W)
    t3m, wy4, f4, shift4, packed, gcol, Np = staged
    k = jnp.asarray(rng.standard_normal((B, G, Hpg, Np, ch)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, G, Hpg, Np, ch)), jnp.bfloat16)
    qcm = jnp.asarray(rng.standard_normal((B, G, Hpg, ch, H * W)), jnp.bfloat16)
    return t3m, wy4, f4, shift4, packed, gcol, k, v, qcm, Np


def main():
    assert jax.default_backend() == "tpu"
    from bevrender_tpu.utils.timing import device_bench

    out = {}

    # --- on-chip parity at a small shape first ---
    ins = make_inputs(1, 2, 2, 8, 8, 100, 4)
    t3m, wy4, f4, shift4, packed, gcol, k, v, qcm, Np = ins
    scale = 4 ** -0.5
    a = jax.jit(
        lambda *x: fused_site_call(*x, 8, 8, 2, False, 100, scale)
    )(t3m, wy4, f4, shift4, packed, gcol, k, v, qcm)
    b = jax.jit(
        lambda *x: fused_site_call_dma(*x, 8, 8, 2, False, 100, scale)
    )(t3m, wy4, f4, shift4, packed, gcol, k, v, qcm)
    err = float(jnp.max(jnp.abs(a - b)))
    out["onchip_parity_max_err"] = err
    print(f"on-chip parity dma: {err}", flush=True)
    assert err < 1e-5, err
    c = jax.jit(
        lambda *x: fused_site_call_v2(*x, 8, 8, 2, False, 100, scale)
    )(t3m, wy4, f4, shift4, packed, gcol, k, v, qcm)
    err2 = float(jnp.max(jnp.abs(a - c)))
    out["onchip_parity_v2_max_err"] = err2
    print(f"on-chip parity v2: {err2}", flush=True)
    assert err2 < 1e-4, err2

    # --- flagship stage shapes (C=64: g8 ch=4, g4 ch=8; SCA N=1568) ---
    for name, (B, G, Hpg, H, W, N, ch) in {
        "g8_sca": (4, 8, 2, 28, 28, 1568, 4),
        "g4_sca": (4, 4, 2, 28, 28, 1568, 8),
        "g8_tsa": (4, 8, 2, 28, 28, 784, 4),
    }.items():
        ins = make_inputs(B, G, Hpg, H, W, N, ch)
        t3m, wy4, f4, shift4, packed, gcol, k, v, qcm, Np = ins
        scale = ch ** -0.5
        ms_plain = device_bench(
            lambda t3m_, *rest: fused_site_call(
                t3m_, *rest, H, W, Hpg, False, N, scale
            ),
            t3m, wy4, f4, shift4, packed, gcol, k, v, qcm,
        )
        ms_dma = device_bench(
            lambda t3m_, *rest: fused_site_call_dma(
                t3m_, *rest, H, W, Hpg, False, N, scale
            ),
            t3m, wy4, f4, shift4, packed, gcol, k, v, qcm,
        )
        ms_v2 = device_bench(
            lambda t3m_, *rest: fused_site_call_v2(
                t3m_, *rest, H, W, Hpg, False, N, scale
            ),
            t3m, wy4, f4, shift4, packed, gcol, k, v, qcm,
        )
        from bevrender_tpu.ops.pallas.lattice_bias import _fwd_call

        ms_bias = device_bench(
            lambda t3m_, *rest: _fwd_call(
                t3m_, *rest, H, W, Hpg, False, N, dma=False
            ),
            t3m, wy4, f4, shift4, packed, gcol,
        )
        ms_bias_dma = device_bench(
            lambda t3m_, *rest: _fwd_call(
                t3m_, *rest, H, W, Hpg, False, N, dma=True
            ),
            t3m, wy4, f4, shift4, packed, gcol,
        )
        out[name] = {
            "plain_ms": round(ms_plain, 3),
            "dma_ms": round(ms_dma, 3),
            "v2_ms": round(ms_v2, 3),
            "speedup_dma": round(ms_plain / ms_dma, 3),
            "speedup_v2": round(ms_plain / ms_v2, 3),
            "bias_plain_ms": round(ms_bias, 3),
            "bias_dma_ms": round(ms_bias_dma, 3),
        }
        print(f"{name}: plain {ms_plain:.3f} dma {ms_dma:.3f} "
              f"v2 {ms_v2:.3f} | bias {ms_bias:.3f} -> {ms_bias_dma:.3f} ms",
              flush=True)

    (ROOT / "SITE_DMA_BENCH.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

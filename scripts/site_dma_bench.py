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
from bevrender_tpu.ops.pallas.fused_attn import fused_site_call
from bevrender_tpu.ops.pallas.experimental import (
    fused_site_call_dma,
    fused_site_call_v2,
)


def make_inputs(B, G, Hpg, H, W, N, ch, seed=0, wt=None, dma_pad=False):
    """wt: table width — 2*W*depth - 1 for SCA (depth=5 at flagship),
    2*W - 1 for TSA. Defaults to the SCA flagship width.

    ``dma_pad=True`` stages the table with 128-aligned lanes, as production
    does when a DMA kernel variant is selected (the DMA arms require it;
    the inline-extract arms measure ~44% slower with it, so each arm gets
    its own staging)."""
    import os

    rng = np.random.default_rng(seed)
    if wt is None:
        wt = 2 * W * 5 - 1
    table = jnp.asarray(
        rng.standard_normal((G, Hpg, 2 * H - 1, wt)), jnp.float32
    )
    k_pos = jnp.asarray(rng.uniform(-0.95, 0.95, (B, G, N, 2)), jnp.float32)
    had = os.environ.get("BEVRENDER_SITE_DMA")
    if dma_pad:
        os.environ["BEVRENDER_SITE_DMA"] = "1"
    try:
        staged = _kernel_inputs(table, k_pos, H, W)
    finally:
        if dma_pad:
            if had is None:
                os.environ.pop("BEVRENDER_SITE_DMA", None)
            else:
                os.environ["BEVRENDER_SITE_DMA"] = had
    t3m, wy4, f4, shift4, packed, gcol, Np = staged
    k = jnp.asarray(rng.standard_normal((B, G, Hpg, Np, ch)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, G, Hpg, Np, ch)), jnp.bfloat16)
    qcm = jnp.asarray(rng.standard_normal((B, G, Hpg, ch, H * W)), jnp.bfloat16)
    return t3m, wy4, f4, shift4, packed, gcol, k, v, qcm, Np


def main():
    assert jax.default_backend() == "tpu"
    from bevrender_tpu.utils.timing import device_bench

    out = {}

    # --- on-chip parity at a small shape first (DMA arms need 128-lane
    # padded staging; the plain arm stages unpadded, as production does) ---
    ins = make_inputs(1, 2, 2, 8, 8, 100, 4, wt=2 * 8 * 4 - 1)
    t3m, wy4, f4, shift4, packed, gcol, k, v, qcm, Np = ins
    insp = make_inputs(1, 2, 2, 8, 8, 100, 4, wt=2 * 8 * 4 - 1, dma_pad=True)
    t3mp = insp[0]
    scale = 4 ** -0.5
    a = jax.jit(
        lambda *x: fused_site_call(*x, 8, 8, 2, False, 100, scale)
    )(t3m, wy4, f4, shift4, packed, gcol, k, v, qcm)
    try:
        b = jax.jit(
            lambda *x: fused_site_call_dma(*x, 8, 8, 2, False, 100, scale)
        )(t3mp, wy4, f4, shift4, packed, insp[5], k, v, qcm)
        err = float(jnp.max(jnp.abs(a - b)))
        out["onchip_parity_max_err"] = err
        print(f"on-chip parity dma: {err}", flush=True)
        # a PARITY failure is a numerics bug, not a benign compile gap —
        # keep the measured error in the artifact and abort loudly
        assert err < 1e-5, f"dma on-chip parity FAILED: {err}"
        dma_ok = True
    except AssertionError:
        raise
    except Exception as e:  # Mosaic compile failures must not kill the A/B
        print(f"dma variant failed on-chip: {e!r}"[:500], flush=True)
        out["onchip_parity_max_err"] = None
        dma_ok = False
    try:
        c = jax.jit(
            lambda *x: fused_site_call_v2(*x, 8, 8, 2, False, 100, scale)
        )(t3mp, wy4, f4, shift4, packed, insp[5], k, v, qcm)
        err2 = float(jnp.max(jnp.abs(a - c)))
        out["onchip_parity_v2_max_err"] = err2
        print(f"on-chip parity v2: {err2}", flush=True)
        assert err2 < 1e-4, f"v2 on-chip parity FAILED: {err2}"
        v2_ok = True
    except AssertionError:
        raise
    except Exception as e:
        print(f"v2 variant failed on-chip: {e!r}"[:500], flush=True)
        out["onchip_parity_v2_max_err"] = None
        v2_ok = False

    # --- flagship stage shapes (C=64: g8 ch=4, g4 ch=8; SCA keys
    # N = (H//2) * W * depth = 14*28*5 = 1960, TSA N = H*W = 784) ---
    for name, (B, G, Hpg, H, W, N, ch, wt) in {
        "g8_sca": (4, 8, 2, 28, 28, 1960, 4, 2 * 28 * 5 - 1),
        "g4_sca": (4, 4, 2, 28, 28, 1960, 8, 2 * 28 * 5 - 1),
        "g8_tsa": (4, 8, 2, 28, 28, 784, 4, 2 * 28 - 1),
    }.items():
        ins = make_inputs(B, G, Hpg, H, W, N, ch, wt=wt)
        t3m, wy4, f4, shift4, packed, gcol, k, v, qcm, Np = ins
        insp = make_inputs(B, G, Hpg, H, W, N, ch, wt=wt, dma_pad=True)
        t3mp, gcolp = insp[0], insp[5]
        scale = ch ** -0.5
        ms_plain = device_bench(
            lambda t3m_, *rest: fused_site_call(
                t3m_, *rest, H, W, Hpg, False, N, scale
            ),
            t3m, wy4, f4, shift4, packed, gcol, k, v, qcm,
        )
        ms_dma = float("inf")
        if dma_ok:
            ms_dma = device_bench(
                lambda t3m_, *rest: fused_site_call_dma(
                    t3m_, *rest, H, W, Hpg, False, N, scale
                ),
                t3mp, wy4, f4, shift4, packed, gcolp, k, v, qcm,
            )
        ms_v2 = float("inf")
        if v2_ok:
            ms_v2 = device_bench(
                lambda t3m_, *rest: fused_site_call_v2(
                    t3m_, *rest, H, W, Hpg, False, N, scale
                ),
                t3mp, wy4, f4, shift4, packed, gcolp, k, v, qcm,
            )
        from bevrender_tpu.ops.pallas.lattice_bias import _fwd_call

        ms_bias = device_bench(
            lambda t3m_, *rest: _fwd_call(
                t3m_, *rest, H, W, Hpg, False, N, dma=False
            ),
            t3m, wy4, f4, shift4, packed, gcol,
        )
        ms_bias_dma = float("inf")
        if dma_ok:
            ms_bias_dma = device_bench(
                lambda t3m_, *rest: _fwd_call(
                    t3m_, *rest, H, W, Hpg, False, N, dma=True
                ),
                t3mp, wy4, f4, shift4, packed, gcolp,
            )
        out[name] = {
            "plain_ms": round(ms_plain, 3),
            "dma_ms": round(ms_dma, 3) if ms_dma != float("inf") else None,
            "v2_ms": round(ms_v2, 3) if ms_v2 != float("inf") else None,
            "speedup_dma": round(ms_plain / ms_dma, 3),
            "speedup_v2": round(ms_plain / ms_v2, 3),
            "bias_plain_ms": round(ms_bias, 3),
            "bias_dma_ms": (
                round(ms_bias_dma, 3) if ms_bias_dma != float("inf") else None
            ),
        }
        print(f"{name}: plain {ms_plain:.3f} dma {ms_dma:.3f} "
              f"v2 {ms_v2:.3f} | bias {ms_bias:.3f} -> {ms_bias_dma:.3f} ms",
              flush=True)

    (ROOT / "SITE_DMA_BENCH.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

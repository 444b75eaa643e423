"""On-chip (interpret=False) parity check for the Pallas kernels.

Interpret-mode tests (tests/test_ops_fused.py) validate kernel *semantics*
on CPU; Mosaic miscompiles would be invisible to them. This script runs on
the real TPU and asserts:

  1. ``lattice_bias_fused`` forward vs the XLA lattice path,
  2. its custom VJP (table + key-position gradients) vs XLA autodiff,
  3. ``fused_site_attention`` forward vs the XLA consumer.

Site menu (flagship extremes):
  * g1_wide   — G=1, ch=32, full key count: all three checks (the pure-XLA
    reference fits in HBM here).
  * g8_xla    — G=8, ch=4 at reduced keys (d=1): checks 1+2 against the
    pure-XLA path. At the full d=4 key count the XLA fallback itself OOMs
    HBM (a 20.8 GB windowed-slice tensor — the reason the kernel exists),
    so the full-size reference comparison is impossible by construction.
  * g8_full   — G=8, ch=4, full keys: check 3 (fused site vs Pallas-bias +
    XLA consumer — both kernel paths, production scale).

Writes ``TPU_PARITY.json`` with max abs/rel errors.

Run:  python scripts/tpu_kernel_parity.py        (needs the axon TPU)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

from bevrender_tpu.utils import enable_compilation_cache


def _err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    ae = np.max(np.abs(a - b))
    re = ae / max(np.max(np.abs(b)), 1e-12)
    return float(ae), float(re)


def check_site(name, B, G, Hpg, H, W, d, ch, seed, report, steps=(1, 2, 3)):
    from bevrender_tpu.ops.deform_attn import (
        _lattice_bias_nm,
        _site_xla,
        fused_site_attention,
        lattice_shift_class,
    )

    N = (H // 2) * W * d
    Ht, Wt = 2 * H - 1, 2 * W * d - 1
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    table = jax.random.normal(ks[0], (G, Hpg, Ht, Wt), jnp.float32) * 0.1
    k_pos = jax.random.uniform(ks[1], (B, G, N, 2), minval=-0.98, maxval=0.98)
    # sort keys by shift class like the production callers
    cls = lattice_shift_class(table.shape, k_pos, H, W)
    order = jnp.argsort(cls, axis=-1, stable=True)
    k_pos = jnp.take_along_axis(k_pos, order[..., None], axis=2)
    q = jax.random.normal(ks[2], (B, G, Hpg, H * W, ch)) * 0.5
    k = jax.random.normal(ks[3], (B, G, Hpg, N, ch)) * 0.5
    v = jax.random.normal(ks[4], (B, G, Hpg, N, ch)) * 0.5
    scale = ch ** -0.5
    entry = {}

    if 1 in steps:
        # --- bias forward: kernel vs XLA lattice path (both f32 staging) ---
        bias_k, _ = jax.jit(
            lambda t, p: _lattice_bias_nm(
                t, p, H, W, compute_dtype=jnp.float32, use_kernel=True
            )
        )(table, k_pos)
        bias_x, _ = jax.jit(
            lambda t, p: _lattice_bias_nm(
                t, p, H, W, compute_dtype=jnp.float32, use_kernel=False
            )
        )(table, k_pos)
        ae, re = _err(bias_k[:, :, :, :N], bias_x)
        entry["bias_fwd_max_abs_err"] = ae
        entry["bias_fwd_max_rel_err"] = re
        assert ae < 1e-4, f"{name}: bias fwd mismatch on chip: {ae}"

    if 2 in steps:
        # --- bias VJP: table + k_pos grads vs XLA autodiff ---
        def loss(use_kernel):
            def inner(t, p):
                b, _ = _lattice_bias_nm(
                    t, p, H, W, compute_dtype=jnp.float32,
                    use_kernel=use_kernel,
                )
                b = b[:, :, :, :N]
                w = jnp.arange(b.size, dtype=jnp.float32).reshape(
                    b.shape
                ) / b.size
                return jnp.sum(b * w)
            return inner

        gk = jax.jit(jax.grad(loss(True), argnums=(0, 1)))(table, k_pos)
        gx = jax.jit(jax.grad(loss(False), argnums=(0, 1)))(table, k_pos)
        for nm, a, b in (("table", gk[0], gx[0]), ("k_pos", gk[1], gx[1])):
            ae, re = _err(a, b)
            entry[f"bias_grad_{nm}_max_abs_err"] = ae
            entry[f"bias_grad_{nm}_max_rel_err"] = re
            assert re < 1e-3, (
                f"{name}: bias {nm}-grad mismatch on chip: rel {re}"
            )

    if 3 in steps:
        # --- fused site forward vs Pallas-bias + XLA consumer ---
        out_f = jax.jit(
            lambda q, k, v, p, t: fused_site_attention(
                q, k, v, p, t, H, W, scale, False
            )
        )(q, k, v, k_pos, table)
        out_x = jax.jit(
            lambda q, k, v, p, t: _site_xla(
                q, k, v, p, t, H, W, scale=scale, use_kernel=True
            )
        )(q, k, v, k_pos, table)
        ae, re = _err(out_f, out_x)
        entry["site_fwd_max_abs_err"] = ae
        entry["site_fwd_max_rel_err"] = re
        # kernel is f32 VPU vs XLA bf16 MXU: bf16-level tolerance
        assert ae < 3e-2, f"{name}: fused site fwd mismatch on chip: {ae}"

    report[name] = entry
    print(f"{name}: OK {json.dumps(entry)}", flush=True)


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu", (
        f"needs the TPU (got {jax.default_backend()})"
    )
    report = {"device": str(jax.devices()[0])}
    check_site("g1_wide", B=2, G=1, Hpg=2, H=28, W=28, d=4, ch=32, seed=0,
               report=report)
    check_site("g8_xla", B=1, G=8, Hpg=2, H=28, W=28, d=1, ch=4, seed=1,
               report=report, steps=(1, 2))
    check_site("g8_full", B=2, G=8, Hpg=2, H=28, W=28, d=4, ch=4, seed=2,
               report=report, steps=(3,))
    (ROOT / "TPU_PARITY.json").write_text(json.dumps(report, indent=1))
    print("wrote TPU_PARITY.json", flush=True)


if __name__ == "__main__":
    main()

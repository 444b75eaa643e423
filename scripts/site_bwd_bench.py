"""A/B the fused flash-style site backward against the XLA-consumer backward.

Times jax.value_and_grad through one attention site at the flagship training
shapes for (a) the XLA-consumer path the trainer runs today (bias kernel +
XLA scores/softmax/AV under jax.checkpoint) and (b) the fused path
(fused_site_call_lse forward + site_bwd_call backward). Asserts on-chip
gradient parity first at a small shape. Writes SITE_BWD_BENCH.json.

If the fused path wins, flip training via BEVRENDER_FUSED_BWD=1
(ops/deform_attn.py dispatch) and re-run bench.py's train flow.

Run on the chip:  python scripts/site_bwd_bench.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

# streamed_deform_attention consults BEVRENDER_FUSED_BWD at trace time; if
# it leaked into this process (e.g. re-running the A/B after flipping
# production on), the "XLA consumer" arm would silently BE the fused path
# and the whole comparison would be vacuous — drop it before any tracing.
# Likewise BEVRENDER_SITE_DMA: the fused train forward follows it, so a
# leaked "2" would silently turn the "fused" arm into the v2 arm.
os.environ.pop("BEVRENDER_FUSED_BWD", None)
os.environ.pop("BEVRENDER_SITE_DMA", None)
os.environ.pop("BEVRENDER_TRAIN_FWD_V2", None)

import jax

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bevrender_tpu.ops.deform_attn import (
    fused_site_attention_train,
    streamed_deform_attention,
)


def make_site(B, G, Hpg, H, W, N, ch, seed=0, wt=None):
    """wt: table width — 2*W*depth - 1 for SCA (depth=5 at flagship),
    2*W - 1 for TSA."""
    rng = np.random.default_rng(seed)
    if wt is None:
        wt = 2 * W * 5 - 1
    q = jnp.asarray(rng.standard_normal((B, G, Hpg, H * W, ch)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, G, Hpg, N, ch)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, G, Hpg, N, ch)), jnp.float32)
    table = jnp.asarray(
        rng.standard_normal((G, Hpg, 2 * H - 1, wt)) * 0.1,
        jnp.float32,
    )
    k_pos = jnp.asarray(rng.uniform(-0.95, 0.95, (B, G, N, 2)), jnp.float32)
    q_pos = jnp.stack(
        jnp.meshgrid(
            jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W), indexing="ij"
        ),
        axis=-1,
    ).reshape(H * W, 2)
    return q, k, v, k_pos, table, q_pos


def losses(H, W, scale, q_pos):
    def loss_xla(q, k, v, k_pos, table):
        out = streamed_deform_attention(
            q, k, v, q_pos, k_pos, table, scale=scale,
            lattice_hw=(H, W), lattice_kernel=True, fuse_site=False,
        )
        return jnp.sum(out ** 2)

    def loss_fused(q, k, v, k_pos, table):
        out = fused_site_attention_train(
            q, k, v, k_pos, table, H, W, scale, False
        )
        return jnp.sum(out ** 2)

    return loss_xla, loss_fused


def main():
    assert jax.default_backend() == "tpu"
    from bevrender_tpu.utils.timing import device_bench

    out = {}

    # --- on-chip gradient parity at a small shape ---
    B, G, Hpg, H, W, N, ch = 1, 2, 2, 8, 8, 100, 4
    q, k, v, k_pos, table, q_pos = make_site(
        B, G, Hpg, H, W, N, ch, wt=2 * 8 * 4 - 1
    )
    scale = ch ** -0.5
    loss_xla, loss_fused = losses(H, W, scale, q_pos)
    ga = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, k_pos, table
    )
    gb = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, k_pos, table
    )
    errs = {}
    for name, a, b in zip(("dq", "dk", "dv", "dk_pos", "dtable"), ga, gb):
        ref = float(jnp.max(jnp.abs(a))) + 1e-12
        err = float(jnp.max(jnp.abs(a - b))) / ref
        errs[name] = round(err, 6)
        assert err < 5e-2, (name, err)
    out["onchip_grad_rel_err"] = errs
    print(f"on-chip grad parity: {errs}", flush=True)

    # --- flagship training shapes (B=2; g8/g4 SCA + g8 TSA) ---
    for name, (B, G, Hpg, H, W, N, ch, wt) in {
        "g8_sca_B2": (2, 8, 2, 28, 28, 1960, 4, 2 * 28 * 5 - 1),
        "g4_sca_B2": (2, 4, 2, 28, 28, 1960, 8, 2 * 28 * 5 - 1),
        "g8_tsa_B2": (2, 8, 2, 28, 28, 784, 4, 2 * 28 - 1),
        # above the eval ch<=8 fusion crossover: the backward's economics
        # differ (it saves the consumer's full fwd+bwd, not just the fwd),
        # so measure whether fusion should gate wider in training
        "g2_sca_B2_ch16": (2, 2, 2, 28, 28, 1960, 16, 2 * 28 * 5 - 1),
    }.items():
        q, k, v, k_pos, table, q_pos = make_site(B, G, Hpg, H, W, N, ch, wt=wt)
        scale = ch ** -0.5
        loss_xla, loss_fused = losses(H, W, scale, q_pos)

        # return an ARRAY (dq) — device_bench folds out[..., :1] into its
        # anti-elision accumulator, which a scalar loss cannot index
        def fwd_bwd_xla(q, k, v, k_pos, table):
            return jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(
                q, k, v, k_pos, table
            )[0]

        def fwd_bwd_fused(q, k, v, k_pos, table):
            return jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
                q, k, v, k_pos, table
            )[0]

        # v2 training-forward arm: BEVRENDER_SITE_DMA=2 swaps the fused
        # forward to fused_site_call_v2_lse (read at trace time; each
        # device_bench call traces its own fresh jit, and the fresh function
        # object below gets its own cache entry)
        def fwd_bwd_fused_v2(q, k, v, k_pos, table):
            return jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
                q, k, v, k_pos, table
            )[0]

        ms_xla = device_bench(fwd_bwd_xla, q, k, v, k_pos, table)
        ms_fused = device_bench(fwd_bwd_fused, q, k, v, k_pos, table)
        os.environ["BEVRENDER_SITE_DMA"] = "2"
        ms_fused_v2 = device_bench(fwd_bwd_fused_v2, q, k, v, k_pos, table)
        os.environ.pop("BEVRENDER_SITE_DMA", None)
        out[name] = {
            "xla_consumer_fwdbwd_ms": round(ms_xla, 3),
            "fused_fwdbwd_ms": round(ms_fused, 3),
            "fused_v2fwd_fwdbwd_ms": round(ms_fused_v2, 3),
            "speedup": round(ms_xla / ms_fused, 3),
            "speedup_v2fwd": round(ms_xla / ms_fused_v2, 3),
        }
        print(f"{name}: xla {ms_xla:.3f} -> fused {ms_fused:.3f} ms "
              f"({ms_xla / ms_fused:.2f}x), v2fwd {ms_fused_v2:.3f} ms",
              flush=True)

    (ROOT / "SITE_BWD_BENCH.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

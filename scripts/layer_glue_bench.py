"""Intra-layer attribution at exact flagship shapes: how much of a g8/g4
EncoderLayer is attention-site kernel vs glue (offset heads, K/V gather,
projections, lattice staging)?

EVAL_ATTRIBUTION.json gives per-layer totals (g8 = 30 ms) and SITE_BENCH.json
gives synthetic-shape site costs, but neither separates the XLA glue around
the sites — the offset conv heads, the matmul-form K/V gather, proj_k/proj_v,
and the per-call lattice staging (_kernel_inputs packs geometry and rebuilds
the rearranged table every site call). This bench times each piece at the
exact stage shapes so optimization effort goes to the right place.

Writes LAYER_GLUE_BENCH.json.  Run on the chip: python scripts/layer_glue_bench.py
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
from bevrender_tpu.utils.timing import device_bench


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    from bevrender_tpu.config import flagship_config
    from bevrender_tpu.models.attention import (
        SCADeformableAttention,
        TSADeformableAttention,
    )
    from bevrender_tpu.models.layers import set_default_compute_dtype
    from bevrender_tpu.ops.grid_sample import grid_sample_2d_mm
    from bevrender_tpu.ops.deform_attn import (
        _kernel_inputs,
        fused_site_attention,
    )

    set_default_compute_dtype("bfloat16")
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    B = 4
    cfg = flagship_config().model
    HW, C, V, d = cfg.bev_shapes[0], cfg.embed_dims[0], cfg.num_views, cfg.bev_depth_dim
    H2 = HW // 2
    N_sca = H2 * HW * d  # 1568

    out = {"config": f"flagship uniform-{HW} bf16 eval shapes, B={B}"}

    refp = jnp.stack(
        jnp.meshgrid(
            jnp.linspace(-0.9, 0.9, H2),
            jnp.linspace(-0.9, 0.9, HW * d),
            indexing="ij",
        ),
        axis=-1,
    )[..., ::-1]
    refp = jnp.broadcast_to(refp[None], (V, H2, HW * d, 2)).astype(dt)

    for s, (G, heads) in enumerate(zip(cfg.n_groups, cfg.n_heads)):
        key = f"g{G}_h{heads}"
        if key in out or G < 4:
            continue  # only the two dominant stages
        Hpg = heads // G
        ch = C // heads
        stride = cfg.strides[s]
        res = {}

        q = jax.random.normal(rng, (B, HW, HW, C), dt)
        img_feat = jax.random.normal(rng, (B, V, H2, H2, C), dt)

        # --- full SCA module ---
        sca = SCADeformableAttention(
            dim=C, n_heads=heads, n_groups=G, bev_depth_dim=d, n_views=V,
            scale_offset_range=cfg.scale_offset_range,
            chunk=cfg.attn_chunk, use_pallas=cfg.use_pallas,
        )
        svs = sca.init(rng, q, img_feat, refp, True)
        res["sca_total_ms"] = round(device_bench(
            lambda x: sca.apply(svs, x, img_feat, refp, True), q
        ), 3)
        print(f"{key} SCA total: {res['sca_total_ms']} ms", flush=True)

        # --- full TSA module (self-attention mode) ---
        tsa = TSADeformableAttention(
            dim=C, n_heads=heads, n_groups=G, stride=stride,
            kernel_size=cfg.kernel_sizes[s],
            scale_offset_range=cfg.scale_offset_range,
            chunk=cfg.attn_chunk, use_pallas=cfg.use_pallas,
        )
        tvs = tsa.init(rng, q, q, True, None)
        res["tsa_total_ms"] = round(device_bench(
            lambda x: tsa.apply(tvs, x, x, True, jnp.ones((), jnp.bool_)), q
        ), 3)
        print(f"{key} TSA total: {res['tsa_total_ms']} ms", flush=True)

        # --- pieces at SCA shapes ---
        Cg = C // G
        fg = jax.random.normal(rng, (B * G, H2, H2, Cg), dt)
        pos = jax.random.uniform(rng, (B * G, H2, HW * d, 2), jnp.float32,
                                 -0.95, 0.95)
        res["kv_gather_mm_ms"] = round(device_bench(
            lambda p: grid_sample_2d_mm(fg, p), pos
        ), 3)

        kv = jax.random.normal(rng, (B, N_sca, C), dt)
        wk = jax.random.normal(rng, (C, C), dt)
        res["proj_kv_ms"] = round(2 * device_bench(
            lambda x: x @ wk, kv
        ), 3)

        # per-call lattice staging (geometry packing + table rearrange)
        table = jax.random.normal(rng, (G, Hpg, 2 * HW - 1, 2 * HW * d - 1),
                                  jnp.float32)
        k_pos = jax.random.uniform(rng, (B, G, N_sca, 2), jnp.float32,
                                   -0.95, 0.95)
        # production sorts keys by shift class (models/attention.py) so the
        # kernel's shift-resolve executes ~1 branch per tile — match that
        from bevrender_tpu.ops.deform_attn import lattice_shift_class

        sc = lattice_shift_class(table.shape, k_pos, HW, HW)
        order = jnp.argsort(sc, axis=-1)
        k_pos = jnp.take_along_axis(k_pos, order[..., None], axis=2)
        res["lattice_staging_ms"] = round(device_bench(
            lambda kp: jax.tree.map(
                lambda x: x, _kernel_inputs(table, kp, HW, HW)[:6]
            ), k_pos
        ), 3)

        # key shift-class sort (argsort per view per layer; sorts are slow on
        # TPU — if this shows up, a counting-rank + one-hot-matmul inverse
        # permutation replaces it)
        from bevrender_tpu.models.attention import _sort_keys_by_shift

        pos_bgn = pos.reshape(B, G, H2, HW * d, 2)
        res["shift_sort_ms"] = round(device_bench(
            lambda p: _sort_keys_by_shift(
                p, B, G, N_sca,
                (G, Hpg, 2 * HW - 1, 2 * HW * d - 1), HW, HW,
            ),
            pos_bgn,
        ), 3)
        # counting-rank alternative (BEVRENDER_SHIFT_SORT=count)
        import os as _os

        _os.environ["BEVRENDER_SHIFT_SORT"] = "count"
        try:
            res["shift_sort_count_ms"] = round(device_bench(
                lambda p: _sort_keys_by_shift(
                    p, B, G, N_sca,
                    (G, Hpg, 2 * HW - 1, 2 * HW * d - 1), HW, HW,
                ),
                pos_bgn,
            ), 3)
        finally:
            del _os.environ["BEVRENDER_SHIFT_SORT"]

        # fused site at exact (G, Hpg, ch, N, M) eval shapes
        qh = jax.random.normal(rng, (B, G, Hpg, HW * HW, ch), dt)
        kh = jax.random.normal(rng, (B, G, Hpg, N_sca, ch), dt)
        vh = jax.random.normal(rng, (B, G, Hpg, N_sca, ch), dt)
        res["fused_site_ms"] = round(device_bench(
            lambda kp: fused_site_attention(
                qh, kh, vh, kp, table, HW, HW, ch ** -0.5, False
            ), k_pos
        ), 3)
        print(f"{key} pieces: {res}", flush=True)

        # fused_site_ms already contains the lattice staging (it calls
        # _kernel_inputs internally), so don't subtract staging twice
        glue = res["sca_total_ms"] - V * (
            res["kv_gather_mm_ms"] + res["fused_site_ms"]
            + res["proj_kv_ms"] + res["shift_sort_ms"]
        )
        res["sca_unattributed_ms"] = round(glue, 3)
        out[key] = res

    print(json.dumps(out, indent=1), flush=True)
    (ROOT / "LAYER_GLUE_BENCH.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

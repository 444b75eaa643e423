"""Attribute the non-site cost of an EncoderLayer (EVAL_ATTRIBUTION.json
shows layer g8 = 30 ms while its 3 fused SCA sites account for ~19 ms).

Benches, at the flagship g8-stage eval shapes (B=4, dim 64, G=8, Hpg=2,
BEV 28x28, d=5, views 3, img feat 28x28):

  * the SCA offset head (3 convs) x 3 views
  * _sort_keys_by_shift (argsort + pos gather) x 3 views
  * grid_sample_2d K/V gather x 3 views
  * proj_k/proj_v x 3 views
  * the full SCA module and the full TSA module (stage-3 config)

Writes WRAPPER_BENCH.json.  Run:  python scripts/wrapper_bench.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from bevrender_tpu.utils import enable_compilation_cache
from bevrender_tpu.utils.timing import device_bench


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    from bevrender_tpu.models.attention import (
        SCADeformableAttention,
        TSADeformableAttention,
        _sort_keys_by_shift,
    )
    from bevrender_tpu.models.layers import set_default_compute_dtype
    from bevrender_tpu.ops.grid_sample import grid_sample_2d, normalized_grid

    set_default_compute_dtype("bfloat16")
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    out = {"config": "flagship g8 stage shapes, B=4, bf16"}

    B, H, W, C, G, Hpg, d, V = 4, 28, 28, 64, 8, 2, 5, 3
    Cg = C // G
    H2 = H // 2
    N = H2 * W * d
    Hi = Wi = 28

    # --- sort ---
    pos = jax.random.uniform(rng, (B * G, H2, W * d, 2), dt, -0.98, 0.98)
    tbl_shape = (G, Hpg, 2 * H - 1, 2 * W * d - 1)

    def sort3(pos):
        outs = []
        for v in range(V):
            p = pos * (1.0 + v * 1e-6)
            outs.append(_sort_keys_by_shift(p, B, G, N, tbl_shape, H, W))
        return jnp.stack(outs)

    out["sort_x3_ms"] = round(device_bench(sort3, pos), 3)
    print(f"sort x3: {out['sort_x3_ms']} ms", flush=True)

    # --- K/V grid_sample gather ---
    fg = jax.random.normal(rng, (B * G, Hi, Wi, Cg), dt)
    spos = jax.random.uniform(rng, (B * G, H2, W * d, 2), dt, -0.98, 0.98)

    def gather3(fg):
        outs = []
        for v in range(V):
            outs.append(grid_sample_2d(fg * (1.0 + v * 1e-6), spos))
        return jnp.stack(outs)

    out["grid_sample_x3_ms"] = round(device_bench(gather3, fg), 3)
    print(f"grid_sample x3: {out['grid_sample_x3_ms']} ms", flush=True)

    from bevrender_tpu.ops.grid_sample import grid_sample_2d_mm

    def gather3_mm(fg):
        outs = []
        for v in range(V):
            outs.append(grid_sample_2d_mm(fg * (1.0 + v * 1e-6), spos))
        return jnp.stack(outs)

    out["grid_sample_mm_x3_ms"] = round(device_bench(gather3_mm, fg), 3)
    print(f"grid_sample_mm x3: {out['grid_sample_mm_x3_ms']} ms", flush=True)

    # --- proj_k/v (shared Dense over (B, N, C)) ---
    import flax.linen as nn

    from bevrender_tpu.models.layers import Dense

    kv = jax.random.normal(rng, (B, N, C), dt)
    dense = Dense(C)
    dvs = dense.init(rng, kv)

    def projs3(kv):
        outs = []
        for v in range(V):
            x = kv * (1.0 + v * 1e-6)
            outs.append(dense.apply(dvs, x) + dense.apply(dvs, x))
        return jnp.stack(outs)

    out["proj_kv_x3_ms"] = round(device_bench(projs3, kv), 3)
    print(f"proj k+v x3: {out['proj_kv_x3_ms']} ms", flush=True)

    # --- offset head x3 (the three convs at g8 shapes) ---
    qg = jax.random.normal(rng, (B * G, H, W, Cg), dt)

    class OffHead(nn.Module):
        @nn.compact
        def __call__(self, x):
            outs = []
            for v in range(V):
                o = jax.nn.gelu(
                    nn.LayerNorm()(
                        jnp.asarray(
                            nn.Conv(Cg * d, (1, 1), feature_group_count=Cg)(
                                x * (1.0 + v * 1e-6)
                            )
                        )
                    )
                )
                o = nn.Conv(2 * d, (2, 1), strides=(2, 1), use_bias=False)(o)
                outs.append(o)
            return jnp.stack(outs)

    oh = OffHead()
    ovs = oh.init(rng, qg)
    out["offset_head_x3_ms"] = round(
        device_bench(lambda x: oh.apply(ovs, x), qg), 3
    )
    print(f"offset head x3: {out['offset_head_x3_ms']} ms", flush=True)

    # --- full modules ---
    q = jax.random.normal(rng, (B, H, W, C), dt)
    feat = jax.random.normal(rng, (B, V, Hi, Wi, C), dt)
    refp = jnp.stack(
        jnp.meshgrid(
            jnp.linspace(-0.9, 0.9, H2),
            jnp.linspace(-0.9, 0.9, W * d),
            indexing="ij",
        ),
        axis=-1,
    )[..., ::-1]
    refp = jnp.broadcast_to(refp[None], (V, H2, W * d, 2)).astype(dt)

    sca = SCADeformableAttention(
        dim=C, n_heads=G * Hpg, n_groups=G, bev_depth_dim=d, n_views=V
    )
    svs = sca.init(rng, q, feat, refp, deterministic=True)
    out["sca_module_ms"] = round(
        device_bench(
            lambda q: sca.apply(svs, q, feat, refp, deterministic=True), q
        ), 3,
    )
    print(f"SCA module: {out['sca_module_ms']} ms", flush=True)

    tsa = TSADeformableAttention(
        dim=C, n_heads=G * Hpg, n_groups=G, stride=1, kernel_size=3
    )
    tvs = tsa.init(rng, q, q, deterministic=True)
    out["tsa_module_ms"] = round(
        device_bench(lambda q: tsa.apply(tvs, q, q, deterministic=True), q), 3
    )
    print(f"TSA module (stride 1): {out['tsa_module_ms']} ms", flush=True)

    print(json.dumps(out, indent=1), flush=True)
    (ROOT / "WRAPPER_BENCH.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

"""TPU side of the BASELINE.json 5-config measurement matrix.

Mirrors ``baselines/torch_cpu_baseline.py --stages`` on the chip with the
same flagship-shaped components (uniform-28, width 64, 3 views):

  1. backbone_1frame        — ResNet18WoFPN, one 224x224 frame, B=1
  2. proj_sca_1layer_3views — SCADeformableAttention, single timestep
  3. tsa_seq_T2             — TSADeformableAttention applied T=2 times
  4. encoder_decoder_1t     — full model forward, T=1 (backbone included;
                              subtract stage 1 x views for the pure
                              encoder+decoder cost)
  5. end-to-end             — bench.py's headline (not repeated here)

Updates ``BASELINE_MEASURED.json`` with ``stages_tpu_ms``.
Run:  python scripts/tpu_stage_bench.py
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
from bevrender_tpu.utils.timing import device_bench as bench_apply


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    import flax.linen as nn

    from bevrender_tpu.config import flagship_config
    from bevrender_tpu.models.attention import (
        SCADeformableAttention,
        TSADeformableAttention,
    )
    from bevrender_tpu.models.backbone import ResNet18WoFPN
    from bevrender_tpu.models.bevrender import BEVRenderModel
    from bevrender_tpu.data.dataset import SyntheticDataset

    from bevrender_tpu.models.layers import set_default_compute_dtype

    set_default_compute_dtype("bfloat16")
    rng = jax.random.PRNGKey(0)
    out = {}
    dt = jnp.bfloat16

    # 1. backbone, one frame, B=1 (matrix config 1)
    from bevrender_tpu.models.layers import make_norm

    bb = ResNet18WoFPN(bev_dim=28, norm=make_norm("batch", axis_name=None))
    frame = jax.random.normal(rng, (1, 224, 224, 3), dt)
    vs = bb.init(rng, frame, train=False)
    out["backbone_1frame_ms"] = round(
        bench_apply(
            lambda f: bb.apply(vs, f, train=False), frame
        ), 3,
    )
    print(f"backbone: {out['backbone_1frame_ms']} ms", flush=True)

    # 2. proj + SCA, one layer, 3 views, single timestep (config 2)
    H = W = 28
    dim, heads, groups, d = 64, 2, 1, 5
    sca = SCADeformableAttention(
        dim=dim, n_heads=heads, n_groups=groups, bev_depth_dim=d, n_views=3,
    )
    q = jax.random.normal(rng, (1, H, W, dim), dt)
    feat = jax.random.normal(rng, (1, 3, H, W, dim), dt)
    H2 = H // 2
    refp = jnp.stack(
        jnp.meshgrid(
            jnp.linspace(-0.9, 0.9, H2),
            jnp.linspace(-0.9, 0.9, W * d),
            indexing="ij",
        ),
        axis=-1,
    )[..., ::-1]
    refp = jnp.broadcast_to(refp[None], (3, H2, W * d, 2)).astype(dt)
    svs = sca.init(rng, q, feat, refp, deterministic=True)
    out["proj_sca_1layer_3views_ms"] = round(
        bench_apply(
            lambda q: sca.apply(svs, q, feat, refp, deterministic=True), q
        ), 3,
    )
    print(f"proj+SCA: {out['proj_sca_1layer_3views_ms']} ms", flush=True)

    # 3. TSA over a T=2 BEV query sequence (config 3)
    tsa = TSADeformableAttention(
        dim=dim, n_heads=heads, n_groups=groups, stride=8, kernel_size=9,
    )
    tvs = tsa.init(rng, q, q, deterministic=True)

    def tsa_seq(q):
        h = tsa.apply(tvs, q, q, deterministic=True)
        return tsa.apply(tvs, h, q, deterministic=True)

    out["tsa_seq_T2_ms"] = round(bench_apply(tsa_seq, q), 3)
    print(f"TSA x2: {out['tsa_seq_T2_ms']} ms", flush=True)

    # 4. encoder + decoder, single timestep (config 4; includes one
    # backbone pass over 3 views — subtract 3x config 1 for the pure cost)
    cfg = flagship_config()
    cfg.model.dtype = "bfloat16"
    cfg.data.window_num_imgs = 0  # T=1
    cfg.train.batch_size = 1
    model = BEVRenderModel(cfg)
    ds = SyntheticDataset(
        n_items=1, num_views=3, window_num_imgs=0,
        img_height=224, img_width=224, map_tile=224,
    )
    batch = {k: np.stack([ds[0][k]]) for k in ds[0]}
    mvs = model.init(jax.random.PRNGKey(0), batch)
    cam = jnp.asarray(batch["camera"])
    pose = jnp.asarray(batch["vehicle_pose"])
    vt = jnp.asarray(batch["vehicle_type"])
    out["encoder_decoder_1t_ms"] = round(
        bench_apply(
            lambda c: model.apply(mvs, c, pose, vt, train=False), cam
        ), 3,
    )
    print(f"enc+dec T=1: {out['encoder_decoder_1t_ms']} ms", flush=True)

    path = ROOT / "BASELINE_MEASURED.json"
    payload = json.loads(path.read_text()) if path.exists() else {}
    payload["stages_tpu_ms"] = out
    payload["stages_tpu_note"] = (
        "B=1 bf16 on one v5e chip, device-side differenced timing; "
        "end-to-end (config 5) is bench.py's headline"
    )
    path.write_text(json.dumps(payload, indent=2))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

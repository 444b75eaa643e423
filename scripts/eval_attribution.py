"""Attribute the eval batch time (bench.py headline, B=4 T=2 bf16) to model
components, on the chip.

bench.py measures the end-to-end render+register step; BASELINE_MEASURED.json
has the 5-config matrix at B=1. Neither says where the B=4 eval batch's
~320 ms actually goes — SITE_BENCH's synthetic-shape SCA numbers sum to only
~70 ms, so most of the time is in the *non-attention* parts (LPU depthwise
convs, ConvMLPs, LayerNorms, decoder, backbone) or in shape effects the
synthetic benches miss.  This script benches each component at the exact
flagship eval shapes and cross-checks the sum against the full forward.

Writes EVAL_ATTRIBUTION.json.  Run:  python scripts/eval_attribution.py
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
    from bevrender_tpu.data.dataset import SyntheticDataset
    from bevrender_tpu.models.bevrender import BEVRenderModel
    from bevrender_tpu.models.decoder import BEVImageRenderDecoder
    from bevrender_tpu.models.backbone import ResNet18WoFPN
    from bevrender_tpu.models.encoder import EncoderLayer
    from bevrender_tpu.models.layers import (
        ConvMLP,
        make_norm,
        set_default_compute_dtype,
    )

    set_default_compute_dtype("bfloat16")
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    B = 4
    out = {"config": "flagship uniform-28 bf16, eval shapes, B=4"}

    cfg = flagship_config()
    cfg.model.dtype = "bfloat16"
    cfg.data.window_num_imgs = 1  # T=2
    cfg.train.batch_size = B
    m = cfg.model
    HW, C, V, d = m.bev_shapes[0], m.embed_dims[0], m.num_views, m.bev_depth_dim

    # ---- full forward (B=4, T=2): the eval batch minus the register ----
    model = BEVRenderModel(cfg)
    ds = SyntheticDataset(
        n_items=B, num_views=V, window_num_imgs=1,
        img_height=m.img_height, img_width=m.img_width, map_tile=224,
    )
    batch = {k: np.stack([ds[i][k] for i in range(B)]) for k in ds[0]}
    variables = model.init(jax.random.PRNGKey(0), batch)
    cam = jnp.asarray(batch["camera"])
    pose = jnp.asarray(batch["vehicle_pose"])
    vt = jnp.asarray(batch["vehicle_type"])
    out["full_fwd_B4_T2_ms"] = round(device_bench(
        lambda c: model.apply(variables, c, pose, vt, train=False), cam
    ), 3)
    print(f"full fwd: {out['full_fwd_B4_T2_ms']} ms", flush=True)

    # ---- backbone over all folded frames: B*V images x T history steps ----
    norm = make_norm("batch", axis_name=None)
    bb = ResNet18WoFPN(bev_dim=HW, norm=norm)
    frames = jax.random.normal(rng, (B * V, m.img_height, m.img_width, 3), dt)
    bvs = bb.init(rng, frames, train=False)
    per_call = device_bench(lambda f: bb.apply(bvs, f, train=False), frames)
    out["backbone_BV_ms_per_T"] = round(per_call, 3)
    print(f"backbone (B*V={B*V} frames): {per_call:.3f} ms/T", flush=True)

    # ---- decoder on the final BEV map (runs once per batch) ----
    dec = BEVImageRenderDecoder(
        bev_spatial_dim=HW, model_dim=C, hid_dim=m.decoder_hid_dim, norm=norm
    )
    bev = jax.random.normal(rng, (B, HW, HW, C), dt)
    dvs = dec.init(rng, bev, train=False)
    out["decoder_ms"] = round(device_bench(
        lambda x: dec.apply(dvs, x, train=False), bev
    ), 3)
    print(f"decoder: {out['decoder_ms']} ms", flush=True)

    # ---- one EncoderLayer per distinct stage config (full layer and its
    #      attention-free remainder) ----
    img_feat = jax.random.normal(rng, (B, V, HW // 2, HW // 2, C), dt)
    # reference points at the stage key-plane shape (V, H/2, W*d, 2)
    H2 = HW // 2
    refp = jnp.stack(
        jnp.meshgrid(
            jnp.linspace(-0.9, 0.9, H2),
            jnp.linspace(-0.9, 0.9, HW * d),
            indexing="ij",
        ),
        axis=-1,
    )[..., ::-1]
    refp = jnp.broadcast_to(refp[None], (V, H2, HW * d, 2)).astype(dt)
    pose23 = jnp.zeros((B, 2, 3), dt)

    # img_feat spatial dims must match what the backbone emits
    bb_feat = bb.apply(bvs, frames, train=False)
    img_feat = bb_feat.reshape((B, V) + bb_feat.shape[1:]).astype(dt)
    print(f"img_feat {img_feat.shape}", flush=True)

    layer_ms = {}
    for s in range(m.n_stages):
        key = f"g{m.n_groups[s]}_h{m.n_heads[s]}"
        if key in layer_ms:
            continue
        layer = EncoderLayer(
            dim=C, bev_feat_shape=HW, bev_depth_dim=d,
            n_heads=m.n_heads[s], n_groups=m.n_groups[s],
            stride=m.strides[s], kernel_size=m.kernel_sizes[s],
            n_views=V, expansion=m.expansion,
            scale_offset_range=m.scale_offset_range,
            drop_path_rate=0.0, attn_chunk=m.attn_chunk,
            use_pallas=m.use_pallas,
        )
        q = jax.random.normal(rng, (B, HW, HW, C), dt)
        lvs = layer.init(
            rng, q, img_feat, q, pose23, refp, False, False, None
        )
        layer_ms[key] = round(device_bench(
            lambda x, lvs=lvs, layer=layer: layer.apply(
                lvs, x, img_feat, x, pose23, refp, False, False,
                jnp.ones((), jnp.bool_),
            ), q
        ), 3)
        print(f"layer {key}: {layer_ms[key]} ms", flush=True)
    out["encoder_layer_ms"] = layer_ms

    # ---- the attention-free pieces at layer shapes ----
    q = jax.random.normal(rng, (B, HW, HW, C), dt)
    mlp = ConvMLP(C, m.expansion, 0.0)
    mvs = mlp.init(rng, q, True)
    out["conv_mlp_ms"] = round(device_bench(
        lambda x: mlp.apply(mvs, x, True), q
    ), 3)

    from bevrender_tpu.models.layers import Conv

    lpu = Conv(C, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=C)
    lpvs = lpu.init(rng, q)
    out["lpu_depthwise_ms"] = round(device_bench(
        lambda x: lpu.apply(lpvs, x), q
    ), 3)

    import flax.linen as nn

    ln = nn.LayerNorm()
    lnvs = ln.init(rng, q)
    out["layernorm_ms"] = round(device_bench(
        lambda x: ln.apply(lnvs, x), q
    ), 3)
    print(
        f"mlp {out['conv_mlp_ms']} lpu {out['lpu_depthwise_ms']} "
        f"ln {out['layernorm_ms']}",
        flush=True,
    )

    # ---- glue attribution (round-3 weak #4: the ~6% gap) ----
    # one full encoder pass (backbone + embedding + 7 stages, exactly what
    # the recurrence runs per frame) and the batched ego-motion warp: the
    # full-fwd gap then splits into (encoder-call internals beyond the
    # standalone layer sum) vs (outer recurrence + decode glue)
    from bevrender_tpu.inference.register import BEVRenderNet_encode_step
    from bevrender_tpu.geometry.ego_motion import project_history_bev

    net = model.net
    refs = model.reference_points
    prev_bev = jax.random.normal(rng, (B, HW, HW, C), dt)
    frame = jnp.asarray(batch["camera"][:, -1])
    pose_pair = jnp.asarray(batch["vehicle_pose"][:, :2])
    out["encode_step_ms"] = round(device_bench(
        lambda f: net.apply(
            variables, f, prev_bev, pose_pair, vt, refs,
            method=BEVRenderNet_encode_step,
        ), frame
    ), 3)
    print(f"encode_step (1 frame): {out['encode_step_ms']} ms", flush=True)
    out["ego_warp_ms"] = round(device_bench(
        lambda b: project_history_bev(b, pose_pair.astype(jnp.float32)),
        prev_bev.astype(jnp.float32),
    ), 3)
    print(f"ego warp: {out['ego_warp_ms']} ms", flush=True)

    # ---- cross-check: components summed vs the measured full forward ----
    per_frame_layers = sum(
        2 * layer_ms[f"g{m.n_groups[s]}_h{m.n_heads[s]}"]
        for s in range(m.n_stages)
    )
    T = 2
    out["sum_check_ms"] = round(
        T * (out["backbone_BV_ms_per_T"] + per_frame_layers)
        + out["decoder_ms"],
        3,
    )
    out["glue_inside_encoder_ms_per_T"] = round(
        out["encode_step_ms"]
        - out["backbone_BV_ms_per_T"] - per_frame_layers, 3,
    )
    out["glue_outside_encoder_ms"] = round(
        out["full_fwd_B4_T2_ms"]
        - T * out["encode_step_ms"] - out["decoder_ms"], 3,
    )
    out["note"] = (
        "sum_check = T*(backbone + 2*sum(stage layers)) + decoder. The gap "
        "vs full_fwd splits into glue_inside_encoder (per-pass cost beyond "
        "the standalone layer sum: embedding broadcast, prev_bev handling, "
        "stage plumbing — x T passes) and glue_outside_encoder (recurrence "
        "control + decode dispatch); ego_warp_ms prices the eval-time "
        "history alignment separately"
    )
    print(json.dumps(out, indent=1), flush=True)
    (ROOT / "EVAL_ATTRIBUTION.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

"""BEV encoder: 7-stage U-Net-shaped stack of BEVFormer-style layers.

TPU rebuild of model/encoder.py. One ``EncoderLayer`` is (encoder.py:339-411):

    x += depthwise3x3 (local perception unit)
    x  = x + DropPath(TSA(LN(x), prev_bev))
    x  = x + DropPath(ConvMLP(LN(x)))
    x += depthwise3x3
    x  = x + DropPath(SCA(LN(x), camera feats))
    x  = x + DropPath(ConvMLP(LN(x)))

Parity notes:
* A single LayerNorm instance is reused for all four normalizations, sharing
  its parameters, exactly like the reference's ``self.layer_norm``
  (encoder.py:275, applied at 373, 385, 393, 406).
* ``ffn_tsa``/``ffn_sca``/``down_proj`` are declared but never called in the
  reference (encoder.py:287-296 vs 382-384, 403-404) — the sole reason its DDP
  needs ``find_unused_parameters=True`` (train.py:134). We simply do not
  create them; in JAX unused parameters would merely receive zero cotangents,
  but dead weights are dead weights.
* ``layer_scale`` is ``nn.Identity`` in the reference (encoder.py:274); we
  omit it (the class exists in models/layers.py for API parity).
* History alignment (ego-motion warp of ``prev_bev``) runs only when
  ``align_history`` is set — the reference gates it on eval mode
  (encoder.py:366-367); the recurrent history pass always runs in eval mode
  (bevrender.py:124-134), so history frames are always aligned and the final
  training pass is not.
* Stage transitions: identity / stride-2 conv / 2x transpose conv keyed on the
  BEV shape delta (encoder.py:177-189).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bevrender_tpu.config import ModelConfig
from bevrender_tpu.geometry.ego_motion import project_history_bev
from bevrender_tpu.models.attention import SCADeformableAttention, TSADeformableAttention
from bevrender_tpu.models.backbone import build_backbone
from bevrender_tpu.models.layers import Conv, ConvMLP, Dense, DropPath, make_norm
from bevrender_tpu.parallel.annotate import hint


class EncoderLayer(nn.Module):
    dim: int
    bev_feat_shape: int
    bev_depth_dim: int
    n_heads: int
    n_groups: int
    stride: int
    kernel_size: int
    n_views: int
    expansion: int
    scale_offset_range: bool
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    attn_chunk: int = 512
    use_pallas: bool = True

    @nn.compact
    def __call__(
        self,
        bev_query: jax.Array,  # (B, H, W, C)
        img_feat: jax.Array,  # (B, V, Hi, Wi, C)
        prev_bev: Optional[jax.Array],
        vehicle_pose: jax.Array,  # (B, 2, 3)
        reference_points: jax.Array,  # (V, H//2, W*d, 2)
        train: bool = False,
        align_history: bool = True,
        has_prev: Optional[jax.Array] = None,
    ) -> jax.Array:
        deterministic = not train
        layer_norm = nn.LayerNorm(name="layer_norm")  # shared across 4 uses
        drop_path = DropPath(self.drop_path_rate, name="drop_path")

        if prev_bev is not None and align_history:
            prev_bev = project_history_bev(prev_bev, vehicle_pose)

        x = bev_query
        # BEV maps stay data-sharded only: the depthwise LPU convs below
        # cannot be channel-partitioned by GSPMD
        x = hint(x, "data", None, None, None)
        x = x + Conv(
            self.dim, (3, 3), padding=((1, 1), (1, 1)),
            feature_group_count=self.dim, name="tsa_lpu",
        )(x)
        x0 = x
        x = TSADeformableAttention(
            dim=self.dim,
            n_heads=self.n_heads,
            n_groups=self.n_groups,
            stride=self.stride,
            kernel_size=self.kernel_size,
            scale_offset_range=self.scale_offset_range,
            attn_drop_rate=self.attn_drop_rate,
            proj_drop_rate=self.drop_rate,
            chunk=self.attn_chunk,
            use_pallas=self.use_pallas,
            name="temporal_self_attn",
        )(layer_norm(x), prev_bev, deterministic, has_prev)
        x = drop_path(x, deterministic) + x0

        x0 = x
        x = ConvMLP(self.dim, self.expansion, self.drop_rate, name="tsa_mlp")(
            layer_norm(x), deterministic
        )
        x = drop_path(x, deterministic) + x0

        x = x + Conv(
            self.dim, (3, 3), padding=((1, 1), (1, 1)),
            feature_group_count=self.dim, name="sca_lpu",
        )(x)
        x0 = x
        x = SCADeformableAttention(
            dim=self.dim,
            n_heads=self.n_heads,
            n_groups=self.n_groups,
            bev_depth_dim=self.bev_depth_dim,
            n_views=self.n_views,
            scale_offset_range=self.scale_offset_range,
            attn_drop_rate=self.attn_drop_rate,
            proj_drop_rate=self.drop_rate,
            chunk=self.attn_chunk,
            use_pallas=self.use_pallas,
            name="spatial_cross_attn",
        )(layer_norm(x), img_feat, reference_points, deterministic)
        x = drop_path(x, deterministic) + x0

        x0 = x
        x = ConvMLP(self.dim, self.expansion, self.drop_rate, name="sca_mlp")(
            layer_norm(x), deterministic
        )
        x = drop_path(x, deterministic) + x0
        return x


class BEVEncoderStage(nn.Module):
    """``depth`` EncoderLayers + resolution/channel transition
    (encoder.py:131-240)."""

    dim: int
    next_dim: int
    bev_feat_shape: int
    next_bev_feat_shape: int
    depth: int
    bev_depth_dim: int
    n_heads: int
    n_groups: int
    stride: int
    kernel_size: int
    n_views: int
    expansion: int
    scale_offset_range: bool
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    attn_chunk: int = 512
    use_pallas: bool = True

    @nn.compact
    def __call__(
        self,
        bev_query,
        img_feat,
        prev_bev,
        vehicle_pose,
        reference_points,
        train=False,
        align_history=True,
        has_prev=None,
    ):
        # The stage's `depth` layers share hyper-parameters, so they run as an
        # nn.scan over depth-stacked params: the layer body traces/compiles
        # ONCE per stage instead of `depth` times (the dominant compile cost).
        layer = EncoderLayer(
            dim=self.dim,
            bev_feat_shape=self.bev_feat_shape,
            bev_depth_dim=self.bev_depth_dim,
            n_heads=self.n_heads,
            n_groups=self.n_groups,
            stride=self.stride,
            kernel_size=self.kernel_size,
            n_views=self.n_views,
            expansion=self.expansion,
            scale_offset_range=self.scale_offset_range,
            drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            attn_chunk=self.attn_chunk,
            use_pallas=self.use_pallas,
            name="layers",
        )

        def layer_body(mod, carry, _):
            out = mod(
                carry,
                img_feat,
                prev_bev,
                vehicle_pose,
                reference_points,
                train,
                align_history,
                has_prev,
            )
            return out, None

        # At eval the depth loop unrolls (params stay depth-stacked, so the
        # tree is identical; the per-iteration dynamic param slices become
        # static slices and XLA fuses across the two layers). Training keeps
        # the rolled scan: its backward pass re-materializes per-layer and
        # the rolled form keeps compile time at one layer per stage.
        # BEVRENDER_UNROLL_DEPTH=0/1 overrides (trace-time knob, for A/B).
        import os

        env = os.environ.get("BEVRENDER_UNROLL_DEPTH")
        unroll = (not train) if env is None else env == "1"
        scan = nn.scan(
            layer_body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.depth,
            unroll=self.depth if unroll else 1,
        )
        bev_query, _ = scan(layer, bev_query, None)

        # stage transition (encoder.py:177-189)
        if self.bev_feat_shape == self.next_bev_feat_shape:
            if self.dim != self.next_dim:
                bev_query = Conv(self.next_dim, (1, 1), name="transition")(
                    bev_query
                )
        elif self.bev_feat_shape > self.next_bev_feat_shape:
            bev_query = Conv(
                self.next_dim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                name="transition",
            )(bev_query)
        else:
            bev_query = nn.ConvTranspose(
                self.next_dim, (2, 2), strides=(2, 2), name="transition"
            )(bev_query)
        return bev_query


class BEVEncoder(nn.Module):
    """Backbone once per call + all stages (encoder.py:87-128).

    ``reference_points`` is a tuple with one (V, h2, w*d, 2) array per stage —
    the projected voxel grid at that stage's BEV resolution, already selected
    for the batch's vehicle type.
    """

    cfg: ModelConfig
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        bev_query: jax.Array,  # (B, H0, W0, C0)
        images: jax.Array,  # (B, V, H, W, 3)
        prev_bev: Optional[jax.Array],
        vehicle_pose: jax.Array,  # (B, 2, 3)
        reference_points: Tuple[jax.Array, ...],
        train: bool = False,
        align_history: bool = True,
        has_prev: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.cfg
        norm = make_norm(cfg.norm, axis_name=self.axis_name if train else None)
        B, V = images.shape[0], images.shape[1]

        # fold views into batch for the backbone (encoder.py:98-99,110)
        folded = images.reshape((B * V,) + images.shape[2:])
        feat = build_backbone(
            cfg.backbone, cfg.embed_dims[0], cfg.bev_shapes[0], cfg.img_height, norm
        )(folded, train)
        img_feat = feat.reshape((B, V) + feat.shape[1:])

        # History alignment hoisted OUT of the layers (r5 glue cut): every
        # layer of every stage used to re-warp the SAME prev_bev with the
        # SAME pose (the reference does exactly that, encoder.py:366 —
        # 14 identical warps per pass at depth 2 x 7 stages). The warp is a
        # pure function of (prev_bev, pose), so warping once here is
        # numerically identical; layers receive align_history=False.
        if prev_bev is not None and align_history:
            prev_bev = project_history_bev(prev_bev, vehicle_pose)
        align_history = False

        for s in range(cfg.n_stages):
            # Per-stage width fix: the single-scale backbone emits
            # ``embed_dims[0]`` channels for every stage, but pyramid configs
            # widen (encoder.py:23-38 defaults: 64..512). Upstream this path
            # is structurally broken — the (B*G, C/G, Hi, Wi) reshape of
            # SCA_deform_attn.py:290-301 cannot absorb a 64-channel map at a
            # 128+-dim stage, and the multiscale FPN hookup that would have
            # fixed it is commented out (encoder.py:116-120). Here a per-stage
            # 1x1 projection stands in for that missing FPN level.
            stage_feat = img_feat
            if img_feat.shape[-1] != cfg.embed_dims[s]:
                stage_feat = Dense(
                    cfg.embed_dims[s], name=f"img_width_fix{s}"
                )(img_feat)
            bev_query = BEVEncoderStage(
                dim=cfg.embed_dims[s],
                next_dim=cfg.embed_dims[s + 1],
                bev_feat_shape=cfg.bev_shapes[s],
                next_bev_feat_shape=cfg.bev_shapes[s + 1],
                depth=cfg.depths[s],
                bev_depth_dim=cfg.bev_depth_dim,
                n_heads=cfg.n_heads[s],
                n_groups=cfg.n_groups[s],
                stride=cfg.strides[s],
                kernel_size=cfg.kernel_sizes[s],
                n_views=cfg.num_views,
                expansion=cfg.expansion,
                scale_offset_range=cfg.scale_offset_range,
                drop_rate=cfg.drop_rate,
                attn_drop_rate=cfg.attn_drop_rate,
                drop_path_rate=cfg.drop_path_rate,
                attn_chunk=cfg.attn_chunk,
                use_pallas=cfg.use_pallas,
                name=f"stage{s}",
            )(
                bev_query,
                stage_feat,
                # The reference passes the (stage-0-shaped) prev_bev to every
                # stage and asserts shape equality (encoder.py:112-117), which
                # only holds for uniform-shape configs; for pyramid configs we
                # feed prev_bev to the stages whose BEV shape and width match
                # it, and let the others run TSA in its degenerate
                # self-attention mode (TSA_deform_attn.py:141-143).
                prev_bev
                if (
                    prev_bev is not None
                    and cfg.bev_shapes[s] == cfg.bev_shapes[0]
                    and cfg.embed_dims[s] == cfg.embed_dims[0]
                )
                else None,
                vehicle_pose,
                reference_points[s],
                train,
                align_history,
                has_prev,
            )
        return bev_query

"""Top-level BEVRender model (model/bevrender.py) and its user-facing wrapper.

``BEVRenderNet`` is the flax module: learned BEV query embedding, recurrent
history warm-up (one encoder pass per history frame under ``stop_gradient``
and eval semantics — the reference wraps this in ``self.eval()`` +
``torch.no_grad()``, bevrender.py:124-134), a final gradient-carrying encoder
pass on the current frame, and the CNN render decoder.

``BEVRenderModel`` is the convenience wrapper that owns the config, precomputes
the per-stage voxel->camera reference points (host-side, baked as constants),
and exposes ``init`` / ``apply`` plus a torch-layout adapter (the reference
consumes (B, T, V, 3, H, W); internally everything is NHWC).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import FrozenDict

from bevrender_tpu.config import Config, ModelConfig
from bevrender_tpu.geometry.projection import (
    default_camera_rig,
    reference_points_all_types,
)
from bevrender_tpu.models.decoder import BEVImageRenderDecoder
from bevrender_tpu.models.encoder import BEVEncoder
from bevrender_tpu.models.layers import make_norm


class BEVRenderNet(nn.Module):
    cfg: ModelConfig
    axis_name: Optional[str] = None

    def setup(self):
        cfg = self.cfg
        H0 = W0 = cfg.bev_shapes[0]
        # learned BEV query (bevrender.py:81-84; uniform init per
        # bevrender.py:171-172).
        self.bev_embedding = self.param(
            "bev_embedding",
            lambda k, s: jax.random.uniform(k, s),
            (H0 * W0, cfg.embed_dims[0]),
        )
        self.encoder = BEVEncoder(cfg, axis_name=self.axis_name, name="encoder")
        if cfg.retrieval_embed_dim > 0:
            from bevrender_tpu.models.retrieval import RetrievalHead

            self.retrieval_head = RetrievalHead(
                embed_dim=cfg.retrieval_embed_dim,
                widths=cfg.retrieval_head_widths,
                name="retrieval_head",
            )
        self.decoder = BEVImageRenderDecoder(
            bev_spatial_dim=cfg.bev_shapes[-1],
            model_dim=cfg.embed_dims[-1],
            hid_dim=cfg.decoder_hid_dim,
            norm=make_norm(cfg.norm, axis_name=None),
            name="decoder",
        )

    def _bev_query(self, batch: int, dtype) -> jax.Array:
        H0 = W0 = self.cfg.bev_shapes[0]
        C0 = self.cfg.embed_dims[0]
        return jnp.broadcast_to(
            self.bev_embedding.reshape(1, H0, W0, C0), (batch, H0, W0, C0)
        ).astype(dtype)

    def _ref_pts(self, vehicle_type, reference_points):
        # vehicle type is constant within a batch (bevrender.py:123 uses
        # element [0, 0]); select each stage's reference points for it.
        vt = vehicle_type[0, 0].astype(jnp.int32)
        return tuple(jnp.take(rp, vt, axis=0) for rp in reference_points)

    def __call__(
        self,
        images: jax.Array,  # (B, T, V, H, W, 3) — T-1 history + current
        vehicle_pose: jax.Array,  # (B, T, 3) (x_pix, y_pix, heading)
        vehicle_type: jax.Array,  # (B, 1) int
        reference_points: Tuple[jax.Array, ...],  # per stage (types, V, h2, wd, 2)
        train: bool = False,
    ) -> jax.Array:
        B, T = images.shape[0], images.shape[1]
        bev_query = self._bev_query(B, images.dtype)
        ref_pts = self._ref_pts(vehicle_type, reference_points)

        # --- recurrent history warm-up (bevrender.py:179-221) ---
        # Runs in eval semantics (deterministic, BN running stats, history
        # alignment ON) with gradients cut, like eval()+no_grad upstream.
        # The loop is an nn.scan with broadcast params: the encoder traces
        # ONCE for any window length instead of T-1 times (frame 0's
        # degenerate no-history mode rides the traced `has_prev` flag,
        # selected inside TSA — TSA_deform_attn.py:141-143 semantics).
        prev_bev = None
        if T > 1:
            frames = jnp.swapaxes(images[:, : T - 1], 0, 1)  # (T-1, B, ...)
            pose_pairs = jnp.stack(
                [
                    jax.lax.dynamic_slice_in_dim(vehicle_pose, t, 2, axis=1)
                    for t in range(T - 1)
                ]
            )  # (T-1, B, 2, 3)
            has_prev = jnp.arange(T - 1) > 0

            def history_step(encoder, carry, xt):
                frame, pose_pair, hp = xt
                bev = encoder(
                    bev_query,
                    frame,
                    carry,
                    pose_pair,
                    ref_pts,
                    train=False,
                    align_history=True,
                    has_prev=hp,
                )
                return jax.lax.stop_gradient(bev), None

            scan = nn.scan(
                history_step,
                variable_broadcast=["params", "batch_stats"],
                split_rngs={"dropout": True, "params": False},
                in_axes=0,
                out_axes=0,
            )
            prev_bev, _ = scan(self.encoder, jnp.zeros_like(bev_query),
                               (frames, pose_pairs, has_prev))

        # --- gradient-carrying pass on the current frame (bevrender.py:138-146)
        # history alignment mirrors the reference's train/eval gating
        # (encoder.py:366: warp only when not training).
        if T == 1:
            # single-frame window: no history, so the (prev, current) pose
            # pair degenerates to (current, current) — the reference slice
            # pose[:, T-2:T] would be empty here (bevrender.py:144).
            pose_pair = jnp.concatenate([vehicle_pose, vehicle_pose], axis=1)
        else:
            pose_pair = vehicle_pose[:, T - 2 : T]
        bev = self.encoder(
            bev_query,
            images[:, -1],
            prev_bev,
            pose_pair,
            ref_pts,
            train=train,
            align_history=not train,
        )
        return self.decoder(bev, train)

    # --- streaming serving mode (TPU-native; the reference recomputes the
    # whole history window per frame because training samples are shuffled,
    # bevrender.py:124-134 — a deployed stream can instead carry the BEV
    # state and run ONE encoder pass per new frame) ---
    def encode_step(
        self,
        frame: jax.Array,  # (B, V, H, W, 3) current camera frame
        prev_bev: Optional[jax.Array],  # carried BEV state or None
        pose_pair: jax.Array,  # (B, 2, 3) (previous, current)
        vehicle_type: jax.Array,  # (B, 1)
        reference_points: Tuple[jax.Array, ...],
    ) -> jax.Array:
        bev_query = self._bev_query(frame.shape[0], frame.dtype)
        ref_pts = self._ref_pts(vehicle_type, reference_points)
        return self.encoder(
            bev_query, frame, prev_bev, pose_pair, ref_pts,
            train=False, align_history=True,
        )

    def decode(self, bev: jax.Array) -> jax.Array:
        return self.decoder(bev, False)

    def embed(self, images: jax.Array) -> jax.Array:
        """Retrieval embedding of an image batch (rendered aerial view OR
        geo-registered map tile — the head is Siamese; the reference's "map
        encoder" slot is identity, train.py:207-211).

        ``retrieval_embed_dim == 0`` keeps reference parity: the flattened
        image itself (train.py:224-232 feeds flattened renders/tiles to the
        metric losses). ``> 0`` routes through the trained conv head, which
        returns unit-norm (B, D) vectors.
        """
        if self.cfg.retrieval_embed_dim <= 0:
            return images.reshape(images.shape[0], -1)
        return self.retrieval_head(images)


def _call_and_embed(net: BEVRenderNet, images, vehicle_pose, vehicle_type,
                    reference_points, train=False):
    """init helper: touch both the render path and the retrieval head so one
    ``init`` populates every parameter (the head embeds the render AND the
    tile side at train time, but one call suffices to create its params)."""
    out = net(images, vehicle_pose, vehicle_type, reference_points, train=train)
    net.embed(out)
    return out


class BEVRenderModel:
    """Config + geometry + flax module bundle.

    The reference's ``BEVRender(config, logger, mode)`` constructor precomputes
    voxel->camera reference points through ``BEV2CameraProjector``
    (bevrender.py:30-41, SCA.py:38-40); here that happens once per distinct
    stage BEV shape and the tables ride into jit as constants.
    """

    def __init__(self, config: Config, mode: str = "train"):
        self.config = config
        self.mode = mode
        cfg = config.model

        from bevrender_tpu.models.layers import set_default_compute_dtype

        set_default_compute_dtype(cfg.dtype)

        imu_to_rgb = cfg.imu_to_rgb
        K = cfg.intrinsic_k
        if imu_to_rgb is None or K is None:
            # The published config is redacted (configuration/config.py:12-19);
            # fall back to a synthetic surround rig so the model is usable
            # out of the box.
            imu_to_rgb, K = default_camera_rig(
                n_views=cfg.num_views,
                img_width=cfg.ori_img_width,
                img_height=cfg.ori_img_height,
            )
        self.vehicle_types = sorted(imu_to_rgb.keys())

        self.reference_points: Tuple[jax.Array, ...] = tuple(
            jnp.asarray(
                reference_points_all_types(
                    imu_to_rgb=imu_to_rgb,
                    K=K,
                    vehicle_types=self.vehicle_types,
                    bev_bound=cfg.bev_bound,
                    bev_feat_shape=shape,
                    bev_depth_dim=cfg.bev_depth_dim,
                    z_shift=cfg.sample_z_shift,
                    img_width=cfg.img_width,
                    img_height=cfg.img_height,
                    ori_img_width=cfg.ori_img_width,
                    ori_img_height=cfg.ori_img_height,
                    remove_ref_in_gray=cfg.remove_ref_in_gray,
                    bound_check_img_paths=cfg.bound_check_img_paths,
                )
            )
            for shape in cfg.bev_shapes[: cfg.n_stages]
        )
        # axis_name stays None: under jit+GSPMD a mean over the (sharded)
        # batch axis is already a global reduction, so BatchNorm is
        # cross-replica ("SyncBN", train.py:129-137) without any named axis;
        # axis_name would only be needed under pmap/shard_map.
        self.net = BEVRenderNet(cfg, axis_name=None)

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array, sample_batch: Dict[str, jax.Array]):
        """Jitted init — eager flax init would dispatch every op singly, which
        is pathologically slow on this host and over the TPU tunnel."""

        @functools.partial(jax.jit)
        def _init(rng, camera, pose, vtype):
            method = (
                _call_and_embed
                if self.config.model.retrieval_embed_dim > 0
                else None
            )
            return self.net.init(
                rng, camera, pose, vtype, self.reference_points, train=False,
                method=method,
            )

        return _init(
            rng,
            sample_batch["camera"],
            sample_batch["vehicle_pose"],
            sample_batch["vehicle_type"],
        )

    def apply(
        self,
        variables,
        images: jax.Array,
        vehicle_pose: jax.Array,
        vehicle_type: jax.Array,
        *,
        train: bool = False,
        rngs: Optional[Dict[str, jax.Array]] = None,
        mutable=False,
    ):
        if self.mode != "train" and train:
            # the reference pins batch_size=1 outside training because its
            # query-embedding expansion is fixed at construction
            # (bevrender.py:19); this build broadcasts the query per call, so
            # batched inference is supported — only a *training* step on a
            # non-train-mode model is rejected.
            raise ValueError(
                f"mode={self.mode!r} BEVRenderModel cannot run a "
                "training step; construct with mode='train'"
            )
        return self.net.apply(
            variables,
            images,
            vehicle_pose,
            vehicle_type,
            self.reference_points,
            train=train,
            rngs=rngs,
            mutable=mutable,
        )

    def embed(self, variables, images: jax.Array) -> jax.Array:
        """Retrieval embedding (see :meth:`BEVRenderNet.embed`); pass the
        SAME ``variables`` used for the forward pass so gradients reach the
        head when called under ``value_and_grad``."""
        return self.net.apply(variables, images, method=BEVRenderNet.embed)

    # ------------------------------------------------------------------
    @staticmethod
    def from_torch_layout(images_nchw: jax.Array) -> jax.Array:
        """(B, T, V, 3, H, W) -> (B, T, V, H, W, 3) — accept the reference's
        input layout (bevrender.py:106)."""
        return jnp.transpose(images_nchw, (0, 1, 2, 4, 5, 3))

    @staticmethod
    def to_torch_layout(render_nhwc: jax.Array) -> jax.Array:
        """(B, H, W, 3) -> (B, 3, H, W) — the reference's output layout."""
        return jnp.transpose(render_nhwc, (0, 3, 1, 2))

    def param_count(self, variables) -> int:
        return sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"])
        )

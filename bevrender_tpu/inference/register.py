"""Render + register: the inference entry point the reference never shipped.

The reference implies inference (``mode="inference"`` windows, dataset.py:118-119;
batch-1 model mode, bevrender.py:19; the saved ``inference_dataset.pth`` split,
train.py:801-804) but has no ``infer()``/``serve()`` function (SURVEY 3.5).
This module provides the end-to-end loop the north-star metric measures:
render an aerial view from surround cameras, correlate it against a database
of geo-registered aerial map tiles, and retrieve the pose (recall@K).

Everything device-side is one jitted function per stage; the tile database
stays resident in HBM as a single (N, D) matrix so each query is one matmul
on the MXU.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bevrender_tpu.config import Config
from bevrender_tpu.losses.recall import recall_at_k
from bevrender_tpu.models.bevrender import BEVRenderModel, BEVRenderNet


def BEVRenderNet_encode_step(net, *args, **kw):
    return net.encode_step(*args, **kw)


def BEVRenderNet_decode(net, *args, **kw):
    return net.decode(*args, **kw)


def _l2n(x: jax.Array) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class RegistrationPipeline:
    """Load a trained BEVRender, embed map tiles, register camera windows."""

    def __init__(
        self,
        config: Config,
        variables,
        embed_fn=None,
    ):
        self.config = config
        self.model = BEVRenderModel(config, mode="inference")
        self.variables = variables
        self.embed_fn = embed_fn

        # retrieval embedding of an image batch -> unit-norm (B, D):
        # explicit embed_fn > trained Siamese head (retrieval_embed_dim > 0,
        # models/retrieval.py) > reference-parity flatten. All branches take
        # (variables, images) so the head's trained params ride along.
        if embed_fn is not None:
            self._embed_images = lambda v, images: _l2n(embed_fn(images))
        elif config.model.retrieval_embed_dim > 0:
            self._embed_images = (
                lambda v, images: self.model.embed(v, images)  # unit-norm
            )
        else:
            self._embed_images = lambda v, images: _l2n(
                images.reshape(images.shape[0], -1)
            )

        def render(variables, camera, pose, vtype):
            return self.model.apply(variables, camera, pose, vtype, train=False)

        self._render = jax.jit(render)

        def embed_render(variables, camera, pose, vtype):
            out = render(variables, camera, pose, vtype)
            return out, self._embed_images(variables, out)

        self._embed_render = jax.jit(embed_render)
        self._embed_tiles = jax.jit(lambda v, t: self._embed_images(v, t))
        self._tile_db: Optional[jax.Array] = None

        def match(query_emb, db, k: int):
            # distance 2 - 2 s (train.py:554 convention); top-k by
            # similarity. The query matmul runs at the database dtype (bf16
            # databases hit the MXU's native input type) with f32
            # accumulation, and lax.top_k replaces a full (B, N) argsort —
            # at production database scale (thousands of tiles) a full sort
            # costs more than the matmul itself.
            sims = jax.lax.dot_general(
                query_emb.astype(db.dtype), db,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            neg_dist, idx = jax.lax.top_k(-(2.0 - 2.0 * sims), k)
            return idx, -neg_dist

        self._match = jax.jit(match, static_argnums=2)

        def register_fused(variables, camera, pose, vtype, db, k: int):
            # render -> embed -> match in ONE device program: the query
            # embedding never leaves HBM and the host pays ONE dispatch RPC
            # per registration instead of two (measured on the tunnel-attached
            # chip: the two-dispatch r4 path spent ~3x the device time in
            # wall-clock at 16k tiles — REGISTER_SCALE_BENCH.json r4/r5).
            out = render(variables, camera, pose, vtype)
            emb = self._embed_images(variables, out)
            idx, dist = match(emb, db, k)
            return out, idx, dist

        self._register_fused = jax.jit(register_fused, static_argnums=5)

    @classmethod
    def from_checkpoint(cls, config: Config, ckpt_path: str, sample_batch,
                        embed_fn=None) -> "RegistrationPipeline":
        from bevrender_tpu.training.checkpoint import restore_model

        model = BEVRenderModel(config, mode="inference")
        variables = model.init(jax.random.PRNGKey(0), sample_batch)
        restored = restore_model(
            ckpt_path,
            {
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
                "opt_state": None,
            },
        )
        out_vars = {"params": restored["params"]}
        if restored.get("batch_stats"):
            out_vars["batch_stats"] = restored["batch_stats"]
        return cls(config, out_vars, embed_fn)

    # ------------------------------------------------------------------
    # Streaming serving: carry the BEV state across frames — one encoder
    # pass + decode per frame instead of re-running the T-frame history
    # window (see BEVRenderNet.encode_step).
    def make_streaming_step(self):
        net = self.model.net
        refs = self.model.reference_points

        @jax.jit
        def step(variables, frame, prev_bev, pose_pair, vtype, tiles):
            bev = net.apply(
                variables, frame, prev_bev, pose_pair, vtype, refs,
                method=BEVRenderNet_encode_step,
            )
            out = net.apply(variables, bev, method=BEVRenderNet_decode)
            emb = self._embed_images(variables, out)
            dist = 2.0 - 2.0 * emb @ tiles.T
            return bev, out, jnp.argmin(dist, axis=-1)

        return step

    def make_replay_scan(self):
        """Offline trace replay: ONE jitted dispatch registers a whole
        ordered frame sequence.

        ``lax.scan`` carries the BEV state over a ``(T, B, V, H, W, 3)``
        frame stack (streaming `encode_step` semantics — one encoder pass
        per frame), registering every frame against the resident tile
        database in a single device program. Amortizes the per-frame
        dispatch/RPC cost of :meth:`make_streaming_step` for batch
        re-localization of recorded traces; the reference has neither
        streaming nor replay (it re-runs the full history window per sample,
        bevrender.py:124-134).

        Returns ``replay(variables, frames, pose_pairs, vtype, tiles) ->
        (final_bev, (T, B) tile indices, (T, B) distances)`` where
        ``pose_pairs`` is ``(T, B, 2, 3)`` (previous, current) per frame and
        frame 0 starts with no carried BEV (TSA degenerates to
        self-attention, TSA_deform_attn.py:141-143 parity).
        """
        net = self.model.net
        refs = self.model.reference_points

        def one(variables, frame, bev, pose_pair, vtype, tiles):
            bev = net.apply(
                variables, frame, bev, pose_pair, vtype, refs,
                method=BEVRenderNet_encode_step,
            )
            out = net.apply(variables, bev, method=BEVRenderNet_decode)
            emb = self._embed_images(variables, out)
            dist = 2.0 - 2.0 * emb @ tiles.T
            return bev, jnp.argmin(dist, axis=-1), jnp.min(dist, axis=-1)

        @jax.jit
        def replay(variables, frames, pose_pairs, vtype, tiles):
            # frame 0 has no carried state (prev_bev=None is a static arg,
            # so it runs outside the scan); frames 1..T-1 scan over the
            # carried BEV
            bev, idx0, d0 = one(
                variables, frames[0], None, pose_pairs[0], vtype, tiles
            )

            def body(bev, xs):
                frame, pose_pair = xs
                bev, idx, d = one(variables, frame, bev, pose_pair, vtype, tiles)
                return bev, (idx, d)

            bev, (idx, d) = jax.lax.scan(
                body, bev, (frames[1:], pose_pairs[1:])
            )
            return (
                bev,
                jnp.concatenate([idx0[None], idx]),
                jnp.concatenate([d0[None], d]),
            )

        return replay

    def render(self, batch: Dict[str, jax.Array]) -> jax.Array:
        """(B, T, V, H, W, 3) camera window -> (B, 224, 224, 3) aerial render."""
        return self._render(
            self.variables, batch["camera"], batch["vehicle_pose"],
            batch["vehicle_type"],
        )

    def build_tile_database(
        self,
        tiles: Iterable[np.ndarray],
        batch_size: int = 256,
        dtype=None,
    ) -> jax.Array:
        """Embed geo-registered aerial tiles -> (N, D) resident matrix.

        Tiles are embedded with the same flatten+normalize as the render
        (symmetric, since the reference's map encoder is identity —
        train.py:207-211 with ``map_encoder=None``).

        Tiles are processed in jitted batches of ``batch_size`` (one device
        dispatch per batch, not per tile — at production database scale,
        thousands of tiles, per-tile dispatch would dominate build time).
        ``dtype`` (e.g. ``jnp.bfloat16``) stores the database at reduced
        precision: at 16k tiles the FLATTEN path's f32 matrix is 9.6 GB —
        over half the v5e's 16 GB HBM — while bf16 halves residency and runs
        the query matmul on the MXU's native input type (f32 accumulation).
        With the trained head (``retrieval_embed_dim > 0``) the same 16k
        tiles embed to ~16 MB f32 and dtype is moot.

        When ``tiles`` has a known length the database is built by donated
        in-place ``dynamic_update_slice`` fills into ONE preallocated (N, D)
        buffer — a growing list + final concatenate would transiently hold
        2x the database (fatal at flatten-path scale).
        """
        embed = self._embed_tiles

        def fill(db, e, row):  # donated in-place row-block write
            return jax.lax.dynamic_update_slice(
                db, e.astype(db.dtype), (row, 0)
            )

        fill = jax.jit(fill, donate_argnums=0)

        db = None
        row = 0
        embs = []  # only used on the unknown-length fallback path
        n_total = len(tiles) if hasattr(tiles, "__len__") else None
        buf: list = []

        def flush():
            nonlocal db, row
            if not buf:
                return
            e = embed(self.variables, jnp.asarray(np.stack(buf)))
            if n_total is not None:
                if db is None:
                    db = jnp.zeros(
                        (n_total, e.shape[1]), dtype or e.dtype
                    )
                db = fill(db, e, row)
                row += e.shape[0]
            else:
                embs.append(e.astype(dtype) if dtype is not None else e)
            buf.clear()

        for tile in tiles:
            buf.append(np.asarray(tile))
            if len(buf) == batch_size:
                flush()
        flush()
        if db is None and not embs:
            raise ValueError(
                "build_tile_database: no tiles provided (empty iterable)"
            )
        self._tile_db = db if db is not None else jnp.concatenate(embs, axis=0)
        return self._tile_db

    def register(
        self, batch: Dict[str, jax.Array], top_k: int = 10
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Render + correlate against the tile database.

        One fused device dispatch (render -> embed -> top-k match); returns
        (rendered, top_k tile indices, top_k distances).
        """
        if self._tile_db is None:
            raise RuntimeError("call build_tile_database first")
        k = min(top_k, self._tile_db.shape[0])
        return self._register_fused(
            self.variables, batch["camera"], batch["vehicle_pose"],
            batch["vehicle_type"], self._tile_db, k,
        )

    # ------------------------------------------------------------------
    # Mesh-sharded registration: for production-scale tile databases the
    # (N, D) matrix outgrows one chip's HBM; shard it over the mesh and
    # merge per-shard top-k with one small all-gather over ICI. The
    # reference holds the whole database in host numpy (train.py:384-395)
    # and cannot scale it at all.
    def make_sharded_matcher(self, mesh, axis: str = "data", top_k: int = 10):
        """Build a jitted (query_emb, db) -> (top-k indices, distances)
        matcher with ``db`` sharded over ``mesh`` axis ``axis``.

        ``db`` must be padded to a multiple of the axis size (use
        :func:`pad_tile_db`); pad rows are reported as +inf distance and can
        never enter the top-k while ``top_k <= n_real``. Each shard computes
        its local (B, k) candidates on the MXU, then one (B, k * n_shards)
        all-gather + merge produces exact global top-k — the full (B, N)
        distance matrix never crosses the interconnect.
        """
        from jax.sharding import PartitionSpec as P

        try:  # jax >= 0.6: public API, `check_vma`
            from jax import shard_map as _shard_map

            norep = {"check_vma": False}
        except ImportError:  # older: experimental location, `check_rep`
            from jax.experimental.shard_map import shard_map as _shard_map

            norep = {"check_rep": False}

        n_shards = mesh.shape[axis]

        def local_match(q, db_shard, nreal):
            # q: (B, D) replicated; db_shard: (Nl, D); nreal: () replicated
            nl = db_shard.shape[0]
            shard = jax.lax.axis_index(axis)
            dist = 2.0 - 2.0 * (q @ db_shard.T)  # (B, Nl)
            gidx0 = shard * nl + jnp.arange(nl, dtype=jnp.int32)
            dist = jnp.where(gidx0[None, :] < nreal, dist, jnp.inf)
            k = min(top_k, nl)
            neg, lidx = jax.lax.top_k(-dist, k)  # (B, k)
            gidx = shard * nl + lidx.astype(jnp.int32)
            cand_d = jax.lax.all_gather(-neg, axis, axis=1, tiled=True)
            cand_i = jax.lax.all_gather(gidx, axis, axis=1, tiled=True)
            neg2, sel = jax.lax.top_k(-cand_d, min(top_k, k * n_shards))
            return jnp.take_along_axis(cand_i, sel, axis=1), -neg2

        # outputs ARE replicated (identical all-gathered candidates +
        # deterministic top_k on every shard) but the static replication
        # checker cannot infer it through top_k/take_along_axis
        fn = _shard_map(
            local_match,
            mesh=mesh,
            in_specs=(P(), P(axis, None), P()),
            out_specs=(P(), P()),
            **norep,
        )
        return jax.jit(fn)

    @staticmethod
    def pad_tile_db(db: jax.Array, n_shards: int) -> Tuple[jax.Array, int]:
        """Pad the (N, D) database to a multiple of ``n_shards`` rows.

        Returns (padded db, N) — pass N as ``nreal`` to the sharded matcher
        so pad rows are masked to +inf distance.
        """
        n = db.shape[0]
        pad = (-n) % n_shards
        if pad:
            db = jnp.concatenate([db, jnp.zeros((pad, db.shape[1]), db.dtype)])
        return db, n

    # ------------------------------------------------------------------
    def evaluate_recall(self, dataset, batch_size: int = 1) -> Dict[str, float]:
        """Paired recall@1/5/10 over a dataset of (camera window, map tile)."""
        from bevrender_tpu.data.prefetch import DataLoader, device_prefetch

        cams, maps = [], []
        loader = DataLoader(dataset, batch_size, shuffle=False, drop_last=False)
        for batch in device_prefetch(iter(loader)):
            _, emb = self._embed_render(
                self.variables, batch["camera"], batch["vehicle_pose"],
                batch["vehicle_type"],
            )
            cams.append(np.asarray(emb))
            maps.append(np.asarray(self._embed_tiles(self.variables, batch["map"])))
        cam = jnp.asarray(np.concatenate(cams))
        map_ = jnp.asarray(np.concatenate(maps))
        r1, r5, r10 = recall_at_k(cam, map_, (1, 5, 10))
        return {"R@1": float(r1), "R@5": float(r5), "R@10": float(r10)}

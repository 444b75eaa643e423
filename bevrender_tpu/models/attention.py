"""Deformable attention modules: TSA (temporal) and SCA (spatial cross).

TPU-native redesigns of model/TSA_deform_attn.py and model/SCA_deform_attn.py.
Differences from the reference, made deliberately (SURVEY section 7 "hard
parts"):

* NHWC layout; 1x1 convs become channel Dense layers.
* The per-view Python loop of SCA (SCA_deform_attn.py:213) stays a static
  3-iteration loop inside jit (XLA parallelizes freely); each view has its own
  offset head like the reference's ``conv_offset_m{0,1,2}``.
* The reference's per-view offset heads are shape-inconsistent: m0 emits
  ``depth`` channels and splits BEV rows in half to produce (y, x) components
  (SCA_deform_attn.py:56-77, 248-255), while m1/m2 emit ``2*depth`` channels
  that cannot satisfy the same rearrange (78-121). We keep m0's key geometry —
  the key plane is ``(bev_h/2, bev_w*depth)``, matching the projected voxel
  grid of model/SCA.py:112-162 — but produce offsets with a stride-(2,1) conv
  emitting ``2*depth`` channels, which is shape-consistent for every view.
* ``proj_q`` (constructed but never applied, SCA_deform_attn.py:123-125;
  queries enter attention raw at :304) and ``proj_views`` (unused, :147-153)
  are not re-created.
* The dense (M, N) attention + rpe grid_sample is replaced by the streamed
  chunked kernel in ops/deform_attn.py (identical math, bounded memory).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from bevrender_tpu.models.layers import Conv, Dense, trunc_normal_init
from bevrender_tpu.ops.deform_attn import (
    lattice_shift_class,
    streamed_deform_attention,
)
from bevrender_tpu.ops.grid_sample import grid_sample_2d_mm, normalized_grid
from bevrender_tpu.parallel.annotate import hint


def _counting_rank8(cls: jax.Array) -> jax.Array:
    """Stable sorted position of each element for 8-valued int keys.

    ``rank[i] = (# keys with class < cls_i) + (# j <= i with cls_j == cls_i)
    - 1`` — the stable counting-sort rank, built from a one-hot cumsum
    instead of a sort network (XLA's TPU sort is an O(N log^2 N) bitonic
    network; this is O(8N) vector work).
    """
    onehot = (cls[..., None] == jnp.arange(8, dtype=cls.dtype)).astype(
        jnp.int32
    )  # (..., N, 8)
    within = jnp.cumsum(onehot, axis=-2)  # inclusive per-class prefix counts
    totals = within[..., -1:, :]  # (..., 1, 8)
    offsets = jnp.cumsum(totals, axis=-1) - totals  # exclusive class starts
    return jnp.sum(onehot * (within + offsets), axis=-1) - 1


def _sort_keys_by_shift(pos, B, G, N, table_shape, H, W):
    """Reorder sampled-key positions by their lattice shift class (0..7).

    Attention over sampled keys is permutation-invariant, and the fused bias
    kernel (ops/pallas/lattice_bias.py) resolves the per-key sublane shift
    with one masked pass per class present in a tile — sorted keys make that
    ~1 executed branch instead of 8. K/V are gathered *after* this reorder so
    they stay aligned with the positions; gradients flow back through the
    take_along_axis scatter.

    The shift-replicated kernels (deform_attn.use_shift_replica) have no
    resolve stage at all, so the sort is skipped entirely there — key order
    is irrelevant to an always-aligned extraction.

    BEVRENDER_SHIFT_SORT=count swaps the argsort for a counting-rank scatter
    (same stable order; read at trace time — an A/B knob for benching).
    """
    import os

    from bevrender_tpu.ops.deform_attn import use_shift_replica

    flat = pos.reshape(B, G, N, 2)
    if use_shift_replica(table_shape, H, W):
        return flat.reshape(B * G, N, 2)
    cls = lattice_shift_class(table_shape, flat, H, W)
    if os.environ.get("BEVRENDER_SHIFT_SORT") == "count":
        rank = _counting_rank8(cls)
        flat = jnp.put_along_axis(
            jnp.empty_like(flat),
            jnp.broadcast_to(rank[..., None], flat.shape),
            flat, axis=2, inplace=False,
        )
        return flat.reshape(B * G, N, 2)
    order = jnp.argsort(cls, axis=-1, stable=True)
    flat = jnp.take_along_axis(flat, order[..., None], axis=2)
    return flat.reshape(B * G, N, 2)


def _shard_heads(x: jax.Array) -> jax.Array:
    """TP hint: (B, G, Hpg, M, ch) with heads-per-group over the model axis."""
    return hint(x, "data", None, "model", None, None)


def _split_heads(x: jax.Array, n_groups: int, heads_per_group: int) -> jax.Array:
    """(B, M, C) -> (B, G, Hpg, M, ch). Channel nesting matches the reference:
    group-major, then head (TSA_deform_attn.py:219-235)."""
    B, M, C = x.shape
    ch = C // (n_groups * heads_per_group)
    x = x.reshape(B, M, n_groups, heads_per_group, ch)
    return x.transpose(0, 2, 3, 1, 4)


def _merge_heads(x: jax.Array) -> jax.Array:
    """(B, G, Hpg, M, ch) -> (B, M, C)."""
    B, G, Hpg, M, ch = x.shape
    return x.transpose(0, 3, 1, 2, 4).reshape(B, M, G * Hpg * ch)


class _OffsetScale:
    """tanh-bounded offset range (SCA_deform_attn.py:260-267)."""

    @staticmethod
    def apply(offset, hk, wk, factor):
        rng = jnp.asarray([1.0 / (hk - 1.0), 1.0 / (wk - 1.0)], offset.dtype)
        return jnp.tanh(offset) * rng * factor


class TSADeformableAttention(nn.Module):
    """Temporal self-attention over the BEV plane (TSA_deform_attn.py:14-337).

    Keys are sampled from the (ego-motion-aligned) previous BEV map at learned
    offsets around a strided reference grid; when no history exists the module
    degenerates to deformable self-attention on the current query
    (TSA_deform_attn.py:141-143 — handled by the caller passing
    ``prev_bev=None``).
    """

    dim: int
    n_heads: int
    n_groups: int
    stride: int
    kernel_size: int
    scale_offset_range: bool = True
    offset_range_factor: float = 0.5  # TSA_deform_attn.py:50-52
    attn_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    chunk: int = 512
    use_pallas: bool = True

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, H, W, C)
        prev_bev: Optional[jax.Array],  # (B, H, W, C) or None
        deterministic: bool = True,
        has_prev: Optional[jax.Array] = None,
    ) -> jax.Array:
        B, H, W, C = query.shape
        G = self.n_groups
        Cg = C // G
        Hpg = self.n_heads // G
        ch = C // self.n_heads
        # degenerate self-attention when no history (TSA_deform_attn.py:141-143);
        # `has_prev` is the traced-bool variant used under lax/nn.scan where
        # prev_bev is always an array.
        if prev_bev is None:
            x = query
        elif has_prev is None:
            x = prev_bev
        else:
            x = jnp.where(has_prev, prev_bev, query)

        # --- offsets from grouped query (TSA_deform_attn.py:54-68,158-174) ---
        qg = query.reshape(B, H, W, G, Cg).transpose(0, 3, 1, 2, 4)
        qg = qg.reshape(B * G, H, W, Cg)
        # grouped/depthwise offset convs cannot be channel-sharded by GSPMD
        qg = hint(qg, "data", None, None, None)
        pad = self.kernel_size // 2 if self.kernel_size != self.stride else 0
        off = Conv(
            Cg,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=Cg,
            name="offset_dwconv",
        )(qg)
        off = nn.LayerNorm(name="offset_norm")(off)
        off = nn.gelu(off)
        off = Conv(2, (1, 1), use_bias=False, name="offset_proj")(off)
        # (B*G, Hk, Wk, 2) channels = (y, x)
        Hk, Wk = off.shape[1], off.shape[2]
        N = Hk * Wk

        ref = normalized_grid(Hk, Wk, off.dtype)  # (Hk, Wk, 2) (y, x)
        if self.scale_offset_range:
            off = _OffsetScale.apply(off, Hk, Wk, self.offset_range_factor)
            pos = off + ref[None]
        else:
            pos = jnp.clip(off + ref[None], -1.0, 1.0)
        if self.use_pallas:
            pos = _sort_keys_by_shift(
                pos, B, G, N, (G, Hpg, 2 * H - 1, 2 * W - 1), H, W
            )

        # --- K/V gather from (prev) BEV (TSA_deform_attn.py:210-217) ---
        xg = x.reshape(B, H, W, G, Cg).transpose(0, 3, 1, 2, 4).reshape(B * G, H, W, Cg)
        # matmul-form bilinear sampling: TPUs have no hardware gather, and the
        # two dense contractions measure ~10x faster than the gather form at
        # these K/V shapes (WRAPPER_BENCH.json: 0.41 -> 0.04 ms)
        kv = grid_sample_2d_mm(xg, pos[..., ::-1])  # (x, y) order for sampling
        kv = kv.astype(x.dtype)
        kv = kv.reshape(B, G, N, Cg).transpose(0, 2, 1, 3).reshape(B, N, C)
        k = Dense(C, name="proj_k")(kv)
        v = Dense(C, name="proj_v")(kv)

        # --- streamed attention with rpe bias (TSA_deform_attn.py:245-330) ---
        rpe = self.param(
            "rpe_table",
            trunc_normal_init(0.01),
            (self.n_heads, 2 * H - 1, 2 * W - 1),
        )
        q = query.reshape(B, H * W, C)
        out = streamed_deform_attention(
            _shard_heads(_split_heads(q, G, Hpg)),
            _shard_heads(_split_heads(k, G, Hpg)),
            _shard_heads(_split_heads(v, G, Hpg)),
            normalized_grid(H, W, q.dtype).reshape(H * W, 2),
            pos.reshape(B, G, N, 2),
            rpe.reshape(G, Hpg, 2 * H - 1, 2 * W - 1),
            scale=ch**-0.5,
            chunk=self.chunk,
            lattice_hw=(H, W),
            lattice_kernel=self.use_pallas,
            # fused site only at eval: its backward recomputes through the
            # XLA consumer, so it loses fwd+bwd (ops/deform_attn.py)
            fuse_site=deterministic,
            dropout_rate=self.attn_drop_rate if not deterministic else 0.0,
            dropout_rng=(
                self.make_rng("dropout")
                if (self.attn_drop_rate > 0.0 and not deterministic)
                else None
            ),
        )
        out = _merge_heads(out).reshape(B, H, W, C)
        out = Dense(C, name="proj_out")(out)
        out = nn.Dropout(self.proj_drop_rate, deterministic=deterministic)(out)
        return out


class SCADeformableAttention(nn.Module):
    """Spatial cross-attention: BEV queries attend into camera views
    (SCA_deform_attn.py:14-421).

    For each view, a per-view offset head perturbs the precomputed voxel->pixel
    reference points; K/V are bilinearly gathered from that view's feature map;
    streamed attention with a continuous rpe bias produces per-view BEV
    features, which are concatenated over views and fused by ``proj_out``
    (SCA_deform_attn.py:415-420).
    """

    dim: int
    n_heads: int
    n_groups: int
    bev_depth_dim: int
    n_views: int = 3
    scale_offset_range: bool = True
    offset_range_factor: float = 5.0  # SCA_deform_attn.py:52-54
    attn_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    chunk: int = 512
    use_pallas: bool = True

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, H, W, C)
        img_feat: jax.Array,  # (B, V, Hi, Wi, C)
        reference_points: jax.Array,  # (V, H//2, W*depth, 2) in (x, y)
        deterministic: bool = True,
    ) -> jax.Array:
        B, H, W, C = query.shape
        G = self.n_groups
        Cg = C // G
        Hpg = self.n_heads // G
        ch = C // self.n_heads
        d = self.bev_depth_dim
        # key-plane rows come from the projected voxel grid: H//2 for even
        # BEV heights, ceil(H/2) for odd (the reference's arange over the BEV
        # bound includes the endpoint cell at odd sizes, SCA.py:112-162)
        H2 = reference_points.shape[1]
        N = H2 * W * d

        qg = query.reshape(B, H, W, G, Cg).transpose(0, 3, 1, 2, 4)
        qg = qg.reshape(B * G, H, W, Cg)
        # grouped/depthwise offset convs cannot be channel-sharded by GSPMD
        qg = hint(qg, "data", None, None, None)
        q_flat = query.reshape(B, H * W, C)
        q_pos = normalized_grid(H, W, query.dtype).reshape(H * W, 2)

        rpe = self.param(
            "rpe_table",
            trunc_normal_init(0.01),
            (self.n_heads, 2 * H - 1, 2 * W * d - 1),
        )
        rpe = rpe.reshape(G, Hpg, 2 * H - 1, 2 * W * d - 1)

        # K/V projections are shared across views (SCA_deform_attn.py:126-139,
        # applied inside the view loop at :312-321).
        proj_k = Dense(C, name="proj_k")
        proj_v = Dense(C, name="proj_v")

        # --- per-view offset heads (cf. conv_offset_m{view},
        # SCA_deform_attn.py:56-121; see module docstring for the
        # shape-consistent redesign). Params stay per-view.
        # BEVRENDER_FOLD_VIEWS (trace-time A/B knob) batches all views
        # into ONE site call (B-major fold, GSPMD-contiguous). History:
        # round 3 measured fold SLOWER everywhere (g8 0.94x, g4 0.96x,
        # g1 0.81x) and defaulted to the loop; round 5 re-ran the A/B on
        # top of the g-major staged-table grid order (FOLD_VIEWS_AB.json):
        # with the ~8 MB staged table resident across the folded B*V cells,
        # fold WINS at G>=4 (g8 1.036x, g4 1.04x) and still loses at
        # G<=2 (g1 0.74x, g2 0.81x) — so the default folds only the
        # many-group stages. ---
        import os

        _fv = os.environ.get("BEVRENDER_FOLD_VIEWS")
        fold_views = (G >= 4) if _fv is None else _fv == "1"
        V = self.n_views
        view_pos = []
        for view in range(V):
            off = Conv(
                Cg * d,
                (1, 1),
                feature_group_count=Cg,
                name=f"offset_expand_m{view}",
            )(qg)
            off = nn.LayerNorm(name=f"offset_norm_m{view}")(off)
            off = nn.gelu(off)
            off = Conv(
                2 * d,
                (2, 1),
                strides=(2, 1),
                use_bias=False,
                name=f"offset_proj_m{view}",
            )(off)
            # (B*G, ceil(H/2), W, 2*d) -> (B*G, H2, W*d, 2), keys laid out
            # (h, (w d)) exactly as the reference grid (model/SCA.py:77-85).
            # Odd BEV heights (pyramid stage 7) make the stride-2 conv emit
            # ceil(H/2) rows; the key plane is H//2 (SCA.py:112-162) — crop.
            off = off[:, :H2]
            off = off.reshape(B * G, H2, W, d, 2).reshape(B * G, H2, W * d, 2)

            # reference points arrive in (x, y); offsets are (y, x) like the
            # reference's grid convention (SCA_deform_attn.py:203-204).
            ref = reference_points[view][..., ::-1]  # (H2, W*d, 2) (y, x)
            if self.scale_offset_range:
                off = _OffsetScale.apply(off, H2, W * d, self.offset_range_factor)
                pos = off + ref[None]
            else:
                pos = jnp.clip(off + ref[None], -1.0, 1.0)
            view_pos.append(pos.reshape(B, G, N, 2))

        table_shape = (G, Hpg, 2 * H - 1, 2 * W * d - 1)
        attn_kwargs = dict(
            scale=ch**-0.5,
            chunk=self.chunk,
            lattice_hw=(H, W),
            lattice_kernel=self.use_pallas,
            # fused site only at eval (see TSA note / ops/deform_attn.py)
            fuse_site=deterministic,
            dropout_rate=self.attn_drop_rate if not deterministic else 0.0,
        )
        use_dropout = self.attn_drop_rate > 0.0 and not deterministic

        if fold_views:
            # (B, V, G, N, 2) -> (B*V, G, N, 2): one site call for all views
            pos = jnp.stack(view_pos, axis=1).reshape(B * V, G, N, 2)
            if self.use_pallas:
                pos = _sort_keys_by_shift(
                    pos, B * V, G, N, table_shape, H, W
                ).reshape(B * V, G, N, 2)

            # --- K/V gather, all views (SCA_deform_attn.py:290-301) ---
            Hi, Wi = img_feat.shape[2], img_feat.shape[3]
            fg = img_feat.reshape(B * V, Hi, Wi, G, Cg)
            fg = fg.transpose(0, 3, 1, 2, 4).reshape(B * V * G, Hi, Wi, Cg)
            # matmul-form sampling (see TSA note; gathers serialize on TPU)
            kv = grid_sample_2d_mm(
                fg, pos.reshape(B * V * G, N, 2)[..., ::-1]
            ).astype(img_feat.dtype)
            kv = kv.reshape(B * V, G, N, Cg).transpose(0, 2, 1, 3)
            kv = kv.reshape(B * V, N, C)
            k = proj_k(kv)
            v = proj_v(kv)

            q5 = _split_heads(q_flat, G, Hpg)  # (B, G, Hpg, M, ch)
            q_rep = jnp.broadcast_to(
                q5[:, None], (B, V) + q5.shape[1:]
            ).reshape(B * V, G, Hpg, H * W, ch)
            out = streamed_deform_attention(
                _shard_heads(q_rep),
                _shard_heads(_split_heads(k, G, Hpg)),
                _shard_heads(_split_heads(v, G, Hpg)),
                q_pos,
                pos,
                rpe,
                # one dropout rng for the folded call (the unfolded loop drew
                # one per view; both are valid iid dropout)
                dropout_rng=self.make_rng("dropout") if use_dropout else None,
                **attn_kwargs,
            )
            out = _merge_heads(out)  # (B*V, M, C)
            out = out.reshape(B, V, H, W, C).transpose(0, 2, 3, 1, 4)
            out = out.reshape(B, H, W, V * C)
        else:
            view_outputs = []
            for view in range(V):
                pos = view_pos[view].reshape(B * G, N, 2)
                if self.use_pallas:
                    pos = _sort_keys_by_shift(
                        pos, B, G, N, table_shape, H, W
                    )

                # --- K/V gather from this view ---
                feat = img_feat[:, view]  # (B, Hi, Wi, C)
                Hi, Wi = feat.shape[1], feat.shape[2]
                fg = feat.reshape(B, Hi, Wi, G, Cg).transpose(0, 3, 1, 2, 4)
                fg = fg.reshape(B * G, Hi, Wi, Cg)
                kv = grid_sample_2d_mm(fg, pos[..., ::-1]).astype(feat.dtype)
                kv = kv.reshape(B, G, N, Cg).transpose(0, 2, 1, 3)
                kv = kv.reshape(B, N, C)
                k = proj_k(kv)
                v = proj_v(kv)

                out = streamed_deform_attention(
                    _shard_heads(_split_heads(q_flat, G, Hpg)),
                    _shard_heads(_split_heads(k, G, Hpg)),
                    _shard_heads(_split_heads(v, G, Hpg)),
                    q_pos,
                    pos.reshape(B, G, N, 2),
                    rpe,
                    dropout_rng=(
                        self.make_rng("dropout") if use_dropout else None
                    ),
                    **attn_kwargs,
                )
                view_outputs.append(_merge_heads(out).reshape(B, H, W, C))
            out = jnp.concatenate(view_outputs, axis=-1)  # (B, H, W, V*C)

        out = Dense(C, name="proj_out")(out)
        out = nn.Dropout(self.proj_drop_rate, deterministic=deterministic)(out)
        return out

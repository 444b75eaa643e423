"""Streamed (flash-style) deformable attention with continuous rpe bias.

This is the TPU-native replacement for the reference's dense attention path
(SCA_deform_attn.py:331-413 and TSA_deform_attn.py:245-330):

    scores = q @ k^T * scale
    bias   = grid_sample(rpe_table, 0.5 * (q_grid[:, None] - k_pos[None, :]))
    out    = softmax(scores + bias) @ v

The reference materializes the full (M, N) score matrix *and* an (M, N, 2)
displacement tensor in HBM (e.g. 3136 x 7840 x 2 floats per group per view).
Here the query axis is processed in chunks under ``jax.checkpoint``: each chunk
computes scores + bias + softmax + AV and only the chunk output survives, so
peak memory is O(chunk * N) instead of O(M * N) and the backward pass
recomputes instead of storing attention probabilities. The chunk loop is a
``lax.map`` — static shapes, MXU-friendly matmuls.

Shape conventions (B batch, G offset groups, Hpg heads per group, ch head
channels, M queries, N sampled keys):

    q:        (B, G, Hpg, M, ch)
    k, v:     (B, G, Hpg, N, ch)
    q_pos:    (M, 2)        (y, x) in [-1, 1] — query-grid positions
    k_pos:    (B, G, N, 2)  (y, x) in [-1, 1] — sampled key positions
    rpe_table:(G, Hpg, Ht, Wt) — continuous relative-position bias tables

The bias lookup replicates ``F.grid_sample(..., align_corners=True)`` over the
table at displacement ``0.5 * (q_pos - k_pos)`` exactly as the reference
(SCA_deform_attn.py:365-389). Gradients flow into ``k_pos`` (the learned
offsets train through both the K/V gather and this bias lookup).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_table_lookup(
    table: jax.Array,  # (G, Hpg, Ht, Wt)
    disp: jax.Array,  # (B, G, m, N, 2) (y, x) in [-1, 1]
) -> jax.Array:  # (B, G, Hpg, m, N)
    G, Hpg, Ht, Wt = table.shape
    # Row-gather layout: rows indexed by (g, y, x) with the head dim on the
    # contiguous minor axis — each gathered element is one Hpg-vector load.
    # Gathering along a strided axis (heads-major table) serializes on TPU.
    rows = jnp.transpose(table, (0, 2, 3, 1)).reshape(G * Ht * Wt, Hpg)
    gbase = (jnp.arange(G, dtype=jnp.int32) * (Ht * Wt)).reshape(1, G, 1, 1)

    py = (disp[..., 0] + 1.0) * 0.5 * (Ht - 1)
    px = (disp[..., 1] + 1.0) * 0.5 * (Wt - 1)

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy1 = py - y0
    wx1 = px - x0

    def corner(yc, xc, w):
        inb = (yc >= 0.0) & (yc <= Ht - 1.0) & (xc >= 0.0) & (xc <= Wt - 1.0)
        yi = jnp.clip(yc, 0.0, Ht - 1.0).astype(jnp.int32)
        xi = jnp.clip(xc, 0.0, Wt - 1.0).astype(jnp.int32)
        idx = gbase + yi * Wt + xi  # (B, G, m, N)
        vals = jnp.take(rows, idx, axis=0)  # (B, G, m, N, Hpg)
        return vals * jnp.where(inb, w, 0.0)[..., None]

    out = (
        corner(y0, x0, (1 - wy1) * (1 - wx1))
        + corner(y0, x0 + 1.0, (1 - wy1) * wx1)
        + corner(y0 + 1.0, x0, wy1 * (1 - wx1))
        + corner(y0 + 1.0, x0 + 1.0, wy1 * wx1)
    )
    return jnp.transpose(out, (0, 1, 4, 2, 3))  # (B, G, Hpg, m, N)


def _lattice_bias(
    table: jax.Array,  # (G, Hpg, Ht, Wt)
    k_pos: jax.Array,  # (B, G, N, 2) (y, x) in [-1, 1]
    H: int,
    W: int,
    compute_dtype=jnp.bfloat16,
    use_kernel: bool = False,
) -> jax.Array:  # (B, G, Hpg, H*W, N)
    """Exact rpe bias via per-key translated windows (TPU fast path).

    The query positions are the regular ``normalized_grid(H, W)`` lattice and
    the table height is ``2H - 1`` (SCA_deform_attn.py:158-164), so the table-
    space row coordinate separates as ``py(i, j) = iy + sy(j)`` with *integer*
    query steps; likewise ``px(i, j) = u(ix) + sx(j)`` with fixed per-column
    offsets. The bilinear ``grid_sample`` of the table therefore reduces to,
    per key j, one (H+1, W, 3)-block dynamic-slice of a column-rearranged
    table plus elementwise corner weights — block copies instead of the
    O(M*N*4) element gathers a direct lookup needs (TPUs have no hardware
    gather; element gathers serialize).

    Produces bit-identical results to ``_bilinear_table_lookup`` on the
    lattice (see tests/test_models.py::TestLatticeBias).
    """
    import numpy as np

    G, Hpg, Ht, Wt = table.shape
    B, _, N, _ = k_pos.shape
    if Ht != 2 * H - 1:
        raise ValueError(f"lattice bias requires Ht == 2H-1, got {Ht} vs H={H}")
    PAD = 4
    Ay = (Ht - 1) / 4.0  # == (H - 1) / 2
    Ax = (Wt - 1) / 4.0

    ky = k_pos[..., 0]
    kx = k_pos[..., 1]
    # py = iy + sy(j);  px = u(ix) + sx(j)   (both in table pixel coords)
    sy = -Ay * ky + (Ht - 1) / 2.0 - (H - 1) / 2.0  # (B, G, N)
    sx_shift = -Ax * kx + (Wt - 1) / 2.0 - Ax  # shifted so u' >= 0
    u_shift = Ax * (-1.0 + 2.0 * np.arange(W) / (W - 1)) + Ax  # (W,) static

    u0 = np.floor(u_shift).astype(np.int32)  # static per-column starts
    g = jnp.asarray((u_shift - u0).astype(np.float32))  # (W,)
    y0 = jnp.floor(sy)
    wy = (sy - y0)[..., None, None, None]  # (B, G, N, 1, 1, 1)
    s0 = jnp.floor(sx_shift)
    f = sx_shift - s0  # (B, G, N)
    phi = g[None, None, None, :] + f[..., None]  # (B, G, N, W)
    c = jnp.floor(phi)
    wx = (phi - c)[:, :, :, None, :, None]  # (B, G, N, 1, W, 1)
    c = (c > 0.5)[:, :, :, None, :, None]  # bool: column crossed into +1

    # zero-padded head-minor table and static per-column re-slicing:
    # T3[g, y, ix, m, h] = Tp[g, y, u0[ix] + m, h]
    m_max = int(np.ceil((Wt - 1) / 2.0)) + 3 + PAD
    # the windowed-slice tensor dominates HBM traffic for this op; bf16
    # halves it (table std is 0.01 — well inside bf16 range), while the
    # softmax downstream stays f32.
    Tp = jnp.pad(
        jnp.transpose(table.astype(compute_dtype), (0, 2, 3, 1)),
        ((0, 0), (PAD, PAD), (PAD, max(PAD, m_max)), (0, 0)),
    )
    T3 = jnp.stack(
        [Tp[:, :, int(u0[ix]) : int(u0[ix]) + m_max, :] for ix in range(W)],
        axis=2,
    )  # (G, Ht+2PAD, W, m_max, Hpg)
    # Slice layout (y, m, ix, h): the dynamically-sliced axes lead, so every
    # block piece is a contiguous (W * Hpg) run — slice granule size drives
    # gather throughput on TPU (12-byte granules serialize).
    T3 = jnp.transpose(T3, (0, 1, 3, 2, 4))  # (G, Y, m_max, W, Hpg)

    y_start = jnp.clip(y0.astype(jnp.int32) + PAD, 0, Ht + 2 * PAD - (H + 1))
    m_start = jnp.clip(s0.astype(jnp.int32) + PAD, 0, m_max - 3)

    if use_kernel and jax.default_backend() == "tpu":
        # Pallas path: table resident in VMEM, per-key windows copied
        # on-chip (ops/pallas/lattice_win.py); custom VJP scatters window
        # cotangents back into the table gradient.
        from bevrender_tpu.ops.pallas.lattice_win import lattice_windows

        win = lattice_windows(
            T3.reshape(G, Ht + 2 * PAD, m_max, W * Hpg),
            y_start,
            m_start,
            h1=H + 1,
            interpret=False,
        ).reshape(B, G, N, 3, H + 1, W, Hpg)
        sel = lambda k: win[:, :, :, k]  # m on axis 3 (kernel layout)
    else:

        def slice_one(t3g, ys, ms):
            return jax.lax.dynamic_slice(
                t3g, (ys, ms, 0, 0), (H + 1, 3, W, Hpg)
            )

        # vmap over N, then G (paired with tables), then B
        per_keys = jax.vmap(slice_one, in_axes=(None, 0, 0))
        per_group = jax.vmap(per_keys, in_axes=(0, 0, 0))
        win = jax.vmap(per_group, in_axes=(None, 0, 0))(T3, y_start, m_start)
        # win: (B, G, N, H+1, 3, W, Hpg)
        sel = lambda k: win[:, :, :, :, k]

    wx = wx.astype(compute_dtype)
    wy = wy.astype(compute_dtype)
    left = jnp.where(c, sel(1), sel(0))
    right = jnp.where(c, sel(2), sel(1))
    xin = (1.0 - wx) * left + wx * right  # (B, G, N, H+1, W, Hpg)
    bias = (1.0 - wy) * xin[:, :, :, :H] + wy * xin[:, :, :, 1 : H + 1]
    # (B, G, N, H, W, Hpg) -> (B, G, Hpg, H*W, N)
    bias = jnp.transpose(bias, (0, 1, 5, 3, 4, 2)).reshape(
        B, G, Hpg, H * W, N
    )
    return bias.astype(jnp.float32)


def _static_comb(table_shape, W: int):
    """Static per-column comb of the lattice lookup: integer column starts
    ``u0``, fractions ``g``, window width ``m_max`` and pad — pure numpy,
    shared by the staging, its transpose, and the geometry below."""
    G, Hpg, Ht, Wt = table_shape
    PAD = 4
    Ax = (Wt - 1) / 4.0
    u_shift = Ax * (-1.0 + 2.0 * np.arange(W) / (W - 1)) + Ax
    u0 = np.floor(u_shift).astype(np.int32)
    g = (u_shift - u0).astype(np.float32)
    m_max = int(np.ceil((Wt - 1) / 2.0)) + 3 + PAD
    return u0, g, m_max, PAD


def _lattice_geometry(table_shape, k_pos, H: int, W: int):
    """Shared per-key geometry of the lattice rpe lookup.

    Returns (ys, ms, shift, wy, f, u0, g, m_max, PAD) where ys/ms are the
    clipped integer window starts into the padded rearranged table, shift is
    ys % 8 (the sublane phase the Pallas kernel resolves), and wy/f are the
    bilinear fractions (computed from the *unclipped* starts, matching
    ``_lattice_bias``).
    """
    G, Hpg, Ht, Wt = table_shape
    if Ht != 2 * H - 1:
        raise ValueError(f"lattice bias requires Ht == 2H-1, got {Ht} vs H={H}")
    u0, g, m_max, PAD = _static_comb(table_shape, W)
    Ay = (Ht - 1) / 4.0
    Ax = (Wt - 1) / 4.0
    ky = k_pos[..., 0]
    kx = k_pos[..., 1]
    sy = -Ay * ky + (Ht - 1) / 2.0 - (H - 1) / 2.0
    sx_shift = -Ax * kx + (Wt - 1) / 2.0 - Ax
    y0 = jnp.floor(sy)
    wy = sy - y0
    s0 = jnp.floor(sx_shift)
    f = sx_shift - s0
    ys = jnp.clip(y0.astype(jnp.int32) + PAD, 0, Ht + 2 * PAD - (H + 1))
    ms = jnp.clip(s0.astype(jnp.int32) + PAD, 0, m_max - 3)
    shift = ys - (ys // 8) * 8
    return ys, ms, shift, wy, f, u0, g, m_max, PAD


def lattice_shift_class(table_shape, k_pos, H: int, W: int) -> jax.Array:
    """Shift class (0..7) per key; callers sort keys by this before the K/V
    gather so the Pallas bias kernel executes ~1 class branch per tile instead
    of 8 (attention over sampled keys is permutation-invariant)."""
    return _lattice_geometry(table_shape, k_pos, H, W)[2]


def _stage_table(table: jax.Array, u0, m_max: int, PAD: int, H: int,
                 compute_dtype=jnp.bfloat16, lane_to: int = 0) -> jax.Array:
    """Head-major rearranged table (G, m_max, Ypad, Hpg*W).

    ``lane_to > 0`` pads the lane dim up to that width (a 128 multiple).
    The DMA-prefetch kernel variants need it — Mosaic requires
    ``make_async_copy`` slices to be 128-aligned along lanes — but it is
    NOT free for the inline-extract kernels: measured +44% on the fused
    site at the flagship shape (SITE_DMA_BENCH.json), so the default
    (winning) path stages unpadded.

    Structurally LINEAR in ``table`` (cast + pad + static slices + stack +
    transpose), so the fused-site backward obtains d_table from d_t3m with
    ``jax.linear_transpose`` — no forward re-staging."""
    G, Hpg, Ht, Wt = table.shape
    W = len(u0)
    Y = Ht + 2 * PAD
    Tp = jnp.pad(
        table.astype(compute_dtype),
        ((0, 0), (0, 0), (PAD, PAD), (PAD, max(PAD, m_max))),
    )
    t3 = jnp.stack(
        [Tp[:, :, :, int(u0[ix]) : int(u0[ix]) + m_max] for ix in range(W)],
        axis=3,
    )  # (G, Hpg, Y, W, m_max)
    t3 = jnp.transpose(t3, (0, 4, 2, 1, 3)).reshape(G, m_max, Y, Hpg * W)
    from bevrender_tpu.ops.pallas.lattice_bias import _h1al

    y_pad = (-Y % 8) + _h1al(H)
    lane_pad = max(0, lane_to - Hpg * W)
    return jnp.pad(t3, ((0, 0), (0, 0), (0, y_pad), (0, lane_pad)))


def _h1als(H: int) -> int:
    """Aligned rows for the shift-replicated staging: just the H+1 lerp rows
    (each replica is pre-shifted, so windows start 8-aligned with no slack).
    Single source of truth lives next to the kernels that slice with it."""
    from bevrender_tpu.ops.pallas.lattice_bias import _h1als as _impl

    return _impl(H)


def _shift_geom(table_shape, H: int, W: int):
    """Static geometry of the shift-replicated staging: (m_max, H1ALS, Yp2,
    block_bytes). ``block_bytes`` is the per-group VMEM footprint of the
    replicated table block (bf16), the fallback criterion for wide sites."""
    G, Hpg, Ht, Wt = table_shape
    _, _, m_max, PAD = _static_comb(table_shape, W)
    H1ALS = _h1als(H)
    max_ys = Ht + 2 * PAD - (H + 1)
    Yp2 = (max_ys // 8) * 8 + H1ALS
    block_bytes = 8 * m_max * Yp2 * Hpg * W * 2
    return m_max, H1ALS, Yp2, block_bytes


# per-group table blocks above this use the resolve-kernel path: the
# 8-replica block (x2 for Pallas double buffering) must fit VMEM with room
# for the kernel scratches (v5e VMEM is 128 MB physical, 100 MB declared)
_SHIFT_REPLICA_MAX_BLOCK = 12 * 1024 * 1024


def use_shift_replica(table_shape, H: int, W: int) -> bool:
    """Whether the lattice kernels use the shift-replicated staging (one
    pre-shifted table copy per sublane phase): extraction is then always
    8-aligned and the per-class shift resolve — and the callers' key sort —
    disappear entirely. Costs 8x the staged-table HBM/VMEM, so wide sites
    (pyramid stages) fall back to the resolve kernel.

    BEVRENDER_SHIFT_REPLICA=0/1 forces the choice (trace-time, like the
    other kernel knobs). The DMA variant knobs (BEVRENDER_SITE_DMA /
    BEVRENDER_BIAS_DMA) are independent: they only affect sites that are
    on the resolve layout anyway (wide sites, or a forced =0 here).
    """
    import os

    env = os.environ.get("BEVRENDER_SHIFT_REPLICA")
    if env == "0":
        return False
    if env == "1":
        return True
    return _shift_geom(table_shape, H, W)[3] <= _SHIFT_REPLICA_MAX_BLOCK


def _stage_table_shifted(table: jax.Array, u0, m_max: int, PAD: int, H: int,
                         compute_dtype=jnp.bfloat16) -> jax.Array:
    """Shift-replicated staged table (G, 8*m_max, Yp2, Hpg*W): replica s
    holds the rearranged table with rows advanced by s, so a key with window
    start ``ys = ys8 + s`` reads rows ``ys8 : ys8 + H1ALS`` of replica s —
    an 8-aligned start with exactly the H+1 lerp rows, no resolve needed.

    Structurally LINEAR in ``table`` (autodiff transposes it into the
    replica-summed table gradient)."""
    G, Hpg, Ht, Wt = table.shape
    W = len(u0)
    Y = Ht + 2 * PAD
    _, H1ALS, Yp2, _ = _shift_geom(table.shape, H, W)
    tail = max(0, Yp2 + 7 - Y)
    Tp = jnp.pad(
        table.astype(compute_dtype),
        ((0, 0), (0, 0), (PAD, PAD + tail), (PAD, max(PAD, m_max))),
    )
    t3 = jnp.stack(
        [Tp[:, :, :, int(u0[ix]) : int(u0[ix]) + m_max] for ix in range(W)],
        axis=3,
    )  # (G, Hpg, Y+tail, W, m_max)
    t3 = jnp.transpose(t3, (0, 4, 2, 1, 3)).reshape(
        G, m_max, Y + tail, Hpg * W
    )
    t3s = jnp.stack(
        [t3[:, :, s : s + Yp2, :] for s in range(8)], axis=1
    )  # (G, 8, m_max, Yp2, WH)
    return t3s.reshape(G, 8 * m_max, Yp2, Hpg * W)


def _kernel_inputs_sh(
    table: jax.Array,  # (G, Hpg, Ht, Wt)
    k_pos: jax.Array,  # (B, G, N, 2)
    H: int,
    W: int,
    compute_dtype=jnp.bfloat16,
    lane_block: int = 0,
):
    """Staging for the shift-replicated lattice kernels. Returns
    (t3s, wy4, f4, packed, gcol, Np) where packed = ys8 << 16 | (s*m_max+ms)
    indexes the replicated table directly (no shift array, no key sort).

    ``lane_block > 0`` pads the table lanes from Hpg*W up to ``lane_block``
    with -1e30 (the row-folded sh2 site kernel stores whole 64-lane bias
    rows; the pad flows through both lerps as -1e30, so the folded softmax's
    pad columns stay inert with zero extra kernel ops). The pad is an
    AFFINE map of the table — autodiff through the staging stays exact."""
    G, Hpg, Ht, Wt = table.shape
    B, _, N, _ = k_pos.shape
    ys, ms, shift, wy, f, u0, g, m_max, PAD = _lattice_geometry(
        table.shape, k_pos, H, W
    )
    TN = 64
    Np = -(-N // TN) * TN
    pad = Np - N
    if pad:
        ys = jnp.pad(ys, ((0, 0), (0, 0), (0, pad)))
        ms = jnp.pad(ms, ((0, 0), (0, 0), (0, pad)))
        shift = jnp.pad(shift, ((0, 0), (0, 0), (0, pad)))
    ys8 = ys - shift  # == (ys // 8) * 8
    msr = shift * m_max + ms
    packed = ((ys8 << 16) | msr).reshape(B * G * Np)

    t3s = _stage_table_shifted(table, u0, m_max, PAD, H, compute_dtype)
    WH = Hpg * W
    if lane_block > WH:
        t3s = jnp.pad(
            t3s, ((0, 0), (0, 0), (0, 0), (0, lane_block - WH)),
            constant_values=-1e30,
        )
    wy4, f4 = _stage_fracs(k_pos, table.shape, H, W, Np)
    gflat = np.zeros(max(lane_block, WH), np.float32)
    gflat[:WH] = np.tile(g, Hpg)
    gcol = jnp.asarray(gflat).reshape(1, -1)
    return t3s, wy4, f4, packed, gcol, Np


def _stage_fracs(k_pos: jax.Array, table_shape, H: int, W: int, Np: int):
    """Tile-padded per-key bilinear fractions (wy4, f4) — the only staging
    outputs through which ``k_pos`` receives gradient (integer starts carry
    none, matching the XLA path where floor has zero gradient)."""
    _, _, _, wy, f, *_ = _lattice_geometry(table_shape, k_pos, H, W)
    pad = Np - k_pos.shape[2]
    if pad:
        wy = jnp.pad(wy, ((0, 0), (0, 0), (0, pad)))
        f = jnp.pad(f, ((0, 0), (0, 0), (0, pad)))
    return (
        wy[..., None].astype(jnp.float32),
        f[..., None].astype(jnp.float32),
    )


def _kernel_inputs(
    table: jax.Array,  # (G, Hpg, Ht, Wt)
    k_pos: jax.Array,  # (B, G, N, 2)
    H: int,
    W: int,
    compute_dtype=jnp.bfloat16,
    lane_pad: bool = False,
):
    """Shared host-side staging for the Pallas lattice kernels: tile-padded
    per-key geometry, packed window starts, the head-major rearranged table
    and the per-lane comb. Returns (t3m, wy4, f4, shift4, packed, gcol, Np)
    shaped for ``lattice_bias_fused`` / ``fused_site_call``.

    When a DMA kernel variant is selected (BEVRENDER_SITE_DMA=1/2 or
    BEVRENDER_BIAS_DMA=1 — trace-time knobs like the dispatch itself), the
    table lanes are padded to 128 so ``make_async_copy`` window slices are
    lane-aligned (Mosaic requirement)."""
    import os

    G, Hpg, Ht, Wt = table.shape
    B, _, N, _ = k_pos.shape
    ys, ms, shift, wy, f, u0, g, m_max, PAD = _lattice_geometry(
        table.shape, k_pos, H, W
    )
    TN = 64
    Np = -(-N // TN) * TN
    pad = Np - N
    if pad:
        ys = jnp.pad(ys, ((0, 0), (0, 0), (0, pad)))
        ms = jnp.pad(ms, ((0, 0), (0, 0), (0, pad)))
        shift = jnp.pad(shift, ((0, 0), (0, 0), (0, pad)))
    packed = ((ys << 16) | ms).reshape(B * G * Np)

    dma_selected = lane_pad or (
        os.environ.get("BEVRENDER_SITE_DMA") in ("1", "2")
        or os.environ.get("BEVRENDER_BIAS_DMA") == "1"
    )
    lane_to = -(-(Hpg * W) // 128) * 128 if dma_selected else 0
    t3m = _stage_table(table, u0, m_max, PAD, H, compute_dtype, lane_to)
    wy4, f4 = _stage_fracs(k_pos, table.shape, H, W, Np)
    # lane comb padded like the staged table (pad lanes read zeros)
    gflat = np.zeros(t3m.shape[3], np.float32)
    gflat[: Hpg * W] = np.tile(g, Hpg)
    gcol = jnp.asarray(gflat).reshape(1, t3m.shape[3])
    return (
        t3m,
        wy4,
        f4,
        shift[..., None].astype(jnp.float32),
        packed,
        gcol,
        Np,
    )


def _lattice_bias_nm(
    table: jax.Array,  # (G, Hpg, Ht, Wt)
    k_pos: jax.Array,  # (B, G, N, 2)
    H: int,
    W: int,
    compute_dtype=jnp.bfloat16,
    use_kernel: bool = False,
    interpret: bool = False,
):
    """n-major lattice rpe bias: returns ((B, G, Hpg, Np, M) bias, N).

    ``use_kernel=True`` runs the fused Pallas kernel
    (ops/pallas/lattice_bias.py): extraction + x-mix + shift resolve + y-mix
    + flatten in VMEM, nothing intermediate in HBM. Np is N padded to the
    kernel tile; the consumer must mask keys >= N before the softmax.
    The fallback transposes :func:`_lattice_bias` (tests / tiny sites).
    """
    G, Hpg, Ht, Wt = table.shape
    B, _, N, _ = k_pos.shape
    if not use_kernel:
        bias = _lattice_bias(table, k_pos, H, W, compute_dtype, False)
        return jnp.swapaxes(bias, -1, -2), N

    if use_shift_replica(table.shape, H, W):
        from bevrender_tpu.ops.pallas.lattice_bias import (
            lattice_bias_fused_sh,
        )

        t3s, wy4, f4, packed, gcol, Np = _kernel_inputs_sh(
            table, k_pos, H, W, compute_dtype
        )
        bias = lattice_bias_fused_sh(
            t3s, wy4, f4, packed, gcol, H, W, Hpg, interpret, N
        )
        return bias, N

    from bevrender_tpu.ops.pallas.lattice_bias import lattice_bias_fused

    t3m, wy4, f4, shift4, packed, gcol, Np = _kernel_inputs(
        table, k_pos, H, W, compute_dtype
    )
    bias = lattice_bias_fused(
        t3m,
        wy4,
        f4,
        shift4,
        packed,
        gcol,
        H,
        W,
        Hpg,
        interpret,
        N,  # pad rows get bias -1e30: softmax masks them for free
    )
    return bias, N


def _site_xla(
    q, k, v, k_pos, rpe_table, H, W, *,
    scale, use_kernel, dropout_rate=0.0, dropout_key=None,
    bias_interpret=False,
):
    """XLA consumer of the (optionally Pallas-generated) n-major bias:
    scores + softmax + AV with the keys axis major — the reference's dense
    site (SCA_deform_attn.py:331-413) minus HBM round trips of (M, N, 2)."""
    bias, n_real = _lattice_bias_nm(
        rpe_table, k_pos, H, W, use_kernel=use_kernel, interpret=bias_interpret
    )
    Np = bias.shape[3]
    kp = k
    vp = v
    if Np != n_real:
        padn = Np - n_real
        kp = jnp.pad(k, ((0, 0),) * 3 + ((0, padn), (0, 0)))
        vp = jnp.pad(v, ((0, 0),) * 3 + ((0, padn), (0, 0)))
    # bf16 matmul inputs (f32 accumulation): 2x MXU rate + bandwidth
    s = jnp.einsum(
        "bghnc,bghmc->bghnm",
        kp.astype(jnp.bfloat16),
        q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * scale
    # pad keys carry bias -1e30 (set inside the fused kernel / the XLA
    # fallback returns unpadded), so the softmax zeroes them for free
    s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-2)
    if dropout_rate > 0.0 and dropout_key is not None:
        mask = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate, p.shape)
        p = jnp.where(mask, p / (1.0 - dropout_rate), 0.0)
    return jnp.einsum(
        "bghnm,bghnc->bghmc",
        p.astype(jnp.bfloat16),
        vp.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_site_attention(q, k, v, k_pos, rpe_table, H, W, scale, interpret):
    """Fully fused attention site (ops/pallas/fused_attn.py): per (b, g)
    cell the Pallas kernel builds the bias tile, computes scores, folds them
    into a flash-style online softmax and accumulates AV — the
    (B, G, Hpg, N, M) bias/score tensors never exist in HBM.

    Backward: recompute through :func:`_site_xla` (whose bias stage uses
    ``lattice_bias_fused``'s custom VJP on TPU) — identical math to the
    round-2 training path, so gradients match the non-fused pipeline.

    No dropout (the caller falls back to the XLA consumer when attention
    dropout is active).
    """
    return _fused_site_impl(q, k, v, k_pos, rpe_table, H, W, scale, interpret)


def _fused_site_impl(q, k, v, k_pos, rpe_table, H, W, scale, interpret):
    import os

    from bevrender_tpu.ops.pallas.fused_attn import (
        fused_site_call,
        fused_site_call_sh,
    )
    from bevrender_tpu.ops.pallas.experimental import (  # A/B-rejected
        fused_site_call_dma,
        fused_site_call_v2,
    )

    B, G, Hpg, M, ch = q.shape
    N = k.shape[3]

    def padded_kv(Np):
        if Np == N:
            return k, v
        padn = Np - N
        return (
            jnp.pad(k, ((0, 0),) * 3 + ((0, padn), (0, 0))),
            jnp.pad(v, ((0, 0),) * 3 + ((0, padn), (0, 0))),
        )

    qcm = jnp.swapaxes(q, -1, -2)  # (B, G, Hpg, ch, M): queries on lanes

    if use_shift_replica(rpe_table.shape, H, W):
        from bevrender_tpu.ops.pallas.experimental import fused_site_call_sh2

        WHl = Hpg * W
        # row-folded variant (sh2): one whole-row y-mix store per query row
        # and one block-diagonal QK/AV dot. Measured NET-NEUTRAL-to-slower
        # on v5e (g8 0.99x, g4/TSA 0.97x): the ~0.9 ms/site saved on the
        # split y-mix stores is exactly repaid by the folded (TN, H*64)
        # layout costing +14% lanes on every softmax vector op (1792 vs
        # 2x784 columns). Kept as an A/B knob; per-head sh is the default.
        use_sh2 = (
            os.environ.get("BEVRENDER_SITE_SH2") == "1" and WHl <= 128
        )
        if use_sh2:
            lane_block = 64 if WHl <= 64 else 128
            t3s, wy4, f4, packed, gcol, Np = _kernel_inputs_sh(
                rpe_table, k_pos, H, W, lane_block=lane_block
            )
            kp, vp = padded_kv(Np)
            out_cm = fused_site_call_sh2(
                t3s, wy4, f4, packed, gcol, kp, vp, qcm,
                H, W, Hpg, interpret, N, scale,
            )
            return jnp.swapaxes(out_cm, -1, -2)
        t3s, wy4, f4, packed, gcol, Np = _kernel_inputs_sh(
            rpe_table, k_pos, H, W
        )
        kp, vp = padded_kv(Np)
        out_cm = fused_site_call_sh(
            t3s, wy4, f4, packed, gcol, kp, vp, qcm,
            H, W, Hpg, interpret, N, scale,
        )
        return jnp.swapaxes(out_cm, -1, -2)

    t3m, wy4, f4, shift4, packed, gcol, Np = _kernel_inputs(
        rpe_table, k_pos, H, W
    )
    kp, vp = padded_kv(Np)
    # BEVRENDER_SITE_DMA selects experimental site-kernel variants
    # (interpret-mode-identical math; see ops/pallas/fused_attn.py):
    # 1 = DMA-prefetched extraction, 2 = DMA + head-folded 128-pad layout.
    # Read at TRACE time: set it before the first jit of a model (it is not
    # part of jit cache keys, so flipping mid-process does not retrace) —
    # an A/B knob for bench.py, not a per-call switch.
    call = {
        "1": fused_site_call_dma,
        "2": fused_site_call_v2,
    }.get(os.environ.get("BEVRENDER_SITE_DMA", ""), fused_site_call)
    out_cm = call(
        t3m, wy4, f4, shift4, packed, gcol, kp, vp, qcm,
        H, W, Hpg, interpret, N, scale,
    )
    return jnp.swapaxes(out_cm, -1, -2)  # (B, G, Hpg, M, ch)


def _fused_site_fwd(q, k, v, k_pos, rpe_table, H, W, scale, interpret):
    out = _fused_site_impl(q, k, v, k_pos, rpe_table, H, W, scale, interpret)
    return out, (q, k, v, k_pos, rpe_table)


def _fused_site_bwd(H, W, scale, interpret, res, g):
    q, k, v, k_pos, rpe_table = res
    use_kernel = (not interpret) and jax.default_backend() == "tpu"
    _, vjp = jax.vjp(
        lambda q, k, v, kp, tb: _site_xla(
            q, k, v, kp, tb, H, W, scale=scale, use_kernel=use_kernel,
        ),
        q, k, v, k_pos, rpe_table,
    )
    return vjp(g.astype(jnp.float32))


fused_site_attention.defvjp(_fused_site_fwd, _fused_site_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_site_attention_train(
    q, k, v, k_pos, rpe_table, H, W, scale, interpret
):
    """Fused site with a FUSED flash-style backward (training path).

    Forward: :func:`ops.pallas.fused_attn.fused_site_call_lse` — the fused
    site kernel that also saves the softmax logsumexp. Backward:
    :func:`ops.pallas.fused_attn.site_bwd_call` recomputes the probabilities
    from the saved lse per tile in VMEM, computes dQ/dK/dV on the MXU, and
    runs the lattice-bias cotangent tail (dtable scatter + dwy/df) inline —
    unlike :func:`fused_site_attention`, no XLA consumer forward+backward is
    re-executed and no (B, G, Hpg, N, M) tensor ever exists in HBM. The tiny
    staging map (table/k_pos -> rearranged table + fractions) is differentiated
    in XLA to chain dtable/dk_pos.

    Gradient numerics differ from the XLA consumer path at bf16 matmul
    level (tiled flash recomputation vs full-softmax autodiff); parity is
    asserted to ~1e-2 in tests/test_ops_fused.py.

    No dropout (callers fall back to the XLA consumer when attention dropout
    is active). Select with BEVRENDER_FUSED_BWD=1 (trace-time, like the
    other site-kernel knobs).
    """
    out, _ = _fused_site_train_fwd_impl(
        q, k, v, k_pos, rpe_table, H, W, scale, interpret
    )
    return out


def _fused_site_train_fwd_impl(q, k, v, k_pos, rpe_table, H, W, scale,
                               interpret):
    import os

    from bevrender_tpu.ops.pallas.fused_attn import fused_site_call_lse
    from bevrender_tpu.ops.pallas.experimental import fused_site_call_v2_lse

    # the training forward follows the eval site-variant knob by default
    # (the v2 head-folded kernel emits the same per-(head, query) lse
    # residual, so the fused backward is variant-agnostic), but
    # BEVRENDER_TRAIN_FWD_V2=0/1 decouples it — training economics can
    # differ (SITE_BWD_BENCH.json's speedup vs speedup_v2fwd); trace-time
    # like the other knobs
    v2_train = os.environ.get("BEVRENDER_TRAIN_FWD_V2")
    if v2_train is None:
        v2_train = (
            "1" if os.environ.get("BEVRENDER_SITE_DMA", "") == "2" else "0"
        )
    fwd_call = (
        fused_site_call_v2_lse if v2_train == "1" else fused_site_call_lse
    )
    N = k.shape[3]
    # the v2 forward's DMA window copies need 128-lane-aligned staging even
    # when BEVRENDER_SITE_DMA is unset (the knobs are independent)
    t3m, wy4, f4, shift4, packed, gcol, Np = _kernel_inputs(
        rpe_table, k_pos, H, W, lane_pad=(v2_train == "1")
    )
    kp = k
    vp = v
    if Np != N:
        padn = Np - N
        kp = jnp.pad(k, ((0, 0),) * 3 + ((0, padn), (0, 0)))
        vp = jnp.pad(v, ((0, 0),) * 3 + ((0, padn), (0, 0)))
    qcm = jnp.swapaxes(q, -1, -2)
    out_cm, lse = fwd_call(
        t3m, wy4, f4, shift4, packed, gcol, kp, vp, qcm,
        H, W, Hpg := q.shape[2], interpret, N, scale,
    )
    res = (k_pos, rpe_table, t3m, wy4, f4, shift4, packed, gcol,
           kp, vp, qcm, out_cm, lse)
    return jnp.swapaxes(out_cm, -1, -2), res


def _fused_site_train_fwd(q, k, v, k_pos, rpe_table, H, W, scale, interpret):
    return _fused_site_train_fwd_impl(
        q, k, v, k_pos, rpe_table, H, W, scale, interpret
    )


def _fused_site_train_bwd(H, W, scale, interpret, res, g):
    from bevrender_tpu.ops.pallas.fused_attn import site_bwd_call

    (k_pos, rpe_table, t3m, wy4, f4, shift4, packed, gcol,
     kp, vp, qcm, out_cm, lse) = res
    B, G, Hpg, ch, M = qcm.shape
    N = k_pos.shape[2]
    do_cm = jnp.swapaxes(g, -1, -2).astype(jnp.float32)
    # flash-backward residual D = rowsum(dO * O) per (head, query)
    dD = jnp.sum(do_cm * out_cm, axis=3)  # (B, G, Hpg, M)
    dt3, dwy, df, dk_p, dv_p, dq_cm = site_bwd_call(
        t3m, wy4, f4, shift4, packed, gcol, kp, vp, qcm, do_cm, lse, dD,
        H, W, Hpg, interpret, N, scale,
    )
    dq = jnp.swapaxes(dq_cm, -1, -2)
    dk = dk_p[:, :, :, :N]
    dv = dv_p[:, :, :, :N]

    # chain the staging maps in XLA without re-running them forward:
    # the table staging is structurally linear -> jax.linear_transpose
    # turns dt3 into dtable directly; the fraction staging is a tiny
    # elementwise chain of k_pos -> jax.vjp (its forward is negligible;
    # integer starts carry no gradient, matching the XLA path where floor
    # has zero gradient)
    u0, _, m_max, PAD = _static_comb(rpe_table.shape, W)
    Np = kp.shape[3]
    (dtable,) = jax.linear_transpose(
        # lane_to mirrors whatever width the forward staged (t3m carries it)
        lambda tb: _stage_table(tb, u0, m_max, PAD, H, lane_to=t3m.shape[3]),
        rpe_table,
    )(dt3.astype(t3m.dtype))
    _, frac_vjp = jax.vjp(
        lambda kpos: _stage_fracs(kpos, rpe_table.shape, H, W, Np), k_pos
    )
    (dkpos,) = frac_vjp((dwy, df))
    return dq, dk, dv, dkpos, dtable


fused_site_attention_train.defvjp(_fused_site_train_fwd,
                                  _fused_site_train_bwd)


def _site_remat():
    """Trace-time remat policy for the XLA site paths (BEVRENDER_SITE_REMAT,
    an A/B env knob like the kernel-variant ones):

      unset / 'nothing' -> jax.checkpoint(nothing_saveable): the backward
            recomputes the whole site (scores, bias, softmax) — O(chunk*keys)
            transient memory, maximum recompute (the round-2 default);
      'dots'  -> jax.checkpoint(dots_saveable): matmul/einsum outputs are
            saved, the backward recomputes only the cheap elementwise tail —
            trades HBM for most of the recompute;
      'none'  -> no checkpoint: XLA keeps every residual it wants (fastest
            backward, highest memory; viable at small train batch because
            history frames are stop_gradient'd and save nothing).
    """
    import os

    mode = os.environ.get("BEVRENDER_SITE_REMAT", "nothing")
    if mode == "none":
        return lambda f: f
    policy = (
        jax.checkpoint_policies.dots_saveable
        if mode == "dots"
        else jax.checkpoint_policies.nothing_saveable
    )
    return functools.partial(jax.checkpoint, policy=policy)


def streamed_deform_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_pos: jax.Array,
    k_pos: jax.Array,
    rpe_table: jax.Array,
    *,
    scale: float,
    chunk: int = 512,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    lattice_hw: Optional[tuple] = None,
    lattice_kernel: bool = False,
    fuse_site: bool = True,
) -> jax.Array:
    """Attention over sampled keys with continuous relative-position bias.

    ``lattice_hw=(H, W)`` asserts that ``q_pos`` is exactly
    ``normalized_grid(H, W)`` and the table height is ``2H-1`` — both callers
    satisfy this — and switches the rpe lookup to the block-sliced lattice
    fast path (see :func:`_lattice_bias`), which is the difference between
    element gathers and block copies on TPU.

    Returns (B, G, Hpg, M, ch). See module docstring for shapes.
    """
    B, G, Hpg, M, ch = q.shape
    N = k.shape[3]

    if lattice_hw is not None:
        use_dropout = dropout_rate > 0.0 and dropout_rng is not None
        on_tpu = jax.default_backend() == "tpu"
        # fully fused site: bias + scores + online softmax + AV in one
        # Pallas kernel — neither bias nor scores touch HBM. Profitable at
        # narrow head channels where the score/AV contractions are
        # MXU-hostile and the n-major bias tensor is large (measured on
        # v5e, SITE_BENCH.json: G=8/ch=4 fwd 7.05 -> 6.30 ms, tie at ch=8,
        # but G=1/ch=32 0.75 -> 1.21 ms — the VPU outer-product loop loses
        # to MXU matmuls at wide ch); ch <= 8 is the measured crossover.
        # ``fuse_site=False`` (the callers pass ``deterministic``) keeps
        # training on the XLA consumer: the fused site's backward
        # recomputes through :func:`_site_xla`, so fwd+bwd pays fused-fwd
        # ON TOP of the full XLA fwd+bwd (measured 11.9 vs 7.9 ms at
        # G=8/ch=4) — fusion only wins when no gradient will flow.
        if fuse_site and lattice_kernel and on_tpu and not use_dropout and ch <= 8:
            return fused_site_attention(
                q, k, v, k_pos, rpe_table, *lattice_hw,
                scale=scale, interpret=False,
            )
        # training path with the fused flash-style backward kernel
        # (BEVRENDER_FUSED_BWD=1, trace-time A/B knob like the others):
        # fused fwd saves the logsumexp; the backward recomputes p in VMEM
        # and emits dQ/dK/dV + the bias cotangent tail in one kernel instead
        # of re-running the XLA consumer fwd+bwd.
        import os as _os

        if (
            not fuse_site and lattice_kernel and on_tpu and not use_dropout
            and ch <= 8 and _os.environ.get("BEVRENDER_FUSED_BWD") == "1"
        ):
            return fused_site_attention_train(
                q, k, v, k_pos, rpe_table, *lattice_hw,
                scale=scale, interpret=False,
            )

        @_site_remat()
        def full_site(q, k, v, k_pos, rpe_table, key):
            return _site_xla(
                q, k, v, k_pos, rpe_table, *lattice_hw,
                scale=scale,
                use_kernel=lattice_kernel and jax.default_backend() == "tpu",
                dropout_rate=dropout_rate if use_dropout else 0.0,
                dropout_key=key if use_dropout else None,
            )

        key = (
            dropout_rng
            if use_dropout
            else jnp.zeros((2,), dtype=jnp.uint32)
        )
        return full_site(q, k, v, k_pos, rpe_table, key)
    chunk = min(chunk, M)
    n_chunks = -(-M // chunk)
    pad = n_chunks * chunk - M
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
        q_pos = jnp.pad(q_pos, ((0, pad), (0, 0)))

    q_chunks = q.reshape(B, G, Hpg, n_chunks, chunk, ch).transpose(3, 0, 1, 2, 4, 5)
    qpos_chunks = q_pos.reshape(n_chunks, chunk, 2)

    use_dropout = dropout_rate > 0.0 and dropout_rng is not None
    if use_dropout:
        keys = jax.random.split(dropout_rng, n_chunks)
    else:
        keys = jnp.zeros((n_chunks, 2), dtype=jnp.uint32)

    @_site_remat()
    def one_chunk(qc, qpos_c, key):
        # qc: (B, G, Hpg, chunk, ch); qpos_c: (chunk, 2)
        s = jnp.einsum(
            "bghmc,bghnc->bghmn", qc, k, preferred_element_type=jnp.float32
        ) * scale
        disp = (qpos_c[None, None, :, None, :] - k_pos[:, :, None, :, :]) * 0.5
        s = s + _bilinear_table_lookup(rpe_table, disp)
        p = jax.nn.softmax(s, axis=-1)
        if use_dropout:
            mask = jax.random.bernoulli(key, 1.0 - dropout_rate, p.shape)
            p = jnp.where(mask, p / (1.0 - dropout_rate), 0.0)
        return jnp.einsum(
            "bghmn,bghnc->bghmc", p, v, preferred_element_type=jnp.float32
        )

    if n_chunks <= 2:
        # unrolled: avoids lax.map trace/compile overhead for the common case
        outs = [
            one_chunk(q_chunks[i], qpos_chunks[i], keys[i])
            for i in range(n_chunks)
        ]
        out = jnp.stack(outs, axis=0)
    else:
        out = jax.lax.map(
            lambda args: one_chunk(*args), (q_chunks, qpos_chunks, keys)
        )
    # (n_chunks, B, G, Hpg, chunk, ch) -> (B, G, Hpg, M, ch)
    out = out.transpose(1, 2, 3, 0, 4, 5).reshape(B, G, Hpg, n_chunks * chunk, ch)
    if pad:
        out = out[:, :, :, :M]
    return out


def dense_deform_attention_reference(
    q, k, v, q_pos, k_pos, rpe_table, *, scale
) -> jax.Array:
    """Unchunked reference implementation (for tests): materializes the full
    (M, N) scores + bias like the reference does on GPU."""
    s = jnp.einsum("bghmc,bghnc->bghmn", q, k) * scale
    disp = (q_pos[None, None, :, None, :] - k_pos[:, :, None, :, :]) * 0.5
    s = s + _bilinear_table_lookup(rpe_table, disp)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bghmn,bghnc->bghmc", p, v)

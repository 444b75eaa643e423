"""Pallas TPU kernel: fused lattice rpe-bias generation for deformable attention.

Replaces the round-1 pipeline (window-extraction kernel ``lattice_win.py`` +
XLA corner-mix in ``ops/deform_attn.py::_lattice_bias``) with ONE kernel that
produces the full relative-position bias ``(B, G, Hpg, N, M)`` directly — the
(B, G, N, 3, H+1, W, Hpg) window tensor never exists in HBM, and the
per-key 8-way ``lax.switch`` (which Mosaic predicate-executes, costing 8x the
copy: measured 117 ns/key vs 15 ns/key aligned) is gone.

Math (parity with the reference's rpe grid_sample, SCA_deform_attn.py:365-389):
queries sit on the regular (H, W) lattice and the table height is 2H-1, so the
bilinear table lookup at displacement ``0.5 * (q_pos - k_pos)`` separates into
  * per key j: integer starts (ys_j, ms_j) and fractions (wy_j, f_j),
  * per query column ix: a static comb ``u0[ix]`` + fraction ``g[ix]``.
The kernel, per (b, g) cell and key tile of TN keys:
  1. extract: win[i] = T3[ms_i : ms_i+3, ys8_i : ys8_i+H1AL, :] — aligned
     8-multiple y start (ys8 = ys//8*8), plain VMEM copies, no switch;
  2. x-mix (batched): xin = lerp over the m-candidates with per-(key, column)
     weight wx = frac(g[ix] + f_j) and crossing c = floor(g[ix] + f_j);
  3. shift resolve (batched): keys are grouped by shift class s = ys % 8;
     for each class present, one masked copy xin_res = xin[:, s : s+H+1, :].
     Callers sort keys by shift class (attention over sampled keys is
     permutation-invariant), so ~1-2 of the 8 @pl.when branches execute;
  4. y-mix + flatten: for each query row iy (static), one lerp and per-head
     stores into output lanes [h*M + iy*W : ... + W].

Output layout is n-major ``(B, G, Hpg, N, M)`` so the consumer computes
scores as einsum("bghnc,bghmc->bghnm") + bias with no transposes.

A custom VJP recomputes the forward stages and runs them transposed:
cotangents flow to the rearranged table (per-key scatter-add, accumulated in a
VMEM-resident per-g block) and to the fractional positions (wy, f), through
which the learned offsets train (the integer starts carry no gradient,
matching the XLA path where ``floor`` has zero gradient).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _h1al(H: int) -> int:
    """Aligned window rows: covers shift 0..7 plus the H+1 lerp rows."""
    return ((H + 1 + 7 + 7) // 8) * 8


def _fill_xres(
    packed_ref, t3_ref, f_ref, shift_ref, gcol_ref, win, xin, xres, row, H
):
    """Shared bias front-end: window extraction + x-mix + shift resolve.

    Fills ``xres`` (TN, H+1, WH) with the x-interpolated, shift-aligned
    windows for this key tile; the caller finishes with the y-mix.
    """
    import os

    H1AL = _h1al(H)
    TN = win.shape[0]

    def extract(i, c):
        packed = packed_ref[row, i]
        ys = packed >> 16
        ms = packed & 0xFFFF
        ys8 = pl.multiple_of((ys // 8) * 8, 8)
        win[i] = t3_ref[0, pl.ds(ms, 3), pl.ds(ys8, H1AL), :]
        return c

    if os.environ.get("BEVRENDER_EXTRACT_UNROLL", "1") != "0":
        # fully unrolled window copies (default; trace-time knob): drops the
        # fori_loop's per-iteration branch/induction overhead — measured
        # 8.12 -> 6.90 ms on the flagship g8 site (SITE_STAGE_BENCH.json)
        for i in range(TN):
            extract(i, 0)
    else:
        jax.lax.fori_loop(0, TN, extract, 0)
    return _mix_resolve(f_ref, shift_ref, gcol_ref, win, xin, xres, H)


def _mix_resolve(f_ref, shift_ref, gcol_ref, win, xin, xres, H):
    """x-mix + shift resolve on an already-extracted ``win`` (the DMA-prefetch
    site kernel fills ``win`` asynchronously; the plain path extracts inline).
    """
    # x-mix: phi = g[lane] + f[key]; c = floor(phi) in {0,1}; wx = frac(phi).
    # The mix computes AND stores in f32 (xin/xres scratches are f32): bf16
    # intermediates paid a dtype conversion at every stage boundary and the
    # v5e VPU has no fast bf16 ALU path — f32 scratches measured 25% faster
    # on the fused site (SITE_STAGE_BENCH.json)
    f = f_ref[0, 0]  # (TN, 1)
    phi = gcol_ref[...] + f  # (1, WH) + (TN, 1) -> (TN, WH)
    cross = jnp.floor(phi)
    wx = (phi - cross)[:, None, :]  # (TN, 1, WH)
    cb = (cross > 0.5)[:, None, :]
    w0 = win[:, 0].astype(jnp.float32)
    w1 = win[:, 1].astype(jnp.float32)
    w2 = win[:, 2].astype(jnp.float32)
    left = jnp.where(cb, w1, w0)
    right = jnp.where(cb, w2, w1)
    xin[...] = ((1.0 - wx) * left + wx * right).astype(xin.dtype)

    # shift resolve: one masked copy per class present in this tile
    shift = shift_ref[0, 0]  # (TN, 1) f32
    for s in range(8):
        smask = shift == float(s)

        @pl.when(jnp.any(smask))
        def _(s=s, smask=smask):
            xres[...] = jnp.where(
                smask[:, None, :], xin[:, s : s + H + 1, :], xres[...]
            )
    return wx, cb


def _fwd_kernel(
    packed_ref,  # SMEM (8, TN) int32 block: ys<<16 | ms, row = cell % 8
    t3_ref,      # VMEM (1, m_max, Ypad, WH) bf16/f32, WH = Hpg*W head-major
    wy_ref,      # VMEM (1, 1, TN, 1) f32
    f_ref,       # VMEM (1, 1, TN, 1) f32
    shift_ref,   # VMEM (1, 1, TN, 1) f32 (0..7)
    gcol_ref,    # VMEM (1, WH) f32: frac comb per lane (tiled per head)
    out_ref,     # VMEM (1, 1, Hpg, TN, M)
    win,         # scratch (TN, 3, H1AL, WH) table-dtype
    xin,         # scratch (TN, H1AL, WH) f32
    xres,        # scratch (TN, H+1, WH) f32
    *,
    H: int,
    W: int,
    Hpg: int,
    TN: int,
    Np: int,
    nreal: int,
):
    NT = Np // TN
    t = pl.program_id(1)
    row = (pl.program_id(0) * NT + t) % 8
    _fill_xres(
        packed_ref, t3_ref, f_ref, shift_ref, gcol_ref, win, xin, xres, row, H
    )

    # y-mix + flatten: static per-query-row lerp and per-head lane stores.
    # Padded keys (global index >= nreal) get -1e30 so the consumer's softmax
    # zeroes them with no separate masking pass.
    wy = wy_ref[0, 0]  # (TN, 1)
    if Np == nreal:
        valid = None
    else:
        kid = jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0) + t * TN
        valid = kid < nreal
    for iy in range(H):
        rowv = (1.0 - wy) * xres[:, iy, :] + wy * xres[:, iy + 1, :]
        if valid is not None:
            rowv = jnp.where(valid, rowv, -1e30)
        rowv = rowv.astype(out_ref.dtype)
        for h in range(Hpg):
            out_ref[0, 0, h, :, iy * W : (iy + 1) * W] = rowv[
                :, h * W : (h + 1) * W
            ]


def _fwd_kernel_dma(
    packed_ref,   # SMEM (8, TN) int32 block for the CURRENT cell row
    packednx_ref, # SMEM (8, TN) int32: the NEXT block (row-wrap prefetch)
    t3_ref, wy_ref, f_ref, shift_ref, gcol_ref,
    out_ref,
    win2,         # scratch (2, TN, 3, H1AL, WH) double-buffered windows
    xin, xres,
    sem,          # DMA semaphore
    *,
    H: int, W: int, Hpg: int, TN: int, Np: int, nreal: int,
):
    """``_fwd_kernel`` with DMA-prefetched window extraction (same scheme as
    ops/pallas/experimental._site_kernel_dma: tile t+1's windows drain on the
    DMA engines while tile t's mix/y-mix runs on the VPU)."""
    NT = Np // TN
    t = pl.program_id(1)
    cell = pl.program_id(0) * NT + t
    row = cell % 8
    cur = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)
    H1AL = _h1al(H)

    def issue(i, c, buf, rowsel, from_next):
        packed = jnp.where(
            from_next, packednx_ref[0, i],
            packed_ref[jnp.minimum(rowsel, 7), i],
        )
        ys = packed >> 16
        ms = packed & 0xFFFF
        ys8 = pl.multiple_of((ys // 8) * 8, 8)
        pltpu.make_async_copy(
            t3_ref.at[0, pl.ds(ms, 3), pl.ds(ys8, H1AL), :],
            win2.at[buf, i], sem,
        ).start()
        return c

    def wait_all():
        def waitp(i, c):
            pltpu.make_async_copy(
                t3_ref.at[0, pl.ds(0, 3), pl.ds(0, H1AL), :],
                win2.at[cur, i], sem,
            ).wait()
            return c
        jax.lax.fori_loop(0, TN, waitp, 0)

    @pl.when(t == 0)
    def _():
        jax.lax.fori_loop(
            0, TN, lambda i, c: issue(i, c, cur, row, jnp.asarray(False)), 0
        )
        wait_all()

    @pl.when(t > 0)
    def _():
        wait_all()

    @pl.when(t < NT - 1)
    def _():
        jax.lax.fori_loop(
            0, TN, lambda i, c: issue(i, c, nxt, row + 1, row == 7), 0
        )

    _mix_resolve(f_ref, shift_ref, gcol_ref, win2.at[cur], xin, xres, H)

    wy = wy_ref[0, 0]
    if Np == nreal:
        valid = None
    else:
        kid = jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0) + t * TN
        valid = kid < nreal
    for iy in range(H):
        rowv = (1.0 - wy) * xres[:, iy, :] + wy * xres[:, iy + 1, :]
        if valid is not None:
            rowv = jnp.where(valid, rowv, -1e30)
        rowv = rowv.astype(out_ref.dtype)
        for h in range(Hpg):
            out_ref[0, 0, h, :, iy * W : (iy + 1) * W] = rowv[
                :, h * W : (h + 1) * W
            ]


def _bias_cotangent_tail(
    grow_row, packed_ref, wy, shift_ref, win, xres, wx, cb,
    dt3_ref, dwy_ref, df_ref, dxres, dxin, dwin, row, H,
):
    """Transposed bias stages shared by the bias backward and the fused-site
    backward (ops/pallas/fused_attn._site_bwd_kernel): y-mix^T (dxres, dwy),
    shift-resolve^T (dxin), x-mix^T (dwin, df) and the per-key scatter-add of
    dwin into the g-resident dt3 block.

    ``grow_row(iy)`` returns the (TN, WH) f32 bias cotangent of query row iy;
    ``wy``/``wx``/``cb``/``win``/``xres`` are the recomputed forward-front-end
    products of :func:`_fill_xres` for this tile.
    """
    TN = win.shape[0]
    H1AL = _h1al(H)
    w0 = win[:, 0].astype(jnp.float32)
    w1 = win[:, 1].astype(jnp.float32)
    w2 = win[:, 2].astype(jnp.float32)
    left = jnp.where(cb, w1, w0)
    right = jnp.where(cb, w2, w1)

    # ---- transposed y-mix: d_xres and d_wy ----
    # the cotangent rows are Hpg*W wide while the scratch lanes are padded to
    # 128 (see deform_attn._stage_table); pad lanes of dxres stay zero, so the
    # transposed x-mix/scatter below add exact zeros there (table pad lanes
    # are zero, so no NaN can leak in via 0 * garbage)
    dxres[...] = jnp.zeros(dxres.shape, dxres.dtype)
    dwy_acc = jnp.zeros((TN, 1), jnp.float32)
    for iy in range(H):
        grow = grow_row(iy)  # (TN, WHg), WHg = Hpg*W <= lane width
        wg = grow.shape[-1]
        dxres[:, iy, :wg] += (1.0 - wy) * grow
        dxres[:, iy + 1, :wg] += wy * grow
        dwy_acc += jnp.sum(
            grow * (xres[:, iy + 1, :wg] - xres[:, iy, :wg]),
            axis=-1, keepdims=True,
        )
    dwy_ref[0, 0] = dwy_acc

    # ---- transposed shift resolve: d_xin ----
    shift = shift_ref[0, 0]  # (TN, 1) f32
    dxin[...] = jnp.zeros(dxin.shape, dxin.dtype)
    for s in range(8):
        smask = shift == float(s)

        @pl.when(jnp.any(smask))
        def _(s=s, smask=smask):
            dxin[:, s : s + H + 1, :] = jnp.where(
                smask[:, None, :],
                dxin[:, s : s + H + 1, :] + dxres[...],
                dxin[:, s : s + H + 1, :],
            )

    # ---- transposed x-mix: d_win, d_f ----
    dxin_v = dxin[...]
    dleft = dxin_v * (1.0 - wx)
    dright = dxin_v * wx
    dphi = jnp.sum(dxin_v * (right - left), axis=1)  # (TN, WH)
    df_ref[0, 0] = jnp.sum(dphi, axis=-1, keepdims=True)
    zero = jnp.zeros_like(dleft)
    # stage per-candidate window cotangents in VMEM: the scatter loop below
    # ref-indexes dwin[i] (dynamic value-indexing of traced arrays does not
    # lower inside TC kernels)
    dwin[:, 0] = jnp.where(cb, zero, dleft)
    dwin[:, 1] = jnp.where(cb, dleft, dright)
    dwin[:, 2] = jnp.where(cb, dright, zero)

    def scatter(i, c):
        packed = packed_ref[row, i]
        ys = packed >> 16
        ms = packed & 0xFFFF
        ys8 = pl.multiple_of((ys // 8) * 8, 8)
        blk = dt3_ref[0, pl.ds(ms, 3), pl.ds(ys8, H1AL), :]
        dt3_ref[0, pl.ds(ms, 3), pl.ds(ys8, H1AL), :] = blk + dwin[i]
        return c

    import os

    if os.environ.get("BEVRENDER_EXTRACT_UNROLL", "1") != "0":
        # unrolled like the forward extract (sequential RMW order preserved)
        for i in range(TN):
            scatter(i, 0)
    else:
        jax.lax.fori_loop(0, TN, scatter, 0)


def _bwd_kernel(
    packed_ref,
    t3_ref,
    wy_ref,
    f_ref,
    shift_ref,
    gcol_ref,
    gout_ref,    # VMEM (1, 1, Hpg, TN, M) cotangent
    dt3_ref,     # VMEM out (1, m_max, Ypad, WH) f32, resident per g
    dwy_ref,     # VMEM out (1, 1, TN, 1) f32
    df_ref,      # VMEM out (1, 1, TN, 1) f32
    win,
    xin,
    xres,
    dxres,       # scratch (TN, H+1, WH) f32
    dxin,        # scratch (TN, H1AL, WH) f32
    dwin,        # scratch (TN, 3, H1AL, WH) f32
    *,
    H: int,
    W: int,
    Hpg: int,
    TN: int,
    Np: int,
    G: int,
):
    g = pl.program_id(0)
    b = pl.program_id(1)
    t = pl.program_id(2)
    NT = Np // TN
    row = ((b * G + g) * NT + t) % 8

    @pl.when((b == 0) & (t == 0))
    def _():
        dt3_ref[...] = jnp.zeros(dt3_ref.shape, dt3_ref.dtype)

    # recompute forward front-end (residual-free backward)
    wx, cb = _fill_xres(
        packed_ref, t3_ref, f_ref, shift_ref, gcol_ref, win, xin, xres, row, H
    )

    def grow_row(iy):
        parts = []
        for h in range(Hpg):
            parts.append(
                gout_ref[0, 0, h, :, iy * W : (iy + 1) * W].astype(jnp.float32)
            )
        return jnp.concatenate(parts, axis=-1)  # (TN, WH)

    _bias_cotangent_tail(
        grow_row, packed_ref, wy_ref[0, 0], shift_ref, win, xres, wx, cb,
        dt3_ref, dwy_ref, df_ref, dxres, dxin, dwin, row, H,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def lattice_bias_fused(
    t3m, wy, f, shift, packed, gcol, H, W, Hpg, interpret, nreal=None
):
    """Fused lattice rpe bias.

    Args:
      t3m: (G, m_max, Ypad, WH) rearranged table, WH = Hpg*W head-major lanes.
      wy, f, shift: (B, G, Np, 1) f32 per-key fraction / x-fraction / y-shift
        class (0..7). Np must be a multiple of the tile TN.
      packed: (B*G*Np,) int32, ys<<16 | ms (clipped, padded starts).
      gcol: (1, WH) f32 static per-lane comb fraction, tiled per head.
      H, W, Hpg: query lattice and heads-per-group (static).
      interpret: run in interpreter mode (CPU tests).
      nreal: real key count; rows >= nreal get bias -1e30 (softmax mask).

    Returns:
      (B, G, Hpg, Np, H*W) bias in t3m's dtype.
    """
    return _fwd_call(
        t3m, wy, f, shift, packed, gcol, H, W, Hpg, interpret, nreal
    )


def _tile_size(Np: int) -> int:
    # kernels declare vmem_limit_bytes=100MB (v5e VMEM is 128MB physical;
    # the Mosaic default 16MB scoped budget overflows and the compile
    # service reports it only as an opaque crash). TN=128 compiles but
    # measures ~2-5x slower per site than TN=64 (VMEM thrash reduces the
    # pipeliner's double-buffering headroom), so 64 it is.
    for tn in (64, 32, 16, 8):
        if Np % tn == 0:
            return tn
    return 8


def _fwd_call(t3m, wy, f, shift, packed, gcol, H, W, Hpg, interpret,
              nreal=None, dma=None):
    import os

    G, m_max, Ypad, WH = t3m.shape
    B, _, Np, _ = wy.shape
    if nreal is None:
        nreal = Np
    M = H * W
    TN = _tile_size(Np)
    H1AL = _h1al(H)
    NT = Np // TN
    n_cells = B * G * NT
    r8 = -(-n_cells // 8) * 8
    packed2 = jnp.pad(packed.reshape(n_cells, TN), ((0, r8 - n_cells), (0, 0)))
    if dma is None:
        # BEVRENDER_BIAS_DMA=1 selects the DMA-prefetched extraction variant
        # (the training path runs this kernel; A/B via scripts/site_dma_bench)
        dma = os.environ.get("BEVRENDER_BIAS_DMA") == "1"
    if dma:
        nblk = r8 // 8
        return pl.pallas_call(
            functools.partial(_fwd_kernel_dma, H=H, W=W, Hpg=Hpg, TN=TN,
                              Np=Np, nreal=nreal),
            grid=(B * G, NT),
            in_specs=[
                pl.BlockSpec((8, TN), lambda bg, t: ((bg * NT + t) // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (8, TN),
                    lambda bg, t: (
                        jnp.minimum((bg * NT + t) // 8 + 1, nblk - 1), 0
                    ),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec((1, m_max, Ypad, WH),
                             lambda bg, t: (bg % G, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, TN, 1),
                             lambda bg, t: (bg // G, bg % G, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, TN, 1),
                             lambda bg, t: (bg // G, bg % G, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, TN, 1),
                             lambda bg, t: (bg // G, bg % G, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, WH), lambda bg, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, Hpg, TN, M),
                lambda bg, t: (bg // G, bg % G, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, TN, 3, H1AL, WH), t3m.dtype),
                pltpu.VMEM((TN, H1AL, WH), jnp.float32),  # xin: f32 avoids per-stage converts
                pltpu.VMEM((TN, H + 1, WH), jnp.float32),  # xres: f32 avoids per-stage converts
                pltpu.SemaphoreType.DMA,
            ],
            out_shape=jax.ShapeDtypeStruct((B, G, Hpg, Np, M), t3m.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(packed2, packed2, t3m, wy, f, shift, gcol)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, W=W, Hpg=Hpg, TN=TN, Np=Np,
                          nreal=nreal),
        grid=(B * G, NT),
        in_specs=[
            pl.BlockSpec((8, TN), lambda bg, t: ((bg * NT + t) // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m_max, Ypad, WH), lambda bg, t: (bg % G, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda bg, t: (bg // G, bg % G, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda bg, t: (bg // G, bg % G, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda bg, t: (bg // G, bg % G, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WH), lambda bg, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, Hpg, TN, M),
            lambda bg, t: (bg // G, bg % G, 0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((TN, 3, H1AL, WH), t3m.dtype),
            pltpu.VMEM((TN, H1AL, WH), jnp.float32),  # xin: f32 avoids per-stage converts
            pltpu.VMEM((TN, H + 1, WH), jnp.float32),  # xres: f32 avoids per-stage converts
        ],
        out_shape=jax.ShapeDtypeStruct((B, G, Hpg, Np, M), t3m.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(packed2, t3m, wy, f, shift, gcol)


def _fused_fwd(t3m, wy, f, shift, packed, gcol, H, W, Hpg, interpret,
               nreal=None):
    out = _fwd_call(
        t3m, wy, f, shift, packed, gcol, H, W, Hpg, interpret, nreal
    )
    return out, (t3m, wy, f, shift, packed, gcol)


def _fused_bwd(H, W, Hpg, interpret, nreal, res, g_out):
    t3m, wy, f, shift, packed, gcol = res
    dt3, dwy, df = _bwd_call(
        t3m, wy, f, shift, packed, gcol, g_out, H, W, Hpg, interpret
    )
    zp = np.zeros(packed.shape, dtype=jax.dtypes.float0)
    return (
        dt3.astype(t3m.dtype),
        dwy,
        df,
        jnp.zeros_like(shift),
        zp,
        jnp.zeros_like(gcol),
    )


def _bwd_call(t3m, wy, f, shift, packed, gcol, g_out, H, W, Hpg, interpret):
    G, m_max, Ypad, WH = t3m.shape
    B, _, Np, _ = wy.shape
    M = H * W
    # the backward carries ~2x the scratch of the forward (dxres/dxin/dwin
    # plus the resident f32 dt3 block); cap its tile lower than the forward's
    TN = min(_tile_size(Np), 64)
    H1AL = _h1al(H)
    NT = Np // TN
    n_cells = B * G * NT
    r8 = -(-n_cells // 8) * 8
    packed2 = jnp.pad(packed.reshape(n_cells, TN), ((0, r8 - n_cells), (0, 0)))
    dt3, dwy, df = pl.pallas_call(
        functools.partial(
            _bwd_kernel, H=H, W=W, Hpg=Hpg, TN=TN, Np=Np, G=G
        ),
        grid=(G, B, NT),
        in_specs=[
            pl.BlockSpec((8, TN), lambda g, b, t: (((b * G + g) * NT + t) // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m_max, Ypad, WH), lambda g, b, t: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda g, b, t: (b, g, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda g, b, t: (b, g, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda g, b, t: (b, g, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WH), lambda g, b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hpg, TN, M), lambda g, b, t: (b, g, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, m_max, Ypad, WH), lambda g, b, t: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda g, b, t: (b, g, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda g, b, t: (b, g, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TN, 3, H1AL, WH), t3m.dtype),
            pltpu.VMEM((TN, H1AL, WH), jnp.float32),  # xin: f32 avoids per-stage converts
            pltpu.VMEM((TN, H + 1, WH), jnp.float32),  # xres: f32 avoids per-stage converts
            pltpu.VMEM((TN, H + 1, WH), jnp.float32),
            pltpu.VMEM((TN, H1AL, WH), jnp.float32),
            pltpu.VMEM((TN, 3, H1AL, WH), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, m_max, Ypad, WH), jnp.float32),
            jax.ShapeDtypeStruct((B, G, Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, G, Np, 1), jnp.float32),
        ],
        # under remat+while XLA stages kernel results in scoped VMEM; the
        # default 16 MB budget overflows (v5e VMEM is 128 MB physical)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(packed2, t3m, wy, f, shift, gcol, g_out)
    return dt3, dwy, df


lattice_bias_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Shift-replicated variant: the staged table holds one pre-shifted copy per
# sublane phase (deform_attn._stage_table_shifted), so extraction is always
# 8-aligned with exactly the H+1 lerp rows and the per-class shift resolve —
# and the callers' key sort — disappear. Wide sites (pyramid) fall back to
# the resolve kernels above (deform_attn.use_shift_replica).
# ---------------------------------------------------------------------------


def _h1als(H: int) -> int:
    return -(-(H + 1) // 8) * 8


def _fill_xres_sh(packed_ref, t3_ref, f_ref, gcol_ref, win, xres, row, H):
    """Shift-replicated bias front-end: aligned window extraction + x-mix.

    ``win`` is (TN, 3, H1ALS, WH); ``xres`` (TN, H+1, WH) f32 receives the
    x-interpolated windows directly (replicas are pre-shifted, so rows
    0..H+1 of the window ARE the lerp rows). Returns (wx, cb) for the
    transposed mix in the backward."""
    import os

    H1ALS = _h1als(H)
    TN = win.shape[0]

    def extract(i, c):
        packed = packed_ref[row, i]
        ys8 = pl.multiple_of(packed >> 16, 8)
        msr = packed & 0xFFFF
        win[i] = t3_ref[0, pl.ds(msr, 3), pl.ds(ys8, H1ALS), :]
        return c

    if os.environ.get("BEVRENDER_EXTRACT_UNROLL", "1") != "0":
        for i in range(TN):
            extract(i, 0)
    else:
        jax.lax.fori_loop(0, TN, extract, 0)

    f = f_ref[0, 0]  # (TN, 1)
    phi = gcol_ref[...] + f  # (TN, WH)
    cross = jnp.floor(phi)
    wx = (phi - cross)[:, None, :]  # (TN, 1, WH)
    cb = (cross > 0.5)[:, None, :]
    w0 = win[:, 0, : H + 1].astype(jnp.float32)
    w1 = win[:, 1, : H + 1].astype(jnp.float32)
    w2 = win[:, 2, : H + 1].astype(jnp.float32)
    left = jnp.where(cb, w1, w0)
    right = jnp.where(cb, w2, w1)
    xres[...] = ((1.0 - wx) * left + wx * right).astype(xres.dtype)
    return wx, cb


def _fwd_kernel_sh(
    packed_ref,  # SMEM (8, TN) int32: ys8 << 16 | (s*m_max + ms)
    t3_ref,      # VMEM (1, 8*m_max, Yp2, WH)
    wy_ref, f_ref, gcol_ref,
    out_ref,     # VMEM (1, 1, Hpg, TN, M)
    win,         # scratch (TN, 3, H1ALS, WH) table-dtype
    xres,        # scratch (TN, H+1, WH) f32
    *,
    H: int, W: int, Hpg: int, TN: int, Np: int, nreal: int,
):
    NT = Np // TN
    t = pl.program_id(1)
    row = (pl.program_id(0) * NT + t) % 8
    _fill_xres_sh(packed_ref, t3_ref, f_ref, gcol_ref, win, xres, row, H)

    wy = wy_ref[0, 0]  # (TN, 1)
    if Np == nreal:
        valid = None
    else:
        kid = jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0) + t * TN
        valid = kid < nreal
    for iy in range(H):
        rowv = (1.0 - wy) * xres[:, iy, :] + wy * xres[:, iy + 1, :]
        if valid is not None:
            rowv = jnp.where(valid, rowv, -1e30)
        rowv = rowv.astype(out_ref.dtype)
        for h in range(Hpg):
            out_ref[0, 0, h, :, iy * W : (iy + 1) * W] = rowv[
                :, h * W : (h + 1) * W
            ]


def _fwd_call_sh(t3s, wy, f, packed, gcol, H, W, Hpg, interpret, nreal=None):
    G, m8, Yp2, WH = t3s.shape
    B, _, Np, _ = wy.shape
    if nreal is None:
        nreal = Np
    M = H * W
    TN = _tile_size(Np)
    H1ALS = _h1als(H)
    NT = Np // TN
    n_cells = B * G * NT
    r8 = -(-n_cells // 8) * 8
    packed2 = jnp.pad(packed.reshape(n_cells, TN), ((0, r8 - n_cells), (0, 0)))
    return pl.pallas_call(
        functools.partial(_fwd_kernel_sh, H=H, W=W, Hpg=Hpg, TN=TN, Np=Np,
                          nreal=nreal),
        grid=(B * G, NT),
        in_specs=[
            pl.BlockSpec((8, TN), lambda bg, t: ((bg * NT + t) // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m8, Yp2, WH), lambda bg, t: (bg % G, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda bg, t: (bg // G, bg % G, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda bg, t: (bg // G, bg % G, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WH), lambda bg, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, Hpg, TN, M),
            lambda bg, t: (bg // G, bg % G, 0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((TN, 3, H1ALS, WH), t3s.dtype),
            pltpu.VMEM((TN, H + 1, WH), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, G, Hpg, Np, M), t3s.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024
        ),
        interpret=interpret,
    )(packed2, t3s, wy, f, gcol)


def _bwd_kernel_sh(
    packed_ref,
    t3_ref,      # VMEM (1, 8*m_max, Yp2, WH)
    wy_ref, f_ref, gcol_ref,
    gout_ref,    # VMEM (1, 1, Hpg, TN, M) cotangent
    dt3_ref,     # VMEM out (1, 8*m_max, Yp2, WH) f32, resident per g
    dwy_ref,     # VMEM out (1, 1, TN, 1) f32
    df_ref,      # VMEM out (1, 1, TN, 1) f32
    win, xres,
    dxres,       # scratch (TN, H+1, WH) f32
    dwin,        # scratch (TN, 3, H1ALS, WH) f32
    *,
    H: int, W: int, Hpg: int, TN: int, Np: int, G: int,
):
    """Transposed shift-replicated bias: y-mix^T -> x-mix^T -> aligned
    scatter-add into the replicated dt3 block (no resolve transpose)."""
    import os

    g = pl.program_id(0)
    b = pl.program_id(1)
    t = pl.program_id(2)
    NT = Np // TN
    row = ((b * G + g) * NT + t) % 8
    H1ALS = _h1als(H)

    @pl.when((b == 0) & (t == 0))
    def _():
        dt3_ref[...] = jnp.zeros(dt3_ref.shape, dt3_ref.dtype)

    wx, cb = _fill_xres_sh(
        packed_ref, t3_ref, f_ref, gcol_ref, win, xres, row, H
    )

    # ---- transposed y-mix: d_xres and d_wy ----
    wy = wy_ref[0, 0]
    dxres[...] = jnp.zeros(dxres.shape, dxres.dtype)
    dwy_acc = jnp.zeros((TN, 1), jnp.float32)
    for iy in range(H):
        parts = []
        for h in range(Hpg):
            parts.append(
                gout_ref[0, 0, h, :, iy * W : (iy + 1) * W].astype(jnp.float32)
            )
        grow = jnp.concatenate(parts, axis=-1)  # (TN, WH)
        dxres[:, iy, :] += (1.0 - wy) * grow
        dxres[:, iy + 1, :] += wy * grow
        dwy_acc += jnp.sum(
            grow * (xres[:, iy + 1, :] - xres[:, iy, :]), axis=-1,
            keepdims=True,
        )
    dwy_ref[0, 0] = dwy_acc

    # ---- transposed x-mix on the H+1 lerp rows ----
    w0 = win[:, 0, : H + 1].astype(jnp.float32)
    w1 = win[:, 1, : H + 1].astype(jnp.float32)
    w2 = win[:, 2, : H + 1].astype(jnp.float32)
    left = jnp.where(cb, w1, w0)
    right = jnp.where(cb, w2, w1)
    dx = dxres[...]
    dleft = dx * (1.0 - wx)
    dright = dx * wx
    dphi = jnp.sum(dx * (right - left), axis=1)  # (TN, WH)
    df_ref[0, 0] = jnp.sum(dphi, axis=-1, keepdims=True)
    zero = jnp.zeros_like(dleft)
    dwin[...] = jnp.zeros(dwin.shape, dwin.dtype)
    dwin[:, 0, : H + 1] = jnp.where(cb, zero, dleft)
    dwin[:, 1, : H + 1] = jnp.where(cb, dleft, dright)
    dwin[:, 2, : H + 1] = jnp.where(cb, dright, zero)

    def scatter(i, c):
        packed = packed_ref[row, i]
        ys8 = pl.multiple_of(packed >> 16, 8)
        msr = packed & 0xFFFF
        blk = dt3_ref[0, pl.ds(msr, 3), pl.ds(ys8, H1ALS), :]
        dt3_ref[0, pl.ds(msr, 3), pl.ds(ys8, H1ALS), :] = blk + dwin[i]
        return c

    if os.environ.get("BEVRENDER_EXTRACT_UNROLL", "1") != "0":
        for i in range(TN):
            scatter(i, 0)
    else:
        jax.lax.fori_loop(0, TN, scatter, 0)


def _bwd_call_sh(t3s, wy, f, packed, gcol, g_out, H, W, Hpg, interpret):
    G, m8, Yp2, WH = t3s.shape
    B, _, Np, _ = wy.shape
    M = H * W
    TN = min(_tile_size(Np), 64)
    H1ALS = _h1als(H)
    NT = Np // TN
    n_cells = B * G * NT
    r8 = -(-n_cells // 8) * 8
    packed2 = jnp.pad(packed.reshape(n_cells, TN), ((0, r8 - n_cells), (0, 0)))
    return pl.pallas_call(
        functools.partial(_bwd_kernel_sh, H=H, W=W, Hpg=Hpg, TN=TN, Np=Np,
                          G=G),
        grid=(G, B, NT),
        in_specs=[
            pl.BlockSpec((8, TN),
                         lambda g, b, t: (((b * G + g) * NT + t) // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m8, Yp2, WH), lambda g, b, t: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda g, b, t: (b, g, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda g, b, t: (b, g, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WH), lambda g, b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hpg, TN, M), lambda g, b, t: (b, g, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, m8, Yp2, WH), lambda g, b, t: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda g, b, t: (b, g, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda g, b, t: (b, g, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TN, 3, H1ALS, WH), t3s.dtype),
            pltpu.VMEM((TN, H + 1, WH), jnp.float32),
            pltpu.VMEM((TN, H + 1, WH), jnp.float32),
            pltpu.VMEM((TN, 3, H1ALS, WH), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, m8, Yp2, WH), jnp.float32),
            jax.ShapeDtypeStruct((B, G, Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, G, Np, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024
        ),
        interpret=interpret,
    )(packed2, t3s, wy, f, gcol, g_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def lattice_bias_fused_sh(t3s, wy, f, packed, gcol, H, W, Hpg, interpret,
                          nreal=None):
    """Fused lattice rpe bias, shift-replicated staging (see
    deform_attn._stage_table_shifted). Same contract as
    :func:`lattice_bias_fused` minus the shift array."""
    return _fwd_call_sh(t3s, wy, f, packed, gcol, H, W, Hpg, interpret, nreal)


def _fused_fwd_sh(t3s, wy, f, packed, gcol, H, W, Hpg, interpret, nreal=None):
    out = _fwd_call_sh(t3s, wy, f, packed, gcol, H, W, Hpg, interpret, nreal)
    return out, (t3s, wy, f, packed, gcol)


def _fused_bwd_sh(H, W, Hpg, interpret, nreal, res, g_out):
    t3s, wy, f, packed, gcol = res
    dt3, dwy, df = _bwd_call_sh(
        t3s, wy, f, packed, gcol, g_out, H, W, Hpg, interpret
    )
    zp = np.zeros(packed.shape, dtype=jax.dtypes.float0)
    return (dt3.astype(t3s.dtype), dwy, df, zp, jnp.zeros_like(gcol))


lattice_bias_fused_sh.defvjp(_fused_fwd_sh, _fused_bwd_sh)

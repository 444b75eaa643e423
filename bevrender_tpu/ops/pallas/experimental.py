"""EXPERIMENTAL Pallas site-kernel variants (measured-losing, default-off).

Every variant here was built, verified (interpret-mode parity in
tests/test_ops_fused.py), and A/B-measured on the v5e chip — and LOST to the
production kernels in ``fused_attn.py`` (committed artifacts:
SITE_DMA_BENCH.json, SITE_BENCH.json, PARITY.md section 2.6):

* ``fused_site_call_dma``  — double-buffered async-copy (DMA) window
  prefetch over the plain staging. The extract is VMEM->VMEM, so the DMA
  engine only hides copy *issue* latency, which Mosaic already pipelines;
  measured ~1.1x SLOWER than the synchronous extract at flagship shapes.
* ``fused_site_call_v2`` / ``..._v2_lse`` — DMA prefetch + head-folded
  128-lane-padded layout (one big block-diagonal QK/AV per tile instead of
  per-head dots). The lane padding costs more than the fold saves at
  ch=4..8; measured net-slower; the v2 training forward
  (BEVRENDER_TRAIN_FWD_V2=1) also lost its A/B (SITE_BWD_BENCH.json).
* ``fused_site_call_sh2`` — row-folded shift-replica variant: one
  whole-row y-mix store and one block-diagonal dot. Measured NET-NEUTRAL
  to -3% (the saved y-mix stores are exactly repaid by +14% lanes on every
  softmax vector op).

They remain importable (the ``BEVRENDER_SITE_DMA`` / ``BEVRENDER_SITE_SH2``
trace-time knobs in ``ops/deform_attn.py`` still dispatch here, and the A/B
benches re-measure them on new hardware/compilers), but they are NOT part
of the production path and carry no parity obligations beyond the
interpret-mode tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bevrender_tpu.ops.pallas.lattice_bias import (
    _fill_xres_sh,
    _h1al,
    _h1als,
    _mix_resolve,
    _tile_size,
)
from bevrender_tpu.ops.pallas.fused_attn import fused_site_call_lse


def _site_kernel_dma(
    packed_ref,   # SMEM (8, TN) int32 block for the CURRENT cell row
    packednx_ref, # SMEM (8, TN) int32: the NEXT block (row wrap prefetch)
    t3_ref, wy_ref, f_ref, shift_ref, gcol_ref, k_ref, v_ref, q_ref,
    out_ref,
    win2,         # scratch (2, TN, 3, H1AL, WH) double-buffered windows
    xin, xres, sblk, macc, lacc, oacc,
    sem,          # DMA semaphore
    *,
    H: int, W: int, Hpg: int, ch: int, TN: int, Np: int,
    nreal: int, scale: float,
):
    """The fused site kernel with DMA-prefetched window extraction.

    The plain kernel's hot front-end is a TN-iteration loop of dynamic-start
    VMEM window copies (stage A of SITE_STAGE_BENCH). Here tile t+1's windows
    are issued as async DMAs *before* tile t's compute, so the copies drain on
    the DMA engines while the VPU/MXU work — per-tile extract cost shrinks to
    the issue overhead plus an end-of-tile wait. Tile 0 of each (b, g) cell
    extracts synchronously (its windows cannot be prefetched across the t3
    block switch: the table block changes with the cell's g).
    """
    NT = Np // TN
    t = pl.program_id(1)
    cell = pl.program_id(0) * NT + t
    row = cell % 8
    cur = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)
    H1AL = _h1al(H)

    def issue(i, c, buf, rowsel, from_next):
        # both `where` branches execute: clamp rowsel (row+1 == 8 when the
        # next cell wraps into the next block and from_next selects instead)
        packed = jnp.where(
            from_next, packednx_ref[0, i],
            packed_ref[jnp.minimum(rowsel, 7), i],
        )
        ys = packed >> 16
        ms = packed & 0xFFFF
        ys8 = pl.multiple_of((ys // 8) * 8, 8)
        pltpu.make_async_copy(
            t3_ref.at[0, pl.ds(ms, 3), pl.ds(ys8, H1AL), :],
            win2.at[buf, i],
            sem,
        ).start()
        return c

    # tile 0: synchronous extract (issue + immediate wait)
    @pl.when(t == 0)
    def _():
        jax.lax.fori_loop(
            0, TN,
            lambda i, c: issue(i, c, cur, row, jnp.asarray(False)), 0
        )
        def wait0(i, c):
            pltpu.make_async_copy(
                t3_ref.at[0, pl.ds(0, 3), pl.ds(0, H1AL), :],
                win2.at[cur, i], sem,
            ).wait()
            return c
        jax.lax.fori_loop(0, TN, wait0, 0)

    # t > 0: the prefetch issued at t-1 targeted win2[cur]; drain it
    @pl.when(t > 0)
    def _():
        def waitp(i, c):
            pltpu.make_async_copy(
                t3_ref.at[0, pl.ds(0, 3), pl.ds(0, H1AL), :],
                win2.at[cur, i], sem,
            ).wait()
            return c
        jax.lax.fori_loop(0, TN, waitp, 0)

    # prefetch tile t+1 into the other buffer (same cell only: the t3 block
    # switches with bg, so cross-cell windows would read the wrong table)
    @pl.when(t < NT - 1)
    def _():
        jax.lax.fori_loop(
            0, TN,
            lambda i, c: issue(i, c, nxt, row + 1, row == 7), 0
        )

    # ---- compute on win2[cur] (identical to _site_kernel from here) ----
    win = win2.at[cur]
    _mix_resolve(f_ref, shift_ref, gcol_ref, win, xin, xres, H)

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
        for h in range(Hpg):
            sblk[h, :, iy * W : (iy + 1) * W] = rowv[:, h * W : (h + 1) * W]

    @pl.when(t == 0)
    def _():
        macc[...] = jnp.full(macc.shape, -1e30, jnp.float32)
        lacc[...] = jnp.zeros(lacc.shape, jnp.float32)
        oacc[...] = jnp.zeros(oacc.shape, jnp.float32)

    for h in range(Hpg):
        kblk = k_ref[0, 0, h].astype(jnp.bfloat16)
        qblk = q_ref[0, 0, h].astype(jnp.bfloat16)
        qk = jax.lax.dot_general(
            kblk, qblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = sblk[h] + scale * qk
        mold = macc[h : h + 1, :]
        mnew = jnp.maximum(mold, jnp.max(s, axis=0, keepdims=True))
        p = jnp.exp(s - mnew)
        alpha = jnp.exp(mold - mnew)
        macc[h : h + 1, :] = mnew
        lacc[h : h + 1, :] = lacc[h : h + 1, :] * alpha + jnp.sum(
            p, axis=0, keepdims=True
        )
        vblk = v_ref[0, 0, h].astype(jnp.bfloat16)
        contrib = jax.lax.dot_general(
            vblk, p.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        oacc[h] = oacc[h] * alpha + contrib

    @pl.when(t == NT - 1)
    def _():
        for h in range(Hpg):
            out_ref[0, 0, h] = (
                oacc[h] / jnp.maximum(lacc[h : h + 1, :], 1e-30)
            ).astype(out_ref.dtype)


def fused_site_call_dma(
    t3m, wy, f, shift, packed, gcol, k, v, qcm, H, W, Hpg, interpret,
    nreal, scale,
):
    """``fused_site_call`` with DMA-prefetched window extraction."""
    G, m_max, Ypad, WH = t3m.shape
    B, _, Np, _ = wy.shape
    M = H * W
    ch = k.shape[-1]
    from bevrender_tpu.ops.pallas.lattice_bias import _tile_size

    TN = _tile_size(Np)
    H1AL = _h1al(H)
    NT = Np // TN
    n_cells = B * G * NT
    r8 = -(-n_cells // 8) * 8
    packed2 = jnp.pad(packed.reshape(n_cells, TN), ((0, r8 - n_cells), (0, 0)))
    nblk = r8 // 8
    return pl.pallas_call(
        functools.partial(
            _site_kernel_dma, H=H, W=W, Hpg=Hpg, ch=ch, TN=TN, Np=Np,
            nreal=nreal, scale=float(scale),
        ),
        grid=(B * G, NT),
        in_specs=[
            pl.BlockSpec((8, TN), lambda bg, t: ((bg * NT + t) // 8, 0),
                         memory_space=pltpu.SMEM),
            # the FOLLOWING packed block: tile t+1's row when the current
            # row is 7 (cell+1 crosses into the next 8-row block)
            pl.BlockSpec(
                (8, TN),
                lambda bg, t: (
                    jnp.minimum((bg * NT + t) // 8 + 1, nblk - 1), 0
                ),
                memory_space=pltpu.SMEM,
            ),
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
            pl.BlockSpec((1, 1, Hpg, TN, ch),
                         lambda bg, t: (bg // G, bg % G, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hpg, TN, ch),
                         lambda bg, t: (bg // G, bg % G, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hpg, ch, M),
                         lambda bg, t: (bg // G, bg % G, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, Hpg, ch, M),
            lambda bg, t: (bg // G, bg % G, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TN, 3, H1AL, WH), t3m.dtype),
            pltpu.VMEM((TN, H1AL, WH), jnp.float32),  # xin: f32 avoids per-stage converts
            pltpu.VMEM((TN, H + 1, WH), jnp.float32),  # xres: f32 avoids per-stage converts
            pltpu.VMEM((Hpg, TN, M), jnp.float32),
            pltpu.VMEM((Hpg, M), jnp.float32),
            pltpu.VMEM((Hpg, M), jnp.float32),
            pltpu.VMEM((Hpg, ch, M), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((B, G, Hpg, ch, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(packed2, packed2, t3m, wy, f, shift, gcol, k, v, qcm)


def _site_v2_body(
    packed_ref, packednx_ref, t3_ref, wy_ref, f_ref, shift_ref, gcol_ref,
    kb_ref,       # VMEM (1, 1, TN, HC) keys, heads folded on lanes
    vb_ref,       # VMEM (1, 1, TN, HC)
    qb_ref,       # VMEM (1, 1, HC, Mbig) block-diagonal padded queries
    out_ref,      # VMEM (1, 1, Hpg, ch, M) f32
    lse_ref,      # VMEM (1, 1, Hpg, M) f32 logsumexp, or None (eval kernel)
    win2, xin, xres,
    sblk,         # scratch (TN, Mbig) f32 — head-folded scores
    macc,         # scratch (1, Mbig) f32
    lacc,         # scratch (1, Mbig) f32
    oacc,         # scratch (HC, Mbig) f32
    sem,
    *,
    H: int, W: int, Hpg: int, ch: int, TN: int, Np: int,
    nreal: int, scale: float,
):
    """DMA-prefetch + head-folded layout variant.

    Differences from ``_site_kernel_dma``:
      * scores live in ONE (TN, H*128) tile with column iy*128 + h*W + x —
        y-mix stores are 128-aligned (28 stores/tile instead of 56 narrow
        ones), and the pad columns carry -1e30 bias so the streaming softmax
        keeps them inert;
      * QK and AV each run as ONE MXU dot over the folded Hpg*ch contraction
        (the block-diagonal host-built ``qb`` zeroes cross-head terms), so
        the per-head Python loop disappears from the hot path;
      * the narrow per-head writeout happens once per cell (t == NT-1), not
        per tile.
    """
    NT = Np // TN
    t = pl.program_id(1)
    cell = pl.program_id(0) * NT + t
    row = cell % 8
    cur = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)
    H1AL = _h1al(H)
    HC = Hpg * ch
    WH = Hpg * W

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

    win = win2.at[cur]
    _mix_resolve(f_ref, shift_ref, gcol_ref, win, xin, xres, H)

    @pl.when(t == 0)
    def _():
        # pad columns keep -1e30 forever: qk there is 0 (qb zero blocks), so
        # the streaming softmax carries exp(0)=1 garbage that the diagonal
        # writeout never reads
        sblk[...] = jnp.full(sblk.shape, -1e30, jnp.float32)
        macc[...] = jnp.full(macc.shape, -1e30, jnp.float32)
        lacc[...] = jnp.zeros(lacc.shape, jnp.float32)
        oacc[...] = jnp.zeros(oacc.shape, jnp.float32)

    # y-mix into the head-folded layout: per query row iy, one store per head
    # at a 128-aligned column start
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
        # xres lanes are padded to 128 (deform_attn._stage_table); only the
        # logical Hpg*W columns carry bias — pad columns keep their -1e30
        sblk[:, iy * 128 : iy * 128 + WH] = rowv[:, :WH]

    kblk = kb_ref[0, 0].astype(jnp.bfloat16)   # (TN, HC)
    qblk = qb_ref[0, 0].astype(jnp.bfloat16)   # (HC, Mbig)
    qk = jax.lax.dot_general(
        kblk, qblk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = sblk[...] + scale * qk                  # (TN, Mbig)
    mold = macc[...]
    mnew = jnp.maximum(mold, jnp.max(s, axis=0, keepdims=True))
    p = jnp.exp(s - mnew)
    alpha = jnp.exp(mold - mnew)
    macc[...] = mnew
    lacc[...] = lacc[...] * alpha + jnp.sum(p, axis=0, keepdims=True)
    vblk = vb_ref[0, 0].astype(jnp.bfloat16)    # (TN, HC)
    contrib = jax.lax.dot_general(
        vblk, p.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # (HC, Mbig)
    oacc[...] = oacc[...] * alpha + contrib

    @pl.when(t == NT - 1)
    def _():
        for h in range(Hpg):
            for iy in range(H):
                col = iy * 128 + h * W
                lsafe = jnp.maximum(lacc[:, col : col + W], 1e-30)
                out_ref[0, 0, h, :, iy * W : (iy + 1) * W] = (
                    oacc[h * ch : (h + 1) * ch, col : col + W] / lsafe
                ).astype(out_ref.dtype)
                if lse_ref is not None:
                    # per-column online state == per-(head, query) state (each
                    # folded column belongs to exactly one head/query), so the
                    # per-head lse is a re-slice — identical residual to
                    # _site_kernel_lse's
                    lse_ref[0, 0, h : h + 1, iy * W : (iy + 1) * W] = (
                        macc[:, col : col + W] + jnp.log(lsafe)
                    ).astype(lse_ref.dtype)


def _site_kernel_v2(
    packed_ref, packednx_ref, t3_ref, wy_ref, f_ref, shift_ref, gcol_ref,
    kb_ref, vb_ref, qb_ref, out_ref,
    win2, xin, xres, sblk, macc, lacc, oacc, sem, **consts,
):
    _site_v2_body(
        packed_ref, packednx_ref, t3_ref, wy_ref, f_ref, shift_ref, gcol_ref,
        kb_ref, vb_ref, qb_ref, out_ref, None,
        win2, xin, xres, sblk, macc, lacc, oacc, sem, **consts,
    )


def _site_kernel_v2_lse(
    packed_ref, packednx_ref, t3_ref, wy_ref, f_ref, shift_ref, gcol_ref,
    kb_ref, vb_ref, qb_ref, out_ref, lse_ref,
    win2, xin, xres, sblk, macc, lacc, oacc, sem, **consts,
):
    """``_site_kernel_v2`` that also emits the per-(head, query) logsumexp —
    the flash-backward residual, so the head-folded forward can feed
    :func:`_site_bwd_kernel` (which is layout-independent: it recomputes
    per-head from the same staged inputs)."""
    _site_v2_body(
        packed_ref, packednx_ref, t3_ref, wy_ref, f_ref, shift_ref, gcol_ref,
        kb_ref, vb_ref, qb_ref, out_ref, lse_ref,
        win2, xin, xres, sblk, macc, lacc, oacc, sem, **consts,
    )


def fused_site_call_v2(
    t3m, wy, f, shift, packed, gcol, k, v, qcm, H, W, Hpg, interpret,
    nreal, scale, with_lse: bool = False,
):
    """``fused_site_call`` with DMA prefetch + head-folded 128-pad layout.

    ``with_lse=True`` also returns the (B, G, Hpg, M) logsumexp (training
    forward, same contract as :func:`fused_site_call_lse`)."""
    G, m_max, Ypad, WH = t3m.shape
    B, _, Np, _ = wy.shape
    M = H * W
    ch = k.shape[-1]
    HC = Hpg * ch
    Mbig = H * 128
    if WH > 128:
        # the folded layout packs one query row's Hpg*W lanes into a single
        # 128-lane block; wider sites use the per-head kernel
        fallback = fused_site_call_lse if with_lse else fused_site_call_dma
        return fallback(
            t3m, wy, f, shift, packed, gcol, k, v, qcm, H, W, Hpg,
            interpret, nreal, scale,
        )
    from bevrender_tpu.ops.pallas.lattice_bias import _tile_size

    TN = _tile_size(Np)
    H1AL = _h1al(H)
    NT = Np // TN
    n_cells = B * G * NT
    r8 = -(-n_cells // 8) * 8
    packed2 = jnp.pad(packed.reshape(n_cells, TN), ((0, r8 - n_cells), (0, 0)))
    nblk = r8 // 8

    # heads folded on lanes: (B, G, Hpg, Np, ch) -> (B, G, Np, Hpg*ch)
    kb = jnp.transpose(k, (0, 1, 3, 2, 4)).reshape(B, G, Np, HC)
    vb = jnp.transpose(v, (0, 1, 3, 2, 4)).reshape(B, G, Np, HC)
    # block-diagonal padded queries: qb[., h*ch+c, iy*128 + h*W + x] =
    # qcm[., h, c, iy*W + x]; cross-head and pad columns are zero
    q5 = qcm.reshape(B, G, Hpg, ch, H, W)
    qb = jnp.zeros((B, G, HC, H, 128), qcm.dtype)
    for h in range(Hpg):
        qb = jax.lax.dynamic_update_slice(
            qb, q5[:, :, h], (0, 0, h * ch, 0, h * W)
        )
    qb = qb.reshape(B, G, HC, Mbig)

    out_specs = pl.BlockSpec(
        (1, 1, Hpg, ch, M),
        lambda bg, t: (bg // G, bg % G, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((B, G, Hpg, ch, M), jnp.float32)
    if with_lse:
        out_specs = [
            out_specs,
            pl.BlockSpec(
                (1, 1, Hpg, M),
                lambda bg, t: (bg // G, bg % G, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((B, G, Hpg, M), jnp.float32),
        ]
    return pl.pallas_call(
        functools.partial(
            _site_kernel_v2_lse if with_lse else _site_kernel_v2,
            H=H, W=W, Hpg=Hpg, ch=ch, TN=TN, Np=Np,
            nreal=nreal, scale=float(scale),
        ),
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
            pl.BlockSpec((1, 1, TN, HC),
                         lambda bg, t: (bg // G, bg % G, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, HC),
                         lambda bg, t: (bg // G, bg % G, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HC, Mbig),
                         lambda bg, t: (bg // G, bg % G, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, TN, 3, H1AL, WH), t3m.dtype),
            pltpu.VMEM((TN, H1AL, WH), jnp.float32),  # xin: f32 avoids per-stage converts
            pltpu.VMEM((TN, H + 1, WH), jnp.float32),  # xres: f32 avoids per-stage converts
            pltpu.VMEM((TN, Mbig), jnp.float32),
            pltpu.VMEM((1, Mbig), jnp.float32),
            pltpu.VMEM((1, Mbig), jnp.float32),
            pltpu.VMEM((HC, Mbig), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(packed2, packed2, t3m, wy, f, shift, gcol, kb, vb, qb)



def fused_site_call_v2_lse(
    t3m, wy, f, shift, packed, gcol, k, v, qcm, H, W, Hpg, interpret,
    nreal, scale,
):
    """``fused_site_call_v2`` that also returns the logsumexp — the training
    forward for the head-folded variant (wide sites fall back to the
    per-head ``fused_site_call_lse`` inside)."""
    return fused_site_call_v2(
        t3m, wy, f, shift, packed, gcol, k, v, qcm, H, W, Hpg, interpret,
        nreal, scale, with_lse=True,
    )



def _site_kernel_sh2(
    packed_ref,  # SMEM (8, TN) int32: ys8 << 16 | (s*m_max + ms)
    t3_ref,      # VMEM (1, 8*m_max, Yp2, LB) — lanes padded to LB with -1e30
    wy_ref, f_ref, gcol_ref,
    kb_ref,      # VMEM (1, 1, TN, HC) keys, heads folded on lanes
    vb_ref,      # VMEM (1, 1, TN, HC)
    qb_ref,      # VMEM (1, 1, HC, H*LB) block-diagonal row-folded queries
    out_ref,     # VMEM (1, 1, Hpg, ch, M) f32
    win,         # scratch (TN, 3, H1ALS, LB) table-dtype
    xres,        # scratch (TN, H+1, LB) f32
    sblk,        # scratch (TN, H*LB) f32 — row-folded bias/scores
    macc, lacc,  # scratch (1, H*LB) f32
    oacc,        # scratch (HC, H*LB) f32
    *,
    H: int, W: int, Hpg: int, ch: int, TN: int, Np: int,
    nreal: int, scale: float, LB: int,
):
    """Row-folded sh site kernel: scores live in ONE (TN, H*LB) tile with
    column iy*LB + h*W + x (LB = 64 at flagship), so every y-mix store is a
    single whole-row granule write instead of Hpg narrow slices; QK and AV
    run as ONE block-diagonal MXU dot and the per-head narrow writeout
    happens once per cell. Pad columns carry -1e30 from the staging
    (deform_attn._kernel_inputs_sh lane_block), so the streaming softmax
    keeps them inert for free.

    Measured NET-NEUTRAL-to-slower vs the per-head sh kernel on v5e
    (g8 0.99x, g4/TSA 0.97x): the ~0.9 ms/site saved on split stores is
    repaid by +14% softmax lanes in the folded layout (H*64 = 1792 vs
    Hpg*M = 1568 columns). A/B knob BEVRENDER_SITE_SH2=1; per-head sh is
    the production default."""
    NT = Np // TN
    t = pl.program_id(1)
    row = (pl.program_id(0) * NT + t) % 8
    HC = Hpg * ch
    _fill_xres_sh(packed_ref, t3_ref, f_ref, gcol_ref, win, xres, row, H)

    @pl.when(t == 0)
    def _():
        macc[...] = jnp.full(macc.shape, -1e30, jnp.float32)
        lacc[...] = jnp.zeros(lacc.shape, jnp.float32)
        oacc[...] = jnp.zeros(oacc.shape, jnp.float32)

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
        sblk[:, iy * LB : (iy + 1) * LB] = rowv

    kblk = kb_ref[0, 0].astype(jnp.bfloat16)   # (TN, HC)
    qblk = qb_ref[0, 0].astype(jnp.bfloat16)   # (HC, H*LB)
    qk = jax.lax.dot_general(
        kblk, qblk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = sblk[...] + scale * qk                  # (TN, H*LB)
    mold = macc[...]
    mnew = jnp.maximum(mold, jnp.max(s, axis=0, keepdims=True))
    p = jnp.exp(s - mnew)
    alpha = jnp.exp(mold - mnew)
    macc[...] = mnew
    lacc[...] = lacc[...] * alpha + jnp.sum(p, axis=0, keepdims=True)
    vblk = vb_ref[0, 0].astype(jnp.bfloat16)    # (TN, HC)
    contrib = jax.lax.dot_general(
        vblk, p.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # (HC, H*LB)
    oacc[...] = oacc[...] * alpha + contrib

    @pl.when(t == NT - 1)
    def _():
        for h in range(Hpg):
            for iy in range(H):
                col = iy * LB + h * W
                lsafe = jnp.maximum(lacc[:, col : col + W], 1e-30)
                out_ref[0, 0, h, :, iy * W : (iy + 1) * W] = (
                    oacc[h * ch : (h + 1) * ch, col : col + W] / lsafe
                ).astype(out_ref.dtype)


def fused_site_call_sh2(
    t3s, wy, f, packed, gcol, k, v, qcm, H, W, Hpg, interpret, nreal, scale,
):
    """Row-folded sh site (see :func:`_site_kernel_sh2`). ``t3s``/``gcol``
    must be staged with ``lane_block=LB`` (64 when Hpg*W <= 64, 128 when
    <= 128); wider sites use :func:`fused_site_call_sh`."""
    G, m8, Yp2, LB = t3s.shape
    B, _, Np, _ = wy.shape
    M = H * W
    ch = k.shape[-1]
    HC = Hpg * ch
    Mbig = H * LB
    from bevrender_tpu.ops.pallas.lattice_bias import _tile_size

    TN = _tile_size(Np)
    H1ALS = _h1als(H)
    NT = Np // TN
    n_cells = B * G * NT
    r8 = -(-n_cells // 8) * 8
    packed2 = jnp.pad(packed.reshape(n_cells, TN), ((0, r8 - n_cells), (0, 0)))

    # heads folded on lanes: (B, G, Hpg, Np, ch) -> (B, G, Np, HC)
    kb = jnp.transpose(k, (0, 1, 3, 2, 4)).reshape(B, G, Np, HC)
    vb = jnp.transpose(v, (0, 1, 3, 2, 4)).reshape(B, G, Np, HC)
    # block-diagonal row-folded queries:
    # qb[., h*ch+c, iy*LB + h*W + x] = qcm[., h, c, iy*W + x]
    q5 = qcm.reshape(B, G, Hpg, ch, H, W)
    qb = jnp.zeros((B, G, HC, H, LB), qcm.dtype)
    for h in range(Hpg):
        qb = jax.lax.dynamic_update_slice(
            qb, q5[:, :, h], (0, 0, h * ch, 0, h * W)
        )
    qb = qb.reshape(B, G, HC, Mbig)

    return pl.pallas_call(
        functools.partial(
            _site_kernel_sh2, H=H, W=W, Hpg=Hpg, ch=ch, TN=TN, Np=Np,
            nreal=nreal, scale=float(scale), LB=LB,
        ),
        grid=(B * G, NT),
        in_specs=[
            pl.BlockSpec((8, TN), lambda bg, t: ((bg * NT + t) // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m8, Yp2, LB), lambda bg, t: (bg % G, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda bg, t: (bg // G, bg % G, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda bg, t: (bg // G, bg % G, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LB), lambda bg, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, HC),
                         lambda bg, t: (bg // G, bg % G, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, HC),
                         lambda bg, t: (bg // G, bg % G, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HC, Mbig),
                         lambda bg, t: (bg // G, bg % G, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, Hpg, ch, M),
            lambda bg, t: (bg // G, bg % G, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((TN, 3, H1ALS, LB), t3s.dtype),
            pltpu.VMEM((TN, H + 1, LB), jnp.float32),
            pltpu.VMEM((TN, Mbig), jnp.float32),
            pltpu.VMEM((1, Mbig), jnp.float32),
            pltpu.VMEM((1, Mbig), jnp.float32),
            pltpu.VMEM((HC, Mbig), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, G, Hpg, ch, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024
        ),
        interpret=interpret,
    )(packed2, t3s, wy, f, gcol, kb, vb, qb)

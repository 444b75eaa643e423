"""Pallas TPU kernel: FULLY fused deformable-attention site.

Round-2 fused the rpe-bias *generation* (``lattice_bias.py``) but its
``(B, G, Hpg, N, M)`` output still round-tripped HBM, and the scores
materialized per site in XLA (transiently, under ``jax.checkpoint``). This
kernel consumes the bias in-VMEM: per (b, g) cell and key tile it

  1. builds the bias tile with the shared front-end
     (``lattice_bias._fill_xres`` + y-mix) into a VMEM scratch,
  2. computes ``s = scale * K_tile Q^T + bias`` with an MXU ``dot_general``
     per head (the ch=4..8 contraction under-fills the systolic array, but
     one MXU pass beats ch VPU sweeps of the (TN, M) tile and runs
     concurrently with the VPU bias/softmax work),
  3. folds the tile into flash-style online-softmax state carried in VMEM
     scratch across the key-tile grid axis (running max m, running sum l,
     output accumulator O — Dao et al.'s streaming softmax),
  4. at the last tile writes ``O / l`` to the output block.

Neither the bias nor the scores ever exist in HBM; per-site HBM traffic
drops from O(B G Hpg N M) to O(K + V + Q + geometry + out). The model is
bandwidth-bound, so this is the round-3 perf lever (VERDICT item 3).

Replaces the XLA consumer for the reference's dense path
(SCA_deform_attn.py:331-413: scores + grid_sample'd rpe + softmax + AV).

Key-axis padding: rows >= nreal get bias -1e30 from the y-mix (as in the
bias-only kernel), so exp(s - m) underflows to exactly 0 and padded keys
vanish from l and O with no separate masking. Every tile holds >= 1 real key
(pad < TN by construction), so the running max is never the -1e30 sentinel.

The backward is host-side: a custom VJP in ``ops/deform_attn.py`` recomputes
through the XLA consumer (whose bias stage uses ``lattice_bias_fused``'s own
custom VJP), which is exactly what the round-2 training path executed — so
training gets this kernel's faster forward for free while the flash-style
backward kernel remains future work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bevrender_tpu.ops.pallas.lattice_bias import (
    _fill_xres,
    _fill_xres_sh,
    _h1al,
    _h1als,
    _mix_resolve,
)

# grid order actually used by the MOST RECENT fused_site_call_sh trace (the
# BEVRENDER_SH_GMAJOR env knob is trace-time only — see the note at its read
# site); benches stamp this into artifacts instead of echoing the env.
LAST_TRACED_GMAJOR = None


def _site_fwd_body(
    packed_ref, t3_ref, wy_ref, f_ref, shift_ref, gcol_ref,
    k_ref, v_ref, q_ref, out_ref, lse_ref,
    win, xin, xres, sblk, macc, lacc, oacc,
    *, H, W, Hpg, ch, TN, Np, nreal, scale,
):
    """Shared fused-site forward body (see _site_kernel for ref shapes).

    ``lse_ref`` is None for the eval kernel; the training kernel passes a
    (1, 1, Hpg, M) block and receives the softmax logsumexp (the
    flash-attention backward residual)."""
    NT = Np // TN
    t = pl.program_id(1)
    row = (pl.program_id(0) * NT + t) % 8

    _fill_xres(
        packed_ref, t3_ref, f_ref, shift_ref, gcol_ref, win, xin, xres, row, H
    )

    # y-mix into the per-head score scratch; padded keys get -1e30
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
        for h in range(Hpg):
            sblk[h, :, iy * W : (iy + 1) * W] = rowv[:, h * W : (h + 1) * W]

    @pl.when(t == 0)
    def _():
        macc[...] = jnp.full(macc.shape, -1e30, jnp.float32)
        lacc[...] = jnp.zeros(lacc.shape, jnp.float32)
        oacc[...] = jnp.zeros(oacc.shape, jnp.float32)

    for h in range(Hpg):
        kblk = k_ref[0, 0, h].astype(jnp.bfloat16)  # (TN, ch)
        qblk = q_ref[0, 0, h].astype(jnp.bfloat16)  # (ch, M)
        # scores on the MXU: (TN, ch) @ (ch, M) -> f32 (TN, M). The ch=4..8
        # contraction under-fills the systolic array, but one MXU pass still
        # beats ch VPU outer-product sweeps of the (TN, M) tile AND frees the
        # VPU for the bias/softmax work it runs concurrently.
        qk = jax.lax.dot_general(
            kblk, qblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = sblk[h] + scale * qk  # (TN, M)

        # online softmax over the key-tile grid axis
        mold = macc[h : h + 1, :]  # (1, M)
        mnew = jnp.maximum(mold, jnp.max(s, axis=0, keepdims=True))
        p = jnp.exp(s - mnew)  # (TN, M); -1e30 rows underflow to 0
        alpha = jnp.exp(mold - mnew)  # (1, M)
        macc[h : h + 1, :] = mnew
        lacc[h : h + 1, :] = lacc[h : h + 1, :] * alpha + jnp.sum(
            p, axis=0, keepdims=True
        )
        # AV on the MXU: (ch, TN) x (TN, M) with the TN=64.. contraction on
        # the systolic axis — replaces ch VPU sublane reductions of the full
        # (TN, M) tile (the kernel's former hot spot). p in bf16 matches the
        # XLA consumer's p.astype(bf16) @ v.
        vblk = v_ref[0, 0, h].astype(jnp.bfloat16)  # (TN, ch)
        contrib = jax.lax.dot_general(
            vblk, p.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (ch, M)
        oacc[h] = oacc[h] * alpha + contrib

    @pl.when(t == NT - 1)
    def _():
        lsafe = jnp.maximum(lacc[...], 1e-30)
        for h in range(Hpg):
            out_ref[0, 0, h] = (
                oacc[h] / lsafe[h : h + 1, :]
            ).astype(out_ref.dtype)
        if lse_ref is not None:
            lse_ref[0, 0] = (macc[...] + jnp.log(lsafe)).astype(lse_ref.dtype)


def _site_kernel(
    packed_ref,  # SMEM (8, TN) int32: ys<<16 | ms, row = cell % 8
    t3_ref,      # VMEM (1, m_max, Ypad, WH) bf16/f32, WH = Hpg*W head-major
    wy_ref,      # VMEM (1, 1, TN, 1) f32
    f_ref,       # VMEM (1, 1, TN, 1) f32
    shift_ref,   # VMEM (1, 1, TN, 1) f32 (0..7)
    gcol_ref,    # VMEM (1, WH) f32
    k_ref,       # VMEM (1, 1, Hpg, TN, ch)
    v_ref,       # VMEM (1, 1, Hpg, TN, ch)
    q_ref,       # VMEM (1, 1, Hpg, ch, M) c-major: queries on lanes
    out_ref,     # VMEM (1, 1, Hpg, ch, M) f32
    win,         # scratch (TN, 3, H1AL, WH) table-dtype
    xin,         # scratch (TN, H1AL, WH) f32
    xres,        # scratch (TN, H+1, WH) f32
    sblk,        # scratch (Hpg, TN, M) f32 — bias/scores tile
    macc,        # scratch (Hpg, M) f32 — running max per (head, query)
    lacc,        # scratch (Hpg, M) f32 — running sum
    oacc,        # scratch (Hpg, ch, M) f32 — unnormalized output
    **consts,
):
    _site_fwd_body(
        packed_ref, t3_ref, wy_ref, f_ref, shift_ref, gcol_ref,
        k_ref, v_ref, q_ref, out_ref, None,
        win, xin, xres, sblk, macc, lacc, oacc, **consts,
    )


def _site_kernel_lse(
    packed_ref, t3_ref, wy_ref, f_ref, shift_ref, gcol_ref,
    k_ref, v_ref, q_ref,
    out_ref,     # VMEM (1, 1, Hpg, ch, M) f32
    lse_ref,     # VMEM (1, 1, Hpg, M) f32 — logsumexp per (head, query)
    win, xin, xres, sblk, macc, lacc, oacc,
    **consts,
):
    """``_site_kernel`` that also emits the softmax logsumexp.

    The saved ``lse = m + log(l)`` lets the fused backward kernel
    (:func:`_site_bwd_kernel`) recompute the attention probabilities exactly
    (``p = exp(s - lse)``) without a second online pass — the standard
    flash-attention residual (Dao et al.).
    """
    _site_fwd_body(
        packed_ref, t3_ref, wy_ref, f_ref, shift_ref, gcol_ref,
        k_ref, v_ref, q_ref, out_ref, lse_ref,
        win, xin, xres, sblk, macc, lacc, oacc, **consts,
    )


def _fused_site_pallas_call(
    t3m, wy, f, shift, packed, gcol, k, v, qcm, H, W, Hpg, interpret,
    nreal, scale, with_lse,
):
    """Shared builder for the inline-extract fused site kernel
    (``fused_site_call`` / ``fused_site_call_lse``)."""
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
            _site_kernel_lse if with_lse else _site_kernel,
            H=H, W=W, Hpg=Hpg, ch=ch, TN=TN, Np=Np,
            nreal=nreal, scale=float(scale),
        ),
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
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((TN, 3, H1AL, WH), t3m.dtype),
            pltpu.VMEM((TN, H1AL, WH), jnp.float32),  # xin: f32 avoids per-stage converts
            pltpu.VMEM((TN, H + 1, WH), jnp.float32),  # xres: f32 avoids per-stage converts
            pltpu.VMEM((Hpg, TN, M), jnp.float32),
            pltpu.VMEM((Hpg, M), jnp.float32),
            pltpu.VMEM((Hpg, M), jnp.float32),
            pltpu.VMEM((Hpg, ch, M), jnp.float32),
        ],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(packed2, t3m, wy, f, shift, gcol, k, v, qcm)


def fused_site_call_lse(
    t3m, wy, f, shift, packed, gcol, k, v, qcm, H, W, Hpg, interpret,
    nreal, scale,
):
    """``fused_site_call`` that also returns the (B, G, Hpg, M) logsumexp
    (the flash-attention backward residual)."""
    return _fused_site_pallas_call(
        t3m, wy, f, shift, packed, gcol, k, v, qcm, H, W, Hpg, interpret,
        nreal, scale, with_lse=True,
    )


def _site_bwd_kernel(
    packed_ref,  # SMEM (8, TN) int32
    t3_ref,      # VMEM (1, m_max, Ypad, WH)
    wy_ref,      # VMEM (1, 1, TN, 1) f32
    f_ref,       # VMEM (1, 1, TN, 1) f32
    shift_ref,   # VMEM (1, 1, TN, 1) f32
    gcol_ref,    # VMEM (1, WH) f32
    k_ref,       # VMEM (1, 1, Hpg, TN, ch)
    v_ref,       # VMEM (1, 1, Hpg, TN, ch)
    q_ref,       # VMEM (1, 1, Hpg, ch, M)
    do_ref,      # VMEM (1, 1, Hpg, ch, M) f32 — output cotangent (c-major)
    lse_ref,     # VMEM (1, 1, Hpg, M) f32 — fwd logsumexp
    dD_ref,      # VMEM (1, 1, Hpg, M) f32 — D = rowsum(dO * O) per (h, query)
    dt3_ref,     # out VMEM (1, m_max, Ypad, WH) f32 — resident per g
    dwy_ref,     # out VMEM (1, 1, TN, 1) f32
    df_ref,      # out VMEM (1, 1, TN, 1) f32
    dk_ref,      # out VMEM (1, 1, Hpg, TN, ch) f32
    dv_ref,      # out VMEM (1, 1, Hpg, TN, ch) f32
    dq_ref,      # out VMEM (1, 1, Hpg, ch, M) f32
    win, xin, xres,   # recompute scratch (table dtype)
    dsblk,       # scratch (Hpg, TN, M) f32 — bias rows, then ds
    dqacc,       # scratch (Hpg, ch, M) f32
    dxres,       # scratch (TN, H+1, WH) f32
    dxin,        # scratch (TN, H1AL, WH) f32
    dwin,        # scratch (TN, 3, H1AL, WH) f32
    *,
    H: int, W: int, Hpg: int, ch: int, TN: int, Np: int,
    nreal: int, scale: float, G: int,
):
    """Fused backward of the attention site (flash-style, residual = lse).

    Per (g, b) cell and key tile, entirely in VMEM:
      1. recompute the bias tile (``_fill_xres`` front-end + y-mix) and the
         scores ``s = bias + scale * K Q^T``; ``p = exp(s - lse)`` is exact
         (same op sequence as the forward, lse saved);
      2. MXU dots: ``dV = p dO^T``, ``dp = V dO``, ``ds = p (dp - D)``,
         ``dK = scale * ds Q^T``, ``dQ += scale * K^T ds`` (accumulated
         across tiles in scratch, written at the last tile);
      3. the bias-cotangent tail of ``lattice_bias._bwd_kernel`` runs inline
         on ``ds`` (transposed y-mix -> shift resolve -> x-mix -> per-key
         scatter-add into the g-resident ``dt3`` block, plus dwy/df) — the
         (B, G, Hpg, N, M) score/bias cotangents never exist in HBM.

    Replaces the XLA-consumer recompute backward (ops/deform_attn.py
    ``_fused_site_bwd``), which paid a full XLA forward + backward of the
    dense site per gradient step.
    """
    g = pl.program_id(0)
    b = pl.program_id(1)
    t = pl.program_id(2)
    NT = Np // TN
    row = ((b * G + g) * NT + t) % 8

    @pl.when((b == 0) & (t == 0))
    def _():
        dt3_ref[...] = jnp.zeros(dt3_ref.shape, dt3_ref.dtype)

    @pl.when(t == 0)
    def _():
        dqacc[...] = jnp.zeros(dqacc.shape, jnp.float32)

    # recompute forward front-end (residual-free except lse)
    wx, cb = _fill_xres(
        packed_ref, t3_ref, f_ref, shift_ref, gcol_ref, win, xin, xres, row, H
    )

    wy = wy_ref[0, 0]
    if Np == nreal:
        valid = None
    else:
        kid = jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0) + t * TN
        valid = kid < nreal
    # rebuild the bias tile into dsblk (reused as s -> p -> ds in place)
    for iy in range(H):
        rowv = (1.0 - wy) * xres[:, iy, :] + wy * xres[:, iy + 1, :]
        if valid is not None:
            rowv = jnp.where(valid, rowv, -1e30)
        for h in range(Hpg):
            dsblk[h, :, iy * W : (iy + 1) * W] = rowv[:, h * W : (h + 1) * W]

    lse = lse_ref[0, 0]  # (Hpg, M)
    dD = dD_ref[0, 0]    # (Hpg, M)
    for h in range(Hpg):
        kblk = k_ref[0, 0, h].astype(jnp.bfloat16)   # (TN, ch)
        qblk = q_ref[0, 0, h].astype(jnp.bfloat16)   # (ch, M)
        qk = jax.lax.dot_general(
            kblk, qblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = dsblk[h] + scale * qk
        # exact probabilities: same op sequence as the forward, shifted by
        # the saved logsumexp (pad keys: exp(-1e30 - lse) == 0)
        p = jnp.exp(s - lse[h : h + 1, :])           # (TN, M) f32
        doblk = do_ref[0, 0, h].astype(jnp.bfloat16)  # (ch, M)
        vblk = v_ref[0, 0, h].astype(jnp.bfloat16)   # (TN, ch)
        pb = p.astype(jnp.bfloat16)
        dv = jax.lax.dot_general(
            pb, doblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (TN, ch)
        dv_ref[0, 0, h] = dv.astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            vblk, doblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (TN, M)
        ds = p * (dp - dD[h : h + 1, :])             # (TN, M) f32
        dsb = ds.astype(jnp.bfloat16)
        dk = jax.lax.dot_general(
            dsb, qblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (TN, ch)
        dk_ref[0, 0, h] = (scale * dk).astype(dk_ref.dtype)
        dq = jax.lax.dot_general(
            kblk, dsb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (ch, M)
        dqacc[h] = dqacc[h] + scale * dq
        dsblk[h] = ds

    @pl.when(t == NT - 1)
    def _():
        for h in range(Hpg):
            dq_ref[0, 0, h] = dqacc[h].astype(dq_ref.dtype)

    # ---- bias-cotangent tail (shared with lattice_bias._bwd_kernel) ----
    from bevrender_tpu.ops.pallas.lattice_bias import _bias_cotangent_tail

    def grow_row(iy):
        parts = []
        for h in range(Hpg):
            parts.append(dsblk[h, :, iy * W : (iy + 1) * W])
        return jnp.concatenate(parts, axis=-1)  # (TN, WH) f32

    _bias_cotangent_tail(
        grow_row, packed_ref, wy, shift_ref, win, xres, wx, cb,
        dt3_ref, dwy_ref, df_ref, dxres, dxin, dwin, row, H,
    )


def site_bwd_call(
    t3m, wy, f, shift, packed, gcol, k, v, qcm, do_cm, lse, dD,
    H, W, Hpg, interpret, nreal, scale,
):
    """Run the fused site backward kernel.

    Args (beyond ``fused_site_call``'s): ``do_cm`` (B, G, Hpg, ch, M) f32
    output cotangent (channel-major), ``lse``/``dD`` (B, G, Hpg, M) f32
    forward logsumexp and rowsum(dO * O).

    Returns (dt3 f32, dwy, df, dk, dv, dq_cm) — dk/dv key-padded like k/v,
    dq_cm channel-major like qcm.
    """
    G, m_max, Ypad, WH = t3m.shape
    B, _, Np, _ = wy.shape
    M = H * W
    ch = k.shape[-1]
    from bevrender_tpu.ops.pallas.lattice_bias import _tile_size

    TN = min(_tile_size(Np), 64)
    H1AL = _h1al(H)
    NT = Np // TN
    n_cells = B * G * NT
    r8 = -(-n_cells // 8) * 8
    packed2 = jnp.pad(packed.reshape(n_cells, TN), ((0, r8 - n_cells), (0, 0)))
    return pl.pallas_call(
        functools.partial(
            _site_bwd_kernel, H=H, W=W, Hpg=Hpg, ch=ch, TN=TN, Np=Np,
            nreal=nreal, scale=float(scale), G=G,
        ),
        grid=(G, B, NT),
        in_specs=[
            pl.BlockSpec((8, TN),
                         lambda g, b, t: (((b * G + g) * NT + t) // 8, 0),
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
            pl.BlockSpec((1, 1, Hpg, TN, ch),
                         lambda g, b, t: (b, g, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hpg, TN, ch),
                         lambda g, b, t: (b, g, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hpg, ch, M),
                         lambda g, b, t: (b, g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hpg, ch, M),
                         lambda g, b, t: (b, g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hpg, M), lambda g, b, t: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hpg, M), lambda g, b, t: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, m_max, Ypad, WH), lambda g, b, t: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda g, b, t: (b, g, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1), lambda g, b, t: (b, g, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hpg, TN, ch),
                         lambda g, b, t: (b, g, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hpg, TN, ch),
                         lambda g, b, t: (b, g, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hpg, ch, M),
                         lambda g, b, t: (b, g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TN, 3, H1AL, WH), t3m.dtype),
            pltpu.VMEM((TN, H1AL, WH), jnp.float32),  # xin: f32 avoids per-stage converts
            pltpu.VMEM((TN, H + 1, WH), jnp.float32),  # xres: f32 avoids per-stage converts
            pltpu.VMEM((Hpg, TN, M), jnp.float32),
            pltpu.VMEM((Hpg, ch, M), jnp.float32),
            pltpu.VMEM((TN, H + 1, WH), jnp.float32),
            pltpu.VMEM((TN, H1AL, WH), jnp.float32),
            pltpu.VMEM((TN, 3, H1AL, WH), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, m_max, Ypad, WH), jnp.float32),
            jax.ShapeDtypeStruct((B, G, Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, G, Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, G, Hpg, Np, ch), jnp.float32),
            jax.ShapeDtypeStruct((B, G, Hpg, Np, ch), jnp.float32),
            jax.ShapeDtypeStruct((B, G, Hpg, ch, M), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(packed2, t3m, wy, f, shift, gcol, k, v, qcm, do_cm, lse, dD)


def fused_site_call(
    t3m, wy, f, shift, packed, gcol, k, v, qcm, H, W, Hpg, interpret,
    nreal, scale,
):
    """Run the fused attention site.

    Args (beyond ``lattice_bias_fused``'s):
      k, v: (B, G, Hpg, Np, ch) — key-padded to the tile multiple.
      qcm:  (B, G, Hpg, ch, M) — queries channel-major (M on lanes).
      scale: static score scale.

    Returns (B, G, Hpg, ch, M) f32 attention output (channel-major).
    """
    return _fused_site_pallas_call(
        t3m, wy, f, shift, packed, gcol, k, v, qcm, H, W, Hpg, interpret,
        nreal, scale, with_lse=False,
    )


def _site_kernel_sh(
    packed_ref,  # SMEM (8, TN) int32: ys8 << 16 | (s*m_max + ms)
    t3_ref,      # VMEM (1, 8*m_max, Yp2, WH)
    wy_ref, f_ref, gcol_ref,
    k_ref,       # VMEM (1, 1, Hpg, TN, ch)
    v_ref,       # VMEM (1, 1, Hpg, TN, ch)
    q_ref,       # VMEM (1, 1, Hpg, ch, M)
    out_ref,     # VMEM (1, 1, Hpg, ch, M) f32
    win,         # scratch (TN, 3, H1ALS, WH) table-dtype
    xres,        # scratch (TN, H+1, WH) f32
    sblk, macc, lacc, oacc,
    *,
    H: int, W: int, Hpg: int, ch: int, TN: int, Np: int,
    nreal: int, scale: float, B: int = 0,
):
    """Fused attention site on the shift-replicated staging: aligned window
    extraction + x-mix straight to the lerp rows (no resolve, no key sort),
    then the same flash-style online softmax as :func:`_site_fwd_body`.

    ``B > 0`` marks g-major grid order (BEVRENDER_SH_GMAJOR=1):
    ``program_id(0) = g * B + b``, so the 8 MB staged-table block stays
    resident for B consecutive cells instead of being re-fetched per cell;
    the packed-geometry cell id is remapped back to the b-major packing."""
    NT = Np // TN
    t = pl.program_id(1)
    if B:
        bg = pl.program_id(0)
        G = pl.num_programs(0) // B
        cell = ((bg % B) * G + bg // B)
    else:
        cell = pl.program_id(0)
    row = (cell * NT + t) % 8
    _fill_xres_sh(packed_ref, t3_ref, f_ref, gcol_ref, win, xres, row, H)

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
        lsafe = jnp.maximum(lacc[...], 1e-30)
        for h in range(Hpg):
            out_ref[0, 0, h] = (
                oacc[h] / lsafe[h : h + 1, :]
            ).astype(out_ref.dtype)


def fused_site_call_sh(
    t3s, wy, f, packed, gcol, k, v, qcm, H, W, Hpg, interpret, nreal, scale,
):
    """Fused attention site on the shift-replicated staging (eval path;
    backward recomputes through the XLA consumer like ``fused_site_call``).

    G-major grid order (default for G > 1; BEVRENDER_SH_GMAJOR=0/1 forces,
    trace-time like the other kernel knobs): the staged-table block index
    then changes only every B cells, so Pallas re-fetches the ~8 MB block G
    times per call instead of B*G times. Measured on v5e at the flagship g8
    site: 4.55 -> 4.02 ms/call (-11.5%), bit-exact; neutral at G=1
    (SITE_GMAJOR_AB.json)."""
    import os

    G, m8, Yp2, WH = t3s.shape
    B, _, Np, _ = wy.shape
    M = H * W
    ch = k.shape[-1]
    from bevrender_tpu.ops.pallas.lattice_bias import _tile_size

    TN = _tile_size(Np)
    H1ALS = _h1als(H)
    NT = Np // TN
    n_cells = B * G * NT
    r8 = -(-n_cells // 8) * 8
    packed2 = jnp.pad(packed.reshape(n_cells, TN), ((0, r8 - n_cells), (0, 0)))
    env = os.environ.get("BEVRENDER_SH_GMAJOR")
    gmajor = G > 1 if env is None else env == "1"
    # TRACE-time knob (advisor r4): not part of any jit cache key, so
    # flipping the env mid-process does NOT retrace already-compiled shapes —
    # in-process A/Bs must jax.clear_caches() between arms or use fresh
    # processes. LAST_TRACED_GMAJOR records what the most recent trace
    # actually used, for artifact stamping.
    global LAST_TRACED_GMAJOR
    LAST_TRACED_GMAJOR = gmajor
    if gmajor:
        # program_id(0) = g * B + b; packed stays b-major, so remap
        cell = lambda bg: (bg % B) * G + bg // B
        bidx = lambda bg: bg % B
        gidx = lambda bg: bg // B
    else:
        cell = lambda bg: bg
        bidx = lambda bg: bg // G
        gidx = lambda bg: bg % G
    return pl.pallas_call(
        functools.partial(
            _site_kernel_sh, H=H, W=W, Hpg=Hpg, ch=ch, TN=TN, Np=Np,
            nreal=nreal, scale=float(scale), B=B if gmajor else 0,
        ),
        grid=(B * G, NT),
        in_specs=[
            pl.BlockSpec((8, TN),
                         lambda bg, t: ((cell(bg) * NT + t) // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m8, Yp2, WH), lambda bg, t: (gidx(bg), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1),
                         lambda bg, t: (bidx(bg), gidx(bg), t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, 1),
                         lambda bg, t: (bidx(bg), gidx(bg), t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WH), lambda bg, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hpg, TN, ch),
                         lambda bg, t: (bidx(bg), gidx(bg), 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hpg, TN, ch),
                         lambda bg, t: (bidx(bg), gidx(bg), 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hpg, ch, M),
                         lambda bg, t: (bidx(bg), gidx(bg), 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, Hpg, ch, M),
            lambda bg, t: (bidx(bg), gidx(bg), 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((TN, 3, H1ALS, WH), t3s.dtype),
            pltpu.VMEM((TN, H + 1, WH), jnp.float32),
            pltpu.VMEM((Hpg, TN, M), jnp.float32),
            pltpu.VMEM((Hpg, M), jnp.float32),
            pltpu.VMEM((Hpg, M), jnp.float32),
            pltpu.VMEM((Hpg, ch, M), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, G, Hpg, ch, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024
        ),
        interpret=interpret,
    )(packed2, t3s, wy, f, gcol, k, v, qcm)



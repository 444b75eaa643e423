"""Stage-ablation bench of the fused deformable-attention site kernel.

The fused site (ops/pallas/fused_attn.py) measures ~6 ms per call at the
flagship g8 shapes while its arithmetic roofline is ~100x lower, so the time
is going into one (or more) of its serial stages:

  A. window extraction  — TN-iteration fori_loop of (3, H1AL, WH) VMEM
                          copies at dynamic sublane starts,
  B. x-mix + shift resolve — full-width VPU lerps at WH=Hpg*W (56 of 128)
                          lanes,
  C. y-mix + flatten    — H*Hpg static stores of (TN, W) slices, W=28 of
                          128 lanes,
  D. QK + online softmax + AV — MXU dot_generals (ch-contraction) + VPU
                          exp/max/sum at M=784 lanes.

This script times kernel variants that run prefixes/subsets of those stages
(same grid, same block specs, same scratch) and reports the attributed
per-stage cost, so kernel optimization effort goes where the time is.
Variants are validated against each other in interpret mode on CPU first
(pass --interpret to run only that).

Writes SITE_STAGE_BENCH.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bevrender_tpu.ops.deform_attn import (
    _kernel_inputs,
    _kernel_inputs_sh,
    use_shift_replica,
)
from bevrender_tpu.ops.pallas.lattice_bias import (
    _fill_xres,
    _fill_xres_sh,
    _h1al,
    _h1als,
    _tile_size,
    lattice_bias_fused,
)
from bevrender_tpu.ops.pallas.fused_attn import (
    fused_site_call,
    fused_site_call_sh,
)


def _ablate_kernel(
    packed_ref, t3_ref, wy_ref, f_ref, shift_ref, gcol_ref, k_ref, v_ref,
    q_ref, out_ref, win, xin, xres, sblk, macc, lacc, oacc,
    *, H, W, Hpg, ch, TN, Np, nreal, scale,
    do_extract, do_mix, do_ymix, do_attn,
):
    """The fused site kernel with stages statically gated.

    Stage gating is prefix-consistent: ymix requires mix requires extract
    (each consumes the previous stage's scratch). do_attn can run with
    do_ymix=False (sblk holds stale/zero bias) to isolate stage D.
    """
    NT = Np // TN
    t = pl.program_id(1)
    row = (pl.program_id(0) * NT + t) % 8
    H1AL = _h1al(H)

    if do_extract and not do_mix:
        # extract only: the fori_loop of windowed VMEM copies
        def extract(i, c):
            packed = packed_ref[row, i]
            ys = packed >> 16
            ms = packed & 0xFFFF
            ys8 = pl.multiple_of((ys // 8) * 8, 8)
            win[i] = t3_ref[0, pl.ds(ms, 3), pl.ds(ys8, H1AL), :]
            return c

        jax.lax.fori_loop(0, TN, extract, 0)
        # touch win so the loop is not dead
        xres[...] = win[:, 0, : H + 1, :].astype(xres.dtype)
    elif do_mix:
        _fill_xres(
            packed_ref, t3_ref, f_ref, shift_ref, gcol_ref, win, xin, xres,
            row, H,
        )

    if do_ymix == "real":
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
    elif do_ymix == "nostores":
        # the same lerp over the whole (TN, H, WH) block in one op, dumped
        # full-width into the (already-consumed) win scratch: isolates the
        # lerp cost from the H*Hpg narrow (TN, W)-slice flatten stores
        wy = wy_ref[0, 0]
        if Np == nreal:
            valid = None
        else:
            kid = jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0) + t * TN
            valid = kid < nreal
        rowv_all = (1.0 - wy[..., None]) * xres[:, :H, :] + wy[
            ..., None
        ] * xres[:, 1 : H + 1, :]
        if valid is not None:
            rowv_all = jnp.where(valid[..., None], rowv_all, -1e30)
        win[:, 0, :H, :] = rowv_all.astype(win.dtype)

    @pl.when(t == 0)
    def _():
        macc[...] = jnp.full(macc.shape, -1e30, jnp.float32)
        lacc[...] = jnp.zeros(lacc.shape, jnp.float32)
        oacc[...] = jnp.zeros(oacc.shape, jnp.float32)
        if not do_ymix:
            sblk[...] = jnp.zeros(sblk.shape, jnp.float32)

    if do_attn:
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
        if do_attn:
            for h in range(Hpg):
                out_ref[0, 0, h] = (
                    oacc[h] / jnp.maximum(lacc[h : h + 1, :], 1e-30)
                ).astype(out_ref.dtype)
        elif do_ymix == "real":
            for h in range(Hpg):
                out_ref[0, 0, h] = sblk[h, :ch, :].astype(out_ref.dtype)
        elif do_ymix == "nostores":
            # reduce the full-width lerp result so stage C' is not dead code
            red = jnp.sum(win[:, 0, :H, :].astype(jnp.float32))
            out_ref[0, 0, 0] = jnp.zeros_like(out_ref[0, 0, 0]) + red
        else:
            # reduce xres so the front-end stages are not dead code
            red = jnp.sum(xres[...].astype(jnp.float32))
            out_ref[0, 0, 0] = jnp.zeros_like(out_ref[0, 0, 0]) + red


def ablate_call(
    t3m, wy, f, shift, packed, gcol, k, v, qcm, H, W, Hpg, interpret,
    nreal, scale, *, do_extract, do_mix, do_ymix, do_attn,
):
    G, m_max, Ypad, WH = t3m.shape
    B, _, Np, _ = wy.shape
    M = H * W
    ch = k.shape[-1]
    TN = _tile_size(Np)
    H1AL = _h1al(H)
    NT = Np // TN
    n_cells = B * G * NT
    r8 = -(-n_cells // 8) * 8
    packed2 = jnp.pad(packed.reshape(n_cells, TN), ((0, r8 - n_cells), (0, 0)))
    return pl.pallas_call(
        functools.partial(
            _ablate_kernel, H=H, W=W, Hpg=Hpg, ch=ch, TN=TN, Np=Np,
            nreal=nreal, scale=float(scale), do_extract=do_extract,
            do_mix=do_mix, do_ymix=do_ymix, do_attn=do_attn,
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
        out_specs=pl.BlockSpec(
            (1, 1, Hpg, ch, M),
            lambda bg, t: (bg // G, bg % G, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((TN, 3, H1AL, WH), t3m.dtype),
            pltpu.VMEM((TN, H1AL, WH), jnp.float32),  # xin (as production)
            pltpu.VMEM((TN, H + 1, WH), jnp.float32),  # xres (as production)
            pltpu.VMEM((Hpg, TN, M), jnp.float32),
            pltpu.VMEM((Hpg, M), jnp.float32),
            pltpu.VMEM((Hpg, M), jnp.float32),
            pltpu.VMEM((Hpg, ch, M), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, G, Hpg, ch, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(packed2, t3m, wy, f, shift, gcol, k, v, qcm)


def _ablate_kernel_sh(
    packed_ref, t3_ref, wy_ref, f_ref, gcol_ref, k_ref, v_ref,
    q_ref, out_ref, win, xres, sblk, macc, lacc, oacc,
    *, H, W, Hpg, ch, TN, Np, nreal, scale,
    do_extract, do_mix, do_ymix, do_attn,
):
    """Stage-gated copy of the PRODUCTION flagship kernel
    (ops/pallas/fused_attn._site_kernel_sh — the shift-replicated staging
    every flagship site selects via use_shift_replica)."""
    NT = Np // TN
    t = pl.program_id(1)
    row = (pl.program_id(0) * NT + t) % 8
    H1ALS = _h1als(H)

    if do_extract and not do_mix:
        # extract only: the aligned-window copy loop of _fill_xres_sh
        def extract(i, c):
            packed = packed_ref[row, i]
            ys8 = pl.multiple_of(packed >> 16, 8)
            msr = packed & 0xFFFF
            win[i] = t3_ref[0, pl.ds(msr, 3), pl.ds(ys8, H1ALS), :]
            return c

        for i in range(TN):
            extract(i, 0)
        xres[...] = win[:, 0, : H + 1, :].astype(xres.dtype)
    elif do_mix:
        _fill_xres_sh(packed_ref, t3_ref, f_ref, gcol_ref, win, xres, row, H)

    if do_ymix == "real":
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
    elif do_ymix == "nostores":
        wy = wy_ref[0, 0]
        if Np == nreal:
            valid = None
        else:
            kid = jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0) + t * TN
            valid = kid < nreal
        rowv_all = (1.0 - wy[..., None]) * xres[:, :H, :] + wy[
            ..., None
        ] * xres[:, 1 : H + 1, :]
        if valid is not None:
            rowv_all = jnp.where(valid[..., None], rowv_all, -1e30)
        win[:, 0, :H, :] = rowv_all.astype(win.dtype)

    @pl.when(t == 0)
    def _():
        macc[...] = jnp.full(macc.shape, -1e30, jnp.float32)
        lacc[...] = jnp.zeros(lacc.shape, jnp.float32)
        oacc[...] = jnp.zeros(oacc.shape, jnp.float32)
        if not do_ymix:
            sblk[...] = jnp.zeros(sblk.shape, jnp.float32)

    if do_attn:
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
        if do_attn:
            for h in range(Hpg):
                out_ref[0, 0, h] = (
                    oacc[h] / jnp.maximum(lacc[h : h + 1, :], 1e-30)
                ).astype(out_ref.dtype)
        elif do_ymix == "real":
            for h in range(Hpg):
                out_ref[0, 0, h] = sblk[h, :ch, :].astype(out_ref.dtype)
        elif do_ymix == "nostores":
            red = jnp.sum(win[:, 0, :H, :].astype(jnp.float32))
            out_ref[0, 0, 0] = jnp.zeros_like(out_ref[0, 0, 0]) + red
        else:
            red = jnp.sum(xres[...].astype(jnp.float32))
            out_ref[0, 0, 0] = jnp.zeros_like(out_ref[0, 0, 0]) + red


def ablate_call_sh(
    t3s, wy, f, packed, gcol, k, v, qcm, H, W, Hpg, interpret,
    nreal, scale, *, do_extract, do_mix, do_ymix, do_attn,
):
    G, m8, Yp2, WH = t3s.shape
    B, _, Np, _ = wy.shape
    M = H * W
    ch = k.shape[-1]
    TN = _tile_size(Np)
    H1ALS = _h1als(H)
    NT = Np // TN
    n_cells = B * G * NT
    r8 = -(-n_cells // 8) * 8
    packed2 = jnp.pad(packed.reshape(n_cells, TN), ((0, r8 - n_cells), (0, 0)))
    return pl.pallas_call(
        functools.partial(
            _ablate_kernel_sh, H=H, W=W, Hpg=Hpg, ch=ch, TN=TN, Np=Np,
            nreal=nreal, scale=float(scale), do_extract=do_extract,
            do_mix=do_mix, do_ymix=do_ymix, do_attn=do_attn,
        ),
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


def make_inputs(B, G, Hpg, H, W, N, ch, seed=0, wt=None):
    rng = np.random.default_rng(seed)
    if wt is None:
        wt = 2 * W * 5 - 1  # SCA table width at flagship depth 5
    table = jnp.asarray(
        rng.standard_normal((G, Hpg, 2 * H - 1, wt)), jnp.float32
    )
    # in-bounds normalized key positions (y, x)
    k_pos = jnp.asarray(
        rng.uniform(-0.95, 0.95, (B, G, N, 2)), jnp.float32
    )
    t3m, wy4, f4, shift4, packed, gcol, Np = _kernel_inputs(
        table, k_pos, H, W
    )
    k = jnp.asarray(
        rng.standard_normal((B, G, Hpg, Np, ch)), jnp.bfloat16
    )
    v = jnp.asarray(
        rng.standard_normal((B, G, Hpg, Np, ch)), jnp.bfloat16
    )
    qcm = jnp.asarray(
        rng.standard_normal((B, G, Hpg, ch, H * W)), jnp.bfloat16
    )
    return t3m, wy4, f4, shift4, packed, gcol, k, v, qcm, Np


VARIANTS = {
    # prefix-consistent stage sets
    "extract": dict(do_extract=True, do_mix=False, do_ymix=False, do_attn=False),
    "extract+mix": dict(do_extract=True, do_mix=True, do_ymix=False, do_attn=False),
    "extract+mix+ymix": dict(
        do_extract=True, do_mix=True, do_ymix="real", do_attn=False
    ),
    # stage-C variant: the same y-lerp in one full-width op, without the
    # H*Hpg narrow (TN, W)-slice flatten stores — isolates lerp vs store cost
    "extract+mix+ymix_nostores": dict(
        do_extract=True, do_mix=True, do_ymix="nostores", do_attn=False
    ),
    "attn_only": dict(do_extract=False, do_mix=False, do_ymix=False, do_attn=True),
    "full": dict(do_extract=True, do_mix=True, do_ymix="real", do_attn=True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode validation only")
    ap.add_argument("--only", default=None,
                    help="run a single variant (compile-hang bisection); "
                         "'production' runs only the production kernels")
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
        # tiny shapes for the interpreter
        B, G, Hpg, H, W, N, ch = 1, 2, 2, 8, 8, 64, 4
    else:
        # flagship g8 SCA shapes (EVAL_ATTRIBUTION.json g8_h16; ch = C/heads
        # = 64/16 = 4, N = 14*28*5 = 1960)
        B, G, Hpg, H, W, N, ch = 4, 8, 2, 28, 28, 1960, 4

    ins = make_inputs(B, G, Hpg, H, W, N, ch)
    t3m, wy4, f4, shift4, packed, gcol, k, v, qcm, Np = ins
    scale = ch ** -0.5
    # the PRODUCTION staging at these shapes (use_shift_replica gates the
    # dispatcher in ops/deform_attn._fused_site_impl)
    rng = np.random.default_rng(0)
    wt = 2 * W * 5 - 1
    table = jnp.asarray(
        rng.standard_normal((G, Hpg, 2 * H - 1, wt)), jnp.float32
    )
    k_pos = jnp.asarray(rng.uniform(-0.95, 0.95, (B, G, N, 2)), jnp.float32)
    sh_selected = use_shift_replica(table.shape, H, W)
    t3s, wy4s, f4s, packeds, gcols, Nps = _kernel_inputs_sh(
        table, k_pos, H, W
    )
    ks = jnp.asarray(rng.standard_normal((B, G, Hpg, Nps, ch)), jnp.bfloat16)
    vs = jnp.asarray(rng.standard_normal((B, G, Hpg, Nps, ch)), jnp.bfloat16)

    if args.interpret:
        # the 'full' ablation variant must agree with the production kernel
        ref = fused_site_call(
            t3m, wy4, f4, shift4, packed, gcol, k, v, qcm,
            H, W, Hpg, True, N, scale,
        )
        got = ablate_call(
            t3m, wy4, f4, shift4, packed, gcol, k, v, qcm,
            H, W, Hpg, True, N, scale, **VARIANTS["full"],
        )
        err = float(jnp.max(jnp.abs(ref - got)))
        assert err < 1e-5, f"full-variant mismatch vs production: {err}"
        # the sh 'full' ablation must agree with the sh production kernel
        ref_sh = fused_site_call_sh(
            t3s, wy4s, f4s, packeds, gcols, ks, vs, qcm,
            H, W, Hpg, True, N, scale,
        )
        got_sh = ablate_call_sh(
            t3s, wy4s, f4s, packeds, gcols, ks, vs, qcm,
            H, W, Hpg, True, N, scale, **VARIANTS["full"],
        )
        err = float(jnp.max(jnp.abs(ref_sh - got_sh)))
        assert err < 1e-5, f"sh full-variant mismatch vs production: {err}"
        # every variant must at least execute
        for name, flags in VARIANTS.items():
            out = ablate_call(
                t3m, wy4, f4, shift4, packed, gcol, k, v, qcm,
                H, W, Hpg, True, N, scale, **flags,
            )
            # only head 0 / the written rows are defined for the
            # front-end-only variants; the rest of the out buffer is
            # uninitialized scratch
            assert np.all(np.isfinite(np.asarray(out[:, :, 0, 0, :]))), name
            out = ablate_call_sh(
                t3s, wy4s, f4s, packeds, gcols, ks, vs, qcm,
                H, W, Hpg, True, N, scale, **flags,
            )
            assert np.all(np.isfinite(np.asarray(out[:, :, 0, 0, :]))), (
                "sh", name,
            )
        print("interpret-mode validation OK (resolve + sh ablations)")
        return

    from bevrender_tpu.utils.timing import device_bench

    results = {}
    sh_results = {}
    prev = {}
    if (ROOT / "SITE_STAGE_BENCH.json").exists():
        prev = json.loads(
            (ROOT / "SITE_STAGE_BENCH.json").read_text()
        ).get("variants_ms", {})
    for name, flags in VARIANTS.items():
        if args.only and args.only != name:
            continue
        fn = functools.partial(
            ablate_call, H=H, W=W, Hpg=Hpg, interpret=False, nreal=N,
            scale=scale, **flags,
        )
        ms = device_bench(
            lambda t3m_, *rest: fn(t3m_, *rest),
            t3m, wy4, f4, shift4, packed, gcol, k, v, qcm,
        )
        results[name] = round(ms, 3)
        print(f"resolve/{name}: {ms:.3f} ms", flush=True)
        fn_sh = functools.partial(
            ablate_call_sh, H=H, W=W, Hpg=Hpg, interpret=False, nreal=N,
            scale=scale, **flags,
        )
        ms = device_bench(
            lambda t3s_, *rest: fn_sh(t3s_, *rest),
            t3s, wy4s, f4s, packeds, gcols, ks, vs, qcm,
        )
        sh_results[name] = round(ms, 3)
        print(f"sh/{name}: {ms:.3f} ms", flush=True)

    if args.only is None or args.only == "production":
        # production kernels for cross-checking
        ms_prod = device_bench(
            lambda t3m_, *rest: fused_site_call(
                t3m_, *rest, H, W, Hpg, False, N, scale
            ),
            t3m, wy4, f4, shift4, packed, gcol, k, v, qcm,
        )
        results["production_fused_site"] = round(ms_prod, 3)
        print(f"resolve/production_fused_site: {ms_prod:.3f} ms", flush=True)
        ms_bias = device_bench(
            lambda t3m_, *rest: lattice_bias_fused(
                t3m_, *rest, H, W, Hpg, False, N
            ),
            t3m, wy4, f4, shift4, packed, gcol,
        )
        results["production_bias_kernel"] = round(ms_bias, 3)
        print(f"production_bias_kernel: {ms_bias:.3f} ms", flush=True)
        ms_sh = device_bench(
            lambda t3s_, *rest: fused_site_call_sh(
                t3s_, *rest, H, W, Hpg, False, N, scale
            ),
            t3s, wy4s, f4s, packeds, gcols, ks, vs, qcm,
        )
        sh_results["production_fused_site_sh"] = round(ms_sh, 3)
        print(f"sh/production_fused_site_sh: {ms_sh:.3f} ms", flush=True)

    if args.only:
        # merge partial results into the artifact and exit (per-variant runs
        # bisect compile hangs in the remote helper)
        merged = {**prev, **results}
        (ROOT / "SITE_STAGE_BENCH.json").write_text(
            json.dumps({"variants_ms": merged, "partial": True}, indent=1)
        )
        print(json.dumps(results), flush=True)
        return

    def attribute(r):
        return {
            "A_extract_ms": r["extract"],
            "B_xmix_resolve_ms": round(r["extract+mix"] - r["extract"], 3),
            "C_ymix_ms": round(
                r["extract+mix+ymix"] - r["extract+mix"], 3
            ),
            "C1_ylerp_only_ms": round(
                r["extract+mix+ymix_nostores"] - r["extract+mix"], 3
            ),
            "C2_flatten_stores_ms": round(
                r["extract+mix+ymix"] - r["extract+mix+ymix_nostores"], 3
            ),
            "D_attn_ms": r["attn_only"],
            "full_ms": r["full"],
        }

    import os

    out = {
        "config": f"g8 flagship: B={B} G={G} Hpg={Hpg} H=W={H} N={N} ch={ch}",
        "production_dispatch": (
            "sh (shift-replicated staging, fused_site_call_sh)"
            if sh_selected else
            "resolve (plain staging, fused_site_call)"
        ),
        "env_knobs": {
            k: os.environ.get(k)
            for k in ("BEVRENDER_SHIFT_REPLICA", "BEVRENDER_SITE_DMA",
                      "BEVRENDER_SITE_SH2", "BEVRENDER_EXTRACT_UNROLL")
        },
        "sh_variants_ms": sh_results,
        "sh_attributed": attribute(sh_results),
        "resolve_variants_ms": results,
        "resolve_attributed": attribute(results),
        # back-compat key some readers use; points at the PRODUCTION path
        "variants_ms": sh_results if sh_selected else results,
        "note": "stage costs from prefix ablations; sh_* rows ablate the "
                "production shift-replicated kernel (what the flagship "
                "model actually runs, per production_dispatch), resolve_* "
                "rows the plain-staging fallback for wide sites; attn_only "
                "runs QK+softmax+AV on a zero bias tile",
    }
    (ROOT / "SITE_STAGE_BENCH.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

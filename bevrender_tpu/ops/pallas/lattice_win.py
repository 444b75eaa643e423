"""Pallas TPU kernel: per-key window extraction for the lattice rpe bias.

The XLA fast path (ops/deform_attn.py::_lattice_bias) extracts, per sampled
key, an (H+1, 3, W, Hpg) window of the column-rearranged rpe table with a
vmapped ``dynamic_slice``. XLA lowers that to an HBM gather whose cost is
~15 ns per contiguous granule — (H+1) granules per key. This kernel keeps the
whole rearranged table resident in VMEM (~2 MB) and copies each key's window
VMEM->VMEM in a serial loop, so the HBM traffic is exactly one sequential
write of the output.

Mosaic constraints shape the layout: the last two block dims are the
(sublane, lane) tile and dynamic starts on the sublane dim must be provably
8-aligned. So the 3-wide m window rides the *leading* (untiled) dim, the
y window is read from an 8-aligned base (``pl.multiple_of``), and the
residual 0..7 shift resolves with an 8-way ``lax.switch`` over static slices.

Start indices arrive via scalar prefetch (SMEM). A custom VJP is wired
(``defvjp`` below): the forward is this extraction kernel and the backward is
a scatter-add kernel accumulating window cotangents into the table gradient,
so the kernel serves both training and inference paths when
``use_pallas=True``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _win_kernel(packed_ref, t3_ref, out_ref, *, h1: int, tn: int, npk: int):
    """packed starts: (BG*Np,) int32 scalar-prefetch, ys*2**16 + ms (SMEM is
    ~1 MB — two separate index arrays overflow it at B*G*N ~ 128k keys);
    t3: (1, m_max, Ypad, WH) VMEM; out: (1, 1, tn, 3, h1, WH) VMEM."""
    bg = pl.program_id(0)
    t = pl.program_id(1)
    base = bg * npk + t * tn
    h1_al = ((h1 + 7 + 7) // 8) * 8  # aligned read covers shift 0..7

    def body(i, carry):
        packed = packed_ref[base + i]
        ys = packed >> 16
        ms = packed & 0xFFFF
        ys_base = pl.multiple_of((ys // 8) * 8, 8)
        blk = t3_ref[0, pl.ds(ms, 3), pl.ds(ys_base, h1_al), :]  # (3, h1_al, WH)
        shift = ys - ys_base
        out_ref[0, 0, i] = jax.lax.switch(
            shift, [lambda b, k=k: b[:, k : k + h1, :] for k in range(8)], blk
        )
        return carry

    jax.lax.fori_loop(0, tn, body, 0)


def _win_bwd_kernel(packed_ref, gwin_ref, dt3_ref, *, h1: int, tn: int,
                    npk: int, G: int):
    """Scatter-add cotangent windows back into the table gradient.

    Grid (G, B, tiles): the dt3 output block is indexed by g only, so Pallas
    keeps it resident in VMEM across all (b, t) steps of the same g and the
    read-modify-write accumulation below is race-free (grid is sequential).
    """
    g = pl.program_id(0)
    b = pl.program_id(1)
    t = pl.program_id(2)
    h1_al = ((h1 + 7 + 7) // 8) * 8

    @pl.when((b == 0) & (t == 0))
    def _():
        dt3_ref[...] = jnp.zeros_like(dt3_ref)

    base = (b * G + g) * npk + t * tn

    def body(i, carry):
        packed = packed_ref[base + i]
        ys = packed >> 16
        ms = packed & 0xFFFF
        ys_base = pl.multiple_of((ys // 8) * 8, 8)
        shift = ys - ys_base
        gw = gwin_ref[0, 0, i].astype(jnp.float32)  # (3, h1, WH)
        upd = jax.lax.switch(
            shift,
            [
                lambda x, k=k: jnp.pad(x, ((0, 0), (k, h1_al - h1 - k), (0, 0)))
                for k in range(8)
            ],
            gw,
        )
        blk = dt3_ref[0, pl.ds(ms, 3), pl.ds(ys_base, h1_al), :]
        dt3_ref[0, pl.ds(ms, 3), pl.ds(ys_base, h1_al), :] = blk + upd
        return carry

    jax.lax.fori_loop(0, tn, body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lattice_windows(
    t3, y_start, m_start, h1: int, interpret: bool = False
):
    """Differentiable wrapper: forward = window-extraction kernel; backward =
    scatter-add kernel for the table cotangent (starts are integers)."""
    return _lattice_windows_fwd_impl(t3, y_start, m_start, h1, interpret)


def _lattice_windows_fwd(t3, y_start, m_start, h1, interpret):
    out = _lattice_windows_fwd_impl(t3, y_start, m_start, h1, interpret)
    return out, (t3, y_start, m_start)


def _lattice_windows_bwd(h1, interpret, res, g_out):
    import numpy as np

    t3, y_start, m_start = res
    G, Y, m_max, WH = t3.shape
    dtype = t3.dtype
    B, _, N = y_start.shape
    TN = 128
    n_pad = (-N) % TN
    if n_pad:
        y_start = jnp.pad(y_start, ((0, 0), (0, 0), (0, n_pad)))
        m_start = jnp.pad(m_start, ((0, 0), (0, 0), (0, n_pad)))
        g_out = jnp.pad(
            g_out, ((0, 0), (0, 0), (0, n_pad), (0, 0), (0, 0), (0, 0))
        )
    Np = N + n_pad
    packed = (
        (y_start.astype(jnp.int32) << 16) | m_start.astype(jnp.int32)
    ).reshape(B * G * Np)
    h1_al = ((h1 + 14) // 8) * 8
    y_pad = (-(Y) % 8) + h1_al
    Ypad = Y + y_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G, B, Np // TN),
        in_specs=[
            pl.BlockSpec(
                (1, 1, TN, 3, h1, WH),
                lambda g, b, t, p_ref: (b, g, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, m_max, Ypad, WH),
            lambda g, b, t, p_ref: (g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    dt3m = pl.pallas_call(
        functools.partial(_win_bwd_kernel, h1=h1, tn=TN, npk=Np, G=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, m_max, Ypad, WH), jnp.float32),
        interpret=interpret,
    )(packed, g_out)
    dt3 = jnp.swapaxes(dt3m[:, :, :Y], 1, 2).astype(dtype)
    zi = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return dt3, zi(y_start[:, :, :N] if n_pad else y_start), zi(
        m_start[:, :, :N] if n_pad else m_start
    )


lattice_windows.defvjp(_lattice_windows_fwd, _lattice_windows_bwd)


@functools.partial(jax.jit, static_argnames=("h1", "interpret"))
def _lattice_windows_fwd_impl(
    t3: jax.Array,  # (G, Y, m_max, WH)
    y_start: jax.Array,  # (B, G, N) int32
    m_start: jax.Array,  # (B, G, N) int32
    h1: int,
    interpret: bool = False,
) -> jax.Array:  # (B, G, N, 3, h1, WH)
    G, Y, m_max, WH = t3.shape
    B, _, N = y_start.shape
    TN = 128
    n_pad = (-N) % TN
    if n_pad:
        y_start = jnp.pad(y_start, ((0, 0), (0, 0), (0, n_pad)))
        m_start = jnp.pad(m_start, ((0, 0), (0, 0), (0, n_pad)))
    Np = N + n_pad
    packed = (
        (y_start.astype(jnp.int32) << 16) | m_start.astype(jnp.int32)
    ).reshape(B * G * Np)

    # (G, m_max, Ypad, WH) with Y padded so aligned reads stay in bounds
    h1_al = ((h1 + 14) // 8) * 8
    y_pad = (-(Y) % 8) + h1_al  # generous: aligned base + window always fits
    t3m = jnp.pad(jnp.swapaxes(t3, 1, 2), ((0, 0), (0, 0), (0, y_pad), (0, 0)))
    Ypad = Y + y_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * G, Np // TN),
        in_specs=[
            pl.BlockSpec(
                (1, m_max, Ypad, WH),
                lambda bg, t, p_ref: (bg % G, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TN, 3, h1, WH),
            lambda bg, t, p_ref: (bg // G, bg % G, t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_win_kernel, h1=h1, tn=TN, npk=Np),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, G, Np, 3, h1, WH), t3.dtype),
        interpret=interpret,
    )(packed, t3m)
    if n_pad:
        out = out[:, :, :N]
    return out

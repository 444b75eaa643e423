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


def _bilinear_table_lookup(
    table: jax.Array,  # (G, Hpg, Ht, Wt)
    disp: jax.Array,  # (B, G, m, N, 2) (y, x) in [-1, 1]
) -> jax.Array:  # (B, G, Hpg, m, N)
    G, Hpg, Ht, Wt = table.shape
    flat = table.reshape(G, Hpg, Ht * Wt)

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
        idx = yi * Wt + xi  # (B, G, m, N)

        def per_group(tbl_g, idx_g):  # (Hpg, T), (B, m, N)
            return jnp.take(tbl_g, idx_g, axis=1)  # (Hpg, B, m, N)

        vals = jax.vmap(per_group, in_axes=(0, 1), out_axes=0)(flat, idx)
        # vals: (G, Hpg, B, m, N) -> (B, G, Hpg, m, N)
        vals = jnp.transpose(vals, (2, 0, 1, 3, 4))
        return vals * jnp.where(inb, w, 0.0)[:, :, None]

    return (
        corner(y0, x0, (1 - wy1) * (1 - wx1))
        + corner(y0, x0 + 1.0, (1 - wy1) * wx1)
        + corner(y0 + 1.0, x0, wy1 * (1 - wx1))
        + corner(y0 + 1.0, x0 + 1.0, wy1 * wx1)
    )


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
) -> jax.Array:
    """Attention over sampled keys with continuous relative-position bias.

    Returns (B, G, Hpg, M, ch). See module docstring for shapes.
    """
    B, G, Hpg, M, ch = q.shape
    N = k.shape[3]
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

    @functools.partial(jax.checkpoint, policy=jax.checkpoint_policies.nothing_saveable)
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

    out = jax.lax.map(lambda args: one_chunk(*args), (q_chunks, qpos_chunks, keys))
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

"""Bilinear grid sampling with PyTorch ``F.grid_sample`` semantics.

The reference delegates four hot paths to ``torch.nn.functional.grid_sample``
(``mode="bilinear", align_corners=True``, default ``padding_mode="zeros"``):
SCA K/V gather (SCA_deform_attn.py:290-301), SCA rpe-bias sampling
(SCA_deform_attn.py:379-389), TSA K/V gather (TSA_deform_attn.py:210-217) and
TSA rpe-bias sampling (TSA_deform_attn.py:292-302). This module provides the
pure-XLA implementation (gather + lerp) used for the K/V gathers; the rpe-bias
sampling call sites do not go through this module on the hot path — they use
the lattice-exact block-sliced formulation in ``bevrender_tpu.ops.deform_attn``
(with a Pallas window kernel in ``bevrender_tpu.ops.pallas`` on TPU).

Layout is NHWC (TPU-native): channels ride the 128-wide lane dimension so the
four corner gathers are contiguous row gathers. Gradients flow to both the
input image and the sampling grid (the deformable-attention offsets are trained
through the sampling coordinates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    """Map [-1, 1] to pixel coordinates (PyTorch convention)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample_2d(
    image: jax.Array,
    grid: jax.Array,
    *,
    align_corners: bool = True,
) -> jax.Array:
    """Bilinear sample ``image`` at ``grid`` locations.

    Args:
      image: (B, H, W, C) feature map.
      grid: (B, ..., 2) sampling locations in [-1, 1], last dim ordered
        ``(x, y)`` exactly like ``torch.nn.functional.grid_sample``.
      align_corners: PyTorch ``align_corners`` flag (reference always True).

    Returns:
      (B, ..., C) sampled features. Out-of-bounds corners contribute zero
      (PyTorch ``padding_mode="zeros"``).
    """
    B, H, W, C = image.shape
    batch_shape = grid.shape[:-1]
    n = 1
    for s in batch_shape[1:]:
        n *= s
    gx = grid[..., 0].reshape(B, n)
    gy = grid[..., 1].reshape(B, n)

    ix = _unnormalize(gx, W, align_corners)
    iy = _unnormalize(gy, H, align_corners)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1.0
    iy1 = iy0 + 1.0

    wx1 = ix - ix0
    wx0 = 1.0 - wx1
    wy1 = iy - iy0
    wy0 = 1.0 - wy1

    # Row-gather layout: (B*H*W, C) rows with C on the contiguous minor axis —
    # XLA lowers this to vector loads; gathering scalars (or strided columns)
    # on TPU serializes and is orders of magnitude slower.
    flat = image.reshape(B * H * W, C)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]

    def corner(iy_c, ix_c, w):
        in_bounds = (
            (ix_c >= 0.0) & (ix_c <= W - 1.0) & (iy_c >= 0.0) & (iy_c <= H - 1.0)
        )
        xi = jnp.clip(ix_c, 0.0, W - 1.0).astype(jnp.int32)
        yi = jnp.clip(iy_c, 0.0, H - 1.0).astype(jnp.int32)
        idx = base + yi * W + xi  # (B, n) global row ids
        vals = jnp.take(flat, idx, axis=0)  # (B, n, C) contiguous rows
        w = jnp.where(in_bounds, w, 0.0)
        return vals * w[:, :, None]

    out = (
        corner(iy0, ix0, wy0 * wx0)
        + corner(iy0, ix1, wy0 * wx1)
        + corner(iy1, ix0, wy1 * wx0)
        + corner(iy1, ix1, wy1 * wx1)
    )
    return out.reshape(*batch_shape, C)


def grid_sample_2d_mm(
    image: jax.Array,
    grid: jax.Array,
    *,
    align_corners: bool = True,
) -> jax.Array:
    """Bilinear sampling as two dense contractions (TPU fast path).

    Identical math and padding semantics to :func:`grid_sample_2d`, but built
    from matmuls instead of gathers: the bilinear kernel is the hat function
    ``max(0, 1 - |p - i|)``, which is exactly zero for out-of-bounds pixels,
    so ``out[n] = Wx[n] . (Wy[n] @ image)`` with sparse-in-effect dense weight
    matrices. TPUs have no hardware gather — the MXU happily eats the extra
    FLOPs, and this is typically >10x faster than the gather form for the
    deformable-attention K/V sizes.
    """
    B, H, W, C = image.shape
    batch_shape = grid.shape[:-1]
    n = 1
    for s in batch_shape[1:]:
        n *= s
    gx = grid[..., 0].reshape(B, n)
    gy = grid[..., 1].reshape(B, n)
    ix = _unnormalize(gx, W, align_corners)
    iy = _unnormalize(gy, H, align_corners)

    ys = jnp.arange(H, dtype=image.dtype)
    xs = jnp.arange(W, dtype=image.dtype)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy[:, :, None] - ys))  # (B, n, H)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(ix[:, :, None] - xs))  # (B, n, W)

    rows = jnp.einsum(
        "bnh,bhwc->bnwc", wy, image, preferred_element_type=jnp.float32
    )
    out = jnp.einsum(
        "bnw,bnwc->bnc", wx, rows, preferred_element_type=jnp.float32
    )
    return out.reshape(*batch_shape, C)


def grid_sample_nchw(
    image: jax.Array,
    grid: jax.Array,
    *,
    align_corners: bool = True,
) -> jax.Array:
    """Drop-in signature parity with ``torch.nn.functional.grid_sample``.

    Args:
      image: (B, C, H, W).
      grid: (B, Hg, Wg, 2) in (x, y) order.

    Returns:
      (B, C, Hg, Wg), matching torch's output layout.
    """
    out = grid_sample_2d(
        jnp.transpose(image, (0, 2, 3, 1)), grid, align_corners=align_corners
    )
    return jnp.transpose(out, (0, 3, 1, 2))


def normalized_grid(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """The reference's ``_get_normalized_grid`` (TSA_deform_attn.py:98-109):
    pixel-center grid normalized to [-1, 1], returned as (h, w, 2) in
    ``(y, x)`` order."""
    ys = jnp.arange(h, dtype=dtype)
    xs = jnp.arange(w, dtype=dtype)
    ys = ys / (h - 1.0) * 2.0 - 1.0 if h > 1 else jnp.zeros_like(ys)
    xs = xs / (w - 1.0) * 2.0 - 1.0 if w > 1 else jnp.zeros_like(xs)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gy, gx], axis=-1)

"""Ego-motion alignment of history BEV features.

The reference aligns the previous BEV map to the current frame with two chained
``torchvision.transforms.functional.affine`` calls applied in a Python loop
over the batch (model/encoder.py:413-466): first rotate by ``prev_rot`` with a
post-rotation pixel translation ``(dx, dy)``, then rotate by ``-curr_rot``.
This module is the TPU-native equivalent: the torchvision inverse-affine
matrices are built for the whole batch at once and the warp is a single batched
bilinear ``grid_sample`` per step — no host loop, no per-sample kernels.

torchvision semantics replicated here (``torchvision/transforms/functional.py``
``_get_inverse_affine_matrix``, scale=1, shear=0, center=image center):
for every output pixel ``p``, the source pixel is

    p_src = R(theta) @ (p - c - t) + c

with ``R(theta) = [[cos, sin], [-sin, cos]]`` (the inverse of a CCW rotation
by ``theta``), ``c`` the image center ``((W-1)/2, (H-1)/2)`` and ``t`` the
translation in pixels. Sampling is bilinear with zero fill.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bevrender_tpu.ops.grid_sample import grid_sample_2d_mm


def _inverse_affine_grid(
    angle_rad: jax.Array,
    translate: jax.Array,
    h: int,
    w: int,
) -> jax.Array:
    """Build normalized sampling grids for a batch of inverse affines.

    Args:
      angle_rad: (B,) rotation angles (radians, CCW positive — torchvision's
        ``angle`` argument converted to radians).
      translate: (B, 2) pixel translations (tx, ty).

    Returns:
      (B, h, w, 2) grid in [-1, 1] (x, y) order for ``grid_sample_2d``.
    """
    B = angle_rad.shape[0]
    cx = (w - 1) / 2.0
    cy = (h - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (h, w)

    cos = jnp.cos(angle_rad)[:, None, None]
    sin = jnp.sin(angle_rad)[:, None, None]
    tx = translate[:, 0][:, None, None]
    ty = translate[:, 1][:, None, None]

    px = gx[None] - cx - tx
    py = gy[None] - cy - ty
    sx = cos * px + sin * py + cx
    sy = -sin * px + cos * py + cy

    # pixel -> normalized [-1, 1] (align_corners=True convention)
    nx = sx / (w - 1) * 2.0 - 1.0 if w > 1 else jnp.zeros_like(sx)
    ny = sy / (h - 1) * 2.0 - 1.0 if h > 1 else jnp.zeros_like(sy)
    return jnp.stack([nx, ny], axis=-1)


def affine_warp(
    bev: jax.Array,
    angle_rad: jax.Array,
    translate: jax.Array,
) -> jax.Array:
    """Batched equivalent of ``torchvision.transforms.functional.affine``
    (bilinear, fill=0, scale=1, shear=0).

    Args:
      bev: (B, H, W, C) feature maps.
      angle_rad: (B,) rotation (radians, CCW positive like torchvision's
        degree argument).
      translate: (B, 2) post-rotation pixel translation (tx, ty).
    """
    _, H, W, _ = bev.shape
    grid = _inverse_affine_grid(angle_rad, translate, H, W)
    return grid_sample_2d_mm(bev, grid, align_corners=True)


def project_history_bev(
    bev: jax.Array,
    vehicle_pose: jax.Array,
) -> jax.Array:
    """Align the previous BEV map to the current vehicle frame.

    Mirrors ``EncoderLayer.project_history_bev_feat`` (model/encoder.py:413-466)
    as one batched double warp:
      1. rotate by ``prev_rot`` with translation ``(dx, dy) = pose[0] - pose[1]``
      2. rotate by ``-curr_rot`` (no translation)

    Two sequential bilinear warps are kept (rather than composing into one
    affine) for numerical parity with the reference's double interpolation.

    Args:
      bev: (B, H, W, C) previous BEV features.
      vehicle_pose: (B, 2, 3) rows ``(x_pixel, y_pixel, heading_rad)`` for
        (previous, current) frames.
    """
    prev_rot = vehicle_pose[:, 0, 2]
    curr_rot = vehicle_pose[:, 1, 2]
    delta = vehicle_pose[:, 0, :2] - vehicle_pose[:, 1, :2]
    out = affine_warp(bev, prev_rot, delta)
    out = affine_warp(out, -curr_rot, jnp.zeros_like(delta))
    return out

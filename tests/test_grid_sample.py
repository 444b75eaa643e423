"""Golden tests: JAX grid_sample vs torch.nn.functional.grid_sample (CPU)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax
import jax.numpy as jnp

from bevrender_tpu.ops.grid_sample import (
    grid_sample_2d,
    grid_sample_nchw,
    normalized_grid,
)


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "img_shape,grid_shape",
    [
        ((2, 5, 7, 3), (2, 4, 6, 2)),
        ((1, 16, 16, 8), (1, 10, 10, 2)),
        ((3, 9, 9, 1), (3, 2, 50, 2)),
    ],
)
def test_matches_torch(img_shape, grid_shape, align_corners):
    img = _rand(img_shape, 1)
    # grid partly out of bounds to exercise zero padding
    grid = (_rand(grid_shape, 2) * 1.2).clip(-1.6, 1.6)

    ours = grid_sample_2d(jnp.asarray(img), jnp.asarray(grid), align_corners=align_corners)

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_out = TF.grid_sample(
        t_img,
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=align_corners,
    )
    ref = t_out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_nchw_wrapper_matches_torch():
    img = _rand((2, 4, 6, 5), 3)  # NCHW here
    grid = (_rand((2, 3, 3, 2), 4) * 1.1).clip(-1.5, 1.5)
    ours = grid_sample_nchw(jnp.asarray(img), jnp.asarray(grid))
    ref = TF.grid_sample(
        torch.from_numpy(img),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_grad_flows_to_grid_and_matches_torch():
    """Offsets are trained through sampling coords; check VJP parity."""
    img = _rand((1, 6, 6, 2), 5)
    grid = (_rand((1, 4, 4, 2), 6) * 0.9).astype(np.float32)

    def loss_jax(g):
        return jnp.sum(grid_sample_2d(jnp.asarray(img), g) ** 2)

    g_jax = jax.grad(loss_jax)(jnp.asarray(grid))

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_grid = torch.from_numpy(grid).requires_grad_(True)
    out = TF.grid_sample(t_img, t_grid, mode="bilinear", align_corners=True)
    (out**2).sum().backward()
    np.testing.assert_allclose(
        np.asarray(g_jax), t_grid.grad.numpy(), rtol=1e-4, atol=1e-4
    )


def test_grad_flows_to_image():
    img = _rand((1, 5, 5, 3), 7)
    grid = (_rand((1, 3, 3, 2), 8) * 0.8).astype(np.float32)

    def loss_jax(im):
        return jnp.sum(grid_sample_2d(im, jnp.asarray(grid)) ** 2)

    g_jax = jax.grad(loss_jax)(jnp.asarray(img))

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2).requires_grad_(True)
    out = TF.grid_sample(t_img, torch.from_numpy(grid), mode="bilinear", align_corners=True)
    (out**2).sum().backward()
    ref = t_img.grad.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(g_jax), ref, rtol=1e-4, atol=1e-4)


def test_normalized_grid_matches_reference_semantics():
    """Mirror of TSA_deform_attn.py:98-109 (arange / (n-1) * 2 - 1)."""
    g = np.asarray(normalized_grid(4, 6))
    assert g.shape == (4, 6, 2)
    np.testing.assert_allclose(g[0, 0], [-1.0, -1.0], atol=1e-7)
    np.testing.assert_allclose(g[-1, -1], [1.0, 1.0], atol=1e-7)
    np.testing.assert_allclose(g[1, 0, 0], -1.0 + 2.0 / 3.0, atol=1e-6)


def test_mm_sampler_matches_gather_and_torch():
    """grid_sample_2d_mm (matmul form) == grid_sample_2d == torch."""
    from bevrender_tpu.ops.grid_sample import grid_sample_2d_mm

    img = _rand((2, 7, 9, 5), 21)
    grid = (_rand((2, 4, 11, 2), 22) * 1.3).clip(-1.8, 1.8)
    mm = grid_sample_2d_mm(jnp.asarray(img), jnp.asarray(grid))
    gather = grid_sample_2d(jnp.asarray(img), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(mm), np.asarray(gather), rtol=1e-5, atol=1e-5)
    ref = TF.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(mm), ref, rtol=1e-5, atol=1e-5)


def test_mm_sampler_grad_matches_gather(): 
    from bevrender_tpu.ops.grid_sample import grid_sample_2d_mm

    img = jnp.asarray(_rand((1, 6, 6, 3), 23))
    grid = jnp.asarray((_rand((1, 5, 5, 2), 24) * 0.9))
    g1 = jax.grad(lambda g: jnp.sum(grid_sample_2d_mm(img, g) ** 2))(grid)
    g2 = jax.grad(lambda g: jnp.sum(grid_sample_2d(img, g) ** 2))(grid)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)

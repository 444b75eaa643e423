"""Fold-views default parity (r5): for G >= 4 stages SCA batches all views
into ONE site call (B*V fold — measured faster with the g-major staged
table, FOLD_VIEWS_AB.json); the result must equal the per-view loop
(reference semantics, SCA_deform_attn.py:290-321) exactly."""

import os

import jax
import jax.numpy as jnp
import pytest

from bevrender_tpu.models.attention import SCADeformableAttention


def test_fold_default_matches_view_loop():
    H, C, V, D, G = 8, 32, 3, 2, 4  # G=4 -> fold is the default
    H2 = H // 2
    refs = jnp.stack(
        jnp.meshgrid(
            jnp.linspace(-0.8, 0.8, H2),
            jnp.linspace(-0.8, 0.8, H * D),
            indexing="ij",
        ),
        -1,
    )[..., ::-1]
    refs = jnp.broadcast_to(refs[None], (V, H2, H * D, 2)).astype(jnp.float32)
    mod = SCADeformableAttention(
        dim=C, n_heads=4, n_groups=G, bev_depth_dim=D, n_views=V,
        use_pallas=False, chunk=64,
    )
    q = jax.random.normal(jax.random.PRNGKey(0), (2, H, H, C))
    feat = jax.random.normal(jax.random.PRNGKey(1), (2, V, 8, 8, C))
    variables = mod.init(jax.random.PRNGKey(2), q, feat, refs)
    y_fold = mod.apply(variables, q, feat, refs)  # default at G=4: fold

    old = os.environ.get("BEVRENDER_FOLD_VIEWS")
    os.environ["BEVRENDER_FOLD_VIEWS"] = "0"
    try:
        jax.clear_caches()  # trace-time knob
        y_loop = mod.apply(variables, q, feat, refs)
    finally:
        if old is None:
            del os.environ["BEVRENDER_FOLD_VIEWS"]
        else:
            os.environ["BEVRENDER_FOLD_VIEWS"] = old
    assert float(jnp.max(jnp.abs(y_fold - y_loop))) < 2e-5

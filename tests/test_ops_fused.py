"""Golden tests for the fused Pallas lattice-bias kernel (interpret mode).

The fused kernel (ops/pallas/lattice_bias.py) must reproduce the XLA lattice
path (ops/deform_attn.py::_lattice_bias) bit-for-bit in f32 — both implement
the same exact decomposition of the reference's rpe grid_sample
(SCA_deform_attn.py:365-389) — and its custom VJP must match XLA autodiff
through the fallback for the table and the key positions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevrender_tpu.ops.deform_attn import (
    _lattice_bias_nm,
    dense_deform_attention_reference,
    fused_site_attention,
    lattice_shift_class,
    streamed_deform_attention,
)

# compile-heavy on the 1-core host: excluded from the <5-min fast tier
# (run 'pytest -m "not slow"' for the quick core-parity loop; see README)
pytestmark = pytest.mark.slow


def _setup(B=2, G=2, Hpg=2, H=8, W=8, d=2, seed=0):
    N = (H // 2) * W * d
    Ht, Wt = 2 * H - 1, 2 * W * d - 1
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    table = jax.random.normal(k1, (G, Hpg, Ht, Wt), jnp.float32) * 0.1
    k_pos = jax.random.uniform(k2, (B, G, N, 2), minval=-0.98, maxval=0.98)
    return table, k_pos, H, W, N


@pytest.fixture(params=["shifted", "resolve"])
def lattice_variant(request, monkeypatch):
    """Run a test under both lattice-kernel stagings: the shift-replicated
    layout (deform_attn.use_shift_replica, the default at model shapes) and
    the resolve layout (the wide-site fallback and the DMA variants' base).
    The env knob is read at trace time by the dispatch."""
    monkeypatch.setenv(
        "BEVRENDER_SHIFT_REPLICA",
        "1" if request.param == "shifted" else "0",
    )
    return request.param


class TestFusedLatticeBias:
    def test_forward_matches_xla(self, lattice_variant):
        table, k_pos, H, W, N = _setup()
        ref, n_ref = _lattice_bias_nm(
            table, k_pos, H, W, compute_dtype=jnp.float32, use_kernel=False
        )
        got, n_got = _lattice_bias_nm(
            table, k_pos, H, W, compute_dtype=jnp.float32,
            use_kernel=True, interpret=True,
        )
        assert n_ref == n_got == N
        np.testing.assert_allclose(
            np.asarray(got[:, :, :, :N]), np.asarray(ref), rtol=0, atol=1e-5
        )

    def test_forward_nonsquare_window(self, lattice_variant):
        # H=W=4, d=3: small lattice, odd table width
        table, k_pos, H, W, N = _setup(B=1, G=1, Hpg=2, H=4, W=4, d=3, seed=3)
        ref, _ = _lattice_bias_nm(
            table, k_pos, H, W, compute_dtype=jnp.float32, use_kernel=False
        )
        got, _ = _lattice_bias_nm(
            table, k_pos, H, W, compute_dtype=jnp.float32,
            use_kernel=True, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got[:, :, :, :N]), np.asarray(ref), rtol=0, atol=1e-5
        )

    def test_grads_match_xla(self, lattice_variant):
        table, k_pos, H, W, N = _setup(B=1, G=2, Hpg=2, H=8, W=8, d=2, seed=1)

        def loss(fn_kwargs):
            def inner(table, k_pos):
                bias, _ = _lattice_bias_nm(
                    table, k_pos, H, W, compute_dtype=jnp.float32, **fn_kwargs
                )
                bias = bias[:, :, :, :N]
                # weighted sum exercises all cotangent positions
                w = jnp.arange(bias.size, dtype=jnp.float32).reshape(
                    bias.shape
                ) / bias.size
                return jnp.sum(bias * w)
            return inner

        g_ref = jax.grad(loss(dict(use_kernel=False)), argnums=(0, 1))(
            table, k_pos
        )
        g_got = jax.grad(
            loss(dict(use_kernel=True, interpret=True)), argnums=(0, 1)
        )(table, k_pos)
        np.testing.assert_allclose(
            np.asarray(g_got[0]), np.asarray(g_ref[0]), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(g_got[1]), np.asarray(g_ref[1]), rtol=1e-4, atol=1e-5
        )

    def test_padding_and_masking_in_site(self, lattice_variant):
        # N=12 pads to Np=64 inside the kernel path; the full site must mask
        # the 52 fake keys so outputs match the XLA path exactly.
        B, G, Hpg, H, W, d = 1, 1, 2, 6, 4, 1
        N = (H // 2) * W * d
        ch = 4
        key = jax.random.PRNGKey(7)
        ks = jax.random.split(key, 6)
        table = jax.random.normal(ks[0], (G, Hpg, 2 * H - 1, 2 * W * d - 1)) * 0.1
        k_pos = jax.random.uniform(ks[1], (B, G, N, 2), minval=-0.9, maxval=0.9)
        q = jax.random.normal(ks[2], (B, G, Hpg, H * W, ch))
        k = jax.random.normal(ks[3], (B, G, Hpg, N, ch))
        v = jax.random.normal(ks[4], (B, G, Hpg, N, ch))
        q_pos = jnp.stack(
            jnp.meshgrid(
                jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W), indexing="ij"
            ),
            axis=-1,
        ).reshape(H * W, 2)

        out_ref = streamed_deform_attention(
            q, k, v, q_pos, k_pos, table, scale=0.5,
            lattice_hw=(H, W), lattice_kernel=False,
        )
        # emulate the kernel path on CPU: patch backend gate by calling the
        # nm-bias with interpret and reusing the site math via monkeypatching
        import bevrender_tpu.ops.deform_attn as da

        orig = da._lattice_bias_nm
        try:
            da._lattice_bias_nm = lambda t, kp, h, w, compute_dtype=jnp.bfloat16, use_kernel=False, interpret=False: orig(
                t, kp, h, w, compute_dtype=jnp.float32,
                use_kernel=True, interpret=True,
            )
            out_got = streamed_deform_attention(
                q, k, v, q_pos, k_pos, table, scale=0.5,
                lattice_hw=(H, W), lattice_kernel=True,
            )
        finally:
            da._lattice_bias_nm = orig
        np.testing.assert_allclose(
            np.asarray(out_got), np.asarray(out_ref), rtol=2e-2, atol=2e-2
        )

    def test_fused_site_forward_matches_dense_reference(self, lattice_variant):
        # full fusion (bias + scores + online softmax + AV in one kernel)
        # vs the all-f32 dense reference; the kernel's table staging is bf16
        # (production compute dtype), hence the loose tolerance
        for B, G, Hpg, H, W, d, ch, seed in (
            (2, 2, 2, 8, 8, 2, 4, 0),
            (1, 1, 2, 6, 4, 1, 8, 7),   # N=12 -> Np=64: 52 pad keys masked
            (1, 2, 1, 4, 4, 3, 16, 3),  # wide table, more channels
        ):
            table, k_pos, H, W, N = _setup(B=B, G=G, Hpg=Hpg, H=H, W=W, d=d,
                                           seed=seed)
            key = jax.random.PRNGKey(seed + 100)
            ks = jax.random.split(key, 3)
            q = jax.random.normal(ks[0], (B, G, Hpg, H * W, ch))
            k = jax.random.normal(ks[1], (B, G, Hpg, N, ch))
            v = jax.random.normal(ks[2], (B, G, Hpg, N, ch))
            q_pos = jnp.stack(
                jnp.meshgrid(
                    jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W),
                    indexing="ij",
                ),
                axis=-1,
            ).reshape(H * W, 2)
            scale = ch ** -0.5
            out_ref = dense_deform_attention_reference(
                q, k, v, q_pos, k_pos, table, scale=scale
            )
            out_got = fused_site_attention(
                q, k, v, k_pos, table, H, W, scale, True
            )
            assert out_got.shape == out_ref.shape
            np.testing.assert_allclose(
                np.asarray(out_got), np.asarray(out_ref),
                rtol=2e-2, atol=2e-2,
            )

    def test_fused_site_grads_match_xla_path(self, lattice_variant):
        # the custom VJP recomputes through the XLA consumer; gradients must
        # match the non-fused streamed path exactly (same backward program)
        table, k_pos, H, W, N = _setup(B=1, G=2, Hpg=2, H=8, W=8, d=2, seed=2)
        ch = 4
        key = jax.random.PRNGKey(11)
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (1, 2, 2, H * W, ch))
        k = jax.random.normal(ks[1], (1, 2, 2, N, ch))
        v = jax.random.normal(ks[2], (1, 2, 2, N, ch))
        q_pos = jnp.stack(
            jnp.meshgrid(
                jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W), indexing="ij"
            ),
            axis=-1,
        ).reshape(H * W, 2)
        scale = ch ** -0.5

        def loss_fused(q, k, v, k_pos, table):
            out = fused_site_attention(q, k, v, k_pos, table, H, W, scale, True)
            w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
            return jnp.sum(out * w / out.size)

        def loss_ref(q, k, v, k_pos, table):
            out = streamed_deform_attention(
                q, k, v, q_pos, k_pos, table, scale=scale,
                lattice_hw=(H, W), lattice_kernel=False,
            )
            w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
            return jnp.sum(out * w / out.size)

        g_got = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
            q, k, v, k_pos, table
        )
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
            q, k, v, k_pos, table
        )
        for a, b in zip(g_got, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_shift_class_range(self):
        table, k_pos, H, W, N = _setup()
        s = lattice_shift_class(table.shape, k_pos, H, W)
        assert s.shape == k_pos.shape[:-1]
        sv = np.asarray(s)
        assert sv.min() >= 0 and sv.max() < 8

    def test_sorted_keys_same_site_output(self, lattice_variant):
        # sorting keys by shift class must not change the attention output
        table, k_pos, H, W, N = _setup(B=1, G=1, Hpg=2, H=8, W=8, d=2, seed=5)
        ch = 4
        key = jax.random.PRNGKey(9)
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (1, 1, 2, H * W, ch))
        kv_seed = jax.random.normal(ks[1], (1, 1, N, 8))

        def site(kp):
            # derive k, v deterministically from positions so permuting
            # positions permutes k/v consistently (like the real KV gather)
            feat = jnp.concatenate([kp, kp * 2.0, kp * 3.0, kp * 4.0], -1)
            k = jnp.repeat(feat[:, :, None], 2, axis=2)[..., :ch]
            v = jnp.repeat((feat * 0.5)[:, :, None], 2, axis=2)[..., :ch]
            q_pos = jnp.stack(
                jnp.meshgrid(
                    jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W),
                    indexing="ij",
                ),
                axis=-1,
            ).reshape(H * W, 2)
            return streamed_deform_attention(
                q, k, v, q_pos, kp, table, scale=0.5,
                lattice_hw=(H, W), lattice_kernel=False,
            )

        out_unsorted = site(k_pos)
        cls = lattice_shift_class(table.shape, k_pos, H, W)
        order = jnp.argsort(cls, axis=-1, stable=True)
        kp_sorted = jnp.take_along_axis(k_pos, order[..., None], axis=2)
        out_sorted = site(kp_sorted)
        np.testing.assert_allclose(
            np.asarray(out_sorted), np.asarray(out_unsorted),
            rtol=1e-4, atol=1e-5,
        )

    def test_dma_prefetch_variant_matches_inline_kernel(self):
        """The DMA-prefetched extraction kernel (fused_site_call_dma) is
        bit-identical to the inline-extract production kernel across
        multi-tile, row-wrap and key-padding cases (interpret mode)."""
        from bevrender_tpu.ops.deform_attn import _kernel_inputs
        from bevrender_tpu.ops.pallas.experimental import fused_site_call_dma
        from bevrender_tpu.ops.pallas.fused_attn import fused_site_call

        rng = np.random.default_rng(5)
        for B, G, Hpg, H, W, N, ch in (
            (1, 2, 2, 8, 8, 100, 4),   # NT=2, padded keys
            (2, 3, 1, 8, 8, 200, 8),   # B*G*NT crosses 8-row packed blocks
        ):
            table = jnp.asarray(
                rng.standard_normal((G, Hpg, 2 * H - 1, 2 * W * 4 - 1)),
                jnp.float32,
            )
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
            args = (t3m, wy4, f4, shift4, packed, gcol, k, v, qcm)
            ref = fused_site_call(*args, H, W, Hpg, True, N, ch ** -0.5)
            got = fused_site_call_dma(*args, H, W, Hpg, True, N, ch ** -0.5)
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_sh2_rowfold_variant_matches_sh(self):
        """The row-folded sh2 site kernel (BEVRENDER_SITE_SH2=1, measured
        net-neutral A/B) must bit-match the per-head sh kernel."""
        from bevrender_tpu.ops.deform_attn import _kernel_inputs_sh
        from bevrender_tpu.ops.pallas.experimental import fused_site_call_sh2
        from bevrender_tpu.ops.pallas.fused_attn import fused_site_call_sh

        table, k_pos, H, W, N = _setup(seed=11)
        G, Hpg = table.shape[0], table.shape[1]
        B = k_pos.shape[0]
        ch = 4
        key = jax.random.PRNGKey(12)
        t3s, wy4, f4, packed, gcol, Np = _kernel_inputs_sh(table, k_pos, H, W)
        t3s2, wy42, f42, packed2, gcol2, _ = _kernel_inputs_sh(
            table, k_pos, H, W, lane_block=64
        )
        ks = jax.random.split(key, 3)
        k = jax.random.normal(ks[0], (B, G, Hpg, Np, ch), jnp.bfloat16)
        v = jax.random.normal(ks[1], (B, G, Hpg, Np, ch), jnp.bfloat16)
        qcm = jax.random.normal(ks[2], (B, G, Hpg, ch, H * W), jnp.bfloat16)
        a = fused_site_call_sh(
            t3s, wy4, f4, packed, gcol, k, v, qcm, H, W, Hpg, True, N, 0.5
        )
        b = fused_site_call_sh2(
            t3s2, wy42, f42, packed2, gcol2, k, v, qcm, H, W, Hpg, True, N,
            0.5,
        )
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )

    def test_sh_gmajor_grid_order_matches(self, monkeypatch):
        """BEVRENDER_SH_GMAJOR=1 (g-major grid: the staged-table block stays
        resident for B consecutive cells) must bit-match the default b-major
        order — only the iteration order changes, never the math."""
        from bevrender_tpu.ops.deform_attn import _kernel_inputs_sh
        from bevrender_tpu.ops.pallas import fused_attn

        table, k_pos, H, W, N = _setup(seed=13)
        G, Hpg = table.shape[0], table.shape[1]
        B = k_pos.shape[0]
        ch = 4
        t3s, wy4, f4, packed, gcol, Np = _kernel_inputs_sh(table, k_pos, H, W)
        ks = jax.random.split(jax.random.PRNGKey(14), 3)
        k = jax.random.normal(ks[0], (B, G, Hpg, Np, ch), jnp.bfloat16)
        v = jax.random.normal(ks[1], (B, G, Hpg, Np, ch), jnp.bfloat16)
        qcm = jax.random.normal(ks[2], (B, G, Hpg, ch, H * W), jnp.bfloat16)
        args = (t3s, wy4, f4, packed, gcol, k, v, qcm, H, W, Hpg, True, N, 0.5)
        monkeypatch.setenv("BEVRENDER_SH_GMAJOR", "0")
        ref = fused_attn.fused_site_call_sh(*args)
        monkeypatch.setenv("BEVRENDER_SH_GMAJOR", "1")
        got = fused_attn.fused_site_call_sh(*args)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_v2_headfold_variant_matches_inline_kernel(self):
        """The head-folded 128-pad layout kernel (fused_site_call_v2) matches
        the inline-extract production kernel (interpret mode; the folded
        single-matmul QK/AV may round one bf16 ulp differently)."""
        from bevrender_tpu.ops.deform_attn import _kernel_inputs
        from bevrender_tpu.ops.pallas.experimental import fused_site_call_v2
        from bevrender_tpu.ops.pallas.fused_attn import fused_site_call

        rng = np.random.default_rng(7)
        for B, G, Hpg, H, W, N, ch in (
            (1, 2, 2, 8, 8, 100, 4),
            (1, 1, 2, 6, 4, 90, 16),
        ):
            table = jnp.asarray(
                rng.standard_normal((G, Hpg, 2 * H - 1, 2 * W * 4 - 1)),
                jnp.float32,
            )
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
            args = (t3m, wy4, f4, shift4, packed, gcol, k, v, qcm)
            ref = fused_site_call(*args, H, W, Hpg, True, N, ch ** -0.5)
            got = fused_site_call_v2(*args, H, W, Hpg, True, N, ch ** -0.5)
            np.testing.assert_allclose(
                np.asarray(ref), np.asarray(got), rtol=1e-5, atol=1e-6
            )

    def test_v2_wide_site_falls_back_and_matches(self):
        """Sites whose folded lane count Hpg*W exceeds 128 (pyramid stages)
        take fused_site_call_v2's fallback to the per-head DMA kernel and
        still match the inline kernel."""
        from bevrender_tpu.ops.deform_attn import _kernel_inputs
        from bevrender_tpu.ops.pallas.experimental import fused_site_call_v2
        from bevrender_tpu.ops.pallas.fused_attn import fused_site_call

        rng = np.random.default_rng(9)
        B, G, Hpg, H, W, N, ch = 1, 1, 4, 8, 40, 80, 4  # WH = 160 > 128
        table = jnp.asarray(
            rng.standard_normal((G, Hpg, 2 * H - 1, 2 * W * 4 - 1)),
            jnp.float32,
        )
        k_pos = jnp.asarray(
            rng.uniform(-0.95, 0.95, (B, G, N, 2)), jnp.float32
        )
        t3m, wy4, f4, shift4, packed, gcol, Np = _kernel_inputs(
            table, k_pos, H, W
        )
        k = jnp.asarray(rng.standard_normal((B, G, Hpg, Np, ch)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, G, Hpg, Np, ch)), jnp.bfloat16)
        qcm = jnp.asarray(
            rng.standard_normal((B, G, Hpg, ch, H * W)), jnp.bfloat16
        )
        args = (t3m, wy4, f4, shift4, packed, gcol, k, v, qcm)
        ref = fused_site_call(*args, H, W, Hpg, True, N, ch ** -0.5)
        got = fused_site_call_v2(*args, H, W, Hpg, True, N, ch ** -0.5)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_v2_lse_variant_matches_lse_kernel(self):
        """The head-folded training forward (fused_site_call_v2 with_lse)
        returns the same output AND logsumexp residual as the per-head
        fused_site_call_lse — so BEVRENDER_SITE_DMA=2 composes with the fused
        flash backward (which recomputes per-head from the lse). Also covers
        the wide-site (Hpg*W > 128) fallback path."""
        from bevrender_tpu.ops.deform_attn import _kernel_inputs
        from bevrender_tpu.ops.pallas.experimental import fused_site_call_v2_lse
        from bevrender_tpu.ops.pallas.fused_attn import fused_site_call_lse

        rng = np.random.default_rng(11)
        for B, G, Hpg, H, W, N, ch in (
            (1, 2, 2, 8, 8, 100, 4),    # NT=2, padded keys
            (1, 1, 4, 8, 40, 80, 4),    # WH = 160 > 128: fallback path
        ):
            table = jnp.asarray(
                rng.standard_normal((G, Hpg, 2 * H - 1, 2 * W * 4 - 1)),
                jnp.float32,
            )
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
            args = (t3m, wy4, f4, shift4, packed, gcol, k, v, qcm)
            ref_out, ref_lse = fused_site_call_lse(
                *args, H, W, Hpg, True, N, ch ** -0.5
            )
            got_out, got_lse = fused_site_call_v2_lse(
                *args, H, W, Hpg, True, N, ch ** -0.5
            )
            np.testing.assert_allclose(
                np.asarray(ref_out), np.asarray(got_out),
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(ref_lse), np.asarray(got_lse),
                rtol=1e-5, atol=1e-6,
            )

    def test_bias_fwd_dma_variant_matches(self):
        """The DMA-prefetched bias forward (_fwd_kernel_dma, the training
        path's kernel behind BEVRENDER_BIAS_DMA=1) is bit-identical to the
        inline-extract forward."""
        from bevrender_tpu.ops.deform_attn import _kernel_inputs
        from bevrender_tpu.ops.pallas.lattice_bias import _fwd_call

        rng = np.random.default_rng(11)
        for B, G, Hpg, H, W, N in ((1, 2, 2, 8, 8, 100), (2, 3, 1, 8, 8, 200)):
            table = jnp.asarray(
                rng.standard_normal((G, Hpg, 2 * H - 1, 2 * W * 4 - 1)),
                jnp.float32,
            )
            k_pos = jnp.asarray(
                rng.uniform(-0.95, 0.95, (B, G, N, 2)), jnp.float32
            )
            t3m, wy4, f4, shift4, packed, gcol, Np = _kernel_inputs(
                table, k_pos, H, W
            )
            args = (t3m, wy4, f4, shift4, packed, gcol, H, W, Hpg, True, N)
            ref = _fwd_call(*args, dma=False)
            got = _fwd_call(*args, dma=True)
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_counting_shift_sort_matches_argsort(self):
        """BEVRENDER_SHIFT_SORT=count (counting-rank scatter) reorders keys
        identically to the stable argsort path, including gradients."""
        import os

        from bevrender_tpu.models.attention import (
            _counting_rank8,
            _sort_keys_by_shift,
        )

        rng = np.random.default_rng(13)
        cls = jnp.asarray(rng.integers(0, 8, (4, 3, 200)), jnp.int32)
        rank = _counting_rank8(cls)
        order = jnp.argsort(cls, axis=-1, stable=True)
        chk = jnp.take_along_axis(rank, order, axis=-1)
        assert bool((chk == jnp.arange(200)).all())

        B, G, N, H, W = 2, 3, 150, 8, 8
        pos = jnp.asarray(rng.uniform(-0.95, 0.95, (B * G, N, 2)), jnp.float32)
        tshape = (G, 2, 2 * H - 1, 2 * W * 4 - 1)

        def run(p):
            return _sort_keys_by_shift(p, B, G, N, tshape, H, W)

        a, ga = run(pos), jax.grad(lambda p: jnp.sum(run(p) ** 3))(pos)
        os.environ["BEVRENDER_SHIFT_SORT"] = "count"
        try:
            b, gb = run(pos), jax.grad(lambda p: jnp.sum(run(p) ** 3))(pos)
        finally:
            del os.environ["BEVRENDER_SHIFT_SORT"]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-6, atol=1e-7)


class TestFusedSiteTrainBackward:
    """The fused flash-style backward (fused_site_attention_train): forward
    must match the dense reference like the eval kernel; gradients must match
    XLA autodiff through the streamed fallback to bf16-matmul tolerance (the
    backward recomputes p from the saved logsumexp and runs tiled bf16 MXU
    dots instead of the consumer's full-softmax autodiff)."""

    def _qkv(self, B, G, Hpg, H, W, N, ch, seed):
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (B, G, Hpg, H * W, ch))
        k = jax.random.normal(ks[1], (B, G, Hpg, N, ch))
        v = jax.random.normal(ks[2], (B, G, Hpg, N, ch))
        q_pos = jnp.stack(
            jnp.meshgrid(
                jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W), indexing="ij"
            ),
            axis=-1,
        ).reshape(H * W, 2)
        return q, k, v, q_pos

    def test_forward_matches_dense_reference(self):
        from bevrender_tpu.ops.deform_attn import fused_site_attention_train

        for B, G, Hpg, H, W, d, ch, seed in (
            (2, 2, 2, 8, 8, 2, 4, 0),
            (1, 1, 2, 6, 4, 1, 8, 7),   # N=12 -> Np=64: 52 pad keys masked
        ):
            table, k_pos, H, W, N = _setup(B=B, G=G, Hpg=Hpg, H=H, W=W, d=d,
                                           seed=seed)
            q, k, v, q_pos = self._qkv(B, G, Hpg, H, W, N, ch, seed + 50)
            scale = ch ** -0.5
            out_ref = dense_deform_attention_reference(
                q, k, v, q_pos, k_pos, table, scale=scale
            )
            out_got = fused_site_attention_train(
                q, k, v, k_pos, table, H, W, scale, True
            )
            assert out_got.shape == out_ref.shape
            np.testing.assert_allclose(
                np.asarray(out_got), np.asarray(out_ref),
                rtol=2e-2, atol=2e-2,
            )

    def test_grads_match_xla_path(self):
        from bevrender_tpu.ops.deform_attn import fused_site_attention_train

        for B, G, Hpg, H, W, d, ch, seed in (
            (1, 2, 2, 8, 8, 2, 4, 2),
            (1, 1, 2, 6, 4, 1, 8, 9),   # padded keys: ds must vanish there
        ):
            table, k_pos, H, W, N = _setup(B=B, G=G, Hpg=Hpg, H=H, W=W, d=d,
                                           seed=seed)
            q, k, v, q_pos = self._qkv(B, G, Hpg, H, W, N, ch, seed + 11)
            scale = ch ** -0.5

            def loss_fused(q, k, v, k_pos, table):
                out = fused_site_attention_train(
                    q, k, v, k_pos, table, H, W, scale, True
                )
                w = jnp.cos(jnp.arange(out.size, dtype=jnp.float32)).reshape(
                    out.shape
                )
                return jnp.sum(out * w)

            def loss_ref(q, k, v, k_pos, table):
                out = streamed_deform_attention(
                    q, k, v, q_pos, k_pos, table, scale=scale,
                    lattice_hw=(H, W), lattice_kernel=False,
                )
                w = jnp.cos(jnp.arange(out.size, dtype=jnp.float32)).reshape(
                    out.shape
                )
                return jnp.sum(out * w)

            g_got = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
                q, k, v, k_pos, table
            )
            g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
                q, k, v, k_pos, table
            )
            names = ("dq", "dk", "dv", "dk_pos", "dtable")
            for name, a, b in zip(names, g_got, g_ref):
                scale_ref = float(np.max(np.abs(np.asarray(b)))) + 1e-12
                np.testing.assert_allclose(
                    np.asarray(a) / scale_ref, np.asarray(b) / scale_ref,
                    rtol=2e-2, atol=2e-2,
                    err_msg=f"{name} mismatch (B={B} G={G} ch={ch})",
                )

    def test_v2_forward_composes_with_fused_backward(self, monkeypatch):
        """BEVRENDER_SITE_DMA=2 swaps the training forward to the head-folded
        v2 kernel (fused_site_call_v2_lse); its lse residual must drive the
        shared flash backward to the same gradients as the per-head forward."""
        from bevrender_tpu.ops.deform_attn import fused_site_attention_train

        B, G, Hpg, H, W, d, ch, seed = 1, 2, 2, 8, 8, 2, 4, 2
        table, k_pos, H, W, N = _setup(B=B, G=G, Hpg=Hpg, H=H, W=W, d=d,
                                       seed=seed)
        q, k, v, q_pos = self._qkv(B, G, Hpg, H, W, N, ch, seed + 11)
        scale = ch ** -0.5

        def loss(q, k, v, k_pos, table):
            out = fused_site_attention_train(
                q, k, v, k_pos, table, H, W, scale, True
            )
            w = jnp.cos(jnp.arange(out.size, dtype=jnp.float32)).reshape(
                out.shape
            )
            return jnp.sum(out * w)

        grad_fn = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
        monkeypatch.delenv("BEVRENDER_SITE_DMA", raising=False)
        g_ref = grad_fn(q, k, v, k_pos, table)
        monkeypatch.setenv("BEVRENDER_SITE_DMA", "2")
        g_v2 = grad_fn(q, k, v, k_pos, table)
        names = ("dq", "dk", "dv", "dk_pos", "dtable")
        for name, a, b in zip(names, g_v2, g_ref):
            scale_ref = float(np.max(np.abs(np.asarray(b)))) + 1e-12
            np.testing.assert_allclose(
                np.asarray(a) / scale_ref, np.asarray(b) / scale_ref,
                rtol=1e-4, atol=1e-5, err_msg=f"{name} mismatch",
            )

"""Loss tests — mirrors the reference's per-loss __main__ smoke blocks
(loss/*.py) plus analytic cases."""

import numpy as np
import jax
import jax.numpy as jnp

from bevrender_tpu.losses.metric import (
    contrastive_loss,
    lifted_structure_loss,
    triplet_loss,
)
from bevrender_tpu.losses.recall import recall_at_k, recall_curve
from bevrender_tpu.losses.rendering import (
    cross_entropy_loss,
    l1_loss,
    mse_loss,
)
from bevrender_tpu.training.trainer import select_losses


def _emb(seed, shape=(4, 16)):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape).astype(np.float32)
    )


class TestRenderingLosses:
    def test_mse_l1_values(self):
        a = jnp.asarray([[1.0, 2.0]])
        b = jnp.asarray([[0.0, 4.0]])
        assert float(mse_loss(a, b)) == 2.5  # (1 + 4) / 2
        assert float(l1_loss(a, b)) == 1.5

    def test_ce_matches_manual(self):
        logits = _emb(0, (3, 5))
        target = jax.nn.softmax(_emb(1, (3, 5)), -1)
        got = cross_entropy_loss(logits, target, class_axis=1)
        manual = -jnp.mean(
            jnp.sum(target * jax.nn.log_softmax(logits, 1), axis=1)
        )
        np.testing.assert_allclose(float(got), float(manual), rtol=1e-6)

    def test_grads_exist(self):
        for fn in (mse_loss, l1_loss):
            g = jax.grad(lambda x: fn(x, _emb(2)))(_emb(3))
            assert jnp.abs(g).max() > 0


class TestMetricLosses:
    def test_contrastive_perfect_pairs(self):
        # cam == map -> positive distance 0 (loss 0); negatives contribute.
        e = _emb(4, (3, 8))
        loss = contrastive_loss(e, e)
        # all pos distances are 0 -> pos part 0; neg part > 0 unless all
        # normalized embeddings are ~1 apart
        assert float(loss) >= 0

    def test_contrastive_analytic_two_points(self):
        # Two orthogonal unit vectors, cam == map.
        cam = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
        loss = contrastive_loss(cam, cam, pos_margin=0.0, neg_margin=1.0)
        # pos pairs distance 0 -> no nonzero pos losses -> 0
        # neg pairs distance sqrt(2) > 1 -> no nonzero neg losses -> 0
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)

    def test_contrastive_negatives_close(self):
        # identical everything: negatives at distance 0 -> neg loss = margin
        cam = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
        loss = contrastive_loss(cam, cam)
        np.testing.assert_allclose(float(loss), 1.0, atol=1e-5)

    def test_contrastive_vs_db_semantics(self):
        from bevrender_tpu.losses.metric import contrastive_loss_vs_db

        # perfect retrieval vs an orthogonal DB: pos d=0, negs d=sqrt(2)>1
        db = jnp.eye(3)
        cam = db[jnp.asarray([2, 0])]
        loss = contrastive_loss_vs_db(cam, db, jnp.asarray([2, 0]))
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)
        # collapsed queries AND db: every neg at distance ~0 -> margin
        db1 = jnp.asarray([[1.0, 0.0]] * 3)
        loss = contrastive_loss_vs_db(db1[:2], db1, jnp.asarray([0, 1]))
        np.testing.assert_allclose(float(loss), 1.0, atol=1e-4)
        # gradient flows to the queries and is finite
        g = jax.grad(
            lambda c: contrastive_loss_vs_db(c, db, jnp.asarray([1, 2]))
        )(jnp.asarray([[0.6, 0.8, 0.0], [0.0, 0.6, 0.8]]))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_triplet_reg_only_when_no_semihard(self):
        # far-separated pairs: no semihard triplets -> loss = mean L2 norm
        cam = jnp.asarray([[10.0, 0.0], [0.0, 10.0]])
        map_ = cam
        loss = triplet_loss(cam, map_)
        np.testing.assert_allclose(float(loss), 10.0, rtol=1e-5)

    def test_lifted_structure_positive_and_grad(self):
        cam, map_ = _emb(5), _emb(6)
        loss = lifted_structure_loss(cam, map_)
        assert float(loss) >= 0
        g = jax.grad(lambda c: lifted_structure_loss(c, map_))(cam)
        assert jnp.isfinite(g).all()

    def test_all_metric_losses_backward(self):
        # parity with the reference's __main__ smoke blocks
        cam, map_ = _emb(7, (2, 64)), _emb(8, (2, 64))
        for fn in (contrastive_loss, triplet_loss, lifted_structure_loss):
            val, grad = jax.value_and_grad(fn)(cam, map_)
            assert jnp.isfinite(val)
            assert jnp.isfinite(grad).all()


class TestRecall:
    def test_perfect_retrieval(self):
        e = _emb(9, (8, 4))
        e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
        r1, r5, r10 = recall_at_k(e, e)
        assert float(r1) == 100.0 and float(r5) == 100.0

    def test_rank_semantics_match_reference(self):
        # cam0 matches map1 better than map0 -> query 0's gt rank is 1
        cam = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.7, 0.7]])
        map_ = jnp.asarray([[0.0, 1.0], [1.0, 0.0], [0.7, 0.7]])
        cam = cam / jnp.linalg.norm(cam, axis=-1, keepdims=True)
        map_ = map_ / jnp.linalg.norm(map_, axis=-1, keepdims=True)
        r1, _, _ = recall_at_k(cam, map_)
        # only pair 2 retrieves itself at rank 0
        np.testing.assert_allclose(float(r1), 100.0 / 3, rtol=1e-5)

    def test_recall_curve_monotone(self):
        cam, map_ = _emb(10, (6, 5)), _emb(11, (6, 5))
        curve = np.asarray(recall_curve(cam, map_))
        assert curve.shape == (11,)
        assert (np.diff(curve) >= -1e-7).all()
        assert curve[0] == 0.0  # rank < 0 is impossible


class TestLossSelection:
    def test_substring_matching_parity(self):
        # train.py:96-125 semantics
        rendering, retrieval, rf, tf = select_losses("MSE")
        assert rendering and not retrieval and rf is not None
        rendering, retrieval, rf, tf = select_losses("MSE_TRIPLET")
        assert rendering and retrieval and rf is not None and tf is not None
        rendering, retrieval, _, tf = select_losses("CONTRASTIVE")
        assert retrieval and not rendering
        rendering, retrieval, _, _ = select_losses("CROSS_ENTROPY_RENDER")
        assert rendering and not retrieval


class TestInfoNCEVsDB:
    def test_matches_manual_softmax_ce(self):
        from bevrender_tpu.losses.metric import infonce_loss_vs_db

        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
        db = jnp.asarray(rng.standard_normal((6, 8)), jnp.float32)
        labels = jnp.asarray([2, 0, 5, 1])
        got = float(infonce_loss_vs_db(q, db, labels, temperature=0.1))
        qn = np.asarray(q) / np.linalg.norm(q, axis=-1, keepdims=True)
        tn = np.asarray(db) / np.linalg.norm(db, axis=-1, keepdims=True)
        logits = qn @ tn.T / 0.1
        logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
        want = -np.mean(logp[np.arange(4), np.asarray(labels)])
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_finite_gradient_near_embedding_collapse(self):
        """The reason this loss exists (r5): a fresh Siamese head emits
        NEARLY-identical embeddings for every image. Near that collapse the
        softmax-CE gradient is finite and scales smoothly with the residual
        differences (the margin-contrastive loss plateaus there — its pos
        pairs sit at d~0 with zero loss and its neg gradient needs the
        sqrt-distance direction, which is noise at d~0)."""
        from bevrender_tpu.losses.metric import infonce_loss_vs_db

        rng = np.random.default_rng(0)
        one = np.ones((1, 8), np.float32)
        q = jnp.asarray(one + 1e-3 * rng.standard_normal((4, 8)), jnp.float32)
        db = jnp.asarray(one + 1e-3 * rng.standard_normal((6, 8)), jnp.float32)
        labels = jnp.asarray([0, 1, 2, 3])
        g_nce = jax.grad(
            lambda q: infonce_loss_vs_db(q, db, labels)
        )(q)
        assert np.isfinite(np.asarray(g_nce)).all()
        assert float(jnp.max(jnp.abs(g_nce))) > 1e-4

"""Metric-learning losses in pure JAX.

The reference wraps ``pytorch_metric_learning`` (PML) with paired-arange
labels: camera embedding i and map embedding i are the only positive pair
(loss/contrastive_loss.py:11-19, loss/triplet_loss_metric.py:18-28,
loss/lift_loss.py:13-22). PML is reimplemented here from its documented
semantics with fully static shapes (masked pairwise/triplet tensors — no
dynamic mining shapes, jit-friendly):

* ``contrastive_loss`` — PML ``ContrastiveLoss(pos_margin=0, neg_margin=1)``:
  L2-normalized euclidean distance; positive-pair loss ``relu(d - pos_margin)``,
  negative-pair loss ``relu(neg_margin - d)``; each averaged over its *nonzero*
  elements (PML's AvgNonZeroReducer) then summed.
* ``triplet_loss`` — PML ``TripletMarginLoss(distance=CosineSimilarity,
  reducer=ThresholdReducer(high=0.3), embedding_regularizer=LpRegularizer())``
  fed by ``TripletMarginMiner(margin=0.2, type="semihard")``: triplets where
  the negative is farther than the positive but within the mining margin;
  per-triplet loss ``relu(s_an - s_ap + margin)`` on cosine similarities;
  averaged over triplets with loss below the reducer threshold; plus the mean
  L2 norm of the raw embeddings.
* ``lifted_structure_loss`` — PML ``LiftedStructureLoss(neg_margin=1,
  pos_margin=0)`` (Oh Song et al., CVPR 2016): per positive pair
  ``J = log(sum_neg exp(neg_margin - d)) + (d_pos - pos_margin)``, loss
  ``mean_pos(relu(J)^2) / 2``.

All take ``(cam_embeddings, map_embeddings)`` of shape (B, D) — flattened
model outputs, as the trainer feeds them (train.py:224-232).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _l2_normalize(x: jax.Array) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), _EPS)


def _pair_setup(cam: jax.Array, map_: jax.Array):
    """Concatenate embeddings with paired-arange labels; return (emb, pos_mask,
    neg_mask) with the diagonal excluded."""
    B = cam.shape[0]
    emb = jnp.concatenate([cam, map_], axis=0)  # (2B, D)
    labels = jnp.concatenate([jnp.arange(B), jnp.arange(B)])
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(2 * B, dtype=bool)
    return emb, same & ~eye, ~same


def _euclidean_dist(x: jax.Array) -> jax.Array:
    sq = jnp.sum(x * x, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * x @ x.T
    return jnp.sqrt(jnp.maximum(d2, _EPS))


def _masked_mean_nonzero(values: jax.Array, mask: jax.Array) -> jax.Array:
    """PML AvgNonZeroReducer: mean over (masked) strictly-positive losses."""
    nz = mask & (values > 0)
    total = jnp.sum(jnp.where(nz, values, 0.0))
    count = jnp.sum(nz)
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def contrastive_loss(
    cam: jax.Array,
    map_: jax.Array,
    pos_margin: float = 0.0,
    neg_margin: float = 1.0,
) -> jax.Array:
    emb, pos_mask, neg_mask = _pair_setup(cam, map_)
    d = _euclidean_dist(_l2_normalize(emb))
    pos_loss = _masked_mean_nonzero(jnp.maximum(d - pos_margin, 0.0), pos_mask)
    neg_loss = _masked_mean_nonzero(jnp.maximum(neg_margin - d, 0.0), neg_mask)
    return pos_loss + neg_loss


def contrastive_loss_vs_db(
    cam: jax.Array,
    db: jax.Array,
    labels: jax.Array,
    pos_margin: float = 0.0,
    neg_margin: float = 1.0,
) -> jax.Array:
    """Contrastive loss of a query minibatch against a RESIDENT tile
    database (memory-bank negatives).

    Same pos/neg margins and AvgNonZeroReducer semantics as
    :func:`contrastive_loss`, but the negative set is the whole ``db``
    (N, D) instead of the other in-batch items. This is the TPU-shaped
    remedy for small device minibatches of *adjacent* trace poses: with
    only in-batch negatives every negative tile nearly coincides with the
    positive and the gradient cancels (measured: mid-size n=32 at B=8
    consecutive minibatches stays at chance for 1500 steps; full-batch
    hits 100% R@1 by 400). The database rides HBM as one (N, D) matrix —
    the same layout the registration matcher uses — so the extra
    negatives cost one (B, N) matmul, not activation memory.

    Args:
      cam: (B, D) query embeddings (gradients flow).
      db:  (N, D) database embeddings (typically fixed tiles).
      labels: (B,) int indices of each query's positive row in ``db``.
    """
    q = _l2_normalize(cam)
    t = _l2_normalize(db)
    sq = jnp.sum(q * q, axis=-1)[:, None] + jnp.sum(t * t, axis=-1)[None, :]
    d = jnp.sqrt(jnp.maximum(sq - 2.0 * q @ t.T, _EPS))  # (B, N)
    pos_mask = labels[:, None] == jnp.arange(db.shape[0])[None, :]
    pos_loss = _masked_mean_nonzero(
        jnp.maximum(d - pos_margin, 0.0), pos_mask
    )
    neg_loss = _masked_mean_nonzero(
        jnp.maximum(neg_margin - d, 0.0), ~pos_mask
    )
    return pos_loss + neg_loss


def infonce_loss_vs_db(
    cam: jax.Array,
    db: jax.Array,
    labels: jax.Array,
    temperature: float = 0.07,
) -> jax.Array:
    """Softmax-CE (InfoNCE) retrieval loss of a query minibatch against a
    resident database — the memory-bank companion of
    :func:`contrastive_loss_vs_db` for TRAINED embedding heads.

    Why it exists (measured, round 5): a freshly-initialized Siamese conv
    head (models/retrieval.py) maps every image to nearly one point on the
    unit sphere. At that collapse the margin-contrastive's gradients cancel
    — pos pairs sit at d=0 (zero loss), neg pairs' pull-apart direction is
    noise, and the loss plateaus at the margin value (observed: retrieval
    loss pinned at ~1.00, grad-norm ~0.02, recall at chance for 750 steps
    on the pyramid config). Softmax cross-entropy over similarities has a
    nonzero, well-conditioned gradient everywhere including the collapsed
    configuration, so the head breaks symmetry immediately. One (B, N)
    matmul on the MXU, same data layout as the registration matcher.

    The reference's PML losses (contrastive/triplet/lifted) are kept for
    parity; this is the TPU-build's head-training default.
    """
    q = _l2_normalize(cam)
    t = _l2_normalize(db)
    logits = (q @ t.T) / temperature  # (B, N)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(
        jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)
    )


def triplet_loss(
    cam: jax.Array,
    map_: jax.Array,
    margin: float = 0.05,
    miner_margin: float = 0.2,
    reducer_high: float = 0.3,
    reg_weight: float = 1.0,
) -> jax.Array:
    emb, pos_mask, neg_mask = _pair_setup(cam, map_)
    normed = _l2_normalize(emb)

    # semihard mining on normalized euclidean distance
    # (PML TripletMarginMiner default distance).
    d = _euclidean_dist(normed)
    d_ap = d[:, :, None]  # (a, p, ·)
    d_an = d[:, None, :]  # (a, ·, n)
    semihard = (d_an > d_ap) & (d_an < d_ap + miner_margin)
    valid = pos_mask[:, :, None] & neg_mask[:, None, :] & semihard

    # per-triplet loss on cosine similarity (larger = closer)
    s = normed @ normed.T
    viol = jnp.maximum(s[:, None, :] - s[:, :, None] + margin, 0.0)  # s_an - s_ap

    # ThresholdReducer(high): average the (mined) losses below the threshold
    keep = valid & (viol < reducer_high)
    total = jnp.sum(jnp.where(keep, viol, 0.0))
    count = jnp.sum(keep)
    loss = jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)

    reg = jnp.mean(jnp.linalg.norm(emb, axis=-1))
    return loss + reg_weight * reg


def lifted_structure_loss(
    cam: jax.Array,
    map_: jax.Array,
    neg_margin: float = 1.0,
    pos_margin: float = 0.0,
) -> jax.Array:
    emb, pos_mask, neg_mask = _pair_setup(cam, map_)
    d = _euclidean_dist(_l2_normalize(emb))

    # log-sum-exp over each row's negatives (masked, numerically stable)
    neg_terms = jnp.where(neg_mask, neg_margin - d, -jnp.inf)  # (2B, 2B)
    row_lse = jax.nn.logsumexp(neg_terms, axis=1)  # (2B,)

    # per positive pair (i, j): lse over negatives of i and of j combined
    pair_lse = jnp.logaddexp(row_lse[:, None], row_lse[None, :])
    J = pair_lse + (d - pos_margin)
    J = jnp.maximum(J, 0.0)

    n_pos = jnp.sum(pos_mask)
    return jnp.sum(jnp.where(pos_mask, J**2, 0.0)) / jnp.maximum(2.0 * n_pos, 1.0)


class ContrastiveLoss:
    def get_loss(self, cam, map_):
        return contrastive_loss(cam, map_)


class TripletLossMetricLearning:
    def get_loss(self, cam, map_):
        return triplet_loss(cam, map_)


class LiftedStructureLoss:
    def get_loss(self, cam, map_):
        return lifted_structure_loss(cam, map_)

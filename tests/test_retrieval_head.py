"""Retrieval-embedding head (models/retrieval.py; SURVEY 3.4's "make the
embedding explicit" item).

Reference contract being generalized: the metric losses consume flattened
renders/tiles (train.py:224-232) while the recall buffers are sized for a
different dim entirely (train.py:36-37) — the head replaces both with one
explicit, configurable embedding. Pinned here: parameter creation via init,
unit-norm output, gradient flow into the head from BOTH sides of the
contrastive pair, and the registration pipeline's compact database."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevrender_tpu.config import Config, tiny_model_config
from bevrender_tpu.data.dataset import SyntheticGeoDataset
from bevrender_tpu.data.prefetch import collate
from bevrender_tpu.models.bevrender import BEVRenderModel
from bevrender_tpu.training.trainer import Trainer

# compile-heavy on the 1-core host: excluded from the <5-min fast tier
# (run 'pytest -m "not slow"' for the quick core-parity loop; see README)
pytestmark = pytest.mark.slow


def _cfg(head: int) -> Config:
    cfg = Config()
    cfg.model = tiny_model_config()
    cfg.model.retrieval_embed_dim = head
    cfg.model.retrieval_head_widths = (8, 16)
    cfg.train.loss_type = "MSE_CONTRASTIVE"
    cfg.train.batch_size = 4
    cfg.train.use_wandb = False
    cfg.train.save_ckpt = False
    cfg.data.window_num_imgs = 1
    return cfg


def _ds(cfg):
    m = cfg.model
    return SyntheticGeoDataset(
        n_items=8, num_views=m.num_views, window_num_imgs=1,
        img_height=m.img_height, img_width=m.img_width,
        map_tile=4 * m.bev_shapes[-1], world=256, seed=0,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg(head=16)
    ds = _ds(cfg)
    model = BEVRenderModel(cfg)
    trainer = Trainer(model, cfg, ds)
    batch = collate([ds[i] for i in range(4)])
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    return cfg, ds, model, trainer, batch, state


def test_head_params_created(setup):
    _, _, _, _, _, state = setup
    assert "retrieval_head" in state.params
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(state.params["retrieval_head"]))
    assert n > 0


def test_embed_unit_norm_and_shape(setup):
    cfg, _, model, trainer, batch, state = setup
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    emb = model.embed(variables, jnp.asarray(batch["map"]))
    assert emb.shape == (4, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5
    )
    # trainer._embed routes through the head (not the flatten)
    emb2 = trainer._embed(variables, jnp.asarray(batch["map"]))
    np.testing.assert_allclose(np.asarray(emb2), np.asarray(emb), atol=1e-6)


def test_head_gets_gradients_from_train_step(setup):
    _, _, _, trainer, batch, state = setup
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    new_state, metrics, _ = trainer._train_step_impl(
        state, dev, jax.random.PRNGKey(1)
    )
    before = jax.tree_util.tree_leaves(state.params["retrieval_head"])
    after = jax.tree_util.tree_leaves(new_state.params["retrieval_head"])
    moved = any(
        float(jnp.max(jnp.abs(a - b))) > 0 for a, b in zip(before, after)
    )
    assert moved, "retrieval head params did not move in a train step"
    assert float(metrics["train_batch_retrieval_loss"]) >= 0.0


def test_db_loss_step_via_step_with(setup):
    """The recall demo's injection path: _step_with + contrastive_loss_vs_db
    against resident raw tiles, head re-embedding the DB each step."""
    from bevrender_tpu.losses.metric import contrastive_loss_vs_db

    _, _, _, trainer, batch, state = setup
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    dev["db_label"] = jnp.arange(4, dtype=jnp.int32)
    tiles = dev["map"]

    def losses(variables, out, b):
        q = trainer._embed(variables, out)
        t = trainer._embed(variables, tiles)
        loss = contrastive_loss_vs_db(q, t, b["db_label"])
        return loss, {"retrieval": loss}

    new_state, metrics, _ = trainer._step_with(
        state, dev, jax.random.PRNGKey(2), losses
    )
    assert np.isfinite(float(metrics["train_batch_loss"]))
    before = jax.tree_util.tree_leaves(state.params["retrieval_head"])
    after = jax.tree_util.tree_leaves(new_state.params["retrieval_head"])
    assert any(
        float(jnp.max(jnp.abs(a - b))) > 0 for a, b in zip(before, after)
    )


def test_registration_with_head(setup):
    from bevrender_tpu.inference.register import RegistrationPipeline

    cfg, ds, model, trainer, batch, state = setup
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    pipe = RegistrationPipeline(cfg, variables)
    tiles = [ds[i]["map"] for i in range(8)]
    db = pipe.build_tile_database(tiles, batch_size=3)
    assert db.shape == (8, 16)  # compact, not 3*H*W
    rendered, idx, dist = pipe.register(
        {k: jnp.asarray(v) for k, v in batch.items()}, top_k=3
    )
    assert idx.shape == (4, 3) and dist.shape == (4, 3)
    assert rendered.shape[0] == 4
    # tile self-query sanity: a tile embedded as query retrieves itself
    q = pipe._embed_tiles(variables, jnp.asarray(np.stack(tiles)))
    top1, _ = pipe._match(q, db, 1)
    np.testing.assert_array_equal(np.asarray(top1)[:, 0], np.arange(8))


def test_empty_tiles_raises(setup):
    from bevrender_tpu.inference.register import RegistrationPipeline

    cfg, _, _, _, _, state = setup
    variables = {"params": state.params}
    pipe = RegistrationPipeline(cfg, variables)
    with pytest.raises(ValueError, match="no tiles"):
        pipe.build_tile_database([])
    with pytest.raises(ValueError, match="no tiles"):
        pipe.build_tile_database(iter([]))


def test_flatten_parity_default_unchanged():
    """retrieval_embed_dim=0 keeps the reference flatten: no head params,
    embed == reshape."""
    cfg = _cfg(head=0)
    ds = _ds(cfg)
    model = BEVRenderModel(cfg)
    trainer = Trainer(model, cfg, ds)
    batch = collate([ds[i] for i in range(4)])
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    assert "retrieval_head" not in state.params
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    emb = trainer._embed(variables, jnp.asarray(batch["map"]))
    assert emb.shape == (4, batch["map"][0].size)

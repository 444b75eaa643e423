"""Trainer tests on the tiny model + synthetic data (CPU, 8 virtual devices)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bevrender_tpu.config import Config, tiny_model_config
from bevrender_tpu.data.dataset import SyntheticDataset
from bevrender_tpu.data.prefetch import collate
from bevrender_tpu.models.bevrender import BEVRenderModel
from bevrender_tpu.training.schedule import warmup_cosine_lambda
from bevrender_tpu.training.trainer import Trainer

# compile-heavy on the 1-core host: excluded from the <5-min fast tier
# (run 'pytest -m "not slow"' for the quick core-parity loop; see README)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    cfg = Config()
    cfg.model = tiny_model_config()
    cfg.data.window_num_imgs = 2
    cfg.train.batch_size = 2
    cfg.train.loss_type = "MSE_CONTRASTIVE"
    cfg.train.k_fold = 2
    cfg.train.epoch_per_fold = 1
    cfg.train.ckpt_dir = "/tmp/bevrender_test_ckpt"
    ds = SyntheticDataset(
        n_items=8, num_views=2, window_num_imgs=2, img_height=32, img_width=32,
        map_tile=32,
    )
    model = BEVRenderModel(cfg)
    trainer = Trainer(model, cfg, ds)
    sample = collate([ds[i] for i in range(2)])
    state0 = trainer.create_state(jax.random.PRNGKey(0), sample)

    def fresh_state():
        # _train_step donates its input state; give each test its own copy
        return jax.tree_util.tree_map(jnp.copy, state0)

    return cfg, ds, model, trainer, sample, fresh_state


class TestSchedule:
    def test_warmup_cosine_parity(self):
        # utils/scheduler.py:5-29 semantics
        assert warmup_cosine_lambda(0, 5, 100) == 0.0
        assert warmup_cosine_lambda(3, 5, 100) == 0.6
        assert warmup_cosine_lambda(5, 5, 100) == 1.0
        assert abs(warmup_cosine_lambda(100, 5, 100)) < 1e-9
        mid = warmup_cosine_lambda(52, 5, 100)
        assert 0.4 < mid < 0.6


class TestTrainStep:
    def test_loss_decreases_and_stats_update(self, setup):
        cfg, ds, model, trainer, sample, fresh_state = setup
        state = fresh_state()
        batch = {k: jnp.asarray(v) for k, v in sample.items()}
        rng = jax.random.PRNGKey(1)
        losses = []
        for i in range(6):
            state, metrics, _render = trainer._train_step(state, batch, rng)
            losses.append(float(metrics["train_batch_loss"]))
            assert np.isfinite(losses[-1])
            assert float(metrics["camera_encoder_grad_norm"]) > 0
        # same batch repeated -> loss must trend down (individual steps can
        # bounce: the contrastive term on a 2-sample batch is noisy)
        assert min(losses[2:]) < losses[0]

    def test_eval_step(self, setup):
        cfg, ds, model, trainer, sample, fresh_state = setup
        state = fresh_state()
        batch = {k: jnp.asarray(v) for k, v in sample.items()}
        metrics, cam_e, map_e, out = trainer._eval_step(state, batch)
        assert np.isfinite(float(metrics["val_batch_loss"]))
        assert cam_e.shape[0] == 2 and cam_e.shape == map_e.shape

    def test_epoch_lr_injection(self, setup):
        cfg, ds, model, trainer, sample, fresh_state = setup
        state = fresh_state()
        s0 = trainer.set_epoch_lr(state, 0)
        assert float(s0.opt_state.hyperparams["learning_rate"]) == 0.0
        s5 = trainer.set_epoch_lr(state, cfg.train.warmup_epochs)
        np.testing.assert_allclose(
            float(s5.opt_state.hyperparams["learning_rate"]),
            cfg.train.learning_rate,
            rtol=1e-6,
        )


class TestMultiStepDispatch:
    def test_k_steps_per_dispatch_matches_sequential(self, setup):
        """steps_per_dispatch: one jitted scan over k stacked batches must be
        numerically identical to k sequential single-step dispatches (same
        params, same per-step metrics), including a trailing partial group.

        Uses MSE loss + SGD and measured-noise tolerances: the scanned and
        standalone compilations of the same step are different XLA programs,
        so bitwise-equal math is not guaranteed. Measured on this backend,
        one identical SGD step differs by <=2e-6 in params (conv-gradient
        fusion order inside scan); the tiny 2-sample BatchNorm then amplifies
        that to ~1e-2-relative loss shifts within a few steps, and Adam's
        step-1 update (g/sqrt(g^2), a sign function) or the semihard miner's
        hard thresholds would amplify it discontinuously. The contract here:
        first-step loss exact (same state, same batch), per-step losses
        within the measured noise envelope, params within it after 3 steps,
        step counters equal — tight enough to catch any real routing / rng /
        state-threading bug, which diverges at O(1)."""
        cfg, ds, model, _trainer, sample, fresh_state = setup
        import copy
        import optax

        cfg_mse = copy.deepcopy(cfg)
        cfg_mse.train.loss_type = "MSE"
        trainer = Trainer(BEVRenderModel(cfg_mse), cfg_mse, ds)
        trainer.tx = optax.inject_hyperparams(
            lambda learning_rate: optax.sgd(learning_rate)
        )(learning_rate=1e-3)
        batches = [collate([ds[i], ds[i + 1]]) for i in (0, 2, 4)]
        rng = jax.random.PRNGKey(7)

        state_a = jax.tree_util.tree_map(
            jnp.copy, trainer.create_state(jax.random.PRNGKey(0), sample)
        )
        state_b = jax.tree_util.tree_map(jnp.copy, state_a)
        seq_losses = []
        for b in batches:
            state_a, metrics, render_a = trainer._train_step(
                state_a, {k: jnp.asarray(v) for k, v in b.items()}, rng
            )
            seq_losses.append(float(metrics["train_batch_loss"]))

        from bevrender_tpu.data.prefetch import group_batches

        grouped = list(group_batches(iter(batches), 2))  # sizes (2, 1)
        assert [g["camera"].shape[0] for g in grouped] == [2, 1]
        multi_losses = []
        for g in grouped:
            state_b, metrics, render_b = trainer._train_step_multi(
                state_b, {k: jnp.asarray(v) for k, v in g.items()}, rng
            )
            multi_losses.extend(np.asarray(metrics["train_batch_loss"]).tolist())

        # first step: same state, same batch -> identical math, exact match
        np.testing.assert_allclose(multi_losses[0], seq_losses[0], rtol=1e-6)
        # later steps: measured compile-order noise envelope (see docstring;
        # the 2-sample BatchNorm's near-zero variances make per-pixel render
        # values chaotic under that noise, so the render is checked for
        # shape/finiteness only — step-1 exactness + params bound the math)
        np.testing.assert_allclose(multi_losses, seq_losses, rtol=2.5e-2)
        assert render_b.shape == render_a.shape
        assert bool(jnp.isfinite(render_b).all())
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-2, atol=1e-2
            ),
            state_a.params,
            state_b.params,
        )
        assert int(state_b.step) == int(state_a.step) == 3

    def test_trainer_loop_runs_grouped(self, setup, tmp_path):
        """Trainer.train end-to-end with steps_per_dispatch=2 (grouped
        prefetch path incl. epoch-loss accounting and cadenced logging)."""
        cfg, ds, model, trainer, sample, fresh_state = setup
        import copy

        cfg2 = copy.deepcopy(cfg)
        cfg2.train.steps_per_dispatch = 2
        cfg2.train.total_epochs = 1
        cfg2.train.k_fold = 2
        cfg2.train.apply_validation = False
        cfg2.train.save_ckpt = False
        cfg2.train.work_dir = str(tmp_path)
        t2 = Trainer(BEVRenderModel(cfg2), cfg2, ds)
        t2.work_dir = str(tmp_path)
        state = t2.create_state(jax.random.PRNGKey(0), sample)
        state = t2.train(state, apply_validation=False, max_epochs=2)
        # 8 items, k_fold=2 -> 4 train items -> 2 batches of 2 -> 1 grouped
        # dispatch of 2 steps per epoch
        assert int(state.step) > 0


class TestCheckpoint:
    def test_save_restore_roundtrip(self, setup, tmp_path):
        cfg, ds, model, trainer, sample, fresh_state = setup
        state = fresh_state()
        trainer.work_dir = str(tmp_path)
        trainer.save_checkpoint(state, epoch=3, best=True)
        trainer.save_checkpoint(state, epoch=3, best=False)
        assert (tmp_path / "best_epoch_3").exists()
        assert (tmp_path / "last_epoch").exists()

        # perturb then restore
        perturbed = state.replace(
            params=jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
        )
        restored = trainer.restore_checkpoint(perturbed, str(tmp_path / "best_epoch_3"))
        orig = jax.tree_util.tree_leaves(state.params)
        rest = jax.tree_util.tree_leaves(restored.params)
        for a, b in zip(orig, rest):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_equivalence(self, setup, tmp_path):
        """save -> restore -> continue == training straight through.

        Proves the checkpoint carries everything the step depends on
        (params, batch stats, optimizer moments AND the step counter that
        seeds the per-step dropout stream). The reference cannot restore at
        all (utils/utils.py:99 saves only)."""
        cfg, ds, model, trainer, sample, fresh_state = setup
        trainer.work_dir = str(tmp_path)
        batch = {k: jnp.asarray(v) for k, v in sample.items()}
        rng = jax.random.PRNGKey(7)

        # run A: 4 steps straight through
        state = fresh_state()
        for _ in range(4):
            state, _, _ = trainer._train_step(state, batch, rng)
        final_a = state

        # run B: 2 steps, checkpoint, restore into a fresh template, 2 more
        state = fresh_state()
        for _ in range(2):
            state, _, _ = trainer._train_step(state, batch, rng)
        trainer.save_checkpoint(state, epoch=1, best=True)
        resumed = trainer.restore_checkpoint(
            fresh_state(), str(tmp_path / "best_epoch_1")
        )
        assert int(resumed.step) == 2  # recovered from opt_state.count
        for _ in range(2):
            resumed, _, _ = trainer._train_step(resumed, batch, rng)

        for a, b in zip(
            jax.tree_util.tree_leaves(
                (final_a.params, final_a.batch_stats, final_a.opt_state)
            ),
            jax.tree_util.tree_leaves(
                (resumed.params, resumed.batch_stats, resumed.opt_state)
            ),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_latest_best(self, setup, tmp_path):
        from bevrender_tpu.training.checkpoint import latest_best

        cfg, ds, model, trainer, sample, fresh_state = setup
        state = fresh_state()
        trainer.work_dir = str(tmp_path)
        trainer.save_checkpoint(state, epoch=1, best=True)
        trainer.save_checkpoint(state, epoch=7, best=True)
        assert latest_best(str(tmp_path)).endswith("best_epoch_7")


class TestKFoldLoop:
    def test_two_epochs_end_to_end(self, setup, tmp_path):
        cfg, ds, model, trainer, sample, fresh_state = setup
        state = fresh_state()
        trainer.work_dir = str(tmp_path)
        state = trainer.train(state, max_epochs=3)
        assert int(state.step) > 0

"""Trainer: jitted train/eval steps, K-fold orchestration, validation with
recall, checkpoint policy — the TPU rebuild of ``Trainer`` (train.py:35-697).

Key translations:
* the per-batch host loop around ``forward/backward/clip/step``
  (train.py:184-247) becomes one jitted ``train_step`` (grads, global-norm
  clip 1.0, AdamW update, metric pytree out);
* data parallelism is jit+GSPMD: the batch is sharded over the mesh's
  ``data`` axis, params are replicated, and XLA inserts the gradient
  all-reduce — no DDP/NCCL/barriers (SURVEY 2.5);
* loss-mode selection by substring of LOSS_TYPE is kept verbatim
  (train.py:96-125);
* the K-fold outer loop mirrors train.py:656-697: fresh KFold splits,
  ``epoch_per_fold`` epochs per fold, until ``total_epochs``;
* the LR schedule steps per *epoch* (train.py:512) — the warmup-cosine factor
  is injected into the optimizer per epoch;
* validation embeddings accumulate on host and feed the jittable recall
  (train.py:325-395, 551-572); best-checkpoint policy is LOSS or RECALL(R@5)
  (train.py:470-505);
* checkpoints save AND restore (Orbax) — restore is new capability.

Retrieval embeddings: the reference feeds the decoder output to the metric
losses but sizes its recall buffers for a flattened BEV feature
(``model_output_dim = 64*28*28`` vs decoder ``3*224*224`` — train.py:36-37;
SURVEY 3.4). Here the retrieval embedding is explicit: the flattened decoder
output by default (reference parity), the trained Siamese conv head
(models/retrieval.py) when ``ModelConfig.retrieval_embed_dim > 0``, or any
custom ``embed_fn``.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from bevrender_tpu.config import Config
from bevrender_tpu.data.prefetch import DataLoader, device_prefetch, group_batches
from bevrender_tpu.losses import metric as metric_losses
from bevrender_tpu.losses import rendering as render_losses
from bevrender_tpu.losses.recall import recall_at_k
from bevrender_tpu.models.bevrender import BEVRenderModel
from bevrender_tpu.training import checkpoint as ckpt
from bevrender_tpu.training.metrics import MetricsLogger, get_logger
from bevrender_tpu.training.schedule import warmup_cosine_lambda


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def select_losses(loss_type: str):
    """Substring-matched loss mode flags and implementations
    (train.py:96-125)."""
    image_rendering = any(
        s in loss_type for s in ("MSE", "L1", "CROSS_ENTROPY_RENDER")
    )
    image_retrieval = any(
        s in loss_type
        for s in ("LIFT", "TRIPLET", "CONTRASTIVE", "CROSS_ENTROPY_RTRVL")
    )
    render_fn = None
    if "MSE" in loss_type:
        render_fn = render_losses.mse_loss
    elif "L1" in loss_type:
        render_fn = render_losses.l1_loss
    elif "CROSS_ENTROPY_RENDER" in loss_type:
        render_fn = lambda p, t: render_losses.cross_entropy_loss(p, t, class_axis=-1)
    retrieval_fn = None
    if "LIFT" in loss_type:
        retrieval_fn = metric_losses.lifted_structure_loss
    elif "TRIPLET" in loss_type:
        retrieval_fn = metric_losses.triplet_loss
    elif "CONTRASTIVE" in loss_type:
        retrieval_fn = metric_losses.contrastive_loss
    elif "CROSS_ENTROPY_RTRVL" in loss_type:
        retrieval_fn = render_losses.cross_entropy_loss
    return image_rendering, image_retrieval, render_fn, retrieval_fn


class Trainer:
    def __init__(
        self,
        model: BEVRenderModel,
        config: Config,
        train_val_dataset,
        logger=None,
        mesh: Optional[jax.sharding.Mesh] = None,
        embed_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    ):
        self.model = model
        self.config = config
        self.tc = config.train
        self.dataset = train_val_dataset
        self.logger = logger or get_logger()
        self.metrics = MetricsLogger(self.tc.use_wandb, self.logger)
        self.mesh = mesh
        # retrieval embedding: an explicit ``embed_fn`` wins; otherwise the
        # config decides — retrieval_embed_dim > 0 routes through the model's
        # trained Siamese head (models/retrieval.py), 0 keeps the
        # reference-parity flatten (train.py:224-232). The head path needs
        # the live variables (its params train), hence ``_embed(variables, x)``
        # below rather than a pure image->vector function.
        self.use_embed_head = (
            embed_fn is None and config.model.retrieval_embed_dim > 0
        )
        self.embed_fn = embed_fn or (lambda out: out.reshape(out.shape[0], -1))

        (
            self.image_rendering,
            self.image_retrieval,
            self.render_fn,
            self.retrieval_fn,
        ) = select_losses(self.tc.loss_type)
        if not (self.image_rendering or self.image_retrieval):
            raise ValueError(f"LOSS_TYPE selects no loss: {self.tc.loss_type}")

        self.tx = optax.inject_hyperparams(self._make_optimizer)(
            learning_rate=self.tc.learning_rate
        )

        self.best_epoch = 0
        self.best_epoch_loss = 1e8  # train.py:89-92
        self.best_epoch_recall = 0.0
        self.work_dir = self.tc.work_dir or str(
            Path(self.tc.ckpt_dir) / str(int(time.time()))
        )
        Path(self.work_dir).mkdir(parents=True, exist_ok=True)

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        # k steps per dispatch (tc.steps_per_dispatch > 1); jit is lazy, so
        # this costs nothing unless the grouped path is actually used
        self._train_step_multi = jax.jit(
            self._train_step_multi_impl, donate_argnums=(0,)
        )
        self._eval_step = jax.jit(self._eval_step_impl)
        self._recall = jax.jit(lambda c, m: recall_at_k(c, m, (1, 5, 10)))

        self.preprocess = None
        if config.data.on_device_preprocess:
            from bevrender_tpu.data.preprocess import (
                make_batch_preprocessor,
                make_cast_preprocessor,
            )

            # True -> full wide-image resize/split/normalize pipeline;
            # "cast" -> uint8->f32/255 only (final-shaped-view datasets)
            if config.data.on_device_preprocess == "cast":
                self.preprocess = make_cast_preprocessor()
            else:
                self.preprocess = make_batch_preprocessor(config.data)

        self.batch_sharding = None
        if mesh is not None:
            self.batch_sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(self.tc.data_axis)
            )

    def _make_optimizer(self, learning_rate):
        # global-norm clip 1.0 (train.py:236-245) + AdamW (train.py:706-711)
        return optax.chain(
            optax.clip_by_global_norm(self.tc.grad_clip_norm),
            optax.adamw(
                learning_rate,
                weight_decay=self.tc.weight_decay,
                eps=self.tc.eps,
            ),
        )

    # ------------------------------------------------------------------
    def create_state(self, rng: jax.Array, sample_batch) -> TrainState:
        variables = self.model.init(rng, sample_batch)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def set_epoch_lr(self, state: TrainState, epoch: int) -> TrainState:
        """Per-epoch warmup-cosine factor (train.py:512,729)."""
        lr = self.tc.learning_rate * warmup_cosine_lambda(
            epoch, self.tc.warmup_epochs, self.tc.total_epochs
        )
        opt_state = state.opt_state
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return state.replace(opt_state=opt_state._replace(hyperparams=hp))

    # ------------------------------------------------------------------
    def _embed(self, variables, images):
        """Retrieval embedding of renders or tiles; head or flatten (see
        ``use_embed_head``). ``variables`` must be the live params so head
        gradients flow when called inside a loss."""
        if self.use_embed_head:
            return self.model.embed(variables, images)
        return self.embed_fn(images)

    def _forward_losses(self, variables, out, batch):
        parts = {}
        total = 0.0
        if self.image_rendering:
            parts["render"] = self.render_fn(out, batch["map"])
            total = total + parts["render"]
        if self.image_retrieval:
            cam = self._embed(variables, out)
            map_ = self._embed(variables, batch["map"])
            parts["retrieval"] = self.retrieval_fn(cam, map_)
            total = total + parts["retrieval"]
        return total, parts

    def _step_with(self, state: TrainState, batch, rng, losses_fn):
        """One optimizer step with a caller-chosen loss.

        ``losses_fn(variables, out, batch) -> (total, parts)`` plugs into the
        SAME rng-stream / BatchNorm-update / clip+AdamW mechanics as the
        production step — scripts that need a different retrieval loss (e.g.
        the recall demo's memory-bank ``contrastive_loss_vs_db``) inject it
        here instead of cloning the step body.
        """
        # per-step dropout stream derived INSIDE the jitted step: callers pass
        # one epoch-level key and the step counter decorrelates it, so the
        # host never issues an eager `random.split` per step (on
        # remote-attached TPUs every eager op is a blocking RPC)
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, updates = self.model.apply(
                variables,
                batch["camera"],
                batch["vehicle_pose"],
                batch["vehicle_type"],
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"] if state.batch_stats else [],
            )
            total, parts = losses_fn(variables, out, batch)
            return total, (parts, updates, out)

        (total, (parts, updates, render)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grad_norm = optax.global_norm(grads)
        updates_tx, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates_tx)
        new_stats = (
            updates.get("batch_stats", state.batch_stats)
            if state.batch_stats
            else state.batch_stats
        )
        new_state = TrainState(
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            step=state.step + 1,
        )
        metrics = {"train_batch_loss": total, "camera_encoder_grad_norm": grad_norm}
        for k, v in parts.items():
            metrics[f"train_batch_{k}_loss"] = v
        return new_state, metrics, render

    def _train_step_impl(self, state: TrainState, batch, rng):
        return self._step_with(state, batch, rng, self._forward_losses)

    def _train_step_multi_impl(self, state: TrainState, batches, rng):
        """Run k training steps in ONE dispatch over a stacked (k, B, ...)
        super-batch (``TrainConfig.steps_per_dispatch``).

        ``lax.scan`` over the leading axis amortizes the per-step host
        dispatch (one RPC + one input copy per k steps instead of per step —
        the dominant Trainer-loop overhead on remote/tunnel-attached TPUs;
        see TRAINER_OVERLAP.json). Numerically identical to k sequential
        ``_train_step`` calls: each sub-step folds ``state.step`` into the
        epoch rng exactly like the single-step path, and the optimizer/BN
        state threads through the scan carry. Metrics come back stacked
        (k,); the aerial render is returned for the LAST sub-step only (the
        only one the logging cadence can want).
        """
        last = jax.tree_util.tree_map(lambda x: x[-1], batches)
        head = jax.tree_util.tree_map(lambda x: x[:-1], batches)

        def body(st, batch):
            st, metrics, _render = self._train_step_impl(st, batch, rng)
            return st, metrics

        state, head_metrics = jax.lax.scan(body, state, head)
        state, last_metrics, render = self._train_step_impl(state, last, rng)
        metrics = jax.tree_util.tree_map(
            lambda h, l: jnp.concatenate([h, l[None]]), head_metrics, last_metrics
        )
        return state, metrics, render

    def _eval_step_impl(self, state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = self.model.apply(
            variables,
            batch["camera"],
            batch["vehicle_pose"],
            batch["vehicle_type"],
            train=False,
        )
        total, parts = self._forward_losses(variables, out, batch)
        metrics = {"val_batch_loss": total}
        for k, v in parts.items():
            metrics[f"val_batch_{k}_loss"] = v
        cam_emb = self._embed(variables, out)
        map_emb = self._embed(variables, batch["map"])
        return metrics, cam_emb, map_emb, out

    # ------------------------------------------------------------------
    def _run_epoch(
        self,
        state: TrainState,
        epoch: int,
        fold: int,
        train_loader: DataLoader,
        val_loader: DataLoader,
        apply_validation: bool,
        rng: jax.Array,
    ) -> Tuple[TrainState, Dict[str, float]]:
        self.logger.info(
            "Training epoch %d, fold %d, train batches: %d, val batches: %d",
            epoch, fold, len(train_loader), len(val_loader),
        )
        train_loader.set_epoch(epoch)
        state = self.set_epoch_lr(state, epoch)

        epoch_metrics: Dict[str, float] = {}
        n_train = max(len(train_loader), 1)
        # loss accumulates ON DEVICE; host sync (float()) happens only at the
        # log_every_steps cadence so dispatch stays ahead of the chip and the
        # prefetch window keeps its overlap (reference logs every batch,
        # train.py:277-309 — set log_every_steps=1 for exact parity)
        tr_losses: list = []  # device scalars; summed once at epoch end
        log_every = max(self.tc.log_every_steps, 1)
        # one eager split per EPOCH; the jitted step folds state.step into
        # this key itself, so the loop body issues exactly one dispatch per
        # step (no eager RPCs on remote-attached TPUs)
        rng, epoch_rng = jax.random.split(rng)
        # k>1: stack k host batches per dispatch and lax.scan the step over
        # them — one RPC + one input copy per k steps (tc.steps_per_dispatch;
        # logging/image cadences then count dispatches, not steps)
        k_disp = max(self.tc.steps_per_dispatch, 1)
        batch_it = iter(train_loader)
        sharding, preprocess = self.batch_sharding, self.preprocess
        if k_disp > 1:
            batch_it = group_batches(batch_it, k_disp)
            if sharding is not None:  # batch axis moves to position 1
                sharding = jax.sharding.NamedSharding(
                    sharding.mesh,
                    jax.sharding.PartitionSpec(None, self.tc.data_axis),
                )
            if preprocess is not None:  # map the per-batch pipeline over k
                preprocess = jax.vmap(preprocess)
        for idx, batch in enumerate(
            device_prefetch(batch_it, sharding=sharding, preprocess=preprocess)
        ):
            if k_disp > 1:
                state, metrics, render = self._train_step_multi(
                    state, batch, epoch_rng
                )
                # metrics leaves are (group,): sum losses for the epoch mean,
                # log the last sub-step's values at the cadence below
                tr_losses.append(metrics["train_batch_loss"].sum())
                metrics = jax.tree_util.tree_map(lambda v: v[-1], metrics)
                last_map, last_cam = batch["map"][-1], batch["camera"][-1]
            else:
                state, metrics, render = self._train_step(state, batch, epoch_rng)
                tr_losses.append(metrics["train_batch_loss"])
                last_map, last_cam = batch["map"], batch["camera"]
            want_img = (
                self.image_rendering
                and self.metrics.run is not None
                and idx % max(self.tc.wandb_log_img_freq_train, 1) == 0
            )
            if idx % log_every == 0 or want_img:
                m = {k: float(v) for k, v in metrics.items()}
                self.metrics.log_batch(
                    idx,
                    n_train,
                    m["train_batch_loss"],
                    m.get("train_batch_render_loss"),
                    m.get("train_batch_retrieval_loss"),
                    m.get("camera_encoder_grad_norm"),
                )
                lr = float(state.opt_state.hyperparams["learning_rate"])
                self.metrics.log({**m, "learning_rate": lr, "epoch": epoch})
            # composite train image at the configured cadence
            # (train.py:283-294; only when wandb is active)
            if want_img:
                # reuse the render computed inside the jitted train step — no
                # second forward pass, but note it runs train=True (dropout /
                # drop-path active), unlike the reference's separate
                # deterministic logging forward; at the default rates (0.0)
                # the images are identical
                img = self.get_log_image(
                    np.asarray(render[0]),
                    np.asarray(last_map[0]),
                    np.asarray(last_cam[0, -1]),
                )
                try:
                    import wandb

                    self.metrics.log({
                        "train_image": wandb.Image(img, caption=f"train epoch {epoch}"),
                        "epoch": epoch,
                    })
                except Exception:  # pragma: no cover - wandb optional
                    pass
        epoch_metrics["train_epoch_loss"] = (
            float(jnp.stack(tr_losses).sum()) / n_train if tr_losses else 0.0
        )

        run_val = apply_validation and (epoch + 1) % self.tc.validation_frequency == 0
        if run_val:
            val_loss = 0.0
            cam_embs: List[np.ndarray] = []
            map_embs: List[np.ndarray] = []
            n_val = max(len(val_loader), 1)
            for idx, batch in enumerate(
                device_prefetch(iter(val_loader), sharding=self.batch_sharding,
                                preprocess=self.preprocess)
            ):
                metrics, cam_e, map_e, val_out = self._eval_step(state, batch)
                val_loss += float(metrics["val_batch_loss"]) / n_val
                if self.image_retrieval:
                    cam_embs.append(np.asarray(cam_e))
                    map_embs.append(np.asarray(map_e))
                self.metrics.log(
                    {**{k: float(v) for k, v in metrics.items()}, "epoch": epoch}
                )
                # composite val image at the configured cadence
                # (WANDB_LOG_IMG_FERQ_VAL, train.py:424-468)
                if (
                    self.image_rendering
                    and self.metrics.run is not None
                    and idx % max(self.tc.wandb_log_img_freq_val, 1) == 0
                ):
                    img = self.get_log_image(
                        np.asarray(val_out[0]),
                        np.asarray(batch["map"][0]),
                        np.asarray(batch["camera"][0, -1]),
                    )
                    try:
                        import wandb

                        self.metrics.log({
                            "val_image": wandb.Image(
                                img, caption=f"val epoch {epoch}"
                            ),
                            "epoch": epoch,
                        })
                    except Exception:  # pragma: no cover - wandb optional
                        pass
            epoch_metrics["val_epoch_loss"] = val_loss

            if self.image_retrieval and cam_embs:
                cams = _l2n(np.concatenate(cam_embs))
                maps = _l2n(np.concatenate(map_embs))
                r1, r5, r10 = (float(r) for r in self._recall(cams, maps))
                epoch_metrics.update(
                    {"val_R@1": r1, "val_R@5": r5, "val_R@10": r10}
                )
                self.metrics.log(
                    {"val_R@1": r1, "val_R@5": r5, "val_R@10": r10, "epoch": epoch}
                )

            # best-checkpoint policy (train.py:470-505)
            is_best = False
            if self.tc.validation_metric == "LOSS":
                if val_loss < self.best_epoch_loss:
                    self.best_epoch_loss = val_loss
                    self.best_epoch = epoch
                    is_best = True
            elif self.tc.validation_metric == "RECALL":
                r5 = epoch_metrics.get("val_R@5", 0.0)
                if r5 > self.best_epoch_recall:
                    self.best_epoch_recall = r5
                    self.best_epoch = epoch
                    is_best = True
            if self.tc.save_ckpt and jax.process_index() == 0:
                self.save_checkpoint(state, epoch, best=is_best)
            if is_best and self.tc.save_val_results:
                self.save_val_images(state, val_loader, epoch)  # train.py:479-483

        self.logger.info(
            "Summary of epoch %d/%d - training loss: %.8f%s",
            epoch,
            self.tc.total_epochs,
            epoch_metrics["train_epoch_loss"],
            (
                f",  validation loss: {epoch_metrics.get('val_epoch_loss', float('nan')):.8f}"
                if run_val
                else ""
            ),
        )
        return state, epoch_metrics

    # ------------------------------------------------------------------
    def train(
        self,
        state: TrainState,
        apply_validation: Optional[bool] = None,
        rng: Optional[jax.Array] = None,
        max_epochs: Optional[int] = None,
    ) -> TrainState:
        """K-fold outer loop (train.py:656-697)."""
        from sklearn.model_selection import KFold

        apply_validation = (
            self.tc.apply_validation if apply_validation is None else apply_validation
        )
        rng = rng if rng is not None else jax.random.PRNGKey(self.tc.seed)
        total = max_epochs or self.tc.total_epochs
        num_epoch = 0
        while num_epoch + 1 < total:
            kfold = KFold(
                n_splits=self.tc.k_fold, shuffle=True, random_state=self.tc.seed
            )
            for fold, (train_idx, val_idx) in enumerate(
                kfold.split(np.arange(len(self.dataset)))
            ):
                # multi-host: every process loads 1/process_count of each
                # global batch (strided shard of the shared shuffle) and
                # device_prefetch assembles the global array — the GSPMD
                # equivalent of DistributedSampler + DDP (train.py:667-689).
                pc = jax.process_count()
                shard = (jax.process_index(), pc) if pc > 1 else None
                if pc > 1 and (self.tc.batch_size % pc or self.tc.batch_size < pc):
                    raise ValueError(
                        f"batch_size={self.tc.batch_size} must be a positive "
                        f"multiple of process_count={pc} (each process feeds "
                        f"batch_size/process_count rows of the global batch)"
                    )
                per_proc_bs = self.tc.batch_size // pc if pc > 1 else self.tc.batch_size
                train_loader = DataLoader(
                    self.dataset,
                    per_proc_bs,
                    shuffle=True,
                    num_workers=self.tc.num_workers,
                    drop_last=True,
                    seed=self.tc.seed,
                    sampler=train_idx,
                    process_shard=shard,
                )
                val_loader = DataLoader(
                    self.dataset,
                    per_proc_bs,
                    shuffle=False,
                    num_workers=self.tc.num_workers,
                    drop_last=True,
                    sampler=val_idx,
                    process_shard=shard,
                )
                for _ in range(self.tc.epoch_per_fold):
                    rng, epoch_rng = jax.random.split(rng)
                    state, _ = self._run_epoch(
                        state,
                        num_epoch,
                        fold,
                        train_loader,
                        val_loader,
                        apply_validation,
                        epoch_rng,
                    )
                    num_epoch += 1
                    if num_epoch + 1 >= total:
                        return state
        return state

    # ------------------------------------------------------------------
    def save_checkpoint(self, state: TrainState, epoch: int, best: bool = False):
        path = ckpt.save_model(
            self.work_dir,
            {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
            },
            epoch,
            best=best,
        )
        self.logger.info("model saved at epoch %d -> %s", epoch, path)

    def save_val_images(self, state: TrainState, val_loader, epoch: int) -> None:
        """Dump best-epoch validation renders as PNGs
        (``save_val_images``, train.py:609-637)."""
        from PIL import Image

        out_dir = Path(self.work_dir) / "best_epoch_val"
        out_dir.mkdir(parents=True, exist_ok=True)
        for batch in device_prefetch(iter(val_loader), sharding=self.batch_sharding,
                                preprocess=self.preprocess):
            _, _, _, out = self._eval_step(state, batch)
            for render, ts in zip(np.asarray(out), np.asarray(batch["timestamp"])):
                img = (np.clip(render, 0, 1) * 255).astype(np.uint8)
                Image.fromarray(img).save(out_dir / f"{int(ts)}.png")
        self.logger.info("val images saved at epoch %d -> %s", epoch, out_dir)

    @staticmethod
    def get_log_image(render: np.ndarray, map_tile: np.ndarray,
                      cameras: np.ndarray) -> np.ndarray:
        """Composite (cameras row above [map | zeros | render]) mirroring
        ``get_log_image`` (train.py:639-654). All inputs NHWC float."""
        def norm(x):
            lo, hi = x.min(), x.max()
            return (x - lo) / max(hi - lo, 1e-8)

        h, w = render.shape[:2]
        bottom = np.concatenate(
            [norm(map_tile), np.zeros_like(map_tile), np.clip(render, 0, 1)],
            axis=1,
        )
        cams = norm(cameras)  # (V, Hv, Wv, 3) -> one wide row
        wide = np.concatenate(list(cams), axis=1)
        from PIL import Image

        wide = np.asarray(
            Image.fromarray((wide * 255).astype(np.uint8)).resize(
                (bottom.shape[1], h), Image.BILINEAR
            ),
            dtype=np.float32,
        ) / 255.0
        return np.concatenate([wide, bottom], axis=0)

    def restore_checkpoint(self, state: TrainState, path: str) -> TrainState:
        restored = ckpt.restore_model(
            path,
            {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
            },
        )
        # the per-step dropout stream is fold_in(rng, state.step): recover the
        # step counter from the optimizer's update count (saved inside
        # opt_state) so a resumed run continues the stream instead of
        # replaying it from 0. InjectStatefulHyperparamsState.count increments
        # once per applied update == steps taken.
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jnp.asarray(restored["opt_state"].count),
        )


def _l2n(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

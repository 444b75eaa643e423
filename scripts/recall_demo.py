"""Recall@1 learning demonstration (north-star accuracy clause).

Trains BEVRender with MSE_CONTRASTIVE on the geo-consistent synthetic trace
(SyntheticGeoDataset: camera views and aerial tiles carved from ONE world
image) until pose-retrieval recall@1 — the reference's metric, computed with
the rank semantics of train.py:551-572 — is well above chance, and records
the full curve (steps, losses, R@1/5/10 on both the train batch and a
fresh-noise query set) to ``RECALL_r{N}.json``.

Run on the TPU (a few thousand steps are minutes):
    python scripts/recall_demo.py --size flagship --pose-mode bev \
        --pose-swap --n 32 --batch 8 --chunk 50 --out RECALL_r04.json
CPU smoke (tiny, few steps):
    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/recall_demo.py \
        --size tiny --max-steps 200 --chunk 50 --out /tmp/recall_smoke.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

from bevrender_tpu.utils import enable_compilation_cache
from bevrender_tpu.config import Config, tiny_model_config
from bevrender_tpu.data.dataset import SyntheticGeoDataset
from bevrender_tpu.data.prefetch import collate
from bevrender_tpu.losses.recall import recall_at_k
from bevrender_tpu.models.bevrender import BEVRenderModel
from bevrender_tpu.training.trainer import Trainer


def make_config(size: str, n: int) -> Config:
    cfg = Config()
    if size == "tiny":
        cfg.model = tiny_model_config(drop_path_rate=0.0)
    elif size == "mid":
        # mid-size: 4 stages, BEV 16x16 at width 32, 4 heads, 64x64 views —
        # big enough that retrieval rides the full encoder/decoder stack,
        # small enough to train thousands of steps in minutes on one chip
        cfg.model = tiny_model_config(
            bev_shapes=(16,) * 5,
            embed_dims=(32,) * 5,
            n_stages=4,
            depths=(2,) * 4,
            n_heads=(4,) * 4,
            strides=(2,) * 4,
            n_groups=(1, 2, 2, 1),
            kernel_sizes=(5,) * 4,
            img_height=64,
            img_width=64,
            ori_img_height=64,
            ori_img_width=64,
            bev_depth_dim=4,
            drop_path_rate=0.0,
        )
    elif size == "flagship":
        # the EXACT headline-bench config (bench.py / config.flagship_config:
        # 7 stages, uniform BEV 28x28 at width 64, G up to 8, 3 views of
        # 224x224, bf16 compute like the headline) — ties the throughput
        # headline and the north-star accuracy clause to ONE configuration
        from bevrender_tpu.config import flagship_config

        cfg = flagship_config()
        cfg.model.dtype = "bfloat16"
        # stochastic depth is a big-data regularizer; on the n<=32-sample
        # synthetic trace it only injects residual-branch noise (every other
        # size here zeroes it too — flagship r4 runs plateaued at
        # render MSE ~0.009 with the default 0.2 until this was zeroed)
        cfg.model.drop_path_rate = 0.0
    elif size == "pyramid":
        # the reference's PUBLISHED default architecture
        # (model/encoder.py:23-38: 56-28-14-7-14-28-56 U-shape, widths 64-512)
        # — learning evidence for the published config, not just timing
        # (VERDICT r3 item 6). Full reference defaults = Config() as in
        # scripts/pyramid_bench.py.
        cfg = Config()
        cfg.model.dtype = "bfloat16"
        cfg.model.drop_path_rate = 0.0
    else:
        raise ValueError(size)
    cfg.data.window_num_imgs = 1
    cfg.train.batch_size = n
    cfg.train.loss_type = "MSE_CONTRASTIVE"
    cfg.train.learning_rate = 3e-3
    cfg.train.ckpt_dir = "/tmp/recall_demo_ckpt"
    cfg.train.use_wandb = False
    return cfg


def _l2n(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", choices=("tiny", "mid", "flagship", "pyramid"),
                    default="mid")
    ap.add_argument("--n", type=int, default=16, help="trace length / DB size")
    ap.add_argument("--batch", type=int, default=0,
                    help="device minibatch size for training/eval. 0 = full "
                         "batch (= --n). The flagship train step OOMs above "
                         "B~8 on one v5e chip, so --batch 8 trains on "
                         "cycling minibatches while recall is still "
                         "evaluated against ALL --n database tiles")
    ap.add_argument("--max-steps", type=int, default=4000)
    ap.add_argument("--chunk", type=int, default=200,
                    help="steps per jitted lax.fori_loop chunk")
    ap.add_argument("--target-r1", type=float, default=60.0,
                    help="stop early once train R@1 reaches this (percent)")
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--world", type=int, default=0,
                    help="world size override; larger spreads the trace so "
                         "adjacent tiles overlap less (better-conditioned "
                         "retrieval). 0 = auto (4x the crop footprint)")
    ap.add_argument("--keep-pose", action="store_true",
                    help="alias for --pose-mode world")
    ap.add_argument("--pose-mode", choices=("zero", "world", "bev"),
                    default="zero",
                    help="pose INPUT fed to the model. The model warps "
                         "prev_bev by pose deltas in BEV pixels at EVAL only "
                         "(reference parity, encoder.py:366). 'zero' (default)"
                         " disables the warp; 'world' feeds raw world-pixel "
                         "trace poses (deltas of tens of BEV pixels resample "
                         "history into garbage: eval recall collapses while "
                         "train-mode recall is ~100% — the documented "
                         "unit-mismatch demo); 'bev' scales (x, y) by "
                         "bev_size/map_tile with heading zeroed (the crops "
                         "are axis-aligned), so the eval warp applies the "
                         "TRUE inter-frame shift and eval-mode recall is "
                         "exercised with active history alignment")
    ap.add_argument("--pose-sign", type=float, default=1.0,
                    help="sign convention probe for --pose-mode bev")
    ap.add_argument("--pose-swap", action="store_true",
                    help="swap (row, col) -> (x, y) order for --pose-mode bev")
    ap.add_argument("--detail", type=float, default=0.0,
                    help="mid-frequency octave weight for the synthetic "
                         "world (SyntheticGeoDataset.detail). At flagship "
                         "scale the 224px tiles cut from the base octave "
                         "alone are near-duplicates (their differences sit "
                         "below achievable render error, so retrieval has "
                         "no signal); 0.5 gives tiles the distinctiveness "
                         "real aerial imagery has")
    ap.add_argument("--db-loss", choices=("auto", "contrastive", "infonce"),
                    default="auto",
                    help="retrieval loss vs the resident DB: margin "
                         "contrastive (PML parity) or InfoNCE softmax-CE. "
                         "auto = infonce when --head > 0 (a fresh Siamese "
                         "head collapses to one embedding and the margin "
                         "loss's gradients cancel there — measured r5), "
                         "contrastive otherwise (flatten parity)")
    ap.add_argument("--head-warmup", type=int, default=200,
                    help="head-only warm-start steps (head > 0): train the "
                         "Siamese head on (tiles + sensor noise) vs tiles "
                         "with InfoNCE before joint training. Measured r5: "
                         "without it the joint system deadlocks — a fresh "
                         "head is collapsed, so the renderer gets no pose-"
                         "push through it, renders settle into the mean-"
                         "image attractor, and the head in turn never sees "
                         "distinct queries (retrieval loss pinned at log N "
                         "on BOTH the flagship and pyramid configs)")
    ap.add_argument("--head", type=int, default=0,
                    help="retrieval_embed_dim: 0 = reference-parity flatten "
                         "(3*224*224-D), >0 = train the compact Siamese conv "
                         "head (models/retrieval.py) to that dimension "
                         "jointly with the model")
    ap.add_argument("--out", default=str(ROOT / "RECALL_r05.json"))
    args = ap.parse_args()

    enable_compilation_cache()
    n = args.n
    cfg = make_config(args.size, n)
    cfg.train.learning_rate = args.lr
    cfg.model.retrieval_embed_dim = args.head
    mdl = cfg.model

    # tiles must match the render size: the full BEVImageRenderDecoder always
    # renders 224x224 (stem + enough x2 upsamples, decoder_img_render.py:50-88)
    # while the tiny/mid SimpleDecoder upsamples 2x2 -> 4x BEV
    map_tile = (224 if args.size in ("flagship", "pyramid")
                else 4 * mdl.bev_shapes[-1])
    # the dataset's trace spans [m, world - m] with m = map_tile + img_height;
    # world must be comfortably larger than 2m or every pose collapses onto
    # one point and the retrieval task is degenerate (all tiles identical)
    world = args.world or max(256, 4 * (map_tile + mdl.img_height))
    ds_kwargs = dict(
        n_items=n, num_views=mdl.num_views, window_num_imgs=1,
        img_height=mdl.img_height, img_width=mdl.img_width,
        map_tile=map_tile, world=world, noise=0.02, seed=0,
        detail=args.detail,
    )
    ds = SyntheticGeoDataset(**ds_kwargs)
    spread = float(np.ptp(ds.trace[:, :2]))
    tiles = np.stack([ds[i]["map"] for i in range(n)])
    tile_var = float(np.mean(np.var(tiles.reshape(n, -1), axis=0)))
    assert spread > map_tile / 2 and tile_var > 1e-4, (
        f"degenerate trace: pose spread {spread:.1f}px, inter-tile variance "
        f"{tile_var:.2e} — retrieval would be unlearnable by construction"
    )
    batch = collate([ds[i] for i in range(n)])
    # fresh-noise query set: same world/trace/tiles, different per-view noise
    ds_val = SyntheticGeoDataset(**ds_kwargs)
    ds_val.seed = 1  # world already built; reseeds only the per-item noise
    val_batch = collate([ds_val[i] for i in range(n)])
    mode = "world" if args.keep_pose else args.pose_mode
    if mode == "zero":
        # crops stay at their trace positions; only the POSE INPUT is zeroed
        # (see --pose-mode help: unit-consistent ego-motion for the eval warp)
        batch["vehicle_pose"][:] = 0.0
        val_batch["vehicle_pose"][:] = 0.0
    elif mode == "bev":
        # world px -> BEV px: the rendered tile (map_tile px) spans the BEV
        # grid (bev px), so 1 BEV px = map_tile/bev world px. Heading is
        # zeroed: the synthetic crops are axis-aligned, the trace heading is
        # a dummy ramp that never rotated any content.
        s = args.pose_sign * mdl.bev_shapes[-1] / map_tile
        for b in (batch, val_batch):
            xy = b["vehicle_pose"][:, :, :2] * s
            if args.pose_swap:
                xy = xy[:, :, ::-1]
            b["vehicle_pose"] = np.concatenate(
                [xy, np.zeros_like(xy[:, :, :1])], axis=-1
            ).astype(np.float32)

    mb = args.batch or n
    assert n % mb == 0, f"--n {n} must be a multiple of --batch {mb}"
    nb = n // mb
    cfg.train.batch_size = mb

    model = BEVRenderModel(cfg)
    trainer = Trainer(model, cfg, ds)
    first = {k: v[:mb] for k, v in batch.items()}
    state = trainer.create_state(jax.random.PRNGKey(0), first)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    dev_val = {k: jnp.asarray(v) for k, v in val_batch.items()}
    # training minibatches: (nb, mb, ...) stacked on device; the chunk loop
    # cycles them so every item trains while the step fits one chip's HBM.
    # STRIDE-INTERLEAVED: minibatch j = items [j, j+nb, j+2nb, ...]. With
    # consecutive-slice minibatches the contrastive negatives are adjacent
    # trace poses whose tiles nearly coincide, and the task degenerates —
    # measured: mid-size n=32 B=8 consecutive slices stays at chance for
    # 1500 steps while the same config full-batch hits 100% R@1 by 400
    assert n % mb == 0
    perm = np.arange(n).reshape(mb, nb).T.reshape(-1)
    dev_mbs = {
        k: jnp.reshape(v[jnp.asarray(perm)], (nb, mb) + v.shape[1:])
        for k, v in dev_batch.items()
    }
    # each minibatch item's row in the tile database (for DB negatives)
    dev_mbs["db_label"] = jnp.reshape(
        jnp.asarray(perm, jnp.int32), (nb, mb)
    )
    # RESIDENT full tile database: with mb < n the retrieval loss contrasts
    # each minibatch render against ALL n tiles
    # (losses.metric.contrastive_loss_vs_db — in-batch-only negatives from
    # adjacent trace poses cancel and learning stalls at chance). The RAW
    # tiles stay resident and are re-embedded inside the loss each step:
    # with the trained head (--head > 0) the database embeddings move as the
    # head trains and BOTH sides feed it gradients; on the flatten path the
    # re-embed is a reshape, free under jit.
    dev_tiles = dev_batch["map"] if mb < n else None

    if args.head > 0 and args.head_warmup > 0:
        # ---- head-only warm-start (see --head-warmup help) ----
        import optax

        from bevrender_tpu.losses.metric import infonce_loss_vs_db
        from bevrender_tpu.models.retrieval import RetrievalHead

        head_mod = RetrievalHead(
            embed_dim=args.head, widths=tuple(mdl.retrieval_head_widths)
        )
        hp = state.params["retrieval_head"]
        wtx = optax.adam(1e-3)
        wopt = wtx.init(hp)
        tiles_f = dev_batch["map"]
        labels_all = jnp.arange(n, dtype=jnp.int32)

        @jax.jit
        def wstep(hp, wopt, key):
            def L(hp):
                noisy = tiles_f + 0.05 * jax.random.normal(
                    key, tiles_f.shape, tiles_f.dtype
                )
                q = head_mod.apply({"params": hp}, noisy)
                t = head_mod.apply({"params": hp}, tiles_f)
                return infonce_loss_vs_db(q, t, labels_all)

            l, g = jax.value_and_grad(L)(hp)
            u, wopt = wtx.update(g, wopt, hp)
            return optax.apply_updates(hp, u), wopt, l

        wkey = jax.random.PRNGKey(123)
        wl = None
        for i in range(args.head_warmup):
            hp, wopt, wl = wstep(hp, wopt, jax.random.fold_in(wkey, i))
        state = state.replace(
            params=dict(state.params, retrieval_head=hp)
        )
        emb = head_mod.apply({"params": hp}, tiles_f)
        noisy_emb = head_mod.apply(
            {"params": hp},
            tiles_f + 0.05 * jax.random.normal(wkey, tiles_f.shape,
                                               tiles_f.dtype),
        )
        warm_r1 = float(jnp.mean(
            (jnp.argmax((noisy_emb @ emb.T).astype(jnp.float32), -1)
             == labels_all)
        ) * 100.0)
        print(f"head warm-start: {args.head_warmup} steps, final InfoNCE "
              f"{float(wl):.4f}, noisy-tile self-retrieval R@1 "
              f"{warm_r1:.1f}% (chance {100.0 / n:.1f}%)", flush=True)

    def recalls(state, b):
        # eval in --batch-sized chunks (the flagship forward at B=n would
        # OOM); embeddings concatenate on host, recall runs over ALL n tiles.
        # With a trained head (--head > 0) the FLATTEN recall is computed in
        # the same pass from the raw renders/tiles — one run yields the
        # head-vs-flatten comparison on identical weights.
        cams, maps, fcams, fmaps, losses = [], [], [], [], []
        for j in range(nb):
            sub = {k: v[j * mb : (j + 1) * mb] for k, v in b.items()}
            metrics, cam_e, map_e, out = trainer._eval_step(state, sub)
            cams.append(np.asarray(cam_e))
            maps.append(np.asarray(map_e))
            if args.head > 0:
                fcams.append(np.asarray(out).reshape(out.shape[0], -1))
                fmaps.append(
                    np.asarray(sub["map"]).reshape(sub["map"].shape[0], -1)
                )
            losses.append(float(metrics["val_batch_loss"]))
        r = recall_at_k(
            jnp.asarray(_l2n(np.concatenate(cams))),
            jnp.asarray(_l2n(np.concatenate(maps))),
            (1, 5, 10),
        )
        rf = None
        if args.head > 0:
            rf = [float(x) for x in recall_at_k(
                jnp.asarray(_l2n(np.concatenate(fcams))),
                jnp.asarray(_l2n(np.concatenate(fmaps))),
                (1, 5, 10),
            )]
        return [float(x) for x in r], rf, float(np.mean(losses))

    from bevrender_tpu.losses.metric import (
        contrastive_loss_vs_db,
        infonce_loss_vs_db,
    )

    db_loss_kind = args.db_loss
    if db_loss_kind == "auto":
        db_loss_kind = "infonce" if args.head > 0 else "contrastive"
    db_loss_fn = (
        infonce_loss_vs_db if db_loss_kind == "infonce"
        else contrastive_loss_vs_db
    )

    def db_losses(variables, out, b):
        """Loss parts for ``trainer._step_with``: rendering as in production,
        retrieval contrasted against the resident full tile database instead
        of in-batch pairs. The step mechanics (rng stream, BN update,
        AdamW+clip) are the trainer's own — not cloned here.

        With a trained head the FLATTEN contrastive term stays in the sum:
        it pushes render PIXELS toward the own tile and away from the others
        — the pose-specificity driver that broke the r4 flagship off the
        mean-image attractor — while the head term trains the compact
        embedding on the increasingly distinct renders."""
        parts = {}
        total = 0.0
        if trainer.image_rendering:
            parts["render"] = trainer.render_fn(out, b["map"])
            total = total + parts["render"]
        if trainer.image_retrieval:
            parts["retrieval"] = db_loss_fn(
                trainer._embed(variables, out),
                trainer._embed(variables, dev_tiles),
                b["db_label"],
            )
            total = total + parts["retrieval"]
            if args.head > 0:
                flat = lambda x: x.reshape(x.shape[0], -1)
                parts["retrieval_flat"] = contrastive_loss_vs_db(
                    flat(out), flat(dev_tiles), b["db_label"]
                )
                total = total + parts["retrieval_flat"]
        return total, parts

    @jax.jit
    def train_chunk(state, batches, rng, n_steps):
        zero = {
            "train_batch_loss": jnp.float32(0.0),
            "train_batch_render_loss": jnp.float32(0.0),
            "train_batch_retrieval_loss": jnp.float32(0.0),
            "camera_encoder_grad_norm": jnp.float32(0.0),
        }
        if args.head > 0 and dev_tiles is not None:
            zero["train_batch_retrieval_flat_loss"] = jnp.float32(0.0)

        def body(i, carry):
            st, _ = carry
            b = {
                k: jax.lax.dynamic_index_in_dim(
                    v, i % nb, axis=0, keepdims=False
                )
                for k, v in batches.items()
            }
            if dev_tiles is not None:
                st, metrics, _ = trainer._step_with(
                    st, b, jax.random.fold_in(rng, i), db_losses
                )
            else:
                b.pop("db_label", None)
                st, metrics, _ = trainer._train_step_impl(
                    st, b, jax.random.fold_in(rng, i)
                )
            return (st, {k: metrics[k].astype(jnp.float32) for k in zero})
        return jax.lax.fori_loop(0, n_steps, body, (state, zero))

    chance = 100.0 / n
    curve = []

    def record(steps, m, t0):
        (r1, r5, r10), rf, _ = recalls(state, dev_batch)
        (v1, v5, v10), vf, vloss = recalls(state, dev_val)
        row = {
            "steps": steps,
            "train_loss": m["train_batch_loss"],
            "render_loss": m["train_batch_render_loss"],
            "retrieval_loss": m["train_batch_retrieval_loss"],
            "grad_norm": m["camera_encoder_grad_norm"],
            "val_loss": vloss,
            "train_R@1": r1, "train_R@5": r5, "train_R@10": r10,
            "val_R@1": v1, "val_R@5": v5, "val_R@10": v10,
            "elapsed_s": round(time.perf_counter() - t0, 1),
        }
        if vf is not None:
            # flatten-embedding recall on the SAME weights (head-vs-flatten)
            row["train_flat_R@1"], _, _ = rf
            row["val_flat_R@1"], row["val_flat_R@5"], _ = vf
            row["retrieval_flat_loss"] = m.get(
                "train_batch_retrieval_flat_loss"
            )
        curve.append(row)
        fmt = lambda v, p: f"{v:.{p}f}" if v is not None else "-"
        flat = (f" flatR@1={row['val_flat_R@1']:.1f}%"
                if "val_flat_R@1" in row else "")
        print(
            f"steps {steps}: loss={fmt(row['train_loss'], 4)} "
            f"(render {fmt(row['render_loss'], 4)} + retr "
            f"{fmt(row['retrieval_loss'], 4)}, |g|={fmt(row['grad_norm'], 2)}) "
            f"train R@1={r1:.1f}% val R@1={v1:.1f}%{flat} "
            f"(chance {chance:.1f}%) [{row['elapsed_s']:.0f}s]", flush=True,
        )
        return r1, v1

    t0 = time.perf_counter()
    nanm = {k: None for k in (
        "train_batch_loss", "train_batch_render_loss",
        "train_batch_retrieval_loss", "camera_encoder_grad_norm")}
    record(0, nanm, t0)
    rng = jax.random.PRNGKey(1)
    steps = 0
    while steps < args.max_steps:
        state, m = train_chunk(
            state, dev_mbs, jax.random.fold_in(rng, steps), jnp.int32(args.chunk)
        )
        steps += args.chunk
        r1, v1 = record(steps, {k: float(v) for k, v in m.items()}, t0)
        if r1 >= args.target_r1 and v1 >= args.target_r1:
            break

    final = curve[-1]
    out = {
        "metric": "pose-retrieval recall@K on SyntheticGeoDataset "
                  "(rank semantics of reference train.py:551-572)",
        "size": args.size,
        "pose_mode": mode,
        "n_database_tiles": n,
        "device_batch": mb,
        "world_detail": args.detail,
        "world_px": world,
        "map_tile_px": map_tile,
        "retrieval_embed_dim": args.head,
        "learning_rate": args.lr,
        "pose_swap": bool(args.pose_swap),
        "pose_sign": args.pose_sign,
        "max_steps": args.max_steps,
        "chunk": args.chunk,
        "drop_path_rate": cfg.model.drop_path_rate,
        "loss": (f"{db_loss_kind}_vs_db" if mb < n
                 else "in_batch_contrastive"),
        "val_independence": "same world/trace/tiles, fresh per-view sensor "
                            "noise (seed 1 vs 0) — train_R and val_R can "
                            "legitimately coincide when ranking is noise-"
                            "robust",
        "chance_pct": chance,
        "bar_5x_chance_pct": 5 * chance,
        "final": final,
        "passes_5x_chance": bool(
            final["train_R@1"] >= 5 * chance and final["val_R@1"] >= 5 * chance
        ),
        "device": str(jax.devices()[0].platform),
        "curve": curve,
    }
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}: final train R@1={final['train_R@1']:.1f}% "
          f"val R@1={final['val_R@1']:.1f}% vs 5x-chance bar {5*chance:.1f}% "
          f"-> passes={out['passes_5x_chance']}", flush=True)
    return 0 if out["passes_5x_chance"] else 1


if __name__ == "__main__":
    sys.exit(main())

"""Registration at production database scale (VERDICT r3 item 5).

The use case (reference README.md:1, train.py:551-572) is matching a
rendered aerial view against a geo-registered map DATABASE — thousands of
tiles, not the <=64 every earlier artifact used. This bench stresses the
resident (N, D) matmul design at 1k..16k tiles on the real chip:

  * ``match`` query latency (top-k over the database) vs N, at the flagship
    embedding dim D = 3*224*224 = 150528 — the matmul the MXU actually runs;
  * end-to-end ``register`` latency (render + embed + match) at B=4;
  * database HBM residency (bf16 vs f32);
  * sharded-matcher exactness vs the single-device matcher at 16k tiles on
    the 8-device CPU mesh (``--mode exact``; run separately so the chip
    numbers above are unpolluted).

Usage:
  python scripts/register_scale_bench.py --mode latency   # on the TPU
  python scripts/register_scale_bench.py --mode exact     # CPU mesh
  python scripts/register_scale_bench.py --mode merge     # combine JSONs
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

OUT = ROOT / "REGISTER_SCALE_BENCH.json"
PART_LAT = Path("/tmp/register_scale_latency.json")
PART_EXACT = Path("/tmp/register_scale_exact.json")

DB_SIZES = (1024, 4096, 8192, 16384)
D_FLAGSHIP = 3 * 224 * 224  # render embedding dim (224x224 RGB aerial view)


def _synth_db(n: int, d: int, dtype, seed: int = 0):
    """Unit-norm synthetic embedding database built on device in chunks.

    Preallocates the (n, d) buffer once and fills it with DONATED in-place
    dynamic_update_slice calls: a concatenate of chunks transiently doubles
    residency (inputs + output), which OOMs at 16k x 150k bf16 (4.9 GB
    database, 9.9 GB transient) on a 16 GB chip."""
    import functools

    import jax
    import jax.numpy as jnp

    @jax.jit
    def chunk(key):
        e = jax.random.normal(key, (1024, d), jnp.float32)
        e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
        return e.astype(dtype)

    @functools.partial(jax.jit, donate_argnums=0, static_argnums=2)
    def fill(db, c, i):
        return jax.lax.dynamic_update_slice(db, c, (i * 1024, 0))

    db = jnp.zeros((n, d), dtype)
    for i, k in enumerate(jax.random.split(jax.random.PRNGKey(seed), n // 1024)):
        db = fill(db, chunk(k), i)
    return db


def mode_latency() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bevrender_tpu.config import flagship_config
    from bevrender_tpu.data.dataset import SyntheticDataset
    from bevrender_tpu.inference.register import RegistrationPipeline
    from bevrender_tpu.utils.timing import device_bench

    cfg = flagship_config()
    cfg.model.dtype = "bfloat16"
    cfg.data.window_num_imgs = 1
    B = 4
    ds = SyntheticDataset(
        n_items=B, num_views=cfg.model.num_views, window_num_imgs=1,
        img_height=cfg.model.img_height, img_width=cfg.model.img_width,
        map_tile=224,
    )
    batch = {k: np.stack([ds[i][k] for i in range(B)]) for k in ds[0]}
    from bevrender_tpu.models.bevrender import BEVRenderModel

    model = BEVRenderModel(cfg, mode="inference")
    variables = model.init(jax.random.PRNGKey(0), batch)
    pipe = RegistrationPipeline(cfg, variables)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}

    q = jax.random.normal(jax.random.PRNGKey(7), (B, D_FLAGSHIP), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    rows = []
    for n in DB_SIZES:
        row = {"n_tiles": n}
        for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
            if name == "f32" and n * D_FLAGSHIP * 4 > 6e9:
                row[f"db_{name}"] = {
                    "skipped": "database alone would exceed HBM headroom"
                }
                continue
            db = _synth_db(n, D_FLAGSHIP, dt)
            db_bytes = n * D_FLAGSHIP * db.dtype.itemsize
            match_ms = device_bench(
                lambda qq, dd: pipe._match(qq, dd, 10), q, db, target_s=1.0
            )
            row[f"db_{name}"] = {
                "db_gb": round(db_bytes / 1e9, 3),
                "match_ms_b4": round(match_ms, 3),
                "match_gbps": round(db_bytes / (match_ms / 1e3) / 1e9, 1),
            }
            del db
        rows.append(row)
        print(json.dumps(row), flush=True)

    # ---- compact head-embedding database (retrieval_embed_dim=256): the
    # same 16k tiles cost 16 MB f32 instead of 4.9 GB bf16 flatten ----
    D_HEAD = 256
    qh = jax.random.normal(jax.random.PRNGKey(8), (B, D_HEAD), jnp.float32)
    qh = qh / jnp.linalg.norm(qh, axis=-1, keepdims=True)
    head_rows = []
    for n in DB_SIZES:
        db = _synth_db(n, D_HEAD, jnp.float32)
        ms = device_bench(
            lambda qq, dd: pipe._match(qq, dd, 10), qh, db, target_s=1.0
        )
        head_rows.append({
            "n_tiles": n,
            "db_mb": round(n * D_HEAD * 4 / 1e6, 2),
            "match_ms_b4": round(ms, 4),
        })
        print(json.dumps(head_rows[-1]), flush=True)

    def e2e(pipe_, db, label):
        """One fused dispatch (render->embed->match, round-5) measured three
        ways so the r4 'unexplained 3x wall-clock' is attributed: device
        time of the fused program, wall-clock of the dispatch loop, and the
        residual = host dispatch + tunnel RPC."""
        pipe_._tile_db = db
        pipe_.register(dev_batch, top_k=10)  # compile
        dev_ms = device_bench(
            lambda c: pipe_._register_fused(
                pipe_.variables, c, dev_batch["vehicle_pose"],
                dev_batch["vehicle_type"], pipe_._tile_db, 10,
            ),
            dev_batch["camera"], target_s=1.0,
        )
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            _, idx, _ = pipe_.register(dev_batch, top_k=10)
            np.asarray(idx)
        wall_ms = (time.perf_counter() - t0) / reps * 1e3
        return {
            "db": label,
            "device_ms": round(dev_ms, 2),
            "wall_ms": round(wall_ms, 2),
            "dispatch_overhead_ms": round(wall_ms - dev_ms, 2),
            "fps_wall": round(B / (wall_ms / 1e3), 2),
            "n_dispatches_per_register": 1,
        }

    e2e_flat = e2e(pipe, _synth_db(DB_SIZES[-1], D_FLAGSHIP, jnp.bfloat16),
                   "16k x 150528 bf16 flatten")
    print(json.dumps(e2e_flat), flush=True)
    pipe._tile_db = None

    # head-mode pipeline: same render, compact trained-head embedding
    cfg_h = flagship_config()
    cfg_h.model.dtype = "bfloat16"
    cfg_h.data.window_num_imgs = 1
    cfg_h.model.retrieval_embed_dim = D_HEAD
    model_h = BEVRenderModel(cfg_h, mode="inference")
    variables_h = model_h.init(jax.random.PRNGKey(0), batch)
    pipe_h = RegistrationPipeline(cfg_h, variables_h)
    e2e_head = e2e(pipe_h, _synth_db(DB_SIZES[-1], D_HEAD, jnp.float32),
                   "16k x 256 f32 head")
    print(json.dumps(e2e_head), flush=True)

    out = {
        "config": (
            f"flagship uniform-28 bf16 render, B={B}, D={D_FLAGSHIP}, "
            "synthetic unit-norm DB, TPU v5e"
        ),
        "gbps_note": (
            "match_gbps = db_bytes / time. The bf16 rows are the honest "
            "roofline (the matmul streams the bf16 db once). The f32 rows "
            "time ~equal to bf16 because the matcher casts the db to bf16 "
            "and the timing loop's invariant-code motion hoists that "
            "conversion out of the timed body — their apparent gbps "
            "exceeds the 819 GB/s peak and should be read as 'f32 storage "
            "costs 2x HBM residency, not 2x query time'"
        ),
        "per_db_size": rows,
        "per_db_size_head256": head_rows,
        "register_e2e": [e2e_flat, e2e_head],
        "device": str(jax.devices()[0].platform),
    }
    PART_LAT.write_text(json.dumps(out, indent=1))
    print(f"wrote {PART_LAT}", flush=True)


def mode_exact() -> None:
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bevrender_tpu.config import tiny_model_config, Config
    from bevrender_tpu.inference.register import RegistrationPipeline
    from bevrender_tpu.parallel.mesh import make_mesh

    # D reduced (exactness does not depend on D; 1-core host): what is under
    # test is the local-top-k + all-gather merge staying EXACT at 16k rows
    D = 512
    cfg = Config()
    cfg.model = tiny_model_config()
    pipe = RegistrationPipeline.__new__(RegistrationPipeline)  # matcher only
    mesh = make_mesh(8)
    rng = np.random.default_rng(11)
    n = DB_SIZES[-1]
    db = jnp.asarray(rng.standard_normal((n, D)), jnp.float32)
    db = db / jnp.linalg.norm(db, axis=-1, keepdims=True)
    q = jnp.asarray(rng.standard_normal((4, D)), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    ref_d = 2.0 - 2.0 * np.asarray(q) @ np.asarray(db).T
    ref_idx = np.argsort(ref_d, axis=-1)[:, :10]

    matcher = RegistrationPipeline.make_sharded_matcher(
        pipe, mesh, top_k=10
    )
    dbp, nreal = RegistrationPipeline.pad_tile_db(db, 8)
    idx, dist = matcher(q, dbp, jnp.int32(nreal))
    exact = bool((np.asarray(idx) == ref_idx).all())
    out = {
        "n_tiles": n,
        "d": D,
        "mesh": "8-device CPU (virtual)",
        "sharded_matcher_exact_vs_host_argsort": exact,
        "max_dist_err": float(
            np.max(np.abs(np.asarray(dist)
                          - np.take_along_axis(ref_d, ref_idx, 1)))
        ),
    }
    assert exact, "sharded matcher diverged from host argsort at 16k tiles"
    PART_EXACT.write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)


def mode_merge() -> None:
    out = {
        "metric": "registration query latency + matcher exactness vs "
                  "database size (north-star render+register loop, "
                  "reference train.py:551-572 at production DB scale)",
    }
    if PART_LAT.exists():
        out["latency_tpu"] = json.loads(PART_LAT.read_text())
    if PART_EXACT.exists():
        out["exactness_cpu_mesh"] = json.loads(PART_EXACT.read_text())
    OUT.write_text(json.dumps(out, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("latency", "exact", "merge"),
                    required=True)
    args = ap.parse_args()
    {"latency": mode_latency, "exact": mode_exact, "merge": mode_merge}[
        args.mode
    ]()

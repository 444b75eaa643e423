"""Registration pipeline tests: tile database, top-k matching, recall,
streaming serving step, map loader, profiling utils."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bevrender_tpu.config import Config, tiny_model_config
from bevrender_tpu.data.dataset import SyntheticDataset
from bevrender_tpu.data.prefetch import collate
from bevrender_tpu.inference.register import RegistrationPipeline

# compile-heavy on the 1-core host: excluded from the <5-min fast tier
# (run 'pytest -m "not slow"' for the quick core-parity loop; see README)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pipeline():
    cfg = Config()
    cfg.model = tiny_model_config()
    cfg.data.window_num_imgs = 2
    ds = SyntheticDataset(n_items=6, num_views=2, window_num_imgs=2,
                          img_height=32, img_width=32, map_tile=32)
    batch = collate([ds[i] for i in range(2)])
    from bevrender_tpu.models.bevrender import BEVRenderModel

    model = BEVRenderModel(cfg, mode="inference")
    variables = model.init(jax.random.PRNGKey(0), batch)
    return RegistrationPipeline(cfg, variables), ds, batch


class TestRegistration:
    def test_render_shape(self, pipeline):
        pipe, ds, batch = pipeline
        out = pipe.render(batch)
        assert out.shape == (2, 32, 32, 3)

    def test_tile_database_and_register(self, pipeline):
        pipe, ds, batch = pipeline
        rng = np.random.default_rng(0)
        tiles = [rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
                 for _ in range(7)]
        db = pipe.build_tile_database(tiles)
        assert db.shape == (7, 32 * 32 * 3)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(db), axis=-1), 1.0, rtol=1e-5
        )
        rendered, idx, dist = pipe.register(batch, top_k=3)
        assert idx.shape == (2, 3) and dist.shape == (2, 3)
        # distances sorted ascending
        d = np.asarray(dist)
        assert (np.diff(d, axis=-1) >= -1e-6).all()

    def test_register_finds_exact_tile(self, pipeline):
        """A tile equal to the render itself must rank first."""
        pipe, ds, batch = pipeline
        rendered = np.asarray(pipe.render(batch))
        rng = np.random.default_rng(1)
        tiles = [rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
                 for _ in range(4)]
        tiles.insert(2, rendered[0])  # ground truth at index 2
        pipe.build_tile_database(tiles)
        _, idx, _ = pipe.register(batch, top_k=1)
        assert int(idx[0, 0]) == 2

    def test_evaluate_recall_contract(self, pipeline):
        pipe, ds, batch = pipeline
        metrics = pipe.evaluate_recall(ds, batch_size=2)
        assert set(metrics) == {"R@1", "R@5", "R@10"}
        assert 0.0 <= metrics["R@1"] <= metrics["R@10"] <= 100.0

    def test_streaming_step_carries_state(self, pipeline):
        pipe, ds, batch = pipeline
        step = pipe.make_streaming_step()
        tiles = jnp.eye(4, 32 * 32 * 3)
        frame = batch["camera"][:, -1]
        pose_pair = batch["vehicle_pose"][:, -2:]
        vtype = batch["vehicle_type"]
        bev1, out1, idx1 = step(pipe.variables, frame, None, pose_pair, vtype, tiles)
        bev2, out2, idx2 = step(pipe.variables, frame, bev1, pose_pair, vtype, tiles)
        assert bev1.shape == bev2.shape and out1.shape == out2.shape
        # carrying history must change the BEV state
        assert float(jnp.abs(bev1 - bev2).max()) > 1e-6

    def test_streaming_chain_matches_full_window_eval(self, pipeline):
        """The carried-BEV serving loop reproduces the full window eval: one
        encode_step per frame with the reference's pose-pair rule (history
        step i warps with pose[:, i:i+2], bevrender.py:215; the final pass
        with pose[:, T-2:T], bevrender.py:138-146) must equal __call__'s
        history-scan-plus-final-pass output — the claim
        scripts/streaming_bench.py's one-pass-per-frame throughput rests on.
        Windows carry T = window_num_imgs + 1 frames (dataset.py:111
        subsamples window_num_imgs history frames and appends the current)."""
        pipe, ds, batch = pipeline
        step = pipe.make_streaming_step()
        tiles = jnp.eye(4, 32 * 32 * 3)
        vtype = batch["vehicle_type"]
        images, pose = batch["camera"], batch["vehicle_pose"]
        T = images.shape[1]
        assert T == 3  # window_num_imgs=2 history frames + current

        full = pipe.render(batch)

        bev, out = None, None
        for t in range(T):
            lo = min(t, T - 2)
            pose_pair = pose[:, lo:lo + 2]
            bev, out, _ = step(pipe.variables, images[:, t], bev, pose_pair,
                               vtype, tiles)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(full), rtol=2e-4, atol=2e-5
        )

    def test_replay_scan_matches_streaming_chain(self, pipeline):
        """The one-dispatch trace replay (lax.scan carrying the BEV) must
        return exactly the per-frame streaming chain's tile choices and the
        same final BEV state — the claim that lets recorded traces be
        re-localized in a single device program."""
        pipe, ds, batch = pipeline
        step = pipe.make_streaming_step()
        replay = pipe.make_replay_scan()
        tiles = jnp.eye(4, 32 * 32 * 3)
        vtype = batch["vehicle_type"]
        images, pose = batch["camera"], batch["vehicle_pose"]
        T = images.shape[1]

        # streaming chain, frame by frame (pose-pair rule as above)
        bev = None
        chain_idx = []
        for t in range(T):
            lo = min(t, T - 2)
            bev, _, idx = step(pipe.variables, images[:, t], bev,
                               pose[:, lo:lo + 2], vtype, tiles)
            chain_idx.append(np.asarray(idx))

        frames = jnp.moveaxis(images, 1, 0)  # (T, B, V, H, W, 3)
        pose_pairs = jnp.stack(
            [pose[:, min(t, T - 2):min(t, T - 2) + 2] for t in range(T)]
        )  # (T, B, 2, 3)
        final_bev, idx, dist = replay(
            pipe.variables, frames, pose_pairs, vtype, tiles
        )
        assert idx.shape == (T, images.shape[0])
        np.testing.assert_array_equal(np.asarray(idx), np.stack(chain_idx))
        np.testing.assert_allclose(
            np.asarray(final_bev), np.asarray(bev), rtol=2e-4, atol=2e-5
        )
        assert bool(jnp.isfinite(dist).all())

    def test_sharded_matcher_matches_unsharded(self, pipeline):
        """Mesh-sharded tile-DB matching (local top-k + all-gather merge)
        must return exactly the unsharded matcher's global top-k, including
        with a database that does not divide the mesh (pad rows masked to
        +inf) and with top_k larger than a shard."""
        from bevrender_tpu.parallel.mesh import make_mesh

        pipe, _, _ = pipeline
        mesh = make_mesh(8)
        rng = np.random.default_rng(3)
        D = 64
        for n_tiles, top_k in ((37, 5), (40, 8)):
            db = jnp.asarray(rng.standard_normal((n_tiles, D)), jnp.float32)
            db = db / jnp.linalg.norm(db, axis=-1, keepdims=True)
            q = jnp.asarray(rng.standard_normal((3, D)), jnp.float32)
            q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)

            idx_ref, dist_ref = pipe._match(q, db, n_tiles)
            matcher = pipe.make_sharded_matcher(mesh, top_k=top_k)
            dbp, nreal = pipe.pad_tile_db(db, mesh.shape["data"])
            idx_got, dist_got = matcher(q, dbp, jnp.int32(nreal))

            np.testing.assert_array_equal(
                np.asarray(idx_got), np.asarray(idx_ref[:, :top_k])
            )
            np.testing.assert_allclose(
                np.asarray(dist_got), np.asarray(dist_ref[:, :top_k]),
                rtol=1e-5, atol=1e-6,
            )


class TestMapLoader:
    def test_tiles_and_month_key(self, tmp_path):
        from PIL import Image

        from bevrender_tpu.data.maploader import MapLoader

        arr = (np.random.default_rng(0).uniform(0, 255, (48, 64, 3))).astype(
            np.uint8
        )
        p = tmp_path / "map.png"
        Image.fromarray(arr).save(p)
        loader = MapLoader({"june": str(p)}, "june")
        full = loader.get_map_array()
        assert full.shape == (48, 64, 3) and full.max() <= 1.0
        tiles = list(loader.iter_tiles(tile=16, stride=16))
        assert len(tiles) == 3 * 4
        (y, x), t = tiles[5]
        np.testing.assert_allclose(t, full[y : y + 16, x : x + 16])


class TestProfiling:
    def test_step_timer(self):
        from bevrender_tpu.utils.profiling import StepTimer

        timer = StepTimer()
        for _ in range(3):
            with timer.step(jnp.ones(4)):
                _ = jnp.ones(4) * 2
        stats = timer.stats()
        assert stats["steps"] == 2 and stats["mean_s"] >= 0

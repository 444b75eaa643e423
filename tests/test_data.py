"""Data pipeline tests: CSV -> records -> sequences -> windows -> samples."""

import numpy as np
import pytest

from bevrender_tpu.data.dataset import GPSDeniedDataset, SyntheticDataset
from bevrender_tpu.data.prefetch import DataLoader, collate, device_prefetch
from bevrender_tpu.data.processor import (
    DatasetProcessor,
    pixel_from_utm,
)


def _write_trace(tmp_path, n=30, dt_us=250_000, gap_at=None):
    """CSV: ts, vehicle_type, utm_e, utm_n, utm_h, roll, pitch, yaw."""
    rows = []
    ts = 1_000_000_000.0
    for i in range(n):
        if gap_at is not None and i == gap_at:
            ts += 5e6  # > 1 s gap
        rows.append([ts, 0, 500.0 + i, 400.0 + i, -10.0, 0.0, 0.0, 0.1 * i])
        ts += dt_us
    path = tmp_path / "gps.csv"
    np.savetxt(path, np.asarray(rows), delimiter=",")
    return str(path)


def _processor(tmp_path, **kw):
    defaults = dict(
        gps_file_path=_write_trace(tmp_path, **kw.pop("trace", {})),
        rgb_img_dir=str(tmp_path / "rgb"),
        map_img_dir=str(tmp_path / "map"),
        jgw_info=(1.0, 0.0, 0.0, -1.0, 0.0, 1000.0),
        map_width=1200,
        map_height=1200,
        window_timespin=1_000_000.0,
        window_num_imgs=2,
    )
    defaults.update(kw)
    return DatasetProcessor(**defaults)


class TestJGW:
    def test_identityish_affine(self):
        # world = [[1,0],[0,-1]] @ pixel + (0, 1000): pixel_x = easting,
        # pixel_y = 1000 - northing
        px, py = pixel_from_utm(400.0, 500.0, (1.0, 0.0, 0.0, -1.0, 0.0, 1000.0))
        assert (px, py) == (500.0, 600.0)

    def test_rotated_affine_roundtrip(self):
        a, d, b, e, c, f = 0.8, 0.6, -0.6, 0.8, 100.0, 200.0
        px, py = 12.0, 34.0
        easting = a * px + b * py + c
        northing = d * px + e * py + f
        gx, gy = pixel_from_utm(northing, easting, (a, d, b, e, c, f))
        np.testing.assert_allclose([gx, gy], [px, py], atol=1e-9)


class TestProcessor:
    def test_records_and_sequence_split(self, tmp_path):
        proc = _processor(tmp_path, trace=dict(n=20, gap_at=12))
        records = proc.get_full_datalist()
        assert len(records) == 20 and len(records[0]) == 12
        seqs = proc.split_sequence(records)
        assert [len(s) for s in seqs] == [12, 8]

    def test_windows_nonoverlap(self, tmp_path):
        proc = _processor(tmp_path, trace=dict(n=20))
        windows = proc.process_windows()
        # 250 ms spacing, 1 s span -> 5 frames per window; > 2 required
        assert all(len(w) > 2 for w in windows)
        # non-overlapping: consecutive windows share no frames
        flat = [id(fr) for w in windows for fr in w]
        assert len(flat) == len(set(flat))

    def test_windows_overlap_slide(self, tmp_path):
        proc = _processor(tmp_path, overlap=True, trace=dict(n=20))
        windows = proc.process_windows()
        non = _processor(tmp_path, trace=dict(n=20)).process_windows()
        assert len(windows) > len(non)

    def test_val_split_removes_frames(self, tmp_path):
        import random

        proc = _processor(tmp_path, trace=dict(n=30))
        seqs = proc.split_sequence(proc.get_full_datalist())
        total = sum(len(s) for s in seqs)
        val, remaining = proc.get_val_datalist(seqs, 0.5, random.Random(0))
        left = sum(len(s) for s in remaining)
        val_frames = sum(len(w) for w in val)
        assert val_frames + left == total  # dataprocessor.py:226 invariant


class TestDataset:
    def _make_images(self, tmp_path, proc):
        from PIL import Image

        (tmp_path / "rgb").mkdir(exist_ok=True)
        (tmp_path / "map").mkdir(exist_ok=True)
        for rec in proc.get_full_datalist():
            ts = int(rec[0])
            rng = np.random.default_rng(ts % 1000)
            wide = (rng.uniform(0, 255, (16, 48, 3))).astype(np.uint8)
            Image.fromarray(wide).save(tmp_path / "rgb" / f"{ts}.png")
            tile = (rng.uniform(0, 255, (16, 16, 3))).astype(np.uint8)
            Image.fromarray(tile).save(tmp_path / "map" / f"{ts}.png")

    def test_getitem_contract(self, tmp_path):
        proc = _processor(tmp_path, trace=dict(n=20))
        self._make_images(tmp_path, proc)
        ds = GPSDeniedDataset(
            proc.process_windows(),
            num_views=3,
            window_num_imgs=2,
            resize_cmr_img=True,
            resize_img_height=16,
            resize_img_width=48,
        )
        s = ds[0]
        assert s["camera"].shape == (3, 3, 16, 16, 3)  # (T, V, H, W, C)
        assert s["map"].shape == (16, 16, 3)
        assert s["vehicle_pose"].shape == (3, 3)
        assert s["vehicle_type"].shape == (1,)
        assert 0.0 <= s["map"].min() and s["map"].max() <= 1.0

    def test_history_subsample_keeps_last(self, tmp_path):
        proc = _processor(tmp_path, trace=dict(n=20))
        self._make_images(tmp_path, proc)
        windows = proc.process_windows()
        ds = GPSDeniedDataset(
            windows, num_views=3, window_num_imgs=2, resize_cmr_img=True,
            resize_img_height=16, resize_img_width=48,
        )
        s = ds[0]
        # current frame is always the window's last (dataset.py:114-117)
        assert int(s["timestamp"]) == int(windows[0][-1][0])


class TestLoader:
    def test_batching_and_prefetch(self):
        ds = SyntheticDataset(n_items=10, num_views=2, window_num_imgs=1,
                              img_height=8, img_width=8, map_tile=8)
        loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True)
        batches = list(device_prefetch(iter(loader)))
        assert len(batches) == 2  # drop_last
        assert batches[0]["camera"].shape == (4, 2, 2, 8, 8, 3)

    def test_set_epoch_reshuffles(self):
        ds = SyntheticDataset(n_items=16, img_height=4, img_width=4, map_tile=4)
        loader = DataLoader(ds, batch_size=4, shuffle=True, seed=1)
        loader.set_epoch(0)
        a = [b["timestamp"].tolist() for b in loader]
        loader.set_epoch(1)
        b = [b["timestamp"].tolist() for b in loader]
        assert a != b

    def test_sampler_subset(self):
        ds = SyntheticDataset(n_items=12, img_height=4, img_width=4, map_tile=4)
        loader = DataLoader(ds, batch_size=2, sampler=np.arange(6))
        assert len(loader) == 3


class TestConfigParity:
    def test_print_and_save_formats(self, tmp_path):
        from bevrender_tpu.config import Config, get_config

        cfg = Config()
        text = cfg.print_config()
        assert "Configuration:" in text and "DAT_BEV_SHAPE" in text
        cfg.save_config_given_dir(str(tmp_path))
        saved = (tmp_path / "config.yaml").read_text()
        assert "SEED:" in saved and "BEV_BOUND:" in saved
        ref = get_config()
        assert ref["DAT_NUM_STAGES"] == 7  # populated, unlike the redacted ref

    def test_json_roundtrip(self):
        from bevrender_tpu.config import Config

        cfg = Config()
        cfg.train.batch_size = 7
        cfg.model.bev_shapes = (28,) * 8
        c2 = Config.from_json(cfg.to_json())
        assert c2.train.batch_size == 7
        assert c2.model.bev_shapes == (28,) * 8

    def test_reference_dict_drives_model(self):
        """A user's reference-style UPPER_CASE dict must drop in end-to-end
        (Config.from_reference_dict -> BEVRenderModel forward)."""
        import jax
        import jax.numpy as jnp

        from bevrender_tpu.config import Config
        from bevrender_tpu.data.dataset import SyntheticDataset
        from bevrender_tpu.data.prefetch import collate
        from bevrender_tpu.models.bevrender import BEVRenderModel

        ref = {
            "DAT_BEV_SHAPE": [8, 8, 8],
            "DAT_EMBED_DIMS": [8, 8, 8],
            "DAT_NUM_STAGES": 2,
            "DAT_VIT_DEPTHS": [1, 1],
            "DAT_NUM_HEADS": [2, 2],
            "DAT_STRIDES": [2, 2],
            "DAT_NUM_GROUPS": [1, 1],
            "DAT_K_SIZES": [3, 3],
            "DAT_EXPANSION": 2,
            "DAT_BEV_DEPTH_DIM": 2,
            "DAT_BACKBONE_TYPE": "PatchProjection",
            "DAT_DROP_PATH_RATE": 0.0,
            "NUM_VIEWS": 2,
            "IMG_HEIGHT": 32,
            "IMG_WIDTH": 32,
            "ORI_IMG_HEIGHT": 32,
            "ORI_IMG_WIDTH": 32,
            "WINDOW_NUM_IMGS": 1,
            "BATCH_SIZE": 2,
            "LOSS_TYPE": "MSE",
        }
        cfg = Config.from_reference_dict(ref)
        assert cfg.model.n_stages == 2 and cfg.model.backbone == "PatchProjection"
        ds = SyntheticDataset(n_items=2, num_views=2, window_num_imgs=1,
                              img_height=32, img_width=32, map_tile=32)
        batch = collate([ds[0], ds[1]])
        model = BEVRenderModel(cfg)
        variables = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(variables, batch["camera"], batch["vehicle_pose"],
                          batch["vehicle_type"], train=False)
        assert out.shape == (2, 32, 32, 3) and bool(jnp.isfinite(out).all())


class TestProcessSharding:
    """Multi-host sampler semantics (DistributedSampler parity,
    train.py:667-672): shared shuffle, disjoint strided shards."""

    def _loader(self, pi, pc, n=23, bs=2, shuffle=True):
        from bevrender_tpu.data.prefetch import DataLoader

        class _DS:
            def __len__(self):
                return n

            def __getitem__(self, i):
                return {"idx": np.asarray([i])}

        return DataLoader(_DS(), bs, shuffle=shuffle, num_workers=1,
                          drop_last=True, seed=7, process_shard=(pi, pc))

    def test_shards_partition_the_epoch(self):
        # n=23, pc=2: the permutation is padded (wrapping) to 24 so both
        # processes get 12 indices / 6 batches — DistributedSampler padding
        # semantics (train.py:668): at most pc-1 duplicated samples, full
        # coverage, EQUAL batch counts (unequal counts would desync SPMD).
        seen, counts = [], []
        for pi in range(2):
            dl = self._loader(pi, 2)
            dl.set_epoch(3)
            batches = list(dl)
            counts.append(len(batches))
            got = [int(b["idx"][j, 0]) for b in batches for j in range(2)]
            seen.append(got)
        assert counts[0] == counts[1] == 6 == len(self._loader(0, 2))
        assert set(seen[0]) | set(seen[1]) == set(range(23))  # full coverage
        assert len(set(seen[0]) & set(seen[1])) <= 1  # <= pc-1 padded dups

    def test_same_seed_same_permutation(self):
        a = self._loader(0, 2)
        b = self._loader(0, 2)
        a.set_epoch(1)
        b.set_epoch(1)
        la = [int(x["idx"][j, 0]) for x in a for j in range(2)]
        lb = [int(x["idx"][j, 0]) for x in b for j in range(2)]
        assert la == lb

    def test_len_accounts_for_shard(self):
        dl = self._loader(0, 2, n=23, bs=2)
        assert len(dl) == 6  # ceil(23/2)=12 indices -> 6 batches


class TestOnDevicePreprocess:
    """data/preprocess.py must reproduce the host pipeline
    (dataset.py:121-147 semantics: split wide image, /255, normalize; map
    ToTensor only)."""

    def test_matches_host_pipeline_no_resize(self):
        from bevrender_tpu.data.preprocess import preprocess_batch

        rng = np.random.default_rng(0)
        B, T, H, V, VW = 2, 2, 16, 3, 12
        wide = rng.integers(0, 256, (B, T, H, V * VW, 3), dtype=np.uint8)
        maps = rng.integers(0, 256, (B, 20, 20, 3), dtype=np.uint8)
        mean = (0.485, 0.456, 0.406)
        std = (0.229, 0.224, 0.225)

        out = preprocess_batch(
            wide, maps, num_views=V, resize_h=H, resize_w=V * VW,
            cam_mean=mean, cam_std=std,
        )
        # host reference (mirrors GPSDeniedDataset._frame_views)
        views = wide.reshape(B, T, H, V, VW, 3).transpose(0, 1, 3, 2, 4, 5)
        host = (views.astype(np.float32) / 255.0 - np.asarray(mean)) / np.asarray(std)
        np.testing.assert_allclose(np.asarray(out["camera"]), host, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out["map"]), maps.astype(np.float32) / 255.0, atol=1e-7
        )

    def test_resize_path_shapes(self):
        from bevrender_tpu.data.preprocess import preprocess_batch

        rng = np.random.default_rng(1)
        wide = rng.integers(0, 256, (1, 2, 32, 96, 3), dtype=np.uint8)
        maps = rng.integers(0, 256, (1, 20, 20, 3), dtype=np.uint8)
        out = preprocess_batch(
            wide, maps, num_views=3, resize_h=16, resize_w=48,
            cam_mean=(0.5, 0.5, 0.5), cam_std=(0.5, 0.5, 0.5),
        )
        assert out["camera"].shape == (1, 2, 3, 16, 16, 3)
        assert bool(np.isfinite(np.asarray(out["camera"])).all())

    def test_prefetch_applies_preprocess(self):
        from bevrender_tpu.data.prefetch import device_prefetch

        rng = np.random.default_rng(2)
        batches = [{
            "camera": rng.integers(0, 256, (2, 2, 8, 24, 3), dtype=np.uint8),
            "map": rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8),
            "vehicle_pose": np.zeros((2, 2, 3), np.float32),
        }]
        from bevrender_tpu.data.preprocess import preprocess_batch

        def pp(b):
            out = dict(b)
            out.update(preprocess_batch(
                b["camera"], b["map"], num_views=3, resize_h=8, resize_w=24,
                cam_mean=(0.5,) * 3, cam_std=(0.5,) * 3))
            return out

        got = list(device_prefetch(iter(batches), preprocess=pp))
        assert got[0]["camera"].shape == (2, 2, 3, 8, 8, 3)
        assert str(got[0]["camera"].dtype) == "float32"
        assert got[0]["vehicle_pose"].shape == (2, 2, 3)


class TestCastPreprocess:
    """The cast-only device stage ("cast" mode) must invert
    SyntheticGeoDataset's raw_uint8 quantization to within 8-bit tolerance."""

    def test_uint8_roundtrip(self):
        import jax.numpy as jnp

        from bevrender_tpu.data.dataset import SyntheticGeoDataset
        from bevrender_tpu.data.preprocess import make_cast_preprocessor
        from bevrender_tpu.data.prefetch import collate

        kw = dict(n_items=4, num_views=2, window_num_imgs=1, img_height=16,
                  img_width=16, map_tile=16, world=256, noise=0.02, seed=0)
        fds = SyntheticGeoDataset(**kw)
        uds = SyntheticGeoDataset(**kw, raw_uint8=True)
        fb = collate([fds[i] for i in range(4)])
        ub = collate([uds[i] for i in range(4)])
        assert ub["camera"].dtype == np.uint8 and ub["map"].dtype == np.uint8
        out = make_cast_preprocessor()(
            {k: jnp.asarray(v) for k, v in ub.items()}
        )
        assert out["camera"].dtype == jnp.float32
        # quantization error <= 0.5/255 (plus clipping of noise excursions)
        cam_clip = np.clip(fb["camera"], 0.0, 1.0)
        np.testing.assert_allclose(
            np.asarray(out["camera"]), cam_clip, atol=0.5 / 255 + 1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out["map"]), np.clip(fb["map"], 0, 1),
            atol=0.5 / 255 + 1e-6,
        )
        # pass-through keys untouched
        np.testing.assert_array_equal(out["vehicle_pose"], ub["vehicle_pose"])

"""Native PNG decode (csrc/decode.cc), the decoded-frame cache, and the
frame-size gate.

The reference's host pipeline starts at ``PIL.Image.open``
(dataloader/dataset.py:121-136); round 4 measured that decode — not
resize/normalize — is the 1-core host's input bottleneck
(TRAINER_OVERLAP_k8_png.json). These tests pin the three remedies: libpng
decode parity with PIL, the byte-capped LRU that removes repeat decodes,
and the measured small-frame gate (native preprocess loses below
``native_min_pixels``)."""

import numpy as np
import pytest

pytest.importorskip("PIL")
from PIL import Image

from bevrender_tpu.data import native


def _png(tmp_path, arr, name="x.png", mode=None):
    img = Image.fromarray(arr)
    if mode:
        img = img.convert(mode)
    p = tmp_path / name
    img.save(p)
    return str(p)


@pytest.mark.skipif(not native.png_available(), reason="libpng build absent")
class TestNativeDecode:
    def test_rgb_roundtrip_exact(self, tmp_path):
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
        out = native.decode_png(_png(tmp_path, arr))
        np.testing.assert_array_equal(out, arr)

    def test_probe(self, tmp_path):
        arr = np.zeros((21, 34, 3), np.uint8)
        assert native.probe_png(_png(tmp_path, arr)) == (21, 34)

    def test_modes_match_pil(self, tmp_path):
        """palette / gray / RGBA sources: native == PIL's convert('RGB')."""
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        for mode in ("P", "L", "RGBA"):
            p = _png(tmp_path, arr, f"m_{mode}.png", mode=mode)
            ref = np.asarray(Image.open(p).convert("RGB"))
            out = native.decode_png(p)
            np.testing.assert_array_equal(out, ref)

    def test_non_png_returns_none(self, tmp_path):
        p = tmp_path / "x.jpg"
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)
        assert native.decode_png(str(p)) is None
        assert native.probe_png(str(p)) is None

    def test_fused_views_equals_composition(self, tmp_path):
        rng = np.random.default_rng(2)
        arr = rng.integers(0, 256, (48, 96, 3), dtype=np.uint8)
        p = _png(tmp_path, arr)
        mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
        fused = native.decode_png_views(p, 2, 24, 48, mean, std)
        ref = native.fused_views(arr, 2, 24, 48, mean, std)
        np.testing.assert_allclose(fused, ref, atol=1e-6)

    def test_fused_resize_u8(self, tmp_path):
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 256, (48, 96, 3), dtype=np.uint8)
        p = _png(tmp_path, arr)
        out = native.decode_png_resize_u8(p, 24, 48)
        np.testing.assert_array_equal(out, native.resize_u8(arr, 24, 48))
        # identity size: straight copy of the decode
        np.testing.assert_array_equal(
            native.decode_png_resize_u8(p, 48, 96), arr
        )


class TestByteLRU:
    def test_hit_miss_and_eviction(self):
        from bevrender_tpu.data.dataset import _ByteLRU

        lru = _ByteLRU(3000)
        a = np.zeros(1000, np.uint8)
        for key in ("a", "b", "c"):
            lru.put(key, a.copy())
        assert lru.get("a") is not None  # refreshes a
        lru.put("d", a.copy())  # evicts b (LRU order: b, c, a)
        assert lru.get("b") is None
        assert lru.get("c") is not None and lru.get("d") is not None
        assert lru.hits == 3 and lru.misses == 1

    def test_oversize_rejected(self):
        from bevrender_tpu.data.dataset import _ByteLRU

        lru = _ByteLRU(10)
        lru.put("big", np.zeros(100, np.uint8))
        assert lru.get("big") is None


def _tiny_dataset(tmp_path, **kw):
    from bevrender_tpu.data.dataset import GPSDeniedDataset
    from bevrender_tpu.data.processor import REC_MAP_PATH, REC_RGB_PATH

    rng = np.random.default_rng(7)
    wide = rng.integers(0, 256, (40, 72, 3), dtype=np.uint8)
    tile = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    wp = _png(tmp_path, wide, "w.png")
    mp = _png(tmp_path, tile, "m.png")
    rec = [0] * 12
    rec[REC_RGB_PATH] = wp
    rec[REC_MAP_PATH] = mp
    base = dict(
        mode="train", window_num_imgs=1, num_views=3,
        resize_img_height=16, resize_img_width=36,
    )
    base.update(kw)
    return GPSDeniedDataset([[list(rec), list(rec)]], **base)


class TestDatasetCacheAndGate:
    def test_cache_hits_accumulate_and_outputs_stable(self, tmp_path):
        ds = _tiny_dataset(tmp_path, cache_mb=64)
        s1 = ds[0]
        assert ds.cache.misses > 0
        miss0 = ds.cache.misses
        s2 = ds[0]
        assert ds.cache.misses == miss0  # second read: all hits
        assert ds.cache.hits > 0
        np.testing.assert_array_equal(s1["camera"], s2["camera"])
        np.testing.assert_array_equal(s1["map"], s2["map"])

    def test_cache_disabled_matches_cached(self, tmp_path):
        a = _tiny_dataset(tmp_path, cache_mb=64)[0]
        b = _tiny_dataset(tmp_path, cache_mb=0)[0]
        # cache-off path may take the single-call fused route (no u8
        # quantization after resize) -> quantization-level agreement
        assert np.max(np.abs(a["camera"] - b["camera"])) <= 2.5 / 255.0 / 0.225
        np.testing.assert_array_equal(a["map"], b["map"])

    def test_size_gate_small_frames_use_pil(self, tmp_path):
        # 40x72 = 2880 px < default 100k threshold -> PIL resize branch;
        # forcing the threshold to 0 takes the native branch. Both must
        # agree at quantization tolerance (documented PIL-vs-native f32
        # intermediate difference).
        small_gate = _tiny_dataset(tmp_path, cache_mb=0, native_min_pixels=10**9)
        native_path = _tiny_dataset(tmp_path, cache_mb=0, native_min_pixels=0)
        a, b = small_gate[0], native_path[0]
        assert np.max(np.abs(a["camera"] - b["camera"])) <= 2.5 / 255.0 / 0.225

    def test_raw_uint8_cached_decode(self, tmp_path):
        ds = _tiny_dataset(tmp_path, cache_mb=64, raw_uint8=True)
        s = ds[0]
        assert s["camera"].dtype == np.uint8
        assert s["map"].dtype == np.uint8
        m0 = ds.cache.misses
        ds[0]
        assert ds.cache.misses == m0

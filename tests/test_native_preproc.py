"""Native host-preprocess library (csrc/preprocess.cc via data/native.py).

Parity contract: the fused C++ pass must reproduce the host pipeline the
reference runs in separate stages (dataloader/dataset.py:121-147: PIL
BILINEAR resize -> view split -> ToTensor -> normalize). The native resample
keeps f32 precision between the separable passes where PIL rounds the
intermediate to uint8, so PIL parity is asserted at the quantization
tolerance while an exact float reference (same triangle-filter formulas)
is asserted tightly.
"""

import numpy as np
import pytest

from bevrender_tpu.data import native

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def triangle_resize_f32(img, out_h, out_w):
    """Exact float reference: separable triangle filter, PIL BILINEAR
    semantics (half-pixel centers, support = max(scale, 1), renormalized)."""

    def plan(in_size, out_size):
        scale = in_size / out_size
        fs = max(scale, 1.0)
        rows = []
        for i in range(out_size):
            center = (i + 0.5) * scale
            xmin = max(int(center - fs + 0.5), 0)
            xmax = min(int(center + fs + 0.5), in_size)
            xs = np.arange(xmin, xmax)
            w = np.maximum(0.0, 1.0 - np.abs((xs + 0.5 - center) / fs))
            rows.append((xmin, w / w.sum()))
        return rows

    x = np.asarray(img, np.float64)
    px = plan(x.shape[1], out_w)
    tmp = np.stack(
        [x[:, x0 : x0 + len(w), :].transpose(0, 2, 1) @ w for x0, w in px],
        axis=1,
    )  # (H, out_w, 3)
    py = plan(x.shape[0], out_h)
    out = np.stack(
        [tmp[y0 : y0 + len(w), :, :].transpose(1, 2, 0) @ w for y0, w in py],
        axis=0,
    )  # (out_h, out_w, 3)
    return out.astype(np.float32)


def test_native_library_builds():
    # g++ is in the image; if this fails the fallback still works but the
    # native component is broken — fail loudly so it cannot rot silently
    assert native.available()


def test_resize_u8_matches_float_reference():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    got = native.resize_u8(img, 16, 24)
    ref = triangle_resize_f32(img, 16, 24)
    assert got.shape == (16, 24, 3)
    assert np.max(np.abs(got.astype(np.float32) - ref)) <= 0.51  # round only


def test_resize_u8_matches_pil_within_quantization():
    pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    got = native.resize_u8(img, 28, 42).astype(np.int32)
    pil = np.asarray(
        Image.fromarray(img).resize((42, 28), Image.BILINEAR), dtype=np.int32
    )
    # PIL quantizes the horizontal-pass intermediate to uint8; ours stays f32
    assert np.max(np.abs(got - pil)) <= 2


def test_resize_u8_upscale_and_identity():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (8, 12, 3), dtype=np.uint8)
    np.testing.assert_array_equal(native.resize_u8(img, 8, 12), img)
    up = native.resize_u8(img, 16, 24)
    ref = triangle_resize_f32(img, 16, 24)
    assert np.max(np.abs(up.astype(np.float32) - ref)) <= 0.51


def test_fused_views_matches_composition():
    """fused = resize -> split -> /255 -> normalize in one native pass."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (48, 90, 3), dtype=np.uint8)
    V, ho, wo = 3, 20, 60
    got = native.fused_views(img, V, ho, wo, MEAN, STD)
    ref_img = triangle_resize_f32(img, ho, wo)
    vw = wo // V
    views = ref_img.reshape(ho, V, vw, 3).transpose(1, 0, 2, 3)
    ref = (views / 255.0 - np.asarray(MEAN, np.float32)) / np.asarray(
        STD, np.float32
    )
    assert got.shape == (V, ho, vw, 3)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_fused_views_identity_scale_is_exact():
    """Scale-1 resample is a single unit tap: split+normalize must be exact
    (this is the augmented-path layout used by GPSDeniedDataset)."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (10, 24, 3), dtype=np.uint8)
    got = native.fused_views(img, 2, 10, 24, MEAN, STD)
    views = img.reshape(10, 2, 12, 3).transpose(1, 0, 2, 3)
    ref = (views.astype(np.float32) / 255.0 - np.asarray(MEAN, np.float32)
           ) / np.asarray(STD, np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_fused_views_rejects_bad_split():
    with pytest.raises(ValueError):
        native.fused_views(np.zeros((4, 9, 3), np.uint8), 2, 4, 9, MEAN, STD)


def test_to_unit_f32():
    img = np.arange(256, dtype=np.uint8).reshape(8, 32)
    np.testing.assert_allclose(
        native.to_unit_f32(img), img.astype(np.float32) / 255.0, atol=1e-7
    )


def test_stack_matches_numpy():
    rng = np.random.default_rng(5)
    arrs = [rng.standard_normal((3, 4)).astype(np.float32) for _ in range(5)]
    np.testing.assert_array_equal(native.stack(arrs), np.stack(arrs))
    # same-dtype scalars take the native memcpy path; mixed dtypes/shapes
    # fall back to np.stack — either way the result must equal np.stack
    scalars = [np.int64(7), np.int64(9)]
    np.testing.assert_array_equal(native.stack(scalars), np.stack(scalars))
    mixed = [np.zeros((2, 2), np.float32), np.zeros((2, 2), np.float64)]
    np.testing.assert_array_equal(native.stack(mixed), np.stack(mixed))


def test_env_kill_switch(monkeypatch):
    """BEV_NATIVE=0 must route every entry point to the fallback and agree
    with the native path at the documented tolerances."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    nat = native.fused_views(img, 3, 16, 24, MEAN, STD)
    monkeypatch.setenv("BEV_NATIVE", "0")
    fb = native.fused_views(img, 3, 16, 24, MEAN, STD)
    assert not native.available()
    # fallback is the PIL composition: quantization-level agreement
    assert np.max(np.abs(nat - fb)) <= 2.5 / 255.0 / min(STD)


def test_dataset_uses_native_path(tmp_path):
    """GPSDeniedDataset end to end through the fused path: output equals the
    PIL composition within the quantization tolerance."""
    pytest.importorskip("PIL")
    from PIL import Image

    from bevrender_tpu.data.dataset import GPSDeniedDataset

    rng = np.random.default_rng(7)
    wide = rng.integers(0, 256, (40, 72, 3), dtype=np.uint8)
    tile = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    wp, mp = tmp_path / "w.png", tmp_path / "m.png"
    Image.fromarray(wide).save(wp)
    Image.fromarray(tile).save(mp)
    from bevrender_tpu.data.processor import REC_RGB_PATH, REC_MAP_PATH

    rec = [0] * 12
    rec[REC_RGB_PATH] = str(wp)
    rec[REC_MAP_PATH] = str(mp)
    ds = GPSDeniedDataset(
        [[list(rec), list(rec)]],
        mode="train",
        window_num_imgs=1,
        num_views=3,
        resize_img_height=16,
        resize_img_width=36,
    )
    s = ds[0]
    assert s["camera"].shape == (2, 3, 16, 12, 3)
    assert s["map"].shape == (20, 20, 3) and s["map"].dtype == np.float32
    ref_img = triangle_resize_f32(wide, 16, 36)
    views = ref_img.reshape(16, 3, 12, 3).transpose(1, 0, 2, 3)
    ref = (views / 255.0 - np.asarray(MEAN, np.float32)) / np.asarray(
        STD, np.float32
    )
    # the pipeline rounds the resized frame to uint8 before normalizing
    # (decoded-frame cache stores post-resize u8 — and that matches the
    # reference exactly: PIL resize yields u8 before ToTensor/normalize,
    # dataset.py:128-147), so agreement is at quantization tolerance
    np.testing.assert_allclose(
        s["camera"][0], ref, atol=2.5 / 255.0 / min(STD)
    )
    # determinism across cache hit/miss: a second read returns the same views
    np.testing.assert_array_equal(s["camera"], ds[0]["camera"])

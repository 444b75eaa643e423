"""Window dataset + host-side image pipeline (dataloader/dataset.py rebuild).

``GPSDeniedDataset.__getitem__`` semantics (dataset.py:75-165):
* randomly subsample ``window_num_imgs`` history frames from the window and
  always keep the window's last frame as the current frame (static shapes:
  exactly T = window_num_imgs + 1 frames per sample);
* load one wide image per timestep, resize, split into ``num_views`` camera
  views along width, scale to [0, 1], normalize by mean/std;
* load the matching aerial map tile, scale to [0, 1] only (map normalization
  deliberately disabled, dataset.py:150-151, 211-221);
* return ``{timestamp, camera, map, vehicle_pose(x, y, heading),
  vehicle_type}``.

Differences: NHWC layout; seeded per-epoch subsampling (the reference's
``random.sample`` is unseeded — SURVEY 5.2); decode runs in a thread pool and
batches are prefetched to device (data/prefetch.py). Augmentations
(none/weak/strong, dataset.py:185-207) are numpy reimplementations of
ColorJitter / RandomGrayscale / RandomPosterize.
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence

import numpy as np

from bevrender_tpu.data.processor import (
    REC_MAP_PATH,
    REC_PIXEL_X,
    REC_PIXEL_Y,
    REC_RGB_PATH,
    REC_TIMESTAMP,
    REC_VEHICLE_TYPE,
    REC_YAW,
)


def _resize_bilinear(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Host bilinear (triangle-filter) resize, PIL BILINEAR semantics.

    Served by the native C++ library (csrc/preprocess.cc) when built; falls
    back to PIL. The native path keeps f32 precision between the separable
    passes where PIL rounds to uint8, so results can differ from PIL by
    <= 2/255 (documented, tested in tests/test_native_preproc.py)."""
    from bevrender_tpu.data import native

    return native.resize_u8(img, h, w)


def _open_rgb(path: str):
    from PIL import Image

    return Image.open(path).convert("RGB")


def _decode_rgb(path: str) -> np.ndarray:
    """Decode an image file to (H, W, 3) uint8: native libpng path
    (csrc/decode.cc) with PIL fallback for non-PNG formats or when the
    native library is unavailable (BEV_NATIVE=0)."""
    from bevrender_tpu.data import native

    out = native.decode_png(path)
    if out is None:
        out = np.asarray(_open_rgb(path))
    return out


class _ByteLRU:
    """Byte-capped, thread-safe LRU of numpy arrays keyed by path.

    The host input pipeline re-decodes every frame for EVERY window it
    appears in (a frame recurs in up to window length windows, and again
    each epoch) — and round-4 measurement pinned PNG decode as the 1-core
    host's input bottleneck (TRAINER_OVERLAP_k8_png.json). Caching the
    post-resize uint8 frame removes the repeat decodes entirely; the byte
    cap keeps residency bounded on long traces. Thread-safe because the
    DataLoader decodes in a thread pool.
    """

    def __init__(self, max_bytes: int):
        import collections
        import threading

        self.max_bytes = max_bytes
        self._data: "collections.OrderedDict[str, np.ndarray]" = (
            collections.OrderedDict()
        )
        self._bytes = 0
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get(self, key: str) -> Optional[np.ndarray]:
        with self._lock:
            arr = self._data.get(key)
            if arr is None:
                self.misses += 1
                return None
            self._data.move_to_end(key)
            self.hits += 1
            return arr

    def put(self, key: str, arr: np.ndarray) -> None:
        if arr.nbytes > self.max_bytes:
            return
        with self._lock:
            old = self._data.pop(key, None)
            if old is not None:
                self._bytes -= old.nbytes
            self._data[key] = arr
            self._bytes += arr.nbytes
            while self._bytes > self.max_bytes:
                _, evicted = self._data.popitem(last=False)
                self._bytes -= evicted.nbytes


class Augmenter:
    """Seeded numpy augmentations matching dataset.py:185-207's menus.

    Documented deviation from torchvision's ColorJitter: hue jitter is
    omitted (the reference passes hue=0.1/0.2; an RGB<->HSV round trip per
    image is not worth the host CPU here), and brightness/contrast/saturation
    are applied as one multiplicative pass with a single final clip rather
    than torchvision's per-op clamp ordering, so saturation near the 0/255
    rails can differ slightly. Grayscale/posterize probabilities and the
    jitter ranges match the reference exactly.
    """

    def __init__(self, kind: str, rng: random.Random):
        if kind not in ("none", "weak", "strong"):
            raise RuntimeError("wrong data augmentation type!")
        self.kind = kind
        self.rng = rng

    def __call__(self, img: np.ndarray) -> np.ndarray:
        if self.kind == "none":
            return img
        jitter = 0.2 if self.kind == "strong" else 0.1
        img = img.astype(np.float32)
        # brightness/contrast/saturation jitter
        img = img * self.rng.uniform(1 - jitter, 1 + jitter)
        mean = img.mean()
        img = (img - mean) * self.rng.uniform(1 - jitter, 1 + jitter) + mean
        gray = img.mean(axis=-1, keepdims=True)
        img = (img - gray) * self.rng.uniform(1 - jitter, 1 + jitter) + gray
        img = np.clip(img, 0, 255)
        if self.rng.random() < 0.2:  # RandomGrayscale(p=0.2)
            img = np.broadcast_to(img.mean(axis=-1, keepdims=True), img.shape)
        if self.kind == "strong" and self.rng.random() < 0.2:
            # RandomPosterize(p=0.2, bits=4)
            img = np.floor(img / 16.0) * 16.0
        return img.astype(np.uint8)


class GPSDeniedDataset:
    """Map-style dataset over temporal windows."""

    def __init__(
        self,
        datalist: List[List[list]],
        mode: str = "train",
        data_augmentation: str = "none",
        num_views: int = 3,
        window_num_imgs: int = 3,
        resize_cmr_img: bool = True,
        resize_img_height: int = 224,
        resize_img_width: int = 672,
        img_norm_mean: Sequence[float] = (0.485, 0.456, 0.406),
        img_norm_std: Sequence[float] = (0.229, 0.224, 0.225),
        map_norm_mean: Sequence[float] = (0.485, 0.456, 0.406),
        map_norm_std: Sequence[float] = (0.229, 0.224, 0.225),
        map_tile: int = 224,
        seed: int = 0,
        logger=None,
        raw_uint8: bool = False,
        cache_mb: int = 256,
        native_min_pixels: int = 100_000,
    ):
        """``raw_uint8=True`` keeps only host decode (+ augment) and returns
        uint8 wide frames / map tiles; resize, view split and normalization
        then run on device (data/preprocess.py).

        ``cache_mb`` byte-caps the decoded-frame LRU (post-resize uint8
        camera frames + decoded map tiles keyed by path; frames recur across
        overlapping windows and epochs, and decode is the measured 1-core
        host bottleneck — TRAINER_OVERLAP_k8_png.json). 0 disables caching.

        ``native_min_pixels`` gates the native fused resize path by SOURCE
        frame size: below the threshold the PIL composition wins in the live
        loop (per-call ctypes overhead dominates at small shapes — measured
        0.725x at 128x256 frames vs 2.74x at 512x640, round-4 finding). The
        identity split+normalize on cache hits is always native (no resize,
        single pass).
        """
        self.datalist = datalist
        self.raw_uint8 = raw_uint8
        self.mode = mode
        self.num_views = num_views
        self.window_num_imgs = window_num_imgs
        self.resize_cmr_img = resize_cmr_img
        self.resize_img_height = resize_img_height
        self.resize_img_width = resize_img_width
        self.img_norm_mean = np.asarray(img_norm_mean, np.float32)
        self.img_norm_std = np.asarray(img_norm_std, np.float32)
        self.map_tile = map_tile
        self.rng = random.Random(seed)
        self.augment = Augmenter(data_augmentation, self.rng)
        self.native_min_pixels = native_min_pixels
        self.cache = _ByteLRU(cache_mb << 20) if cache_mb > 0 else None

    def __len__(self) -> int:
        return len(self.datalist)

    # ------------------------------------------------------------------
    def _decode_cached(self, path: str) -> np.ndarray:
        """Decode at natural size through the LRU (raw_uint8 frames, map
        tiles)."""
        if self.cache is not None:
            hit = self.cache.get(path)
            if hit is not None:
                return hit
        img = _decode_rgb(path)
        if self.cache is not None:
            self.cache.put(path, img)
        return img

    def _load_wide_image(self, path: str) -> np.ndarray:
        """Decode (+ resize when configured) to uint8, through the LRU.

        The cache stores the POST-resize frame (448 KB at 224x672 vs 1.8 MB
        f32 views), so a hit skips decode AND resize — the two stages the
        round-4 overlap bench measured as the 1-core host bottleneck. The
        native path is gated by SOURCE pixel count (``native_min_pixels``);
        below it the PIL composition runs (measured faster at small frames).
        """
        if not self.resize_cmr_img:
            return self._decode_cached(path)
        if self.cache is not None:
            hit = self.cache.get(path)
            if hit is not None:
                return hit
        from bevrender_tpu.data import native

        h, w = self.resize_img_height, self.resize_img_width
        img = None
        dims = native.probe_png(path)
        if dims is not None and dims[0] * dims[1] >= self.native_min_pixels:
            # fused native decode + triangle resize, one call
            img = native.decode_png_resize_u8(path, h, w)
        if img is None:
            raw = _decode_rgb(path)
            if raw.shape[0] * raw.shape[1] >= self.native_min_pixels:
                img = native.resize_u8(raw, h, w)
            else:  # size gate: small frames resize faster through PIL
                from PIL import Image

                img = np.asarray(
                    Image.fromarray(raw).resize((w, h), Image.BILINEAR)
                )
        if self.cache is not None:
            self.cache.put(path, img)
        return img

    def _frame_views(self, path: str) -> np.ndarray:
        """Wide image -> (V, Hv, Wv, 3) float in [0,1], normalized.

        Steady state (cache hit, no augmentation): ONE native identity
        split+normalize pass over the cached post-resize uint8 frame — no
        decode, no resize (csrc/preprocess.cc identity fast path). Cache
        miss: fused native decode+resize (csrc/decode.cc) fills the LRU.
        With augmentation the same applies with the augment between (it
        operates on the resized uint8 frame, reference dataset.py:185-207
        order). With the cache disabled and no augmentation, the whole
        file->views pipeline is a single native call
        (``native.decode_png_views``)."""
        from bevrender_tpu.data import native

        if (
            self.cache is None
            and self.augment.kind == "none"
            and self.resize_cmr_img
        ):
            dims = native.probe_png(path)
            if dims is not None and dims[0] * dims[1] >= self.native_min_pixels:
                out = native.decode_png_views(
                    path, self.num_views, self.resize_img_height,
                    self.resize_img_width, self.img_norm_mean,
                    self.img_norm_std,
                )
                if out is not None:
                    return out
        img = self.augment(self._load_wide_image(path))
        h, w, _ = img.shape
        return native.fused_views(
            img, self.num_views, h, w, self.img_norm_mean, self.img_norm_std
        )

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        window = self.datalist[index]
        if self.mode in ("train", "validation"):
            take = sorted(
                self.rng.sample(range(len(window) - 1), self.window_num_imgs)
            )
            frames = [window[i] for i in take] + [window[-1]]
        else:  # inference: the full window (dataset.py:118-119)
            frames = list(window)

        if self.raw_uint8:
            # host: decode + augment only; device does the rest
            cameras = np.stack(
                [
                    self.augment(self._decode_cached(fr[REC_RGB_PATH]))
                    for fr in frames
                ]
            )  # (T, Hw, Ww, 3) uint8
        else:
            cameras = np.stack(
                [self._frame_views(fr[REC_RGB_PATH]) for fr in frames]
            )
        poses = np.stack(
            [
                np.asarray(
                    [fr[REC_PIXEL_X], fr[REC_PIXEL_Y], fr[REC_YAW]], np.float32
                )
                for fr in frames
            ]
        )

        if self.raw_uint8:
            map_img = self._decode_cached(frames[-1][REC_MAP_PATH])
        else:
            from bevrender_tpu.data import native

            # ToTensor only; no normalization (dataset.py:150-151)
            map_img = native.to_unit_f32(
                self._decode_cached(frames[-1][REC_MAP_PATH])
            )

        return {
            "timestamp": np.int64(frames[-1][REC_TIMESTAMP]),
            "camera": cameras,  # (T, V, Hv, Wv, 3)
            "map": map_img,  # (Hm, Wm, 3)
            "vehicle_pose": poses,  # (T, 3)
            "vehicle_type": np.asarray([frames[-1][REC_VEHICLE_TYPE]], np.int32),
        }


class SyntheticDataset:
    """Disk-free stand-in with the GPSDeniedDataset sample contract; used by
    tests and benchmarks (the reference dataset requires the off-road trace,
    which is not shipped)."""

    def __init__(
        self,
        n_items: int = 32,
        num_views: int = 3,
        window_num_imgs: int = 3,
        img_height: int = 224,
        img_width: int = 224,
        map_tile: int = 224,
        n_vehicle_types: int = 1,
        seed: int = 0,
    ):
        self.n = n_items
        self.num_views = num_views
        self.T = window_num_imgs + 1
        self.h = img_height
        self.w = img_width
        self.map_tile = map_tile
        self.n_types = n_vehicle_types
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(self.seed * 100003 + index)
        return {
            "timestamp": np.int64(1_700_000_000_000_000 + index * 250_000),
            "camera": rng.standard_normal(
                (self.T, self.num_views, self.h, self.w, 3), dtype=np.float32
            ),
            "map": rng.uniform(0, 1, (self.map_tile, self.map_tile, 3)).astype(
                np.float32
            ),
            "vehicle_pose": np.stack(
                [
                    100.0 + 2.0 * np.arange(self.T, dtype=np.float32) + index,
                    200.0 + 1.0 * np.arange(self.T, dtype=np.float32),
                    0.1 * np.arange(self.T, dtype=np.float32),
                ],
                axis=1,
            ),
            "vehicle_type": np.asarray([index % self.n_types], np.int32),
        }


class SyntheticGeoDataset:
    """Geo-consistent synthetic trace: camera views and aerial map tiles are
    carved from ONE shared world image, so pose retrieval is *learnable* —
    the render+register loop (train.py:551-572) can be validated end to end
    without the (unshipped) off-road trace.

    A smooth random world map is generated; sample ``i`` sits at pose ``p_i``
    on a trace. Its aerial tile is the world crop at ``p_i``; its camera
    views are overlapping world crops around ``p_i`` (one per view, offset
    like a surround rig) with additive noise, and history frames come from
    the earlier trace poses. A model that learns to render the aerial view
    from the cameras will therefore beat chance at recall@K against the tile
    database.
    """

    def __init__(
        self,
        n_items: int = 16,
        num_views: int = 2,
        window_num_imgs: int = 1,
        img_height: int = 32,
        img_width: int = 32,
        map_tile: int = 32,
        world: int = 256,
        noise: float = 0.05,
        seed: int = 0,
        raw_uint8: bool = False,
        detail: float = 0.0,
    ):
        """``raw_uint8=True`` emits camera/map quantized to uint8 (the views
        are already final-shaped, so pair with
        ``DataConfig.on_device_preprocess = "cast"`` — the host->device
        transfer shrinks 4x, which is the input bottleneck on
        host-bandwidth-limited links)."""
        self.n = n_items
        self.num_views = num_views
        self.T = window_num_imgs + 1
        self.h = img_height
        self.w = img_width
        self.map_tile = map_tile
        self.noise = noise
        self.seed = seed
        self.raw_uint8 = raw_uint8
        rng = np.random.default_rng(seed)

        # smooth world: low-res noise, bilinear-upsampled
        def _octave(res: int) -> np.ndarray:
            low = rng.standard_normal((res, res, 3)).astype(np.float32)
            ys = np.linspace(0, res - 1, world)
            xs = np.linspace(0, res - 1, world)
            y0 = np.floor(ys).astype(int); x0 = np.floor(xs).astype(int)
            y1 = np.minimum(y0 + 1, res - 1)
            x1 = np.minimum(x0 + 1, res - 1)
            wy = (ys - y0)[:, None, None]; wx = (xs - x0)[None, :, None]
            return (low[y0][:, x0] * (1 - wy) * (1 - wx)
                    + low[y0][:, x1] * (1 - wy) * wx
                    + low[y1][:, x0] * wy * (1 - wx)
                    + low[y1][:, x1] * wy * wx)

        up = _octave(world // 16)
        if detail > 0.0:
            # mid-frequency octave: without it a map_tile-sized crop spans
            # only ~2 base-octave pixels, so tiles are near-duplicates
            # (measured mean inter-tile MSE 0.013 at the defaults) and no
            # render accuracy can separate them at recall time — tests that
            # assert retrieval learning need distinctive tiles
            up = up + detail * _octave(world // 4)
        up = (up - up.min()) / max(up.max() - up.min(), 1e-6)
        self.world_img = up  # (world, world, 3) in [0, 1]
        # a trace with margins for the crops
        m = map_tile + img_height
        if world < 2 * m + 8:
            raise ValueError(
                f"world={world} too small for map_tile={map_tile} + "
                f"img_height={img_height}: the trace span [m, world-m] with "
                f"m={m} collapses (all poses/tiles identical -> retrieval "
                f"unlearnable); use world >= {2 * m + 8}"
            )
        self.trace = np.stack([
            np.linspace(m, world - m, n_items),
            m + (world - 2 * m) * 0.5 * (1 + np.sin(np.linspace(0, 3, n_items))),
            np.linspace(0, 0.5, n_items),
        ], axis=1).astype(np.float32)

    def __len__(self):
        return self.n

    def _crop(self, cy, cx, size):
        y = int(round(cy)) - size // 2
        x = int(round(cx)) - size // 2
        return self.world_img[y : y + size, x : x + size]

    def _views_at(self, i, rng):
        # views overlap the aerial tile (a surround rig sees the ground the
        # tile covers) — small offsets keep the task learnable
        offs = np.linspace(-self.h / 4, self.h / 4, self.num_views)
        cy, cx, _ = self.trace[i]
        views = []
        for o in offs:
            v = self._crop(cy + o * 0.5, cx + o, self.h)
            views.append(v + rng.standard_normal(v.shape).astype(np.float32) * self.noise)
        return np.stack(views)  # (V, h, h, 3)

    def __getitem__(self, index: int):
        rng = np.random.default_rng(self.seed * 7919 + index)
        hist = [max(index - k, 0) for k in range(self.T - 1, 0, -1)] + [index]
        cameras = np.stack([self._views_at(j, rng) for j in hist]).astype(np.float32)
        tile = self._crop(*self.trace[index][:2], self.map_tile).astype(np.float32)
        if self.raw_uint8:
            q = lambda a: np.clip(a * 255.0, 0, 255).round().astype(np.uint8)
            cameras, tile = q(cameras), q(tile)
        return {
            "timestamp": np.int64(1_700_000_000_000_000 + index * 250_000),
            "camera": cameras,
            "map": np.ascontiguousarray(tile),
            "vehicle_pose": self.trace[hist].copy(),
            "vehicle_type": np.asarray([0], np.int32),
        }

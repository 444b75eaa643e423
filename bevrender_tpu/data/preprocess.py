"""On-device image preprocessing: resize / view-split / normalize as XLA.

The reference does resize + split + normalize on the host per sample
(dataloader/dataset.py:121-147) — on a 1-core host that becomes the input
bottleneck as soon as the model is fast. Here the host keeps only PIL decode
(+ the uint8 augmentations) and ships raw ``uint8`` frames; a single jitted
stage on the accelerator does:

  wide uint8 (B, T, Hw, Ww, 3)
    -> bilinear resize to (resize_h, num_views * view_w)   [jax.image.resize]
    -> split width into ``num_views`` camera views
    -> /255 and per-channel mean/std normalize
  map uint8 (B, Hm, Wm, 3) -> /255 only (ToTensor parity, dataset.py:150-151)

Enable with ``DataConfig.on_device_preprocess`` + a dataset in
``raw_uint8=True`` mode; ``device_prefetch(..., preprocess=...)`` applies the
stage right after the host->device copy, so the transfer is uint8 (4x smaller
than the f32 it replaces).
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_views", "resize_h", "resize_w", "cam_mean", "cam_std", "resize"
    ),
)
def preprocess_batch(
    camera_u8: jax.Array,  # (B, T, Hw, Ww, 3) uint8 wide frames
    map_u8: jax.Array,  # (B, Hm, Wm, 3) uint8 map tiles
    *,
    num_views: int,
    resize_h: int,
    resize_w: int,  # full wide width after resize (= num_views * view_w)
    cam_mean: Sequence[float],
    cam_std: Sequence[float],
    resize: bool = True,
) -> Dict[str, jax.Array]:
    B, T, Hw, Ww, _ = camera_u8.shape
    x = camera_u8.astype(jnp.float32)
    if resize and (Hw, Ww) != (resize_h, resize_w):
        x = jax.image.resize(
            x, (B, T, resize_h, resize_w, 3), method="bilinear"
        )
    h, w = x.shape[2], x.shape[3]
    vw = w // num_views
    views = x.reshape(B, T, h, num_views, vw, 3)
    views = jnp.transpose(views, (0, 1, 3, 2, 4, 5))  # (B, T, V, h, vw, 3)
    views = views / 255.0
    mean = jnp.asarray(cam_mean, jnp.float32)
    std = jnp.asarray(cam_std, jnp.float32)
    camera = (views - mean) / std
    map_f = map_u8.astype(jnp.float32) / 255.0
    return {"camera": camera, "map": map_f}


@jax.jit
def cast_uint8_batch(camera_u8: jax.Array, map_u8: jax.Array):
    """uint8 -> float32/255 with shapes unchanged, for datasets that already
    emit final-shaped views (e.g. ``SyntheticGeoDataset(raw_uint8=True)``).
    The host->device copy is 4x smaller than shipping f32 — on a remote-TPU
    tunnel (or any host-bandwidth-limited link) the transfer, not the host
    CPU, is the input bottleneck."""
    return (
        camera_u8.astype(jnp.float32) / 255.0,
        map_u8.astype(jnp.float32) / 255.0,
    )


def make_cast_preprocessor():
    """Cast-only device preprocessor (``DataConfig.on_device_preprocess =
    "cast"``): uint8 camera/map to float, no resize/split/normalize."""

    def apply(batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        out = dict(batch)
        out["camera"], out["map"] = cast_uint8_batch(
            batch["camera"], batch["map"]
        )
        return out

    return apply


def make_batch_preprocessor(data_cfg):
    """Bind :func:`preprocess_batch` to a ``DataConfig``; returns a callable
    mapping a device batch with uint8 ``camera``/``map`` to the float batch
    the train step consumes (other keys pass through)."""

    def apply(batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        out = dict(batch)
        proc = preprocess_batch(
            batch["camera"],
            batch["map"],
            num_views=data_cfg.num_views,
            resize_h=data_cfg.resize_img_height,
            resize_w=data_cfg.resize_img_width,
            cam_mean=tuple(data_cfg.camera_norm_mean),
            cam_std=tuple(data_cfg.camera_norm_std),
            resize=data_cfg.resize_img,
        )
        out.update(proc)
        return out

    return apply

"""ctypes bindings for the native host-preprocess library (csrc/preprocess.cc).

The reference's host input pipeline rides torch's native DataLoader plus
PIL's C resample (dataloader/dataset.py:121-147) in separate passes. Here the
hot per-frame path — resize, view split, /255, mean/std normalize — is ONE
fused C++ pass (see csrc/preprocess.cc for semantics and the documented
<=2/255 deviation from PIL's fixed-point rounding).

Build model: compiled on demand with g++ into ``build/libbevpreproc.so``
(rebuilt when the source is newer), loaded via ctypes — no pybind11 in the
image. Every entry point has a numpy/PIL fallback; ``available()`` says
which path is live, and ``BEV_NATIVE=0`` disables the native path for
debugging/parity runs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_ROOT = Path(__file__).resolve().parents[2]
_SRC = _ROOT / "csrc" / "preprocess.cc"
_SRC_DECODE = _ROOT / "csrc" / "decode.cc"  # libpng-backed PNG decode
_SO = _ROOT / "build" / "libbevpreproc.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    if not _SRC.exists():
        return None

    def _compile() -> None:
        _SO.parent.mkdir(parents=True, exist_ok=True)
        # per-process tmp name: concurrent builders (pytest-xdist, loader
        # processes) must not interleave g++ output into one file
        tmp = _SO.with_suffix(f".so.{os.getpid()}.tmp")
        base = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                "-fPIC"]
        try:
            # first choice: preprocess + libpng decode in one .so (decode.cc
            # calls preprocess.cc's resize/normalize internally); if libpng
            # is absent on this machine, fall back to preprocess alone and
            # PNG decode stays on PIL
            built = False
            if _SRC_DECODE.exists():
                try:
                    subprocess.run(
                        base + [str(_SRC), str(_SRC_DECODE), "-o", str(tmp),
                                "-lpng", "-lz"],
                        check=True, capture_output=True, timeout=120,
                    )
                    built = True
                except subprocess.SubprocessError:
                    built = False
            if not built:
                subprocess.run(
                    base + [str(_SRC), "-o", str(tmp)],
                    check=True, capture_output=True, timeout=120,
                )
            os.replace(tmp, _SO)  # atomic publish
        finally:
            tmp.unlink(missing_ok=True)

    try:
        src_mtime = _SRC.stat().st_mtime
        if _SRC_DECODE.exists():
            src_mtime = max(src_mtime, _SRC_DECODE.stat().st_mtime)
        if not _SO.exists() or _SO.stat().st_mtime < src_mtime:
            _compile()
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            # a stale/corrupt .so (e.g. from an interrupted build) would
            # otherwise pin every future run to the slow fallback — rebuild
            # once from scratch before giving up
            _SO.unlink(missing_ok=True)
            _compile()
            lib = ctypes.CDLL(str(_SO))
        lib.bev_fused_views.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.bev_resize_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.bev_u8_to_unit_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.bev_stack.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int64, ctypes.c_void_p,
        ]
        if hasattr(lib, "bev_png_probe"):  # libpng decode built in
            lib.bev_png_probe.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.bev_png_probe.restype = ctypes.c_int
            lib.bev_png_decode_rgb.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ]
            lib.bev_png_decode_rgb.restype = ctypes.c_int
            lib.bev_png_views.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.bev_png_views.restype = ctypes.c_int
            lib.bev_png_resize_u8.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ]
            lib.bev_png_resize_u8.restype = ctypes.c_int
        return lib
    except (subprocess.SubprocessError, OSError) as e:  # no toolchain / load fail
        import logging

        logging.getLogger(__name__).warning(
            "native preprocess unavailable (%s); using numpy/PIL fallback", e
        )
        return None


def _get() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if os.environ.get("BEV_NATIVE", "1") == "0":
        return None
    if _tried:
        return _lib
    with _lock:
        if not _tried:
            _lib = _build_and_load()
            _tried = True
    return _lib


def available() -> bool:
    """True when the compiled library is loaded (not the fallback)."""
    return _get() is not None


def _c8(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.uint8)


def fused_views(
    img_u8: np.ndarray,  # (Hs, Ws, 3) uint8 wide frame
    num_views: int,
    out_h: int,
    out_w: int,  # full wide width after resize (= num_views * view width)
    mean: Sequence[float],
    std: Sequence[float],
) -> np.ndarray:
    """Wide u8 frame -> (V, out_h, out_w // V, 3) f32 normalized views in one
    native pass (resize + split + /255 + normalize). Fallback: the same
    composition in PIL + numpy (GPSDeniedDataset._frame_views semantics)."""
    if out_w % num_views:
        raise ValueError(f"out_w={out_w} not divisible by num_views={num_views}")
    lib = _get()
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    if lib is not None:
        src = _c8(img_u8)
        hs, ws, _ = src.shape
        dst = np.empty((num_views, out_h, out_w // num_views, 3), np.float32)
        lib.bev_fused_views(
            src.ctypes.data, hs, ws, dst.ctypes.data, num_views, out_h,
            out_w, mean.ctypes.data, std.ctypes.data,
        )
        return dst
    from PIL import Image

    img = np.asarray(
        Image.fromarray(np.asarray(img_u8)).resize((out_w, out_h), Image.BILINEAR)
    )
    vw = out_w // num_views
    views = img.reshape(out_h, num_views, vw, 3).transpose(1, 0, 2, 3)
    return (views.astype(np.float32) / 255.0 - mean) / std


def resize_u8(img_u8: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """u8 HWC -> u8 triangle-filter resize (raw_uint8 host path)."""
    lib = _get()
    if lib is not None:
        src = _c8(img_u8)
        hs, ws, _ = src.shape
        dst = np.empty((out_h, out_w, 3), np.uint8)
        lib.bev_resize_u8(src.ctypes.data, hs, ws, dst.ctypes.data, out_h, out_w)
        return dst
    from PIL import Image

    return np.asarray(
        Image.fromarray(np.asarray(img_u8)).resize((out_w, out_h), Image.BILINEAR)
    )


def to_unit_f32(img_u8: np.ndarray) -> np.ndarray:
    """u8 -> f32 / 255 (map-tile ToTensor parity)."""
    lib = _get()
    if lib is not None:
        src = _c8(img_u8)
        dst = np.empty(src.shape, np.float32)
        lib.bev_u8_to_unit_f32(src.ctypes.data, dst.ctypes.data, src.size)
        return dst
    return np.asarray(img_u8, np.float32) / 255.0


def _png_lib() -> Optional[ctypes.CDLL]:
    lib = _get()
    return lib if lib is not None and hasattr(lib, "bev_png_probe") else None


def png_available() -> bool:
    """True when the libpng-backed native decode path is live."""
    return _png_lib() is not None


def probe_png(path: str) -> Optional[tuple]:
    """Header-only (H, W) of a PNG (~100 bytes of IO), or None."""
    lib = _png_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.bev_png_probe(str(path).encode(), ctypes.byref(h), ctypes.byref(w)):
        return None
    return h.value, w.value


def decode_png(path: str) -> Optional[np.ndarray]:
    """Native PNG decode -> (H, W, 3) uint8 RGB, or None (caller falls back
    to PIL). Handles palette/gray/16-bit/alpha/interlaced via libpng's
    simplified API. Round-4 finding: decode, not resize, is the 1-core
    host's input bottleneck (TRAINER_OVERLAP_k8_png.json)."""
    lib = _png_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    p = str(path).encode()
    if lib.bev_png_probe(p, ctypes.byref(h), ctypes.byref(w)):
        return None
    dst = np.empty((h.value, w.value, 3), np.uint8)
    if lib.bev_png_decode_rgb(p, dst.ctypes.data, h.value, w.value):
        return None
    return dst


def decode_png_views(
    path: str,
    num_views: int,
    out_h: int,
    out_w: int,
    mean: Sequence[float],
    std: Sequence[float],
) -> Optional[np.ndarray]:
    """Fused file-path -> (V, out_h, out_w // V, 3) f32 normalized views:
    decode + resize + split + /255 + normalize in ONE native call (no
    intermediate full-size frame crosses the Python boundary). None on
    unavailability/non-PNG (caller falls back to PIL + fused_views)."""
    lib = _png_lib()
    if lib is None:
        return None
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    dst = np.empty((num_views, out_h, out_w // num_views, 3), np.float32)
    rc = lib.bev_png_views(
        str(path).encode(), dst.ctypes.data, num_views, out_h, out_w,
        mean.ctypes.data, std.ctypes.data,
    )
    return None if rc else dst


def decode_png_resize_u8(path: str, out_h: int, out_w: int) -> Optional[np.ndarray]:
    """Fused file-path -> (out_h, out_w, 3) uint8: decode + triangle resize
    (raw_uint8 host path). None on unavailability/failure."""
    lib = _png_lib()
    if lib is None:
        return None
    dst = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.bev_png_resize_u8(str(path).encode(), dst.ctypes.data, out_h, out_w)
    return None if rc else dst


def stack(arrays: Sequence[np.ndarray]) -> np.ndarray:
    """np.stack via one native memcpy per sample (collate hot path)."""
    lib = _get()
    first = arrays[0]
    if lib is None or any(
        a.dtype != first.dtype or a.shape != first.shape for a in arrays
    ):
        return np.stack(arrays)
    srcs = [np.ascontiguousarray(a) for a in arrays]
    out = np.empty((len(srcs),) + first.shape, first.dtype)
    ptrs = (ctypes.c_void_p * len(srcs))(*[s.ctypes.data for s in srcs])
    lib.bev_stack(ptrs, len(srcs), first.nbytes, out.ctypes.data)
    return out

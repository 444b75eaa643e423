"""A/B the native fused host preprocess vs the PIL/numpy composition.

Measures the per-frame host cost of the reference-shaped pipeline (wide
512x640 uint8 frame -> 224x672 resize -> 3-view split -> /255 -> normalize,
dataset.py:121-147 shapes) three ways:

  pil_multipass : PIL BILINEAR resize + numpy split/normalize (the fallback,
                  and what the reference's DataLoader does per frame)
  native_fused  : ONE C++ pass (csrc/preprocess.cc via data/native.py)
  native_resize : C++ resize only + numpy split/normalize (isolates the
                  fusion win from the resample win)

plus the collate stack for a (B, T, V, H, W, 3) f32 batch. Writes
NATIVE_PREPROC_BENCH.json. CPU-only — run anywhere:
    python scripts/native_preproc_bench.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np

from bevrender_tpu.data import native

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)
HS, WS = 512, 640          # reference ori_img (config.py flagship)
HO, WO, V = 224, 672, 3    # reference resize_img / num_views


def timeit(fn, reps=30, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps * 1e3


def main() -> int:
    if not native.available():
        print("native library unavailable; nothing to bench", file=sys.stderr)
        return 1
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (HS, WS, 3), dtype=np.uint8)
    mean = np.asarray(MEAN, np.float32)
    std = np.asarray(STD, np.float32)

    from PIL import Image

    def pil_multipass():
        r = np.asarray(Image.fromarray(img).resize((WO, HO), Image.BILINEAR))
        views = r.reshape(HO, V, WO // V, 3).transpose(1, 0, 2, 3)
        return (views.astype(np.float32) / 255.0 - mean) / std

    def native_fused():
        return native.fused_views(img, V, HO, WO, MEAN, STD)

    def native_resize_then_numpy():
        r = native.resize_u8(img, HO, WO)
        views = r.reshape(HO, V, WO // V, 3).transpose(1, 0, 2, 3)
        return (views.astype(np.float32) / 255.0 - mean) / std

    frames = [
        rng.standard_normal((2, V, HO, WO // V, 3)).astype(np.float32)
        for _ in range(8)
    ]

    def np_stack():
        return np.stack(frames)

    def native_stack():
        return native.stack(frames)

    out = {
        "shapes": f"wide ({HS},{WS},3) u8 -> ({V},{HO},{WO // V},3) f32",
        "pil_multipass_ms": round(timeit(pil_multipass), 3),
        "native_fused_ms": round(timeit(native_fused), 3),
        "native_resize_then_numpy_ms": round(timeit(native_resize_then_numpy), 3),
        "collate_np_stack_ms": round(timeit(np_stack), 3),
        "collate_native_stack_ms": round(timeit(native_stack), 3),
    }
    out["fused_speedup_vs_pil"] = round(
        out["pil_multipass_ms"] / out["native_fused_ms"], 2
    )
    (ROOT / "NATIVE_PREPROC_BENCH.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Full geo-map loading (dataloader/maploader.py:5-18 parity).

Loads one full geo-referenced aerial map image by month key; used by the
registration pipeline to cut tile databases (the reference's train path never
calls it either)."""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np


class MapLoader:
    def __init__(self, map_path: Dict[str, str], map_month: str, logger=None):
        self.map_dir = map_path[map_month]
        self.logger = logger

    def get_map_array(self, normalize_or_not: bool = True) -> np.ndarray:
        from PIL import Image

        Image.MAX_IMAGE_PIXELS = None
        img = np.asarray(Image.open(self.map_dir).convert("RGB"))
        if normalize_or_not:
            return img.astype(np.float32) / 255.0
        return img

    def get_map_img(self):
        from PIL import Image

        Image.MAX_IMAGE_PIXELS = None
        return Image.open(self.map_dir)

    def iter_tiles(
        self,
        tile: int = 224,
        stride: Optional[int] = None,
        normalize: bool = True,
    ) -> Iterator[Tuple[Tuple[int, int], np.ndarray]]:
        """Yield ((pixel_y, pixel_x), tile array) over a regular grid —
        the tile database for render+register inference."""
        stride = stride or tile
        arr = self.get_map_array(normalize)
        h, w = arr.shape[:2]
        for y in range(0, h - tile + 1, stride):
            for x in range(0, w - tile + 1, stride):
                yield (y, x), arr[y : y + tile, x : x + tile]

"""Texture asset: image loading, mip generation, atlas packing.

The reference's `Texture` (`/root/reference/Oxylus/include/Asset/Texture.hpp:77-140`,
`src/Asset/Texture.cpp`) wraps ktx/dds/stb decoding into a Vulkan image plus a bindless
descriptor index. TPU-native re-design: all textures are packed into one RGBA8 **atlas
array** on device (the bindless table analog — one gather source, no descriptors), and
each texture resolves to a normalized atlas rect. Shelf packing, power-of-two friendly.

Formats: PNG/JPEG/BMP/TGA via PIL; `.npy` raw arrays; procedural solid colors.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np


@dataclasses.dataclass
class Texture:
    name: str
    pixels: np.ndarray  # (H, W, 4) uint8
    srgb: bool = True

    @property
    def height(self) -> int:
        return self.pixels.shape[0]

    @property
    def width(self) -> int:
        return self.pixels.shape[1]

    @classmethod
    def load(cls, path, name: str | None = None, srgb: bool = True) -> "Texture":
        path = Path(path)
        if path.suffix == ".npy":
            arr = np.load(path)
            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
        else:
            from PIL import Image

            img = Image.open(path).convert("RGBA")
            arr = np.asarray(img)
        if arr.ndim == 2:
            arr = np.repeat(arr[..., None], 4, axis=-1)
        if arr.shape[-1] == 3:
            arr = np.concatenate([arr, np.full(arr.shape[:2] + (1,), 255, np.uint8)], axis=-1)
        return cls(name=name or path.stem, pixels=arr, srgb=srgb)

    @classmethod
    def solid(cls, name: str, rgba, size: int = 4) -> "Texture":
        px = np.zeros((size, size, 4), np.uint8)
        px[...] = np.asarray(rgba, np.uint8)
        return cls(name=name, pixels=px, srgb=False)

    def generate_mips(self) -> list[np.ndarray]:
        """Box-filter mip chain down to 1×1 (reference generates mips on upload)."""
        mips = [self.pixels]
        cur = self.pixels.astype(np.float32)
        while cur.shape[0] > 1 or cur.shape[1] > 1:
            h = max(1, cur.shape[0] // 2)
            w = max(1, cur.shape[1] // 2)
            cur = cur[: h * 2, : w * 2].reshape(h, 2, w, 2, 4).mean(axis=(1, 3))
            mips.append(cur.astype(np.uint8))
        return mips


@dataclasses.dataclass
class AtlasRegion:
    x: int
    y: int
    w: int
    h: int

    def rect_uv(self, atlas_size: int) -> tuple[float, float, float, float]:
        s = float(atlas_size)
        return (self.x / s, self.y / s, (self.x + self.w) / s, (self.y + self.h) / s)


class TextureAtlas:
    """Shelf-packed RGBA8 atlas. Call `add` per texture, then `build()` → (array, rects)."""

    def __init__(self, size: int = 2048, padding: int = 1):
        self.size = size
        self.padding = padding
        self._pixels = np.zeros((size, size, 4), np.uint8)
        self._regions: dict[str, AtlasRegion] = {}
        self._shelf_y = 0
        self._shelf_h = 0
        self._cursor_x = 0

    def add(self, key: str, tex: Texture) -> AtlasRegion:
        if key in self._regions:
            return self._regions[key]
        h, w = tex.height, tex.width
        if w > self.size or h > self.size:
            raise ValueError(f"texture {key} ({w}x{h}) exceeds atlas size {self.size}")
        if self._cursor_x + w + self.padding > self.size:
            self._shelf_y += self._shelf_h + self.padding
            self._cursor_x = 0
            self._shelf_h = 0
        if self._shelf_y + h + self.padding > self.size:
            raise ValueError(f"texture atlas full packing {key}")
        region = AtlasRegion(self._cursor_x, self._shelf_y, w, h)
        self._pixels[region.y : region.y + h, region.x : region.x + w] = tex.pixels
        self._cursor_x += w + self.padding
        self._shelf_h = max(self._shelf_h, h)
        self._regions[key] = region
        return region

    def build(self):
        rects = {k: r.rect_uv(self.size) for k, r in self._regions.items()}
        return self._pixels, rects

    @property
    def regions(self) -> dict[str, AtlasRegion]:
        return dict(self._regions)

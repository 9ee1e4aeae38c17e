"""Game-UI text & panel rendering through the sprite rasterizer.

The RmlUI role (`/root/reference/Oxylus/src/UI/Rml*.cpp`: per-scene HUD documents
drawn over the frame) re-based on the engine's own 2D path: a bitmap font atlas is
baked once (PIL's font rasterizer), and `UIDocument` lays out text runs + colored
panels into sprite-record batches that `blend_tiles_pallas`/`rasterize_sprites` can
composite over any frame — same tiling, same ordered blend, zero extra kernels.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

FONT_CHARS = "".join(chr(c) for c in range(32, 127))
GLYPH_W, GLYPH_H = 8, 14


def bake_font_atlas() -> tuple[np.ndarray, dict[str, tuple[float, float, float, float]]]:
    """Render the builtin monospace font into an atlas. Returns (RGBA8 atlas, rects)."""
    from PIL import Image, ImageDraw, ImageFont

    cols = 16
    rows = (len(FONT_CHARS) + cols - 1) // cols
    w, h = cols * GLYPH_W, rows * GLYPH_H
    img = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(img)
    font = ImageFont.load_default()
    rects = {}
    for i, ch in enumerate(FONT_CHARS):
        x = (i % cols) * GLYPH_W
        y = (i // cols) * GLYPH_H
        draw.text((x, y), ch, fill=255, font=font)
        rects[ch] = (x / w, y / h, (x + GLYPH_W) / w, (y + GLYPH_H) / h)
    lum = np.asarray(img)
    rgba = np.stack([np.full_like(lum, 255)] * 3 + [lum], axis=-1)
    return rgba, rects


@dataclasses.dataclass
class UIElement:
    kind: str                  # "text" | "panel"
    x: float                   # pixels from top-left
    y: float
    text: str = ""
    color: tuple = (1.0, 1.0, 1.0, 1.0)
    w: float = 0.0             # panel size
    h: float = 0.0
    scale: float = 1.0


class UIDocument:
    """A HUD document: retained list of elements → sprite batch (RmlView analog)."""

    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height
        self.elements: list[UIElement] = []
        self._atlas, self._rects = bake_font_atlas()
        self.visible = True

    # ------------------------------------------------------------- authoring
    def clear(self) -> None:
        self.elements.clear()

    def add_text(self, x: float, y: float, text: str, color=(1, 1, 1, 1), scale=1.0) -> None:
        self.elements.append(UIElement("text", x, y, text=text, color=color, scale=scale))

    def add_panel(self, x: float, y: float, w: float, h: float, color=(0, 0, 0, 0.6)) -> None:
        self.elements.append(UIElement("panel", x, y, w=w, h=h, color=color))

    # ------------------------------------------------------------- batching
    def build_batch(self):
        """Returns (records (N, 16) f32, tex_tiles (N, 16, 16, 4) f32, atlas u8)
        in draw order — feed straight into ops.raster2d_pallas.blend_tiles_pallas
        (or composite on host via `composite_over` below)."""
        quads = []  # (x, y, w, h, color, rect | None)
        for el in self.elements:
            if el.kind == "panel":
                quads.append((el.x, el.y, el.w, el.h, el.color, None))
            else:
                cx = el.x
                for ch in el.text:
                    rect = self._rects.get(ch)
                    if rect is not None and ch != " ":
                        quads.append(
                            (cx, el.y, GLYPH_W * el.scale, GLYPH_H * el.scale, el.color, rect)
                        )
                    cx += GLYPH_W * el.scale
        n = max(len(quads), 1)
        records = np.zeros((n, 16), np.float32)
        tex = np.ones((n, 16, 16, 4), np.float32)
        a = self._atlas
        ah, aw = a.shape[:2]
        for i, (x, y, w, h, color, rect) in enumerate(quads):
            records[i, 0] = x
            records[i, 1] = y
            records[i, 2] = w      # e0 = +x edge
            records[i, 3] = 0.0
            records[i, 4] = 0.0    # e1 = +y edge
            records[i, 5] = h
            records[i, 6] = 1.0 / max(w * h, 1e-6)
            records[i, 7:11] = color
            records[i, 11] = 0.0   # cutoff
            records[i, 12] = 0.0   # not masked
            records[i, 13] = 1.0 if rect is not None else 0.0
            records[i, 14] = -1.0  # no entity id
            records[i, 15] = 0.0
            if rect is not None:
                x0, y0, x1, y1 = rect
                ys = np.clip((y0 + (np.arange(16) + 0.5) / 16 * (y1 - y0)) * ah, 0, ah - 1).astype(int)
                xs = np.clip((x0 + (np.arange(16) + 0.5) / 16 * (x1 - x0)) * aw, 0, aw - 1).astype(int)
                tex[i] = a[np.ix_(ys, xs)].astype(np.float32) / 255.0
        return records, tex

    # ------------------------------------------------------------- compositing
    def composite_over(self, frame) -> np.ndarray:
        """CPU-composite the document over an (H, W, 3|4) frame (testing / headless)."""
        out = np.array(np.asarray(frame), np.float32)
        if out.shape[-1] == 3:
            out = np.concatenate([out, np.ones(out.shape[:2] + (1,), np.float32)], -1)
        records, tex = self.build_batch()
        h, w = out.shape[:2]
        for i in range(len(records)):
            r = records[i]
            x0, y0 = int(r[0]), int(r[1])
            qw, qh = int(r[2]), int(r[5])
            if qw <= 0 or qh <= 0:
                continue
            x1, y1 = min(x0 + qw, w), min(y0 + qh, h)
            if x1 <= x0 or y1 <= y0:
                continue
            ys = ((np.arange(y0, y1) - y0) / max(qh, 1) * 15.99).astype(int)
            xs = ((np.arange(x0, x1) - x0) / max(qw, 1) * 15.99).astype(int)
            texel = tex[i][np.ix_(ys, xs)] if r[13] > 0.5 else np.ones((y1 - y0, x1 - x0, 4), np.float32)
            rgba = texel * r[7:11]
            alpha = rgba[..., 3:4]
            out[y0:y1, x0:x1, :3] = out[y0:y1, x0:x1, :3] * (1 - alpha) + rgba[..., :3] * alpha
        return out

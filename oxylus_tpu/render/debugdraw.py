"""Debug renderer: line/triangle/shape accumulation + device line raster.

The reference `DebugRenderer` (`/root/reference/Oxylus/include/Render/
DebugRenderer.hpp:20-53`, cap 10k lines): per-frame queues of lines, triangles, AABBs,
spheres, frustra, capsules that the debug pass draws over the frame. Here shapes
accumulate host-side into fixed-capacity arrays and a vectorized DDA pass rasterizes
them over the final image (the `debug_mesh` pipeline analog).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import math3d

MAX_LINES = 10_000  # DebugRenderer.hpp:32-34


class DebugRenderer:
    MODULE_NAME = "DebugRenderer"

    def __init__(self, capacity: int = MAX_LINES):
        self.capacity = capacity
        self._a = np.zeros((capacity, 3), np.float32)
        self._b = np.zeros((capacity, 3), np.float32)
        self._color = np.zeros((capacity, 3), np.float32)
        self._count = 0

    def init(self, app=None) -> None: ...
    def deinit(self, app=None) -> None: ...

    def reset(self) -> None:
        self._count = 0

    # ------------------------------------------------------------- shapes
    def draw_line(self, a, b, color=(0.0, 1.0, 0.0)) -> None:
        if self._count >= self.capacity:
            return
        i = self._count
        self._a[i] = a
        self._b[i] = b
        self._color[i] = color
        self._count += 1

    def draw_aabb(self, bmin, bmax, color=(0.0, 1.0, 0.0)) -> None:
        bmin = np.asarray(bmin, np.float32)
        bmax = np.asarray(bmax, np.float32)
        xs = [bmin[0], bmax[0]]
        ys = [bmin[1], bmax[1]]
        zs = [bmin[2], bmax[2]]
        corners = np.array([[x, y, z] for x in xs for y in ys for z in zs], np.float32)
        edges = [
            (0, 1), (2, 3), (4, 5), (6, 7),  # z edges
            (0, 2), (1, 3), (4, 6), (5, 7),  # y edges
            (0, 4), (1, 5), (2, 6), (3, 7),  # x edges
        ]
        for i, j in edges:
            self.draw_line(corners[i], corners[j], color)

    def draw_sphere(self, center, radius, color=(0.0, 1.0, 0.0), segments: int = 16) -> None:
        center = np.asarray(center, np.float32)
        t = np.linspace(0, 2 * np.pi, segments + 1)
        for axis in range(3):
            u = np.zeros((len(t), 3), np.float32)
            i, j = (axis + 1) % 3, (axis + 2) % 3
            u[:, i] = np.cos(t) * radius
            u[:, j] = np.sin(t) * radius
            pts = center + u
            for k in range(segments):
                self.draw_line(pts[k], pts[k + 1], color)

    def draw_frustum(self, inv_view_proj, color=(1.0, 1.0, 0.0)) -> None:
        ndc = np.array(
            [[x, y, z, 1.0] for z in (0.001, 1.0) for y in (-1, 1) for x in (-1, 1)], np.float32
        )  # reverse-Z: near plane at z≈0? far z=0, near z=1 — both covered
        world = (np.asarray(inv_view_proj) @ ndc.T).T
        world = world[:, :3] / world[:, 3:4]
        edges = [(0, 1), (1, 3), (3, 2), (2, 0), (4, 5), (5, 7), (7, 6), (6, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
        for i, j in edges:
            self.draw_line(world[i], world[j], color)

    # ------------------------------------------------------------- raster
    def rasterize_over(self, image: jax.Array, view_proj: jax.Array, max_steps: int = 256) -> jax.Array:
        """Overlay all queued lines on `image` (H, W, 3) via sampled line drawing."""
        if self._count == 0:
            return image
        h, w = image.shape[:2]
        n = self._count
        a = jnp.asarray(self._a[:n])
        b = jnp.asarray(self._b[:n])
        col = jnp.asarray(self._color[:n])

        def project(p):
            ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
            clip = jnp.einsum("ij,nj->ni", view_proj, ph)
            wc = clip[..., 3]
            ok = wc > 1e-6
            ndc = clip[..., :2] / jnp.maximum(jnp.abs(wc), 1e-6)[..., None]
            sx = (ndc[..., 0] * 0.5 + 0.5) * w
            sy = (ndc[..., 1] * 0.5 + 0.5) * h
            return sx, sy, ok

        ax, ay, aok = project(a)
        bx, by, bok = project(b)
        ok = aok & bok
        t = jnp.linspace(0.0, 1.0, max_steps)[None, :]  # (1, S)
        px = (ax[:, None] + (bx - ax)[:, None] * t).astype(jnp.int32)  # (N, S)
        py = (ay[:, None] + (by - ay)[:, None] * t).astype(jnp.int32)
        inside = (px >= 0) & (px < w) & (py >= 0) & (py < h) & ok[:, None]
        px = jnp.clip(px, 0, w - 1)
        py = jnp.clip(py, 0, h - 1)
        flat = (py * w + px).reshape(-1)
        colors = jnp.broadcast_to(col[:, None, :], (n, max_steps, 3)).reshape(-1, 3)
        maskf = inside.reshape(-1, 1)
        img_flat = image.reshape(-1, 3)
        img_flat = img_flat.at[flat].max(jnp.where(maskf, colors, -1.0))
        return img_flat.reshape(h, w, 3)

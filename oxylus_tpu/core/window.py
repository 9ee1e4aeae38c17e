"""Window / surface abstraction — headless-first.

The reference wraps SDL3 + a Vulkan swapchain (`/root/reference/Oxylus/include/Render/
Window.hpp`, swapchain in RenderContext). On TPU there is no display: a `Window` is a
present target that receives final frames (device arrays), keeps the latest one, and
can encode to PNG or stream them to a viewer. Resize events flow through the app event
system like the reference's SDL events.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np


@dataclasses.dataclass
class WindowResizeEvent:
    width: int
    height: int


class Window:
    def __init__(self, width: int = 1920, height: int = 1080, title: str = "oxylus_tpu"):
        self.width = width
        self.height = height
        self.title = title
        self.latest_frame: np.ndarray | None = None
        self.presented_frames = 0

    @property
    def extent(self) -> tuple[int, int]:
        return self.width, self.height

    def resize(self, width: int, height: int, event_system=None) -> None:
        self.width = width
        self.height = height
        if event_system is not None:
            event_system.emit(WindowResizeEvent(width, height))

    def present(self, frame) -> None:
        """Accept a (H, W, 3|4) float [0,1] or uint8 frame (device or host array)."""
        frame = np.asarray(frame)
        if frame.dtype != np.uint8:
            frame = (np.clip(frame, 0.0, 1.0) * 255).astype(np.uint8)
        self.latest_frame = frame
        self.presented_frames += 1

    def save_png(self, path) -> Path:
        if self.latest_frame is None:
            raise RuntimeError("no frame presented yet")
        from PIL import Image

        path = Path(path)
        arr = self.latest_frame
        if arr.shape[-1] == 3:
            img = Image.fromarray(arr, "RGB")
        else:
            img = Image.fromarray(arr, "RGBA")
        img.save(path)
        return path

"""Engine module facades + the canonical DefaultModules bundle.

Mirrors the reference's module roster and registration order
(`/root/reference/Oxylus/include/Core/DefaultModules.hpp:17-27`): LuaManager(→Script),
AssetManager, AudioEngine, Physics, Input, NetworkManager, Renderer, DebugRenderer.
Order matters — dependency checks run at add() time like the reference registry.
"""

from __future__ import annotations

from ..assets.manager import AssetManager
from ..audio.engine import AudioEngine
from ..core.input import Input
from ..network.manager import NetworkManager
from ..render.debugdraw import DebugRenderer
from ..scripting.system import ScriptManager


class Physics:
    """Global physics module (reference `Physics`): owns default solver params and
    capacity limits; scenes create their own body arrays at runtime_start."""

    MODULE_NAME = "Physics"
    MAX_BODIES = 1024  # Physics.hpp:20-22
    MAX_BODY_PAIRS = 1024
    MAX_CONTACT_CONSTRAINTS = 1024

    def __init__(self) -> None:
        from ..physics.state import PhysicsParams

        self.params = PhysicsParams()

    def init(self, app=None) -> None: ...
    def deinit(self, app=None) -> None: ...

    def new_params(self, **overrides):
        import dataclasses

        from ..physics.state import PhysicsParams

        return dataclasses.replace(PhysicsParams(), **overrides) if overrides else self.params


class Renderer:
    """Global renderer module (reference `Renderer`): owns the material table, the
    texture atlas (bindless table analog), and shared GPU resources; syncs dirty
    materials from the AssetManager each frame (`src/Render/Renderer.cpp:18-166`)."""

    MODULE_NAME = "Renderer"
    module_dependencies = (AssetManager,)

    def __init__(self, max_materials: int = 1024, atlas_size: int = 2048) -> None:
        self.max_materials = max_materials
        self.atlas_size = atlas_size
        self.materials_gpu = None
        self.atlas_gpu = None
        self.material_slots: dict[str, int] = {}  # material uuid → slot
        self._dirty = True

    def init(self, app=None) -> None:
        import jax.numpy as jnp

        from ..assets.material import empty_gpu_materials

        self.materials_gpu = empty_gpu_materials(self.max_materials)
        self.atlas_gpu = jnp.zeros((self.atlas_size, self.atlas_size, 4), jnp.uint8)

    def deinit(self, app=None) -> None:
        self.materials_gpu = None
        self.atlas_gpu = None

    def mark_dirty(self) -> None:
        self._dirty = True

    def update(self, app=None, ts=None) -> None:
        if not self._dirty or app is None:
            return
        self.sync_materials(app.registry.get(AssetManager))

    def sync_materials(self, asset_manager: AssetManager) -> None:
        """Rebuild the material table + atlas from loaded assets (the reference's
        dirty-material delta upload, done as one repack — see assets/material.py)."""
        import jax.numpy as jnp

        from ..assets.manager import AssetType
        from ..assets.material import pack_materials
        from ..assets.texture import TextureAtlas

        atlas = TextureAtlas(size=self.atlas_size)
        for uuid, tex in asset_manager.loaded_of_type(AssetType.TEXTURE):
            atlas.add(uuid, tex)
        pixels, rects = atlas.build()

        materials = []
        self.material_slots = {}
        for uuid, mat in asset_manager.loaded_of_type(AssetType.MATERIAL):
            self.material_slots[uuid] = len(materials)
            materials.append(mat)
        self.materials_gpu = pack_materials(materials, rects, self.max_materials)
        self.atlas_gpu = jnp.asarray(pixels)
        self._dirty = False


def default_modules() -> list:
    """The canonical bundle, in the reference's registration order."""
    return [
        ScriptManager(),
        AssetManager(),
        AudioEngine(),
        Physics(),
        Input(),
        NetworkManager(),
        Renderer(),
        DebugRenderer(),
    ]

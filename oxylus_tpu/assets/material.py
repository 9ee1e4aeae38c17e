"""Material asset + GPU material SoA.

Host side mirrors the reference `ox::Material` (`/root/reference/Oxylus/include/Asset/
Material.hpp:26-42`); the device side mirrors the packed `GPU::Material`
(`Scene/SceneGPU.hpp:66-81`) re-designed SoA: instead of one packed struct per material,
each field is a (max_materials, …) array — the layout XLA/VPU wants. Texture references
resolve to atlas windows (this engine's bindless table) rather than descriptor indices.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# AlphaMode (Material.hpp:9-13)
ALPHA_OPAQUE = 0
ALPHA_MASK = 1
ALPHA_BLEND = 2

# MaterialFlag bits (SceneGPU.hpp — texture-present + alpha mode flags)
FLAG_HAS_ALBEDO = 1 << 0
FLAG_HAS_NORMAL = 1 << 1
FLAG_HAS_EMISSIVE = 1 << 2
FLAG_HAS_METALLIC_ROUGHNESS = 1 << 3
FLAG_HAS_OCCLUSION = 1 << 4
FLAG_FLIP_X = 1 << 6
FLAG_ALPHA_OPAQUE = 1 << 7
FLAG_ALPHA_MASK = 1 << 8
FLAG_ALPHA_BLEND = 1 << 9

# SamplingMode (Material.hpp:15-22)
SAMPLE_LINEAR_REPEATED = 0
SAMPLE_LINEAR_CLAMPED = 1
SAMPLE_NEAREST_REPEATED = 2
SAMPLE_NEAREST_CLAMPED = 3
SAMPLE_LINEAR_REPEATED_ANISO = 4


@dataclasses.dataclass
class Material:
    """Host material (CPU truth; serialized into .oxasset sidecars)."""

    albedo_color: tuple = (1.0, 1.0, 1.0, 1.0)
    uv_size: tuple = (1.0, 1.0)
    uv_offset: tuple = (0.0, 0.0)
    emissive_color: tuple = (0.0, 0.0, 0.0)
    roughness_factor: float = 0.0
    metallic_factor: float = 0.0
    alpha_mode: int = ALPHA_OPAQUE
    alpha_cutoff: float = 0.1
    sampling_mode: int = SAMPLE_LINEAR_REPEATED
    albedo_texture: str = ""
    normal_texture: str = ""
    emissive_texture: str = ""
    metallic_roughness_texture: str = ""
    occlusion_texture: str = ""

    def to_json(self) -> dict:
        d = dataclasses.asdict(self)
        for k in ("albedo_color", "uv_size", "uv_offset", "emissive_color"):
            d[k] = list(d[k])
        return d

    @classmethod
    def from_json(cls, obj: dict) -> "Material":
        kw = {}
        for f in dataclasses.fields(cls):
            if f.name in obj:
                v = obj[f.name]
                kw[f.name] = tuple(v) if isinstance(v, list) else v
        return cls(**kw)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "albedo_color", "emissive_color", "roughness_factor", "metallic_factor",
        "alpha_cutoff", "flags", "uv_size", "uv_offset",
        "albedo_rect", "normal_rect", "emissive_rect", "mr_rect", "occlusion_rect",
        "sampling_mode",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class GPUMaterials:
    """SoA device mirror of all loaded materials (the reference's global materials
    buffer, `src/Render/Renderer.cpp:18-166`). `*_rect` fields are atlas windows
    (u0, v0, u1, v1) in normalized atlas coordinates; a zero-area rect means
    "texture absent" (check the flags bit)."""

    albedo_color: jax.Array      # (M, 4) f32
    emissive_color: jax.Array    # (M, 3) f32
    roughness_factor: jax.Array  # (M,) f32
    metallic_factor: jax.Array   # (M,) f32
    alpha_cutoff: jax.Array      # (M,) f32
    flags: jax.Array             # (M,) u32
    uv_size: jax.Array           # (M, 2) f32
    uv_offset: jax.Array         # (M, 2) f32
    albedo_rect: jax.Array       # (M, 4) f32
    normal_rect: jax.Array       # (M, 4) f32
    emissive_rect: jax.Array     # (M, 4) f32
    mr_rect: jax.Array           # (M, 4) f32
    occlusion_rect: jax.Array    # (M, 4) f32
    sampling_mode: jax.Array     # (M,) i32

    @property
    def capacity(self) -> int:
        return self.flags.shape[0]


def empty_gpu_materials(capacity: int) -> GPUMaterials:
    m = capacity
    z = lambda *s: jnp.zeros(s, jnp.float32)
    mats = GPUMaterials(
        albedo_color=jnp.ones((m, 4), jnp.float32),
        emissive_color=z(m, 3),
        roughness_factor=z(m),
        metallic_factor=z(m),
        alpha_cutoff=jnp.full((m,), 0.1, jnp.float32),
        flags=jnp.full((m,), FLAG_ALPHA_OPAQUE, jnp.uint32),
        uv_size=jnp.ones((m, 2), jnp.float32),
        uv_offset=z(m, 2),
        albedo_rect=z(m, 4),
        normal_rect=z(m, 4),
        emissive_rect=z(m, 4),
        mr_rect=z(m, 4),
        occlusion_rect=z(m, 4),
        sampling_mode=jnp.zeros((m,), jnp.int32),
    )
    return mats


def pack_materials(materials: list[Material], atlas_rects: dict[str, tuple], capacity: int) -> GPUMaterials:
    """Host bake: material list + texture-uuid→atlas-rect map → device SoA.

    The delta-upload path of the reference (`Renderer.cpp:104-166`) is unnecessary:
    repacking M materials is one fused host→device transfer of a few KB.
    """
    m = capacity
    h = {
        "albedo_color": np.ones((m, 4), np.float32),
        "emissive_color": np.zeros((m, 3), np.float32),
        "roughness_factor": np.zeros(m, np.float32),
        "metallic_factor": np.zeros(m, np.float32),
        "alpha_cutoff": np.full(m, 0.1, np.float32),
        "flags": np.full(m, FLAG_ALPHA_OPAQUE, np.uint32),
        "uv_size": np.ones((m, 2), np.float32),
        "uv_offset": np.zeros((m, 2), np.float32),
        "albedo_rect": np.zeros((m, 4), np.float32),
        "normal_rect": np.zeros((m, 4), np.float32),
        "emissive_rect": np.zeros((m, 4), np.float32),
        "mr_rect": np.zeros((m, 4), np.float32),
        "occlusion_rect": np.zeros((m, 4), np.float32),
        "sampling_mode": np.zeros(m, np.int32),
    }
    alpha_flag = {ALPHA_OPAQUE: FLAG_ALPHA_OPAQUE, ALPHA_MASK: FLAG_ALPHA_MASK, ALPHA_BLEND: FLAG_ALPHA_BLEND}
    tex_flag_rect = (
        ("albedo_texture", FLAG_HAS_ALBEDO, "albedo_rect"),
        ("normal_texture", FLAG_HAS_NORMAL, "normal_rect"),
        ("emissive_texture", FLAG_HAS_EMISSIVE, "emissive_rect"),
        ("metallic_roughness_texture", FLAG_HAS_METALLIC_ROUGHNESS, "mr_rect"),
        ("occlusion_texture", FLAG_HAS_OCCLUSION, "occlusion_rect"),
    )
    for i, mat in enumerate(materials[:m]):
        h["albedo_color"][i] = mat.albedo_color
        h["emissive_color"][i] = mat.emissive_color
        h["roughness_factor"][i] = mat.roughness_factor
        h["metallic_factor"][i] = mat.metallic_factor
        h["alpha_cutoff"][i] = mat.alpha_cutoff
        h["uv_size"][i] = mat.uv_size
        h["uv_offset"][i] = mat.uv_offset
        h["sampling_mode"][i] = mat.sampling_mode
        flags = alpha_flag.get(mat.alpha_mode, FLAG_ALPHA_OPAQUE)
        for attr, bit, rect_key in tex_flag_rect:
            uuid = getattr(mat, attr)
            if uuid and uuid in atlas_rects:
                flags |= bit
                h[rect_key][i] = atlas_rects[uuid]
        h["flags"][i] = flags
    return GPUMaterials(**{k: jnp.asarray(v) for k, v in h.items()})

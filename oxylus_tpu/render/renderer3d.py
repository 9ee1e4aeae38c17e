"""RendererInstance: the per-scene frame graph for the 3D path.

Mirrors the reference's fixed-stage frame graph (`/root/reference/Oxylus/include/Render/
RendererInstance.hpp:11-122`): a `RenderStage` sequence (Initialization → Culling →
VisBufferEncode → VisBufferDecode → Forward2D → Lighting → PostProcessing → Debug →
FinalOutput) with injectable before/after callbacks per stage (`StageDependency` — the
editor uses these for grid/picking/highlight passes) and a named-resource dict passed
between stages (`RenderStageContext`). Here every stage is a pure function from the
resource dict to an updated dict, and the whole graph runs inside one jit.

Capacities are static (`RenderSpec`); the reference's published limits are the defaults.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..ops.cull import cull_instances, cull_meshlets, expand_meshlet_instances
from ..ops.decode3d import decode_visbuffer
from ..ops.raster3d import pack_coeff_matrix, rasterize_pallas, rasterize_reference
from ..ops.setup3d import bin_meshlets_to_tiles, setup_triangles
from .camera import CameraMatrices
from .pbr import Lights, apply_pbr, lights_from_state
from .postfx import (
    adapt_exposure,
    apply_bloom,
    apply_fxaa,
    apply_tonemap,
    luminance_histogram,
)

Array = jax.Array


class RenderStage(enum.Enum):
    INITIALIZATION = "Initialization"
    CULLING = "Culling"
    VISBUFFER_ENCODE = "VisBufferEncode"
    VISBUFFER_DECODE = "VisBufferDecode"
    FORWARD_2D = "Forward2D"
    LIGHTING = "Lighting"
    POST_PROCESSING = "PostProcessing"
    ATMOSPHERE = "Atmosphere"
    DEBUG = "Debug"
    FINAL_OUTPUT = "FinalOutput"


StageCallback = Callable[[dict], dict]


@dataclasses.dataclass(frozen=True)
class RenderSpec:
    """Static capacities (defaults = reference limits, BASELINE.md)."""

    width: int = 1920
    height: int = 1080
    max_meshlet_instances: int = 1 << 16
    max_visible_meshlets: int = 4096
    meshlets_per_tile: int = 64
    use_pallas: bool = True


@dataclasses.dataclass
class RendererInstance:
    spec: RenderSpec
    stage_callbacks: dict[tuple[RenderStage, str], list[StageCallback]] = dataclasses.field(
        default_factory=dict
    )

    def add_stage_callback(self, stage: RenderStage, when: str, cb: StageCallback) -> None:
        """Inject a pass before/after a stage (`StageDependency`, RendererInstance.hpp:30-34)."""
        assert when in ("before", "after")
        self.stage_callbacks.setdefault((stage, when), []).append(cb)

    def _run_cbs(self, stage: RenderStage, when: str, ctx: dict) -> dict:
        for cb in self.stage_callbacks.get((stage, when), []):
            ctx = cb(ctx)
        return ctx

    def render(
        self,
        state,            # SceneState (device)
        gscene,           # GPUScene
        camera: CameraMatrices,
        materials,        # GPUMaterials
        atlas: Array,
        config,           # RendererConfig (host dataclass; static per trace)
        prev: dict | None = None,  # carried frame state (exposure luminance, …)
        ambient_color: Array | None = None,
        background: Array | None = None,
    ) -> dict:
        """Run the frame graph. Returns the resource dict (final image in "final")."""
        spec = self.spec
        w, h = spec.width, spec.height
        prev = prev or {}

        ctx: dict[str, Any] = {
            "state": state,
            "gscene": gscene,
            "camera": camera,
            "materials": materials,
            "atlas": atlas,
            "config": config,
            "width": w,
            "height": h,
        }
        ctx = self._run_cbs(RenderStage.INITIALIZATION, "after", ctx)

        # ---- Culling ------------------------------------------------------
        ctx = self._run_cbs(RenderStage.CULLING, "before", ctx)
        world = state.world
        fov_rad = jnp.radians(60.0)  # proj scale for LOD error; camera-specific
        proj_scale = h / (2.0 * jnp.tan(fov_rad / 2.0))
        vis, lod = cull_instances(
            gscene, world, camera.frustum_planes, camera.position, proj_scale,
            frustum_enabled=config.culling_frustum,
        )
        mi_inst, mi_ml, mi_valid = expand_meshlet_instances(
            gscene, vis, lod, spec.max_meshlet_instances
        )
        vm_inst, vm_ml, vm_valid, vm_count = cull_meshlets(
            gscene, world, mi_inst, mi_ml, mi_valid,
            camera.frustum_planes, camera.position,
            capacity=spec.max_visible_meshlets,
            frustum_enabled=config.culling_frustum,
        )
        ctx.update(vm_instance=vm_inst, vm_meshlet=vm_ml, vm_valid=vm_valid, vm_count=vm_count)
        ctx = self._run_cbs(RenderStage.CULLING, "after", ctx)

        # ---- VisBuffer encode --------------------------------------------
        setup = setup_triangles(
            gscene, world, vm_inst, vm_ml, vm_valid, camera.view_projection, w, h,
            backface_enabled=config.culling_triangle,
        )
        tile_list, overflow = bin_meshlets_to_tiles(setup, w, h, 32, spec.meshlets_per_tile)
        cm = pack_coeff_matrix(setup["coeffs"], setup["tri_valid"])
        platform = jax.devices()[0].platform
        if spec.use_pallas and platform in ("tpu", "axon"):
            depth, vid = rasterize_pallas(cm, tile_list, w, h)
        else:
            depth, vid = rasterize_reference(cm, tile_list, w, h)
        ctx.update(depth=depth, visbuffer=vid, setup=setup, bin_overflow=overflow)
        ctx = self._run_cbs(RenderStage.VISBUFFER_ENCODE, "after", ctx)

        # ---- Decode → GBuffer --------------------------------------------
        gbuffer = decode_visbuffer(
            vid, setup, vm_inst, gscene, world, materials, atlas, width=w, height=h
        )
        ctx["gbuffer"] = gbuffer
        ctx = self._run_cbs(RenderStage.VISBUFFER_DECODE, "after", ctx)

        # ---- Lighting -----------------------------------------------------
        ctx = self._run_cbs(RenderStage.LIGHTING, "before", ctx)
        lights = lights_from_state(state)
        if ambient_color is None:
            ambient_color = jnp.array([0.03, 0.03, 0.03], jnp.float32)
        hdr = apply_pbr(
            gbuffer,
            lights,
            camera.position,
            ambient_color,
            background=background,
            ao=ctx.get("ao"),
            shadow=ctx.get("shadow"),
        )
        ctx["hdr"] = hdr
        ctx = self._run_cbs(RenderStage.LIGHTING, "after", ctx)

        # ---- Post-processing ---------------------------------------------
        ctx = self._run_cbs(RenderStage.POST_PROCESSING, "before", ctx)
        hdr = ctx["hdr"]
        exposure = jnp.float32(config.exposure)
        prev_lum = prev.get("adapt_luminance")
        if prev_lum is not None:
            hist = luminance_histogram(hdr, jnp.float32(-11.5), jnp.float32(1.0 / 29.5))
            auto_exposure, new_lum = adapt_exposure(hist, prev_lum, prev.get("dt", jnp.float32(1 / 60)))
            exposure = exposure * auto_exposure
            ctx["adapt_luminance"] = new_lum
        if config.bloom_enable:
            hdr = apply_bloom(
                hdr,
                threshold=config.bloom_threshold,
                soft_threshold=config.bloom_soft_threshold,
                intensity=config.bloom_intensity,
                clamp_value=config.bloom_clamp,
            )
        ldr = apply_tonemap(
            hdr,
            tonemapper=config.tonemapper,
            exposure=exposure,
            gamma=config.gamma,
            frame=state.frame,
        )
        if config.fxaa_enable:
            ldr = apply_fxaa(ldr)
        ctx["final"] = ldr
        ctx = self._run_cbs(RenderStage.POST_PROCESSING, "after", ctx)
        ctx = self._run_cbs(RenderStage.FINAL_OUTPUT, "after", ctx)
        return ctx

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
from ..utils.imgops import point_downsample as _pds
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
    # fixed-capacity compaction budgets: the compaction sorts scale with these,
    # so keep them near the scene's real meshlet-instance count (a 64K budget
    # for a 5K scene costs ~8 ms/frame of pure sort on this target)
    max_meshlet_instances: int = 1 << 13
    max_visible_meshlets: int = 4096
    meshlets_per_tile: int = 64
    use_pallas: bool = True
    # raster tile edge (px): per-hit resolve cost scales with tile² (VPU-bound)
    # while hit count grows only ~1.6× from 64→32 (sponza occupancy), so dense
    # scenes run 32; 64 keeps the lower fixed cost for sparse scenes
    tile: int = 64
    # triangles per dense raster group (compact_triangles): smaller groups cut
    # per-(slot, pixel) phase-A work at more loop iterations per tile
    raster_group: int = 64
    # post-cull triangle compaction (the reference's cull_triangles re-grouping):
    # pays a combined-row gather (~4.5 ms at 1080p caps) to remove raster dead
    # lanes. Worth it for low-fill imported scenes (sponza); primitive scenes
    # whose baked meshlets are dense + screen-local skip it (trace r5).
    # Only meaningful on the "group" raster path.
    compact_raster: bool = True
    # raster path: "tile" = per-tile TRIANGLE shortlists + loop-free rounds
    # kernel (rasterize_gbuffer_tiles — r5 redesign: only triangles whose bbox
    # overlaps a tile are resolved there, ~8× fewer candidate slots than the
    # group-hit kernel at sponza); "group" = the group-hit kernel
    # (rasterize_gbuffer_pallas), kept for the band-sharded production path
    raster_path: str = "tile"
    # dense triangle entries per tile on the "tile" path (multiple of 64);
    # overflow is counted and gated by the bench — sponza/frame3d max ≈ 194
    tris_per_tile: int = 256
    # stage-1 group-candidate cap for triangle binning: the (T, K·R) candidate
    # mask + rank compare-reduce scale with it, so scenes whose per-tile
    # meshlet occupancy is low (sponza max 21) halve the binning cost at 32
    bin_groups_per_tile: int = 64
    # reduced capacities for the alpha-masked raster pass (usually a handful
    # of banner/foliage meshlets): its prep is fixed-shape in T·K2, so a
    # small pass at full opaque capacities would cost ~5 ms for 8 banners
    tris_per_tile_masked: int = 128
    bin_groups_masked: int = 16
    # reduced capacities for the LATE occlusion pass: it rasters only
    # newly-revealed geometry (typically edges around moved objects), but its
    # prep is fixed-shape — full opaque capacities cost ~5 ms/frame on
    # dynamic scenes (frame5 trace r5). Overflow is counted + bench-gated.
    tris_per_tile_late: int = 128
    bin_groups_late: int = 32
    # tests only: run the Pallas G-buffer path in interpret mode on CPU so the
    # production frame graph (dense compaction, texturing, alpha masking) is
    # CI-coverable without a TPU
    gbuffer_interpret: bool = False


@dataclasses.dataclass
class RendererInstance:
    spec: RenderSpec
    stage_callbacks: dict[tuple[RenderStage, str], list[StageCallback]] = dataclasses.field(
        default_factory=dict
    )
    _sky_cache: dict = dataclasses.field(default_factory=dict)

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
        prev: dict | None = None,  # carried frame state (exposure luminance, HiZ, …)
        ambient_color: Array | None = None,
        background: Array | None = None,
        atmosphere=None,  # AtmosphereParams (static) — enables the sky chain
        enable_shadows: bool = False,
        enable_gtao: bool | None = None,
        sun_intensity: Array | float = 10.0,
        first_clipmap_width: float = 10.0,
        textured: bool = False,  # static: enables texture sampling on the
        # Pallas G-buffer path (the XLA decode path always samples textures)
        texture_features: tuple = ("albedo", "normal", "mr", "emissive"),
        # static: which texture kinds to sample on the Pallas path — pass only
        # the kinds the scene's materials actually carry (runtime.py computes
        # this from the material flag bits) so absent maps cost nothing
        particles: bool = False,  # static: composite particle billboards after
        # lighting (the reference's Forward2D stage — scenes without emitters
        # compile the whole pass out)
        alpha_masked: bool = False,  # static: raster alpha-masked materials in
        # a separate depth-tested pass with per-pixel alpha-cutoff discard
        # (visbuffer_encode.slang:60-64) — scenes without masked materials
        # compile the pass out
        static_lights: int = 8,  # static: lights covered by trace-time-unrolled
        # PBR blocks — the runner passes the scene's own light count so the
        # dynamic tail loop (a 1-trip while costs ~6 ms/frame at 1080p:
        # non-fused body + carry copies — trace r5) never runs for them
    ) -> dict:
        """Run the frame graph. Returns the resource dict (final image in "final",
        carry-over state under "carry" — feed it back as `prev` next frame)."""
        spec = self.spec
        w, h = spec.width, spec.height
        prev = prev or {}
        carry: dict[str, Any] = {}

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
        # derive the vertical FOV from the camera's ACTUAL projection matrix:
        # perspective_reverse_z has proj[1,1] = 1/tan(fov/2) (render/camera.py),
        # so LOD projected-error scaling and sky rays track any camera fov —
        # a hardcoded 60° mis-scaled LOD error and bent sky/geometry agreement
        # for the fov-65 sponza bench camera (round-4 VERDICT #7). Orthographic
        # cameras (proj[3,2]==0) keep a neutral scale.
        is_persp = jnp.abs(camera.projection[3, 2]) > 1e-8
        inv_tan_half = jnp.where(is_persp, jnp.abs(camera.projection[1, 1]), 1.0)
        proj_scale = h * inv_tan_half / 2.0
        vis, lod = cull_instances(
            gscene, world, camera.frustum_planes, camera.position, proj_scale,
            frustum_enabled=config.culling_frustum,
        )
        mi_inst, mi_ml, mi_valid, expand_overflow = expand_meshlet_instances(
            gscene, vis, lod, spec.max_meshlet_instances, with_overflow=True
        )
        vm_inst, vm_ml, vm_valid, vm_count = cull_meshlets(
            gscene, world, mi_inst, mi_ml, mi_valid,
            camera.frustum_planes, camera.position,
            capacity=spec.max_visible_meshlets,
            frustum_enabled=config.culling_frustum,
            depth_sort=True,  # front-to-back tile lists → raster coverage early-out
        )
        ctx.update(vm_instance=vm_inst, vm_meshlet=vm_ml, vm_valid=vm_valid, vm_count=vm_count)
        ctx["vm_meshlet"] = vm_ml
        ctx = self._run_cbs(RenderStage.CULLING, "after", ctx)

        # ---- VisBuffer encode (two-pass occlusion protocol) ---------------
        setup = setup_triangles(
            gscene, world, vm_inst, vm_ml, vm_valid, camera.view_projection, w, h,
            backface_enabled=config.culling_triangle,
        )
        cm = pack_coeff_matrix(setup["coeffs"], setup["tri_valid"])
        platform = jax.devices()[0].platform
        use_gbuffer_raster = spec.use_pallas and (
            platform in ("tpu", "axon") or spec.gbuffer_interpret
        )
        # dense slot stride for vid maps: the tile path tables per-(tile, entry)
        # with K2 entries; the group path tables per dense group slot
        use_tile_raster = spec.raster_path == "tile"
        if use_tile_raster:
            n_slots_r = spec.tris_per_tile
        else:
            n_slots_r = spec.raster_group if spec.compact_raster else 64
        if use_gbuffer_raster:
            # G-buffer raster: attributes + material constants interpolated inside
            # the kernel (the per-pixel decode gather pass costs ~0.5 s at 1080p on
            # this target — PERF_NOTES.md). Each pass first re-groups its
            # surviving triangles into DENSE raster meshlets (compact_triangles
            # — the reference's cull_triangles compaction): baked meshlets
            # average ~36% fill on sponza and phase A pays per (slot, pixel),
            # so dead lanes were 2.8× of the dominant raster cost (trace r4).
            from ..ops.raster3d import (
                build_tile_comb,
                gbuffer_from_raster,
                pack_gbuffer_coeff_matrix,
                pack_tile_blocks,
                rasterize_gbuffer_pallas,
                rasterize_gbuffer_tiles,
            )
            from ..ops.setup3d import (
                bin_triangles_per_tile,
                compact_triangles,
                passthrough_bounds,
                passthrough_groups,
            )

            mat_idx = gscene.inst_material[vm_inst]  # (VM,) per source meshlet
            if alpha_masked:
                from ..assets.material import FLAG_ALPHA_MASK

                # meshlets whose material discards below the alpha cutoff
                # raster in their own pass (merged with per-pixel alpha test
                # below); the opaque pass excludes them
                is_masked_vm = (materials.flags[mat_idx] & FLAG_ALPHA_MASK) > 0
                opaque_f = ~is_masked_vm
            else:
                opaque_f = None
            consts_m = jnp.concatenate(
                [
                    materials.albedo_color[:, :3],
                    materials.metallic_factor[:, None],
                    materials.roughness_factor[:, None],
                    materials.emissive_color,
                ],
                axis=1,
            )  # (M, 8) material-indexed constants
            if textured:
                # full material rows ride the compaction gather so the textured
                # path's per-pixel resolve is ONE gather (slot_rows[flat]) —
                # the slot→material→row two-gather chain cost 4.6 ms (trace r4)
                from ..ops.sampling import pack_material_tables as _pmt_r

                mat_tab_r = _pmt_r(materials)
            else:
                mat_tab_r = None
            if use_tile_raster:
                # the combined per-slot row matrix (attrB + coeffs + tables)
                # is built ONCE from the full visible set and shared by the
                # opaque/late/masked passes — the ~60 MB concat cost 1.4 ms
                # per pass (trace r5); per-pass entries only reference
                # pass-valid slots so sharing is exact
                dense_full = passthrough_groups(
                    setup, setup["tri_valid"], mat_idx, vm_inst
                )
                comb_shared = build_tile_comb(
                    dense_full, consts_m[dense_full["slot_material"]], mat_tab_r
                )

        def raster_pass(vis_mask, tri_filter=None, k2=None, k_groups=None):
            """One G-buffer raster pass. Returns (depth, vid, gb, bin_overflow,
            slot_tables) where slot_tables = (material, instance,
            packed_id[, mat_rows]) per dense slot. `tri_filter` (VM,) restricts
            the pass to a meshlet subset (the opaque/alpha-masked split).

            Tile path (default): per-tile TRIANGLE shortlists → loop-free
            rounds kernel; slot tables are per-(tile, entry), vid =
            (tile << 8) | entry. `k2`/`k_groups` override the pass's entry and
            candidate capacities — the prep is fixed-shape in T·K2, so a tiny
            pass (the 8-banner masked pass) runs at a fraction of the opaque
            capacities, with its tables stride-padded back to the global K2.
            Group path: compact/passthrough groups → group-hit kernel (kept
            for band sharding)."""
            tri_mask = setup["tri_valid"] & vis_mask[:, None]
            if tri_filter is not None:
                tri_mask = tri_mask & tri_filter[:, None]
            if use_tile_raster:
                k2_p = k2 or spec.tris_per_tile
                bounds = passthrough_bounds(setup, tri_mask)
                entries, cnts, ov = bin_triangles_per_tile(
                    bounds, w, h, spec.tile,
                    k_groups or spec.bin_groups_per_tile, k2_p,
                )
                blocks = pack_tile_blocks(None, entries, comb=comb_shared)
                d, v, gb = rasterize_gbuffer_tiles(
                    blocks, cnts, w, h, tile=spec.tile,
                    interpret=spec.gbuffer_interpret,
                )
                tables = blocks["tables"]
                if k2_p != n_slots_r:
                    # stride-pad per-tile tables to the global entry stride so
                    # flat = (vid >> 8)·n_slots_r + entry indexes uniformly
                    # across concatenated passes
                    def pad_tab(t, fill):
                        t2 = t.reshape(-1, k2_p, *t.shape[1:])
                        pad = [(0, 0)] * t2.ndim
                        pad[1] = (0, n_slots_r - k2_p)
                        return jnp.pad(t2, pad, constant_values=fill).reshape(
                            -1, *t.shape[1:]
                        )
                    tables = tuple(
                        pad_tab(t, -1 if i == 2 else 0)
                        for i, t in enumerate(tables)
                    )
                return d, v, gb, ov, tables
            if spec.compact_raster:
                dense = compact_triangles(
                    setup, tri_mask, mat_idx, vm_inst,
                    group=spec.raster_group, width=float(w), height=float(h),
                    mat_rows=mat_tab_r,
                )
            else:
                dense = passthrough_groups(setup, tri_mask, mat_idx, vm_inst,
                                           mat_rows=mat_tab_r)
            cm_gb, attr_gb = pack_gbuffer_coeff_matrix(
                dense["coeffs"], dense["attr_planes"], dense["tri_valid"],
                consts_m[dense["slot_material"]],
            )
            near_eo = jnp.flip(jax.lax.cummax(jnp.flip(dense["ml_near"])))
            tile_list, ov = bin_meshlets_to_tiles(
                dense, w, h, spec.tile, spec.meshlets_per_tile
            )
            d, v, gb = rasterize_gbuffer_pallas(
                cm_gb, attr_gb, tile_list, w, h, ml_near=near_eo, tile=spec.tile,
                interpret=spec.gbuffer_interpret,
            )
            tables = (
                dense["slot_material"].reshape(-1),
                dense["slot_instance"].reshape(-1),
                dense["packed_id"].reshape(-1),
            )
            if mat_tab_r is not None:
                tables = tables + (dense["slot_rows"],)
            return d, v, gb, ov, tables

        def raster_full(tile_list):
            """One raster pass → (depth, vid, gbuffer-or-None) [fallback kernels]."""
            fn = (
                rasterize_pallas
                if (spec.use_pallas and platform in ("tpu", "axon"))
                else rasterize_reference
            )
            d, v = fn(cm, tile_list, w, h)
            return d, v, None

        # conservative nearest depth per meshlet for occlusion testing
        ml_near = jnp.max(
            jnp.where(setup["tri_valid"], jnp.max(setup["sxyz"][..., 2], axis=-1), -1.0),
            axis=-1,
        )
        def masked_bin(visible_mask):
            masked = dict(setup)
            masked["ml_xmax"] = jnp.where(visible_mask, setup["ml_xmax"], -1e9)
            masked["ml_xmin"] = jnp.where(visible_mask, setup["ml_xmin"], 1e9)
            _RT = spec.tile if use_gbuffer_raster else 64  # fallback kernels are 64-px
            return bin_meshlets_to_tiles(masked, w, h, _RT, spec.meshlets_per_tile)

        slot_tables = None  # (material, instance, packed_id) per dense slot
        use_occlusion = config.culling_occlusion and "hiz" in prev
        if use_occlusion:
            from ..ops.hiz import build_hiz, occlusion_test

            early_vis = occlusion_test(
                prev["hiz"], setup["ml_xmin"], setup["ml_xmax"],
                setup["ml_ymin"], setup["ml_ymax"], ml_near, w, h,
            ) & vm_valid
            if use_gbuffer_raster:
                depth, vid, gb_img, overflow, slot_tables = raster_pass(early_vis, opaque_f)
            else:
                tile_list, overflow = masked_bin(early_vis)
                depth, vid, gb_img = raster_full(tile_list)
            hiz = build_hiz(depth)
            late_vis = occlusion_test(
                hiz, setup["ml_xmin"], setup["ml_xmax"],
                setup["ml_ymin"], setup["ml_ymax"], ml_near, w, h,
            ) & vm_valid & ~early_vis

            # the late pass only exists when something was revealed this frame —
            # skip the second raster + G-buffer merge + HiZ rebuild entirely
            # otherwise (the steady-state static-scene frame)
            def late_pass():
                if use_gbuffer_raster:
                    d2, v2, gb2, overflow2, tables2 = raster_pass(
                        late_vis, opaque_f,
                        k2=min(spec.tris_per_tile_late, spec.tris_per_tile),
                        k_groups=min(spec.bin_groups_late, spec.bin_groups_per_tile),
                    )
                    # late vids index the late pass's dense slots: offset into
                    # the second half of the combined slot tables
                    groups_per_pass = tables2[0].shape[0] // n_slots_r
                    v2 = jnp.where(v2 >= 0, v2 + groups_per_pass * 256, v2)
                else:
                    tile_list2, overflow2 = masked_bin(late_vis)
                    d2, v2, gb2 = raster_full(tile_list2)
                    tables2 = None
                better = d2 > depth
                d = jnp.where(better, d2, depth)
                v = jnp.where(better, v2, vid)
                gb = (
                    jnp.where(better[..., None], gb2, gb_img)
                    if gb_img is not None
                    else jnp.zeros((), jnp.float32)
                )
                out = (d, v, gb, build_hiz(d), overflow2)
                return out + tables2 if tables2 is not None else out

            def skip_late():
                gb = gb_img if gb_img is not None else jnp.zeros((), jnp.float32)
                out = (depth, vid, gb, hiz, jnp.int32(0))
                if use_gbuffer_raster:
                    out = out + tuple(jnp.zeros_like(t) for t in slot_tables)
                return out

            res = jax.lax.cond(jnp.any(late_vis), late_pass, skip_late)
            depth, vid, gb_merged, hiz_out, overflow2 = res[:5]
            if use_gbuffer_raster:
                # combined tables: early slots first, late slots after
                slot_tables = tuple(
                    jnp.concatenate([a, b]) for a, b in zip(slot_tables, res[5:])
                )
            gb_img = gb_merged if gb_img is not None else None
            carry["hiz"] = hiz_out
            overflow = overflow + overflow2
        else:
            from ..ops.hiz import build_hiz

            if use_gbuffer_raster:
                depth, vid, gb_img, overflow, slot_tables = raster_pass(vm_valid, opaque_f)
            else:
                tile_list, overflow = masked_bin(vm_valid)
                depth, vid, gb_img = raster_full(tile_list)
            if config.culling_occlusion:
                carry["hiz"] = build_hiz(depth)

        # ---- alpha-masked geometry: own raster pass + per-pixel cutoff ----
        # The reference's visbuffer encode discards fragments below the
        # material alpha cutoff (`visbuffer_encode.slang:60-64`). TPU-shaped
        # equivalent: masked meshlets raster in a second depth pass; the
        # nearest masked fragment samples its albedo alpha (half-res tap, like
        # all material sampling on this target) and wins the pixel only when
        # alpha ≥ cutoff AND it is nearer than the opaque result. Two stacked
        # masked layers resolve to the nearest (documented approximation —
        # the reference discards within the HW depth test so arbitrarily many
        # layers resolve). Masked geometry is excluded from HiZ (conservative).
        if use_gbuffer_raster and alpha_masked:
            from ..ops.sampling import (
                pack_atlas_taps as _pat,
                pack_material_tables as _pmt,
                sample_material_textures as _smt,
            )

            vis_all = (early_vis | late_vis) if use_occlusion else vm_valid
            d_m, v_m, gb_m, ov_m, tabs_m = raster_pass(
                vis_all, is_masked_vm,
                k2=min(spec.tris_per_tile_masked, spec.tris_per_tile),
                k_groups=min(spec.bin_groups_masked, spec.bin_groups_per_tile),
            )
            # flat (N, C) forms throughout — (h/2, w/2, 32) intermediates cost
            # ~1.3 ms of layout copies/slice relayouts (trace r5, see the
            # textured decode below)
            uv_mh = _pds(gb_m[..., 3:5].astype(jnp.float32), 2).reshape(-1, 2)
            v_mh = _pds(v_m, 2)
            mh2, mw2 = v_mh.shape
            flat_mh = jnp.clip(
                (v_mh >> 8) * n_slots_r + (v_mh & 255), 0, tabs_m[0].shape[0] - 1
            ).reshape(-1)
            if len(tabs_m) > 3:  # textured: rows rode the compaction gather
                rows_m = tabs_m[3][flat_mh].astype(jnp.float32)
            else:
                rows_m = _pmt(materials)[tabs_m[0][flat_mh]]
            tex_m = _smt(rows_m, _pat(atlas, dtype=jnp.bfloat16), atlas.shape[0], uv_mh, features=("albedo",))
            # signed alpha margin upsampled to full res → smooth cutout edges
            margin_h = jnp.where(
                v_mh.reshape(-1) >= 0, tex_m["alpha"][..., 0] - rows_m[..., 25], -1.0
            ).reshape(mh2, mw2)
            alpha_ok = (
                jax.image.resize(margin_h, (h, w), method="linear") >= 0.0
            )
            use_m = (v_m >= 0) & alpha_ok & (d_m > depth)
            seg = slot_tables[0].shape[0] // n_slots_r  # groups already tabled
            vid = jnp.where(use_m, v_m + seg * 256, vid)
            depth = jnp.where(use_m, d_m, depth)
            gb_img = jnp.where(use_m[..., None], gb_m, gb_img)
            slot_tables = tuple(
                jnp.concatenate([a, b]) for a, b in zip(slot_tables, tabs_m)
            )
            overflow = overflow + ov_m
        ctx.update(
            depth=depth, visbuffer=vid, setup=setup, bin_overflow=overflow,
            expand_overflow=expand_overflow,
        )
        if slot_tables is not None:
            # per-dense-slot (material, instance, original packed id) — how
            # picking/debug views/texturing resolve the compacted vids
            ctx["slot_material"] = slot_tables[0]
            ctx["slot_instance"] = slot_tables[1]
            ctx["slot_packed_id"] = slot_tables[2]
            ctx["slot_group"] = n_slots_r
        # surfaced through the frame carry so callers (bench integrity gates,
        # editor stats) can assert no fixed-capacity compaction dropped work
        carry["expand_overflow"] = expand_overflow
        carry["bin_overflow"] = overflow
        ctx = self._run_cbs(RenderStage.VISBUFFER_ENCODE, "after", ctx)

        # ---- Decode → GBuffer --------------------------------------------
        if use_gbuffer_raster:
            gbuffer = gbuffer_from_raster(
                gb_img, vid, depth, jnp.linalg.inv(camera.view_projection)
            )
            if textured:
                # material texture sampling for the Pallas path: the G-buffer
                # raster interpolates material CONSTANTS in-kernel; texture
                # detail multiplies in here at half res (gathers price per
                # gathered row — PERF_NOTES.md — so full-res sampling would be
                # ~10 ms/texture at 1080p) then bilinearly upsamples. The
                # reference samples in visbuffer_decode at full rate on HW TMUs
                # (`visbuffer_decode.slang:123-193`); on this target textures
                # are low-frequency relative to geometry and the half-rate
                # trade is the TPU-shaped equivalent. Every texture kind the
                # reference samples rides here: albedo, normal (tangent-space
                # perturbation), metallic-roughness (+shared-rect occlusion),
                # emissive — each gated at trace time by `texture_features` so
                # scenes without that map pay nothing.
                from ..ops.sampling import (
                    pack_atlas_taps,
                    perturb_normal,
                    sample_material_textures,
                )

                # Everything here works on FLAT (N, C) arrays: the (h/2, w/2, 32)
                # intermediate forms tile terribly on TPU (32-lane minor dim) and
                # cost ~1.3 ms/frame of pure layout copies + per-lane slice
                # relayouts (trace r5: copy.19360 0.50 + slice.3955 0.79). Flat
                # 2D rows keep every lane slice a cheap in-tile slice; results
                # reshape to (h2, w2, C) once, right before the upsample.
                uv_h = _pds(gbuffer["uv"], 2).reshape(-1, 2)
                vid_h = _pds(vid, 2)
                h2, w2 = vid_h.shape
                n_tab = slot_tables[0].shape[0]

                def slot_rows_at(vid_img):
                    # vid encodes (dense_group << 8 | slot) — the winning slot's
                    # FULL material row rode the compaction gather (slot_rows),
                    # so the per-pixel resolve is ONE flat row gather. Misses
                    # (vid < 0) gather row 0 via the clip; masked by valid below.
                    flat = jnp.clip(
                        (vid_img >> 8) * n_slots_r + (vid_img & 255), 0, n_tab - 1
                    ).reshape(-1)
                    # table is f16 (6x faster gather — probe_gather r5);
                    # consumers work in f32
                    return slot_tables[3][flat].astype(jnp.float32)

                mat_rows = slot_rows_at(vid_h)
                taps = pack_atlas_taps(atlas, dtype=jnp.bfloat16)
                # albedo + normal at half res; mr/emissive/occlusion at QUARTER
                # res (low-frequency factors; gathers price per row). The
                # quarter-res rows are RE-GATHERED from the quarter-res vid
                # (130k rows ≈ 1.1 ms) — downsampling the half-res row image
                # materialized the bad (h/2, w/2, 32) layout it existed to avoid.
                hi_feats = tuple(f for f in texture_features if f in ("albedo", "normal"))
                lo_feats = tuple(f for f in texture_features if f in ("mr", "emissive"))
                tex = sample_material_textures(
                    mat_rows, taps, atlas.shape[0], uv_h, features=hi_feats,
                )
                if lo_feats:
                    vid_q = _pds(vid, 4)
                    hq, wq = vid_q.shape
                    tex_q = sample_material_textures(
                        slot_rows_at(vid_q), taps, atlas.shape[0],
                        _pds(gbuffer["uv"], 4).reshape(-1, 2), features=lo_feats,
                    )
                valid_h = (vid_h >= 0).reshape(-1, 1)
                if lo_feats:
                    valid_q = (vid_q >= 0).reshape(-1, 1)

                # ONE packed upsample per rate: each jax.image.resize carries
                # ~0.1 ms of fixed cost and the per-feature chain ran 6 of
                # them (~2 ms/frame, trace r5) — concatenate every sampled
                # factor of a rate into one (·, ·, C) resize and slice lanes
                # at full res (bilinear is per-channel, so values are equal)
                gbuffer = dict(gbuffer)
                hi_parts, hi_lanes = [], {}
                if "albedo" in hi_feats:
                    hi_lanes["albedo"] = 0
                    hi_parts.append(jnp.where(valid_h, tex["albedo_rgb"], 1.0))
                if "normal" in hi_feats:
                    hi_lanes["normal"] = sum(p.shape[-1] for p in hi_parts)
                    hi_parts.append(jnp.where(
                        valid_h, tex["normal_ts"], jnp.array([0.0, 0.0, 1.0])
                    ))
                if hi_parts:
                    hc = sum(p.shape[-1] for p in hi_parts)
                    hi_full = jax.image.resize(
                        jnp.concatenate(hi_parts, -1).reshape(h2, w2, hc),
                        (h, w, hc), method="linear",
                    )
                if lo_feats:
                    lo_parts, lo_lanes = [], {}
                    if "mr" in lo_feats:
                        lo_lanes["mr"] = 0
                        lo_parts.append(jnp.where(valid_q, tex_q["mr"], 1.0))
                        lo_lanes["occ"] = 2
                        lo_parts.append(jnp.where(valid_q, tex_q["occlusion"], 1.0))
                    if "emissive" in lo_feats:
                        lo_lanes["emissive"] = sum(p.shape[-1] for p in lo_parts)
                        lo_parts.append(
                            jnp.where(valid_q, tex_q["emissive_rgb"], 1.0)
                        )
                    lc = sum(p.shape[-1] for p in lo_parts)
                    lo_full = jax.image.resize(
                        jnp.concatenate(lo_parts, -1).reshape(hq, wq, lc),
                        (h, w, lc), method="linear",
                    )
                if "albedo" in texture_features:
                    o = hi_lanes["albedo"]
                    gbuffer["albedo"] = gbuffer["albedo"] * hi_full[..., o : o + 3]
                if "mr" in texture_features:
                    o = lo_lanes["mr"]
                    gbuffer["metallic"] = gbuffer["metallic"] * lo_full[..., o]
                    gbuffer["roughness"] = gbuffer["roughness"] * lo_full[..., o + 1]
                    gbuffer["occlusion"] = (
                        gbuffer["occlusion"] * lo_full[..., lo_lanes["occ"]]
                    )
                if "emissive" in texture_features:
                    o = lo_lanes["emissive"]
                    gbuffer["emissive"] = gbuffer["emissive"] * lo_full[..., o : o + 3]
                if "normal" in texture_features:
                    # tangent-space normal sampled at half res, perturbation at
                    # FULL res against the full-res interpolated frame (the
                    # frame is geometry-rate; only the sampled detail is half)
                    o = hi_lanes["normal"]
                    gbuffer["normal"] = jnp.where(
                        gbuffer["hit"][..., None],
                        perturb_normal(
                            gbuffer["normal"], gbuffer["tangent"],
                            hi_full[..., o : o + 3],
                        ),
                        gbuffer["normal"],
                    )
        else:
            gbuffer = decode_visbuffer(
                vid, setup, vm_inst, gscene, world, materials, atlas, width=w, height=h
            )
        ctx["gbuffer"] = gbuffer
        ctx = self._run_cbs(RenderStage.VISBUFFER_DECODE, "after", ctx)

        # ---- Lights -------------------------------------------------------
        lights = lights_from_state(state)
        ctx["lights"] = lights
        # first directional light drives sun/shadows
        is_dir = (lights.kind == 0) & lights.valid
        sun_idx = jnp.argmax(is_dir)
        has_sun = jnp.any(is_dir)
        sun_dir = jnp.where(has_sun, lights.direction[sun_idx], jnp.array([0.0, -1.0, 0.0]))

        # ---- static-frame memoization ------------------------------------
        # Screen-space terms that are pure functions of (scene transforms,
        # sun, camera) — the resolved shadow term, GTAO, the aerial LUT apply
        # — are reused verbatim on frames where none of those changed (the
        # steady state of a static scene; ~3 ms/frame combined at 1080p).
        # The transform signature is an EXACT xor-reduce of the world-matrix
        # bit patterns, so any moving entity recomputes everything; with
        # buffer donation the cond's cached branch is an aliased carry, not a
        # copy. This is the same dirty-key design as the sky-LUT/shadow-page
        # caches (and the reference's own dirty-flag systems).
        world_sig = jax.lax.reduce(
            jax.lax.bitcast_convert_type(world, jnp.int32),
            jnp.int32(0), jax.lax.bitwise_xor, (0, 1, 2),
        )
        static_key_now = jnp.concatenate([
            jax.lax.bitcast_convert_type(world_sig[None], jnp.float32),
            sun_dir, camera.position, camera.forward, camera.up,
        ])
        _sk = "static_term_key"
        if _sk in prev:
            _static_dirty = jnp.any(prev[_sk] != static_key_now)
        else:
            _static_dirty = None  # first frame: always compute
        carry[_sk] = static_key_now

        def _static_cached(name, compute):
            """Memoize a static-frame term in the carry under the static key."""
            if _static_dirty is None or name not in prev:
                out = compute()
            else:
                out = jax.lax.cond(_static_dirty, compute, lambda: prev[name])
            carry[name] = out
            return out

        # ---- Atmosphere ---------------------------------------------------
        if atmosphere is not None:
            from .sky import (
                multiscatter_lut,
                sample_sky_view,
                sky_ambient,
                sky_view_lut,
                transmittance_lut,
            )

            key = atmosphere
            if key not in self._sky_cache:
                t_lut = transmittance_lut(atmosphere)
                ms_lut = multiscatter_lut(atmosphere, t_lut)
                self._sky_cache[key] = (t_lut, ms_lut)
            t_lut, ms_lut = self._sky_cache[key]
            # the sky-view LUT is a pure function of (sun, intensity); re-raymarch
            # only when the sun moved (the reference recomputes per frame on GPU,
            # but on this target the LUT march is ~tens of ms — frame-cache it)
            sky_key_now = jnp.concatenate(
                [sun_dir, jnp.atleast_1d(jnp.asarray(sun_intensity, jnp.float32))]
            )

            def compute_sky_lut():
                return sky_view_lut(
                    atmosphere, t_lut, ms_lut, -sun_dir,
                    sun_intensity=jnp.asarray(sun_intensity),
                )

            if "sky_view_lut" in prev and "sky_key" in prev:
                sun_moved = jnp.any(jnp.abs(sky_key_now - prev["sky_key"]) > 1e-7)
                sky_lut = jax.lax.cond(
                    sun_moved, compute_sky_lut, lambda: prev["sky_view_lut"]
                )
            else:
                sky_lut = compute_sky_lut()
            carry["sky_view_lut"] = sky_lut
            carry["sky_key"] = sky_key_now
            # per-pixel view rays for the background
            xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
            ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0 - 1.0
            tan_half = 1.0 / inv_tan_half  # camera's true fov (see proj_scale)
            aspect = w / h
            dirs = (
                camera.forward[None, None, :]
                + camera.right[None, None, :] * (xs[None, :, None] * tan_half * aspect)
                - camera.up[None, None, :] * (ys[:, None, None] * tan_half)
            )
            # background sampled at half resolution (a full-res bilinear LUT fetch
            # is ~4 gathers × 15 ms; the sky is smooth) and upsampled; re-sampled
            # only when the camera or sun moved
            cam_key_now = jnp.concatenate(
                [sky_key_now, camera.forward, camera.right, camera.up]
            )

            def compute_background():
                bg_half = sample_sky_view(sky_lut, _pds(dirs, 2))
                return jax.image.resize(bg_half, (h, w, 3), method="linear")

            if "sky_background" in prev and "sky_cam_key" in prev:
                view_moved = jnp.any(jnp.abs(cam_key_now - prev["sky_cam_key"]) > 1e-7)
                background = jax.lax.cond(
                    view_moved, compute_background, lambda: prev["sky_background"]
                )
            else:
                background = compute_background()
            carry["sky_background"] = background
            carry["sky_cam_key"] = cam_key_now

            if ambient_color is None:
                from .sky import sky_sh_ambient

                def compute_ambient():
                    return sky_sh_ambient(sky_lut) * 0.3  # (9,3) SH IBL

                if "sky_ambient" in prev and "sky_key" in prev:
                    ambient_color = jax.lax.cond(
                        jnp.any(jnp.abs(sky_key_now - prev["sky_key"]) > 1e-7),
                        compute_ambient,
                        lambda: prev["sky_ambient"],
                    )
                else:
                    ambient_color = compute_ambient()
                carry["sky_ambient"] = ambient_color
            ctx["sky_view_lut"] = sky_lut
            ctx["_sky_luts"] = (t_lut, ms_lut)
        ctx = self._run_cbs(RenderStage.ATMOSPHERE, "after", ctx)

        # ---- Shadows ------------------------------------------------------
        shadow = None
        if enable_shadows:
            from .shadows import (
                clipmap_matrices,
                contact_shadows as contact_fn,
                mark_visible_pages,
                render_shadow_clipmaps_cached,
                resolve_shadows,
            )

            light_vps = clipmap_matrices(
                sun_dir, camera.position, first_width=first_clipmap_width
            )
            # RMVSM residency: only shadow pages sampled by this frame's shaded
            # pixels are rendered (mark_visible_pages ≙ rmvsm_mark_visible_pages)
            vis_pages = mark_visible_pages(
                _pds(gbuffer["world_pos"], 8), _pds(gbuffer["hit"], 8), light_vps
            )
            shadow_maps, shadow_carry = render_shadow_clipmaps_cached(
                gscene, world, light_vps, prev.get("shadow_cache"),
                visible_pages=vis_pages,
            )
            carry["shadow_cache"] = shadow_carry
            ctx["shadow_maps"] = shadow_maps

            def compute_shadow_term():
                # resolve at quarter res: gather cost scales with gathered rows
                # (~10 ns/row — PERF_NOTES.md), the PCF lookup is 4 image
                # gathers; shadows upsample well
                shadow_h = resolve_shadows(
                    _pds(gbuffer["world_pos"], 4), _pds(gbuffer["hit"], 4),
                    light_vps, shadow_maps,
                )
                sh = jax.image.resize(shadow_h, (h, w), method="linear")
                if config.contact_shadows:
                    # 1/8-res march (each step is a full-image gather, ~15 ms
                    # at full res — PERF_NOTES.md); contact shadows upsample
                    cs4 = contact_fn(
                        _pds(depth, 8), _pds(gbuffer["world_pos"], 8),
                        _pds(gbuffer["hit"], 8), sun_dir,
                        camera.view_projection,
                        steps=config.contact_shadows_steps,
                        thickness=config.contact_shadows_thickness,
                        length=max(config.contact_shadows_length, 0.05),
                    )
                    sh = sh * jax.image.resize(cs4, (h, w), method="linear")
                return sh

            shadow = _static_cached("shadow_full", compute_shadow_term)
            ctx["shadow"] = shadow

        # ---- GTAO ---------------------------------------------------------
        ao = None
        if enable_gtao is None:
            enable_gtao = config.vbgtao_enable
        if enable_gtao:
            from .gtao import denoise_ao, gtao as gtao_fn

            def compute_ao():
                # half-res AO: the slice march is gather-bound (~53 ms at
                # 1080p full res — PERF_NOTES.md); AO upsamples well. The
                # static cache freezes the per-frame noise rotation on static
                # frames — without a temporal accumulator the frozen pattern
                # is strictly more stable than re-rolled noise.
                wp_h = _pds(gbuffer["world_pos"], 2)
                nr_h = _pds(gbuffer["normal"], 2)
                from ..utils import math3d as _m3
                view_pos = _m3.mat3_dir_image(camera.view[:3, :3], wp_h) + camera.view[:3, 3]
                view_nrm = _m3.mat3_dir_image(camera.view[:3, :3], nr_h)
                a = gtao_fn(
                    view_pos, view_nrm, _pds(gbuffer["hit"], 2), frame=state.frame,
                    radius=config.vbgtao_radius, thickness=config.vbgtao_thickness,
                    final_power=config.vbgtao_final_power,
                    quality_level=config.vbgtao_quality_level,
                )
                a = denoise_ao(a, _pds(depth, 2))
                return jax.image.resize(a, (h, w), method="linear")

            ao = _static_cached("ao_full", compute_ao)
            ctx["ao"] = ao

        # ---- Lighting -----------------------------------------------------
        ctx = self._run_cbs(RenderStage.LIGHTING, "before", ctx)
        if ambient_color is None:
            ambient_color = jnp.array([0.03, 0.03, 0.03], jnp.float32)
        hdr = apply_pbr(
            gbuffer,
            lights,
            camera.position,
            ambient_color,
            background=background,
            ao=ctx.get("ao", ao),
            shadow=ctx.get("shadow", shadow),
            static_lights=static_lights,
        )
        # screen-space reflections (config-5 SSSR-style pass) on the lit image
        if config.ssr_enable:
            from .ssr import apply_ssr

            hdr = apply_ssr(
                hdr, gbuffer, depth, camera.position, camera.view_projection,
                steps=config.ssr_steps, max_roughness=config.ssr_max_roughness,
            )
        # aerial perspective: distance scattering over shaded surfaces, via the
        # reference's froxel-LUT design (`sky_aerial_perspective`, 32³ —
        # RendererInstance.cpp:136-199) instead of a per-pixel march: the LUT is
        # a pure function of (camera height, sun, atmosphere) in world-direction
        # space, so camera ROTATION never invalidates it and translation only
        # rebuilds past a quantization step. Steady state: one froxel fetch.
        if atmosphere is not None and "_sky_luts" in ctx:
            from .sky import aerial_lut, apply_aerial_lut

            t_lut2, ms_lut2 = ctx["_sky_luts"]
            meters_per_km = 50.0  # game-scale worlds: 50 units ≈ 1 km of air
            cam_h_km = camera.position[1] / meters_per_km
            aerial_key_now = jnp.concatenate(
                [sky_key_now, jnp.atleast_1d(jnp.round(cam_h_km * 16.0))]
            )

            def compute_aerial():
                return aerial_lut(
                    atmosphere, t_lut2, ms_lut2, cam_h_km, -sun_dir,
                    sun_intensity=jnp.asarray(sun_intensity),
                )

            if "aerial_lut" in prev and "aerial_key" in prev:
                ap_moved = jnp.any(jnp.abs(aerial_key_now - prev["aerial_key"]) > 1e-7)
                ap_vol = jax.lax.cond(ap_moved, compute_aerial, lambda: prev["aerial_lut"])
            else:
                ap_vol = compute_aerial()
            carry["aerial_lut"] = ap_vol
            carry["aerial_key"] = aerial_key_now

            def compute_aerial_apply():
                ap_l4, ap_t4 = apply_aerial_lut(
                    ap_vol, _pds(gbuffer["world_pos"], 8), _pds(gbuffer["hit"], 8),
                    camera.position, meters_per_km=meters_per_km,
                )
                return (
                    jax.image.resize(ap_l4, (h, w, 3), method="linear"),
                    jax.image.resize(ap_t4, (h, w, 3), method="linear"),
                )

            # the per-pixel apply depends only on (geometry, camera, ap_vol) —
            # all covered by the static key (ap_vol's own key is a subset)
            ap_l, ap_t = _static_cached("aerial_apply", compute_aerial_apply)
            hdr = jnp.where(gbuffer["hit"][..., None], hdr * ap_t + ap_l, hdr)
        ctx["hdr"] = hdr
        ctx = self._run_cbs(RenderStage.LIGHTING, "after", ctx)

        # ---- Forward2D: particle billboards over the lit frame -------------
        # (reference stage order: 2D forward alpha-blend runs after PBR and
        # before post — `RendererInstance.cpp:945-1088`; particles ride the
        # same sprite queue, `:1336-1395`)
        if particles:
            from .renderer2d import render_particles_3d

            ctx = self._run_cbs(RenderStage.FORWARD_2D, "before", ctx)
            # quarter-res particle layer: the blend kernel + its tile/untile
            # layout reshapes cost 9.3 ms/frame at full 1080p for ~400
            # billboards (trace r5) and are tile-count-bound, so the layer
            # renders at quarter res (1/16 the tiles) and composites through
            # one bilinear upsample — the classic low-res offscreen-particles
            # technique; soft alpha smoke upsamples cleanly
            p_half = render_particles_3d(
                state, camera, _pds(depth, 4), atlas, materials,
                width=w // 4, height=h // 4,
            )
            p_layer = jax.image.resize(p_half, (h, w, 4), method="linear")
            hdr = ctx["hdr"]
            hdr = hdr * (1.0 - p_layer[..., 3:4]) + p_layer[..., :3]
            ctx["hdr"] = hdr
            ctx["particle_layer"] = p_layer
            ctx = self._run_cbs(RenderStage.FORWARD_2D, "after", ctx)

        # ---- Post-processing ---------------------------------------------
        ctx = self._run_cbs(RenderStage.POST_PROCESSING, "before", ctx)
        hdr = ctx["hdr"]
        exposure = jnp.float32(config.exposure)
        prev_lum = prev.get("adapt_luminance")
        if prev_lum is not None:
            hist = luminance_histogram(hdr, jnp.float32(-11.5), jnp.float32(1.0 / 29.5))
            auto_exposure, new_lum = adapt_exposure(hist, prev_lum, prev.get("dt", jnp.float32(1 / 60)))
            exposure = exposure * auto_exposure
            carry["adapt_luminance"] = new_lum
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
        # debug view override (rr.debug_view modes, RendererCVar.cpp:16-23)
        if config.debug_view:
            from .debugviews import apply_debug_view

            dbg = apply_debug_view(config.debug_view, ctx)
            if dbg is not None:
                ldr = dbg
        ctx["final"] = ldr
        ctx["carry"] = carry
        ctx = self._run_cbs(RenderStage.POST_PROCESSING, "after", ctx)
        ctx = self._run_cbs(RenderStage.FINAL_OUTPUT, "after", ctx)
        return ctx

"""Directional-light shadows: clipmap shadow maps + screen-space contact shadows.

The reference uses rectangular-mapped *virtual* shadow maps (RMVSM: 8K virtual space,
128-px physical pages, ≤10 clipmaps — `/root/reference/Oxylus/src/Render/Passes/
Shadowmaps.cpp`). SURVEY §7 scopes the TPU build to dense clipmap shadow maps first
(the same stable-clipmap light matrices, without the page cache): each clipmap level
renders a depth-only pass through the same meshlet raster at doubling world extent,
snapped to texel grid for stability (`Shadowmaps.cpp:8-62`), and the resolve pass picks
the finest containing level per pixel with PCF filtering.

Contact shadows: the short-range screen-space sun raymarch of
`RendererInstance.cpp:855-886` (steps/thickness/length from RendererCVar defaults).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.cull import cull_meshlets, expand_meshlet_instances
from ..ops.raster3d import pack_coeff_matrix, rasterize_reference
from ..ops.setup3d import bin_meshlets_to_tiles, setup_triangles
from ..utils import math3d

Array = jax.Array

SHADOW_MAP_SIZE = 1024
# 6 levels (reference runs an 8K-virtual RMVSM, RendererInstance.hpp:209-215):
# on this target raster cost scales with map AREA (per-tile kernel floor) while
# clipmap levels buy exponential coverage per linear cost, so scale comes from
# MORE LEVELS (10 m → 320 m at constant texel density) rather than bigger maps
NUM_CLIPMAPS = 6


def clipmap_matrices(
    light_dir: Array,      # (3,) normalized, direction light *travels*
    focus: Array,          # (3,) camera/interest point
    first_width: float = 10.0,
    num_clipmaps: int = NUM_CLIPMAPS,
    depth_range: float = 200.0,
) -> Array:
    """(L, 4, 4) stable light view-projection per clipmap level. Level i covers a
    world-space box of width first_width·2^i centered (texel-snapped) on the focus."""
    up = jnp.where(jnp.abs(light_dir[1]) > 0.99, jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    eye = focus - light_dir * (depth_range * 0.5)
    view = math3d.look_at(eye, focus, up)

    mats = []
    for lvl in range(num_clipmaps):
        width = first_width * (2.0**lvl)
        # texel snap: quantize the focus position in light space to texel increments
        texel = width / SHADOW_MAP_SIZE
        focus_ls = math3d.mat4_transform_point(view, focus)
        snap = jnp.floor(focus_ls[:2] / texel) * texel - focus_ls[:2]
        half = width * 0.5
        proj = math3d.ortho_reverse_z(
            -half + snap[0], half + snap[0], -half + snap[1], half + snap[1], 0.0, depth_range
        )
        mats.append(proj @ view)
    return jnp.stack(mats)


def render_shadow_clipmaps(
    gscene,
    entity_world: Array,
    light_vps: Array,  # (L, 4, 4)
    capacity: int = 2048,
    k_per_tile: int = 32,
) -> Array:
    """Depth-only meshlet raster per clipmap → (L, S, S) reverse-Z depth maps."""
    maps = []
    for lvl in range(light_vps.shape[0]):
        vp = light_vps[lvl]
        planes = math3d.frustum_planes_from_mat(vp)
        origin = jnp.zeros(3)  # cone culling off for ortho light views
        vis = gscene.inst_valid
        lod = jnp.zeros_like(gscene.inst_mesh)
        mi_inst, mi_ml, mi_valid = expand_meshlet_instances(gscene, vis, lod, capacity)
        vm_inst, vm_ml, vm_valid, _ = cull_meshlets(
            gscene, entity_world, mi_inst, mi_ml, mi_valid, planes, origin,
            capacity=capacity, cone_enabled=False,
        )
        setup = setup_triangles(
            gscene, entity_world, vm_inst, vm_ml, vm_valid, vp,
            SHADOW_MAP_SIZE, SHADOW_MAP_SIZE, backface_enabled=False,
        )
        from ..ops.raster3d import TILE as _RT
        tile_list, _ = bin_meshlets_to_tiles(setup, SHADOW_MAP_SIZE, SHADOW_MAP_SIZE, _RT, k_per_tile)
        cm = pack_coeff_matrix(setup["coeffs"], setup["tri_valid"])
        platform = jax.devices()[0].platform
        if platform in ("tpu", "axon"):
            from ..ops.raster3d import rasterize_pallas

            depth, _ = rasterize_pallas(cm, tile_list, SHADOW_MAP_SIZE, SHADOW_MAP_SIZE)
        else:
            depth, _ = rasterize_reference(cm, tile_list, SHADOW_MAP_SIZE, SHADOW_MAP_SIZE)
        maps.append(depth)
    return jnp.stack(maps)


from ..ops.raster3d import TILE as PAGE  # shadow page == raster tile size
PAGES = SHADOW_MAP_SIZE // PAGE  # pages per map side


def mark_visible_pages(
    world_pos: Array,  # (h, w, 3) shaded surface positions (any resolution)
    hit: Array,        # (h, w)
    light_vps: Array,  # (L, 4, 4)
) -> Array:
    """(L, PAGES²) bool — shadow pages actually sampled by screen pixels (the
    reference's `rmvsm_mark_visible_pages`, Shadowmaps.cpp: projects the depth
    buffer into light space and marks the page table). Dilated by one page so
    PCF taps at page borders stay inside the resident set."""
    n_lvls = light_vps.shape[0]
    wp = world_pos.reshape(-1, 3)
    ok = hit.reshape(-1)
    # all levels in one fused chain; the page marks come from TWO separable
    # one-hot factors contracted on the MXU — marks[y, x] = Σ_p 1[py_p = y]·
    # 1[px_p = x] — instead of a per-level pixel scatter (4 × 0.28 ms at 1080p)
    # or a (NP, PAGES²) compare-reduce (quadratic in the page count)
    x, y, z = wp[:, 0], wp[:, 1], wp[:, 2]
    m = light_vps  # (L, 4, 4)
    def proj(r):
        return (
            m[:, r, 0, None] * x[None]
            + m[:, r, 1, None] * y[None]
            + m[:, r, 2, None] * z[None]
            + m[:, r, 3, None]
        )  # (L, NP)
    cw = jnp.maximum(jnp.abs(proj(3)), 1e-9)
    u = proj(0) / cw * 0.5 + 0.5
    v = proj(1) / cw * 0.5 + 0.5
    inside = ok[None] & (u > 0.0) & (u < 1.0) & (v > 0.0) & (v < 1.0)
    px = jnp.clip((u * PAGES).astype(jnp.int32), 0, PAGES - 1)
    py = jnp.clip((v * PAGES).astype(jnp.int32), 0, PAGES - 1)
    lanes = jnp.arange(PAGES, dtype=jnp.int32)
    oh_x = ((px[:, :, None] == lanes) & inside[:, :, None]).astype(jnp.bfloat16)
    oh_y = ((py[:, :, None] == lanes) & inside[:, :, None]).astype(jnp.bfloat16)
    marks = jnp.einsum(
        "lpy,lpx->lyx", oh_y, oh_x, preferred_element_type=jnp.float32
    )  # (L, PAGES, PAGES)
    m2 = (marks > 0.5).astype(jnp.float32)
    m2 = jax.lax.reduce_window(m2, 0.0, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")
    return m2.reshape(n_lvls, -1) > 0.5


def render_shadow_clipmaps_cached(
    gscene,
    entity_world: Array,
    light_vps: Array,     # (L, 4, 4)
    prev: dict | None,
    capacity: int = 2048,
    k_per_tile: int = 32,
    visible_pages: Array | None = None,  # (L, PAGES²) from mark_visible_pages
) -> tuple[Array, dict]:
    """Page-cached clipmap rendering with visible-page residency (the reference's
    RMVSM pipeline, `Shadowmaps.cpp` mark-visible-pages → invalidate → allocate →
    draw-pages, re-shaped for fixed-grid raster): each 32×32-texel page keeps its
    cached depth unless

    - the level's light VP changed (camera snap crossed a texel boundary), or
    - an instance whose world transform changed this frame overlaps the page
      (both its current and previous footprint, so stale shadows are erased).

    With `visible_pages`, only pages actually sampled by screen pixels are ever
    rendered (RMVSM residency): a page is re-rasterized when it is visible AND
    (invalidated OR not yet resident); a rotating light invalidates everything
    but re-renders only the visible working set. Valid resident pages copy
    forward. When NOTHING needs rendering the whole geometry chain (cull →
    setup → bin → raster, the dominant per-level cost on this target) is
    skipped via `lax.cond` — the analog of the reference's zero-dirty-pages
    frame where `_draw_physical_pages` has an empty work list.

    Returns (maps (L, S, S), carry) — feed `carry` back as `prev`."""
    n_lvls = light_vps.shape[0]
    s = SHADOW_MAP_SIZE
    n_inst = gscene.inst_entity.shape[0]

    # which entities moved since last frame?
    if prev is not None and "world" in prev:
        changed_e = jnp.any(
            jnp.abs(entity_world - prev["world"]) > 1e-6, axis=(1, 2)
        )  # (N,)
    else:
        changed_e = jnp.ones(entity_world.shape[0], bool)
    inst_changed = changed_e[gscene.inst_entity] & gscene.inst_valid  # (I,)

    # conservative instance bounding spheres in world space — at BOTH the current
    # and the previous transform, so a moved instance invalidates the pages its
    # stale shadow sits on as well as the ones its new shadow lands on
    amin = gscene.mesh_aabb_min[gscene.inst_mesh]
    amax = gscene.mesh_aabb_max[gscene.inst_mesh]
    c_local = (amin + amax) * 0.5
    r_local = jnp.linalg.norm((amax - amin) * 0.5, axis=-1)

    def sphere_of(world_mats):
        iw = world_mats[gscene.inst_entity]  # (I, 4, 4)
        c = jnp.einsum("iab,ib->ia", iw[:, :3, :3], c_local) + iw[:, :3, 3]
        scale = jnp.max(jnp.linalg.norm(iw[:, :3, :3], axis=1), axis=-1)
        return c, r_local * scale

    spheres = [sphere_of(entity_world)]
    if prev is not None and "world" in prev:
        spheres.append(sphere_of(prev["world"]))

    page_ids = jnp.arange(PAGES * PAGES, dtype=jnp.int32)
    page_x = (page_ids % PAGES).astype(jnp.float32)
    page_y = (page_ids // PAGES).astype(jnp.float32)

    # per-level dirtiness (cheap, always computed: drives the cond + the carry)
    vp_changed = []
    dyn_pages_out = []
    page_invalid_lvls = []
    for lvl in range(n_lvls):
        vp = light_vps[lvl]
        if prev is not None and "vps" in prev:
            vpc = jnp.any(jnp.abs(vp - prev["vps"][lvl]) > 1e-7)
        else:
            vpc = jnp.bool_(True)
        vp_changed.append(vpc)

        # changed-instance footprints in page space (ortho light: ndc radius is
        # the world radius scaled by the projection diagonal), at current AND
        # previous transforms
        dyn_pages = jnp.zeros(PAGES * PAGES, bool)
        for c_ws, r_ws in spheres:
            ch = jnp.concatenate([c_ws, jnp.ones_like(c_ws[:, :1])], axis=-1)
            clip = jnp.einsum("ab,ib->ia", vp, ch)
            u = (clip[:, 0] * 0.5 + 0.5) * PAGES
            v = (clip[:, 1] * 0.5 + 0.5) * PAGES
            # radius scale = norm of the VP row (the light view rotates, so the
            # diagonal element alone underestimates the world→clip scale)
            ru = r_ws * jnp.linalg.norm(vp[0, :3]) * 0.5 * PAGES
            rv = r_ws * jnp.linalg.norm(vp[1, :3]) * 0.5 * PAGES
            live = inst_changed
            lo_u = jnp.where(live, u - ru, 1e9)
            hi_u = jnp.where(live, u + ru, -1e9)
            lo_v = jnp.where(live, v - rv, 1e9)
            hi_v = jnp.where(live, v + rv, -1e9)
            overlap = (
                (page_x[:, None] + 1.0 >= lo_u[None, :])
                & (page_x[:, None] <= hi_u[None, :])
                & (page_y[:, None] + 1.0 >= lo_v[None, :])
                & (page_y[:, None] <= hi_v[None, :])
            )  # (P, I)
            dyn_pages = dyn_pages | jnp.any(overlap, axis=1)  # (P,)
        dyn_pages_out.append(dyn_pages)

        prev_dyn = (
            prev["dyn_pages"][lvl]
            if prev is not None and "dyn_pages" in prev
            else jnp.ones_like(dyn_pages)
        )
        page_invalid_lvls.append(dyn_pages | prev_dyn | vpc)  # (P,)

    # residency: pages to actually (re)render = visible ∧ (invalid ∨ ¬resident)
    render_lvls = []
    resident_out = []
    for lvl in range(n_lvls):
        invalid = page_invalid_lvls[lvl]
        if visible_pages is not None:
            vis_p = visible_pages[lvl]
            prev_res = (
                prev["resident"][lvl]
                if prev is not None and "resident" in prev
                else jnp.zeros_like(vis_p)
            )
            resident = prev_res & ~invalid
            need = vis_p & ~resident
            resident_out.append(resident | need)
        else:
            need = invalid
            resident_out.append(jnp.ones_like(invalid))
        render_lvls.append(need)

    # ---- two-tier dirty-region rendering (round 5) ------------------------
    # The per-level geometry chain (expand → cull → setup at `capacity`) is
    # capacity-shaped: a dynamic scene whose per-frame dirty set is a few
    # hundred meshlets (falling boxes + the floor under them) was paying the
    # full 2048-capacity chain ×L levels every frame (~6.5 ms, frame5 trace).
    # The SMALL tier culls against the dirty-page REGION (crop planes) at
    # `dyn_capacity`; a conservative estimate (all meshlets of instances whose
    # sphere overlaps the dirty bbox ≥ whatever culling keeps) gates it, so
    # overflow is impossible — big invalidations (light snap) take the full
    # tier. Pages outside the dirty set keep their cached texels either way.
    dyn_capacity = min(768, capacity)
    inst_ml = gscene.mesh_lod_meshlet_count[gscene.inst_mesh, 0]
    crops = []
    small_ok = []
    c_all, r_all = spheres[0]
    for lvl in range(n_lvls):
        dirty = render_lvls[lvl]
        any_d = jnp.any(dirty)
        u_lo = jnp.min(jnp.where(dirty, page_x, jnp.inf))
        u_hi = jnp.max(jnp.where(dirty, page_x + 1.0, -jnp.inf))
        v_lo = jnp.min(jnp.where(dirty, page_y, jnp.inf))
        v_hi = jnp.max(jnp.where(dirty, page_y + 1.0, -jnp.inf))
        crops.append((any_d, u_lo, u_hi, v_lo, v_hi))
        vp = light_vps[lvl]
        ch = jnp.concatenate([c_all, jnp.ones_like(c_all[:, :1])], axis=-1)
        clip = jnp.einsum("ab,ib->ia", vp, ch)
        u = (clip[:, 0] * 0.5 + 0.5) * PAGES
        v = (clip[:, 1] * 0.5 + 0.5) * PAGES
        ru = r_all * jnp.linalg.norm(vp[0, :3]) * 0.5 * PAGES
        rv = r_all * jnp.linalg.norm(vp[1, :3]) * 0.5 * PAGES
        ov = (
            (u + ru >= u_lo) & (u - ru <= u_hi)
            & (v + rv >= v_lo) & (v - rv <= v_hi)
            & gscene.inst_valid
        )
        est = jnp.sum(jnp.where(ov, inst_ml, 0))
        small_ok.append(est <= dyn_capacity)

    def render_level(lvl: int, capacity_: int, use_crop: bool):
        vp = light_vps[lvl]
        page_invalid = render_lvls[lvl]
        if use_crop:
            any_d, u_lo, u_hi, v_lo, v_hi = crops[lvl]
            # crop matrix maps the dirty NDC sub-rect to full NDC so the
            # frustum planes cull to the dirty region; an empty dirty set
            # degenerates to an off-screen rect (culls everything)
            a0 = jnp.where(any_d, u_lo / PAGES * 2.0 - 1.0, 3.0)
            a1 = jnp.where(any_d, u_hi / PAGES * 2.0 - 1.0, 3.5)
            b0 = jnp.where(any_d, v_lo / PAGES * 2.0 - 1.0, 3.0)
            b1 = jnp.where(any_d, v_hi / PAGES * 2.0 - 1.0, 3.5)
            sx = 2.0 / jnp.maximum(a1 - a0, 1e-6)
            sy = 2.0 / jnp.maximum(b1 - b0, 1e-6)
            crop = jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0],
                              [0, 0, 1.0, 0], [0, 0, 0, 1.0]])
            crop = crop.at[0, 0].set(sx).at[0, 3].set(-(a1 + a0) * 0.5 * sx)
            crop = crop.at[1, 1].set(sy).at[1, 3].set(-(b1 + b0) * 0.5 * sy)
            planes = math3d.frustum_planes_from_mat(crop @ vp)
        else:
            planes = math3d.frustum_planes_from_mat(vp)
        vis = gscene.inst_valid
        lod = jnp.zeros_like(gscene.inst_mesh)
        mi_i, mi_m, mi_v = expand_meshlet_instances(gscene, vis, lod, capacity_)
        vm_i, vm_m, vm_v, _ = cull_meshlets(
            gscene, entity_world, mi_i, mi_m, mi_v, planes, jnp.zeros(3),
            capacity=capacity_, cone_enabled=False,
        )
        setup = setup_triangles(
            gscene, entity_world, vm_i, vm_m, vm_v, vp, s, s, backface_enabled=False
        )
        tile_list, _ = bin_meshlets_to_tiles(setup, s, s, PAGE, k_per_tile)
        tile_list = jnp.where(page_invalid[:, None], tile_list, -1)
        cm = _pack(setup)
        platform = jax.devices()[0].platform
        if platform in ("tpu", "axon"):
            from ..ops.raster3d import rasterize_pallas

            depth, _ = rasterize_pallas(cm, tile_list, s, s)
        else:
            depth, _ = rasterize_reference(cm, tile_list, s, s)

        pix_invalid = jnp.repeat(
            jnp.repeat(page_invalid.reshape(PAGES, PAGES), PAGE, 0), PAGE, 1
        )
        if prev is not None and "maps" in prev:
            depth = jnp.where(pix_invalid, depth, prev["maps"][lvl])
        return depth

    if prev is not None and "maps" in prev:
        # PER-LEVEL tier selection: the fine clipmaps around a local dynamic
        # set take the small tier while the coarse levels (whose dirty bbox
        # covers the whole scene) take the full tier — an all-or-nothing gate
        # degenerated to the full tier on every dynamic frame (frame5 r5).
        # One switch per level; each cond layer only carries ONE (S, S) map.
        maps = []
        for lvl in range(n_lvls):
            branch = jnp.where(
                jnp.any(render_lvls[lvl]),
                jnp.where(small_ok[lvl], jnp.int32(1), jnp.int32(2)),
                0,
            )
            maps.append(jax.lax.switch(
                branch,
                [
                    lambda lvl=lvl: prev["maps"][lvl],
                    lambda lvl=lvl: render_level(lvl, dyn_capacity, True),
                    lambda lvl=lvl: render_level(lvl, capacity, False),
                ],
            ))
        maps = jnp.stack(maps)
    else:
        maps = jnp.stack(
            [render_level(lvl, capacity, False) for lvl in range(n_lvls)]
        )
    carry = {
        "maps": maps,
        "vps": light_vps,
        "dyn_pages": jnp.stack(dyn_pages_out),
        "world": entity_world,
        "resident": jnp.stack(resident_out),
    }
    return maps, carry


def _pack(setup):
    return pack_coeff_matrix(setup["coeffs"], setup["tri_valid"])


def resolve_shadows(
    world_pos: Array,   # (H, W, 3)
    hit: Array,         # (H, W)
    light_vps: Array,   # (L, 4, 4)
    shadow_maps: Array, # (L, S, S) reverse-Z
    bias: float = 2e-3,
) -> Array:
    """Screen-space shadow factor (1 = lit). Finest containing clipmap, 2×2 PCF
    (the `resolve_shadowmaps` pass, `Shadowmaps.cpp:543-610`)."""
    s = shadow_maps.shape[-1]
    n_lvls = light_vps.shape[0]
    # pick the finest containing clipmap per pixel with cheap fused math, then do
    # the 2×2 PCF with FOUR gathers total from the flattened (L*S*S,) map stack —
    # a per-level PCF loop costs 16 full-res gathers (~15 ms each, PERF_NOTES.md)
    best_lvl = jnp.full(world_pos.shape[:2], n_lvls - 1, jnp.int32)
    best_u = jnp.zeros(world_pos.shape[:2])
    best_v = jnp.zeros(world_pos.shape[:2])
    best_z = jnp.zeros(world_pos.shape[:2])
    any_inside = jnp.zeros(world_pos.shape[:2], jnp.bool_)
    for lvl in range(n_lvls - 1, -1, -1):
        clip = math3d.mat4_point_image(light_vps[lvl], world_pos)
        ndc = clip[..., :3] / jnp.maximum(jnp.abs(clip[..., 3:4]), 1e-9)
        u = ndc[..., 0] * 0.5 + 0.5
        v = ndc[..., 1] * 0.5 + 0.5
        z = ndc[..., 2]
        inside = (u > 0.01) & (u < 0.99) & (v > 0.01) & (v < 0.99) & (z > 0.0) & (z < 1.0)
        best_lvl = jnp.where(inside, lvl, best_lvl)
        best_u = jnp.where(inside, u, best_u)
        best_v = jnp.where(inside, v, best_v)
        best_z = jnp.where(inside, z, best_z)
        any_inside = any_inside | inside

    # pack each texel's 2×2 neighborhood into 4 lanes (edge-clamped shifts — fused
    # elementwise, ~free) so the PCF costs ONE row gather instead of four: gathers
    # price per ROW on this target (~10 ns/row, PERF_NOTES.md), so 4 taps ≈ 4×
    right = jnp.concatenate([shadow_maps[:, :, 1:], shadow_maps[:, :, -1:]], axis=2)
    down = jnp.concatenate([shadow_maps[:, 1:, :], shadow_maps[:, -1:, :]], axis=1)
    down_right = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    packed = jnp.stack([shadow_maps, right, down, down_right], axis=-1)  # (L,S,S,4)

    x = jnp.clip((best_u * s).astype(jnp.int32), 0, s - 1)
    y = jnp.clip((best_v * s).astype(jnp.int32), 0, s - 1)
    idx = best_lvl * (s * s) + y * s + x
    taps = packed.reshape(-1, 4)[idx]  # (H, W, 4)
    # reverse-Z: nearer = larger; lit when the pixel is at/nearer than the
    # stored occluder depth (within bias)
    lit = jnp.sum(jnp.where(best_z[..., None] + bias >= taps, 1.0, 0.0), axis=-1)
    factor = jnp.where(any_inside, lit * 0.25, 1.0)
    return jnp.where(hit, factor, 1.0)


def contact_shadows(
    depth: Array,        # (H, W) reverse-Z screen depth
    world_pos: Array,    # (H, W, 3)
    hit: Array,
    light_dir: Array,    # (3,) direction light travels
    view_proj: Array,    # (4, 4)
    steps: int = 8,
    thickness: float = 0.1,
    length: float = 0.05,
) -> Array:
    """Short-range screen-space raymarch toward the sun; 0 = fully contact-shadowed
    (`RendererInstance.cpp:855-886`, defaults from RendererCVar)."""
    h, w = depth.shape
    to_light = -light_dir

    # march sampling: gathers price per gathered ROW on this target, so a
    # (steps, H, W) gather costs steps× a per-pixel one (2.5 ms at 1080p —
    # trace). Contact rays are short: all step texels sit within a few texels
    # of the ray midpoint, so ONE row gather fetches a packed 4×4 depth
    # neighborhood around the mid-step texel and each step selects its texel
    # from the window lanes (fused). Steps whose texel falls outside the
    # window (rays spanning >4 texels at this resolution) clamp to its edge —
    # a conservative nearby sample.
    ts = (jnp.arange(1, steps + 1, dtype=jnp.float32) * (length / steps))
    sample_ws = world_pos[None, ...] + to_light[None, None, None, :] * ts[:, None, None, None]
    clip = math3d.mat4_point_image(view_proj, sample_ws)  # (S, H, W, 4)
    wc = jnp.maximum(jnp.abs(clip[..., 3]), 1e-9)
    ndc = clip[..., :3] / wc[..., None]
    sx = jnp.clip(((ndc[..., 0] * 0.5 + 0.5) * w).astype(jnp.int32), 0, w - 1)
    sy = jnp.clip(((ndc[..., 1] * 0.5 + 0.5) * h).astype(jnp.int32), 0, h - 1)

    WIN = 4
    ox = jnp.clip(sx[steps // 2] - (WIN // 2 - 1), 0, w - WIN)  # (H, W)
    oy = jnp.clip(sy[steps // 2] - (WIN // 2 - 1), 0, h - WIN)
    padded = jnp.pad(depth, ((0, WIN - 1), (0, WIN - 1)), mode="edge")
    win = jnp.stack(
        [padded[dy : dy + h, dx : dx + w] for dy in range(WIN) for dx in range(WIN)],
        axis=-1,
    )  # (H, W, WIN²) — edge-clamped shifted copies (fused elementwise, ~free)
    rows = win.reshape(h * w, WIN * WIN)[(oy * w + ox).reshape(-1)]
    rows = rows.reshape(h, w, WIN * WIN)  # the ONE gather: one row per pixel
    lane = (
        jnp.clip(sy - oy[None], 0, WIN - 1) * WIN
        + jnp.clip(sx - ox[None], 0, WIN - 1)
    )  # (S, H, W)
    lanes = jnp.arange(WIN * WIN, dtype=jnp.int32)
    scene_depth = jnp.sum(
        jnp.where(lane[..., None] == lanes, rows[None], 0.0), axis=-1
    )  # (S, H, W)
    ray_depth = ndc[..., 2]
    # occluder: scene surface nearer than the ray point by less than `thickness`
    # (reverse-Z: nearer = larger)
    delta = scene_depth - ray_depth
    occluded = jnp.any((delta > 1e-5) & (delta < thickness), axis=0)
    return jnp.where(occluded & hit, 0.0, 1.0)

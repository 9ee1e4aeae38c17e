"""SceneRunner: the high-level simulate+render loop over a scene.

This is the user-facing equivalent of the reference's per-frame flow
(`Scene::runtime_update` → `Scene::render` → present, SURVEY §3.2-3.3): it owns the
device SceneState + PhysicsState, the per-scene RendererInstance(s), the carried frame
resources (HiZ, exposure), and the window. One `step()` advances simulation and
(optionally) renders; everything device-side stays on device between frames.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .assets.bake import BakedMesh
from .core.config import RendererConfig
from .physics.state import PhysicsParams
from .render.camera import CameraMatrices, camera_from_state
from .render.renderer2d import SpriteBatchBindings, default_bindings, render_2d_with_particles
from .render.renderer3d import RenderSpec, RendererInstance
from .render.scene3d import GPUScene, upload_meshes
from .scene.frame import frame_step
from .scene.scene import Scene
from .utils.profiler import PROFILER


class SceneRunner:
    def __init__(
        self,
        scene: Scene,
        *,
        width: int = 1920,
        height: int = 1080,
        physics_params: PhysicsParams | None = None,
        render_mode: str = "none",  # "none" | "2d" | "3d"
        use_megakernel: bool = False,
        track_contacts: bool = False,
        contact_events_every: int = 1,
        meshes: list[BakedMesh] | None = None,
        render_spec: RenderSpec | None = None,
        bindings: SpriteBatchBindings | None = None,
        atmosphere=None,
        enable_shadows: bool = False,
        audio_engine=None,
        asset_manager=None,
        material_slots: dict | None = None,
    ) -> None:
        self.scene = scene
        self.width = width
        self.height = height
        self.physics_params = physics_params or PhysicsParams()
        self.render_mode = render_mode
        self.use_megakernel = use_megakernel
        self.contact_tracker = None
        self.activation_tracker = None
        # deferral knob: scripts that don't need per-frame contact events pay the
        # extra narrowphase + host sync only every N frames (VERDICT weak #8)
        self.contact_events_every = max(int(contact_events_every), 1)
        if track_contacts:
            from .physics.events import ActivationTracker, ContactTracker

            self.contact_tracker = ContactTracker()
            self.activation_tracker = ActivationTracker()
        self.config: RendererConfig = scene.renderer_config
        self.atmosphere = atmosphere
        self.enable_shadows = enable_shadows

        # audio: the reference runs audio_listener_update/audio_source_update
        # every frame inside world.progress (`Scene.cpp:681-716`); here the
        # runner drives the engine per frame when the scene carries audio
        # components. Scenes without audio pay nothing (engine stays None).
        self.asset_manager = asset_manager
        self.audio_engine = audio_engine
        self._audio_sources: dict[int, Any] = {}
        self._audio_accum = 0.0
        self.last_audio_block = None
        if self.audio_engine is None:
            has_audio = bool(
                (scene._alive & scene._comp_mask["AudioSourceComponent"]).any()
                or (scene._alive & scene._comp_mask["AudioListenerComponent"]).any()
            )
            if has_audio:
                from .audio.engine import AudioEngine

                self.audio_engine = AudioEngine()
                self.audio_engine.init()

        if not scene.running:
            scene.runtime_start()
        self.state = scene.to_device_state()
        self.ps = scene.physics_state
        self.carry: dict[str, Any] = {}
        self.frame_index = 0
        self.last_frame = None
        self._script_accum = 0.0  # host mirror of the 60 Hz tick for on_fixed_update

        self.gscene: GPUScene | None = None
        if render_mode == "3d":
            meshes = meshes or []
            instances = []
            mesh_mask = scene._comp_mask["MeshComponent"]
            mesh_idx_field = scene._comp_data["MeshComponent"]["mesh_index"]
            # per-instance material slot from MeshComponent.material_uuid
            # (the reference resolves material_uuid into the global materials
            # buffer index the same way, `Scene.cpp:1175-1213`)
            mat_uuid_field = scene._comp_data["MeshComponent"]["material_uuid"]
            from .core import uuid as _uuidlib

            for i in np.nonzero(scene._alive & mesh_mask)[0]:
                mi = int(mesh_idx_field[int(i)]) if len(meshes) > 1 else 0
                mi = min(mi, max(len(meshes) - 1, 0))
                mat_slot = 0
                if material_slots:
                    hi, lo = (int(v) for v in mat_uuid_field[int(i)])
                    mat_slot = material_slots.get(
                        _uuidlib.u64_pair_to_uuid(hi, lo), 0
                    )
                instances.append((mi, int(i), mat_slot))
            self.gscene = upload_meshes(meshes, instances) if meshes else None
            spec = render_spec or RenderSpec(width=width, height=height)
            if meshes:
                # clamp compaction capacities to the scene's provable worst case:
                # every capacity-sized stage (expand sort, meshlet cull, triangle
                # setup, binning, the raster's VMEM-resident coefficient matrix)
                # scales with these, and an instance set fixed at runner build
                # time can never exceed its static meshlet-instance bound
                import dataclasses as _dc

                from .render.scene3d import worst_case_meshlet_instances

                worst = worst_case_meshlet_instances(meshes, instances)
                cap = max(128, -(-worst // 128) * 128)
                spec = _dc.replace(
                    spec,
                    max_meshlet_instances=min(spec.max_meshlet_instances, cap),
                    max_visible_meshlets=min(spec.max_visible_meshlets, cap),
                )
            self.renderer3d = RendererInstance(spec)
            if atmosphere is not None:
                # prewarm the sky LUT cache eagerly so the jitted frame graph
                # closes over concrete LUT arrays instead of tracing their build
                from .render.sky import multiscatter_lut, transmittance_lut

                t_lut = transmittance_lut(atmosphere)
                ms_lut = multiscatter_lut(atmosphere, t_lut)
                self.renderer3d._sky_cache[atmosphere] = (t_lut, ms_lut)
        self._render3d_jit = None
        self._full3d_jit = None
        self.bindings = bindings or default_bindings(scene.spec.padded_entities())
        # static texturing features for the Pallas G-buffer path: each texture
        # kind's per-pixel gather is traced ONLY when some bound material
        # carries it (flag bits — assets/material.py), so untextured scenes pay
        # nothing and e.g. normal-map-free scenes skip that gather + perturb
        fl = np.asarray(self.bindings.materials.flags)
        feats = []
        for name, bit in (("albedo", 1), ("normal", 2), ("emissive", 4), ("mr", 8)):
            if np.any(fl & bit):
                feats.append(name)
        self._texture_features = tuple(feats)
        self._textured = bool(feats)
        from .assets.material import FLAG_ALPHA_MASK as _FAM

        # static alpha-mask gate: only scenes binding a masked material pay the
        # extra masked raster pass + per-pixel cutoff test
        self._has_alpha_mask = bool(np.any(fl & _FAM))
        # static particle gate: scenes without emitters compile the whole
        # Forward2D particle composite out of the 3D frame graph
        self._has_particles = bool(
            scene.spec.max_particles > 0
            and np.asarray(scene._comp_mask.get("ParticleSystemComponent", False)).any()
        )
        # static PBR light-block hint: unroll enough 8-light blocks at trace
        # time to cover the scene's own lights — the dynamic tail loop costs
        # ~6 ms/frame at 1080p when it runs even one trip (non-fused while body
        # + carry copies, trace r5); script-spawned lights past the hint still
        # ride the tail correctly
        self._static_lights = max(1, int(
            np.sum(np.asarray(scene._alive & scene._comp_mask["LightComponent"]))
        ))

    # ------------------------------------------------------------------ camera
    def _resolve_camera_idx(self) -> int:
        """First alive camera entity index, resolved once on the host and cached
        (a per-frame nonzero() would sync the device every frame over the
        accelerator tunnel); `invalidate_camera()` drops the cache on scene edits."""
        if not hasattr(self, "_camera_idx") or self._camera_idx is None:
            mask = np.asarray(self.state.mask["CameraComponent"] & self.state.alive)
            idx = np.nonzero(mask)[0]
            self._camera_idx = int(idx[0]) if len(idx) else -1
        return self._camera_idx

    def active_camera(self) -> CameraMatrices | None:
        if self._resolve_camera_idx() < 0:
            return None
        return camera_from_state(
            self.state, self._camera_idx, self._scalar(self.width / self.height)
        )

    def _scalar(self, v: float) -> jax.Array:
        """Per-frame scalars (dt, aspect) as cached device arrays: a fresh
        jnp.float32(v) every frame is an eager convert+transfer over the tunnel
        (~1 ms of host time each — trace)."""
        cache = getattr(self, "_scalar_cache", None)
        if cache is None:
            cache = self._scalar_cache = {}
        out = cache.get(v)
        if out is None:
            out = cache[v] = jnp.float32(v)
        return out

    def invalidate_camera(self) -> None:
        self._camera_idx = None
        # the fused 3D graph closed over the resolved camera index at trace
        # time; if a script moved the camera to a different entity slot the
        # compiled graph would keep rendering from the stale slot
        self._full3d_jit = None

    def replace_physics_state(self, ps) -> None:
        """Swap in externally-built physics state (e.g. a loaded checkpoint or a
        spawn path that activates bodies). Re-derives the cached has-bodies flag
        so a scene that starts body-less does not keep its physics stage
        compiled out after bodies appear."""
        self.ps = ps
        self._has_bodies = None

    # ------------------------------------------------------------------ scripting
    def _script_frame_begin(self, dt: float) -> None:
        """Per-frame script dispatch, mirroring `Scene::runtime_update`
        (`/root/reference/Oxylus/src/Scene/Scene.cpp:1139-1157`): deferred
        functions → script `on_scene_update` → fixed-tick `on_fixed_update` →
        registered ECS systems (`world.progress` analog). Scene-less scenes pay
        nothing; when scripts exist, the host mirror is synced from the device
        state first so scripts read live simulation results, and host edits are
        merged back so scripts and the jit'd step act on one world."""
        scene = self.scene
        has_scripts = bool(scene.lua_systems or scene.script_ecs_systems)
        if not (has_scripts or scene.deferred_functions):
            return
        # sync BEFORE running deferred functions: sync_from_device overwrites
        # host component fields with device values, so host edits made by
        # deferred fns (or scripts) must land after it or they'd be clobbered
        scene.sync_from_device(self.state)
        if scene.deferred_functions:
            scene.run_deferred()
        if has_scripts:
            for system in scene.lua_systems.values():
                system.on_scene_update(scene, dt)
            h = scene.spec.physics_interval
            self._script_accum += dt
            nsub = 0
            while self._script_accum >= h and nsub < scene.spec.max_substeps:
                self._script_accum -= h
                nsub += 1
                for system in scene.lua_systems.values():
                    system.on_fixed_update(scene, h)
            # clamp the residual: if the cap was hit (one long frame, or dt
            # persistently > max_substeps*h) an unclamped backlog would force
            # max_substeps fixed updates every frame forever (spiral of death)
            self._script_accum = min(self._script_accum, h)
            scene.progress(dt)
        if scene._device_dirty:
            old_n = int(self.state.alive.shape[0])
            self.state = scene.merge_host_edits(self.state)
            self.invalidate_camera()
            self._audio_entity_idx = None  # audio entities may have changed
            new_n = int(self.state.alive.shape[0])
            if new_n != old_n:
                # entity capacity grew mid-run: per-entity runner caches are
                # sized for the old capacity — re-pad bindings (preserving
                # material assignments) and drop the compiled frame graphs
                b = self.bindings
                pad = jnp.zeros((new_n - old_n,), b.entity_material_idx.dtype)
                self.bindings = dataclasses.replace(
                    b,
                    entity_material_idx=jnp.concatenate([b.entity_material_idx, pad]),
                )
                self._render3d_jit = None
                self._full3d_jit = None

    def _script_frame_end(self, image) -> None:
        if image is None or not self.scene.lua_systems:
            return
        for system in self.scene.lua_systems.values():
            system.on_scene_render(self.scene, (self.width, self.height))

    # ------------------------------------------------------------------ stepping
    def step(self, dt: float = 1.0 / 60.0, render: bool = True):
        """One frame: simulate (+render when enabled). Returns the final image or None."""
        self._script_frame_begin(dt)
        if self.scene._pending_body_ops and self.ps is not None:
            # scripted AddForce/AddTorque/AddImpulse ops fold in just before
            # the physics dispatch (LuaPhysicsBindings.cpp:248-273 parity)
            self.ps = self.scene.apply_pending_body_ops(
                self.ps, self.scene.spec.physics_interval
            )
        # fused 3D path: simulate + camera + render in ONE jit dispatch.
        # Eagerly-glued stages each cost a pjit round trip over the accelerator
        # tunnel (~1 ms) plus host tracing glue (~4-7 ms/frame total measured);
        # the fused graph pays one dispatch. With `use_megakernel` the physics
        # substeps inside the fused graph run the Pallas mega-kernel when the
        # scene is eligible. The separate-stage path below stays for 2D/no-render
        # modes and contact-event frames keep working off the returned ps.
        if (
            render
            and self.render_mode == "3d"
            and self.gscene is not None
        ):
            if self._resolve_camera_idx() >= 0:
                image = self._step_render3d_fused(dt)
                self._post_step_events()
                self._audio_frame(dt)
                self._script_frame_end(image)
                self.frame_index += 1
                self.last_frame = image
                PROFILER.frame_mark()
                return image
        with PROFILER.zone("frame_step"):
            if self.use_megakernel:
                # throughput path: physics via the Pallas mega-kernel, then the
                # non-physics systems of the frame step
                import dataclasses as _dc

                from .physics.megakernel import megakernel_substeps
                from .scene import frame as _frame

                h = self.scene.spec.physics_interval
                # host-side fixed-60Hz accumulator (ps.accumulator is a device
                # array — deriving nsub from it would need a sync per frame, and
                # the old hasattr(aval) guard silently pinned nsub=1, running
                # the sim in slow motion whenever dt > h)
                acc = getattr(self, "_mega_accum", None)
                if acc is None:
                    acc = float(jax.device_get(self.ps.accumulator))
                acc += dt
                nsub = min(int(acc // h), self.scene.spec.max_substeps)
                acc = min(acc - nsub * h, h)  # spiral-of-death clamp
                self._mega_accum = acc
                if nsub > 0:
                    # interpret mode off-TPU so the path stays testable on the
                    # CPU mesh (Mosaic lowering is TPU-only)
                    interp = jax.devices()[0].platform not in ("tpu", "axon")
                    self.ps = megakernel_substeps(
                        self.ps, self.physics_params, h,
                        n_substeps=nsub, interpret=interp,
                    )
                # rounding bounds the _scalar cache: acc ∈ [0,h], alpha ∈ [0,1]
                self.ps = _dc.replace(
                    self.ps, accumulator=self._scalar(round(acc, 4))
                )
                state = _frame.sync_bodies_to_components(self.state, self.ps)
                state = _frame.sync_characters_to_components(state, self.ps)
                state = _frame.physics_interpolate(
                    state, self.ps, self._scalar(round(acc / h, 3))
                )
                from .scene.particles import particle_update

                state = particle_update(state, self.scene.spec, self._scalar(dt))
                state = _frame.sprite_animation_update(state, self._scalar(dt))
                from .scene.state import propagate_transforms

                new_world = propagate_transforms(state, self.scene.spec)
                self.state = _dc.replace(
                    state, previous_world=state.world, world=new_world,
                    time=state.time + dt, frame=state.frame + 1,
                )
            else:
                if getattr(self, "_has_bodies", None) is None:
                    # static per scene: compiles the physics stage out of the
                    # frame step for body-less scenes (~8 ms/frame of substep
                    # while-loop machinery otherwise — PERF_NOTES.md). Body
                    # population is fixed at scene load; replace_physics_state()
                    # invalidates this if state is swapped in from outside.
                    self._has_bodies = bool(np.asarray(self.ps.active).any())
                self.state, self.ps = frame_step(
                    self.state, self.ps, self.physics_params, self._scalar(dt),
                    self.scene.spec, has_bodies=self._has_bodies,
                )
        self._post_step_events()
        self._audio_frame(dt)
        self.frame_index += 1

        image = None
        if render and self.render_mode != "none":
            camera = self.active_camera()
            if camera is not None:
                if self.render_mode == "2d":
                    with PROFILER.zone("render_2d"):
                        image, _vis = render_2d_with_particles(
                            self.state, camera, self.bindings,
                            width=self.width, height=self.height,
                        )
                elif self.render_mode == "3d" and self.gscene is not None:
                    with PROFILER.zone("render_3d"):
                        # the frame graph is jitted as a whole: eagerly, every op is
                        # a separate dispatch over the accelerator tunnel (~1 ms
                        # each). Retraces once when the carry dict gains resources
                        # after frame 0. Stage callbacks (if registered on the
                        # renderer) run inside the trace and must be pure jax.
                        if self._render3d_jit is None:

                            def _render3d(state, gscene, camera, materials, atlas, prev):
                                ctx = self.renderer3d.render(
                                    state, gscene, camera, materials, atlas,
                                    self.config, prev=prev,
                                    atmosphere=self.atmosphere,
                                    enable_shadows=self.enable_shadows,
                                    textured=self._textured,
                                    texture_features=self._texture_features,
                                    particles=self._has_particles,
                                    alpha_masked=self._has_alpha_mask,
                                    static_lights=self._static_lights,
                                )
                                return {"final": ctx["final"], "carry": ctx.get("carry", {})}

                            self._render3d_jit = jax.jit(_render3d)
                        out = self._render3d_jit(
                            self.state, self.gscene, camera,
                            self.bindings.materials, self.bindings.atlas, self.carry,
                        )
                    image = out["final"]
                    self.carry = out["carry"]
        self._script_frame_end(image)
        self.last_frame = image
        PROFILER.frame_mark()
        return image

    # ------------------------------------------------------------------ audio
    def attach_audio_clip(self, entity_index: int, clip, play: bool = True):
        """Bind an in-memory AudioClip to an AudioSourceComponent entity (the
        asset-manager-less path: scenes loaded from JSON resolve clips by UUID
        via `asset_manager` instead)."""
        if self.audio_engine is None:
            from .audio.engine import AudioEngine

            self.audio_engine = AudioEngine()
            self.audio_engine.init()
        src = self.audio_engine.create_source(clip)
        self._audio_sources[entity_index] = src
        if play:
            src.play()
        return src

    def _audio_frame(self, dt: float) -> None:
        """Per-frame audio: pull live transforms for audio entities from the
        device state (one small batched gather), push them into the engine via
        `sync_sources_from_scene`, derive velocities for doppler, and advance
        the mixer by the frame's worth of samples. Mirrors the reference's
        PreUpdate audio systems (`Scene.cpp:681-716`)."""
        if self.audio_engine is None:
            return
        from .audio.engine import SAMPLE_RATE, sync_sources_from_scene

        scene = self.scene
        idxs = getattr(self, "_audio_entity_idx", None)
        if idxs is None:
            m = scene._alive & (
                scene._comp_mask["AudioSourceComponent"]
                | scene._comp_mask["AudioListenerComponent"]
            )
            idxs = self._audio_entity_idx = np.nonzero(m)[0].astype(np.int32)
        if len(idxs):
            # world-space positions of just the audio entities (translation
            # column — matrices are column-translation, math3d.trs_to_mat4)
            pos = np.asarray(
                jax.device_get(self.state.world[jnp.asarray(idxs), :3, 3])
            )
            scene._comp_data["TransformComponent"]["position"][idxs] = pos
        old_src_pos = {i: np.array(s.position) for i, s in self._audio_sources.items()}
        old_lst_pos = [np.array(l.position) for l in self.audio_engine.listeners]
        sync_sources_from_scene(
            self.audio_engine, scene, self._audio_sources, self.asset_manager
        )
        if dt > 0:
            for i, src in self._audio_sources.items():
                prev = old_src_pos.get(i)
                if prev is not None:
                    src.velocity = (np.asarray(src.position) - prev) / dt
            for j, lst in enumerate(self.audio_engine.listeners):
                if j < len(old_lst_pos):
                    lst.velocity = (np.asarray(lst.position) - old_lst_pos[j]) / dt
        self._audio_accum += dt * SAMPLE_RATE
        frames = int(self._audio_accum)
        self._audio_accum -= frames
        if frames > 0:
            self.last_audio_block = self.audio_engine.render_block(frames)

    def _post_step_events(self) -> None:
        """Contact/activation script callbacks off the post-step physics state."""
        if (
            self.contact_tracker is None
            or self.frame_index % self.contact_events_every != 0
        ):
            return
        # one batched device→host sync for both event trackers: enqueue the
        # (async) contact query, then fetch all event arrays in a single
        # transfer instead of per-tracker round trips over the tunnel
        from .physics.events import query_contacts

        ent_a, ent_b, valid, asleep, entity = jax.device_get(
            (*query_contacts(self.ps, self.physics_params), self.ps.asleep, self.ps.entity)
        )
        added, persisted, removed = self.contact_tracker.update_from_arrays(
            ent_a, ent_b, valid
        )
        for system in self.scene.lua_systems.values():
            for a, b in added:
                system.on_contact_added(self.scene, a, b)
            for a, b in persisted:
                system.on_contact_persisted(self.scene, a, b)
            for a, b in removed:
                system.on_contact_removed(self.scene, a, b)
        if self.activation_tracker is not None:
            act, deact = self.activation_tracker.update_from_arrays(asleep, entity)
            for system in self.scene.lua_systems.values():
                for e in act:
                    system.on_body_activated(self.scene, e)
                for e in deact:
                    system.on_body_deactivated(self.scene, e)

    def _fused_mega_eligible(self) -> bool:
        """Can the fused frame's physics substeps run the Pallas mega-kernel?
        Requires the throughput kernel's constraints (megakernel_compact.py):
        single-collider bodies, 128-aligned capacity >= 256, no characters,
        and a real TPU backend (the kernel interprets too slowly on CPU)."""
        ps = self.ps
        if ps.has_proxies:
            return False
        b = ps.num_slots
        if b % 128 != 0 or b < 256:
            return False
        if bool(np.asarray(ps.is_character).any()):
            return False
        return jax.devices()[0].platform in ("tpu", "axon")

    def _step_render3d_fused(self, dt: float):
        """Simulate + camera + render as one compiled graph, one dispatch."""
        if getattr(self, "_has_bodies", None) is None:
            self._has_bodies = bool(np.asarray(self.ps.active).any())
        if self._full3d_jit is None:
            spec = self.scene.spec
            cam_idx = self._camera_idx
            aspect = jnp.float32(self.width / self.height)
            has_bodies = self._has_bodies
            physics_mega = (
                self.use_megakernel and has_bodies and self._fused_mega_eligible()
            )

            def _full3d(state, ps, gscene, materials, atlas, carry, dtv):
                state, ps = frame_step(
                    state, ps, self.physics_params, dtv, spec,
                    has_bodies=has_bodies, physics_mega=physics_mega,
                )
                camera = camera_from_state(state, cam_idx, aspect)
                ctx = self.renderer3d.render(
                    state, gscene, camera, materials, atlas,
                    self.config, prev=carry,
                    atmosphere=self.atmosphere,
                    enable_shadows=self.enable_shadows,
                    textured=self._textured,
                    texture_features=self._texture_features,
                    particles=self._has_particles,
                    alpha_masked=self._has_alpha_mask,
                    static_lights=self._static_lights,
                )
                return state, ps, ctx["final"], ctx.get("carry", {})

            # donate state/physics/carry: they are replaced every frame, and
            # donation lets XLA alias the lax.cond-cached carry buffers (sky
            # background, aerial LUT, HiZ) instead of copying them through the
            # cond each frame (~0.3-0.5 ms per (H,W,3) buffer — trace r5)
            self._full3d_jit = jax.jit(_full3d, donate_argnums=(0, 1, 5))
        with PROFILER.zone("frame3d_fused"):
            self.state, self.ps, image, self.carry = self._full3d_jit(
                self.state, self.ps, self.gscene,
                self.bindings.materials, self.bindings.atlas, self.carry,
                self._scalar(dt),
            )
        return image

    def run(self, frames: int, dt: float = 1.0 / 60.0, render: bool = True):
        for _ in range(frames):
            out = self.step(dt, render=render)
        jax.block_until_ready(out if out is not None else self.state.time)
        return out

    # ------------------------------------------------------------------ sync
    def sync_to_host(self) -> Scene:
        self.scene.sync_from_device(self.state)
        return self.scene

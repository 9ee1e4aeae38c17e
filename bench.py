"""Benchmark driver. Prints ONE JSON line with the headline metric.

Round-1 headline: BASELINE config 1 — falling-boxes rigid-body throughput
(~1k bodies/world, fixed 60 Hz substeps), target ≥10M rigid-body-steps/s.

Throughput deployment shape: the engine runs a *batch of independent worlds* vmapped
into one jit (the standard TPU simulation-farm pattern — same program, W worlds of
state side by side). Per-kernel dispatch overhead on the target (~100-300µs/kernel,
see scripts/micro_probe.py) amortizes across the batch; `OX_BENCH_WORLDS` overrides
the batch width (default 64; 1 = single-scene latency mode).
"""

from __future__ import annotations

import json
import os
import time

import jax

# persistent XLA compilation cache: the 1080p frame graphs compile in minutes
# over the remote-compile tunnel; cached reruns start in seconds
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def bench_physics(n_boxes=1022, worlds=64, steps_per_call=60, calls=16, warmup=2, mega=False):
    from __graft_entry__ import _build_flagship
    from oxylus_tpu.physics.state import PhysicsParams
    from oxylus_tpu.physics.step import physics_substep

    scene = _build_flagship(n_boxes=n_boxes)
    ps = scene.physics_state
    if os.environ.get("OX_BENCH_CHECK_BAND") == "1":
        import sys

        from oxylus_tpu.physics.megakernel_banded import band_coverage_report

        rep = band_coverage_report(ps)
        print(f"band coverage on bench scene: {rep}", file=sys.stderr)
    comm = "scatter" if worlds > 4 else "matmul"
    params = PhysicsParams(comm=comm)
    n_bodies = int(jax.device_get(jnp.sum(ps.active.astype(jnp.int32))))
    dt = 1.0 / 60.0

    if mega:
        # whole-substep Pallas mega-kernel: one launch per `steps_per_call` substeps.
        # compact (default): banded discovery compacted to R=16 neighbor slots,
        # all per-pair work vectorized on (R, B) lanes (megakernel_compact.py).
        # banded: full rank-band pair space (megakernel_banded.py).
        kern = os.environ.get("OX_BENCH_KERNEL", "compact")
        if os.environ.get("OX_BENCH_BANDED") == "0":  # legacy switch
            kern = "dense"
        if kern in ("compact", "banded"):
            from functools import partial

            if kern == "compact":
                from oxylus_tpu.physics.megakernel_compact import (
                    megakernel_substeps_compact as _mk,
                )
            else:
                from oxylus_tpu.physics.megakernel_banded import (
                    megakernel_substeps_banded as _mk,
                )

            # production solver config: warm-started accumulated impulses let 3
            # sweeps settle the pile BETTER than 10 cold Jacobi sweeps (lower
            # kinetic energy at rest), and the SAT manifold cache holds for 2
            # substeps (scripts/tune_warm.py, PERF_NOTES.md)
            # body sleeping (Jolt island deactivation) is supported
            # (OX_BENCH_SLEEP=1) but defaults off for the headline config: the
            # falling-boxes pile stays active for the whole measured window
            # (verified: no body reaches the sleep threshold in 10 sim-seconds)
            # so the wake-propagation bookkeeping is pure overhead here.
            mega_fn = partial(
                _mk, iterations=3, warm=0.7,
                geom_every=int(os.environ.get("OX_BENCH_GE", "2")),
                sleep=os.environ.get("OX_BENCH_SLEEP", "0") == "1",
            )
        else:
            from oxylus_tpu.physics.megakernel import megakernel_substeps as mega_fn

        if worlds > 1:
            ps = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (worlds,) + x.shape), ps)
            run = jax.jit(
                jax.vmap(lambda p: mega_fn(p, params, dt, n_substeps=steps_per_call))
            )
        else:
            # NOTE: wrapping several launches in a lax.scan to amortize dispatch
            # RTT was tried and is ~2.7x SLOWER — XLA inserts copies around the
            # big pallas call when it is a scan body. One launch per dispatch,
            # with the state buffers donated across launches.
            run = jax.jit(
                lambda p: mega_fn(p, params, dt, n_substeps=steps_per_call),
                donate_argnums=0,
            )
    else:
        if worlds > 1:
            ps = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (worlds,) + x.shape), ps)
            step_fn = jax.vmap(lambda p: physics_substep(p, params, dt))
        else:
            step_fn = lambda p: physics_substep(p, params, dt)

        @jax.jit
        def run(ps):
            def body(p, _):
                return step_fn(p), ()

            out, _ = jax.lax.scan(body, ps, None, length=steps_per_call)
            return out

    for _ in range(warmup):
        ps = run(ps)
    jax.block_until_ready(ps)

    t0 = time.perf_counter()
    for _ in range(calls):
        ps = run(ps)
    jax.block_until_ready(ps)
    elapsed = time.perf_counter() - t0

    body_steps = n_bodies * worlds * steps_per_call * calls
    rate = body_steps / elapsed
    return rate, n_bodies, worlds, elapsed


def _make_sprite_scene(n_sprites=512, n_particles=2):
    """BENCH config 2: 2D tilemap + animated sprites."""
    import numpy as np

    from oxylus_tpu.scene.scene import Scene
    from oxylus_tpu.scene.state import SceneSpec

    spec = SceneSpec(max_entities=2048, max_particles=2048)
    s = Scene("tilemap", spec=spec)
    cam = s.create_entity("camera")
    cam.add("TransformComponent", position=(0.0, 0.0, 10.0))
    cam.add("CameraComponent", projection="Orthographic", zoom=8.0)
    rng = np.random.default_rng(3)
    side = int(np.ceil(np.sqrt(n_sprites)))
    for i in range(n_sprites):
        e = s.create_entity(f"tile_{i}")
        e.add(
            "TransformComponent",
            position=((i % side - side / 2) * 0.5, (i // side - side / 2) * 0.5, 0.0),
            scale=(0.5, 0.5, 1.0),
        )
        e.add("SpriteComponent", layer=i % 4)
        if i % 4 == 0:
            e.add("SpriteAnimationComponent", num_frames=8, fps=12, columns=4)
    for i in range(n_particles):
        e = s.create_entity(f"em_{i}")
        e.add("TransformComponent", position=(float(i), 2.0, 0.0))
        e.add("ParticleSystemComponent", rate_over_time=200, start_lifetime=1.5)
    return s


def bench_frame_2d(width=1920, height=1080, frames=30, calls=3):
    """Frame-steps/s on BENCH config 2."""
    from oxylus_tpu.runtime import SceneRunner

    runner = SceneRunner(_make_sprite_scene(), width=width, height=height, render_mode="2d")
    runner.run(2)  # warmup/compile
    t0 = time.perf_counter()
    runner.run(frames * calls)
    elapsed = time.perf_counter() - t0
    return frames * calls / elapsed


def bench_frame_3d(width=1920, height=1080, frames=20, calls=2, n_objects=200):
    """Frame-steps/s on BENCH config 3/4: meshlet scene + sky + shadows + post stack."""
    import numpy as np

    from oxylus_tpu.assets.bake import bake_mesh
    from oxylus_tpu.render.renderer3d import RenderSpec
    from oxylus_tpu.render.sky import AtmosphereParams
    from oxylus_tpu.runtime import SceneRunner
    from oxylus_tpu.scene.scene import Scene
    from oxylus_tpu.scene.state import SceneSpec
    from tests.test_render3d import cube_mesh
    from tests.test_native_bake import sphere_mesh

    spec = SceneSpec(max_entities=1024)
    s = Scene("meshlets", spec=spec)
    cam = s.create_entity("camera")
    cam.add("TransformComponent", position=(0.0, 8.0, 30.0))
    cam.add("CameraComponent", fov=60.0)
    s.set_field(cam.index, "CameraComponent", "pitch", -0.25)
    sun = s.create_entity("sun")
    sun.add("TransformComponent", rotation=(-0.383, 0.0, 0.0, 0.924))
    sun.add("LightComponent", type="Directional", intensity=4.0, color=(1.0, 0.95, 0.9))

    rng = np.random.default_rng(11)
    side = int(np.ceil(np.sqrt(n_objects)))
    for i in range(n_objects):
        e = s.create_entity(f"obj_{i}")
        e.add(
            "TransformComponent",
            position=((i % side - side / 2) * 3.0, 0.0, (i // side - side / 2) * 3.0),
        )
        e.add("MeshComponent", mesh_index=i % 2)

    cp, cn, cu, ci = cube_mesh()
    sp_, sn, su, si = sphere_mesh(16, 32)
    meshes = [bake_mesh(cp, cn, cu, ci), bake_mesh(sp_, sn, su, si)]

    runner = SceneRunner(
        s, width=width, height=height, render_mode="3d", meshes=meshes,
        render_spec=RenderSpec(width=width, height=height),
        atmosphere=AtmosphereParams(), enable_shadows=True,
    )
    runner.run(2)
    t0 = time.perf_counter()
    runner.run(frames * calls)
    elapsed = time.perf_counter() - t0
    return frames * calls / elapsed


def bench_frame_5(width=1920, height=1080, frames=12, calls=2, n_objects=150, n_boxes=255):
    """BASELINE config 5: full frame (visbuffer + GTAO + SSR + shadows + post)
    with rigid-body physics running in the same frame step."""
    import dataclasses

    import numpy as np

    from oxylus_tpu.assets.bake import bake_mesh
    from oxylus_tpu.render.renderer3d import RenderSpec
    from oxylus_tpu.render.sky import AtmosphereParams
    from oxylus_tpu.runtime import SceneRunner
    from oxylus_tpu.scene.scene import Scene
    from oxylus_tpu.scene.state import SceneSpec
    from tests.test_render3d import cube_mesh
    from tests.test_native_bake import sphere_mesh

    spec = SceneSpec(max_entities=1024, max_bodies=512)
    s = Scene("full_frame", spec=spec)
    cam = s.create_entity("camera")
    cam.add("TransformComponent", position=(0.0, 8.0, 30.0))
    cam.add("CameraComponent", fov=60.0)
    s.set_field(cam.index, "CameraComponent", "pitch", -0.25)
    sun = s.create_entity("sun")
    sun.add("TransformComponent", rotation=(-0.383, 0.0, 0.0, 0.924))
    sun.add("LightComponent", type="Directional", intensity=4.0)
    floor = s.create_entity("floor")
    floor.add("TransformComponent", position=(0.0, -1.0, 0.0))
    floor.add("BoxColliderComponent", size=(100.0, 1.0, 100.0), friction=0.6)

    side = int(np.ceil(np.sqrt(n_objects)))
    for i in range(n_objects):
        e = s.create_entity(f"obj_{i}")
        e.add(
            "TransformComponent",
            position=((i % side - side / 2) * 3.0, 0.0, (i // side - side / 2) * 3.0),
        )
        e.add("MeshComponent", mesh_index=i % 2)
    rng = np.random.default_rng(5)
    bside = int(np.ceil(n_boxes ** (1 / 3)))
    cnt = 0
    for ix in range(bside):
        for iy in range(bside):
            for iz in range(bside):
                if cnt >= n_boxes:
                    break
                e = s.create_entity(f"box_{cnt}")
                j = rng.uniform(-0.05, 0.05, 3)
                e.add("TransformComponent", position=(
                    (ix - bside / 2) * 1.2 + j[0], 3.0 + iy * 1.2 + j[1],
                    (iz - bside / 2) * 1.2 + j[2]))
                e.add("MeshComponent", mesh_index=0)
                e.add("BoxColliderComponent", size=(0.5, 0.5, 0.5))
                e.add("RigidBodyComponent", type="Dynamic", mass=1.0)
                cnt += 1

    cp, cn, cu, ci = cube_mesh()
    sp_, sn, su, si = sphere_mesh(16, 32)
    meshes = [bake_mesh(cp, cn, cu, ci), bake_mesh(sp_, sn, su, si)]
    runner = SceneRunner(
        s, width=width, height=height, render_mode="3d", meshes=meshes,
        render_spec=RenderSpec(width=width, height=height),
        atmosphere=AtmosphereParams(), enable_shadows=True,
        use_megakernel=True,  # physics substeps via the Pallas throughput kernel
    )
    runner.config = dataclasses.replace(runner.config, ssr_enable=True)
    runner.run(2)
    t0 = time.perf_counter()
    runner.run(frames * calls)
    elapsed = time.perf_counter() - t0
    return frames * calls / elapsed


def _run_physics():
    worlds = int(os.environ.get("OX_BENCH_WORLDS", "1"))
    mega = os.environ.get("OX_BENCH_MEGA", "1") == "1"
    rate, n_bodies, worlds, elapsed = bench_physics(worlds=worlds, mega=mega)
    target = 10e6  # BASELINE.json: ≥10M rigid-body-steps/s
    return {
        "metric": f"rigid-body-steps/sec (falling boxes, {worlds}x{n_bodies} bodies, 60Hz substeps)",
        "value": round(rate),
        "unit": "body-steps/s",
        "vs_baseline": round(rate / target, 4),
    }


def _run_frame2d():
    fps = bench_frame_2d()
    return {
        "metric": "frame-steps/sec (2D tilemap + animated sprites, 1080p)",
        "value": round(fps, 2), "unit": "frames/s", "vs_baseline": round(fps / 60.0, 4),
    }


def _run_frame3d():
    fps = bench_frame_3d()
    return {
        "metric": "frame-steps/sec (meshlet scene + sky/shadows/post, 1080p)",
        "value": round(fps, 2), "unit": "frames/s", "vs_baseline": round(fps / 60.0, 4),
    }


def _run_frame5():
    fps = bench_frame_5()
    return {
        "metric": "frame-steps/sec (full frame: visbuffer+GTAO+SSR+shadows+physics, 1080p)",
        "value": round(fps, 2), "unit": "frames/s", "vs_baseline": round(fps / 60.0, 4),
    }


def main():
    import sys

    which = os.environ.get("OX_BENCH", "all")
    single = {
        "physics": _run_physics,
        "frame2d": _run_frame2d,
        "frame3d": _run_frame3d,
        "frame5": _run_frame5,
    }
    if which in single:
        print(json.dumps(single[which]()))
        return

    # default: run the full official suite (BASELINE configs 1/2/3-4), emit each
    # result to stderr as it lands, and print the WEAKEST metric as the one
    # official stdout line (the driver parses the last stdout line) — so the
    # record reflects the worst axis, not just physics.
    results = {}
    for name in ("physics", "frame2d", "frame3d"):
        try:
            r = single[name]()
        except Exception as e:  # one failed bench shouldn't hide the others
            r = {"metric": f"{name} (FAILED: {type(e).__name__}: {e})",
                 "value": 0.0, "unit": "-", "vs_baseline": 0.0}
        print(json.dumps(r), file=sys.stderr, flush=True)
        results[name] = r
    weakest = dict(min(results.values(), key=lambda r: r["vs_baseline"]))
    weakest["suite"] = {
        name: {"value": r["value"], "vs_baseline": r["vs_baseline"]}
        for name, r in results.items()
    }
    print(json.dumps(weakest))


if __name__ == "__main__":
    main()

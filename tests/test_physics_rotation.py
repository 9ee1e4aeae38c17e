"""Rotational-dynamics ground truth (the solver axis the translation suite misses).

The analytic suite (test_physics_analytic.py) pins translation-dominated mechanics;
these tests pin the ANGULAR path — gyroscopic integration (Euler's equations),
angular-momentum conservation, torque-free precession, intermediate-axis tumbling,
rolling friction coupling — against closed-form rigid-body mechanics. A deliberate
break of the angular-impulse path (wrong inertia transform, dropped torque arm,
energy-pumping gyro update) fails here even if the translation suite stays green.

Reference parity: Jolt integrates gyroscopic torque only when
`Body::SetApplyGyroscopicForce(true)` (exposed to scripts at
`/root/reference/Oxylus/src/Scripting/LuaPhysicsBindings.cpp:175`); default is OFF,
mirrored by `PhysicsState.apply_gyro`. Force/torque/impulse application mirrors the
Lua bindings at `LuaPhysicsBindings.cpp:248-273`.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from oxylus_tpu.physics.state import PhysicsParams, box_inertia
from oxylus_tpu.physics.step import physics_substep
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec
from oxylus_tpu.utils import math3d as m3

DT = 1.0 / 60.0


def _free_body_scene(half=(0.2, 0.3, 0.5), mass=1.0):
    """One dynamic box floating in zero effective gravity (gravity_factor=0)."""
    s = Scene("rot", spec=SceneSpec(max_entities=8, max_bodies=8))
    b = s.create_entity("box")
    b.add("TransformComponent", position=(0.0, 0.0, 0.0))
    b.add("BoxColliderComponent", size=half)
    b.add("RigidBodyComponent", type="Dynamic", mass=mass, gravity_factor=0.0,
          linear_drag=0.0, angular_drag=0.0)
    s.runtime_start()
    return s, s.physics_state


def _spin(ps, omega, gyro=True, slot=0):
    ps = dataclasses.replace(
        ps,
        angvel=ps.angvel.at[slot].set(jnp.asarray(omega, jnp.float32)),
        apply_gyro=ps.apply_gyro.at[slot].set(bool(gyro)),
    )
    return ps


def _world_inertia(ps, slot):
    r = np.asarray(m3.quat_to_mat3(ps.quat[slot : slot + 1]))[0]
    i_body = 1.0 / np.asarray(ps.inv_inertia[slot])
    return r @ np.diag(i_body) @ r.T


def test_gyro_default_off_keeps_omega_constant():
    """Jolt parity: without SetApplyGyroscopicForce, ω integrates as constant."""
    _, ps = _free_body_scene()
    omega0 = (3.0, 2.0, 1.0)
    ps = _spin(ps, omega0, gyro=False)
    params = PhysicsParams(max_pairs=16)
    step = jax.jit(lambda p: physics_substep(p, params, DT))
    for _ in range(60):
        ps = step(ps)
    np.testing.assert_allclose(np.asarray(ps.angvel[0]), omega0, atol=1e-5)


def test_tumbling_conserves_angular_momentum_and_energy():
    """Torque-free tumble of an asymmetric box: L_world exactly conserved by the
    momentum-conserving gyro update; rotational energy ½ωᵀIω bounded-drift."""
    _, ps = _free_body_scene(half=(0.1, 0.3, 0.6))
    ps = _spin(ps, (4.0, 2.5, 1.0))
    params = PhysicsParams(max_pairs=16)
    dt = 1.0 / 240.0
    step = jax.jit(lambda p: physics_substep(p, params, dt))
    l0 = _world_inertia(ps, 0) @ np.asarray(ps.angvel[0])
    e0 = 0.5 * float(np.asarray(ps.angvel[0]) @ l0)
    for _ in range(960):  # 4 seconds
        ps = step(ps)
    l1 = _world_inertia(ps, 0) @ np.asarray(ps.angvel[0])
    e1 = 0.5 * float(np.asarray(ps.angvel[0]) @ l1)
    np.testing.assert_allclose(l1, l0, rtol=2e-3, atol=1e-4)
    assert abs(e1 - e0) < 0.03 * e0, (e0, e1)


def test_torque_free_precession_rate():
    """Axisymmetric body (Ix = Iz ≠ Iy) spinning about its symmetry axis with a
    small transverse component: the BODY-frame transverse ω rotates at the
    classical rate Ω_b = ω_a (Iy/Ix − 1)."""
    half = (0.2, 0.5, 0.2)  # hx = hz → Ix = Iz
    _, ps = _free_body_scene(half=half)
    w_axis, w_t = 12.0, 0.8
    ps = _spin(ps, (w_t, w_axis, 0.0))
    inert = np.asarray(box_inertia(jnp.float32(1.0), jnp.asarray(half, jnp.float32)))
    ix, iy = float(inert[0]), float(inert[1])
    # body-frame transverse precession for a symmetric top (Euler's equations,
    # symmetry axis y): ω̇1 = +Ω ω3, ω̇3 = −Ω ω1 with Ω = ω_a (Iy − Ix)/Ix,
    # so the phase atan2(ω3, ω1) advances at −Ω
    expected = -w_axis * (iy - ix) / ix
    params = PhysicsParams(max_pairs=16)
    dt = 1.0 / 600.0
    step = jax.jit(lambda p: physics_substep(p, params, dt))
    phases = []
    for _ in range(600):  # 1 second
        ps = step(ps)
        r = np.asarray(m3.quat_to_mat3(ps.quat[0:1]))[0]
        wb = r.T @ np.asarray(ps.angvel[0])
        phases.append(np.arctan2(wb[2], wb[0]))
    phase = np.unwrap(np.array(phases))
    measured = (phase[-1] - phase[0]) / ((len(phase) - 1) * dt)
    assert abs(measured - expected) < 0.05 * abs(expected), (measured, expected)


def test_intermediate_axis_instability():
    """Dzhanibekov effect: spin about the intermediate-inertia axis is unstable
    (small perturbations grow into a flip); spin about the extreme axes is stable."""
    half = (0.1, 0.3, 0.6)
    # inertia ∝ (hy²+hz², hx²+hz², hx²+hy²) = (.45, .37, .10): x = major,
    # y = INTERMEDIATE, z = minor
    params = PhysicsParams(max_pairs=16)
    dt = 1.0 / 240.0

    def transverse_growth(axis, steps=1200):
        _, ps = _free_body_scene(half=half)
        w = np.zeros(3, np.float32)
        w[axis] = 6.0
        w[(axis + 1) % 3] = 1e-3  # seed perturbation
        ps = _spin(ps, tuple(w))
        step = jax.jit(lambda p: physics_substep(p, params, dt))
        worst = 0.0
        for _ in range(steps):
            ps = step(ps)
            r = np.asarray(m3.quat_to_mat3(ps.quat[0:1]))[0]
            wb = r.T @ np.asarray(ps.angvel[0])
            trans = np.sqrt(sum(wb[k] ** 2 for k in range(3) if k != axis))
            worst = max(worst, float(trans))
        return worst / 1e-3

    assert transverse_growth(1) > 100.0      # intermediate axis: flips
    assert transverse_growth(0) < 10.0       # major axis: stable
    assert transverse_growth(2) < 10.0       # minor axis: stable


def test_rolling_sphere_incline_acceleration():
    """Solid sphere rolling without slipping down a θ incline: a = (5/7) g sinθ,
    with the contact friction impulse providing the angular acceleration."""
    theta = np.radians(20.0)
    s = Scene("roll", spec=SceneSpec(max_entities=8, max_bodies=8))
    q = (0.0, 0.0, float(np.sin(theta / 2)), float(np.cos(theta / 2)))
    ramp = s.create_entity("ramp")
    ramp.add("TransformComponent", position=(0.0, -1.0, 0.0), rotation=q)
    ramp.add("BoxColliderComponent", size=(60.0, 1.0, 10.0), friction=1.0)
    b = s.create_entity("ball")
    b.add("TransformComponent", position=(0.0, 0.7, 0.0))
    b.add("SphereColliderComponent", radius=0.5, friction=1.0)
    b.add("RigidBodyComponent", type="Dynamic", mass=2.0, linear_drag=0.0,
          angular_drag=0.0)
    s.runtime_start()
    ps = s.physics_state
    params = PhysicsParams(max_pairs=64)
    step = jax.jit(lambda p: physics_substep(p, params, DT))
    speeds, spins = [], []
    for _ in range(150):
        ps = step(ps)
        speeds.append(float(jnp.linalg.norm(ps.linvel[1, :2])))
        spins.append(float(jnp.linalg.norm(ps.angvel[1])))
    accel = (speeds[140] - speeds[80]) / (60 * DT)
    expected = (5.0 / 7.0) * 9.81 * np.sin(theta)
    assert abs(accel - expected) < 0.12 * expected, (accel, expected)
    # rolling (not sliding): |v| ≈ ω r in the settled window
    assert abs(speeds[140] - spins[140] * 0.5) < 0.15 * speeds[140], (
        speeds[140], spins[140] * 0.5)


def test_spinning_capsule_top_precesses():
    """A fast-spinning capsule standing on its bottom sphere on a frictionless
    floor precesses about the vertical instead of falling over — the contact
    normal impulse supplies the gravity torque about the COM, the gyro path
    turns it into precession. Steady rate from the classical relation
    I_t·cosθ·Ω² − I_a·ω₃·Ω + m·g·d = 0 (slow root), d = hl (the horizontal
    lever of the contact normal is hl·sinθ; frictionless → COM stays put)."""
    s = Scene("top", spec=SceneSpec(max_entities=8, max_bodies=8))
    f = s.create_entity("floor")
    f.add("TransformComponent", position=(0.0, -1.0, 0.0))
    f.add("BoxColliderComponent", size=(20.0, 1.0, 20.0), friction=0.0)
    r, hl = 0.15, 0.45  # capsule: segment half-length hl, radius r
    b = s.create_entity("top")
    tilt = 0.25
    q = (float(np.sin(tilt / 2)), 0.0, 0.0, float(np.cos(tilt / 2)))
    # bottom sphere surface touches y=0: COM at hl·cosθ + r
    y0 = hl * float(np.cos(tilt)) + r + 0.001
    b.add("TransformComponent", position=(0.0, y0, 0.0), rotation=q)
    b.add("CapsuleColliderComponent", radius=r, height=2 * hl, friction=0.0)
    b.add("RigidBodyComponent", type="Dynamic", mass=1.0, linear_drag=0.0,
          angular_drag=0.0)
    s.runtime_start()
    ps = s.physics_state
    spin = 200.0  # rad/s about the capsule axis (well above the sleep threshold)
    inert = np.asarray(1.0 / ps.inv_inertia[1])
    ia, it = float(inert[1]), float(inert[0])
    mgd, ct = 9.81 * hl, float(np.cos(tilt))
    omega_p = mgd / (ia * spin)  # fast-top first guess, then the exact slow root
    for _ in range(8):
        w3 = spin + omega_p * ct
        omega_p = (ia * w3 - np.sqrt(ia * ia * w3 * w3 - 4 * it * ct * mgd)) / (
            2 * it * ct)
    rmat = np.asarray(m3.quat_to_mat3(ps.quat[1:2]))[0]
    # launch ON the steady-precession solution to avoid nutation transients
    w0 = rmat @ np.array([0.0, spin, 0.0], np.float32) + np.array(
        [0.0, omega_p, 0.0], np.float32)
    ps = _spin(ps, tuple(w0), slot=1)
    params = PhysicsParams(max_pairs=64)
    dt = 1.0 / 600.0
    step = jax.jit(lambda p: physics_substep(p, params, dt))
    azimuths, tilts = [], []
    for _ in range(1800):  # 3 s
        ps = step(ps)
        r3 = np.asarray(m3.quat_to_mat3(ps.quat[1:2]))[0]
        axis = r3[:, 1]  # world direction of the capsule axis
        azimuths.append(np.arctan2(axis[2], axis[0]))
        tilts.append(np.arccos(np.clip(axis[1], -1, 1)))
    tilts = np.array(tilts)
    # it did NOT fall over: tilt stays in a band around the initial tilt
    assert tilts.max() < tilt + 0.25 and tilts.min() > tilt - 0.25, (
        tilts.min(), tilts.max())
    az = np.unwrap(np.array(azimuths))
    measured = abs(az[-1] - az[300]) / (1500 * dt)  # skip transient
    assert abs(measured - omega_p) < 0.15 * omega_p, (measured, omega_p)


def test_scene_body_force_torque_impulse_api():
    """Scene.body_add_force/torque/impulse/angular_impulse: the script-facing
    Jolt body API (`LuaPhysicsBindings.cpp:248-273`), applied over one tick."""
    from oxylus_tpu.runtime import SceneRunner

    s = Scene("api", spec=SceneSpec(max_entities=8, max_bodies=8))
    b = s.create_entity("box")
    b.add("TransformComponent", position=(0.0, 0.0, 0.0))
    b.add("BoxColliderComponent", size=(0.5, 0.5, 0.5))
    b.add("RigidBodyComponent", type="Dynamic", mass=2.0, gravity_factor=0.0,
          linear_drag=0.0, angular_drag=0.0)
    runner = SceneRunner(s, render_mode="none")
    h = s.spec.physics_interval
    ent = b.index
    s.body_add_force(ent, (12.0, 0.0, 0.0))          # Δv = F/m·h
    s.body_add_impulse(ent, (0.0, 2.0, 0.0))          # Δv = J/m
    s.body_add_torque(ent, (0.0, 0.0, 3.0))           # Δω = I⁻¹τ·h
    runner.step(h, render=False)
    lv = np.asarray(runner.ps.linvel[0])
    av = np.asarray(runner.ps.angvel[0])
    assert abs(lv[0] - 12.0 / 2.0 * h) < 1e-4, lv
    assert abs(lv[1] - 2.0 / 2.0) < 1e-4, lv
    i_zz = float(1.0 / runner.ps.inv_inertia[0][2])
    assert abs(av[2] - 3.0 / i_zz * h) < 1e-4, av

    s.body_add_angular_impulse(ent, (0.5, 0.0, 0.0))
    s.body_set_apply_gyroscopic(ent, True)
    runner.step(h, render=False)
    assert bool(runner.ps.apply_gyro[0])
    i_xx = float(1.0 / runner.ps.inv_inertia[0][0])
    av2 = np.asarray(runner.ps.angvel[0])
    assert abs(av2[0] - 0.5 / i_xx) < 1e-3, av2

"""Physically-based sky: Hillaire-style atmosphere LUT chain.

Re-implements the reference's sky pipeline (`/root/reference/Oxylus/src/Render/Shaders/
sky.slang`, pass driver `Passes/PBR.cpp:9-141`; LUT sizes in SURVEY B.3): transmittance
LUT (256×64, precomputed once per atmosphere), multiple-scattering LUT (32×32, once),
and a per-frame sky-view LUT (312×192, lat-long around the camera) that the frame
samples for background + ambient. Atmosphere parameters come from AtmosphereComponent
(`Components.hpp:229-241`), units: megameter-scale densities like the reference.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

# Earth-like constants (sky.slang)
GROUND_RADIUS_KM = 6360.0
ATMOSPHERE_RADIUS_KM = 6460.0

TRANSMITTANCE_SIZE = (64, 256)   # (H, W) — reference 256×64
MULTISCATTER_SIZE = (32, 32)
SKY_VIEW_SIZE = (192, 312)       # (H, W) — reference 312×192


@dataclasses.dataclass(frozen=True)
class AtmosphereParams:
    rayleigh_scattering: tuple = (5.802, 13.558, 33.100)  # 1e-3 / km
    rayleigh_density: float = 8.0
    mie_scattering: tuple = (3.996, 3.996, 3.996)
    mie_density: float = 1.2
    mie_extinction: float = 4.44
    mie_asymmetry: float = 0.8
    ozone_absorption: tuple = (0.650, 1.881, 0.085)
    ozone_height: float = 25.0
    ozone_thickness: float = 15.0

    @classmethod
    def from_component(cls, comp: dict) -> "AtmosphereParams":
        g = comp.get
        asym = float(g("mie_asymmetry", 3.6))
        return cls(
            rayleigh_scattering=tuple(comp["rayleigh_scattering"]),
            rayleigh_density=float(comp["rayleigh_density"]),
            mie_scattering=tuple(comp["mie_scattering"]),
            mie_density=float(comp["mie_density"]),
            mie_extinction=float(comp["mie_extinction"]),
            # the component stores asymmetry scaled ×4.5 in reference content; clamp to g<1
            mie_asymmetry=min(asym / 4.5, 0.95) if asym > 1.0 else asym,
            ozone_absorption=tuple(comp["ozone_absorption"]),
            ozone_height=float(comp["ozone_height"]),
            ozone_thickness=float(comp["ozone_thickness"]),
        )


def _densities(p: AtmosphereParams, h_km: Array) -> tuple[Array, Array, Array]:
    rayleigh = jnp.exp(-h_km / p.rayleigh_density)
    mie = jnp.exp(-h_km / p.mie_density)
    ozone = jnp.maximum(0.0, 1.0 - jnp.abs(h_km - p.ozone_height) / p.ozone_thickness)
    return rayleigh, mie, ozone


def _extinction(p: AtmosphereParams, h_km: Array) -> Array:
    """(…, 3) extinction coefficient at altitude h (1e-3/km units)."""
    dr, dm, do = _densities(p, h_km)
    sr = jnp.asarray(p.rayleigh_scattering)
    am = p.mie_extinction
    ao = jnp.asarray(p.ozone_absorption)
    return dr[..., None] * sr + dm[..., None] * am + do[..., None] * ao


def _ray_sphere_exit(origin_r: Array, mu: Array, radius: float) -> Array:
    """Distance to a sphere of `radius` from height origin_r along direction with
    cos-zenith mu; assumes the ray exits (used for the atmosphere top)."""
    b = origin_r * mu
    c = origin_r * origin_r - radius * radius
    disc = jnp.maximum(b * b - c, 0.0)
    return jnp.maximum(-b + jnp.sqrt(disc), 0.0)


def _ray_ground_hit(origin_r: Array, mu: Array) -> Array:
    b = origin_r * mu
    c = origin_r * origin_r - GROUND_RADIUS_KM * GROUND_RADIUS_KM
    disc = b * b - c
    hit = (disc >= 0.0) & (mu < 0.0)
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    return jnp.where(hit & (t > 0.0), t, jnp.inf)


@partial(jax.jit, static_argnames=("params", "steps"))
def transmittance_lut(params: AtmosphereParams, steps: int = 40) -> Array:
    """(64, 256, 3) transmittance from a point at height u to the atmosphere top along
    cos-zenith mu (reference `sky_transmittance` pass)."""
    h, w = TRANSMITTANCE_SIZE
    u_h = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h          # altitude param
    u_mu = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w          # cos zenith param
    r = GROUND_RADIUS_KM + u_h[:, None] * (ATMOSPHERE_RADIUS_KM - GROUND_RADIUS_KM)
    mu = u_mu[None, :] * 2.0 - 1.0
    r = jnp.broadcast_to(r, (h, w))

    t_exit = _ray_sphere_exit(r, mu, ATMOSPHERE_RADIUS_KM)
    dt = t_exit / steps
    ts = (jnp.arange(steps, dtype=jnp.float32) + 0.5)[:, None, None] * dt[None]
    sample_r = jnp.sqrt(r[None] ** 2 + ts**2 + 2.0 * r[None] * ts * mu[None])
    h_km = jnp.maximum(sample_r - GROUND_RADIUS_KM, 0.0)
    ext = _extinction(params, h_km)  # (steps, H, W, 3) in 1e-3/km
    optical = jnp.sum(ext, axis=0) * dt[..., None] * 1e-3
    return jnp.exp(-optical)


def _sample_transmittance(lut: Array, r: Array, mu: Array) -> Array:
    h, w = TRANSMITTANCE_SIZE
    u_h = (r - GROUND_RADIUS_KM) / (ATMOSPHERE_RADIUS_KM - GROUND_RADIUS_KM)
    u_mu = mu * 0.5 + 0.5
    iy = jnp.clip((u_h * h).astype(jnp.int32), 0, h - 1)
    ix = jnp.clip((u_mu * w).astype(jnp.int32), 0, w - 1)
    return lut[iy, ix]


def _phase_rayleigh(c: Array) -> Array:
    return 3.0 / (16.0 * jnp.pi) * (1.0 + c * c)


def _phase_mie(c: Array, g: float) -> Array:
    g2 = g * g
    return (
        3.0
        / (8.0 * jnp.pi)
        * ((1.0 - g2) * (1.0 + c * c))
        / ((2.0 + g2) * jnp.maximum((1.0 + g2 - 2.0 * g * c) ** 1.5, 1e-6))
    )


@partial(jax.jit, static_argnames=("params", "steps"))
def multiscatter_lut(params: AtmosphereParams, trans_lut: Array, steps: int = 20) -> Array:
    """(32, 32, 3) isotropic multiple-scattering factor Ψ(height, sun angle)
    (reference `sky_multiscattering` pass, Hillaire eq. 5-7, 8-sample sphere)."""
    h, w = MULTISCATTER_SIZE
    u_h = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    u_mu = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    r = GROUND_RADIUS_KM + u_h[:, None] * (ATMOSPHERE_RADIUS_KM - GROUND_RADIUS_KM)
    mu_sun = u_mu[None, :] * 2.0 - 1.0
    r = jnp.broadcast_to(r, (h, w))
    sun_dir = jnp.stack([jnp.sqrt(1 - mu_sun**2), mu_sun, jnp.zeros_like(mu_sun)], axis=-1)

    # integrate over 8 directions (uniform sphere)
    golden = (1 + 5**0.5) / 2
    n_dir = 8
    i = jnp.arange(n_dir, dtype=jnp.float32)
    theta = 2 * jnp.pi * i / golden
    z = 1 - 2 * (i + 0.5) / n_dir
    sin_t = jnp.sqrt(1 - z * z)
    dirs = jnp.stack([sin_t * jnp.cos(theta), z, sin_t * jnp.sin(theta)], axis=-1)  # (D,3)

    l_total = jnp.zeros((h, w, 3))
    f_total = jnp.zeros((h, w, 3))
    for d in range(n_dir):
        mu_d = dirs[d, 1]
        t_top = _ray_sphere_exit(r, mu_d, ATMOSPHERE_RADIUS_KM)
        t_gnd = _ray_ground_hit(r, jnp.full_like(r, mu_d))
        t_max = jnp.minimum(t_top, t_gnd)
        t_max = jnp.where(jnp.isfinite(t_max), t_max, t_top)
        dt = t_max / steps
        trans_acc = jnp.ones((h, w, 3))
        for s in range(steps):
            t = (s + 0.5) * dt
            sr = jnp.sqrt(r**2 + t**2 + 2 * r * t * mu_d)
            h_km = jnp.clip(sr - GROUND_RADIUS_KM, 0.0, 100.0)
            dr_, dm_, _ = _densities(params, h_km)
            scat = (
                dr_[..., None] * jnp.asarray(params.rayleigh_scattering)
                + dm_[..., None] * jnp.asarray(params.mie_scattering)
            ) * 1e-3
            ext = _extinction(params, h_km) * 1e-3
            # sun transmittance at the sample
            cos_sun = jnp.clip(
                (r * mu_sun + t * jnp.sum(dirs[d] * sun_dir, axis=-1)) / jnp.maximum(sr, 1e-3),
                -1.0,
                1.0,
            )
            t_sun = _sample_transmittance(trans_lut, sr, cos_sun)
            step_trans = jnp.exp(-ext * dt[..., None])
            phase = 1.0 / (4.0 * jnp.pi)
            l_total = l_total + trans_acc * scat * phase * t_sun * dt[..., None]
            f_total = f_total + trans_acc * scat * dt[..., None]
            trans_acc = trans_acc * step_trans
    l_2nd = l_total / n_dir
    f_ms = f_total / n_dir
    return l_2nd / jnp.maximum(1.0 - f_ms, 1e-4)


@partial(jax.jit, static_argnames=("params", "steps"))
def sky_view_lut(
    params: AtmosphereParams,
    trans_lut: Array,
    ms_lut: Array,
    sun_dir: Array,      # (3,) normalized, y-up
    camera_height_km: Array = 0.2,
    sun_intensity: Array = 10.0,
    steps: int = 32,
) -> Array:
    """(192, 312, 3) lat-long radiance LUT around the camera (reference `sky_view`)."""
    h, w = SKY_VIEW_SIZE
    r0 = GROUND_RADIUS_KM + jnp.maximum(jnp.asarray(camera_height_km), 0.01)

    v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    # non-linear latitude mapping concentrating resolution at the horizon (Hillaire)
    lat = (v * 2.0 - 1.0)
    lat = jnp.sign(lat) * lat * lat * (jnp.pi / 2)
    lon = u * 2.0 * jnp.pi - jnp.pi
    cos_lat = jnp.cos(lat)[:, None]
    dirs = jnp.stack(
        [
            jnp.broadcast_to(cos_lat * jnp.sin(lon)[None, :], (h, w)),
            jnp.broadcast_to(jnp.sin(lat)[:, None], (h, w)),
            jnp.broadcast_to(-cos_lat * jnp.cos(lon)[None, :], (h, w)),
        ],
        axis=-1,
    )

    mu = dirs[..., 1]
    t_top = _ray_sphere_exit(jnp.full_like(mu, r0), mu, ATMOSPHERE_RADIUS_KM)
    t_gnd = _ray_ground_hit(jnp.full_like(mu, r0), mu)
    t_max = jnp.where(jnp.isfinite(t_gnd), t_gnd, t_top)
    dt = t_max / steps

    cos_theta = jnp.sum(dirs * sun_dir[None, None, :], axis=-1)
    ph_r = _phase_rayleigh(cos_theta)
    ph_m = _phase_mie(cos_theta, params.mie_asymmetry)

    lum = jnp.zeros((h, w, 3))
    trans_acc = jnp.ones((h, w, 3))
    for s in range(steps):
        t = (s + 0.5) * dt
        sr = jnp.sqrt(r0**2 + t**2 + 2.0 * r0 * t * mu)
        h_km = jnp.clip(sr - GROUND_RADIUS_KM, 0.0, 100.0)
        dr_, dm_, _ = _densities(params, h_km)
        scat_r = dr_[..., None] * jnp.asarray(params.rayleigh_scattering) * 1e-3
        scat_m = dm_[..., None] * jnp.asarray(params.mie_scattering) * 1e-3
        ext = _extinction(params, h_km) * 1e-3
        cos_sun_sample = jnp.clip(
            (sr * 0.0 + (r0 * sun_dir[1] + t * cos_theta)) / jnp.maximum(sr, 1e-3), -1.0, 1.0
        )
        t_sun = _sample_transmittance(trans_lut, sr, cos_sun_sample)
        # multiscatter term
        ms_u = jnp.clip((sr - GROUND_RADIUS_KM) / (ATMOSPHERE_RADIUS_KM - GROUND_RADIUS_KM), 0.0, 1.0)
        ms_v = cos_sun_sample * 0.5 + 0.5
        iy = jnp.clip((ms_u * MULTISCATTER_SIZE[0]).astype(jnp.int32), 0, MULTISCATTER_SIZE[0] - 1)
        ix = jnp.clip((ms_v * MULTISCATTER_SIZE[1]).astype(jnp.int32), 0, MULTISCATTER_SIZE[1] - 1)
        psi = ms_lut[iy, ix]
        in_scatter = (
            scat_r * (ph_r[..., None] * t_sun + psi)
            + scat_m * (ph_m[..., None] * t_sun + psi)
        )
        step_trans = jnp.exp(-ext * dt[..., None])
        # energy-conserving integration (Hillaire): (1 - T_step) / ext
        safe_ext = jnp.maximum(ext, 1e-7)
        lum = lum + trans_acc * in_scatter * (1.0 - step_trans) / safe_ext
        trans_acc = trans_acc * step_trans
    return lum * sun_intensity


def sample_sky_view(lut: Array, dirs: Array) -> Array:
    """Sample the lat-long sky-view LUT with world directions (..., 3)."""
    h, w = lut.shape[:2]
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
    lat = jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0))
    lon = jnp.arctan2(d[..., 0], -d[..., 2])
    vv = jnp.sqrt(jnp.abs(lat) / (jnp.pi / 2)) * jnp.sign(lat) * 0.5 + 0.5
    uu = (lon + jnp.pi) / (2 * jnp.pi)
    iy = jnp.clip((vv * h).astype(jnp.int32), 0, h - 1)
    ix = jnp.clip((uu * w).astype(jnp.int32), 0, w - 1)
    return lut[iy, ix]


def sky_ambient(lut: Array) -> Array:
    """Flat ambient estimate: mean upper-hemisphere radiance (the reference builds a
    32×32 cubemap for IBL; a cosine-weighted mean is the round-1 equivalent)."""
    h = lut.shape[0]
    upper = lut[h // 2 :]
    return jnp.mean(upper, axis=(0, 1))


@partial(jax.jit, static_argnames=("params", "steps"))
def aerial_perspective(
    params: AtmosphereParams,
    trans_lut: Array,
    ms_lut: Array,
    world_pos: Array,   # (H, W, 3) shaded surface positions (meters)
    hit: Array,         # (H, W)
    camera_pos: Array,  # (3,) meters
    sun_dir: Array,     # (3,) direction TOWARD the sun
    sun_intensity: Array = 10.0,
    meters_per_km: float = 1000.0,
    start_km: float = 0.0,
    steps: int = 8,
) -> tuple[Array, Array]:
    """Per-pixel aerial perspective (the reference's 32³ froxel LUT
    `sky_aerial_perspective`, evaluated directly per pixel): returns
    (in_scatter (H, W, 3), transmittance (H, W, 3)) to composite as
    `color * T + L` for pixels beyond `start_km` (Components.hpp:239
    aerial_perspective_start_km)."""
    rel = (world_pos - camera_pos[None, None, :]) / meters_per_km  # km
    dist = jnp.linalg.norm(rel, axis=-1)
    dirn = rel / jnp.maximum(dist, 1e-6)[..., None]
    march = jnp.maximum(dist - start_km, 0.0)

    r0 = GROUND_RADIUS_KM + jnp.maximum(camera_pos[1] / meters_per_km, 0.01)
    mu = dirn[..., 1]
    cos_theta = jnp.sum(dirn * sun_dir[None, None, :], axis=-1)
    ph_r = _phase_rayleigh(cos_theta)
    ph_m = _phase_mie(cos_theta, params.mie_asymmetry)

    dt = march / steps
    lum = jnp.zeros(world_pos.shape[:2] + (3,))
    trans_acc = jnp.ones(world_pos.shape[:2] + (3,))
    for s_ in range(steps):
        t = (s_ + 0.5) * dt + start_km
        sr = jnp.sqrt(r0**2 + t**2 + 2.0 * r0 * t * mu)
        h_km = jnp.clip(sr - GROUND_RADIUS_KM, 0.0, 100.0)
        dr_, dm_, _ = _densities(params, h_km)
        scat_r = dr_[..., None] * jnp.asarray(params.rayleigh_scattering) * 1e-3
        scat_m = dm_[..., None] * jnp.asarray(params.mie_scattering) * 1e-3
        ext = _extinction(params, h_km) * 1e-3
        cos_sun = jnp.clip((r0 * sun_dir[1] + t * cos_theta) / jnp.maximum(sr, 1e-3), -1.0, 1.0)
        t_sun = _sample_transmittance(trans_lut, sr, cos_sun)
        ms_u = jnp.clip((sr - GROUND_RADIUS_KM) / (ATMOSPHERE_RADIUS_KM - GROUND_RADIUS_KM), 0.0, 1.0)
        ms_v = cos_sun * 0.5 + 0.5
        iy = jnp.clip((ms_u * MULTISCATTER_SIZE[0]).astype(jnp.int32), 0, MULTISCATTER_SIZE[0] - 1)
        ix = jnp.clip((ms_v * MULTISCATTER_SIZE[1]).astype(jnp.int32), 0, MULTISCATTER_SIZE[1] - 1)
        psi = ms_lut[iy, ix]
        in_scatter = (
            scat_r * (ph_r[..., None] * t_sun + psi)
            + scat_m * (ph_m[..., None] * t_sun + psi)
        )
        step_trans = jnp.exp(-ext * dt[..., None])
        safe_ext = jnp.maximum(ext, 1e-7)
        lum = lum + trans_acc * in_scatter * (1.0 - step_trans) / safe_ext
        trans_acc = trans_acc * step_trans
    lum = lum * sun_intensity
    hitf = hit[..., None]
    return jnp.where(hitf, lum, 0.0), jnp.where(hitf, trans_acc, 1.0)


AERIAL_SIZE = (16, 32, 16)  # lat × lon × distance slices (reference: 32³ froxels,
#                             `RendererInstance.hpp:390`; here world-direction-
#                             indexed so camera rotation never invalidates it)


@partial(jax.jit, static_argnames=("params", "max_km"))
def aerial_lut(
    params: AtmosphereParams,
    trans_lut: Array,
    ms_lut: Array,
    camera_height_km: Array,
    sun_dir: Array,          # direction TOWARD the sun
    sun_intensity: Array = 10.0,
    max_km: float = 4.0,
) -> Array:
    """Aerial-perspective froxel LUT, world-direction lat-long × distance slice.

    Replaces the per-pixel 8-step march (`aerial_perspective`) with a cached
    volume: (LAT, LON, S, 6) where channels are [in-scatter rgb | transmittance
    rgb] cumulative from the camera to slice distance (s+1)/S·max_km. A pure
    function of (camera height, sun, params) — the renderer caches it behind a
    quantized camera key and rebuilds only on real movement."""
    lat_n, lon_n, s_n = AERIAL_SIZE
    v = (jnp.arange(lat_n, dtype=jnp.float32) + 0.5) / lat_n
    u = (jnp.arange(lon_n, dtype=jnp.float32) + 0.5) / lon_n
    lat = v * 2.0 - 1.0
    lat = jnp.sign(lat) * lat * lat * (jnp.pi / 2)   # sky-view's horizon-dense map
    lon = u * 2.0 * jnp.pi - jnp.pi
    cos_lat = jnp.cos(lat)[:, None]
    dirs = jnp.stack(
        [
            jnp.broadcast_to(cos_lat * jnp.sin(lon)[None, :], (lat_n, lon_n)),
            jnp.broadcast_to(jnp.sin(lat)[:, None], (lat_n, lon_n)),
            jnp.broadcast_to(-cos_lat * jnp.cos(lon)[None, :], (lat_n, lon_n)),
        ],
        axis=-1,
    )

    r0 = GROUND_RADIUS_KM + jnp.maximum(camera_height_km, 0.01)
    mu = dirs[..., 1]
    cos_theta = jnp.sum(dirs * sun_dir[None, None, :], axis=-1)
    ph_r = _phase_rayleigh(cos_theta)
    ph_m = _phase_mie(cos_theta, params.mie_asymmetry)
    dt = max_km / s_n

    def slice_step(carry, s_):
        lum, trans_acc = carry
        t = (s_.astype(jnp.float32) + 0.5) * dt
        sr = jnp.sqrt(r0**2 + t**2 + 2.0 * r0 * t * mu)
        h_km = jnp.clip(sr - GROUND_RADIUS_KM, 0.0, 100.0)
        dr_, dm_, _ = _densities(params, h_km)
        scat_r = dr_[..., None] * jnp.asarray(params.rayleigh_scattering) * 1e-3
        scat_m = dm_[..., None] * jnp.asarray(params.mie_scattering) * 1e-3
        ext = _extinction(params, h_km) * 1e-3
        cos_sun = jnp.clip((r0 * sun_dir[1] + t * cos_theta) / jnp.maximum(sr, 1e-3), -1.0, 1.0)
        t_sun = _sample_transmittance(trans_lut, sr, cos_sun)
        ms_u = jnp.clip((sr - GROUND_RADIUS_KM) / (ATMOSPHERE_RADIUS_KM - GROUND_RADIUS_KM), 0.0, 1.0)
        ms_v = cos_sun * 0.5 + 0.5
        iy = jnp.clip((ms_u * MULTISCATTER_SIZE[0]).astype(jnp.int32), 0, MULTISCATTER_SIZE[0] - 1)
        ix = jnp.clip((ms_v * MULTISCATTER_SIZE[1]).astype(jnp.int32), 0, MULTISCATTER_SIZE[1] - 1)
        psi = ms_lut[iy, ix]
        in_scatter = (
            scat_r * (ph_r[..., None] * t_sun + psi)
            + scat_m * (ph_m[..., None] * t_sun + psi)
        )
        step_trans = jnp.exp(-ext * dt)
        safe_ext = jnp.maximum(ext, 1e-7)
        lum = lum + trans_acc * in_scatter * (1.0 - step_trans) / safe_ext
        trans_acc = trans_acc * step_trans
        return (lum, trans_acc), jnp.concatenate([lum, trans_acc], axis=-1)

    init = (jnp.zeros((lat_n, lon_n, 3)), jnp.ones((lat_n, lon_n, 3)))
    _, slices = jax.lax.scan(slice_step, init, jnp.arange(s_n))
    lut = jnp.moveaxis(slices, 0, 2)  # (LAT, LON, S, 6)
    return lut.at[..., :3].mul(sun_intensity)


def apply_aerial_lut(
    lut: Array,          # (LAT, LON, S, 6) from aerial_lut
    world_pos: Array,    # (H, W, 3) meters
    hit: Array,          # (H, W)
    camera_pos: Array,   # (3,) meters
    max_km: float = 4.0,
    meters_per_km: float = 1000.0,
) -> tuple[Array, Array]:
    """Per-pixel froxel fetch: nearest direction cell (aerial is smooth),
    linear in distance — ONE gather pair instead of the 8-step march."""
    lat_n, lon_n, s_n = lut.shape[:3]
    rel = (world_pos - camera_pos[None, None, :]) / meters_per_km
    dist = jnp.linalg.norm(rel, axis=-1)
    d = rel / jnp.maximum(dist, 1e-6)[..., None]
    lat = jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0))
    lon = jnp.arctan2(d[..., 0], -d[..., 2])
    vv = jnp.sqrt(jnp.abs(lat) / (jnp.pi / 2)) * jnp.sign(lat) * 0.5 + 0.5
    uu = (lon + jnp.pi) / (2 * jnp.pi)
    iy = jnp.clip((vv * lat_n).astype(jnp.int32), 0, lat_n - 1)
    ix = jnp.clip((uu * lon_n).astype(jnp.int32), 0, lon_n - 1)
    sf = jnp.clip(dist / max_km * s_n - 0.5, 0.0, s_n - 1.0)
    s0 = jnp.floor(sf).astype(jnp.int32)
    s1 = jnp.minimum(s0 + 1, s_n - 1)
    w1 = (sf - s0.astype(jnp.float32))[..., None]
    a = lut[iy, ix, s0]
    b = lut[iy, ix, s1]
    res = a * (1.0 - w1) + b * w1
    hitf = hit[..., None]
    return jnp.where(hitf, res[..., :3], 0.0), jnp.where(hitf, res[..., 3:], 1.0)


def sky_sh_ambient(lut: Array) -> Array:
    """Project the sky-view LUT onto 2nd-order spherical harmonics → (9, 3) coeffs.

    The reference builds a 32×32 cubemap for IBL (`sky_cubemap`/`sky_ibl`); an SH-2
    projection of the same radiance field gives the diffuse ambient term without any
    per-pixel cubemap fetch: `ambient(n) = Σ c_i · Y_i(n)` evaluated in the shader.
    """
    h, w = lut.shape[:2]
    v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    lat = (v * 2.0 - 1.0)
    lat = jnp.sign(lat) * lat * lat * (jnp.pi / 2)   # inverse of the LUT mapping
    lon = u * 2.0 * jnp.pi - jnp.pi
    cos_lat = jnp.cos(lat)[:, None]
    dx = jnp.broadcast_to(cos_lat * jnp.sin(lon)[None, :], (h, w))
    dy = jnp.broadcast_to(jnp.sin(lat)[:, None], (h, w))
    dz = jnp.broadcast_to(-cos_lat * jnp.cos(lon)[None, :], (h, w))
    # solid-angle weight: d(lat)/dv changes with the sqrt warp; cos(lat) band weight
    dlat_dv = jnp.pi * jnp.abs(v * 2.0 - 1.0) + 1e-3
    weight = (cos_lat[:, 0] * dlat_dv)[:, None]
    weight = jnp.broadcast_to(weight, (h, w))

    y = [
        0.282095 * jnp.ones_like(dx),
        0.488603 * dy,
        0.488603 * dz,
        0.488603 * dx,
        1.092548 * dx * dy,
        1.092548 * dy * dz,
        0.315392 * (3.0 * dz * dz - 1.0),
        1.092548 * dx * dz,
        0.546274 * (dx * dx - dy * dy),
    ]
    norm = jnp.sum(weight) + 1e-9
    coeffs = jnp.stack(
        [jnp.sum(lut * (yi * weight)[..., None], axis=(0, 1)) / norm * (4 * jnp.pi) for yi in y]
    )  # (9, 3)
    return coeffs


def eval_sh_ambient(coeffs: Array, normals: Array) -> Array:
    """Evaluate SH-2 irradiance for normals (..., 3) → (..., 3) (Ramamoorthi-Hanrahan
    convolution weights folded in)."""
    x, y_, z = normals[..., 0], normals[..., 1], normals[..., 2]
    a0, a1, a2 = 3.141593, 2.094395, 0.785398
    basis = [
        a0 * 0.282095 * jnp.ones_like(x),
        a1 * 0.488603 * y_,
        a1 * 0.488603 * z,
        a1 * 0.488603 * x,
        a2 * 1.092548 * x * y_,
        a2 * 1.092548 * y_ * z,
        a2 * 0.315392 * (3.0 * z * z - 1.0),
        a2 * 1.092548 * x * z,
        a2 * 0.546274 * (x * x - y_ * y_),
    ]
    out = sum(b[..., None] * coeffs[i] for i, b in enumerate(basis))
    return jnp.maximum(out / jnp.pi, 0.0)

import jax.numpy as jnp
import numpy as np
import pytest

from oxylus_tpu.render.gtao import denoise_ao, gtao, prefilter_depth
from oxylus_tpu.render.shadows import (
    SHADOW_MAP_SIZE,
    clipmap_matrices,
    contact_shadows,
    render_shadow_clipmaps,
    resolve_shadows,
)
from oxylus_tpu.render.sky import (
    AtmosphereParams,
    multiscatter_lut,
    sample_sky_view,
    sky_ambient,
    sky_view_lut,
    transmittance_lut,
)


class TestSky:
    @pytest.fixture(scope="class")
    def luts(self):
        p = AtmosphereParams()
        t = transmittance_lut(p, steps=20)
        ms = multiscatter_lut(p, t, steps=8)
        return p, t, ms

    def test_transmittance_properties(self, luts):
        p, t, _ = luts
        t = np.asarray(t)
        assert t.shape == (64, 256, 3)
        assert (t >= 0).all() and (t <= 1).all()
        # zenith transmittance > horizon transmittance (longer path at horizon)
        assert t[0, 250].mean() > t[0, 130].mean()
        # blue extinguishes more than red through the atmosphere (rayleigh)
        assert t[0, 140, 0] > t[0, 140, 2]

    def test_sky_view_blue_sky(self, luts):
        p, t, ms = luts
        sun = jnp.array([0.0, 0.7, -0.714])
        sun = sun / jnp.linalg.norm(sun)
        lut = sky_view_lut(p, t, ms, sun, steps=16)
        sky = np.asarray(lut)
        assert np.isfinite(sky).all()
        up = np.asarray(sample_sky_view(lut, jnp.array([0.0, 1.0, 0.0])))
        assert up[2] > up[0]  # blue dominates at zenith
        assert up.max() > 0.01
        amb = np.asarray(sky_ambient(lut))
        assert amb.shape == (3,) and (amb > 0).all()

    def test_sunset_reddens_horizon(self, luts):
        p, t, ms = luts
        sun_low = jnp.array([0.0, 0.05, -0.999])
        sun_low = sun_low / jnp.linalg.norm(sun_low)
        lut = sky_view_lut(p, t, ms, sun_low, steps=16)
        toward_sun = np.asarray(sample_sky_view(lut, sun_low))
        # red/blue ratio near the sun at sunset exceeds the zenith ratio
        up = np.asarray(sample_sky_view(lut, jnp.array([0.0, 1.0, 0.0])))
        assert toward_sun[0] / max(toward_sun[2], 1e-6) > up[0] / max(up[2], 1e-6)


class TestShadows:
    def test_clipmap_matrices_cover_doubling_extents(self):
        light = jnp.array([0.3, -0.8, 0.2])
        light = light / jnp.linalg.norm(light)
        mats = clipmap_matrices(light, jnp.zeros(3), first_width=10.0, num_clipmaps=3)
        assert mats.shape == (3, 4, 4)

        def footprint(m):
            # inverse-project the X extent of the ortho box
            return 2.0 / float(m[0, 0])

        w0, w1, w2 = footprint(mats[0]), footprint(mats[1]), footprint(mats[2])
        assert w1 == pytest.approx(2 * w0, rel=1e-3)
        assert w2 == pytest.approx(4 * w0, rel=1e-3)

    def test_shadow_render_and_resolve(self):
        from oxylus_tpu.assets.bake import bake_mesh
        from oxylus_tpu.render.scene3d import upload_meshes
        from tests.test_render3d import cube_mesh

        pos, nrm, uv, idx = cube_mesh()
        baked = bake_mesh(pos, nrm, uv, idx)
        gscene = upload_meshes([baked], [(0, 0, 0)])
        world = jnp.broadcast_to(jnp.eye(4), (2, 4, 4)).astype(jnp.float32)
        # cube at origin; light straight down
        light = jnp.array([0.0, -1.0, 0.0])
        vps = clipmap_matrices(light, jnp.zeros(3), first_width=8.0, num_clipmaps=1)
        maps = render_shadow_clipmaps(gscene, world, vps, capacity=64, k_per_tile=16)
        assert maps.shape == (1, SHADOW_MAP_SIZE, SHADOW_MAP_SIZE)
        assert float(maps.max()) > 0.0  # cube wrote depth

        # a ground point under the cube is shadowed; a far point is lit
        wp = jnp.array([[[0.0, -1.0, 0.0], [3.5, -1.0, 0.0]]])
        hit = jnp.ones((1, 2), bool)
        factor = resolve_shadows(wp, hit, vps, maps)
        assert float(factor[0, 0]) < 0.5  # under the cube
        assert float(factor[0, 1]) > 0.5  # open ground

    def test_clipmap_coverage_at_sponza_extents(self):
        """Shadow scale (VERDICT round-2 item 8): casters across a Sponza-class
        extent — 4 m, 35 m, and 140 m from the focus — must ALL resolve shadowed
        under themselves and lit beside themselves. 140 m needs the level-5
        clipmap (320 m span); the old 4-level stack (80 m max) left it unshadowed."""
        from oxylus_tpu.assets.bake import bake_mesh
        from oxylus_tpu.render.scene3d import upload_meshes
        from tests.test_render3d import cube_mesh

        baked = bake_mesh(*cube_mesh())
        dists = (4.0, 35.0, 140.0)
        gscene = upload_meshes([baked], [(0, i, 0) for i in range(len(dists))])
        world = np.broadcast_to(np.eye(4, dtype=np.float32), (3, 4, 4)).copy()
        for i, d in enumerate(dists):
            world[i, 0, 3] = d
            world[i, 1, 3] = 0.0
        world = jnp.asarray(world)
        light = jnp.array([0.0, -1.0, 0.0])
        vps = clipmap_matrices(light, jnp.zeros(3))  # default NUM_CLIPMAPS stack
        maps = render_shadow_clipmaps(gscene, world, vps, capacity=256, k_per_tile=16)
        # ground points directly under each caster vs 3 m beside it
        under = [[d, -1.0, 0.0] for d in dists]
        beside = [[d, -1.0, 3.0] for d in dists]
        wp = jnp.asarray([under + beside], jnp.float32)
        factor = np.asarray(resolve_shadows(
            wp, jnp.ones((1, 6), bool), vps, maps))
        for k, d in enumerate(dists):
            assert factor[0, k] < 0.5, f"caster at {d} m casts no shadow: {factor}"
            assert factor[0, k + 3] > 0.5, f"open ground at {d} m shadowed: {factor}"

    def test_contact_shadows_flat_scene_unshadowed(self):
        h, w = 16, 16
        depth = jnp.full((h, w), 0.5)
        wp = jnp.zeros((h, w, 3))
        hit = jnp.ones((h, w), bool)
        vp = jnp.eye(4)
        out = contact_shadows(depth, wp, hit, jnp.array([0.0, -1.0, 0.0]), vp)
        assert float(out.min()) == 1.0


class TestGTAO:
    def test_flat_plane_is_open(self):
        h, w = 32, 32
        # flat wall facing the camera at z=-5
        xs = jnp.linspace(-1, 1, w)
        ys = jnp.linspace(-1, 1, h)
        vx, vy = jnp.meshgrid(xs, ys)
        view_pos = jnp.stack([vx, vy, jnp.full_like(vx, -5.0)], axis=-1)
        normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (h, w, 3))
        hit = jnp.ones((h, w), bool)
        ao = np.asarray(gtao(view_pos, normal, hit))
        assert ao[8:-8, 8:-8].mean() > 0.8  # interior mostly unoccluded

    def test_corner_is_occluded(self):
        h, w = 32, 32
        xs = jnp.linspace(-1, 1, w)
        ys = jnp.linspace(-1, 1, h)
        vx, vy = jnp.meshgrid(xs, ys)
        # right half of the screen is a wall 0.3 units closer (step edge)
        z = jnp.where(vx > 0, -4.7, -5.0)
        view_pos = jnp.stack([vx, vy, z], axis=-1)
        normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (h, w, 3))
        hit = jnp.ones((h, w), bool)
        ao = np.asarray(gtao(view_pos, normal, hit, radius=1.0))
        # pixels on the far side near the step see the wall → darker than open interior
        edge_col = w // 2 - 2
        assert ao[h // 2, edge_col] < ao[h // 2, 4]

    def test_prefilter_and_denoise_shapes(self):
        depth = jnp.ones((64, 64)) * 0.5
        mips = prefilter_depth(depth)
        assert len(mips) == 5
        assert mips[-1].shape == (4, 4)
        noisy = jnp.ones((16, 16)).at[8, 8].set(0.0)
        smooth = denoise_ao(noisy, jnp.ones((16, 16)))
        assert 0.0 < float(smooth[8, 8]) < 1.0


def test_gtao_bitmask_recovers_visibility_behind_thin_occluders():
    """The visibility-bitmask accumulation (gtao.slang:105-131) occludes only the
    angular interval a sample's thickness-extruded surface subtends: a THIN
    ridge must darken less than a thick one with the same horizon profile —
    max-horizon scanning cannot tell them apart."""
    import jax.numpy as jnp
    import numpy as np

    from oxylus_tpu.render.gtao import gtao

    h = w = 48
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # flat wall facing the camera at z=-5, with a raised thin ridge column
    z = np.full((h, w), -5.0, np.float32)
    ridge = (np.abs(xs - 30) < 4)
    z[ridge] = -4.2  # ridge pops 0.8 toward the camera
    view_pos = np.stack([(xs - w / 2) * 0.02, (ys - h / 2) * 0.02, z], -1).astype(np.float32)
    nrm = np.zeros((h, w, 3), np.float32)
    nrm[..., 2] = 1.0
    hit = np.ones((h, w), bool)

    ao_thin = gtao(jnp.asarray(view_pos), jnp.asarray(nrm), jnp.asarray(hit),
                   thickness=0.05, radius=1.5, final_power=1.0)
    ao_thick = gtao(jnp.asarray(view_pos), jnp.asarray(nrm), jnp.asarray(hit),
                    thickness=3.0, radius=1.5, final_power=1.0)
    # probe next to the ridge
    probe = (24, 24)
    assert float(ao_thin[probe]) > float(ao_thick[probe]) + 0.02, (
        float(ao_thin[probe]), float(ao_thick[probe]),
    )

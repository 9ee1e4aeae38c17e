"""Page-cached shadow clipmaps: validity, reuse, and dynamic invalidation."""

import jax.numpy as jnp
import numpy as np

from oxylus_tpu.assets.bake import bake_mesh
from oxylus_tpu.render.camera import camera_matrices
from oxylus_tpu.render.scene3d import upload_meshes
from oxylus_tpu.render.shadows import (
    clipmap_matrices,
    render_shadow_clipmaps,
    render_shadow_clipmaps_cached,
)
from tests.test_render3d import cube_mesh


def _mostly_equal(a, b, atol=1e-4, max_bad_frac=1e-4):
    """Depth maps re-rendered by differently-fused programs may flip coverage of
    knife-edge texels (e ≈ 0 at a triangle edge); require all but a tiny
    fraction of texels to match."""
    bad = np.abs(np.asarray(a) - np.asarray(b)) > atol
    frac = bad.mean()
    assert frac <= max_bad_frac, f"{bad.sum()} texels differ ({frac:.2e} > {max_bad_frac})"


def _scene():
    cp, cn, cu, ci = cube_mesh()
    baked = bake_mesh(cp, cn, cu, ci)
    gscene = upload_meshes([baked], [(0, 0, 0), (0, 1, 0)], max_instances=2)
    world = jnp.stack([
        jnp.eye(4),
        jnp.eye(4).at[0, 3].set(3.0),
    ])
    sun = jnp.array([0.3, -0.8, 0.2])
    sun = sun / jnp.linalg.norm(sun)
    vps = clipmap_matrices(sun, jnp.zeros(3), first_width=10.0)
    return gscene, world, vps


def test_cached_first_frame_matches_uncached():
    gscene, world, vps = _scene()
    plain = render_shadow_clipmaps(gscene, world, vps)
    cached, carry = render_shadow_clipmaps_cached(gscene, world, vps, None)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(plain), atol=1e-6)
    assert "maps" in carry and "dyn_pages" in carry and "world" in carry


def test_static_second_frame_reuses_pages():
    gscene, world, vps = _scene()
    maps1, carry = render_shadow_clipmaps_cached(gscene, world, vps, None)
    maps2, carry2 = render_shadow_clipmaps_cached(gscene, world, vps, carry)
    # nothing moved and the VPs are identical → identical maps, and after the
    # second frame no pages are dynamic at all
    _mostly_equal(maps2, maps1)
    maps3, _ = render_shadow_clipmaps_cached(gscene, world, vps, carry2)
    _mostly_equal(maps3, maps1)
    assert not bool(np.asarray(carry2["dyn_pages"]).any())


def test_moved_instance_updates_its_pages():
    gscene, world, vps = _scene()
    maps1, carry = render_shadow_clipmaps_cached(gscene, world, vps, None)
    # settle the cache with one static frame
    _, carry = render_shadow_clipmaps_cached(gscene, world, vps, carry)
    # move instance 1 far away: its old shadow must vanish, new one appear
    world2 = world.at[1, 0, 3].set(-3.0)
    maps2, carry2 = render_shadow_clipmaps_cached(gscene, world2, vps, carry)
    oracle = render_shadow_clipmaps(gscene, world2, vps)
    _mostly_equal(maps2, oracle)
    assert bool(np.asarray(carry2["dyn_pages"]).any())

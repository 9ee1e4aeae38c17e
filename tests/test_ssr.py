"""Screen-space reflections: trace geometry + composite behavior."""

import numpy as np
import jax.numpy as jnp

from oxylus_tpu.render.ssr import apply_ssr, ssr_trace
from oxylus_tpu.utils import math3d


def _mirror_floor_scene(h=64, w=64):
    """A floor plane (y=0, normals up) with a bright wall ahead: floor pixels
    looking forward should reflect the wall color."""
    cam = jnp.array([0.0, 2.0, 8.0])
    proj = math3d.perspective_reverse_z(jnp.radians(60.0), 1.0, 0.05, 100.0)
    view = math3d.look_at(cam, jnp.array([0.0, 1.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    vp = proj @ view

    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ndc_x = (xs + 0.5) / w * 2 - 1
    ndc_y = (ys + 0.5) / h * 2 - 1

    world_pos = np.zeros((h, w, 3), np.float32)
    normal = np.zeros((h, w, 3), np.float32)
    color = np.zeros((h, w, 3), np.float32)
    depth = np.zeros((h, w), np.float32)
    hit = np.ones((h, w), bool)

    wall_z = -4.0
    for r in range(h):
        for c in range(w):
            # lower half: floor y=0; upper half: wall at z=-4
            if ndc_y[r, c] > 0.15:
                # floor: intersect the camera ray with y=0 (approximate param)
                world_pos[r, c] = (ndc_x[r, c] * 4.0, 0.0, 2.0 - ndc_y[r, c] * 5.0)
                normal[r, c] = (0, 1, 0)
                color[r, c] = (0.05, 0.05, 0.05)
            else:
                world_pos[r, c] = (ndc_x[r, c] * 4.0, 2.0 - ndc_y[r, c] * 4.0, wall_z)
                normal[r, c] = (0, 0, 1)
                color[r, c] = (1.0, 0.2, 0.1)  # bright wall
            ph = np.concatenate([world_pos[r, c], [1.0]])
            clip = np.asarray(vp) @ ph
            depth[r, c] = clip[2] / max(clip[3], 1e-6)

    return (
        jnp.asarray(depth), jnp.asarray(world_pos), jnp.asarray(normal),
        jnp.asarray(hit), jnp.asarray(color), cam, vp,
    )


def test_ssr_trace_hits_wall_from_floor():
    depth, wpos, nrm, hit, color, cam, vp = _mirror_floor_scene()
    refl, conf = ssr_trace(depth, wpos, nrm, hit, color, cam, vp, steps=16)
    conf = np.asarray(conf)
    refl = np.asarray(refl)
    floor = np.asarray(wpos)[..., 1] < 0.01
    hits = conf > 0.1
    assert (hits & floor).sum() > 20, "no floor pixels found a reflection"
    # reflected color where confident should be the bright wall color
    strong = hits & floor & (refl[..., 0] > 0.5)
    assert strong.sum() > 10, "reflections did not pick up the wall color"


def test_apply_ssr_brightens_smooth_floor_only():
    depth, wpos, nrm, hit, color, cam, vp = _mirror_floor_scene()
    gb = {
        "world_pos": wpos, "normal": nrm, "hit": hit,
        "roughness": jnp.full(depth.shape, 0.05),
        "metallic": jnp.full(depth.shape, 1.0),
        "albedo": jnp.ones(depth.shape + (3,)),
    }
    out = np.asarray(apply_ssr(color, gb, depth, cam, vp, steps=16))
    base = np.asarray(color)
    floor = np.asarray(wpos)[..., 1] < 0.01
    assert out[floor][:, 0].max() > base[floor][:, 0].max() + 0.05

    gb_rough = dict(gb, roughness=jnp.full(depth.shape, 0.9))
    out_r = np.asarray(apply_ssr(color, gb_rough, depth, cam, vp, steps=16))
    np.testing.assert_allclose(out_r, base, atol=1e-5)  # rough surfaces untouched

"""Native C++ geometry kernel tests (meshlets + QEM simplify) and LOD chain quality."""

import numpy as np
import pytest

from oxylus_tpu.assets import native
from oxylus_tpu.assets.bake import bake_mesh, build_meshlets


def sphere_mesh(n_theta=24, n_phi=48, radius=1.0):
    verts = []
    for i in range(n_theta + 1):
        theta = np.pi * i / n_theta
        for j in range(n_phi):
            phi = 2 * np.pi * j / n_phi
            verts.append(
                [
                    radius * np.sin(theta) * np.cos(phi),
                    radius * np.cos(theta),
                    radius * np.sin(theta) * np.sin(phi),
                ]
            )
    verts = np.asarray(verts, np.float32)
    idx = []
    for i in range(n_theta):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            idx += [a, c, b, b, c, d]
    idx = np.asarray(idx, np.uint32)
    nrm = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    uv = np.zeros((len(verts), 2), np.float32)
    return verts, nrm.astype(np.float32), uv, idx


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
class TestNative:
    def test_meshlets_cover_all_triangles(self):
        verts, _, _, idx = sphere_mesh(12, 24)
        out = native.build_meshlets_native(verts, idx)
        assert out is not None
        mvo, mvc, mto, mtc, indirect, local = out
        assert (mvc <= 64).all() and (mtc <= 64).all()
        assert mtc.sum() == len(idx) // 3
        # reconstruct all triangles as a multiset
        recon = []
        for m in range(len(mvo)):
            lt = local[mto[m] : mto[m] + mtc[m]]
            tris = indirect[mvo[m] + lt.astype(np.int64)]
            recon.extend(map(tuple, np.sort(tris, axis=1)))
        orig = list(map(tuple, np.sort(idx.reshape(-1, 3), axis=1)))
        assert sorted(recon) == sorted(orig)

    def test_simplify_halves_sphere(self):
        verts, _, _, idx = sphere_mesh(24, 48)
        out = native.simplify_native(verts, idx, len(idx) // 2)
        assert out is not None
        new_idx, err = out
        assert len(new_idx) <= len(idx) * 0.65
        assert len(new_idx) >= len(idx) * 0.2
        assert len(new_idx) % 3 == 0
        # simplified sphere stays near the unit sphere
        used = np.unique(new_idx)
        radii = np.linalg.norm(verts[used], axis=1)
        assert radii.min() > 0.8 and radii.max() < 1.2
        assert err < 0.5

    def test_simplify_respects_max_error(self):
        verts, _, _, idx = sphere_mesh(16, 32)
        out = native.simplify_native(verts, idx, 12, max_error=1e-8)
        new_idx, err = out
        # with an impossibly tight error budget nothing (or almost nothing) collapses
        assert len(new_idx) > len(idx) * 0.9

    def test_simplify_preserves_boundary(self):
        # open grid patch: boundary ring must survive simplification
        n = 12
        xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
        verts = np.stack([xs, ys, np.zeros_like(xs)], axis=-1).reshape(-1, 3).astype(np.float32)
        idx = []
        for i in range(n - 1):
            for j in range(n - 1):
                a = i * n + j
                idx += [a, a + 1, a + n, a + 1, a + n + 1, a + n]
        idx = np.asarray(idx, np.uint32)
        new_idx, _ = native.simplify_native(verts, idx, len(idx) // 3)
        used = verts[np.unique(new_idx)]
        # corners of the patch survive
        for corner in ([0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]):
            d = np.linalg.norm(used - np.asarray(corner), axis=1).min()
            assert d < 0.1


class TestLODChain:
    def test_sphere_lod_chain(self):
        verts, nrm, uv, idx = sphere_mesh(24, 48)
        baked = bake_mesh(verts, nrm, uv, idx)
        assert len(baked.lods) >= 3
        counts = [lod.index_count for lod in baked.lods]
        # strictly decreasing triangle counts, error monotone
        assert all(counts[i + 1] < counts[i] for i in range(len(counts) - 1))
        errors = [lod.error for lod in baked.lods]
        assert errors[0] == 0.0
        assert all(errors[i + 1] >= errors[i] for i in range(len(errors) - 1))
        assert all(e <= 0.5 for e in errors)

    def test_meshlet_consistency_all_lods(self):
        verts, nrm, uv, idx = sphere_mesh(16, 32)
        baked = bake_mesh(verts, nrm, uv, idx)
        for lod in baked.lods:
            md = lod.meshlets
            assert md.triangle_count.sum() * 3 == lod.index_count
            assert (md.vertex_count <= 64).all()
            assert (md.triangle_count <= 64).all()

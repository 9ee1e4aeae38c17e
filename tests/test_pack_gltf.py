"""Pack container + glTF importer tests."""

import base64
import json
import struct

import numpy as np
import pytest

from oxylus_tpu.assets.bake import bake_mesh
from oxylus_tpu.assets.gltf import load_gltf
from oxylus_tpu.assets.pack import (
    arrays_to_baked_mesh,
    baked_mesh_to_arrays,
    compile_resources,
    load_pack,
    save_pack,
)
from tests.test_render3d import cube_mesh


def write_test_gltf(path):
    """Minimal triangle glTF with embedded base64 buffer."""
    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
    indices = np.array([0, 1, 2], np.uint16)
    buf = positions.tobytes() + normals.tobytes() + indices.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"name": "tri", "mesh": 0, "translation": [1, 2, 3]}],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "NORMAL": 1},
                        "indices": 2,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {
                "name": "red",
                "pbrMetallicRoughness": {"baseColorFactor": [1, 0, 0, 1], "roughnessFactor": 0.5},
                "emissiveFactor": [0.1, 0.2, 0.3],
            }
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 6},
        ],
        "buffers": [
            {
                "byteLength": len(buf),
                "uri": "data:application/octet-stream;base64," + base64.b64encode(buf).decode(),
            }
        ],
    }
    path.write_text(json.dumps(doc))


def test_gltf_load(tmp_path):
    p = tmp_path / "tri.gltf"
    write_test_gltf(p)
    model = load_gltf(p)
    assert len(model.meshes) == 1
    prim = model.meshes[0][0]
    np.testing.assert_allclose(prim.positions, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    np.testing.assert_array_equal(prim.indices, [0, 1, 2])
    assert prim.material == 0
    mat = model.materials[0]
    assert mat.base_color == (1, 0, 0, 1)
    assert mat.roughness == 0.5
    assert mat.emissive == (0.1, 0.2, 0.3)
    node = model.nodes[0]
    assert node.mesh == 0
    assert node.translation == (1, 2, 3)
    assert model.root_nodes == [0]


def test_glb_roundtrip(tmp_path):
    # build a GLB wrapping the same JSON (no BIN chunk; embedded base64 buffer)
    p = tmp_path / "tri.gltf"
    write_test_gltf(p)
    doc_bytes = p.read_bytes()
    pad = (4 - len(doc_bytes) % 4) % 4
    doc_bytes += b" " * pad
    glb = (
        struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(doc_bytes))
        + struct.pack("<II", len(doc_bytes), 0x4E4F534A)
        + doc_bytes
    )
    gp = tmp_path / "tri.glb"
    gp.write_bytes(glb)
    model = load_gltf(gp)
    assert len(model.meshes[0][0].indices) == 3


def test_pack_roundtrip(tmp_path):
    pos, nrm, uv, idx = cube_mesh()
    baked = bake_mesh(pos, nrm, uv, idx)
    path = tmp_path / "test.oxpack"
    save_pack(path, {"cube": baked_mesh_to_arrays(baked)}, meta={"v": 1})
    entries, meta = load_pack(path)
    assert meta == {"v": 1}
    restored = arrays_to_baked_mesh(entries["cube"])
    np.testing.assert_array_equal(restored.positions, baked.positions)
    assert len(restored.lods) == len(baked.lods)
    np.testing.assert_array_equal(
        restored.lods[0].meshlets.local_triangles, baked.lods[0].meshlets.local_triangles
    )
    assert restored.lods[0].index_count == baked.lods[0].index_count


def test_compile_resources_cli(tmp_path):
    write_test_gltf(tmp_path / "tri.gltf")
    manifest = tmp_path / "resources.json"
    manifest.write_text(json.dumps({"models": [{"name": "tri", "path": "tri.gltf"}]}))
    out = tmp_path / "out.oxpack"
    info = compile_resources(manifest, out)
    assert info["entries"] == 1
    entries, _ = load_pack(out)
    assert "tri/mesh0_0" in entries


def test_ktx2_dds_texture_loading(tmp_path):
    """KTX2 (plain + zstd supercompressed) and uncompressed DDS decode — the
    reference's Texture.hpp:77-140 container support."""
    import struct

    import numpy as np

    from oxylus_tpu.assets.texture import Texture, write_ktx2

    px = np.random.default_rng(0).integers(0, 255, (16, 24, 4), dtype=np.uint8)
    write_ktx2(tmp_path / "a.ktx2", px)
    assert (Texture.load(tmp_path / "a.ktx2").pixels == px).all()
    write_ktx2(tmp_path / "z.ktx2", px, zstd=True)
    t = Texture.load(tmp_path / "z.ktx2")
    assert (t.pixels == px).all() and t.srgb

    hdr = b"DDS " + struct.pack("<7I", 124, 0x100F, 16, 24, 24 * 4, 0, 0) + b"\0" * 44
    pf = struct.pack("<8I", 32, 0x41, 0, 32, 0xFF0000, 0xFF00, 0xFF, 0xFF000000)  # BGRA
    (tmp_path / "b.dds").write_bytes(hdr + pf + b"\0" * 20 + px.tobytes())
    d = Texture.load(tmp_path / "b.dds")
    assert (d.pixels[..., 0] == px[..., 2]).all()  # swizzled to RGBA

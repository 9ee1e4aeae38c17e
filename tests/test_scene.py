import json

import numpy as np
import pytest

from oxylus_tpu.scene import components as C
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.serialize import scene_from_json, scene_to_json
from oxylus_tpu.scene.state import SceneSpec


def make_scene():
    s = Scene("test")
    e = s.create_entity("box")
    e.add("TransformComponent", position=(1.0, 2.0, 3.0))
    e.add("BoxColliderComponent", size=(0.5, 0.5, 0.5))
    e.add("RigidBodyComponent", type="Dynamic", mass=2.0)
    child = s.create_entity("child").child_of(e)
    child.add("TransformComponent", position=(0.0, 1.0, 0.0))
    return s


def test_entity_basics():
    s = make_scene()
    e = s.entity("box")
    assert e is not None
    assert e.has("TransformComponent")
    assert e.get("RigidBodyComponent")["mass"] == 2.0
    assert e.get("RigidBodyComponent")["type"] == "Dynamic"
    kids = list(e.children())
    assert len(kids) == 1 and kids[0].name == "child"


def test_unique_names():
    s = Scene()
    a = s.create_entity("e")
    b = s.create_entity("e")
    assert a.name != b.name


def test_destroy_recursive():
    s = make_scene()
    s.entity("box").destruct()
    assert s.entity("box") is None
    assert s.entity("child") is None


def test_query():
    s = make_scene()
    got = [e.name for e in s.query("TransformComponent", "RigidBodyComponent")]
    assert got == ["box"]


def test_tags():
    s = make_scene()
    e = s.entity("box")
    e.add("Hidden")
    assert e.has("Hidden")
    e.remove("Hidden")
    assert not e.has("Hidden")


def test_json_roundtrip():
    s = make_scene()
    data = scene_to_json(s)
    # schema shape checks (reference Scene::to_json layout)
    assert set(data) == {"name", "config", "scripts", "entities"}
    assert data["entities"][0]["name"] == "box"
    comp_names = [list(c)[0] for c in data["entities"][0]["components"]]
    assert "Core.TransformComponent" in comp_names
    assert "Core.RigidBodyComponent" in comp_names
    # vec as {x,y,z}, enums as names
    tc = [c for c in data["entities"][0]["components"] if "Core.TransformComponent" in c][0]
    assert tc["Core.TransformComponent"]["position"] == {"x": 1.0, "y": 2.0, "z": 3.0}
    rb = [c for c in data["entities"][0]["components"] if "Core.RigidBodyComponent" in c][0]
    assert rb["Core.RigidBodyComponent"]["type"] == "Dynamic"

    s2 = scene_from_json(json.loads(json.dumps(data)))
    assert s2.scene_name == "test"
    e2 = s2.entity("box")
    assert e2.get("RigidBodyComponent")["mass"] == 2.0
    np.testing.assert_allclose(e2.get("TransformComponent")["position"], [1.0, 2.0, 3.0])
    assert s2.entity("child").parent.name == "box"


def test_json_skips_unknown_component(caplog):
    obj = {
        "name": "x",
        "scripts": [],
        "entities": [
            {
                "name": "e",
                "tags": [],
                "components": [
                    {"Core.TransformComponent": {"position": {"x": 0, "y": 0, "z": 0}}},
                    {"Core.BogusComponent": {"foo": 1}},
                ],
                "children": [],
            }
        ],
    }
    s = scene_from_json(obj)
    assert s.entity("e").has("TransformComponent")


def test_scene_copy_roundtrip():
    s = make_scene()
    s2 = s.copy()
    assert s2.scene_name == "test_copy"
    assert s2.entity("box").get("RigidBodyComponent")["mass"] == 2.0


def test_renderer_config_roundtrip():
    s = make_scene()
    s.renderer_config.bloom_intensity = 0.5
    data = scene_to_json(s)
    assert data["config"]["bloom"]["intensity"] == 0.5
    s2 = scene_from_json(data)
    assert s2.renderer_config.bloom_intensity == 0.5


def test_device_state_transforms():
    s = make_scene()
    st = s.to_device_state()
    box = s.entity("box").index
    child = s.entity("child").index
    w = np.asarray(st.world)
    np.testing.assert_allclose(w[box][:3, 3], [1.0, 2.0, 3.0], atol=1e-6)
    # child world = parent world @ local (+1 in y)
    np.testing.assert_allclose(w[child][:3, 3], [1.0, 3.0, 3.0], atol=1e-6)


def test_hierarchy_levels():
    s = Scene()
    a = s.create_entity("a")
    a.add("TransformComponent")
    b = s.create_entity("b").child_of(a)
    b.add("TransformComponent", position=(1.0, 0.0, 0.0))
    c = s.create_entity("c").child_of(b)
    c.add("TransformComponent", position=(0.0, 1.0, 0.0))
    s.set_field(a.index, "TransformComponent", "position", (0.0, 0.0, 5.0))
    st = s.to_device_state()
    w = np.asarray(st.world)
    np.testing.assert_allclose(w[c.index][:3, 3], [1.0, 1.0, 5.0], atol=1e-6)


def test_reparent_cycle_rejected():
    s = Scene()
    a = s.create_entity("a")
    b = s.create_entity("b").child_of(a)
    with pytest.raises(ValueError):
        a.child_of(b)


def test_all_components_have_unique_paths():
    paths = [c.path for c in C.COMPONENTS]
    assert len(paths) == len(set(paths))
    # full reference component schema (Components.hpp:11-435): 16 render/sim + rigidbody
    # + 6 colliders + character controller + 2 audio + 2 tags
    assert len(C.COMPONENTS) == 28

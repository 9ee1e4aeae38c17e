"""Editor layer: selection, undo/redo, play-in-editor, panels, gizmo math."""

import numpy as np
import pytest

from oxylus_tpu.editor import (
    EditorContext,
    GizmoMode,
    GizmoOp,
    InspectorPanel,
    SceneHierarchyPanel,
    SceneStateKind,
    ViewportPanel,
    gizmo_drag,
    pick_gizmo_axis,
)
from oxylus_tpu.render.camera import camera_matrices
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.state import SceneSpec

import jax.numpy as jnp


def _scene():
    s = Scene("edit", spec=SceneSpec(max_entities=128))
    root = s.create_entity("root")
    root.add("TransformComponent", position=(0.0, 0.0, 0.0))
    child = s.create_entity("child")
    child.add("TransformComponent", position=(1.0, 0.0, 0.0))
    child.child_of(root)
    box = s.create_entity("box")
    box.add("TransformComponent", position=(0.0, 2.0, 0.0))
    box.add("BoxColliderComponent", size=(0.5, 0.5, 0.5))
    box.add("RigidBodyComponent")
    return s


def _camera():
    return camera_matrices(
        position=jnp.array([0.0, 0.0, 5.0]), yaw=jnp.float32(-jnp.pi / 2),
        pitch=jnp.float32(0.0), tilt=jnp.float32(0.0), fov_deg=jnp.float32(60.0),
        near=jnp.float32(0.1), far=jnp.float32(100.0), zoom=jnp.float32(1.0),
        projection_kind=jnp.int32(0), aspect=jnp.float32(16 / 9),
    )


def test_undo_redo_roundtrip():
    ctx = EditorContext(_scene())
    before = ctx.scene.get_field(0, "TransformComponent", "position").copy()
    ctx.set_field(0, "TransformComponent", "position", (5.0, 0.0, 0.0))
    assert ctx.undo_count == 1
    assert ctx.scene.get_field(0, "TransformComponent", "position")[0] == 5.0
    assert ctx.undo()
    np.testing.assert_allclose(
        ctx.scene.get_field(0, "TransformComponent", "position"), before
    )
    assert ctx.redo()
    assert ctx.scene.get_field(0, "TransformComponent", "position")[0] == 5.0
    assert not ctx.redo()


def test_play_in_editor_isolates_edit_scene():
    ctx = EditorContext(_scene())
    play = ctx.on_scene_play()
    assert ctx.state == SceneStateKind.PLAY
    assert play is not ctx.edit_scene
    # runtime edits do not touch the edit scene
    play.set_field(0, "TransformComponent", "position", (9.0, 9.0, 9.0))
    assert ctx.edit_scene.get_field(0, "TransformComponent", "position")[0] == 0.0
    back = ctx.on_scene_stop()
    assert back is ctx.edit_scene
    assert ctx.state == SceneStateKind.EDIT


def test_hierarchy_panel_tree():
    ctx = EditorContext(_scene())
    ctx.select(1)
    tree = SceneHierarchyPanel(ctx).build()
    names = {n.name: n for n in tree}
    assert "root" in names and "box" in names
    assert [c.name for c in names["root"].children] == ["child"]
    assert names["root"].children[0].selected


def test_inspector_views_and_edit():
    ctx = EditorContext(_scene())
    panel = InspectorPanel(ctx)
    views = panel.build(entity=2)
    comp_names = {v.name for v in views}
    assert {"TransformComponent", "BoxColliderComponent", "RigidBodyComponent"} <= comp_names
    rb = next(v for v in views if v.name == "RigidBodyComponent")
    field_names = {f.name for f in rb.fields}
    assert "mass" in field_names and "type" in field_names
    panel.edit(2, "RigidBodyComponent", "mass", 3.5)
    assert float(ctx.scene.get_field(2, "RigidBodyComponent", "mass")) == pytest.approx(3.5)
    assert ctx.undo()


def test_gizmo_axis_pick_and_translate():
    cam = _camera()
    pos = (0.0, 0.0, 0.0)
    w, h = 1920, 1080
    # the +X handle extends right of center: a pixel right of center must pick X
    axis = pick_gizmo_axis(cam, w * 0.58, h * 0.5, w, h, pos)
    assert axis == 0
    # dragging right along X moves +x
    upd = gizmo_drag(cam, GizmoOp.TRANSLATE, 0, (w * 0.5, h * 0.5), (w * 0.6, h * 0.5), w, h, pos)
    assert "position" in upd
    assert upd["position"][0] > 0.05
    assert abs(upd["position"][1]) < 1e-3


def test_gizmo_rotate_and_scale():
    cam = _camera()
    upd = gizmo_drag(
        cam, GizmoOp.ROTATE, 1, (100.0, 100.0), (200.0, 100.0),
        1920, 1080, (0.0, 0.0, 0.0), (0.0, 0.0, 0.0, 1.0),
    )
    q = np.asarray(upd["rotation"])
    assert abs(np.linalg.norm(q) - 1.0) < 1e-5
    assert abs(q[1]) > 1e-3  # rotated about Y

    upd = gizmo_drag(
        cam, GizmoOp.SCALE, 0, (960.0, 540.0), (1100.0, 540.0),
        1920, 1080, (0.0, 0.0, 0.0), None, (1.0, 1.0, 1.0),
    )
    assert upd["scale"][0] != 1.0
    assert upd["scale"][1] == 1.0


def test_viewport_pick_selects():
    ctx = EditorContext(_scene())
    vp = ViewportPanel(ctx, 8, 8)
    vis = np.full((8, 8), -1, np.int32)
    vis[4, 4] = 2
    assert vp.pick(vis, 4, 4) == 2
    assert ctx.selection == [2]
    assert vp.pick(vis, 0, 0) == -1
    assert ctx.selection == []


def test_content_panel_browses_and_thumbnails(tmp_path):
    """ContentPanel (reference ContentPanel.cpp): typed listing from the asset
    extension map + .oxasset sidecar UUIDs, sandboxed navigation, thumbnails."""
    import numpy as np

    from oxylus_tpu.assets.manager import AssetManager
    from oxylus_tpu.editor.context import EditorContext
    from oxylus_tpu.editor.panels import ContentPanel
    from oxylus_tpu.scene.scene import Scene
    from oxylus_tpu.scene.state import SceneSpec

    root = tmp_path / "proj"
    (root / "textures").mkdir(parents=True)
    (root / "scenes").mkdir()
    # a tiny real texture
    try:
        from PIL import Image

        Image.fromarray(
            np.tile(np.array([255, 0, 0], np.uint8), (8, 8, 1))
        ).save(root / "textures" / "red.png")
    except ImportError:
        np.save(root / "textures" / "red.npy",
                np.tile(np.array([255, 0, 0, 255], np.uint8), (8, 8, 1)))
    (root / "scenes" / "level.oxscene").write_text("{}")
    (root / "player.py").write_text("def on_scene_update(*a): pass\n")

    mgr = AssetManager()
    mgr.init()
    ctx = EditorContext(Scene("ed", spec=SceneSpec(max_entities=8)))
    panel = ContentPanel(ctx, str(root), asset_manager=mgr)

    entries = panel.build()
    names = [e.name for e in entries]
    assert names[:2] == ["scenes", "textures"]  # dirs first
    assert any(e.asset_type == "SCRIPT" for e in entries)

    panel.navigate(str(root / "textures"))
    tex_entries = panel.build()
    assert tex_entries and tex_entries[0].asset_type == "TEXTURE"
    th = panel.thumbnail(tex_entries[0].path)
    assert th.shape == (64, 64, 4)
    assert int(th[..., 0].mean()) > 200  # red texture thumb

    # sidecar import → uuid shows up in the listing
    uuid = panel.import_asset(tex_entries[0].path)
    assert uuid
    again = [e for e in panel.build() if not e.is_dir][0]
    assert again.uuid == uuid

    # breadcrumbs + sandboxing
    assert panel.breadcrumbs() == ["proj", "textures"]
    panel.go_up()
    assert panel.current == str(root)
    import pytest as _pt

    with _pt.raises(ValueError):
        panel.navigate(str(tmp_path))

"""Editor workspace panels: text editor close-queue protocol, settings rebind,
project selector load/prune, panel registry.

References: /root/reference/Oxylus/src/UI/TextEditor.cpp,
/root/reference/OxylusEditor/src/Panels/{EditorSettingsPanel,ProjectPanel,
EditorPanelRegistry}.*
"""

from pathlib import Path

from oxylus_tpu.editor.workspace import (
    EditorPanelRegistry,
    EditorSettingsPanel,
    ProjectPanel,
    TextEditorPanel,
)


def test_text_editor_edit_and_save(tmp_path):
    f = tmp_path / "script.py"
    f.write_text("def tick():\n    pass\n")
    saved = []
    ed = TextEditorPanel(save_file_callback=saved.append)
    doc = ed.open_file(f)
    assert not doc.dirty
    doc.cursor = len(doc.content)
    doc.insert("# end\n")
    assert doc.dirty
    ed.save()
    assert not doc.dirty
    assert f.read_text().endswith("# end\n")
    assert saved and saved[0].endswith("# end\n")
    # reopening focuses the existing tab, no duplicate
    again = ed.open_file(f)
    assert again is doc and len(ed.documents) == 1


def test_text_editor_close_queue_unsaved(tmp_path):
    f = tmp_path / "a.txt"
    f.write_text("hello")
    ed = TextEditorPanel()
    doc = ed.open_file(f)
    # clean docs close immediately
    assert ed.request_close("a.txt") is True
    # dirty docs enter the close queue and stay open
    doc = ed.open_file(f)
    doc.insert("x")
    assert ed.request_close("a.txt") is False
    assert ed.build()["close_queue"] == ["a.txt"]
    assert "a.txt" in ed.documents
    # cancel keeps everything
    ed.cancel_close()
    assert "a.txt" in ed.documents
    # confirm with save writes then closes
    ed.request_close("a.txt")
    ed.confirm_close(save=True)
    assert "a.txt" not in ed.documents
    assert f.read_text().startswith("x")


def test_text_editor_cursor_ops():
    ed = TextEditorPanel()
    doc = ed.open_scratch("s", "abcdef")
    doc.cursor = 3
    doc.delete(2)  # backspace 2 before cursor
    assert doc.content == "adef" and doc.cursor == 1
    doc.insert("XY")
    assert doc.content == "aXYdef"
    assert doc.lines() == ["aXYdef"]


def test_settings_rebind_and_general():
    class Ctx:
        pass

    st = EditorSettingsPanel(Ctx())
    st.set_general("undo_history_size", 64)
    assert st.ctx.max_history == 64
    assert st.feed_key(ord("Q")) is False  # not listening
    st.begin_rebind("editor.play")
    data = st.build()
    listening = [k for k in data["keybinds"] if k["listening"]]
    assert listening and listening[0]["action"] == "editor.play"
    assert st.feed_key(ord("G")) is True
    assert st.keybinds["editor.play"] == ord("G")
    assert st.waiting_for_bind is None


def test_project_panel_new_load_prune(tmp_path):
    pp = ProjectPanel()
    proj = pp.new_project(tmp_path / "game", "MyGame")
    oxproj = tmp_path / "game" / "MyGame.oxproj"
    assert oxproj.exists()
    assert pp.build()["recent"][0] == str(oxproj)
    # load for editor (no start scene configured → scene None)
    proj2, scene = pp.load_project_for_editor(oxproj)
    assert proj2 is not None and proj2.config.name == "MyGame"
    assert scene is None
    assert pp.visible is False  # selector closes on load
    # missing file is pruned from recents
    ghost = tmp_path / "gone.oxproj"
    pp.add_recent(ghost)
    got, _ = pp.load_project_for_editor(ghost)
    assert got is None
    assert str(ghost) not in pp.recent


def test_project_start_scene_roundtrip(tmp_path):
    from oxylus_tpu.scene.scene import Scene
    from oxylus_tpu.scene.serialize import save_to_file
    from oxylus_tpu.scene.state import SceneSpec

    pp = ProjectPanel()
    proj = pp.new_project(tmp_path / "g2", "G2")
    s = Scene("level1", spec=SceneSpec(max_entities=16))
    s.create_entity("hero").add("TransformComponent", position=(1.0, 2.0, 3.0))
    save_to_file(s, proj.asset_path / "level1.oxscene")
    proj.config.start_scene = "level1.oxscene"
    proj.save(tmp_path / "g2" / "G2.oxproj")

    _, scene = pp.load_project_for_editor(tmp_path / "g2" / "G2.oxproj", spec=SceneSpec(max_entities=16))
    assert scene is not None
    assert scene.scene_name == "level1"


def test_panel_registry_typed_access_and_menu():
    reg = EditorPanelRegistry()
    ed = reg.add(TextEditorPanel)
    assert reg.add(TextEditorPanel) is ed  # singleton per type
    reg.add(EditorSettingsPanel)
    reg.add(ProjectPanel)
    assert reg.get(ProjectPanel).PANEL_NAME == "Projects"
    assert TextEditorPanel in reg
    menu = reg.window_menu()
    names = {m["name"] for m in menu}
    assert {"Text Editor", "Editor Settings", "Projects"} <= names
    # text editor starts hidden; projects selector starts visible
    out = reg.render_all()
    assert "Projects" in out and "Text Editor" not in out
    reg.toggle("Text Editor")
    assert "Text Editor" in reg.render_all()

"""ImGui-analog layer: Dear-ImGui interaction semantics over the engine Input.

Covers the reference's `ImGuiRenderer` module role
(/root/reference/Oxylus/src/UI/ImGuiRenderer.cpp): immediate-mode widgets
declared per frame, hot/active id tracking, rasterized through the engine's
own 2D sprite path.
"""

import numpy as np

from oxylus_tpu.core.input import Input
from oxylus_tpu.ui.imgui import ROW_H, ImGuiRenderer


def _frame(gui, inp, build):
    gui.new_frame(input_module=inp)
    out = build(gui)
    gui.render()
    inp.update()
    return out


def test_button_fires_on_release_inside():
    inp = Input()
    gui = ImGuiRenderer(320, 240)

    def build(g):
        g.begin("win", x=10, y=10, w=200, h=100)
        clicked = g.button("Fire")
        g.end()
        return clicked

    # hover only: no click
    inp.inject_mouse_move(40, 10 + ROW_H + 6 + 5)
    assert _frame(gui, inp, build) is False
    # press: still no click (ImGui fires on release)
    inp.inject_mouse_down(0)
    assert _frame(gui, inp, build) is False
    # release over the button: click fires
    inp.inject_mouse_up(0)
    assert _frame(gui, inp, build) is True
    # idle frame: no spurious repeat
    assert _frame(gui, inp, build) is False


def test_button_press_then_drag_off_cancels():
    inp = Input()
    gui = ImGuiRenderer(320, 240)

    def build(g):
        g.begin("win", x=10, y=10, w=200, h=100)
        clicked = g.button("Fire")
        g.end()
        return clicked

    inp.inject_mouse_move(40, 10 + ROW_H + 6 + 5)
    inp.inject_mouse_down(0)
    _frame(gui, inp, build)
    # drag off the widget, then release: no click
    inp.inject_mouse_move(300, 200)
    inp.inject_mouse_up(0)
    assert _frame(gui, inp, build) is False


def test_checkbox_toggles_and_persists():
    inp = Input()
    gui = ImGuiRenderer(320, 240)

    def build(g):
        g.begin("opts", x=0, y=0, w=200, h=100)
        v = g.checkbox("vsync", default=False)
        g.end()
        return v

    assert _frame(gui, inp, build) is False
    inp.inject_mouse_move(40, ROW_H + 6 + 5)
    inp.inject_mouse_down(0)
    _frame(gui, inp, build)
    inp.inject_mouse_up(0)
    assert _frame(gui, inp, build) is True  # toggled on release
    assert _frame(gui, inp, build) is True  # persists across frames
    assert gui.get_value("opts", "vsync") is True


def test_slider_tracks_mouse_fraction():
    inp = Input()
    gui = ImGuiRenderer(320, 240)

    def build(g):
        g.begin("s", x=0, y=0, w=206, h=100)
        v = g.slider_float("gain", 0.0, 10.0, 5.0)
        g.end()
        return v

    assert _frame(gui, inp, build) == 5.0  # default before interaction
    # drag to 3/4 along the row (row spans x=PAD..w-PAD => 6..200)
    row_y = ROW_H + 6 + 5
    inp.inject_mouse_move(6 + 0.75 * (206 - 12), row_y)
    inp.inject_mouse_down(0)
    v = _frame(gui, inp, build)
    assert abs(v - 7.5) < 0.2
    inp.inject_mouse_up(0)
    # value persists after release
    assert abs(_frame(gui, inp, build) - v) < 1e-6


def test_collapse_hides_body_and_window_state_persists():
    inp = Input()
    gui = ImGuiRenderer(320, 240)

    opened = []

    def build(g):
        opened.append(g.begin("w", x=10, y=10, w=100, h=80))
        if opened[-1]:
            g.text("body")
        g.end()
        return None

    _frame(gui, inp, build)
    assert opened[-1] is True
    # click the title bar to collapse
    inp.inject_mouse_move(30, 15)
    inp.inject_mouse_down(0)
    _frame(gui, inp, build)
    inp.inject_mouse_up(0)
    _frame(gui, inp, build)
    assert opened[-1] is False
    assert gui._windows["w"].collapsed is True


def test_render_composites_over_frame():
    inp = Input()
    gui = ImGuiRenderer(128, 96)
    gui.new_frame(input_module=inp)
    gui.begin("hud", x=4, y=4, w=100, h=60)
    gui.text("FPS 60")
    gui.button("Go")
    gui.end()
    frame = np.zeros((96, 128, 3), np.float32)
    out = gui.render(frame=frame)
    assert out.shape[:2] == (96, 128)
    # title bar + body panel drew something non-black in the window region
    assert out[8, 40, :3].max() > 0.1
    # outside the window untouched
    assert out[90, 120, :3].max() == 0.0


def test_module_lifecycle_contract():
    gui = ImGuiRenderer()
    assert gui.module_dependencies == ("Input",)

    class FakeApp:
        def get_module(self, name):
            assert name == "Input"
            return Input()

    gui.init(app=FakeApp())
    assert gui._input is not None
    gui.update(0.016)
    gui.deinit()
    assert gui._windows == {}

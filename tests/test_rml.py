"""RML/RCSS document system: parse, cascade, layout, data binding, input
routing, and rasterization through the 2D sprite path.

Covers the reference's RmlUI family role
(/root/reference/Oxylus/src/UI/{RmlUI,RmlView,RmlRenderer,RmlSystem}.cpp).
"""

import numpy as np

from oxylus_tpu.ui.rml import (
    RmlDocument,
    RmlUIModule,
    RmlView,
    parse_color,
    parse_rcss,
    parse_rml,
    selector_matches,
)
from oxylus_tpu.ui.text import GLYPH_H, UIDocument

DOC = """
<rml>
<head>
<style>
body { background-color: #202030; }
div { padding: 8; }
.menu { background-color: #334; width: 50%; }
.menu p { color: yellow; }
#title { font-size: 2; text-align: center; color: white; }
button { background-color: blue; height: 24; }
button:hover { background-color: orange; }
</style>
</head>
<body>
  <div id="title">{{ game.title }}</div>
  <div class="menu">
    <p>Score: {{ score }}</p>
    <button id="play" onclick="start_game">Play</button>
  </div>
</body>
</rml>
"""


def make_doc(w=400, h=300):
    d = RmlDocument(DOC, width=w, height=h)
    d.set_data(game={"title": "OXYLUS"}, score=42)
    return d


def test_parse_tree_and_styles():
    root = parse_rml(DOC)
    assert root.tag == "body"
    assert root.find("title") is not None
    assert root.find("play").attrs["onclick"] == "start_game"
    rules = parse_rcss(root.attrs["__styles__"])
    sels = [r.selector for r in rules]
    assert "button:hover" in sels and ".menu p" in sels


def test_color_parsing():
    assert parse_color("#ff0000") == (1.0, 0.0, 0.0, 1.0)
    assert parse_color("#f00") == (1.0, 0.0, 0.0, 1.0)
    r, g, b, a = parse_color("rgba(255, 128, 0, 0.5)")
    assert abs(r - 1.0) < 1e-6 and abs(g - 128 / 255) < 1e-6 and a == 0.5
    assert parse_color("transparent")[3] == 0


def test_selector_specificity_and_descendant():
    d = make_doc()
    d.layout()
    p = [c for c in d.root.find("play").parent.children if c.tag == "p"][0]
    # .menu p beats the inherited body color
    assert p.style["color"] == "yellow"
    title = d.root.find("title")
    assert title.style["font-size"] == "2"
    assert title.style["text-align"] == "center"
    # descendant selector does not leak: the title div is not inside .menu
    assert title.style["color"] == "white"
    assert selector_matches(".menu p", p, set())
    assert not selector_matches(".menu p", title, set())


def test_block_layout_percent_width_and_padding():
    d = make_doc(w=400)
    d.layout()
    menu = [c for c in d.root.children if "menu" in c.classes][0]
    bx, by, bw, bh = menu.box
    # body pad 0 (body isn't div)... menu is a div: width 50% of available
    assert abs(bw - 0.5 * 400) < 1e-6
    # button height fixed at 24
    play = d.root.find("play")
    assert abs(play.box[3] - 24) < 1e-6
    # menu grows to contain p + button + its own 8px padding
    assert bh > play.box[3]
    # the title text interpolated from the data model and wrapped into lines
    assert d.root.find("title").attrs["__lines__"] == ["OXYLUS"]


def test_data_binding_update_relayouts():
    d = make_doc()
    d.layout()
    p = [c for c in d.root.children if "menu" in c.classes][0].children[0]
    assert p.attrs["__lines__"] == ["Score: 42"]
    d.set_data(score=1337)
    d.layout()
    assert p.attrs["__lines__"] == ["Score: 1337"]


def test_hover_pseudo_class_and_click_dispatch():
    d = make_doc()
    d.layout()
    play = d.root.find("play")
    bx, by, bw, bh = play.box
    cx, cy = bx + bw / 2, by + bh / 2

    fired = []
    d.bind("start_game", lambda el: fired.append(el.id))

    # hover restyles via :hover
    d.process_mouse(cx, cy, down=False)
    d.layout()
    assert d.root.find("play").style["background-color"] == "orange"
    # press + release inside → onclick fires once
    d.process_mouse(cx, cy, down=True)
    assert fired == []
    d.process_mouse(cx, cy, down=False)
    assert fired == ["play"]
    # press inside, release outside → no fire
    d.process_mouse(cx, cy, down=True)
    d.process_mouse(-10, -10, down=False)
    assert fired == ["play"]


def test_display_none_hides_subtree():
    d = RmlDocument(
        "<body><div id='a' style='display: none; height: 50'>"
        "<p>hidden</p></div><div id='b' style='height: 10'>x</div></body>"
    )
    d.layout()
    assert d.root.find("a").box[2] == 0
    # b flows up to the top since a takes no space
    assert d.root.find("b").box[1] == d.root.box[1]


def test_emit_renders_through_2d_path():
    d = make_doc(w=256, h=128)
    ui = UIDocument(256, 128)
    d.emit(ui)
    records, tex = ui.build_batch()
    assert len(records) > 5  # panels + glyphs
    frame = np.zeros((128, 256, 3), np.float32)
    out = np.asarray(ui.composite_over(frame))
    assert out[..., :3].max() > 0.05  # something drew


def test_view_routing_hover_and_capture():
    ui = RmlUIModule()
    d1 = make_doc(w=200, h=100)
    d2 = make_doc(w=200, h=100)
    v1 = RmlView("hud", d1, ui)
    v2 = RmlView("menu", d2, ui)
    v1.set_viewport((0, 0), (200, 100))
    v2.set_viewport((200, 0), (200, 100), keyboard_focused=True)

    assert ui.keyboard_view() is v2
    # cursor over v1
    ui.process_mouse_move(50, 50)
    assert ui.hovered_view is v1
    # press in v1, drag into v2's area: capture keeps v1
    ui.process_mouse_button(down=True)
    ui.process_mouse_move(250, 50)
    assert ui.hovered_view is v1
    ui.process_mouse_button(down=False)
    assert ui.capture_view is None
    # now hovering really moves to v2
    ui.process_mouse_move(250, 50)
    assert ui.hovered_view is v2
    # scaled local coords: viewport half-size doubles local coords
    v2.set_viewport((200, 0), (100, 50))
    lx, ly = v2.to_local(250, 25)
    assert abs(lx - 100) < 1e-6 and abs(ly - 50) < 1e-6
    v1.close()
    assert v1 not in ui.views


def test_click_through_module_fires_document_handler():
    ui = RmlUIModule()
    d = make_doc(w=200, h=150)
    v = RmlView("hud", d, ui)
    v.set_viewport((0, 0), (200, 150))
    d.layout()
    play = d.root.find("play")
    bx, by, bw, bh = play.box
    fired = []
    d.bind("start_game", lambda el: fired.append(el.id))
    ui.process_mouse_move(bx + bw / 2, by + bh / 2)
    ui.process_mouse_button(down=True)
    clicked = ui.process_mouse_button(down=False)
    assert fired == ["play"]
    assert clicked is not None and clicked.id == "play"

import numpy as np

from oxylus_tpu.ui.text import GLYPH_H, GLYPH_W, UIDocument, bake_font_atlas


def test_font_atlas_has_glyphs():
    atlas, rects = bake_font_atlas()
    assert atlas.shape[-1] == 4
    assert "A" in rects and "z" in rects and "0" in rects
    # glyph 'A' region contains ink
    x0, y0, x1, y1 = rects["A"]
    h, w = atlas.shape[:2]
    region = atlas[int(y0 * h) : int(y1 * h), int(x0 * w) : int(x1 * w), 3]
    assert region.max() > 200  # antialiased glyph ink


def test_document_batch_and_composite():
    doc = UIDocument(128, 64)
    doc.add_panel(4, 4, 120, 20, color=(0.1, 0.1, 0.3, 0.8))
    doc.add_text(8, 7, "HP 100", color=(1.0, 1.0, 0.2, 1.0))
    records, tex = doc.build_batch()
    assert records.shape[1] == 16
    assert len(records) == 1 + len("HP 100") - 1  # panel + glyphs (space skipped)

    frame = np.zeros((64, 128, 3), np.float32)
    out = doc.composite_over(frame)
    # panel darkened/blue region present
    assert out[10, 60, 2] > 0.2
    # text ink present (yellow-ish pixels)
    text_region = out[7 : 7 + GLYPH_H, 8 : 8 + GLYPH_W * 6]
    assert (text_region[..., 0] > 0.5).sum() > 5


def test_empty_document_noop():
    doc = UIDocument(32, 32)
    frame = np.full((32, 32, 3), 0.5, np.float32)
    out = doc.composite_over(frame)
    np.testing.assert_allclose(out[..., :3], 0.5, atol=1e-6)

"""Grid legend drawing: geometry, option-driven colors, strike-through,
XYZ draw_legend observable difference (VERDICT round-1 item 4)."""

import numpy as np
import pytest
from PIL import Image

from sdwebui_tpu.utils.grid_annotations import (GridAnnotation,
                                                draw_grid_annotations,
                                                draw_prompt_matrix)
from sdwebui_tpu.utils.options import opts


def _grid(cols, rows, w=64, h=48, color=(10, 200, 30)):
    return Image.new("RGB", (cols * w, rows * h), color)


def test_annotations_add_top_and_left_pads():
    im = _grid(2, 2)
    out = draw_grid_annotations(
        im, 64, 48,
        [[GridAnnotation("col a")], [GridAnnotation("col b")]],
        [[GridAnnotation("row 1")], [GridAnnotation("row 2")]])
    assert out.width == im.width + 64 * 3 // 4      # pad_left = width*3/4
    assert out.height > im.height                   # pad_top for col labels
    # top-left pad corner is background
    assert out.getpixel((1, 1)) == (255, 255, 255)
    # cells were pasted below/right of the pads
    assert out.getpixel((out.width - 2, out.height - 2)) == (10, 200, 30)


def test_no_texts_no_pads():
    im = _grid(2, 1)
    out = draw_grid_annotations(
        im, 64, 48, [[GridAnnotation("")], [GridAnnotation("")]],
        [[GridAnnotation("")]])
    assert out.width == im.width
    # empty hor texts still measure zero height -> no top pad
    assert out.height == im.height


def test_colors_come_from_options():
    im = _grid(1, 1)
    with opts.override({"grid_background_color": "#ff0000",
                        "grid_text_active_color": "#0000ff"}):
        out = draw_grid_annotations(
            im, 64, 48, [[GridAnnotation("hello")]], [[GridAnnotation("v")]])
        assert out.getpixel((1, 1)) == (255, 0, 0)
        arr = np.asarray(out)
        # some pure-blue text pixels exist in the label band
        assert ((arr[:, :, 2] > 200) & (arr[:, :, 0] < 60)).any()


def test_wrap_long_text_grows_pad():
    im = _grid(1, 1)
    short = draw_grid_annotations(
        _grid(1, 1), 64, 48, [[GridAnnotation("ab")]], [[GridAnnotation("")]])
    long = draw_grid_annotations(
        im, 64, 48,
        [[GridAnnotation("a very long annotation that must wrap lines")]],
        [[GridAnnotation("")]])
    assert long.height > short.height


def test_prompt_matrix_strikethrough():
    # 4 combinations of 2 variable parts -> 2x2 grid
    im = _grid(2, 2)
    out = draw_prompt_matrix(im, 64, 48, ["base", "red", "blue"])
    assert out.width > im.width and out.height > im.height
    arr = np.asarray(out)
    # inactive color #999999 appears (text and strike-through lines)
    assert (np.abs(arr.astype(int) - 0x99).max(axis=-1) < 8).any()


def test_bad_counts_raise():
    im = _grid(2, 1)
    with pytest.raises(AssertionError):
        draw_grid_annotations(im, 64, 48, [[GridAnnotation("only one")]],
                              [[GridAnnotation("")]])


def test_xyz_draw_legend_changes_output():
    """draw_legend=True produces a labeled (larger) grid than False."""
    import sdwebui_tpu.scripts.builtin  # noqa: F401 — registers scripts
    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.server.app import Engine

    engine = Engine(test_model=True)
    p = GenerationParams(prompt="a cat", seed=1, steps=1, width=64, height=64)
    res_legend = engine.run_script(
        "X/Y/Z plot", p, ["Steps", "1-2", "Seed", "1-2", "Nothing", "", True])
    res_plain = engine.run_script(
        "X/Y/Z plot", p, ["Steps", "1-2", "Seed", "1-2", "Nothing", "", False])
    g1, g0 = res_legend.images[0], res_plain.images[0]
    assert g1.width > g0.width and g1.height > g0.height

"""Grid legend / prompt-matrix annotation drawing.

Pixel-geometry spec comes from the reference's PIL text pipeline
(/root/reference/modules/images.py:144-250): the layout *constants* below
(label font = (cell_w+cell_h)/25, left gutter = 3/4 cell width, top gutter
sized to the tallest wrapped column label plus one line of spacing,
strike-through for inactive prompt-matrix entries) reproduce the
reference's observable geometry so grids look identical; the code itself
is structured as a separate measure pass (`_layout_labels`) + paint pass
(`_paint_label_block`) rather than the reference's single interleaved
function.  Colors and font come from the options system
(grid_text_active_color / grid_text_inactive_color / grid_background_color
/ font), so the grid_* settings change observable output.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field

from PIL import Image, ImageColor, ImageDraw, ImageFont


class GridAnnotation:
    """One label fragment for a grid row/column (public API)."""

    def __init__(self, text: str = "", is_active: bool = True):
        self.text = text
        self.is_active = is_active


@dataclass
class _Line:
    """A single wrapped, measured line of label text."""

    text: str
    active: bool
    w: int = 0
    h: int = 0


@dataclass
class _LabelBlock:
    """All wrapped lines for one row/column label + the width they may use."""

    lines: list = field(default_factory=list)
    max_width: int = 0

    def height(self, spacing: int, per_line_spacing: bool) -> int:
        """Total painted height.  Column blocks separate lines by `spacing`;
        row blocks deduct spacing per line (reference geometry quirk kept
        for pixel parity)."""
        if not self.lines:
            return 0
        total = sum(ln.h + spacing for ln in self.lines)
        return total - spacing * (len(self.lines) if per_line_spacing else 1)


@functools.lru_cache(maxsize=64)
def _load_font(path: str, fontsize: int):
    try:
        return ImageFont.truetype(path or "DejaVuSans.ttf", fontsize)
    except Exception:
        try:
            return ImageFont.load_default(size=fontsize)
        except Exception:  # very old PIL fallback
            return ImageFont.load_default()


def get_font(fontsize: int):
    from sdwebui_tpu.utils.options import opts

    return _load_font(opts.get("font") or "", max(int(fontsize), 1))


def _measure(draw, text: str, font) -> tuple[int, int]:
    left, top, right, bottom = draw.multiline_textbbox((0, 0), text, font=font)
    return right - left, bottom - top


def _wrap_words(draw, text: str, font, max_width: int) -> list[str]:
    """Greedy word wrap: keep appending words while the line still fits."""
    out = [""]
    for word in text.split():
        candidate = (out[-1] + " " + word).strip()
        if draw.textlength(candidate, font=font) <= max_width:
            out[-1] = candidate
        else:
            out.append(word)
    return out


def _layout_labels(annotations, draw, font, max_width: int) -> _LabelBlock:
    """Wrap + measure one label's annotation fragments into a _LabelBlock."""
    block = _LabelBlock(max_width=max_width)
    for ann in annotations:
        for piece in _wrap_words(draw, ann.text, font, max_width):
            w, h = _measure(draw, piece, font)
            block.lines.append(_Line(piece, ann.is_active, w, h))
    return block


def _paint_label_block(draw, center_x: float, top_y: float, block: _LabelBlock,
                       base_fontsize: int, spacing: int, color_active,
                       color_inactive) -> None:
    """Paint a measured block centered on center_x, flowing down from top_y.
    Each line independently shrinks its font until it fits the block width;
    inactive lines get a strike-through."""
    y = top_y
    for line in block.lines:
        size = base_fontsize
        font = get_font(size)
        while size > 0 and _measure(draw, line.text, font)[0] > block.max_width:
            size -= 1
            font = get_font(size)
        color = color_active if line.active else color_inactive
        draw.multiline_text((center_x, y + line.h / 2), line.text, font=font,
                            fill=color, anchor="mm", align="center")
        if not line.active:
            mid = y + line.h / 2
            draw.line((center_x - line.w // 2, mid,
                       center_x + line.w // 2, mid),
                      fill=color_inactive, width=4)
        y += line.h + spacing


def draw_grid_annotations(im: Image.Image, width: int, height: int,
                          hor_texts, ver_texts, margin: int = 0) -> Image.Image:
    """Annotate a (cols*width x rows*height) grid image with column labels
    above and row labels to the left.  hor_texts/ver_texts are lists (one
    per column/row) of lists of GridAnnotation."""
    from sdwebui_tpu.utils.options import opts

    color_active = ImageColor.getcolor(
        opts.get("grid_text_active_color", "#000000"), "RGB")
    color_inactive = ImageColor.getcolor(
        opts.get("grid_text_inactive_color", "#999999"), "RGB")
    color_background = ImageColor.getcolor(
        opts.get("grid_background_color", "#ffffff"), "RGB")

    cols = im.width // width
    rows = im.height // height
    if cols != len(hor_texts):
        raise AssertionError(
            f"column label count {len(hor_texts)} != grid columns {cols}")
    if rows != len(ver_texts):
        raise AssertionError(
            f"row label count {len(ver_texts)} != grid rows {rows}")

    base_fontsize = (width + height) // 25
    spacing = base_fontsize // 2
    font = get_font(base_fontsize)

    # Left gutter only when some row label has text; 3/4 of a cell width.
    have_row_labels = any(ann.text for label in ver_texts for ann in label)
    gutter_left = width * 3 // 4 if have_row_labels else 0

    # Measure pass: wrap every label to its gutter/cell width.
    scratch = ImageDraw.Draw(Image.new("RGB", (1, 1), color_background))
    col_blocks = [_layout_labels(label, scratch, font, width)
                  for label in hor_texts]
    row_blocks = [_layout_labels(label, scratch, font, gutter_left)
                  for label in ver_texts]

    col_heights = [b.height(spacing, per_line_spacing=False)
                   for b in col_blocks]
    gutter_top = (max(col_heights) + spacing * 2) if any(col_heights) else 0

    # Assemble: paste every cell shifted by the gutters (+margin between).
    canvas = Image.new(
        "RGB",
        (im.width + gutter_left + margin * (cols - 1),
         im.height + gutter_top + margin * (rows - 1)),
        color_background)
    for row in range(rows):
        for col in range(cols):
            cell = im.crop((width * col, height * row,
                            width * (col + 1), height * (row + 1)))
            canvas.paste(cell, (gutter_left + (width + margin) * col,
                                gutter_top + (height + margin) * row))

    # Paint pass: column labels centered in the top gutter, row labels
    # vertically centered against their row in the left gutter.
    painter = ImageDraw.Draw(canvas)
    for col, block in enumerate(col_blocks):
        cx = gutter_left + (width + margin) * col + width / 2
        top = gutter_top / 2 - col_heights[col] / 2
        _paint_label_block(painter, cx, top, block, base_fontsize, spacing,
                           color_active, color_inactive)
    for row, block in enumerate(row_blocks):
        cx = gutter_left / 2
        top = (gutter_top + (height + margin) * row + height / 2
               - block.height(spacing, per_line_spacing=True) / 2)
        _paint_label_block(painter, cx, top, block, base_fontsize, spacing,
                           color_active, color_inactive)

    return canvas


def draw_prompt_matrix(im: Image.Image, width: int, height: int,
                       all_prompts, margin: int = 0) -> Image.Image:
    """Prompt-matrix legend: each cell's active prompt parts in the active
    color, inactive ones struck through (reference modules/images.py:239).
    Variable parts split half/half between the column axis (low bits of the
    cell index) and the row axis (high bits)."""
    parts = all_prompts[1:]
    n_cols_bits = math.ceil(len(parts) / 2)
    col_parts, row_parts = parts[:n_cols_bits], parts[n_cols_bits:]

    def axis_labels(axis_parts):
        return [[GridAnnotation(text, is_active=bool(idx >> bit & 1))
                 for bit, text in enumerate(axis_parts)]
                for idx in range(1 << len(axis_parts))]

    return draw_grid_annotations(im, width, height, axis_labels(col_parts),
                                 axis_labels(row_parts), margin)

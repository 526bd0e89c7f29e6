"""Grid legend / prompt-matrix annotation drawing.

Behaviour mirrors the reference's PIL text pipeline
(/root/reference/modules/images.py:144-250): word-wrap to the cell width,
per-line font shrink-to-fit, active/inactive colors with strike-through for
inactive prompt-matrix entries, left pad for row labels and top pad for
column labels.  Colors and font come from the options system
(grid_text_active_color / grid_text_inactive_color / grid_background_color /
font), so the grid_* settings change observable output.
"""

from __future__ import annotations

import functools
import math

from PIL import Image, ImageColor, ImageDraw, ImageFont


class GridAnnotation:
    def __init__(self, text: str = "", is_active: bool = True):
        self.text = text
        self.is_active = is_active
        self.size = None
        self.allowed_width = None


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


def _text_size(drawing, text, font):
    bbox = drawing.multiline_textbbox((0, 0), text, font=font)
    return bbox[2] - bbox[0], bbox[3] - bbox[1]


def draw_grid_annotations(im: Image.Image, width: int, height: int,
                          hor_texts, ver_texts, margin: int = 0) -> Image.Image:
    """Annotate a (cols*width × rows*height) grid image with column labels
    above and row labels to the left.  hor_texts/ver_texts are lists (one
    per column/row) of lists of GridAnnotation."""
    from sdwebui_tpu.utils.options import opts

    color_active = ImageColor.getcolor(
        opts.get("grid_text_active_color", "#000000"), "RGB")
    color_inactive = ImageColor.getcolor(
        opts.get("grid_text_inactive_color", "#999999"), "RGB")
    color_background = ImageColor.getcolor(
        opts.get("grid_background_color", "#ffffff"), "RGB")

    def wrap(drawing, text, font, line_length):
        lines = [""]
        for word in text.split():
            line = f"{lines[-1]} {word}".strip()
            if drawing.textlength(line, font=font) <= line_length:
                lines[-1] = line
            else:
                lines.append(word)
        return lines

    def draw_texts(drawing, draw_x, draw_y, lines, initial_fontsize):
        for line in lines:
            font = get_font(initial_fontsize)
            fontsize = initial_fontsize
            while (_text_size(drawing, line.text, font)[0] > line.allowed_width
                   and fontsize > 0):
                fontsize -= 1
                font = get_font(fontsize)
            drawing.multiline_text(
                (draw_x, draw_y + line.size[1] / 2), line.text, font=font,
                fill=color_active if line.is_active else color_inactive,
                anchor="mm", align="center")
            if not line.is_active:
                drawing.line(
                    (draw_x - line.size[0] // 2, draw_y + line.size[1] // 2,
                     draw_x + line.size[0] // 2, draw_y + line.size[1] // 2),
                    fill=color_inactive, width=4)
            draw_y += line.size[1] + line_spacing

    fontsize = (width + height) // 25
    line_spacing = fontsize // 2
    font = get_font(fontsize)

    pad_left = 0 if sum(
        sum(len(line.text) for line in lines) for lines in ver_texts
    ) == 0 else width * 3 // 4

    cols = im.width // width
    rows = im.height // height

    assert cols == len(hor_texts), \
        f"bad number of horizontal texts: {len(hor_texts)}; must be {cols}"
    assert rows == len(ver_texts), \
        f"bad number of vertical texts: {len(ver_texts)}; must be {rows}"

    calc_img = Image.new("RGB", (1, 1), color_background)
    calc_d = ImageDraw.Draw(calc_img)

    for texts, allowed_width in zip(
            hor_texts + ver_texts,
            [width] * len(hor_texts) + [pad_left] * len(ver_texts)):
        items = [] + texts
        texts.clear()
        for line in items:
            wrapped = wrap(calc_d, line.text, font, allowed_width)
            texts += [GridAnnotation(x, line.is_active) for x in wrapped]
        for line in texts:
            line.size = _text_size(calc_d, line.text, font)
            line.allowed_width = allowed_width

    hor_text_heights = [
        sum(line.size[1] + line_spacing for line in lines) - line_spacing
        for lines in hor_texts]
    ver_text_heights = [
        sum(line.size[1] + line_spacing for line in lines)
        - line_spacing * len(lines) for lines in ver_texts]

    pad_top = 0 if sum(hor_text_heights) == 0 else \
        max(hor_text_heights) + line_spacing * 2

    result = Image.new(
        "RGB",
        (im.width + pad_left + margin * (cols - 1),
         im.height + pad_top + margin * (rows - 1)),
        color_background)

    for row in range(rows):
        for col in range(cols):
            cell = im.crop((width * col, height * row,
                            width * (col + 1), height * (row + 1)))
            result.paste(cell, (pad_left + (width + margin) * col,
                                pad_top + (height + margin) * row))

    d = ImageDraw.Draw(result)

    for col in range(cols):
        x = pad_left + (width + margin) * col + width / 2
        y = pad_top / 2 - hor_text_heights[col] / 2
        draw_texts(d, x, y, hor_texts[col], fontsize)

    for row in range(rows):
        x = pad_left / 2
        y = (pad_top + (height + margin) * row + height / 2
             - ver_text_heights[row] / 2)
        draw_texts(d, x, y, ver_texts[row], fontsize)

    return result


def draw_prompt_matrix(im: Image.Image, width: int, height: int,
                       all_prompts, margin: int = 0) -> Image.Image:
    """Prompt-matrix legend: each cell's active prompt parts in the active
    color, inactive ones struck through (reference modules/images.py:239)."""
    prompts = all_prompts[1:]
    boundary = math.ceil(len(prompts) / 2)

    prompts_horiz = prompts[:boundary]
    prompts_vert = prompts[boundary:]

    hor_texts = [[GridAnnotation(x, is_active=pos & (1 << i) != 0)
                  for i, x in enumerate(prompts_horiz)]
                 for pos in range(1 << len(prompts_horiz))]
    ver_texts = [[GridAnnotation(x, is_active=pos & (1 << i) != 0)
                  for i, x in enumerate(prompts_vert)]
                 for pos in range(1 << len(prompts_vert))]

    return draw_grid_annotations(im, width, height, hor_texts, ver_texts,
                                 margin)

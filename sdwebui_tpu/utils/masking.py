"""Mask utilities for inpainting (reference modules/masking.py, pure PIL —
this image has no cv2; Gaussian blur via PIL's ImageFilter)."""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageFilter


def get_crop_region_v2(mask: np.ndarray, pad: int = 0):
    """Bounding box (x1, y1, x2, y2) of nonzero mask area + padding, clamped.

    mask: (H, W) uint8/bool array."""
    h, w = mask.shape
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return 0, 0, w, h
    x1 = max(int(xs.min()) - pad, 0)
    y1 = max(int(ys.min()) - pad, 0)
    x2 = min(int(xs.max()) + 1 + pad, w)
    y2 = min(int(ys.max()) + 1 + pad, h)
    return x1, y1, x2, y2


def expand_crop_region(crop_region, processing_width, processing_height,
                       image_width, image_height):
    """Expand the crop box to the processing aspect ratio
    (reference modules/masking.py:40)."""
    x1, y1, x2, y2 = crop_region
    ratio_crop_region = (x2 - x1) / (y2 - y1)
    ratio_processing = processing_width / processing_height

    if ratio_crop_region > ratio_processing:
        desired_height = (x2 - x1) / ratio_processing
        desired_height_diff = int(desired_height - (y2 - y1))
        y1 -= desired_height_diff // 2
        y2 += desired_height_diff - desired_height_diff // 2
        if y2 >= image_height:
            diff = y2 - image_height
            y2 -= diff
            y1 -= diff
        if y1 < 0:
            y2 -= y1
            y1 = 0
        if y2 >= image_height:
            y2 = image_height
    else:
        desired_width = (y2 - y1) * ratio_processing
        desired_width_diff = int(desired_width - (x2 - x1))
        x1 -= desired_width_diff // 2
        x2 += desired_width_diff - desired_width_diff // 2
        if x2 >= image_width:
            diff = x2 - image_width
            x2 -= diff
            x1 -= diff
        if x1 < 0:
            x2 -= x1
            x1 = 0
        if x2 >= image_width:
            x2 = image_width

    return x1, y1, x2, y2


def fill(image: Image.Image, mask: Image.Image) -> Image.Image:
    """Fill masked region with surrounding colors (progressive blur
    compositing — reference modules/masking.py fill)."""
    image_mod = Image.new("RGBA", (image.width, image.height))
    image_masked = Image.new("RGBa", (image.width, image.height))
    image_masked.paste(image.convert("RGBA").convert("RGBa"),
                       mask=Image.eval(mask.convert("L"), lambda a: 255 - a))
    image_masked = image_masked.convert("RGBa")

    for radius, repeats in [(256, 1), (64, 1), (16, 2), (4, 4), (2, 2), (0, 1)]:
        blurred = image_masked.filter(ImageFilter.GaussianBlur(radius)).convert("RGBA")
        for _ in range(repeats):
            image_mod.alpha_composite(blurred)

    return image_mod.convert("RGB")


def blur_mask(mask: Image.Image, blur: int) -> Image.Image:
    if blur <= 0:
        return mask
    return mask.filter(ImageFilter.GaussianBlur(blur))


def binarize_mask(mask: Image.Image, threshold: int = 127,
                  invert: bool = False) -> Image.Image:
    m = np.asarray(mask.convert("L"))
    m = np.where(m > threshold, 255, 0).astype(np.uint8)
    if invert:
        m = 255 - m
    return Image.fromarray(m, "L")

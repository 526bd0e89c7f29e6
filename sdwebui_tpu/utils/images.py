"""Image IO: tensor↔PIL, saving with infotext, grids, resize modes.

Pure PIL/numpy (this image has no cv2); behaviour mirrors
modules/images.py: PNG "parameters" text chunk, filename patterns with
dedup, grid assembly, resize modes 0-3.
"""

from __future__ import annotations

import os
import re
from datetime import datetime

import numpy as np
from PIL import Image, PngImagePlugin


def tensor_to_pil(img) -> list:
    """(B,H,W,3) float [0,1] → list of PIL images."""
    arr = np.nan_to_num(np.asarray(img, dtype=np.float32))
    arr = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    return [Image.fromarray(a) for a in arr]


def pil_to_tensor(image: Image.Image) -> np.ndarray:
    """PIL → (H,W,3) float32 in [0,1]."""
    return np.asarray(image.convert("RGB"), dtype=np.float32) / 255.0


_INVALID_FN = re.compile(r'[\\/:*?"<>|\n\r]')


def sanitize_filename_part(text: str, replace_spaces=True) -> str:
    if text is None:
        return ""
    if replace_spaces:
        text = text.replace(" ", "_")
    return _INVALID_FN.sub("", text).strip()[:128]


def save_image(image: Image.Image, path: str, basename: str = "",
               seed=None, prompt=None, info: str | None = None,
               extension: str = "png") -> str:
    """Save with auto-numbered collision-free filename + infotext chunk.

    Returns the full path written.  (Reference modules/images.py:624, the
    filename-pattern subset: [number]-[seed]-[prompt_words].)
    """
    os.makedirs(path, exist_ok=True)
    words = sanitize_filename_part(str(prompt or ""))[:60]
    base = "-".join(str(x) for x in [basename, seed, words] if x not in (None, ""))

    existing = [f for f in os.listdir(path) if re.match(r"^\d+", f)]
    nums = [int(re.match(r"^(\d+)", f).group(1)) for f in existing] or [-1]
    number = max(nums) + 1

    for attempt in range(100):
        name = f"{number + attempt:05}-{base}.{extension}" if base else \
            f"{number + attempt:05}.{extension}"
        full = os.path.join(path, name)
        if not os.path.exists(full):
            break

    if extension.lower() == "png":
        pnginfo = PngImagePlugin.PngInfo()
        if info:
            pnginfo.add_text("parameters", info)
        image.save(full, format="PNG", pnginfo=pnginfo)
    else:
        image.save(full)
        if info:
            try:
                import piexif  # noqa: F401  (not in image; EXIF path gated)
            except ImportError:
                pass
    return full


def read_info_from_image(image: Image.Image) -> str | None:
    """PNG-info 'parameters' chunk (reference modules/images.py:777)."""
    return (image.info or {}).get("parameters")


def image_grid(imgs: list, batch_size: int = 1, rows: int | None = None) -> Image.Image:
    if rows is None:
        rows = int(np.sqrt(len(imgs)))
        rows = max(min(rows, len(imgs)), 1)
        while len(imgs) % rows != 0:
            rows -= 1
    cols = len(imgs) // rows
    w, h = imgs[0].size
    grid = Image.new("RGB", (cols * w, rows * h), color="black")
    for i, img in enumerate(imgs):
        grid.paste(img, ((i % cols) * w, (i // cols) * h))
    return grid


def resize_image(resize_mode: int, im: Image.Image, width: int, height: int) -> Image.Image:
    """Modes (reference modules/images.py:252): 0=stretch, 1=crop-to-fill,
    2=pad-to-fit, 3 treated as 0 here (latent upscale handled upstream)."""
    if resize_mode in (0, 3):
        return im.resize((width, height), Image.LANCZOS)
    ratio = width / height
    src_ratio = im.width / im.height
    if resize_mode == 1:  # crop
        src_w = width if ratio > src_ratio else im.width * height // im.height
        src_h = height if ratio <= src_ratio else im.height * width // im.width
        resized = im.resize((src_w, src_h), Image.LANCZOS)
        res = Image.new("RGB", (width, height))
        res.paste(resized, box=(width // 2 - src_w // 2, height // 2 - src_h // 2))
        return res
    # pad
    src_w = width if ratio < src_ratio else im.width * height // im.height
    src_h = height if ratio >= src_ratio else im.height * width // im.width
    resized = im.resize((src_w, src_h), Image.LANCZOS)
    res = Image.new("RGB", (width, height))
    res.paste(resized, box=(width // 2 - src_w // 2, height // 2 - src_h // 2))
    return res

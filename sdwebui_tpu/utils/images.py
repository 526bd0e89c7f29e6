"""Image IO: tensor↔PIL, saving with infotext, grids, resize modes.

Pure PIL/numpy; behaviour mirrors
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
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.nan_to_num(arr.astype(np.float32))
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


# --------------------------------------------------------------------------
# async writer: PNG encode of a 512² batch costs ~0.3-0.4 s on the host —
# serialized inside the generation loop it was ~15% of end-to-end latency.
# Filenames are reserved synchronously (empty placeholder, so numbering
# stays collision-free); the encode+write happens on one worker thread via
# tmp-file + atomic os.replace. flush_saves() joins the queue.
# --------------------------------------------------------------------------

import threading as _threading

_save_queue = None
_save_thread = None
_save_init_lock = _threading.Lock()


def _writer_loop():
    while True:
        item = _save_queue.get()
        try:
            if item is None:
                return
            image, full, kwargs = item
            tmp = full + ".tmp"
            image.save(tmp, **kwargs)
            os.replace(tmp, full)
        except Exception:   # pragma: no cover - never kill the writer
            import traceback
            traceback.print_exc()
        finally:
            _save_queue.task_done()


def _enqueue_save(image, full, kwargs):
    global _save_queue, _save_thread
    import atexit
    import queue
    import threading

    with _save_init_lock:
        if _save_thread is None or not _save_thread.is_alive():
            _save_queue = queue.Queue()
            _save_thread = threading.Thread(target=_writer_loop, daemon=True)
            _save_thread.start()
            atexit.register(flush_saves)
    _save_queue.put((image, full, kwargs))


def flush_saves() -> None:
    """Block until every queued async save hit disk."""
    if _save_queue is not None:
        _save_queue.join()


def save_image(image: Image.Image, path: str, basename: str = "",
               seed=None, prompt=None, info: str | None = None,
               extension: str = "png") -> str:
    """Save with auto-numbered collision-free filename + infotext chunk.

    Returns the full path (written asynchronously when opts
    sdtpu_async_save is on; flush_saves() guarantees durability).
    (Reference modules/images.py:624, the filename-pattern subset:
    [number]-[seed]-[prompt_words].)
    """
    from sdwebui_tpu.utils.options import opts as _opts

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
        kwargs = dict(format="PNG", pnginfo=pnginfo,
                      compress_level=int(_opts.get(
                          "sdtpu_png_compress_level", 1)))
    else:
        kwargs = {}
        if info:
            try:
                import piexif  # noqa: F401  (not in image; EXIF path gated)
            except ImportError:
                pass
    # reserve the name synchronously so concurrent numbering never collides
    open(full, "wb").close()
    if _opts.get("sdtpu_async_save", True):
        _enqueue_save(image, full, kwargs)
    else:
        tmp = full + ".tmp"
        image.save(tmp, **kwargs)
        os.replace(tmp, full)
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


class Grid:
    def __init__(self, tiles, tile_w, tile_h, image_w, image_h, overlap):
        self.tiles = tiles      # rows: [y, h, [[x, w, tile_image], ...]]
        self.tile_w = tile_w
        self.tile_h = tile_h
        self.image_w = image_w
        self.image_h = image_h
        self.overlap = overlap


def split_grid(image: Image.Image, tile_w=512, tile_h=512, overlap=64) -> Grid:
    """Overlapping tile split (reference modules/images.py:78)."""
    w, h = image.size
    non_overlap_width = tile_w - overlap
    non_overlap_height = tile_h - overlap
    cols = max((w - overlap + non_overlap_width - 1) // non_overlap_width, 1)
    rows = max((h - overlap + non_overlap_height - 1) // non_overlap_height, 1)
    dx = (w - tile_w) / (cols - 1) if cols > 1 else 0
    dy = (h - tile_h) / (rows - 1) if rows > 1 else 0

    grid = Grid([], tile_w, tile_h, w, h, overlap)
    for row in range(rows):
        row_images = []
        y = min(int(row * dy), h - tile_h) if h >= tile_h else 0
        for col in range(cols):
            x = min(int(col * dx), w - tile_w) if w >= tile_w else 0
            tile = image.crop((x, y, x + tile_w, y + tile_h))
            row_images.append([x, tile_w, tile])
        grid.tiles.append([y, tile_h, row_images])
    return grid


def combine_grid(grid: Grid) -> Image.Image:
    """Feathered overlap re-assembly (reference modules/images.py:114)."""
    def make_mask_image(r):
        r = r * 255 / grid.overlap
        return Image.fromarray(np.clip(r, 0, 255).astype(np.uint8), "L")

    mask_w = make_mask_image(
        np.arange(grid.overlap, dtype=np.float32).reshape((1, grid.overlap))
        .repeat(grid.tile_h, axis=0))
    mask_h = make_mask_image(
        np.arange(grid.overlap, dtype=np.float32).reshape((grid.overlap, 1))
        .repeat(grid.image_w, axis=1))

    combined_image = Image.new("RGB", (grid.image_w, grid.image_h))
    for y, h, row in grid.tiles:
        combined_row = Image.new("RGB", (grid.image_w, h))
        for x, w, tile in row:
            if x == 0:
                combined_row.paste(tile, (0, 0))
                continue
            combined_row.paste(tile.crop((0, 0, grid.overlap, h)), (x, 0), mask=mask_w)
            combined_row.paste(tile.crop((grid.overlap, 0, w, h)), (x + grid.overlap, 0))
        if y == 0:
            combined_image.paste(combined_row, (0, 0))
            continue
        combined_image.paste(
            combined_row.crop((0, 0, combined_row.width, grid.overlap)),
            (0, y), mask=mask_h)
        combined_image.paste(
            combined_row.crop((0, grid.overlap, combined_row.width, h)),
            (0, y + grid.overlap))
    return combined_image


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

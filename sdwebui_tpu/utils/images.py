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


_INVALID_FN_CHARS = '#<>:"/\\|?*\n\r\t'


def sanitize_filename_part(text: str, replace_spaces=True) -> str:
    """Reference modules/images.py:343 semantics: invalid chars become '_',
    leading spaces and trailing ' .' are stripped, 128-char cap."""
    if text is None:
        return None
    if replace_spaces:
        text = text.replace(" ", "_")
    text = text.translate({ord(x): "_" for x in _INVALID_FN_CHARS})
    text = text.lstrip(" ")[:128]
    return text.rstrip(" .")


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
            item()
        except Exception:   # pragma: no cover - never kill the writer
            import traceback
            traceback.print_exc()
        finally:
            _save_queue.task_done()


def _enqueue_save(fn):
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
    _save_queue.put(fn)


def flush_saves() -> None:
    """Block until every queued async save hit disk."""
    if _save_queue is not None:
        _save_queue.join()


def save_image_with_geninfo(image: Image.Image, geninfo: str | None,
                            filename: str, extension: str | None = None,
                            existing_pnginfo: dict | None = None,
                            pnginfo_section_name: str = "parameters"):
    """Format-aware write with infotext embedding (reference
    modules/images.py:565): PNG text chunk, JPEG/WebP/AVIF EXIF
    UserComment (utils/exif.py replaces piexif), GIF comment."""
    from sdwebui_tpu.utils.options import opts as _opts

    ext = (extension or os.path.splitext(filename)[1]).lower()
    if not ext.startswith("."):
        ext = "." + ext
    image_format = Image.registered_extensions().get(ext, "PNG")

    if ext == ".png":
        pnginfo_data = None
        if _opts.get("enable_pnginfo", True):
            pnginfo_data = PngImagePlugin.PngInfo()
            for k, v in (existing_pnginfo or {}).items():
                pnginfo_data.add_text(k, str(v))
            if geninfo is not None:
                pnginfo_data.add_text(pnginfo_section_name, str(geninfo))
        image.save(filename, format=image_format, pnginfo=pnginfo_data,
                   compress_level=int(_opts.get("sdtpu_png_compress_level", 1)))
        return

    if ext in (".jpg", ".jpeg", ".webp", ".avif"):
        if image.mode == "RGBA":
            image = image.convert("RGB")
        elif image.mode == "I;16":
            image = image.point(lambda p: p * 0.0038910505836576).convert(
                "RGB" if ext != ".jpg" else "L")
        kwargs = dict(format=image_format,
                      quality=int(_opts.get("jpeg_quality", 80)))
        if ext == ".webp":
            kwargs["lossless"] = bool(_opts.get("webp_lossless", False))
        if _opts.get("enable_pnginfo", True) and geninfo is not None:
            from sdwebui_tpu.utils.exif import build_exif_bytes

            kwargs["exif"] = build_exif_bytes(geninfo)
        image.save(filename, **kwargs)
        return

    if ext == ".gif":
        image.save(filename, format=image_format, comment=geninfo)
        return

    image.save(filename, format=image_format,
               quality=int(_opts.get("jpeg_quality", 80)))


def save_image(image: Image.Image, path: str, basename: str = "",
               seed=None, prompt=None, info: str | None = None,
               extension: str = "png", short_filename: bool = False,
               no_prompt: bool = False, grid: bool = False,
               pnginfo_section_name: str = "parameters", p=None,
               existing_info: dict | None = None,
               forced_filename: str | None = None, suffix: str = "",
               save_to_dirs: bool | None = None) -> str:
    """Reference-faithful image save (modules/images.py:624): filename
    patterns via FilenameGenerator (samples_filename_pattern /
    directories_filename_pattern / save_to_dirs / save_images_add_number /
    save_images_replace_action), format-aware infotext embedding,
    export_for_4chan downscaled JPG copy, optional .txt sidecar, and the
    before/after image-saved script callbacks.

    Returns the full path.  The encode+write happens on a background
    thread when opts.sdtpu_async_save is on (names are reserved
    synchronously so numbering never collides; flush_saves() joins).
    """
    from sdwebui_tpu.utils.filename import (FilenameGenerator,
                                            get_next_sequence_number)
    from sdwebui_tpu.utils.options import opts as _opts

    namegen = FilenameGenerator(p, seed, prompt, image, basename=basename)

    if ((image.height > 65535 or image.width > 65535)
            and extension.lower() in ("jpg", "jpeg")) or \
            ((image.height > 16383 or image.width > 16383)
             and extension.lower() == "webp"):
        extension = "png"

    if save_to_dirs is None:
        save_to_dirs = (grid and _opts.get("grid_save_to_dirs", False)) or \
            (not grid and _opts.get("save_to_dirs", False) and not no_prompt)

    if save_to_dirs:
        dirname = namegen.apply(
            _opts.get("directories_filename_pattern") or "[prompt_words]"
        ).lstrip(" ").rstrip("\\ /")
        path = os.path.join(path, dirname)

    os.makedirs(path, exist_ok=True)

    if forced_filename is None:
        if short_filename or seed is None:
            file_decoration = ""
        elif _opts.get("save_to_dirs", False):
            file_decoration = _opts.get("samples_filename_pattern") or "[seed]"
        else:
            file_decoration = _opts.get("samples_filename_pattern") or \
                "[seed]-[prompt_spaces]"

        file_decoration = namegen.apply(file_decoration) + suffix

        add_number = _opts.get("save_images_add_number", True) or \
            file_decoration == ""

        if file_decoration != "" and add_number:
            file_decoration = f"-{file_decoration}"

        if add_number:
            basecount = get_next_sequence_number(path, basename)
            fullfn = None
            for i in range(500):
                fn = f"{basecount + i:05}" if basename == "" else \
                    f"{basename}-{basecount + i:04}"
                fullfn = os.path.join(path, f"{fn}{file_decoration}.{extension}")
                if not os.path.exists(fullfn):
                    break
        else:
            fullfn = os.path.join(path, f"{file_decoration}.{extension}")
            if os.path.exists(fullfn) and \
                    _opts.get("save_images_replace_action", "Replace") != "Replace":
                base_no_ext = os.path.splitext(fullfn)[0]
                n = 0
                while os.path.exists(fullfn):
                    n += 1
                    fullfn = f"{base_no_ext}-{n}.{extension}"
    else:
        fullfn = os.path.join(path, f"{forced_filename}.{extension}")

    pnginfo = dict(existing_info or {})
    if info is not None:
        pnginfo[pnginfo_section_name] = info

    # before_image_saved may swap the image or rename the file
    from sdwebui_tpu.scripts import framework as _fw

    params = _fw.ImageSaveParams(image, p, fullfn, pnginfo)
    _fw.invoke("before_image_saved", params)
    image = params.image
    fullfn = params.filename
    info = params.pnginfo.get(pnginfo_section_name, None)

    fullfn_no_ext, ext = os.path.splitext(fullfn)
    if hasattr(os, "statvfs"):
        max_name_len = os.statvfs(path).f_namemax
        fullfn_no_ext = fullfn_no_ext[:max_name_len - max(4, len(ext))]
        fullfn = fullfn_no_ext + ext

    # reserve the name synchronously so concurrent numbering never collides
    open(fullfn, "wb").close()

    oversize_side = int(_opts.get("target_side_length", 4000))
    downscale_mb = float(_opts.get("img_downscale_threshold", 4.0))
    export_4chan = bool(_opts.get("export_for_4chan", False))
    save_txt = bool(_opts.get("save_txt", False))

    def _write():
        tmp = fullfn_no_ext + ".tmp"
        save_image_with_geninfo(image, info, tmp, ext,
                                existing_pnginfo=params.pnginfo,
                                pnginfo_section_name=pnginfo_section_name)
        os.replace(tmp, fullfn)

        oversize = image.width > oversize_side or image.height > oversize_side
        if export_4chan and (oversize or os.stat(fullfn).st_size >
                             downscale_mb * 1024 * 1024):
            ratio = image.width / image.height
            resize_to = None
            if oversize and ratio > 1:
                resize_to = (round(oversize_side),
                             round(image.height * oversize_side / image.width))
            elif oversize:
                resize_to = (round(image.width * oversize_side / image.height),
                             round(oversize_side))
            small = image if resize_to is None else \
                image.resize(resize_to, Image.LANCZOS)
            try:
                save_image_with_geninfo(small, info, fullfn_no_ext + ".jpg")
            except Exception:
                pass

        if save_txt and info is not None:
            with open(fullfn_no_ext + ".txt", "w", encoding="utf8") as f:
                f.write(f"{info}\n")

        _fw.invoke("image_saved", params)

    if _opts.get("sdtpu_async_save", True):
        # PIL's Image.save stores its kwargs ON the image object
        # (im.encoderinfo) before encoding, so a concurrent save of the
        # SAME object from another thread — e.g. the API's base64 encoder
        # right after queueing this write — clobbers the writer's pnginfo
        # and the infotext chunk silently vanishes (caught by
        # test_img2img_batch_png_info's order-dependent failure).  Snapshot
        # the image so the async writer owns its copy.
        image = image.copy()
        _enqueue_save(_write)
    else:
        _write()
    return fullfn


def read_info_from_image(image: Image.Image) -> str | None:
    """Infotext from PNG 'parameters' chunk, or JPEG/WebP EXIF UserComment
    (reference modules/images.py:777)."""
    geninfo = (image.info or {}).get("parameters")
    if geninfo is None:
        from sdwebui_tpu.utils.exif import read_user_comment

        geninfo = read_user_comment(image)
    return geninfo


def flatten(img: Image.Image, bgcolor: str) -> Image.Image:
    """Replace alpha with bgcolor before converting to RGB (reference
    modules/images.py:841; used with opts.img2img_background_color)."""
    if img.mode == "RGBA":
        background = Image.new("RGBA", img.size, bgcolor)
        background.paste(img, mask=img)
        img = background
    return img.convert("RGB")


class ImageGridLoopParams:
    """Payload for the image_grid callback channel (reference
    modules/script_callbacks.py ImageGridLoopParams)."""

    def __init__(self, imgs, cols, rows):
        self.imgs = imgs
        self.cols = cols
        self.rows = rows


def image_grid(imgs: list, batch_size: int = 1, rows: int | None = None) -> Image.Image:
    """Assemble images into one grid (reference modules/images.py:36):
    rows from opts.n_rows (>0 fixed, 0 = batch_size, -1 = near-square,
    with grid_prevent_empty_spots exact-division fallback), cells sized to
    the largest image with centering, opts.grid_background_color fill, and
    the image_grid script callback."""
    import math

    from sdwebui_tpu.utils.options import opts as _opts

    if rows is None:
        n_rows = int(_opts.get("n_rows", -1))
        if n_rows > 0:
            rows = n_rows
        elif n_rows == 0:
            rows = batch_size
        elif _opts.get("grid_prevent_empty_spots", False):
            rows = max(math.floor(math.sqrt(len(imgs))), 1)
            while len(imgs) % rows != 0:
                rows -= 1
        else:
            rows = max(round(math.sqrt(len(imgs))), 1)
    rows = min(rows, len(imgs))
    cols = math.ceil(len(imgs) / rows)

    from sdwebui_tpu.scripts import framework as _fw

    params = ImageGridLoopParams(imgs, cols, rows)
    _fw.invoke("image_grid", params)

    w = max(img.size[0] for img in imgs)
    h = max(img.size[1] for img in imgs)
    try:
        from PIL import ImageColor
        bg = ImageColor.getcolor(
            _opts.get("grid_background_color", "#ffffff") or "#ffffff", "RGB")
    except ValueError:
        bg = (255, 255, 255)
    grid = Image.new("RGB", (params.cols * w, params.rows * h), color=bg)
    for i, img in enumerate(params.imgs):
        iw, ih = img.size
        grid.paste(img, ((i % params.cols) * w + (w - iw) // 2,
                         (i // params.cols) * h + (h - ih) // 2))
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


def resize_image(resize_mode: int, im: Image.Image, width: int, height: int,
                 upscaler_name: str | None = None) -> Image.Image:
    """Modes (reference modules/images.py:252): 0=stretch, 1=crop-to-fill,
    2=pad-to-fit, 3 treated as 0 here (latent upscale handled upstream).
    upscaler_name (reference opts.upscaler_for_img2img): run a real SR
    model for the upscaling leg instead of LANCZOS."""

    def _resize(img, w, h):
        if upscaler_name and upscaler_name != "None" and img.mode != "L" \
                and (w > img.width or h > img.height):
            from sdwebui_tpu.postprocessing.upscalers import upscale

            try:
                img = upscale(upscaler_name, img,
                              max(w / img.width, h / img.height))
            except ValueError:
                pass
        if (img.width, img.height) != (w, h):
            img = img.resize((w, h), Image.LANCZOS)
        return img

    if resize_mode in (0, 3):
        return _resize(im, width, height)
    ratio = width / height
    src_ratio = im.width / im.height
    if resize_mode == 1:  # crop
        src_w = width if ratio > src_ratio else im.width * height // im.height
        src_h = height if ratio <= src_ratio else im.height * width // im.width
        resized = _resize(im, src_w, src_h)
        res = Image.new("RGB", (width, height))
        res.paste(resized, box=(width // 2 - src_w // 2, height // 2 - src_h // 2))
        return res
    # pad
    src_w = width if ratio < src_ratio else im.width * height // im.height
    src_h = height if ratio >= src_ratio else im.height * width // im.width
    resized = _resize(im, src_w, src_h)
    res = Image.new("RGB", (width, height))
    res.paste(resized, box=(width // 2 - src_w // 2, height // 2 - src_h // 2))
    return res

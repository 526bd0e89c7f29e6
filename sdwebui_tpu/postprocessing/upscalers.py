"""Upscaler registry (reference modules/upscaler.py + modules/modelloader.py).

Built-ins: None/Lanczos/Nearest (PIL).  Model-backed upscalers (ESRGAN/
R-ESRGAN/SwinIR ports running tiled on TPU) register through
`register_upscaler`; `upscale_by_name` is the lookup the hires-fix and
extras tab use.  The reference's 3-iteration upscale-until-target loop
(modules/upscaler.py:54-76) is preserved.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

from PIL import Image


@dataclasses.dataclass
class UpscalerEntry:
    name: str
    scale_fn: Callable          # (image, target_scale) -> image
    default_scale: int = 4


_REGISTRY: dict[str, UpscalerEntry] = {}


def register_upscaler(name: str, scale_fn: Callable, default_scale: int = 4):
    _REGISTRY[name] = UpscalerEntry(name, scale_fn, default_scale)


def tiled_sr_upscale(run_batch: Callable, scale: int, pad_multiple: int,
                     image: Image.Image, tile: int | None = None,
                     overlap: int | None = None) -> Image.Image:
    """Shared tiled ×scale super-resolution: split into overlapping tiles,
    run ALL tiles as one batched device call (`run_batch`: (N,H,W,3)[0,1] →
    (N,sH,sW,3)), feather-combine (the reference runs tiles sequentially,
    modules/upscaler_utils.py:51-88).  Inputs pad with reflect to
    `pad_multiple` (window size) before the model.  tile/overlap default to
    opts.ESRGAN_tile / ESRGAN_tile_overlap (reference shared options;
    tile 0 = no tiling)."""
    import numpy as np

    from sdwebui_tpu.utils.options import opts as _opts

    if tile is None:
        tile = int(_opts.get("ESRGAN_tile", 192) or 0)
    if overlap is None:
        overlap = int(_opts.get("ESRGAN_tile_overlap", 8))
    if tile <= 0:
        tile = max(image.width, image.height)

    from sdwebui_tpu.utils.images import Grid, combine_grid, split_grid

    img = image.convert("RGB")

    def run(arr):
        h, w = arr.shape[1:3]
        ph = (-h) % pad_multiple
        pw = (-w) % pad_multiple
        if ph or pw:
            arr = np.pad(arr, ((0, 0), (0, ph), (0, pw), (0, 0)), "reflect")
        out = np.asarray(run_batch(arr))
        return out[:, : h * scale, : w * scale]

    if img.width <= tile and img.height <= tile:
        arr = np.asarray(img, np.float32)[None] / 255.0
        out = np.clip(run(arr)[0], 0, 1)
        return Image.fromarray((out * 255 + 0.5).astype(np.uint8))

    grid = split_grid(img, tile, tile, overlap)
    tiles = [t for _, _, row in grid.tiles for _, _, t in row]
    arr = np.stack([np.asarray(t, np.float32) / 255.0 for t in tiles])
    outs = (np.clip(run(arr), 0, 1) * 255 + 0.5).astype(np.uint8)

    s = scale
    new_tiles = []
    i = 0
    for y, h, row in grid.tiles:
        new_row = []
        for x, w, _ in row:
            new_row.append([x * s, w * s, Image.fromarray(outs[i])])
            i += 1
        new_tiles.append([y * s, h * s, new_row])
    out_grid = Grid(new_tiles, grid.tile_w * s, grid.tile_h * s,
                    grid.image_w * s, grid.image_h * s, grid.overlap * s)
    return combine_grid(out_grid)


def _pil_upscaler(resample):
    def fn(image: Image.Image, scale: float) -> Image.Image:
        return image.resize((round(image.width * scale), round(image.height * scale)),
                            resample=resample)
    return fn


register_upscaler("None", lambda im, s: im, 1)
register_upscaler("Lanczos", _pil_upscaler(Image.LANCZOS))
register_upscaler("Nearest", _pil_upscaler(Image.NEAREST))


def upscaler_names():
    """Registered names, minus Real-ESRGAN/DAT variants the user deselected
    (reference opts.realesrgan_enabled_models / dat_enabled_models — those
    filter which models the UI/API list; explicit use by name still works)."""
    from sdwebui_tpu.utils.options import opts as _opts

    re_on = _opts.get("realesrgan_enabled_models", None)
    dat_on = _opts.get("dat_enabled_models", None)

    def visible(name):
        if re_on is not None and name.startswith("R-ESRGAN"):
            return name in re_on
        if dat_on is not None and name.startswith("DAT"):
            return name in dat_on
        return True

    return [n for n in _REGISTRY if visible(n)]


_UPSCALE_CACHE: "dict[tuple, Image.Image]" = {}


def upscale(name: str, image: Image.Image, scale: float) -> Image.Image:
    """Upscale by factor with up to 3 passes (reference Upscaler.upscale);
    results LRU-cached per (upscaler, image bytes, scale) up to
    opts.upscaling_max_images_in_cache (reference upscaler_utils/upscale_2
    shared.opts cache)."""
    entry = _REGISTRY.get(name)
    if entry is None:
        raise ValueError(f"unknown upscaler {name!r} (available: "
                         f"{', '.join(_REGISTRY)})")
    from sdwebui_tpu.utils.options import opts as _opts

    cache_n = int(_opts.get("upscaling_max_images_in_cache", 5) or 0)
    key = None
    if cache_n > 0 and name not in ("None", "Lanczos", "Nearest"):
        import hashlib

        key = (name, float(scale), image.size,
               hashlib.sha1(image.tobytes()).hexdigest())
        hit = _UPSCALE_CACHE.get(key)
        if hit is not None:
            return hit.copy()
    out = _upscale_uncached(entry, image, scale)
    if key is not None:
        _UPSCALE_CACHE[key] = out.copy()
        while len(_UPSCALE_CACHE) > cache_n:
            _UPSCALE_CACHE.pop(next(iter(_UPSCALE_CACHE)))
    return out


def _upscale_uncached(entry, image: Image.Image, scale: float) -> Image.Image:
    dest_w = round(image.width * scale)
    dest_h = round(image.height * scale)
    for _ in range(3):
        if image.width >= dest_w and image.height >= dest_h:
            break
        shape = (image.width, image.height)
        image = entry.scale_fn(image, scale if entry.default_scale == 1
                               else entry.default_scale)
        if (image.width, image.height) == shape:
            break
    if (image.width, image.height) != (dest_w, dest_h):
        image = image.resize((dest_w, dest_h), resample=Image.LANCZOS)
    return image


def upscale_by_name(name: str, image: Image.Image, width: int, height: int) -> Image.Image:
    scale = max(width / image.width, height / image.height)
    out = upscale(name, image, scale)
    if (out.width, out.height) != (width, height):
        out = out.resize((width, height), resample=Image.LANCZOS)
    return out

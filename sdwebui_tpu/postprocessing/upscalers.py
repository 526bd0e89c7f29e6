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


def _pil_upscaler(resample):
    def fn(image: Image.Image, scale: float) -> Image.Image:
        return image.resize((round(image.width * scale), round(image.height * scale)),
                            resample=resample)
    return fn


register_upscaler("None", lambda im, s: im, 1)
register_upscaler("Lanczos", _pil_upscaler(Image.LANCZOS))
register_upscaler("Nearest", _pil_upscaler(Image.NEAREST))


def upscaler_names():
    return list(_REGISTRY.keys())


def upscale(name: str, image: Image.Image, scale: float) -> Image.Image:
    """Upscale by factor with up to 3 passes (reference Upscaler.upscale)."""
    entry = _REGISTRY.get(name)
    if entry is None:
        raise ValueError(f"unknown upscaler {name!r} (available: "
                         f"{', '.join(_REGISTRY)})")
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

"""ControlNet units: request-level spec → device-ready control tuples.

The reference consumes ControlNet via the sd-webui-controlnet extension's
`alwayson_scripts.controlnet.args` units (model, image, weight, guidance
start/end).  Here units are a first-class GenerationParams field; this
module resolves model names from models/ControlNet, caches loaded towers,
prepares the hint image, and bakes the guidance range into a per-step
scale array the fused sampler gates on (pipeline/processing._apply_control).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_MODEL_EXTS = (".safetensors", ".pt", ".ckpt", ".pth", ".bin")


_CONTROL_MODES = {
    "balanced": 0,
    "my prompt is more important": 1,
    "controlnet is more important": 2,
}


@dataclasses.dataclass
class ControlNetUnit:
    """One control tower application (extension UI's unit row)."""

    model: str = ""                 # name (models/ControlNet) or path
    image: Any = None               # PIL / np (H,W,C) / base64 str
    weight: float = 1.0
    guidance_start: float = 0.0     # fraction of steps
    guidance_end: float = 1.0
    enabled: bool = True
    # 0 Balanced / 1 "My prompt is more important" (soft per-layer decay)
    # / 2 "ControlNet is more important" (cond-only → CFG-amplified)
    control_mode: Any = 0
    module: str = "none"            # annotator (pipeline/annotators.py)
    processor_res: int = 512
    threshold_a: Any = None         # per-module meaning (canny low, ...)
    threshold_b: Any = None

    @classmethod
    def from_dict(cls, d: dict) -> "ControlNetUnit":
        known = {f.name for f in dataclasses.fields(cls)}
        args = {k: v for k, v in d.items() if k in known}
        if "input_image" in d and args.get("image") is None:
            args["image"] = d["input_image"]   # extension API alias
        return cls(**args)

    @property
    def mode_int(self) -> int:
        m = self.control_mode
        if isinstance(m, str):
            return _CONTROL_MODES.get(m.strip().lower(), 0)
        return int(m)


# --------------------------------------------------------------------------
# model registry + cache
# --------------------------------------------------------------------------

_dirs = ["models/ControlNet"]
_cache: dict[str, tuple] = {}


def set_model_dirs(dirs):
    _dirs[:] = list(dirs)
    _cache.clear()


def list_models() -> list[str]:
    names = []
    for d in _dirs:
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            if fn.endswith(_MODEL_EXTS):
                names.append(os.path.splitext(fn)[0])
    return names


def _resolve_path(name: str) -> str:
    if os.path.isfile(name):
        return name
    for d in _dirs:
        for ext in _MODEL_EXTS:
            cand = os.path.join(d, name if name.endswith(ext) else name + ext)
            if os.path.isfile(cand):
                return cand
    raise FileNotFoundError(f"ControlNet model not found: {name!r} "
                            f"(searched {_dirs})")


def load_controlnet(name_or_path: str, dtype=jnp.bfloat16):
    """→ (device params, UNetConfig, hint_channels); LRU-of-1 per name."""
    if name_or_path in _cache:
        return _cache[name_or_path]
    from sdwebui_tpu.loader.convert import cast_tree, convert_controlnet
    from sdwebui_tpu.loader.load import read_checkpoint

    sd = read_checkpoint(_resolve_path(name_or_path))
    tree, cfg, hint_ch = convert_controlnet(sd)
    params = jax.device_put(cast_tree(tree, dtype))
    _cache.clear()      # hold at most one tower resident (HBM budget)
    _cache[name_or_path] = (params, cfg, hint_ch)
    return _cache[name_or_path]


# --------------------------------------------------------------------------
# hint preparation
# --------------------------------------------------------------------------

def _to_image_array(image, width: int, height: int, channels: int) -> np.ndarray:
    """→ (1, height, width, channels) float32 in [0,1]."""
    from PIL import Image

    if isinstance(image, str):
        from sdwebui_tpu.server.app import decode_base64_to_image

        image = decode_base64_to_image(image)
    if isinstance(image, Image.Image):
        image = image.convert("RGB" if channels >= 3 else "L")
        if image.size != (width, height):
            image = image.resize((width, height), Image.LANCZOS)
        arr = np.asarray(image, np.float32) / 255.0
    else:
        arr = np.asarray(image)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        arr = arr.astype(np.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
        if arr.shape[0] != height or arr.shape[1] != width:
            arr = np.asarray(jax.image.resize(
                jnp.asarray(arr), (height, width, arr.shape[-1]), "bilinear"))
    if arr.ndim == 3:
        arr = arr[None]
    if arr.shape[-1] < channels:       # grayscale hint into RGB slots
        arr = np.repeat(arr, channels, axis=-1)[..., :channels]
    elif arr.shape[-1] > channels:
        arr = arr[..., :channels]
    return np.ascontiguousarray(arr, np.float32)


def _step_scales(unit: ControlNetUnit, n_steps: int) -> np.ndarray:
    frac = np.arange(n_steps, dtype=np.float32) / max(n_steps - 1, 1)
    active = (frac >= unit.guidance_start - 1e-6) & \
             (frac <= unit.guidance_end + 1e-6)
    return np.where(active, np.float32(unit.weight), np.float32(0.0))


def prepare_controls(units, width: int, height: int, n_steps: int,
                     latent_channels: int = 4, dtype=jnp.bfloat16,
                     default_image=None):
    """units (ControlNetUnit | dict list) → (control, control_cfgs) for
    sample_latents.  Empty/disabled units → ((), ()).  default_image fills
    units without their own image (img2img uses the init image, matching
    the extension)."""
    control = []
    cfgs = []
    for u in units or []:
        if isinstance(u, dict):
            u = ControlNetUnit.from_dict(u)
        if u.image is None and default_image is not None:
            u = dataclasses.replace(u, image=default_image)
        if not u.enabled or u.image is None or not u.model:
            continue
        params, cfg, hint_ch = load_controlnet(u.model, dtype=dtype)
        if cfg.in_channels != latent_channels:
            raise ValueError(
                f"ControlNet {u.model!r} expects {cfg.in_channels} latent "
                f"channels; current model produces {latent_channels}")
        image = u.image
        if u.module and u.module != "none":
            from sdwebui_tpu.pipeline.annotators import run_annotator

            arr = _to_image_array(image, width, height, 3)[0]
            image = run_annotator(u.module, arr, res=0,
                                  threshold_a=u.threshold_a,
                                  threshold_b=u.threshold_b)
        hint = jnp.asarray(_to_image_array(image, width, height, hint_ch))
        scales = jnp.asarray(_step_scales(u, n_steps))
        control.append((params, hint, scales,
                        jnp.asarray(u.mode_int, jnp.int32)))
        cfgs.append(cfg)
    return tuple(control), tuple(cfgs)

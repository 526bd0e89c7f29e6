"""Script + callback system (reference modules/scripts.py:52-348 +
modules/script_callbacks.py).

A `Script` exposes the reference's lifecycle hooks over our explicit
pipeline: selectable scripts replace the whole generation (`run`);
always-on scripts hook `process` / `process_batch` / `postprocess_image` /
`postprocess`.  The callback registry carries the 21 named event channels
extensions attach to."""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Callable


class Script:
    name = "base"
    section = None
    alwayson = False

    def title(self) -> str:
        return self.name

    # selectable scripts: take over the generation entirely
    def run(self, engine, p, *args):
        raise NotImplementedError

    # always-on hooks (subset of the reference's ~25; same names)
    def process(self, p, *args):
        pass

    def process_batch(self, p, *args, batch_number=0, seeds=None):
        pass

    def postprocess_image(self, p, image, *args):
        return image

    def postprocess(self, p, processed, *args):
        pass


_SCRIPT_REGISTRY: dict[str, type] = {}


def register_script(cls):
    _SCRIPT_REGISTRY[cls.name.lower()] = cls
    return cls


def list_selectable_scripts():
    return sorted(_SCRIPT_REGISTRY.keys())


def get_script(name: str) -> Script | None:
    cls = _SCRIPT_REGISTRY.get((name or "").lower())
    return cls() if cls else None


class ScriptRunner:
    """Dispatches hooks over the registered always-on scripts + one optional
    selected script (reference ScriptRunner, modules/scripts.py:542)."""

    def __init__(self):
        self.alwayson_scripts: list[Script] = []

    def add(self, script: Script):
        self.alwayson_scripts.append(script)

    def process(self, p):
        for s in self.alwayson_scripts:
            s.process(p)

    def process_batch(self, p, batch_number=0, seeds=None):
        for s in self.alwayson_scripts:
            s.process_batch(p, batch_number=batch_number, seeds=seeds)

    def postprocess_image(self, p, image):
        for s in self.alwayson_scripts:
            image = s.postprocess_image(p, image) or image
        return image

    def postprocess(self, p, processed):
        for s in self.alwayson_scripts:
            s.postprocess(p, processed)


# ==========================================================================
# callback registry (reference modules/script_callbacks.py:219,456-609)
# ==========================================================================

CALLBACK_CHANNELS = [
    "app_started", "model_loaded", "ui_tabs", "ui_settings", "before_ui",
    "image_saved", "before_image_saved", "cfg_denoiser", "cfg_denoised",
    "cfg_after_cfg", "extra_noise", "infotext_pasted", "script_unloaded",
    "list_optimizers", "list_unets", "before_token_counter",
    "on_reload", "image_grid", "mask_blend", "before_process",
    "after_extra_networks_activate",
]

_callbacks: dict[str, list] = defaultdict(list)


def on(channel: str, fn: Callable):
    if channel not in CALLBACK_CHANNELS:
        raise ValueError(f"unknown callback channel {channel!r}")
    _callbacks[channel].append(fn)


def remove_current_script_callbacks():
    _callbacks.clear()


def invoke(channel: str, *args, **kwargs):
    results = []
    for fn in _callbacks[channel]:
        try:
            results.append(fn(*args, **kwargs))
        except Exception:
            import traceback

            traceback.print_exc()
    return results

"""Custom-UNet slot (reference modules/sd_unet.py:63-93, installed via
modules/sd_hijack.py:41-45 as a forward() splice into ldm's UNetModel).

TPU-functional redesign: a provider does not monkey-patch a live module's
forward — it TRANSFORMS the model (param tree and/or config) before the
generation jits.  Extensions register providers on the ``list_unets``
callback channel (same channel name as the reference); ``opts.sd_unet``
selects one by label ('Automatic'/'None' = use the checkpoint's own UNet).
"""

from __future__ import annotations

from typing import Callable, List


class SdUnetOption:
    """One selectable UNet provider.

    label: shown in the sd_unet option choices.
    apply_to(model) -> model: return the model to generate with (typically
    ``dataclasses.replace(model, unet_params=..., unet_cfg=...)``); must not
    mutate the input.
    """

    label: str = ""

    def __init__(self, label: str | None = None,
                 apply_fn: Callable | None = None):
        if label is not None:
            self.label = label
        self._apply_fn = apply_fn

    def apply_to(self, model):
        if self._apply_fn is None:
            raise NotImplementedError
        return self._apply_fn(model)


_options: List[SdUnetOption] = []


def refresh_unet_list() -> List[SdUnetOption]:
    """Re-collect providers from the list_unets callbacks (reference
    sd_unet.list_unets: callbacks fill a list)."""
    from sdwebui_tpu.scripts import framework

    _options.clear()
    for res in framework.invoke("list_unets", _options):
        # callbacks may append to the passed list (reference convention) or
        # return option(s)
        if isinstance(res, SdUnetOption):
            _options.append(res)
        elif isinstance(res, (list, tuple)):
            _options.extend(r for r in res if isinstance(r, SdUnetOption))
    return list(_options)


def unet_labels() -> List[str]:
    return ["Automatic", "None"] + [o.label for o in _options]


def resolve(model):
    """Apply the selected provider to the model (identity for
    Automatic/None/unknown — unknown warns like the reference's dropdown
    simply not matching)."""
    from sdwebui_tpu.utils.options import opts

    name = str(opts.get("sd_unet", "Automatic"))
    if name in ("Automatic", "None", ""):
        return model
    refresh_unet_list()   # cheap: a handful of callbacks, per generation
    for o in _options:
        if o.label == name:
            return o.apply_to(model)
    import sys

    print(f"[sd_unet] no provider named {name!r}; using checkpoint UNet",
          file=sys.stderr)
    return model

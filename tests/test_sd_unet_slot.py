"""Custom-UNet slot (reference modules/sd_unet.py:63-93): providers
registered on the list_unets callback channel, selected via opts.sd_unet,
applied as a functional model transform before generation."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from sdwebui_tpu.pipeline import sd_unet
from sdwebui_tpu.pipeline.params import GenerationParams
from sdwebui_tpu.pipeline.processing import process_txt2img
from sdwebui_tpu.pipeline.sd_model import create_tiny_sd
from sdwebui_tpu.scripts import framework
from sdwebui_tpu.utils.options import opts
from sdwebui_tpu.utils.pytree import flatten, unflatten


def _negated_provider():
    def apply_to(model):
        flat = {k: -v for k, v in flatten(model.unet_params).items()}
        return dataclasses.replace(model, unet_params=unflatten(flat))

    return sd_unet.SdUnetOption("negated", apply_to)


def test_sd_unet_provider_selected_and_applied():
    model = create_tiny_sd()
    opt = _negated_provider()
    framework.on("list_unets", lambda lst: lst.append(opt))
    try:
        assert "negated" in [o.label for o in sd_unet.refresh_unet_list()]
        assert sd_unet.unet_labels()[:2] == ["Automatic", "None"]

        p = lambda: GenerationParams(prompt="a cat", seed=3, steps=1,
                                     width=64, height=64)
        base = process_txt2img(model, p())
        with opts.override({"sd_unet": "negated"}):
            swapped = process_txt2img(model, p())
        a = np.asarray(base.images[0], int)
        b = np.asarray(swapped.images[0], int)
        assert np.abs(a - b).max() > 0   # the provider's tree was used
        # the source model must be untouched
        again = process_txt2img(model, p())
        np.testing.assert_array_equal(a, np.asarray(again.images[0], int))
    finally:
        framework._callbacks["list_unets"].clear()


def test_sd_unet_unknown_name_falls_back(capsys):
    model = create_tiny_sd()
    p = GenerationParams(prompt="a cat", seed=3, steps=1, width=64, height=64)
    with opts.override({"sd_unet": "no-such-provider"}):
        res = process_txt2img(model, p)
    assert len(res.images) == 1

"""ControlNet — conditioning tower producing per-block UNet residuals.

The reference webui consumes ControlNet through the sd-webui-controlnet
extension; the reference core only provides the splice point (custom UNet
slot, modules/sd_unet.py:63-93).  Our UNet was designed with first-class
injection points instead (models/unet.py `apply(control=...)`, SURVEY.md
§7.8), so ControlNet here is just another pure function: a copy of the
UNet encoder + zero-convs over a hint image, returning the residual pytree
that `unet.apply` adds at each input block and at the middle block.

Param tree mirrors the official checkpoint layout (`control_model.*`):

    time_embed.{0,2}             as the UNet
    input_hint_block.{0..14}     8 convs, SiLU between, strides 1,1,2,1,2,1,2,1
    input_blocks.*               identical to the UNet encoder
    zero_convs.{i}.0             1x1 conv per input block (zero-init)
    middle_block.{0,1,2}         as the UNet
    middle_block_out.0           1x1 conv (zero-init)
    label_emb.*                  SDXL vector conditioning (when present)

Behavior contract: lllyasviel/ControlNet cldm (guided hint added after
conv_in, residual per block through a zero conv) as consumed by the webui
extension's Balanced mode; weights load from `control_model.`-prefixed,
bare, or diffusers-keyed safetensors (loader/convert.convert_controlnet).
"""

from __future__ import annotations

import jax.numpy as jnp

from sdwebui_tpu.models import unet as unet_model
from sdwebui_tpu.models.configs import UNetConfig
from sdwebui_tpu.models.layers import (
    conv2d, linear, silu, timestep_embedding,
)

# input_hint_block conv ladder: (out_channels follows the official arch up
# to model_channels at the end), stride 2 every other conv → 8x downscale
# (image space → latent space)
_HINT_STRIDES = (1, 1, 2, 1, 2, 1, 2, 1)
_HINT_CHANNELS = (16, 16, 32, 32, 96, 96, 256)   # last conv → model_channels


def apply(params, cfg: UNetConfig, x, timesteps, context, hint, y=None):
    """Run the control tower.

    x: (B,H,W,C) scaled latent (same input the UNet sees, pre-c_concat);
    hint: (B,8H,8W,hint_ch) control image in [0,1];
    returns {"input": tuple of per-input-block residuals, "middle": arr},
    ready for `unet.apply(..., control=...)` after external scaling.
    """
    input_plan, middle_depth, _, _ = unet_model.build_plan(cfg)

    t_emb = timestep_embedding(timesteps, cfg.model_channels)
    emb = linear(params["time_embed"]["0"], t_emb)
    emb = linear(params["time_embed"]["2"], silu(emb))
    if cfg.adm_in_channels and "label_emb" in params:
        assert y is not None, "this ControlNet requires vector conditioning y"
        le = params["label_emb"]["0"]
        ye = linear(le["0"], y.astype(emb.dtype))
        emb = emb + linear(le["2"], silu(ye))
    emb = emb.astype(x.dtype)
    context = context.astype(x.dtype) if context is not None else None

    hp = params["input_hint_block"]
    g = hint.astype(x.dtype)
    n_convs = len(_HINT_STRIDES)
    for j in range(n_convs):
        g = conv2d(hp[str(2 * j)], g, stride=_HINT_STRIDES[j])
        if j < n_convs - 1:
            g = silu(g)
    guided_hint = g

    outs = []
    h = x
    for i, plan in enumerate(input_plan):
        h = unet_model._apply_layers(
            plan, params["input_blocks"][str(i)], h, emb, context, cfg)
        if guided_hint is not None:
            h = h + guided_hint
            guided_hint = None
        outs.append(conv2d(params["zero_convs"][str(i)]["0"], h, padding=0))

    mp = params["middle_block"]
    h = unet_model._resblock(mp["0"], h, emb)
    if "1" in mp:
        h = unet_model._spatial_transformer(
            mp["1"], h, context, cfg, len(mp["1"]["transformer_blocks"]))
    if "2" in mp:
        h = unet_model._resblock(mp["2"], h, emb)
    middle = conv2d(params["middle_block_out"]["0"], h, padding=0)
    return {"input": tuple(outs), "middle": middle}


def residual_shapes(cfg: UNetConfig, batch: int, h: int, w: int):
    """Static residual shapes for a (batch, h, w) latent — used to build the
    zero branch of the step-gated lax.cond in the denoiser."""
    input_plan, _, _, input_chs = unet_model.build_plan(cfg)
    shapes = []
    hh, ww = h, w
    for plan, ch in zip(input_plan, input_chs):
        if plan[0][0] == "down":
            hh, ww = hh // 2, ww // 2
        shapes.append((batch, hh, ww, ch))
    return {"input": tuple(shapes), "middle": (batch, hh, ww, input_chs[-1])}


def zero_control(cfg: UNetConfig, batch: int, h: int, w: int, dtype):
    shapes = residual_shapes(cfg, batch, h, w)
    return {"input": tuple(jnp.zeros(s, dtype) for s in shapes["input"]),
            "middle": jnp.zeros(shapes["middle"], dtype)}


def scale_control(control, scale):
    """Multiply every residual by a scalar (weight × per-step gate)."""
    return {"input": tuple(r * scale for r in control["input"]),
            "middle": control["middle"] * scale}


def add_controls(a, b):
    if a is None:
        return b
    return {"input": tuple(x + y for x, y in zip(a["input"], b["input"])),
            "middle": a["middle"] + b["middle"]}


# --------------------------------------------------------------------------
# init (random weights — tests; real weights come from checkpoints)
# --------------------------------------------------------------------------

def init_params(cfg: UNetConfig, key, hint_channels: int = 3,
                dtype=jnp.bfloat16, zero_init: bool = True):
    from sdwebui_tpu.models.init_utils import HostInit

    import numpy as np

    ini = HostInit(key)
    input_plan, middle_depth, _, input_chs = unet_model.build_plan(cfg)
    full = unet_model.init_params(cfg, key, dtype=dtype)
    ted = cfg.time_embed_dim

    hint = {}
    chans = (hint_channels,) + _HINT_CHANNELS + (cfg.model_channels,)
    for j in range(len(_HINT_STRIDES)):
        hint[str(2 * j)] = ini.conv(3, 3, chans[j], chans[j + 1], dtype)
    if zero_init:
        last = hint[str(2 * (len(_HINT_STRIDES) - 1))]
        for k in last:
            last[k] = np.zeros_like(last[k])

    def zconv(c):
        p = ini.conv(1, 1, c, c, dtype)
        if zero_init:
            p = {k: np.zeros_like(v) for k, v in p.items()}
        return {"0": p}

    mid_ch = input_chs[-1]
    params = {
        "time_embed": full["time_embed"],
        "input_blocks": full["input_blocks"],
        "middle_block": full["middle_block"],
        "input_hint_block": hint,
        "zero_convs": {str(i): zconv(c) for i, c in enumerate(input_chs)},
        "middle_block_out": zconv(mid_ch),
    }
    if "label_emb" in full:
        params["label_emb"] = full["label_emb"]
    return params

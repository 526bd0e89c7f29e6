"""ESRGAN / RealESRGAN RRDBNet — NHWC JAX port (reference loads these via
spandrel, modules/esrgan_model.py; arch: Wang et al. 2018 ESRGAN).

Supports the modern key layout (conv_first / body.N.rdbX.convY / conv_up*)
and translates the legacy "model.0 / model.1.sub.N" serialization.  Runs
tiled (upscale_image) with feathered reassembly — the TPU variant batches
all tiles into ONE device call instead of the reference's per-tile loop
(modules/upscaler_utils.py:51-88).
"""

from __future__ import annotations

import functools
import re

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from sdwebui_tpu.models.layers import conv2d, upsample_nearest_2x


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _rdb(p, x):
    """ResidualDenseBlock_5C with dense concats, residual scale 0.2."""
    x1 = _lrelu(conv2d(p["conv1"], x))
    x2 = _lrelu(conv2d(p["conv2"], jnp.concatenate([x, x1], -1)))
    x3 = _lrelu(conv2d(p["conv3"], jnp.concatenate([x, x1, x2], -1)))
    x4 = _lrelu(conv2d(p["conv4"], jnp.concatenate([x, x1, x2, x3], -1)))
    x5 = conv2d(p["conv5"], jnp.concatenate([x, x1, x2, x3, x4], -1))
    return x + 0.2 * x5


def _rrdb(p, x):
    out = _rdb(p["rdb1"], x)
    out = _rdb(p["rdb2"], out)
    out = _rdb(p["rdb3"], out)
    return x + 0.2 * out


def _pixel_unshuffle(x, r: int):
    """(B,H,W,C) → (B,H/r,W/r,C·r²) — RealESRGAN feeds unshuffled pixels to
    run the body at reduced resolution for its x2/x1 variants
    (realesrgan RRDBNet forward)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    # torch pixel_unshuffle channel order: (C, r_h, r_w)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // r, w // r, c * r * r)


def apply(params, x, scale: int = 4):
    """x: (B,H,W,3) in [0,1] → (B,scale*H,scale*W,3)."""
    in_ch = params["conv_first"]["weight"].shape[2]
    h0, w0 = x.shape[1], x.shape[2]
    unshuffle = {12: 2, 48: 4}.get(in_ch, 1)
    if unshuffle > 1:      # RealESRGAN x2/x1 variants
        ph, pw = (-h0) % unshuffle, (-w0) % unshuffle
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), "reflect")
        x = _pixel_unshuffle(x, unshuffle)
    fea = conv2d(params["conv_first"], x)
    body = fea
    n_blocks = len(params["body"])
    for i in range(n_blocks):
        body = _rrdb(params["body"][str(i)], body)
    fea = fea + conv2d(params["conv_body"], body)
    # topology comes from the checkpoint: both upsample convs always run
    # when present (pixel-unshuffled x2/x1 models have both and divide the
    # net scale via the unshuffle above)
    if "conv_up1" in params:
        fea = _lrelu(conv2d(params["conv_up1"], upsample_nearest_2x(fea)))
    if "conv_up2" in params:
        fea = _lrelu(conv2d(params["conv_up2"], upsample_nearest_2x(fea)))
    out = conv2d(params["conv_last"], _lrelu(conv2d(params["conv_hr"], fea)))
    if unshuffle > 1:      # crop the pad back off at the net output scale
        net = (4 if "conv_up2" in params
               else 2 if "conv_up1" in params else 1) // unshuffle
        out = out[:, : h0 * max(net, 1), : w0 * max(net, 1)]
    return jnp.clip(out, 0.0, 1.0)


# --------------------------------------------------------------------------
# loading
# --------------------------------------------------------------------------

_OLD_KEY_RE = re.compile(r"^model\.1\.sub\.(\d+)\.RDB(\d)\.conv(\d)\.0\.(weight|bias)$")

_OLD_FIXED = {
    "model.0": "conv_first",
    "model.1.sub.23": "conv_body",
    "model.3": "conv_up1",
    "model.6": "conv_up2",
    "model.8": "conv_hr",
    "model.10": "conv_last",
}


def normalize_keys(sd: dict) -> dict:
    """old ESRGAN serialization → modern RRDBNet names."""
    if not any(k.startswith("model.") for k in sd):
        return sd
    out = {}
    for k, v in sd.items():
        m = _OLD_KEY_RE.match(k)
        if m:
            out[f"body.{m.group(1)}.rdb{m.group(2)}.conv{m.group(3)}.{m.group(4)}"] = v
            continue
        for old, new in _OLD_FIXED.items():
            if k.startswith(old + "."):
                out[new + k[len(old):]] = v
                break
    return out


def _read_sd(path: str) -> dict:
    if path.endswith(".safetensors"):
        from sdwebui_tpu.loader.safetensors_io import read_state_dict

        return read_state_dict(path)
    from sdwebui_tpu.loader.torch_ckpt import load_torch_checkpoint

    return load_torch_checkpoint(path)


def load_esrgan(path: str, sd: dict | None = None):
    """file → (params, scale)."""
    if sd is None:
        sd = _read_sd(path)
    sd = {k.replace("model.", "", 1) if k.startswith("model.model.") else k: v
          for k, v in sd.items()}
    sd = normalize_keys(sd)
    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.utils.pytree import unflatten

    tree = unflatten({k: convert_leaf(k, np.asarray(v)) for k, v in sd.items()})
    scale = 4 if "conv_up2" in tree else (2 if "conv_up1" in tree else 1)
    in_ch = tree["conv_first"]["weight"].shape[2]
    if in_ch == 12:
        scale //= 2        # pixel-unshuffled RealESRGAN x2 checkpoints
    elif in_ch == 48:
        scale //= 4
    return jax.device_put(tree), max(scale, 1)


def init_params(n_blocks: int = 2, nf: int = 16, gc: int = 8, seed: int = 0,
                scale: int = 4):
    """Tiny random RRDBNet for tests."""
    from sdwebui_tpu.models.init_utils import HostInit

    ini = HostInit(seed)
    conv = lambda cin, cout, k=3: ini.conv(k, k, cin, cout, jnp.float32)

    def rdb():
        return {f"conv{i + 1}": conv(nf + i * gc, gc if i < 4 else nf)
                for i in range(5)}

    params = {
        "conv_first": conv(3, nf),
        "body": {str(i): {"rdb1": rdb(), "rdb2": rdb(), "rdb3": rdb()}
                 for i in range(n_blocks)},
        "conv_body": conv(nf, nf),
        "conv_hr": conv(nf, nf),
        "conv_last": conv(nf, 3),
    }
    if scale >= 2:
        params["conv_up1"] = conv(nf, nf)
    if scale >= 4:
        params["conv_up2"] = conv(nf, nf)
    return params


# --------------------------------------------------------------------------
# tiled inference
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("scale",))
def _apply_batch(params, tiles, scale):
    return apply(params, tiles, scale=scale)


def upscale_image(params, image: Image.Image, model_scale: int = 4,
                  tile: int | None = None, overlap: int | None = None) -> Image.Image:
    """Tiled ×model_scale upscale: all tiles in one batched device call,
    feathered reassembly at output resolution."""
    from sdwebui_tpu.utils.images import Grid, combine_grid, split_grid

    from sdwebui_tpu.utils.options import opts as _opts

    if tile is None:
        tile = int(_opts.get("ESRGAN_tile", 192) or 0)
    if overlap is None:
        overlap = int(_opts.get("ESRGAN_tile_overlap", 8))
    img = image.convert("RGB")
    if tile <= 0:
        tile = max(img.width, img.height)
    if img.width <= tile and img.height <= tile:
        arr = np.asarray(img, np.float32)[None] / 255.0
        out = np.asarray(_apply_batch(params, jnp.asarray(arr), model_scale))[0]
        return Image.fromarray((out * 255 + 0.5).astype(np.uint8))

    grid = split_grid(img, tile, tile, overlap)
    tiles = [t for _, _, row in grid.tiles for _, _, t in row]
    arr = np.stack([np.asarray(t, np.float32) / 255.0 for t in tiles])
    outs = np.asarray(_apply_batch(params, jnp.asarray(arr), model_scale))
    outs = (np.clip(outs, 0, 1) * 255 + 0.5).astype(np.uint8)

    s = model_scale
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


def register_esrgan_dir(dirs=("models/ESRGAN", "models/RealESRGAN")):
    """Scan model dirs, register each file as an upscaler."""
    import os

    from sdwebui_tpu.postprocessing.upscalers import register_upscaler

    found = []
    for d in dirs:
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            if not fn.lower().endswith((".pth", ".pt", ".safetensors")):
                continue
            name = os.path.splitext(fn)[0]
            path = os.path.join(d, fn)

            def make_fn(p=path):
                cache = {}

                def fn_(image, scale):
                    if "params" not in cache:
                        # sniff the arch once from the loaded state dict:
                        # SRVGGNetCompact (RealESRGAN v3) vs RRDBNet
                        sd = _read_sd(p)
                        keys = {k.replace("params.", "", 1) for k in sd}
                        if is_srvgg(dict.fromkeys(keys)):
                            cache["params"], cache["scale"] = load_srvgg(p, sd)
                            cache["srvgg"] = True
                        else:
                            cache["params"], cache["scale"] = load_esrgan(p, sd)
                            cache["srvgg"] = False
                    if cache["srvgg"]:
                        return upscale_image_srvgg(cache["params"], image,
                                                   cache["scale"])
                    return upscale_image(cache["params"], image, cache["scale"])

                return fn_

            register_upscaler(name, make_fn(), default_scale=4)
            found.append(name)
    return found


# --------------------------------------------------------------------------
# SRVGGNetCompact — RealESRGAN v3 "general" models (realesr-general-x4v3,
# realesr-animevideov3).  Arch per the public realesrgan srvgg_arch.py:
# conv(in,nf)+PReLU, num_conv x (conv(nf,nf)+PReLU), conv(nf, out*r²),
# PixelShuffle(r), plus a nearest-upsampled input residual.
# --------------------------------------------------------------------------

def _pixel_shuffle(x, r: int):
    """(B,H,W,C·r²) → (B,H·r,W·r,C), torch PixelShuffle channel order."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * r, w * r, c)


def is_srvgg(sd: dict) -> bool:
    return any(k.startswith("body.") for k in sd) and \
        not any(".rdb" in k or ".RDB" in k for k in sd) and \
        "conv_first.weight" not in sd and "model.0.weight" not in sd


def apply_srvgg(params, x, scale: int):
    body = params["body"]
    h = x
    for i in range(len(body)):
        p = body[str(i)]
        w = p["weight"]
        if w.ndim == 4:                      # conv
            h = conv2d(p, h)
        else:                                # PReLU (per-channel alpha)
            h = jnp.where(h > 0, h, h * w.astype(h.dtype))
    out = _pixel_shuffle(h, scale)
    base = jnp.repeat(jnp.repeat(x, scale, axis=1), scale, axis=2)
    return jnp.clip(out + base, 0.0, 1.0)


def load_srvgg(path: str, sd: dict | None = None):
    """file → (params, scale); scale derived from the last conv's output
    channels (out_ch·r²)."""
    if sd is None:
        sd = _read_sd(path)
    if "params" in sd and isinstance(sd["params"], dict):
        sd = sd["params"]
    sd = {k.replace("params.", "", 1) if k.startswith("params.") else k: v
          for k, v in sd.items()}
    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.utils.pytree import unflatten

    tree = unflatten({k: convert_leaf(k, np.asarray(v)) for k, v in sd.items()})
    body = tree["body"]
    last = body[str(max(int(k) for k in body.keys()))]
    out_ch = last["weight"].shape[3]
    scale = int(round((out_ch / 3) ** 0.5))
    return jax.device_put(tree), max(scale, 1)


@functools.partial(jax.jit, static_argnames=("scale",))
def _apply_srvgg_batch(params, tiles, scale):
    return apply_srvgg(params, tiles, scale)


def upscale_image_srvgg(params, image: Image.Image, model_scale: int,
                        tile: int | None = None,
                        overlap: int | None = None) -> Image.Image:
    from sdwebui_tpu.postprocessing.upscalers import tiled_sr_upscale

    return tiled_sr_upscale(
        lambda arr: _apply_srvgg_batch(params, jnp.asarray(arr), model_scale),
        model_scale, 1, image, tile=tile, overlap=overlap)

"""SwinIR super-resolution — NHWC JAX port (reference loads these through
extensions-builtin/SwinIR, arch: Liang et al. 2021 "SwinIR: Image
Restoration Using Swin Transformer").

Design notes (TPU-first):
- Window attention runs as one batched einsum over (B·nWindows) — every
  64-token window is a row of a single large matmul instead of the
  reference's per-window loop unrolling, so the MXU sees one big batch.
- Shift masks and relative-position indices are host-precomputed numpy
  constants baked into the trace (they depend only on static shapes).
- Tiled inference batches ALL tiles into one device call like esrgan.py
  (the reference runs tiles sequentially, modules/upscaler_utils.py).

Config is derived from checkpoint weight shapes (derive_swinir_config);
supports the classic-SR `pixelshuffle`, lightweight `pixelshuffledirect`
and real-SR `nearest+conv` upsamplers with 1conv residual connections
(covers the official SwinIR-M/-L release weights the webui ships presets
for).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from sdwebui_tpu.models.layers import conv2d, upsample_nearest_2x
from sdwebui_tpu.ops.norms import layer_norm

_RGB_MEAN = np.asarray([0.4488, 0.4371, 0.4040], np.float32)


@dataclasses.dataclass(frozen=True)
class SwinIRConfig:
    embed_dim: int = 180
    depths: tuple = (6, 6, 6, 6, 6, 6)
    num_heads: tuple = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    upsampler: str = "nearest+conv"   # | pixelshuffle | pixelshuffledirect | none
    scale: int = 4
    in_chans: int = 3
    patch_norm: bool = True
    ape: bool = False
    img_range: float = 1.0


# --------------------------------------------------------------------------
# window helpers (host-side constants; shapes are static under jit)
# --------------------------------------------------------------------------

def relative_position_index(w: int) -> np.ndarray:
    """(w², w²) lookup into the (2w-1)² relative-position bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)                          # (2, w²)
    rel = flat[:, :, None] - flat[:, None, :]             # (2, w², w²)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += w - 1
    rel[..., 1] += w - 1
    rel[..., 0] *= 2 * w - 1
    return rel.sum(-1)


def shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """(nW, w², w²) additive mask (-100 across region boundaries) for
    shifted-window attention."""
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    mw = img.reshape(h // window, window, w // window, window) \
            .transpose(0, 2, 1, 3).reshape(-1, window * window)
    mask = mw[:, None, :] - mw[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x, w: int):
    """(B,H,W,C) → (B·nW, w², C)"""
    b, hh, ww, c = x.shape
    x = x.reshape(b, hh // w, w, ww // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_reverse(win, w: int, b: int, hh: int, ww: int):
    c = win.shape[-1]
    x = win.reshape(b, hh // w, ww // w, w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, c)


# --------------------------------------------------------------------------
# blocks
# --------------------------------------------------------------------------

def _linear(p, x):
    y = x @ p["weight"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _window_attention(p, x, num_heads: int, rpi: np.ndarray, mask=None):
    """x: (B_, N, C); one fused qkv matmul, bias via a static gather."""
    b_, n, c = x.shape
    d = c // num_heads
    qkv = _linear(p["qkv"], x).reshape(b_, n, 3, num_heads, d)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # (B_,h,N,d)
    attn = (q * (d ** -0.5)) @ k.transpose(0, 1, 3, 2)                # (B_,h,N,N)
    bias = p["relative_position_bias_table"][jnp.asarray(rpi.reshape(-1))]
    attn = attn + bias.reshape(n, n, num_heads).transpose(2, 0, 1)[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b_ // nw, nw, num_heads, n, n) \
            + jnp.asarray(mask)[None, :, None]
        attn = attn.reshape(b_, num_heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b_, n, c)
    return _linear(p["proj"], out)


def _swin_block(p, t, hh: int, ww: int, num_heads: int, window: int,
                shift: int, rpi: np.ndarray, mask):
    b = t.shape[0]
    c = t.shape[-1]
    shortcut = t
    x = layer_norm(t, p["norm1"]["weight"], p["norm1"]["bias"])
    x = x.reshape(b, hh, ww, c)
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    wins = _window_partition(x, window)
    wins = _window_attention(p["attn"], wins, num_heads, rpi,
                             mask if shift > 0 else None)
    x = _window_reverse(wins, window, b, hh, ww)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    t = shortcut + x.reshape(b, hh * ww, c)
    y = layer_norm(t, p["norm2"]["weight"], p["norm2"]["bias"])
    y = _linear(p["mlp"]["fc2"], jax.nn.gelu(_linear(p["mlp"]["fc1"], y),
                                             approximate=False))
    return t + y


def _resi_conv(p, x):
    """Residual connection conv: '1conv' (single 3x3) or '3conv'
    (3x3 → lrelu → 1x1 → lrelu → 3x3 bottleneck, SwinIR-L)."""
    if "weight" in p:
        return conv2d(p, x)
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
    x = lrelu(conv2d(p["0"], x))
    x = lrelu(conv2d(p["2"], x, padding=0))
    return conv2d(p["4"], x)


def _rstb(p, t, hh: int, ww: int, num_heads: int, window: int,
          rpi: np.ndarray, mask):
    """Residual Swin Transformer Block: blocks → conv → +residual."""
    b = t.shape[0]
    c = t.shape[-1]
    tin = t
    n_blocks = len(p["residual_group"]["blocks"])
    for j in range(n_blocks):
        shift = 0 if j % 2 == 0 else window // 2
        t = _swin_block(p["residual_group"]["blocks"][str(j)], t, hh, ww,
                        num_heads, window, shift, rpi, mask)
    x = t.reshape(b, hh, ww, c)
    x = _resi_conv(p["conv"], x)
    return x.reshape(b, hh * ww, c) + tin


def apply(params, cfg: SwinIRConfig, x):
    """x: (B,H,W,3) in [0,1] → (B, scale·H, scale·W, 3).  H and W must be
    multiples of window_size (upscale_image pads with reflect)."""
    b, h, w, _ = x.shape
    win = cfg.window_size
    assert h % win == 0 and w % win == 0, "pad input to window multiple"
    rpi = relative_position_index(win)
    mask = shift_attn_mask(h, w, win, win // 2)

    mean = jnp.asarray(_RGB_MEAN if cfg.in_chans == 3 else [0.5])
    x = (x - mean) * cfg.img_range
    feat = conv2d(params["conv_first"], x)

    t = feat.reshape(b, h * w, cfg.embed_dim)
    if cfg.patch_norm and "patch_embed" in params:
        pn = params["patch_embed"]["norm"]
        t = layer_norm(t, pn["weight"], pn["bias"])
    for i in range(len(cfg.depths)):
        t = _rstb(params["layers"][str(i)], t, h, w, cfg.num_heads[i], win,
                  rpi, mask)
    t = layer_norm(t, params["norm"]["weight"], params["norm"]["bias"])
    body = t.reshape(b, h, w, cfg.embed_dim)
    feat = _resi_conv(params["conv_after_body"], body) + feat

    lrelu = lambda v: jax.nn.leaky_relu(v, 0.01)
    if cfg.upsampler == "nearest+conv":
        feat = lrelu(conv2d(params["conv_before_upsample"], feat))
        feat = lrelu(conv2d(params["conv_up1"], upsample_nearest_2x(feat)))
        if cfg.scale == 4:
            feat = lrelu(conv2d(params["conv_up2"], upsample_nearest_2x(feat)))
        out = conv2d(params["conv_last"], lrelu(conv2d(params["conv_hr"], feat)))
    elif cfg.upsampler == "pixelshuffle":
        feat = lrelu(conv2d(params["conv_before_upsample"], feat))
        s = cfg.scale
        k = 0
        while s > 1:
            r = 3 if s % 3 == 0 else 2
            feat = _pixel_shuffle(conv2d(params["upsample"][str(k)], feat), r)
            s //= r
            k += 2   # torch Sequential interleaves PixelShuffle modules
        out = conv2d(params["conv_last"], feat)
    elif cfg.upsampler == "pixelshuffledirect":
        out = _pixel_shuffle(conv2d(params["upsample"]["0"], feat), cfg.scale)
    else:   # denoise / no upsample
        out = conv2d(params["conv_last"], feat)
    out = out / cfg.img_range + mean
    return jnp.clip(out, 0.0, 1.0)


def _pixel_shuffle(x, r: int):
    """NHWC pixel shuffle matching torch semantics (channel-major blocks):
    torch shuffles NCHW (B, C·r², H, W) → (B, C, H·r, W·r) with the r×r
    offsets taken from the *leading* channel dimension."""
    b, h, w, c = x.shape
    cout = c // (r * r)
    x = x.reshape(b, h, w, cout, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, cout)


# --------------------------------------------------------------------------
# loading / config derivation
# --------------------------------------------------------------------------

def derive_swinir_config(sd: dict) -> SwinIRConfig:
    """Read architecture from weight shapes (reference hard-codes per-preset
    args; we derive them so any official release file loads)."""
    shape = lambda k: tuple(np.asarray(sd[k]).shape)
    embed = shape("conv_first.weight")[0]
    in_chans = shape("conv_first.weight")[1]
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("layers."))
    depths, heads = [], []
    table_rows = None
    for i in range(n_layers):
        pre = f"layers.{i}.residual_group.blocks."
        depths.append(1 + max(int(k[len(pre):].split(".")[0])
                              for k in sd if k.startswith(pre)))
        tk = f"{pre}0.attn.relative_position_bias_table"
        table_rows, h = shape(tk)
        heads.append(h)
    window = (int(round(table_rows ** 0.5)) + 1) // 2
    mlp_ratio = shape("layers.0.residual_group.blocks.0.mlp.fc1.weight")[0] / embed
    if "conv_up1.weight" in sd:
        upsampler = "nearest+conv"
        scale = 4 if "conv_up2.weight" in sd else 2
    elif "conv_before_upsample.0.weight" in sd or "conv_before_upsample.weight" in sd:
        upsampler = "pixelshuffle"
        scale = 1
        k = 0
        while f"upsample.{k}.weight" in sd:
            scale *= int(round((shape(f"upsample.{k}.weight")[0] // embed_after_up(sd)) ** 0.5))
            k += 2
    elif "upsample.0.weight" in sd:
        upsampler = "pixelshuffledirect"
        scale = int(round((shape("upsample.0.weight")[0] // in_chans) ** 0.5))
    else:
        upsampler = "none"
        scale = 1
    return SwinIRConfig(
        embed_dim=embed, depths=tuple(depths), num_heads=tuple(heads),
        window_size=window, mlp_ratio=float(mlp_ratio), upsampler=upsampler,
        scale=scale, in_chans=in_chans,
        patch_norm="patch_embed.norm.weight" in sd,
        ape="absolute_pos_embed" in sd)


def embed_after_up(sd) -> int:
    k = "conv_before_upsample.0.weight" if "conv_before_upsample.0.weight" in sd \
        else "conv_before_upsample.weight"
    return int(np.asarray(sd[k]).shape[0])


_DROP_SUFFIXES = ("relative_position_index", "attn_mask", "attns.", "table_index")


def convert_swinir(sd: dict):
    """torch state dict → (params tree NHWC/col-major, SwinIRConfig)."""
    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.utils.pytree import unflatten

    sd = {(k[len("params_ema."):] if k.startswith("params_ema.") else
           k[len("params."):] if k.startswith("params.") else k): v
          for k, v in sd.items()}
    cfg = derive_swinir_config(sd)
    flat = {}
    for k, v in sd.items():
        if any(k.endswith(s) or s in k for s in _DROP_SUFFIXES):
            continue  # buffers we recompute from static shapes
        # torch Sequential names: conv_before_upsample.0 → plain conv
        k = k.replace("conv_before_upsample.0.", "conv_before_upsample.")
        flat[k] = convert_leaf(k, np.asarray(v))
    return unflatten(flat), cfg


def load_swinir(path: str):
    if path.endswith(".safetensors"):
        from sdwebui_tpu.loader.safetensors_io import read_state_dict

        sd = read_state_dict(path)
    else:
        from sdwebui_tpu.loader.torch_ckpt import load_torch_checkpoint

        sd = load_torch_checkpoint(path)   # flattens params_ema./params.
    tree, cfg = convert_swinir(sd)
    return jax.device_put(tree), cfg


def init_params(cfg: SwinIRConfig, seed: int = 0):
    """Random SwinIR for tests (tiny shapes)."""
    from sdwebui_tpu.models.init_utils import HostInit

    ini = HostInit(seed)
    f32 = jnp.float32
    e = cfg.embed_dim

    def block(heads):
        hidden = int(e * cfg.mlp_ratio)
        n_rel = (2 * cfg.window_size - 1) ** 2
        return {
            "norm1": ini.norm(e, f32), "norm2": ini.norm(e, f32),
            "attn": {
                "qkv": ini.linear(e, 3 * e, f32),
                "proj": ini.linear(e, e, f32),
                "relative_position_bias_table":
                    ini._normal((n_rel, heads), 0.02, f32),
            },
            "mlp": {"fc1": ini.linear(e, hidden, f32),
                    "fc2": ini.linear(hidden, e, f32)},
        }

    params = {
        "conv_first": ini.conv(3, 3, cfg.in_chans, e, f32),
        "patch_embed": {"norm": ini.norm(e, f32)},
        "layers": {str(i): {
            "residual_group": {"blocks": {str(j): block(cfg.num_heads[i])
                                          for j in range(cfg.depths[i])}},
            "conv": ini.conv(3, 3, e, e, f32),
        } for i in range(len(cfg.depths))},
        "norm": ini.norm(e, f32),
        "conv_after_body": ini.conv(3, 3, e, e, f32),
    }
    if cfg.upsampler == "nearest+conv":
        nf = max(e // 3, 8)
        params.update(
            conv_before_upsample=ini.conv(3, 3, e, nf, f32),
            conv_up1=ini.conv(3, 3, nf, nf, f32),
            conv_hr=ini.conv(3, 3, nf, nf, f32),
            conv_last=ini.conv(3, 3, nf, 3, f32))
        if cfg.scale == 4:
            params["conv_up2"] = ini.conv(3, 3, nf, nf, f32)
    elif cfg.upsampler == "pixelshuffledirect":
        params["upsample"] = {"0": ini.conv(3, 3, e, 3 * cfg.scale ** 2, f32)}
    else:
        params["conv_last"] = ini.conv(3, 3, e, 3, f32)
    return params


# --------------------------------------------------------------------------
# tiled inference + registration
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def _apply_batch(params, cfg, tiles):
    return apply(params, cfg, tiles)


def upscale_image(params, cfg: SwinIRConfig, image: Image.Image,
                  tile: int | None = None, overlap: int | None = None) -> Image.Image:
    """Tiled ×scale upscale, all tiles in one batched device call."""
    from sdwebui_tpu.utils.images import Grid, combine_grid, split_grid

    from sdwebui_tpu.utils.options import opts as _opts

    if tile is None:
        tile = int(_opts.get("ESRGAN_tile", 192) or 0)
    if overlap is None:
        overlap = int(_opts.get("ESRGAN_tile_overlap", 8))
    img = image.convert("RGB")
    if tile <= 0:
        tile = max(img.width, img.height)
    win = cfg.window_size

    def run(arr):
        h, w = arr.shape[1:3]
        ph = (-h) % win
        pw = (-w) % win
        if ph or pw:
            arr = np.pad(arr, ((0, 0), (0, ph), (0, pw), (0, 0)), "reflect")
        out = np.asarray(_apply_batch(params, cfg, jnp.asarray(arr)))
        return out[:, : h * cfg.scale, : w * cfg.scale]

    if img.width <= tile and img.height <= tile:
        arr = np.asarray(img, np.float32)[None] / 255.0
        out = run(arr)[0]
        return Image.fromarray((out * 255 + 0.5).astype(np.uint8))

    grid = split_grid(img, tile, tile, overlap)
    tiles = [t for _, _, row in grid.tiles for _, _, t in row]
    arr = np.stack([np.asarray(t, np.float32) / 255.0 for t in tiles])
    outs = (np.clip(run(arr), 0, 1) * 255 + 0.5).astype(np.uint8)

    s = cfg.scale
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


def register_swinir_dir(dirs=("models/SwinIR",)):
    """Scan model dirs, register each file as an upscaler (reference
    extensions-builtin/SwinIR/scripts/swinir_model.py discovery)."""
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
                        from sdwebui_tpu.loader.load import read_checkpoint

                        sd = read_checkpoint(p)
                        if any("logit_scale" in k or k.startswith("swin2sr.")
                               for k in sd):
                            # SwinV2 checkpoint (Swin2SR) in the SwinIR dir
                            from sdwebui_tpu.models import swin2sr as v2

                            cache["params"], cache["cfg"] = v2.convert_swin2sr(sd)
                            cache["up"] = v2.upscale_image
                        else:
                            cache["params"], cache["cfg"] = convert_swinir(sd)
                            cache["up"] = upscale_image
                    return cache["up"](cache["params"], cache["cfg"], image)

                return fn_

            register_upscaler(name, make_fn(), default_scale=4)
            found.append(name)
    return found

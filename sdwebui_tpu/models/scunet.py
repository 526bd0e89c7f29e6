"""SCUNet blind denoiser — NHWC JAX port (reference loads these through
extensions-builtin/ScuNET via spandrel; arch: Zhang et al. 2022 "Practical
Blind Denoising via Swin-Conv-UNet and Data Synthesis", KAIR SCUNet).

UNet over swin-conv blocks: each block 1x1-projects, splits channels into a
conv residual half and a swin-transformer half, and 1x1-merges back with a
residual.  Three stride-2 downsamples (dim→8dim) around a body stage, with
additive skip connections.  ScuNET does NOT upscale (scale 1) — the webui
uses it as a denoising "upscaler" whose resize happens via Lanczos after.

TPU notes: window attention reuses the batched swinir helpers (one matmul
over B·windows); the stride-2 ConvTranspose2d (kernel==stride) has no
overlap, so it lowers to a single einsum + pixel reshuffle instead of a
transpose conv.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from sdwebui_tpu.models.layers import conv2d
from sdwebui_tpu.models.swinir import (_window_partition, _window_reverse,
                                       shift_attn_mask)
from sdwebui_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class SCUNetConfig:
    dim: int = 64
    config: tuple = (4, 4, 4, 4, 4, 4, 4)   # blocks per stage
    head_dim: int = 32
    window_size: int = 8
    in_nc: int = 3


def _wmsa(p, x, heads: int, window: int, shift: int, mask):
    """KAIR WMSA: qkv via one linear, relative bias stored as a dense
    (heads, 2w-1, 2w-1) grid indexed by 2D offsets (not swin's flat table)."""
    b, hh, ww, c = x.shape
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    wins = _window_partition(x, window)               # (B_, N, C)
    b_, n, _ = wins.shape
    d = c // heads
    qkv = (wins @ p["embedding_layer"]["weight"] + p["embedding_layer"]["bias"])
    qkv = qkv.reshape(b_, n, 3, heads, d)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    sim = (q * (d ** -0.5)) @ k.transpose(0, 1, 3, 2)   # (B_, h, N, N)

    # relative bias: params[h, di + w-1, dj + w-1]
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)
    di = coords[0][:, None] - coords[0][None, :] + window - 1
    dj = coords[1][:, None] - coords[1][None, :] + window - 1
    bias = p["relative_position_params"][:, jnp.asarray(di), jnp.asarray(dj)]
    sim = sim + bias[None]
    if shift > 0:
        nw = mask.shape[0]
        sim = sim.reshape(b_ // nw, nw, heads, n, n) \
            + jnp.asarray(mask)[None, :, None]
        sim = sim.reshape(b_, heads, n, n)
    attn = jax.nn.softmax(sim, axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b_, n, c)
    out = out @ p["linear"]["weight"] + p["linear"]["bias"]
    x = _window_reverse(out, window, b, hh, ww)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    return x


def _trans_block(p, x, heads: int, window: int, shift: int, mask):
    """Pre-norm swin block on NHWC maps (KAIR Block)."""
    y = layer_norm(x, p["ln1"]["weight"], p["ln1"]["bias"])
    x = x + _wmsa(p["msa"], y, heads, window, shift, mask)
    y = layer_norm(x, p["ln2"]["weight"], p["ln2"]["bias"])
    y = y @ p["mlp"]["0"]["weight"] + p["mlp"]["0"]["bias"]
    y = jax.nn.gelu(y, approximate=False)
    y = y @ p["mlp"]["2"]["weight"] + p["mlp"]["2"]["bias"]
    return x + y


def _conv_trans_block(p, x, head_dim: int, window: int, shift: int, mask):
    """ConvTransBlock: 1x1 split → [conv residual | swin] → 1x1 merge + res."""
    y = conv2d(p["conv1_1"], x, padding=0)
    half = y.shape[-1] // 2
    conv_x, trans_x = y[..., :half], y[..., half:]
    c = conv_x
    c = conv2d(p["conv_block"]["0"], c)
    c = jax.nn.relu(c)
    c = conv2d(p["conv_block"]["2"], c)
    conv_x = conv_x + c
    heads = trans_x.shape[-1] // head_dim
    trans_x = _trans_block(p["trans_block"], trans_x, heads, window, shift,
                           mask)
    merged = conv2d(p["conv1_2"], jnp.concatenate([conv_x, trans_x], -1),
                    padding=0)
    return x + merged


def _stage(p, x, idxs, cfg: SCUNetConfig, masks):
    """Run the ConvTransBlocks at the given param indices (W/SW alternate)."""
    for n, i in enumerate(idxs):
        shift = 0 if n % 2 == 0 else cfg.window_size // 2
        mask = masks[(x.shape[1], x.shape[2])]
        x = _conv_trans_block(p[str(i)], x, cfg.head_dim, cfg.window_size,
                              shift, mask)
    return x


def _conv_transpose_2x(p, x):
    """ConvTranspose2d(k=2, s=2): no kernel overlap → einsum + reshuffle.
    Weight kept in torch (Cin, Cout, 2, 2) layout."""
    w = p["weight"]
    b, h, ww, _ = x.shape
    co = w.shape[1]
    y = jnp.einsum("bhwi,iokl->bhwklo", x, w)
    return y.reshape(b, h, ww, 2, 2, co).transpose(0, 1, 3, 2, 4, 5) \
            .reshape(b, 2 * h, 2 * ww, co)


def apply(params, cfg: SCUNetConfig, x):
    """x: (B,H,W,3) in [0,1] → denoised (B,H,W,3).  H,W must be multiples of
    64 (upscale_image pads)."""
    b, h, w, _ = x.shape
    assert h % 64 == 0 and w % 64 == 0, "pad input to multiple of 64"
    masks = {(hh, ww): shift_attn_mask(hh, ww, cfg.window_size,
                                       cfg.window_size // 2)
             for hh, ww in ((h, w), (h // 2, w // 2), (h // 4, w // 4),
                            (h // 8, w // 8))}

    n = cfg.config
    x1 = conv2d(params["m_head"]["0"], x)
    x2 = _stage(params["m_down1"], x1, range(n[0]), cfg, masks)
    x2 = conv2d(params["m_down1"][str(n[0])], x2, stride=2, padding=0)
    x3 = _stage(params["m_down2"], x2, range(n[1]), cfg, masks)
    x3 = conv2d(params["m_down2"][str(n[1])], x3, stride=2, padding=0)
    x4 = _stage(params["m_down3"], x3, range(n[2]), cfg, masks)
    x4 = conv2d(params["m_down3"][str(n[2])], x4, stride=2, padding=0)
    y = _stage(params["m_body"], x4, range(n[3]), cfg, masks)
    y = _conv_transpose_2x(params["m_up3"]["0"], y + x4)
    y = _stage(params["m_up3"], y, range(1, n[4] + 1), cfg, masks)
    y = _conv_transpose_2x(params["m_up2"]["0"], y + x3)
    y = _stage(params["m_up2"], y, range(1, n[5] + 1), cfg, masks)
    y = _conv_transpose_2x(params["m_up1"]["0"], y + x2)
    y = _stage(params["m_up1"], y, range(1, n[6] + 1), cfg, masks)
    y = conv2d(params["m_tail"]["0"], y + x1)
    return jnp.clip(y, 0.0, 1.0)


# --------------------------------------------------------------------------
# loading
# --------------------------------------------------------------------------

def derive_scunet_config(sd: dict) -> SCUNetConfig:
    dim = int(np.asarray(sd["m_head.0.weight"]).shape[0])
    in_nc = int(np.asarray(sd["m_head.0.weight"]).shape[1])

    def stage_blocks(prefix, first=0):
        idx = [int(k.split(".")[1]) for k in sd
               if k.startswith(prefix) and k.endswith("conv1_1.weight")]
        return len(set(idx))

    config = (stage_blocks("m_down1."), stage_blocks("m_down2."),
              stage_blocks("m_down3."), stage_blocks("m_body."),
              stage_blocks("m_up3."), stage_blocks("m_up2."),
              stage_blocks("m_up1."))
    rp = np.asarray(sd["m_down1.0.trans_block.msa.relative_position_params"])
    heads = rp.shape[0] if rp.ndim == 3 else rp.shape[-1]
    head_dim = (dim // 2) // heads
    window = (rp.shape[1] + 1) // 2 if rp.ndim == 3 else \
        (int(round(rp.shape[0] ** 0.5)) + 1) // 2
    return SCUNetConfig(dim=dim, config=config, head_dim=head_dim,
                        window_size=window, in_nc=in_nc)


def convert_scunet(sd: dict):
    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.utils.pytree import unflatten

    cfg = derive_scunet_config(sd)
    w = cfg.window_size
    flat = {}
    for k, v in sd.items():
        arr = np.asarray(v)
        if k.endswith("relative_position_params"):
            # stored flat ((2w-1)², heads) or pre-shaped (heads, 2w-1, 2w-1)
            if arr.ndim == 2:
                arr = arr.reshape(2 * w - 1, 2 * w - 1, -1).transpose(2, 0, 1)
            flat[k] = np.ascontiguousarray(arr)
            continue
        if ".weight" in k and arr.ndim == 4 and "m_up" in k \
                and k.split(".")[1] == "0":
            flat[k] = arr   # ConvTranspose2d stays (Cin, Cout, kh, kw)
            continue
        flat[k] = convert_leaf(k, arr)
    return unflatten(flat), cfg


def load_scunet(path: str):
    if path.endswith(".safetensors"):
        from sdwebui_tpu.loader.safetensors_io import read_state_dict

        sd = read_state_dict(path)
    else:
        from sdwebui_tpu.loader.torch_ckpt import load_torch_checkpoint

        sd = load_torch_checkpoint(path)
    tree, cfg = convert_scunet(sd)
    return jax.device_put(tree), cfg


def init_params(cfg: SCUNetConfig, seed: int = 0):
    """Tiny random SCUNet for tests."""
    from sdwebui_tpu.models.init_utils import HostInit

    ini = HostInit(seed)
    f32 = jnp.float32
    w = cfg.window_size

    def ctb(dim):
        half = dim // 2
        heads = half // cfg.head_dim
        return {
            "conv1_1": ini.conv(1, 1, dim, dim, f32),
            "conv1_2": ini.conv(1, 1, dim, dim, f32),
            "conv_block": {"0": {"weight": ini.conv(3, 3, half, half, f32)["weight"]},
                           "2": {"weight": ini.conv(3, 3, half, half, f32)["weight"]}},
            "trans_block": {
                "ln1": ini.norm(half, f32), "ln2": ini.norm(half, f32),
                "msa": {
                    "embedding_layer": ini.linear(half, 3 * half, f32),
                    "linear": ini.linear(half, half, f32),
                    "relative_position_params":
                        ini._normal((heads, 2 * w - 1, 2 * w - 1), 0.02, f32),
                },
                "mlp": {"0": ini.linear(half, 4 * half, f32),
                        "2": ini.linear(4 * half, half, f32)},
            },
        }

    d = cfg.dim
    n = cfg.config
    params = {
        "m_head": {"0": {"weight": ini.conv(3, 3, cfg.in_nc, d, f32)["weight"]}},
        "m_down1": {**{str(i): ctb(d) for i in range(n[0])},
                    str(n[0]): {"weight": ini.conv(2, 2, d, 2 * d, f32)["weight"]}},
        "m_down2": {**{str(i): ctb(2 * d) for i in range(n[1])},
                    str(n[1]): {"weight": ini.conv(2, 2, 2 * d, 4 * d, f32)["weight"]}},
        "m_down3": {**{str(i): ctb(4 * d) for i in range(n[2])},
                    str(n[2]): {"weight": ini.conv(2, 2, 4 * d, 8 * d, f32)["weight"]}},
        "m_body": {str(i): ctb(8 * d) for i in range(n[3])},
        "m_up3": {"0": {"weight": ini._normal((8 * d, 4 * d, 2, 2), 0.05, f32)},
                  **{str(i + 1): ctb(4 * d) for i in range(n[4])}},
        "m_up2": {"0": {"weight": ini._normal((4 * d, 2 * d, 2, 2), 0.05, f32)},
                  **{str(i + 1): ctb(2 * d) for i in range(n[5])}},
        "m_up1": {"0": {"weight": ini._normal((2 * d, d, 2, 2), 0.05, f32)},
                  **{str(i + 1): ctb(d) for i in range(n[6])}},
        "m_tail": {"0": {"weight": ini.conv(3, 3, d, cfg.in_nc, f32)["weight"]}},
    }
    return params


# --------------------------------------------------------------------------
# tiled inference + registration
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def _apply_batch(params, cfg, tiles):
    return apply(params, cfg, tiles)


def denoise_image(params, cfg: SCUNetConfig, image: Image.Image,
                  tile: int = 256, overlap: int = 8) -> Image.Image:
    """Tiled 1x denoise, all tiles in one batched device call (the webui's
    ScuNET upscaler runs scale=1 and lets Lanczos do the resizing)."""
    from sdwebui_tpu.utils.images import combine_grid, split_grid

    img = image.convert("RGB")

    def run(arr):
        h, w = arr.shape[1:3]
        ph = (-h) % 64
        pw = (-w) % 64
        if ph or pw:
            arr = np.pad(arr, ((0, 0), (0, ph), (0, pw), (0, 0)), "reflect")
        out = np.asarray(_apply_batch(params, cfg, jnp.asarray(arr)))
        return out[:, :h, :w]

    if img.width <= tile and img.height <= tile:
        arr = np.asarray(img, np.float32)[None] / 255.0
        out = run(arr)[0]
        return Image.fromarray((np.clip(out, 0, 1) * 255 + 0.5).astype(np.uint8))

    grid = split_grid(img, tile, tile, overlap)
    tiles = [t for _, _, row in grid.tiles for _, _, t in row]
    arr = np.stack([np.asarray(t, np.float32) / 255.0 for t in tiles])
    outs = (np.clip(run(arr), 0, 1) * 255 + 0.5).astype(np.uint8)
    i = 0
    for y, hh, row in grid.tiles:
        for j, (xx, ww, _) in enumerate(row):
            row[j] = [xx, ww, Image.fromarray(outs[i])]
            i += 1
    return combine_grid(grid)


def register_scunet_dir(dirs=("models/ScuNET",)):
    """Scan model dirs, register each file as a (denoising) upscaler."""
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
                        cache["params"], cache["cfg"] = load_scunet(p)
                    return denoise_image(cache["params"], cache["cfg"], image)

                return fn_

            # default_scale=1: denoiser — upscale() falls through to Lanczos
            register_upscaler(name, make_fn(), default_scale=1)
            found.append(name)
    return found

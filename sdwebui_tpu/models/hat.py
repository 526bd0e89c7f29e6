"""HAT super-resolution (Hybrid Attention Transformer, Chen et al. 2023) —
NHWC JAX port.

The reference loads HAT checkpoints through spandrel into its upscaler list
(modules/upscaler.py; arch = official HAT release: window attention + channel
-attention conv branch per block, one overlapping cross-attention block per
group, pixelshuffle upsampler).  Shares the windowing design of
models/swinir.py: all windows ride one batched matmul, masks/indices are
host-precomputed constants, tiles batch into a single device call.

Param tree mirrors the checkpoint keys:

    conv_first
    layers.{i}.residual_group.blocks.{j}.{norm1,attn,conv_block,norm2,mlp}
    layers.{i}.residual_group.overlap_attn.{norm1,qkv,relative_position_bias_table,proj,norm2,mlp}
    layers.{i}.conv
    norm / conv_after_body / conv_before_upsample / upsample / conv_last
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from sdwebui_tpu.models.layers import conv2d
from sdwebui_tpu.models.swinir import (
    _linear, _pixel_shuffle, _window_partition, _window_reverse,
    relative_position_index, shift_attn_mask,
)
from sdwebui_tpu.ops.norms import layer_norm

_RGB_MEAN = np.asarray([0.4488, 0.4371, 0.4040], np.float32)


@dataclasses.dataclass(frozen=True)
class HATConfig:
    embed_dim: int = 180
    depths: tuple = (6, 6, 6, 6, 6, 6)
    num_heads: tuple = (6, 6, 6, 6, 6, 6)
    window_size: int = 16
    overlap_ratio: float = 0.5
    compress_ratio: int = 3
    squeeze_factor: int = 16
    conv_scale: float = 0.01
    mlp_ratio: float = 2.0
    scale: int = 4
    in_chans: int = 3
    img_range: float = 1.0

    @property
    def overlap_win(self) -> int:
        return self.window_size + int(self.overlap_ratio * self.window_size)


# --------------------------------------------------------------------------
# host-precomputed indices
# --------------------------------------------------------------------------

def rpi_oca(ws: int, owin: int) -> np.ndarray:
    """(ws², owin²) lookup into the ((ws+owin-1)², heads) OCA bias table."""
    co = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    co = co.reshape(2, -1)                                   # (2, ws²)
    ce = np.stack(np.meshgrid(np.arange(owin), np.arange(owin), indexing="ij"))
    ce = ce.reshape(2, -1)                                   # (2, owin²)
    rel = ce[:, None, :] - co[:, :, None]                    # (2, ws², owin²)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += ws - 1
    rel[..., 1] += ws - 1
    rel[..., 0] *= ws + owin - 1
    return rel.sum(-1)


# --------------------------------------------------------------------------
# blocks
# --------------------------------------------------------------------------

def _channel_attention(p, x, ):
    """ChannelAttention: squeeze (global mean) → 1x1 convs → sigmoid gate."""
    pooled = x.mean(axis=(1, 2), keepdims=True)
    a = conv2d(p["attention"]["1"], pooled, padding=0)
    a = conv2d(p["attention"]["3"], jax.nn.relu(a), padding=0)
    return x * jax.nn.sigmoid(a)


def _cab(p, x):
    """conv → GELU → conv → channel attention (the HAB conv branch)."""
    h = conv2d(p["cab"]["0"], x)
    h = conv2d(p["cab"]["2"], jax.nn.gelu(h, approximate=False))
    return _channel_attention(p["cab"]["3"], h)


def _window_attention(p, x, num_heads: int, rpi: np.ndarray, mask=None):
    """Same math as swinir._window_attention; HAT's attn stores qkv with
    bias and a (2w-1)², heads bias table."""
    b_, n, c = x.shape
    d = c // num_heads
    qkv = _linear(p["qkv"], x).reshape(b_, n, 3, num_heads, d)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    attn = (q * (d ** -0.5)) @ k.transpose(0, 1, 3, 2)
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


def _hab(p, t, hh, ww, cfg: HATConfig, heads, shift, rpi, mask):
    b, _, c = t.shape
    win = cfg.window_size
    shortcut = t
    x = layer_norm(t, p["norm1"]["weight"], p["norm1"]["bias"])
    img = x.reshape(b, hh, ww, c)
    conv_x = _cab(p["conv_block"], img).reshape(b, hh * ww, c)
    if shift > 0:
        img = jnp.roll(img, (-shift, -shift), axis=(1, 2))
    wins = _window_partition(img, win)
    wins = _window_attention(p["attn"], wins, heads, rpi,
                             mask if shift > 0 else None)
    img = _window_reverse(wins, win, b, hh, ww)
    if shift > 0:
        img = jnp.roll(img, (shift, shift), axis=(1, 2))
    t = shortcut + img.reshape(b, hh * ww, c) + conv_x * cfg.conv_scale
    y = layer_norm(t, p["norm2"]["weight"], p["norm2"]["bias"])
    y = _linear(p["mlp"]["fc2"], jax.nn.gelu(_linear(p["mlp"]["fc1"], y),
                                             approximate=False))
    return t + y


def _unfold_overlap(img, win: int, owin: int):
    """(B,H,W,C) → (B·nW, owin², C): overlapping owin×owin patches at
    stride win (torch F.unfold with padding (owin-win)//2), via two static
    gathers."""
    b, hh, ww, c = img.shape
    pad = (owin - win) // 2
    xp = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    nh, nw = hh // win, ww // win
    hidx = np.arange(nh)[:, None] * win + np.arange(owin)[None, :]
    widx = np.arange(nw)[:, None] * win + np.arange(owin)[None, :]
    t = xp[:, jnp.asarray(hidx.reshape(-1))]          # (B, nh·owin, Wp, C)
    t = t.reshape(b, nh, owin, xp.shape[2], c)
    t = t[:, :, :, jnp.asarray(widx.reshape(-1))]     # (B, nh, owin, nw·owin, C)
    t = t.reshape(b, nh, owin, nw, owin, c)
    return t.transpose(0, 1, 3, 2, 4, 5).reshape(b * nh * nw, owin * owin, c)


def _ocab(p, t, hh, ww, cfg: HATConfig, heads, rpi):
    b, _, c = t.shape
    win, owin = cfg.window_size, cfg.overlap_win
    d = c // heads
    shortcut = t
    x = layer_norm(t, p["norm1"]["weight"], p["norm1"]["bias"])
    qkv = _linear(p["qkv"], x).reshape(b, hh, ww, 3, c)
    q = qkv[..., 0, :]
    kv = qkv[..., 1:, :]                                  # (B,H,W,2,C)
    qw = _window_partition(q, win)                        # (B·nW, win², C)
    kvw = _unfold_overlap(kv.reshape(b, hh, ww, 2 * c), win, owin)
    kw, vw = kvw[..., :c], kvw[..., c:]
    bq = qw.shape[0]
    nq, nk = win * win, owin * owin
    qh = qw.reshape(bq, nq, heads, d).transpose(0, 2, 1, 3)
    kh = kw.reshape(bq, nk, heads, d).transpose(0, 2, 1, 3)
    vh = vw.reshape(bq, nk, heads, d).transpose(0, 2, 1, 3)
    attn = (qh * (d ** -0.5)) @ kh.transpose(0, 1, 3, 2)
    bias = p["relative_position_bias_table"][jnp.asarray(rpi.reshape(-1))]
    attn = attn + bias.reshape(nq, nk, heads).transpose(2, 0, 1)[None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ vh).transpose(0, 2, 1, 3).reshape(bq, nq, c)
    out = _window_reverse(out, win, b, hh, ww).reshape(b, hh * ww, c)
    t = shortcut + _linear(p["proj"], out)
    y = layer_norm(t, p["norm2"]["weight"], p["norm2"]["bias"])
    y = _linear(p["mlp"]["fc2"], jax.nn.gelu(_linear(p["mlp"]["fc1"], y),
                                             approximate=False))
    return t + y


def _rhag(p, t, hh, ww, cfg: HATConfig, heads, rpi_sa, rpi_o, mask):
    b, _, c = t.shape
    tin = t
    blocks = p["residual_group"]["blocks"]
    for j in range(len(blocks)):
        shift = 0 if j % 2 == 0 else cfg.window_size // 2
        t = _hab(blocks[str(j)], t, hh, ww, cfg, heads, shift, rpi_sa, mask)
    t = _ocab(p["residual_group"]["overlap_attn"], t, hh, ww, cfg, heads,
              rpi_o)
    x = conv2d(p["conv"], t.reshape(b, hh, ww, c))
    return x.reshape(b, hh * ww, c) + tin


def apply(params, cfg: HATConfig, x):
    """x: (B,H,W,3) in [0,1] → (B, scale·H, scale·W, 3); H, W must be
    multiples of window_size (upscale_image pads with reflect)."""
    b, h, w, _ = x.shape
    win = cfg.window_size
    assert h % win == 0 and w % win == 0, "pad input to window multiple"
    rpi_sa = relative_position_index(win)
    rpi_o = rpi_oca(win, cfg.overlap_win)
    mask = shift_attn_mask(h, w, win, win // 2)

    mean = jnp.asarray(_RGB_MEAN if cfg.in_chans == 3 else [0.5])
    x = (x - mean) * cfg.img_range
    feat = conv2d(params["conv_first"], x)

    t = feat.reshape(b, h * w, cfg.embed_dim)
    for i in range(len(cfg.depths)):
        t = _rhag(params["layers"][str(i)], t, h, w, cfg, cfg.num_heads[i],
                  rpi_sa, rpi_o, mask)
    t = layer_norm(t, params["norm"]["weight"], params["norm"]["bias"])
    body = t.reshape(b, h, w, cfg.embed_dim)
    feat = conv2d(params["conv_after_body"], body) + feat

    feat = jax.nn.leaky_relu(conv2d(params["conv_before_upsample"], feat),
                             0.01)
    s = cfg.scale
    k = 0
    while s > 1:
        r = 3 if s % 3 == 0 else 2
        feat = _pixel_shuffle(conv2d(params["upsample"][str(k)], feat), r)
        s //= r
        k += 2
    out = conv2d(params["conv_last"], feat)
    out = out / cfg.img_range + mean
    return jnp.clip(out, 0.0, 1.0)


# --------------------------------------------------------------------------
# loading / config derivation
# --------------------------------------------------------------------------

def derive_hat_config(sd: dict) -> HATConfig:
    if any(k.startswith("params_ema.") for k in sd):
        sd = {k[len("params_ema."):]: v for k, v in sd.items()
              if k.startswith("params_ema.")}
    elif any(k.startswith("params.") for k in sd):
        sd = {k[len("params."):]: v for k, v in sd.items()
              if k.startswith("params.")}
    embed = int(sd["conv_first.weight"].shape[0])
    in_chans = int(sd["conv_first.weight"].shape[1])
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("layers."))
    depths, heads = [], []
    for i in range(n_layers):
        pre = f"layers.{i}.residual_group.blocks."
        depths.append(1 + max(int(k[len(pre):].split(".")[0])
                              for k in sd if k.startswith(pre)))
        heads.append(int(sd[f"layers.{i}.residual_group.blocks.0.attn."
                           f"relative_position_bias_table"].shape[1]))
    tbl = sd["layers.0.residual_group.blocks.0.attn.relative_position_bias_table"]
    win = (int(np.sqrt(tbl.shape[0])) + 1) // 2
    otbl = sd["layers.0.residual_group.overlap_attn.relative_position_bias_table"]
    owin = int(np.sqrt(otbl.shape[0])) + 1 - win
    compress = embed // int(
        sd["layers.0.residual_group.blocks.0.conv_block.cab.0.weight"].shape[0])
    squeeze = embed // int(
        sd["layers.0.residual_group.blocks.0.conv_block.cab.3.attention.1.weight"].shape[0])
    mlp_ratio = sd["layers.0.residual_group.blocks.0.mlp.fc1.weight"].shape[0] / embed
    # scale from the pixelshuffle conv ladder
    scale = 1
    k = 0
    while f"upsample.{k}.weight" in sd:
        r2 = int(sd[f"upsample.{k}.weight"].shape[0]) // embed
        scale *= {4: 2, 9: 3}.get(r2, 2)
        k += 2
    return HATConfig(embed_dim=embed, depths=tuple(depths),
                     num_heads=tuple(heads), window_size=win,
                     overlap_ratio=(owin - win) / win,
                     compress_ratio=compress, squeeze_factor=squeeze,
                     mlp_ratio=mlp_ratio, scale=scale, in_chans=in_chans)


def convert_hat(sd: dict):
    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.utils.pytree import unflatten

    for prefix in ("params_ema.", "params."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()
                  if k.startswith(prefix)}
            break
    cfg = derive_hat_config(sd)
    flat = {}
    for k, v in sd.items():
        if k.endswith("attn_mask") or k.endswith("relative_position_index") \
                or k.endswith("rpi_sa") or k.endswith("rpi_oca"):
            continue    # recomputed per input shape
        flat[k] = convert_leaf(k, np.ascontiguousarray(v))
    return unflatten(flat), cfg


def load_hat(path: str):
    from sdwebui_tpu.loader.load import read_checkpoint

    return convert_hat(read_checkpoint(path))


def init_params(cfg: HATConfig, seed: int = 0):
    rng = np.random.RandomState(seed)
    f32 = np.float32
    e = cfg.embed_dim

    def conv(cin, cout, k=3):
        return {"weight": (rng.randn(k, k, cin, cout) * 0.05).astype(f32),
                "bias": np.zeros(cout, f32)}

    def lin(cin, cout):
        return {"weight": (rng.randn(cin, cout) * 0.05).astype(f32),
                "bias": np.zeros(cout, f32)}

    def norm():
        return {"weight": np.ones(e, f32), "bias": np.zeros(e, f32)}

    def hab(heads):
        w2 = (2 * cfg.window_size - 1) ** 2
        return {
            "norm1": norm(), "norm2": norm(),
            "attn": {"qkv": lin(e, 3 * e), "proj": lin(e, e),
                     "relative_position_bias_table":
                         (rng.randn(w2, heads) * 0.02).astype(f32)},
            "conv_block": {"cab": {
                "0": conv(e, e // cfg.compress_ratio),
                "2": conv(e // cfg.compress_ratio, e),
                "3": {"attention": {
                    "1": conv(e, e // cfg.squeeze_factor, 1),
                    "3": conv(e // cfg.squeeze_factor, e, 1)}}}},
            "mlp": {"fc1": lin(e, int(e * cfg.mlp_ratio)),
                    "fc2": lin(int(e * cfg.mlp_ratio), e)},
        }

    def ocab(heads):
        t = (cfg.window_size + cfg.overlap_win - 1) ** 2
        return {"norm1": norm(), "norm2": norm(),
                "qkv": lin(e, 3 * e), "proj": lin(e, e),
                "relative_position_bias_table":
                    (rng.randn(t, heads) * 0.02).astype(f32),
                "mlp": {"fc1": lin(e, int(e * cfg.mlp_ratio)),
                        "fc2": lin(int(e * cfg.mlp_ratio), e)}}

    layers = {}
    for i, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
        layers[str(i)] = {
            "residual_group": {
                "blocks": {str(j): hab(heads) for j in range(depth)},
                "overlap_attn": ocab(heads)},
            "conv": conv(e, e)}

    upsample = {}
    s, k = cfg.scale, 0
    while s > 1:
        r = 3 if s % 3 == 0 else 2
        upsample[str(k)] = conv(e, e * r * r)
        s //= r
        k += 2
    return {
        "conv_first": conv(cfg.in_chans, e),
        "layers": layers,
        "norm": norm(),
        "conv_after_body": conv(e, e),
        "conv_before_upsample": conv(e, e),
        "upsample": upsample,
        "conv_last": conv(e, cfg.in_chans),
    }


# --------------------------------------------------------------------------
# tiled inference + upscaler registration
# --------------------------------------------------------------------------

import functools


@functools.partial(jax.jit, static_argnames=("cfg",))
def _apply_batch(params, cfg, x):
    return apply(params, cfg, x)


def upscale_image(params, cfg: HATConfig, image: Image.Image,
                  tile: int | None = None, overlap: int | None = None) -> Image.Image:
    from sdwebui_tpu.postprocessing.upscalers import tiled_sr_upscale

    return tiled_sr_upscale(
        lambda arr: _apply_batch(params, cfg, jnp.asarray(arr)),
        cfg.scale, cfg.window_size, image, tile=tile, overlap=overlap)


def register_hat_dir(dirs=("models/HAT",)):
    """Discover HAT checkpoints and add them to the upscaler registry."""
    import os

    from sdwebui_tpu.postprocessing.upscalers import register_upscaler

    found = []
    for d in dirs:
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            if not fn.endswith((".pth", ".pt", ".safetensors")):
                continue
            path = os.path.join(d, fn)
            name = os.path.splitext(fn)[0]
            state = {}

            def make_fn(p=path, state=state):
                def fn_(image, scale):
                    if "m" not in state:
                        state["m"] = load_hat(p)
                    params, cfg = state["m"]
                    return upscale_image(params, cfg, image)
                return fn_

            register_upscaler(name, make_fn(), default_scale=4)
            found.append(name)
    return found

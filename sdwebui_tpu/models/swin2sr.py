"""Swin2SR super-resolution (SwinV2 attention: cosine similarity + log-CPB)
— NHWC JAX port.

The reference loads Swin2SR checkpoints through spandrel (the SwinIR
extension's v2 sibling).  Blocks are SwinV2: post-norm residuals, cosine
attention with a clamped learned logit scale, and a continuous relative
position bias MLP over log-spaced coordinates.  Windowing infrastructure is
shared with models/swinir.py.

Two checkpoint layouts load:
- original repo keys (`conv_first`, `layers.{i}.residual_group.blocks.{j}.
  attn.{qkv,q_bias,v_bias,logit_scale,cpb_mlp...}`) — spandrel's source
- HF transformers keys (`swin2sr.*`, split q/k/v) — translated in
  convert_swin2sr; HF also inserts 1x1 patch-projection convs that the
  original lacks, so those are applied only when present.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from sdwebui_tpu.models.layers import conv2d, upsample_nearest_2x
from sdwebui_tpu.models.swinir import (
    _linear, _pixel_shuffle, _window_partition, _window_reverse,
    relative_position_index, shift_attn_mask,
)
from sdwebui_tpu.ops.norms import layer_norm

_RGB_MEAN = np.asarray([0.4488, 0.4371, 0.4040], np.float32)


@dataclasses.dataclass(frozen=True)
class Swin2SRConfig:
    embed_dim: int = 180
    depths: tuple = (6, 6, 6, 6, 6, 6)
    num_heads: tuple = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    upsampler: str = "pixelshuffle"   # | pixelshuffledirect | nearest+conv
    scale: int = 4
    in_chans: int = 3
    img_range: float = 1.0


def cpb_coords_table(w: int) -> np.ndarray:
    """SwinV2 log-spaced continuous-position-bias inputs: (  (2w-1)², 2 )."""
    r = np.arange(-(w - 1), w, dtype=np.float32)
    table = np.stack(np.meshgrid(r, r, indexing="ij"), axis=-1)  # (2w-1,2w-1,2)
    table = table / max(w - 1, 1)
    table = table * 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.reshape(-1, 2)


def _v2_window_attention(p, x, num_heads: int, rpi, cpb_in, mask=None):
    """Cosine attention + CPB-MLP bias. x: (B_, N, C)."""
    b_, n, c = x.shape
    d = c // num_heads
    w = p["qkv"]["weight"]                       # (C, 3C) converted layout
    qkv = x @ w.astype(x.dtype)
    if "q_bias" in p:
        bias = jnp.concatenate([
            p["q_bias"], jnp.zeros_like(p["q_bias"]), p["v_bias"]]).astype(x.dtype)
        qkv = qkv + bias
    qkv = qkv.reshape(b_, n, 3, num_heads, d)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    qn = q / (jnp.linalg.norm(q.astype(jnp.float32), axis=-1,
                              keepdims=True) + 1e-12).astype(q.dtype)
    kn = k / (jnp.linalg.norm(k.astype(jnp.float32), axis=-1,
                              keepdims=True) + 1e-12).astype(k.dtype)
    attn = qn @ kn.transpose(0, 1, 3, 2)
    scale = jnp.exp(jnp.minimum(p["logit_scale"].astype(jnp.float32),
                                np.log(100.0))).reshape(1, num_heads, 1, 1)
    attn = attn.astype(jnp.float32) * scale

    mlp = p["cpb_mlp"]
    h = jnp.maximum(cpb_in @ mlp["0"]["weight"] + mlp["0"]["bias"], 0.0)
    table = h @ mlp["2"]["weight"]               # ((2w-1)², heads)
    bias = table[jnp.asarray(rpi.reshape(-1))].reshape(n, n, num_heads)
    bias = 16.0 * jax.nn.sigmoid(bias.transpose(2, 0, 1))
    attn = attn + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b_ // nw, nw, num_heads, n, n) \
            + jnp.asarray(mask)[None, :, None]
        attn = attn.reshape(b_, num_heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b_, n, c)
    return _linear(p["proj"], out)


def _v2_block(p, t, hh, ww, heads, window, shift, rpi, cpb_in, mask):
    """SwinV2 post-norm residual block."""
    b, _, c = t.shape
    x = t.reshape(b, hh, ww, c)
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    wins = _window_partition(x, window)
    wins = _v2_window_attention(p["attn"], wins, heads, rpi, cpb_in,
                                mask if shift > 0 else None)
    x = _window_reverse(wins, window, b, hh, ww)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    t = t + layer_norm(x.reshape(b, hh * ww, c),
                       p["norm1"]["weight"], p["norm1"]["bias"])
    y = _linear(p["mlp"]["fc2"], jax.nn.gelu(_linear(p["mlp"]["fc1"], t),
                                             approximate=False))
    return t + layer_norm(y, p["norm2"]["weight"], p["norm2"]["bias"])


def _stage(p, t, hh, ww, heads, window, rpi, cpb_in, mask):
    b, _, c = t.shape
    tin = t
    blocks = p["residual_group"]["blocks"]
    for j in range(len(blocks)):
        shift = 0 if j % 2 == 0 else window // 2
        t = _v2_block(blocks[str(j)], t, hh, ww, heads, window, shift, rpi,
                      cpb_in, mask)
    x = conv2d(p["conv"], t.reshape(b, hh, ww, c))
    if "patch_embed" in p:      # HF inserts a learnable 1x1 after the conv
        x = conv2d(p["patch_embed"]["projection"], x, padding=0)
    return x.reshape(b, hh * ww, c) + tin


def apply(params, cfg: Swin2SRConfig, x):
    """x: (B,H,W,3) in [0,1] → (B, scale·H, scale·W, 3); H, W multiples of
    window_size."""
    b, h, w, _ = x.shape
    win = cfg.window_size
    assert h % win == 0 and w % win == 0, "pad input to window multiple"
    rpi = relative_position_index(win)
    cpb_in = jnp.asarray(cpb_coords_table(win))
    mask = shift_attn_mask(h, w, win, win // 2)

    mean = jnp.asarray(_RGB_MEAN if cfg.in_chans == 3 else [0.5])
    x = (x - mean) * cfg.img_range
    feat = conv2d(params["conv_first"], x)
    body = feat
    if "patch_embed" in params:
        pe = params["patch_embed"]
        if "projection" in pe:
            body = conv2d(pe["projection"], body, padding=0)
        t = body.reshape(b, h * w, cfg.embed_dim)
        if "norm" in pe:
            t = layer_norm(t, pe["norm"]["weight"], pe["norm"]["bias"])
    else:
        t = body.reshape(b, h * w, cfg.embed_dim)

    for i in range(len(cfg.depths)):
        t = _stage(params["layers"][str(i)], t, h, w, cfg.num_heads[i], win,
                   rpi, cpb_in, mask)
    t = layer_norm(t, params["norm"]["weight"], params["norm"]["bias"])
    body = t.reshape(b, h, w, cfg.embed_dim)
    feat = conv2d(params["conv_after_body"], body) + feat

    lrelu = lambda v: jax.nn.leaky_relu(v, 0.01)
    if cfg.upsampler == "pixelshuffle":
        feat = lrelu(conv2d(params["conv_before_upsample"], feat))
        s, k = cfg.scale, 0
        while s > 1:
            r = 3 if s % 3 == 0 else 2
            feat = _pixel_shuffle(conv2d(params["upsample"][str(k)], feat), r)
            s //= r
            k += 2
        out = conv2d(params["conv_last"], feat)
    elif cfg.upsampler == "pixelshuffledirect":
        out = _pixel_shuffle(conv2d(params["upsample"]["0"], feat), cfg.scale)
    elif cfg.upsampler == "nearest+conv":
        feat = lrelu(conv2d(params["conv_before_upsample"], feat))
        feat = lrelu(conv2d(params["conv_up1"], upsample_nearest_2x(feat)))
        if cfg.scale == 4:
            feat = lrelu(conv2d(params["conv_up2"], upsample_nearest_2x(feat)))
        out = conv2d(params["conv_last"], lrelu(conv2d(params["conv_hr"], feat)))
    else:
        out = conv2d(params["conv_last"], feat)
    out = out / cfg.img_range + mean
    return jnp.clip(out, 0.0, 1.0)


# --------------------------------------------------------------------------
# loading
# --------------------------------------------------------------------------

_HF_RENAMES = [
    ("swin2sr.first_convolution.", "conv_first."),
    ("swin2sr.embeddings.patch_embeddings.projection.",
     "patch_embed.projection."),
    ("swin2sr.embeddings.patch_embeddings.layernorm.", "patch_embed.norm."),
    ("swin2sr.layernorm.", "norm."),
    ("swin2sr.conv_after_body.", "conv_after_body."),
    ("upsample.conv_before_upsample.", "conv_before_upsample."),
    ("upsample.final_convolution.", "conv_last."),
    ("swin2sr.final_convolution.", "conv_last."),
]


def _hf_to_original(sd: dict) -> dict:
    out = {}
    qkv: dict = {}
    import re

    for k, v in sd.items():
        for a, b in _HF_RENAMES:
            if k.startswith(a):
                k = b + k[len(a):]
                break
        m = re.match(r"upsample\.upsample\.convolution_(\d+)\.(.+)", k)
        if m:
            k = f"upsample.{2 * int(m.group(1))}.{m.group(2)}"
        k = re.sub(r"swin2sr\.encoder\.stages\.(\d+)\.layers\.(\d+)\.",
                   r"layers.\1.residual_group.blocks.\2.", k)
        k = re.sub(r"swin2sr\.encoder\.stages\.(\d+)\.", r"layers.\1.", k)
        k = (k.replace(".attention.self.continuous_position_bias_mlp.",
                       ".attn.cpb_mlp.")
             .replace(".attention.self.logit_scale", ".attn.logit_scale")
             .replace(".attention.output.dense.", ".attn.proj.")
             .replace(".layernorm_before.", ".norm1.")
             .replace(".layernorm_after.", ".norm2.")
             .replace(".intermediate.dense.", ".mlp.fc1.")
             .replace(".output.dense.", ".mlp.fc2.")
             .replace(".patch_embed.projection.", ".patch_embed.projection."))
        m = re.match(r"(.*\.attn)\.attention\.self\.(query|key|value)\.(weight|bias)",
                     k) or re.match(
            r"(.*)\.attention\.self\.(query|key|value)\.(weight|bias)", k)
        if m:
            base = m.group(1) if m.group(1).endswith(".attn") else \
                m.group(1) + ".attn"
            qkv.setdefault(base, {})[(m.group(2), m.group(3))] = np.asarray(v)
            continue
        out[k] = v
    for base, parts in qkv.items():
        out[base + ".qkv.weight"] = np.concatenate(
            [parts[("query", "weight")], parts[("key", "weight")],
             parts[("value", "weight")]], axis=0)
        if ("query", "bias") in parts:
            out[base + ".q_bias"] = parts[("query", "bias")]
            out[base + ".v_bias"] = parts[("value", "bias")]
    return out


def derive_swin2sr_config(sd: dict) -> Swin2SRConfig:
    embed = int(sd["conv_first.weight"].shape[0])
    in_chans = int(sd["conv_first.weight"].shape[1])
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("layers."))
    depths, heads = [], []
    for i in range(n_layers):
        pre = f"layers.{i}.residual_group.blocks."
        depths.append(1 + max(int(k[len(pre):].split(".")[0])
                              for k in sd if k.startswith(pre)))
        heads.append(int(
            sd[f"layers.{i}.residual_group.blocks.0.attn.logit_scale"].shape[0]))
    # window size is not in the weights (CPB is an MLP) — official releases
    # use 8; callers can rebuild the config for other sizes
    win = 8
    mlp_ratio = sd["layers.0.residual_group.blocks.0.mlp.fc1.weight"].shape[0] / embed
    if any(k.startswith("upsample.0.") for k in sd):
        k0 = int(sd["upsample.0.weight"].shape[0])
        if "conv_before_upsample.weight" in sd or \
                "conv_before_upsample.0.weight" in sd:
            upsampler = "pixelshuffle"
            scale, k = 1, 0
            while f"upsample.{k}.weight" in sd:
                r2 = int(sd[f"upsample.{k}.weight"].shape[0])
                base = int(sd[f"upsample.{k}.weight"].shape[1])
                scale *= {4: 2, 9: 3}.get(r2 // base, 2)
                k += 2
        else:
            upsampler = "pixelshuffledirect"
            scale = int(np.sqrt(k0 // in_chans))
    elif "conv_up1.weight" in sd:
        upsampler = "nearest+conv"
        scale = 4 if "conv_up2.weight" in sd else 2
    else:
        upsampler = "none"
        scale = 1
    return Swin2SRConfig(embed_dim=embed, depths=tuple(depths),
                         num_heads=tuple(heads), window_size=win,
                         mlp_ratio=mlp_ratio, upsampler=upsampler,
                         scale=scale, in_chans=in_chans)


def convert_swin2sr(sd: dict):
    from sdwebui_tpu.utils.pytree import unflatten

    if any(k.startswith("params_ema.") or k.startswith("params.") for k in sd):
        for prefix in ("params_ema.", "params."):
            if any(k.startswith(prefix) for k in sd):
                sd = {k[len(prefix):]: v for k, v in sd.items()
                      if k.startswith(prefix)}
                break
    if any(k.startswith("swin2sr.") for k in sd):
        sd = _hf_to_original(sd)
    # original checkpoints may nest conv_before_upsample in a Sequential
    sd = {(k.replace("conv_before_upsample.0.", "conv_before_upsample.")): v
          for k, v in sd.items()}
    cfg = derive_swin2sr_config(sd)
    flat = {}
    for k, v in sd.items():
        if k.endswith("relative_coords_table") \
                or k.endswith("relative_position_index") \
                or k.endswith("attn_mask"):
            continue
        arr = np.ascontiguousarray(v)
        if k.endswith(".weight") and arr.ndim == 4:
            arr = np.ascontiguousarray(np.transpose(arr, (2, 3, 1, 0)))
        elif k.endswith(".weight") and arr.ndim == 2:
            arr = np.ascontiguousarray(arr.T)
        flat[k] = arr
    return unflatten(flat), cfg


def load_swin2sr(path: str):
    from sdwebui_tpu.loader.load import read_checkpoint

    return convert_swin2sr(read_checkpoint(path))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _apply_batch(params, cfg, x):
    return apply(params, cfg, x)


def upscale_image(params, cfg: Swin2SRConfig, image: Image.Image,
                  tile: int | None = None, overlap: int | None = None) -> Image.Image:
    from sdwebui_tpu.postprocessing.upscalers import tiled_sr_upscale

    return tiled_sr_upscale(
        lambda arr: _apply_batch(params, cfg, jnp.asarray(arr)),
        cfg.scale, cfg.window_size, image, tile=tile, overlap=overlap)


def init_params(cfg: Swin2SRConfig, seed: int = 0):
    """Random params in the original key layout (tests)."""
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

    def block(heads):
        return {
            "norm1": norm(), "norm2": norm(),
            "attn": {
                "qkv": {"weight": (rng.randn(e, 3 * e) * 0.05).astype(f32)},
                "q_bias": np.zeros(e, f32), "v_bias": np.zeros(e, f32),
                "logit_scale": (rng.rand(heads, 1, 1).astype(f32)),
                "cpb_mlp": {"0": {"weight": (rng.randn(2, 512) * 0.05).astype(f32),
                                  "bias": np.zeros(512, f32)},
                            "2": {"weight": (rng.randn(512, heads) * 0.05).astype(f32)}},
                "proj": lin(e, e)},
            "mlp": {"fc1": lin(e, int(e * cfg.mlp_ratio)),
                    "fc2": lin(int(e * cfg.mlp_ratio), e)}}

    layers = {}
    for i, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
        layers[str(i)] = {
            "residual_group": {"blocks": {str(j): block(heads)
                                          for j in range(depth)}},
            "conv": conv(e, e)}
    p = {"conv_first": conv(cfg.in_chans, e), "layers": layers,
         "norm": norm(), "conv_after_body": conv(e, e)}
    if cfg.upsampler == "pixelshuffle":
        p["conv_before_upsample"] = conv(e, e)
        ups, s, k = {}, cfg.scale, 0
        cin = e
        while s > 1:
            r = 3 if s % 3 == 0 else 2
            ups[str(k)] = conv(cin, cin * r * r)
            s //= r
            k += 2
        p["upsample"] = ups
        p["conv_last"] = conv(e, cfg.in_chans)
    elif cfg.upsampler == "pixelshuffledirect":
        p["upsample"] = {"0": conv(e, cfg.in_chans * cfg.scale ** 2)}
    else:
        p["conv_last"] = conv(e, cfg.in_chans)
    return p

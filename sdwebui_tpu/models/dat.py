"""DAT super-resolution (Dual Aggregation Transformer, Chen et al.
ICCV 2023) — NHWC JAX port.

The reference loads DAT checkpoints through spandrel into its upscaler list
(modules/upscaler.py; arch = official zhengchen1999/DAT release).  The model
alternates two block types inside each residual group:

  * even blocks — **adaptive spatial attention**: CSWin-style dual-branch
    rectangle-window attention (branch 0 windows (s0,s1), branch 1 windows
    (s1,s0), each on half the channels with half the heads, dynamic position
    bias MLP, swin-style shifted variant on alternating spatial blocks), plus
    a parallel depthwise-conv branch coupled through the Adaptive Interaction
    Module: the conv branch emits a channel map gating the attention branch,
    the attention branch emits a spatial map gating the conv branch;
  * odd blocks — **adaptive channel attention**: Restormer-style transposed
    attention (L2-normalised q/k over the token axis, learned per-head
    temperature) with the same conv branch, interaction maps swapped.

FFN is a spatial-gate feed-forward (SGFN): fc1 → GELU → split channels,
gate one half with a depthwise conv of the LayerNormed other half → fc2.

Param tree mirrors the checkpoint keys (official layout):

    conv_first
    before_RG.1                      (LayerNorm after the rearrange)
    layers.{i}.blocks.{j}.{norm1,attn,norm2,ffn}
      attn.qkv / attn.proj
      attn.attns.{0,1}.pos.{pos_proj,pos1,pos2,pos3}      (spatial blocks)
      attn.temperature                                     (channel blocks)
      attn.dwconv.{0,1} attn.channel_interaction.{1,2,4}
      attn.spatial_interaction.{0,1,3}
      ffn.{fc1,sg.norm,sg.conv,fc2}
    layers.{i}.conv                  (resi '1conv'; '.0/.2/.4' for '3conv')
    norm / conv_after_body
    conv_before_upsample.0 + upsample.{0,2,...} + conv_last   (pixelshuffle)
    upsample.0                                       (pixelshuffledirect)

Shapes are static per (H, W): window indices, dynamic-pos-bias inputs and
shift masks are host-precomputed numpy constants; all windows of a branch
ride one batched matmul (same stance as models/swinir.py).  BatchNorms run
in eval mode from running stats.

NOTE: no DAT oracle ships in this image (no spandrel/official torch code),
so the layout above is reconstructed from the paper + official repo; parity
is tested against an independently written torch twin (tests/test_dat.py)
and config/keys are derived from checkpoint weights at load time.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from sdwebui_tpu.models.layers import conv2d, gelu, linear
from sdwebui_tpu.models.swinir import _pixel_shuffle
from sdwebui_tpu.ops.norms import layer_norm

_RGB_MEAN = np.asarray([0.4488, 0.4371, 0.4040], np.float32)


@dataclasses.dataclass(frozen=True)
class DATConfig:
    embed_dim: int = 180
    depths: tuple = (6, 6, 6, 6, 6, 6)
    num_heads: tuple = (6, 6, 6, 6, 6, 6)
    split_size: tuple = (8, 32)
    expansion_factor: float = 4.0
    scale: int = 4
    in_chans: int = 3
    img_range: float = 1.0
    resi_connection: str = "1conv"       # or "3conv"
    upsampler: str = "pixelshuffle"      # or "pixelshuffledirect"
    num_feat: int = 64

    @property
    def shift_size(self) -> tuple:
        return (self.split_size[0] // 2, self.split_size[1] // 2)


# --------------------------------------------------------------------------
# host-precomputed window constants
# --------------------------------------------------------------------------

def rect_rpi(wh: int, ww: int) -> np.ndarray:
    """(N, N) lookup into the ((2wh-1)·(2ww-1), heads) dynamic bias table."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += wh - 1
    rel[..., 1] += ww - 1
    rel[..., 0] *= 2 * ww - 1
    return rel.sum(-1)


def rect_rpe_biases(wh: int, ww: int) -> np.ndarray:
    """((2wh-1)·(2ww-1), 2) relative-offset inputs to the pos-bias MLP."""
    bh = np.arange(1 - wh, wh)
    bw = np.arange(1 - ww, ww)
    return np.stack(np.meshgrid(bh, bw, indexing="ij")) \
        .reshape(2, -1).T.astype(np.float32)


def rect_shift_mask(hh: int, ww_img: int, wh: int, ww: int,
                    sh: int, sw: int) -> np.ndarray:
    """Swin-style attention mask for rect windows (wh, ww) rolled by
    (sh, sw): (nW, N, N) with -100 across region boundaries."""
    img = np.zeros((hh, ww_img))
    cnt = 0
    for hs in (slice(0, -wh), slice(-wh, -sh), slice(-sh, None)):
        for ws in (slice(0, -ww), slice(-ww, -sw), slice(-sw, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(hh // wh, wh, ww_img // ww, ww) \
        .transpose(0, 2, 1, 3).reshape(-1, wh * ww)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _rect_partition(img, wh: int, ww: int):
    b, hh, www, c = img.shape
    x = img.reshape(b, hh // wh, wh, www // ww, ww, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wh * ww, c)


def _rect_reverse(wins, wh: int, ww: int, b: int, hh: int, www: int):
    c = wins.shape[-1]
    x = wins.reshape(b, hh // wh, www // ww, wh, ww, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, www, c)


# --------------------------------------------------------------------------
# primitive blocks
# --------------------------------------------------------------------------

def _batch_norm(p, x, eps: float = 1e-5):
    """Eval-mode BatchNorm2d from running stats, channel-last."""
    scale = p["weight"] / jnp.sqrt(p["running_var"] + eps)
    return (x - p["running_mean"]) * scale + p["bias"]


def _dwconv3(p, x):
    """Depthwise 3×3 conv, weight already HWIO (kh,kw,1,C)."""
    out = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])
    return out + p["bias"].astype(x.dtype)


def _dwconv_bn_gelu(p, x):
    return gelu(_batch_norm(p["1"], _dwconv3(p["0"], x)))


def _channel_interaction(p, x):
    """AdaptiveAvgPool → 1×1 conv → BN → GELU → 1×1 conv; (B,1,1,C)."""
    h = x.mean(axis=(1, 2), keepdims=True)
    h = conv2d(p["1"], h, padding=0)
    h = gelu(_batch_norm(p["2"], h))
    return conv2d(p["4"], h, padding=0)


def _spatial_interaction(p, x):
    """1×1 conv → BN → GELU → 1×1 conv to a single channel; (B,H,W,1)."""
    h = conv2d(p["0"], x, padding=0)
    h = gelu(_batch_norm(p["1"], h))
    return conv2d(p["3"], h, padding=0)


def _dyn_pos_bias(p, biases):
    """DynamicPosBias MLP: Linear(2→pd) then 3×(LN→ReLU→Linear)."""
    h = linear(p["pos_proj"], jnp.asarray(biases))
    for name in ("pos1", "pos2", "pos3"):
        sub = p[name]
        h = layer_norm(h, sub["0"]["weight"], sub["0"]["bias"])
        h = linear(sub["2"], jax.nn.relu(h))
    return h                                     # (n_offsets, heads_branch)


def _spatial_branch(p, q, k, v, hh, ww_img, wh, ww, heads, mask):
    """One rect-window attention branch on (B,H,W,Cb) q/k/v."""
    b = q.shape[0]
    cb = q.shape[-1]
    d = cb // heads
    n = wh * ww
    qw = _rect_partition(q, wh, ww).reshape(-1, n, heads, d).transpose(0, 2, 1, 3)
    kw = _rect_partition(k, wh, ww).reshape(-1, n, heads, d).transpose(0, 2, 1, 3)
    vw = _rect_partition(v, wh, ww).reshape(-1, n, heads, d).transpose(0, 2, 1, 3)
    attn = (qw * (d ** -0.5)) @ kw.transpose(0, 1, 3, 2)
    bias = _dyn_pos_bias(p["pos"], rect_rpe_biases(wh, ww))
    bias = bias[jnp.asarray(rect_rpi(wh, ww).reshape(-1))] \
        .reshape(n, n, heads).transpose(2, 0, 1)
    attn = attn + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b, nw, heads, n, n) + jnp.asarray(mask)[None, :, None]
        attn = attn.reshape(-1, heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ vw).transpose(0, 2, 1, 3).reshape(-1, n, cb)
    return _rect_reverse(out, wh, ww, b, hh, ww_img)


def _adaptive_spatial_attention(p, x, hh, ww_img, cfg: DATConfig,
                                heads: int, shifted: bool):
    """Dual-branch rect-window attention + depthwise-conv branch coupled by
    the Adaptive Interaction Module (C-map gates attention, S-map gates
    conv)."""
    b, n, c = x.shape
    s0, s1 = cfg.split_size
    sh0, sh1 = cfg.shift_size
    hb = heads // 2
    qkv = linear(p["qkv"], x).reshape(b, hh, ww_img, 3, c)
    q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]

    halves = []
    for idx in range(2):
        sl = slice(0, c // 2) if idx == 0 else slice(c // 2, None)
        wh, ww = (s0, s1) if idx == 0 else (s1, s0)
        rh, rw = (sh0, sh1) if idx == 0 else (sh1, sh0)
        qi, ki, vi = q[..., sl], k[..., sl], v[..., sl]
        if shifted:
            qi, ki, vi = (jnp.roll(t, (-rh, -rw), axis=(1, 2))
                          for t in (qi, ki, vi))
            mask = rect_shift_mask(hh, ww_img, wh, ww, rh, rw)
        else:
            mask = None
        hx = _spatial_branch(p["attns"][str(idx)], qi, ki, vi,
                             hh, ww_img, wh, ww, hb, mask)
        if shifted:
            hx = jnp.roll(hx, (rh, rw), axis=(1, 2))
        halves.append(hx)
    attened = jnp.concatenate(halves, axis=-1).reshape(b, n, c)

    conv_x = _dwconv_bn_gelu(p["dwconv"], v)               # (B,H,W,C)
    channel_map = _channel_interaction(
        p["channel_interaction"], conv_x).reshape(b, 1, c)
    spatial_map = _spatial_interaction(
        p["spatial_interaction"], attened.reshape(b, hh, ww_img, c))
    attened = attened * jax.nn.sigmoid(channel_map)
    conv_x = conv_x * jax.nn.sigmoid(spatial_map)
    out = attened + conv_x.reshape(b, n, c)
    return linear(p["proj"], out)


def _adaptive_channel_attention(p, x, hh, ww_img, heads: int):
    """Transposed (channel) attention with normalised q/k + conv branch;
    interaction maps swapped relative to the spatial block."""
    b, n, c = x.shape
    d = c // heads
    qkv = linear(p["qkv"], x).reshape(b, n, 3, heads, d).transpose(2, 0, 3, 4, 1)
    q, k, v = qkv[0], qkv[1], qkv[2]                       # (B,h,d,N)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    attn = (q @ k.transpose(0, 1, 3, 2)) * p["temperature"][None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ v).transpose(0, 3, 1, 2).reshape(b, n, c)

    v_img = v.transpose(0, 3, 1, 2).reshape(b, n, c).reshape(b, hh, ww_img, c)
    conv_x = _dwconv_bn_gelu(p["dwconv"], v_img)
    channel_map = _channel_interaction(
        p["channel_interaction"], out.reshape(b, hh, ww_img, c))
    spatial_map = _spatial_interaction(
        p["spatial_interaction"], conv_x).reshape(b, n, 1)
    out = out * jax.nn.sigmoid(spatial_map)
    conv_x = conv_x * jax.nn.sigmoid(channel_map)
    out = out + conv_x.reshape(b, n, c)
    return linear(p["proj"], out)


def _sgfn(p, x, hh, ww_img):
    """fc1 → GELU → spatial gate (LN + dwconv on half) → fc2."""
    b, n, _ = x.shape
    h = gelu(linear(p["fc1"], x))
    half = h.shape[-1] // 2
    x1, x2 = h[..., :half], h[..., half:]
    x2 = layer_norm(x2, p["sg"]["norm"]["weight"], p["sg"]["norm"]["bias"])
    x2 = _dwconv3(p["sg"]["conv"], x2.reshape(b, hh, ww_img, half))
    return linear(p["fc2"], x1 * x2.reshape(b, n, half))


def _is_shifted(rg_idx: int, b_idx: int) -> bool:
    """Which spatial blocks use the shifted windows (official DAT rule)."""
    return (rg_idx % 2 == 0 and b_idx > 0 and (b_idx - 2) % 4 == 0) or \
        (rg_idx % 2 != 0 and b_idx % 4 == 0)


def _datb(p, x, hh, ww_img, cfg: DATConfig, heads, rg_idx, b_idx):
    h = layer_norm(x, p["norm1"]["weight"], p["norm1"]["bias"])
    if b_idx % 2 == 0:
        h = _adaptive_spatial_attention(p["attn"], h, hh, ww_img, cfg, heads,
                                        _is_shifted(rg_idx, b_idx))
    else:
        h = _adaptive_channel_attention(p["attn"], h, hh, ww_img, heads)
    x = x + h
    y = layer_norm(x, p["norm2"]["weight"], p["norm2"]["bias"])
    return x + _sgfn(p["ffn"], y, hh, ww_img)


def _resi_conv(p, img, kind: str):
    if kind == "1conv":
        return conv2d(p, img)
    h = jax.nn.leaky_relu(conv2d(p["0"], img), 0.2)
    h = jax.nn.leaky_relu(conv2d(p["2"], h, padding=0), 0.2)
    return conv2d(p["4"], h)


def _group(p, x, hh, ww_img, cfg: DATConfig, heads, rg_idx):
    b, n, c = x.shape
    res = x
    for j in range(len(p["blocks"])):
        x = _datb(p["blocks"][str(j)], x, hh, ww_img, cfg, heads, rg_idx, j)
    img = _resi_conv(p["conv"], x.reshape(b, hh, ww_img, c),
                     cfg.resi_connection)
    return img.reshape(b, n, c) + res


def apply(params, cfg: DATConfig, x):
    """x: (B,H,W,3) in [0,1] → (B, scale·H, scale·W, 3); H, W must be
    multiples of max(split_size) (upscale_image pads with reflect)."""
    b, h, w, _ = x.shape
    ms = max(cfg.split_size)
    assert h % ms == 0 and w % ms == 0, "pad input to split-size multiple"

    mean = jnp.asarray(_RGB_MEAN if cfg.in_chans == 3 else [0.5])
    x = (x - mean) * cfg.img_range
    feat = conv2d(params["conv_first"], x)

    t = feat.reshape(b, h * w, cfg.embed_dim)
    t = layer_norm(t, params["before_RG"]["1"]["weight"],
                   params["before_RG"]["1"]["bias"])
    for i in range(len(cfg.depths)):
        t = _group(params["layers"][str(i)], t, h, w, cfg, cfg.num_heads[i], i)
    t = layer_norm(t, params["norm"]["weight"], params["norm"]["bias"])
    body = t.reshape(b, h, w, cfg.embed_dim)
    feat = _resi_conv(params["conv_after_body"], body, cfg.resi_connection) \
        + feat

    if cfg.upsampler == "pixelshuffle":
        feat = jax.nn.leaky_relu(
            conv2d(params["conv_before_upsample"]["0"], feat), 0.01)
        s, k = cfg.scale, 0
        while s > 1:
            r = 3 if s % 3 == 0 else 2
            feat = _pixel_shuffle(conv2d(params["upsample"][str(k)], feat), r)
            s //= r
            k += 2
        out = conv2d(params["conv_last"], feat)
    else:                                          # pixelshuffledirect
        out = _pixel_shuffle(conv2d(params["upsample"]["0"], feat), cfg.scale)
    out = out / cfg.img_range + mean
    return jnp.clip(out, 0.0, 1.0)


# --------------------------------------------------------------------------
# loading / config derivation
# --------------------------------------------------------------------------

def _split_from_buffers(sd: dict) -> tuple:
    """Recover (s0, s1) from the branch-0 pos-bias buffers: rpe_biases has
    (2s0-1)(2s1-1) rows, relative_position_index is (s0·s1)², and the stored
    index contents disambiguate (s0,s1) from (s1,s0)."""
    key = next((k for k in sd if k.endswith("attn.attns.0.rpe_biases")), None)
    idx_key = next((k for k in sd
                    if k.endswith("attn.attns.0.relative_position_index")),
                   None)
    if key is None or idx_key is None:
        return (8, 32)          # official DAT/DAT-2/DAT-light default
    m = int(np.asarray(sd[key]).shape[0])
    idx = np.asarray(sd[idx_key])
    n = int(round(np.sqrt(idx.size)))
    for s0 in range(1, n + 1):
        if n % s0:
            continue
        s1 = n // s0
        if (2 * s0 - 1) * (2 * s1 - 1) != m:
            continue
        if np.array_equal(rect_rpi(s0, s1), idx.reshape(n, n)):
            return (s0, s1)
    return (8, 32)


def derive_dat_config(sd: dict) -> DATConfig:
    if any(k.startswith("params_ema.") for k in sd):
        sd = {k[len("params_ema."):]: v for k, v in sd.items()
              if k.startswith("params_ema.")}
    elif any(k.startswith("params.") for k in sd):
        sd = {k[len("params."):]: v for k, v in sd.items()
              if k.startswith("params.")}
    embed = int(sd["conv_first.weight"].shape[0])
    in_chans = int(sd["conv_first.weight"].shape[1])
    n_groups = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("layers."))
    depths, heads = [], []
    for i in range(n_groups):
        pre = f"layers.{i}.blocks."
        depth = 1 + max(int(k[len(pre):].split(".")[0])
                        for k in sd if k.startswith(pre))
        depths.append(depth)
        tkey = f"layers.{i}.blocks.1.attn.temperature"
        if tkey in sd:
            heads.append(int(sd[tkey].shape[0]))
        else:   # spatial-only group: branch heads ×2
            heads.append(2 * int(
                sd[f"layers.{i}.blocks.0.attn.attns.0.pos.pos3.2.weight"]
                .shape[0]))
    expansion = sd["layers.0.blocks.0.ffn.fc1.weight"].shape[0] / embed
    resi = "1conv" if "layers.0.conv.weight" in sd else "3conv"
    if "conv_before_upsample.0.weight" in sd:
        upsampler = "pixelshuffle"
        num_feat = int(sd["conv_before_upsample.0.weight"].shape[0])
        scale, k = 1, 0
        while f"upsample.{k}.weight" in sd:
            r2 = int(sd[f"upsample.{k}.weight"].shape[0]) // num_feat
            scale *= {4: 2, 9: 3}.get(r2, 2)
            k += 2
    else:
        upsampler = "pixelshuffledirect"
        num_feat = 64
        scale = int(round(np.sqrt(
            sd["upsample.0.weight"].shape[0] // in_chans)))
    return DATConfig(embed_dim=embed, depths=tuple(depths),
                     num_heads=tuple(heads),
                     split_size=_split_from_buffers(sd),
                     expansion_factor=expansion, scale=scale,
                     in_chans=in_chans, resi_connection=resi,
                     upsampler=upsampler, num_feat=num_feat)


_SKIP_SUFFIXES = ("rpe_biases", "relative_position_index", "attn_mask_0",
                  "attn_mask_1", "num_batches_tracked", "mean")


def convert_dat(sd: dict):
    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.utils.pytree import unflatten

    for prefix in ("params_ema.", "params."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()
                  if k.startswith(prefix)}
            break
    cfg = derive_dat_config(sd)
    flat = {}
    for k, v in sd.items():
        if k.split(".")[-1] in _SKIP_SUFFIXES or k.endswith(".mean"):
            continue    # recomputed per input shape / unused buffers
        flat[k] = convert_leaf(k, np.ascontiguousarray(v))
    return unflatten(flat), cfg


def load_dat(path: str):
    from sdwebui_tpu.loader.load import read_checkpoint

    return convert_dat(read_checkpoint(path))


def init_params(cfg: DATConfig, seed: int = 0):
    rng = np.random.RandomState(seed)
    f32 = np.float32
    e = cfg.embed_dim

    def conv(cin, cout, k=3):
        return {"weight": (rng.randn(k, k, cin, cout) * 0.05).astype(f32),
                "bias": np.zeros(cout, f32)}

    def dconv(c):
        return {"weight": (rng.randn(3, 3, 1, c) * 0.05).astype(f32),
                "bias": np.zeros(c, f32)}

    def lin(cin, cout):
        return {"weight": (rng.randn(cin, cout) * 0.05).astype(f32),
                "bias": np.zeros(cout, f32)}

    def norm(d=None):
        d = d or e
        return {"weight": np.ones(d, f32), "bias": np.zeros(d, f32)}

    def bn(c):
        return {"weight": np.ones(c, f32), "bias": np.zeros(c, f32),
                "running_mean": (rng.randn(c) * 0.1).astype(f32),
                "running_var": np.abs(1 + rng.randn(c) * 0.1).astype(f32)}

    def interactions():
        return {
            "dwconv": {"0": dconv(e), "1": bn(e)},
            "channel_interaction": {"1": conv(e, e // 8, 1),
                                    "2": bn(e // 8),
                                    "4": conv(e // 8, e, 1)},
            "spatial_interaction": {"0": conv(e, e // 16, 1),
                                    "1": bn(e // 16),
                                    "3": conv(e // 16, 1, 1)},
        }

    def pos_bias(heads_b):
        pd = ((e // 2) // 4) // 4
        return {"pos_proj": lin(2, pd),
                "pos1": {"0": norm(pd), "2": lin(pd, pd)},
                "pos2": {"0": norm(pd), "2": lin(pd, pd)},
                "pos3": {"0": norm(pd), "2": lin(pd, heads_b)}}

    def ffn():
        hidden = int(e * cfg.expansion_factor)
        return {"fc1": lin(e, hidden),
                "sg": {"norm": norm(hidden // 2), "conv": dconv(hidden // 2)},
                "fc2": lin(hidden // 2, e)}

    def datb(heads, b_idx):
        if b_idx % 2 == 0:
            attn = {"qkv": lin(e, 3 * e), "proj": lin(e, e),
                    "attns": {"0": {"pos": pos_bias(heads // 2)},
                              "1": {"pos": pos_bias(heads // 2)}},
                    **interactions()}
        else:
            attn = {"qkv": lin(e, 3 * e), "proj": lin(e, e),
                    "temperature": np.ones((heads, 1, 1), f32),
                    **interactions()}
        return {"norm1": norm(), "norm2": norm(), "attn": attn, "ffn": ffn()}

    def resi():
        if cfg.resi_connection == "1conv":
            return conv(e, e)
        return {"0": conv(e, e // 4), "2": conv(e // 4, e // 4, 1),
                "4": conv(e // 4, e)}

    layers = {}
    for i, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
        layers[str(i)] = {"blocks": {str(j): datb(heads, j)
                                     for j in range(depth)},
                          "conv": resi()}

    tree = {"conv_first": conv(cfg.in_chans, e),
            "before_RG": {"1": norm()},
            "layers": layers, "norm": norm(),
            "conv_after_body": resi()}
    if cfg.upsampler == "pixelshuffle":
        nf = cfg.num_feat
        ups, s, k = {}, cfg.scale, 0
        while s > 1:
            r = 3 if s % 3 == 0 else 2
            ups[str(k)] = conv(nf, nf * r * r)
            s //= r
            k += 2
        tree.update({"conv_before_upsample": {"0": conv(e, nf)},
                     "upsample": ups, "conv_last": conv(nf, cfg.in_chans)})
    else:
        tree["upsample"] = {"0": conv(e, cfg.in_chans * cfg.scale ** 2)}
    return tree


# --------------------------------------------------------------------------
# tiled inference + upscaler registration
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def _apply_batch(params, cfg, x):
    return apply(params, cfg, x)


def upscale_image(params, cfg: DATConfig, image: Image.Image,
                  tile: int | None = None, overlap: int | None = None) -> Image.Image:
    from sdwebui_tpu.postprocessing.upscalers import tiled_sr_upscale
    from sdwebui_tpu.utils.options import opts as _opts

    # DAT has its own tile options (reference shared_options upscaling)
    if tile is None:
        tile = int(_opts.get("DAT_tile", 192) or 0)
    if overlap is None:
        overlap = int(_opts.get("DAT_tile_overlap", 8))
    return tiled_sr_upscale(
        lambda arr: _apply_batch(params, cfg, jnp.asarray(arr)),
        cfg.scale, max(cfg.split_size), image, tile=tile, overlap=overlap)


def register_dat_dir(dirs=("models/DAT",)):
    """Discover DAT checkpoints and add them to the upscaler registry."""
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
                        state["m"] = load_dat(p)
                    params, cfg = state["m"]
                    return upscale_image(params, cfg, image)
                return fn_

            register_upscaler(name, make_fn(), default_scale=4)
            found.append(name)
    return found

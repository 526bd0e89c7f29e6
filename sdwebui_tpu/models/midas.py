"""MiDaS DPT-hybrid depth estimator — the depth2img conditioner.

The SD2-depth checkpoint bundles the whole tower under `depth_model.model.*`
(reference loads it through ldm's LatentDepth2ImageDiffusion; dispatch at
/root/reference/modules/processing.py:304-321 depth2img_image_conditioning).
Architecture follows the public DPT paper (Ranftl et al., ICCV 2021,
isl-org/DPT `dpt_hybrid-midas` weights layout):

  backbone  R50+ViT-B/16 hybrid (timm vit_base_r50_s16_384): ResNetV2
            stem + 3 pre-activation bottleneck stages (StdConv2d weight
            standardization + GroupNorm32/ReLU), 1x1 patch projection to a
            768-d ViT with cls token, 12 blocks
  hooks     resnet stage 1 (/4, 256ch), stage 2 (/8, 512ch), vit blocks
            8 and 11 (project-readout of the cls token, reassembled to
            /16 and /32 maps)
  scratch   per-hook 3x3 RN convs to 256ch, 4 RefineNet fusion blocks
            (residual conv units, x2 align-corners bilinear upsampling),
            monocular-depth output head

NHWC JAX throughout; one fixed input size per jit (TPU static shapes —
the pipeline resizes sources to `cfg.image_size`, the reference's AddMiDaS
keeps aspect instead; the depth map is min-max normalized afterwards so
the conditioning range is identical).
"""

from __future__ import annotations

import dataclasses
import re

import jax
import jax.numpy as jnp
import numpy as np

from sdwebui_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    image_size: int = 384
    # ResNetV2 backbone
    stem_width: int = 64
    stage_blocks: tuple = (3, 4, 9)
    # ViT
    vit_width: int = 768
    vit_layers: int = 12
    vit_heads: int = 12
    hooks: tuple = (8, 11)          # transformer blocks feeding layers 3/4
    # scratch
    features: int = 256


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

def _conv(x, w, b=None, stride=1):
    """Torch-semantics conv: symmetric k//2 padding on both sides (XLA's
    "SAME" pads asymmetrically under stride > 1 — lo k//2-?, hi rest —
    which diverges from torch for every stride-2 conv in the backbone)."""
    p = w.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _std_conv(x, w, stride=1):
    """StdConv2d: per-output-channel weight standardization (BiT)."""
    mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
    w = (w - mean) / jnp.sqrt(var + 1e-8)
    return _conv(x, w, stride=stride)


def _gn_relu(x, p, groups=32):
    """GroupNormAct: GN(32) + ReLU (timm GroupNormAct, eps 1e-5)."""
    b, h, w, c = x.shape
    g = min(groups, c)
    xr = x.reshape(b, h, w, g, c // g)
    mean = jnp.mean(xr, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xr, axis=(1, 2, 4), keepdims=True)
    xr = (xr - mean) / jnp.sqrt(var + 1e-5)
    x = xr.reshape(b, h, w, c) * p["weight"] + p["bias"]
    return jax.nn.relu(x)


def _layer_norm(x, p):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + 1e-6) * p["weight"] + p["bias"]


def resize_bilinear_ac(x, out_h: int, out_w: int):
    """Bilinear resize with align_corners=True (torch F.interpolate in the
    DPT fusion blocks; jax.image.resize only does half-pixel centers)."""
    b, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x
    ys = jnp.linspace(0.0, h - 1.0, out_h)
    xs = jnp.linspace(0.0, w - 1.0, out_w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None].astype(x.dtype)
    wx = (xs - x0)[None, None, :, None].astype(x.dtype)
    rows0 = x[:, y0]
    rows1 = x[:, y1]
    top = rows0[:, :, x0] * (1 - wx) + rows0[:, :, x1] * wx
    bot = rows1[:, :, x0] * (1 - wx) + rows1[:, :, x1] * wx
    return top * (1 - wy) + bot * wy


# --------------------------------------------------------------------------
# backbone
# --------------------------------------------------------------------------

def _bottleneck(p, x, stride: int = 1):
    """timm ResNetV2 PreActBottleneck: GN-ReLU preact, StdConv 1/3/1
    (stride on the 3x3), preact-fed downsample shortcut."""
    pre = _gn_relu(x, p["norm1"])
    if "downsample" in p:
        shortcut = _std_conv(pre, p["downsample"]["conv"]["weight"],
                             stride=stride)
    else:
        shortcut = x
    out = _std_conv(pre, p["conv1"]["weight"])
    out = _std_conv(_gn_relu(out, p["norm2"]), p["conv2"]["weight"],
                    stride=stride)
    out = _std_conv(_gn_relu(out, p["norm3"]), p["conv3"]["weight"])
    return out + shortcut


def _vit_block(p, x, heads):
    h = _layer_norm(x, p["norm1"])
    qkv = h @ p["attn"]["qkv"]["weight"] + p["attn"]["qkv"]["bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    o = attention(q, k, v, num_heads=heads)
    x = x + (o @ p["attn"]["proj"]["weight"] + p["attn"]["proj"]["bias"])
    h = _layer_norm(x, p["norm2"])
    h = h @ p["mlp"]["fc1"]["weight"] + p["mlp"]["fc1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ p["mlp"]["fc2"]["weight"] + p["mlp"]["fc2"]["bias"]
    return x + h


def _readout_project(p, tokens, grid_h, grid_w):
    """DPT ProjectReadout: concat cls onto every patch token, Linear+GELU,
    reshape to a feature map.  p = act_postprocessN["0"] (project is a
    torch Sequential: Linear at index 0)."""
    cls = tokens[:, :1]
    patches = tokens[:, 1:]
    cat = jnp.concatenate(
        [patches, jnp.broadcast_to(cls, patches.shape)], axis=-1)
    lin = p["project"]["0"]
    h = cat @ lin["weight"] + lin["bias"]
    h = jax.nn.gelu(h, approximate=False)
    b = h.shape[0]
    return h.reshape(b, grid_h, grid_w, h.shape[-1])


def _residual_conv_unit(p, x):
    out = jax.nn.relu(x)
    out = _conv(out, p["conv1"]["weight"], p["conv1"]["bias"])
    out = jax.nn.relu(out)
    out = _conv(out, p["conv2"]["weight"], p["conv2"]["bias"])
    return out + x


def _fusion_block(p, x, skip=None):
    if skip is not None:
        x = x + _residual_conv_unit(p["resConfUnit1"], skip)
    x = _residual_conv_unit(p["resConfUnit2"], x)
    x = resize_bilinear_ac(x, x.shape[1] * 2, x.shape[2] * 2)
    return _conv(x, p["out_conv"]["weight"], p["out_conv"]["bias"])


def apply(params, cfg: DPTConfig, images):
    """images: (B, H, W, 3) in [-1, 1] (midas mean/std 0.5 normalization)
    → inverse depth (B, H, W, 1), non-negative, unnormalized."""
    pm = params["pretrained"]["model"]
    b, H, W, _ = images.shape

    # ResNetV2 stem: StdConv 7x7/2 (+ optional norm) + 3x3/2 maxpool
    x = _std_conv(images, pm["patch_embed"]["backbone"]["stem"]["conv"]["weight"],
                  stride=2)
    stem = pm["patch_embed"]["backbone"]["stem"]
    if "norm" in stem:
        x = _gn_relu(x, stem["norm"])
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])

    feats = []
    stages = pm["patch_embed"]["backbone"]["stages"]
    for si in range(len(cfg.stage_blocks)):
        blocks = stages[str(si)]["blocks"]
        for bi in range(cfg.stage_blocks[si]):
            # stage downsampling lives in each stage's first block (stage 0
            # keeps /4: the stem already reduced twice)
            x = _bottleneck(blocks[str(bi)],
                            x, stride=2 if (si > 0 and bi == 0) else 1)
        feats.append(x)
    layer1, layer2, deep = feats[0], feats[1], feats[-1]
    if "norm" in pm["patch_embed"]["backbone"]:
        # timm ResNetV2 final GroupNormAct feeds the ViT patch projection
        # (the stage-output hooks above are taken pre-norm)
        deep = _gn_relu(deep, pm["patch_embed"]["backbone"]["norm"])

    # ViT over the /16 map
    gh, gw = deep.shape[1], deep.shape[2]
    tok = _conv(deep, pm["patch_embed"]["proj"]["weight"],
                pm["patch_embed"]["proj"]["bias"])
    tok = tok.reshape(b, gh * gw, cfg.vit_width)
    cls = jnp.broadcast_to(pm["cls_token"].reshape(1, 1, -1).astype(tok.dtype),
                           (b, 1, cfg.vit_width))
    tok = jnp.concatenate([cls, tok], axis=1)
    pos = pm["pos_embed"].reshape(1, -1, cfg.vit_width)
    n_patch = pos.shape[1] - 1
    side = int(round(n_patch ** 0.5))
    if (gh, gw) != (side, side):
        # DPT _resize_pos_embed: bilinear over the grid part
        grid = pos[:, 1:].reshape(1, side, side, cfg.vit_width)
        grid = jax.image.resize(grid, (1, gh, gw, cfg.vit_width), "bilinear")
        pos = jnp.concatenate(
            [pos[:, :1], grid.reshape(1, gh * gw, cfg.vit_width)], axis=1)
    tok = tok + pos.astype(tok.dtype)

    hook_maps = {}
    for i in range(cfg.vit_layers):
        tok = _vit_block(pm["blocks"][str(i)], tok, cfg.vit_heads)
        if i in cfg.hooks:
            hook_maps[i] = tok

    pp3 = params["pretrained"]["act_postprocess3"]
    pp4 = params["pretrained"]["act_postprocess4"]
    layer3 = _readout_project(pp3["0"], hook_maps[cfg.hooks[0]], gh, gw)
    layer3 = _conv(layer3, pp3["3"]["weight"], pp3["3"]["bias"])
    layer4 = _readout_project(pp4["0"], hook_maps[cfg.hooks[1]], gh, gw)
    layer4 = _conv(layer4, pp4["3"]["weight"], pp4["3"]["bias"])
    layer4 = _conv(layer4, pp4["4"]["weight"], pp4["4"]["bias"], stride=2)

    sc = params["scratch"]
    rn1 = _conv(layer1, sc["layer1_rn"]["weight"])
    rn2 = _conv(layer2, sc["layer2_rn"]["weight"])
    rn3 = _conv(layer3, sc["layer3_rn"]["weight"])
    rn4 = _conv(layer4, sc["layer4_rn"]["weight"])

    path = _fusion_block(sc["refinenet4"], rn4)
    path = _fusion_block(sc["refinenet3"], path, rn3)
    path = _fusion_block(sc["refinenet2"], path, rn2)
    path = _fusion_block(sc["refinenet1"], path, rn1)

    oc = sc["output_conv"]
    out = _conv(path, oc["0"]["weight"], oc["0"]["bias"])
    out = resize_bilinear_ac(out, out.shape[1] * 2, out.shape[2] * 2)
    out = jax.nn.relu(_conv(out, oc["2"]["weight"], oc["2"]["bias"]))
    out = jax.nn.relu(_conv(out, oc["4"]["weight"], oc["4"]["bias"]))
    return out


def depth_conditioning(params, cfg: DPTConfig, images_01, latent_h, latent_w):
    """images in [0,1] (B,H,W,3) → (B, latent_h, latent_w, 1) in [-1,1] —
    the reference's depth2img_image_conditioning (processing.py:311-321):
    run midas, bicubic-resize to the latent grid, min-max normalize to
    [-1, 1]."""
    x = jax.image.resize(
        images_01, (images_01.shape[0], cfg.image_size, cfg.image_size, 3),
        "bicubic")
    depth = apply(params, cfg, x * 2.0 - 1.0)
    depth = jax.image.resize(
        depth, (depth.shape[0], latent_h, latent_w, 1), "bicubic")
    dmin = jnp.min(depth, axis=(1, 2, 3), keepdims=True)
    dmax = jnp.max(depth, axis=(1, 2, 3), keepdims=True)
    return 2.0 * (depth - dmin) / jnp.maximum(dmax - dmin, 1e-8) - 1.0


# --------------------------------------------------------------------------
# conversion
# --------------------------------------------------------------------------

def convert_dpt(sd: dict, prefix: str = "depth_model.model."):
    """Torch DPTDepthModel state dict (`pretrained.model.* / scratch.*`
    under `prefix`) → (tree, DPTConfig)."""
    from sdwebui_tpu.utils.pytree import unflatten

    flat = {}
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        sub = k[len(prefix):]
        arr = np.asarray(v)
        if arr.ndim == 4:                      # conv OIHW → HWIO
            arr = np.ascontiguousarray(arr.transpose(2, 3, 1, 0))
        elif arr.ndim == 2 and (".project." in sub or "qkv" in sub
                                or "attn.proj" in sub or "mlp.fc" in sub):
            arr = np.ascontiguousarray(arr.T)  # linear (out,in) → (in,out)
        flat[sub] = arr
    tree = unflatten(flat)

    pm = tree["pretrained"]["model"]
    backbone = pm["patch_embed"]["backbone"]
    stage_blocks = tuple(
        len(backbone["stages"][str(s)]["blocks"])
        for s in sorted(backbone["stages"], key=int))
    vit_width = pm["cls_token"].reshape(-1).shape[0]
    n_patch = pm["pos_embed"].reshape(1, -1, vit_width).shape[1] - 1
    side = int(round(n_patch ** 0.5))
    vit_layers = 1 + max(int(i) for i in pm["blocks"])
    # dpt_hybrid hooks blocks 8/11 of the 12-layer ViT; scale for smaller
    # (test-sized) towers
    hooks = (8, 11) if vit_layers >= 12 else (max(vit_layers - 2, 0),
                                              vit_layers - 1)
    cfg = DPTConfig(
        image_size=side * 16,
        stem_width=backbone["stem"]["conv"]["weight"].shape[-1],
        stage_blocks=stage_blocks,
        vit_width=vit_width,
        vit_layers=vit_layers,
        vit_heads=max(vit_width // 64, 1),
        hooks=hooks,
        features=tree["scratch"]["layer1_rn"]["weight"].shape[-1])
    return tree, cfg

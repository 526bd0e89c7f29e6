"""AutoencoderKL (the `first_stage_model`) — NHWC, fp32-by-policy.

Param tree mirrors the ldm checkpoint layout:

    encoder.conv_in / down.{l}.block.{i} / down.{l}.downsample.conv /
      mid.block_1 / mid.attn_1 / mid.block_2 / norm_out / conv_out
    quant_conv, post_quant_conv
    decoder.conv_in / mid.* / up.{l}.block.{0..2} / up.{l}.upsample.conv /
      norm_out / conv_out

Note the ldm decoder quirk: ``up`` is indexed by resolution level but
executed **in reverse** (up.3 first at the lowest resolution).  All norms
are GroupNorm(32, eps=1e-6).  The mid attention is single-head full
attention over H·W tokens, routed through ops.attention (flash kernel at
512²+ decode sizes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sdwebui_tpu.models.configs import VAEConfig
from sdwebui_tpu.models.layers import (conv2d, group_norm_p, spatial_axis,
                                       upsample2x_conv, upsample_nearest_2x)
from sdwebui_tpu.ops import attention


def _resnet_block(p, x, circular=False):
    h = group_norm_p(p["norm1"], x, eps=1e-6, silu=True)
    h = conv2d(p["conv1"], h, circular=circular)
    h = group_norm_p(p["norm2"], h, eps=1e-6, silu=True)
    h = conv2d(p["conv2"], h, circular=circular)
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x, padding=0)
    return x + h


def _attn_block(p, x):
    from sdwebui_tpu.models.layers import spatial_axis

    sp_axis = spatial_axis()
    if sp_axis is not None:
        # context-parallel: q stays local (output rows are local); k/v gather
        # the full token set over the mesh axis (mid-res tokens are small)
        b, h, w, c = x.shape
        hn = group_norm_p(p["norm"], x, eps=1e-6)
        q = conv2d(p["q"], hn, padding=0).reshape(b, h * w, c)
        k = conv2d(p["k"], hn, padding=0).reshape(b, h * w, c)
        v = conv2d(p["v"], hn, padding=0).reshape(b, h * w, c)
        k = jax.lax.all_gather(k, sp_axis, axis=1, tiled=True)
        v = jax.lax.all_gather(v, sp_axis, axis=1, tiled=True)
        out = attention(q, k, v).reshape(b, h, w, c)
        return x + conv2d(p["proj_out"], out, padding=0)
    b, h, w, c = x.shape
    hn = group_norm_p(p["norm"], x, eps=1e-6)
    # q/k/v/proj_out are 1x1 convs in the checkpoint
    q = conv2d(p["q"], hn, padding=0).reshape(b, h * w, c)
    k = conv2d(p["k"], hn, padding=0).reshape(b, h * w, c)
    v = conv2d(p["v"], hn, padding=0).reshape(b, h * w, c)
    out = attention(q, k, v).reshape(b, h, w, c)
    return x + conv2d(p["proj_out"], out, padding=0)


def encode_moments(params, cfg: VAEConfig, x):
    """image (B,H,W,3) in [-1,1] → moments (B,H/8,W/8,2*z) (mean, logvar)."""
    p = params["encoder"]
    h = conv2d(p["conv_in"], x)
    for level in range(len(cfg.ch_mult)):
        lp = p["down"][str(level)]
        for i in range(cfg.num_res_blocks):
            h = _resnet_block(lp["block"][str(i)], h)
        if "downsample" in lp:
            # ldm pads asymmetrically (0,1,0,1) before a stride-2 VALID conv
            from sdwebui_tpu.models.layers import spatial_axis

            sp_axis = spatial_axis()
            if sp_axis is not None:
                # sharded rows: the stride-2 window at the shard boundary
                # reads one row from the shard below (zeros at the bottom)
                n = jax.lax.psum(1, sp_axis)
                below = jax.lax.ppermute(
                    h[:, :1], sp_axis, [(i + 1, i) for i in range(n - 1)])
                h = jnp.concatenate([h, below], axis=1)
                h = jnp.pad(h, ((0, 0), (0, 0), (0, 1), (0, 0)))
            else:
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = jax.lax.conv_general_dilated(
                h, lp["downsample"]["conv"]["weight"].astype(h.dtype),
                window_strides=(2, 2), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + lp["downsample"]["conv"]["bias"].astype(h.dtype)
    h = _resnet_block(p["mid"]["block_1"], h)
    h = _attn_block(p["mid"]["attn_1"], h)
    h = _resnet_block(p["mid"]["block_2"], h)
    h = group_norm_p(p["norm_out"], h, eps=1e-6, silu=True)
    h = conv2d(p["conv_out"], h)
    return conv2d(params["quant_conv"], h, padding=0)


def sample_latent(moments, noise, cfg: VAEConfig):
    """moments + N(0,1) noise → scaled latent (diagonal gaussian sample)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    z = mean + jnp.exp(0.5 * logvar) * noise
    return (z - cfg.shift_factor) * cfg.scale_factor


def encode_mode(moments, cfg: VAEConfig):
    """Deterministic encode (the reference's img2img path uses the mean)."""
    mean, _ = jnp.split(moments, 2, axis=-1)
    return (mean - cfg.shift_factor) * cfg.scale_factor


def decode(params, cfg: VAEConfig, z):
    """scaled latent (B,h,w,z) → image (B,8h,8w,3) in [-1,1]."""
    circ = cfg.tiling
    z = z / cfg.scale_factor + cfg.shift_factor
    h = conv2d(params["post_quant_conv"], z, padding=0)
    p = params["decoder"]
    h = conv2d(p["conv_in"], h, circular=circ)
    h = _resnet_block(p["mid"]["block_1"], h, circ)
    h = _attn_block(p["mid"]["attn_1"], h)
    h = _resnet_block(p["mid"]["block_2"], h, circ)
    for level in reversed(range(len(cfg.ch_mult))):
        lp = p["up"][str(level)]
        for i in range(cfg.num_res_blocks + 1):
            h = _resnet_block(lp["block"][str(i)], h, circ)
        if "upsample" in lp:
            if circ or spatial_axis() is not None:
                # tiling (wrap pad) and H-sharded context-parallel decode
                # keep the explicit upsample + halo-aware conv2d
                h = conv2d(lp["upsample"]["conv"], upsample_nearest_2x(h),
                           circular=circ)
            else:
                # fused 4-phase upsample-conv (see layers.upsample2x_conv)
                h = upsample2x_conv(lp["upsample"]["conv"], h)
    h = group_norm_p(p["norm_out"], h, eps=1e-6, silu=True)
    return conv2d(p["conv_out"], h, circular=circ)


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def init_params(cfg: VAEConfig, key, dtype=jnp.float32, ini=None):
    from sdwebui_tpu.models.init_utils import HostInit

    ini = ini or HostInit(key)
    _conv = lambda kh, kw, cin, cout: ini.conv(kh, kw, cin, cout, dtype)
    _norm = lambda c: ini.norm(c, dtype)

    def _res(cin, cout):
        p = {"norm1": _norm(cin), "conv1": _conv(3, 3, cin, cout),
             "norm2": _norm(cout), "conv2": _conv(3, 3, cout, cout)}
        if cin != cout:
            p["nin_shortcut"] = _conv(1, 1, cin, cout)
        return p

    def _attn(c):
        return {"norm": _norm(c),
                "q": _conv(1, 1, c, c), "k": _conv(1, 1, c, c),
                "v": _conv(1, 1, c, c), "proj_out": _conv(1, 1, c, c)}

    chs = [cfg.ch * m for m in cfg.ch_mult]

    down = {}
    ch = cfg.ch
    for level, out_ch in enumerate(chs):
        blocks = {}
        for i in range(cfg.num_res_blocks):
            blocks[str(i)] = _res(ch, out_ch)
            ch = out_ch
        lp = {"block": blocks}
        if level != len(chs) - 1:
            lp["downsample"] = {"conv": _conv(3, 3, ch, ch)}
        down[str(level)] = lp

    mid_ch = chs[-1]
    encoder = {
        "conv_in": _conv(3, 3, cfg.in_channels, cfg.ch),
        "down": down,
        "mid": {"block_1": _res(mid_ch, mid_ch),
                "attn_1": _attn(mid_ch),
                "block_2": _res(mid_ch, mid_ch)},
        "norm_out": _norm(mid_ch),
        "conv_out": _conv(3, 3, mid_ch, 2 * cfg.z_channels),
    }

    up = {}
    ch = mid_ch
    for level in reversed(range(len(chs))):
        out_ch = chs[level]
        blocks = {}
        for i in range(cfg.num_res_blocks + 1):
            blocks[str(i)] = _res(ch, out_ch)
            ch = out_ch
        lp = {"block": blocks}
        if level != 0:
            lp["upsample"] = {"conv": _conv(3, 3, ch, ch)}
        up[str(level)] = lp

    decoder = {
        "conv_in": _conv(3, 3, cfg.z_channels, mid_ch),
        "mid": {"block_1": _res(mid_ch, mid_ch),
                "attn_1": _attn(mid_ch),
                "block_2": _res(mid_ch, mid_ch)},
        "up": up,
        "norm_out": _norm(cfg.ch),
        "conv_out": _conv(3, 3, cfg.ch, cfg.out_ch),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": _conv(1, 1, 2 * cfg.z_channels, 2 * cfg.embed_dim),
        "post_quant_conv": _conv(1, 1, cfg.embed_dim, cfg.z_channels),
    }

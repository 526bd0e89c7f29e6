"""Config-driven SD UNet (SD1.x / SD2.x / SDXL base & refiner / inpaint).

A pure-functional, NHWC, bf16-on-MXU re-design of the ldm/sgm
``UNetModel`` the reference loads from its cloned repos (SURVEY.md notes
the model definitions are external; behaviour contract = the checkpoint
state-dict layout).  The param tree mirrors the ``model.diffusion_model.*``
state-dict hierarchy exactly (see loader/convert.py), so `apply` is a
functional readout of the checkpoint:

    input_blocks.0.0          conv_in
    input_blocks.i.{0,1}      ResBlock [, SpatialTransformer] | Downsample
    middle_block.{0,1,2}      ResBlock, SpatialTransformer, ResBlock
    output_blocks.i.{0,1,2}   ResBlock [, SpatialTransformer] [, Upsample]
    out.{0,2}                 GroupNorm+SiLU, conv

Attention runs through ops.attention (Pallas flash kernel for long
sequences).  Everything is static-shaped and jit/scan-safe; ControlNet-style
residual injection is a first-class argument (``control``) rather than a
forward-hook patch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sdwebui_tpu.models.configs import UNetConfig
from sdwebui_tpu.models.layers import (
    conv2d, embedding, gelu, group_norm_p, layer_norm_p, linear, silu,
    timestep_embedding, upsample_nearest_2x,
)
from sdwebui_tpu.ops import attention


# --------------------------------------------------------------------------
# structural plan: which (block, slot) is which layer type
# --------------------------------------------------------------------------

def build_plan(cfg: UNetConfig):
    """Returns (input_plan, middle_depth, output_plan, input_chs).

    input_plan / output_plan: list (per block index) of layer descriptors
    ``(kind, *info)`` where kind ∈ conv_in|res|attn|down|up.
    """
    depth = list(cfg.transformer_depth)
    while len(depth) < len(cfg.channel_mult):
        depth.append(depth[-1])

    input_plan = [[("conv_in", cfg.in_channels, cfg.model_channels)]]
    ch = cfg.model_channels
    input_chs = [ch]
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        out_ch = cfg.model_channels * mult
        for _ in range(cfg.num_res_blocks):
            layers = [("res", ch, out_ch)]
            ch = out_ch
            if ds in cfg.attention_resolutions and depth[level] > 0:
                layers.append(("attn", ch, depth[level]))
            input_plan.append(layers)
            input_chs.append(ch)
        if level != len(cfg.channel_mult) - 1:
            input_plan.append([("down", ch)])
            input_chs.append(ch)
            ds *= 2

    if cfg.transformer_depth_middle >= 0:
        middle_depth = cfg.transformer_depth_middle
    else:
        middle_depth = depth[-1] if depth[-1] > 0 else 1

    output_plan = []
    chs = list(input_chs)
    for level in reversed(range(len(cfg.channel_mult))):
        out_ch = cfg.model_channels * cfg.channel_mult[level]
        for i in range(cfg.num_res_blocks + 1):
            skip = chs.pop()
            layers = [("res", ch + skip, out_ch)]
            ch = out_ch
            if ds in cfg.attention_resolutions and depth[level] > 0:
                layers.append(("attn", ch, depth[level]))
            if level > 0 and i == cfg.num_res_blocks:
                layers.append(("up", ch))
                ds //= 2
            output_plan.append(layers)
    return input_plan, middle_depth, output_plan, input_chs


# --------------------------------------------------------------------------
# layer applications
# --------------------------------------------------------------------------

def _resblock(p, x, emb, circular=False):
    h = group_norm_p(p["in_layers"]["0"], x, silu=True)
    h = conv2d(p["in_layers"]["2"], h, circular=circular)
    e = linear(p["emb_layers"]["1"], silu(emb)).astype(h.dtype)
    h = h + e[:, None, None, :]
    h = group_norm_p(p["out_layers"]["0"], h, silu=True)
    h = conv2d(p["out_layers"]["3"], h, circular=circular)
    if "skip_connection" in p:
        x = conv2d(p["skip_connection"], x, padding=0)
    return x + h


def _cross_attention(p, x, context, heads, hypernet=None, upcast=False):
    if upcast and x.dtype != jnp.float32:
        # opts.upcast_attn (reference --upcast-attn): whole attention in
        # fp32; preserve the `context is x` identity for the fused-qkv path
        xf = x.astype(jnp.float32)
        cf = xf if context is x else context.astype(jnp.float32)
        return _cross_attention(p, xf, cf, heads, hypernet).astype(x.dtype)
    if context is x and hypernet is None and "bias" not in p["to_q"]:
        # self-attention: one fused qkv matmul (weights concatenated at
        # trace time — XLA folds the concat; 3 gemms → 1 bigger gemm)
        wq = p["to_q"]["weight"]
        wk = p["to_k"]["weight"]
        wv = p["to_v"]["weight"]
        qkv = x @ jnp.concatenate([wq, wk, wv], axis=1).astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = attention(q, k, v, num_heads=heads)
        return linear(p["to_out"]["0"], out)
    ctx_k = ctx_v = context
    if hypernet is not None:
        # (tree, meta) at inference; training appends (dropout_structure,
        # rng) so the k/v MLPs regularize (networks/hypernetwork.py)
        tree, (activation, multiplier, activate_output) = hypernet[:2]
        dropout_structure, rng = hypernet[2] if len(hypernet) > 2 \
            else (None, None)
        hn = tree.get(str(context.shape[-1]))
        if hn is not None:
            from sdwebui_tpu.networks.hypernetwork import apply_hypernetwork_module

            dim = context.shape[-1]
            rk = rv = None
            if rng is not None:
                import jax as _jax

                rk = _jax.random.fold_in(rng, 2 * dim)
                rv = _jax.random.fold_in(rng, 2 * dim + 1)
            ctx_k = apply_hypernetwork_module(hn[0], context, activation,
                                              multiplier, activate_output,
                                              dropout_structure, rk)
            ctx_v = apply_hypernetwork_module(hn[1], context, activation,
                                              multiplier, activate_output,
                                              dropout_structure, rv)
    q = linear(p["to_q"], x)
    k = linear(p["to_k"], ctx_k)
    v = linear(p["to_v"], ctx_v)
    out = attention(q, k, v, num_heads=heads)
    return linear(p["to_out"]["0"], out)


def _ff_geglu(p, x):
    h = linear(p["net"]["0"]["proj"], x)
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * gelu(gate)
    return linear(p["net"]["2"], h)


def _split_factor(dim: int, tile: int) -> int:
    """Smallest divisor of `dim` whose quotient is ≤ tile."""
    import math

    for f in range(math.ceil(dim / tile), dim + 1):
        if dim % f == 0:
            return f
    return dim


def _hypertiled_self_attention(p, x, heads, hw, tile, hypernet, upcast=False):
    """Self-attention over spatial tiles (reference hypertile.py
    self_attn_forward): (B, h·w, C) → (B·nh·nw, th·tw, C) around the attn.
    Cuts attention cost by nh·nw for the high-res layers; applied only when
    the map is larger than one tile."""
    h, w = hw
    b, s, c = x.shape
    nh, nw = _split_factor(h, tile), _split_factor(w, tile)
    if s != h * w or (nh == 1 and nw == 1):
        return _cross_attention(p, x, x, heads, hypernet, upcast=upcast)
    th, tw = h // nh, w // nw
    xt = x.reshape(b, nh, th, nw, tw, c).transpose(0, 1, 3, 2, 4, 5) \
          .reshape(b * nh * nw, th * tw, c)
    out = _cross_attention(p, xt, xt, heads, hypernet, upcast=upcast)
    return out.reshape(b, nh, nw, th, tw, c).transpose(0, 1, 3, 2, 4, 5) \
              .reshape(b, s, c)


def _basic_block(p, x, context, heads, hypernet=None, hw=None, tile=0,
                 tome_ratio=0.0, upcast=False):
    h = layer_norm_p(p["norm1"], x)
    merged = None
    if tome_ratio > 0 and hw is not None:
        from sdwebui_tpu.ops.tome import build_merge

        merged = build_merge(h, hw[0], hw[1], tome_ratio)
    if merged is not None:
        merge, unmerge, _ = merged
        mh = merge(h)
        x = x + unmerge(_cross_attention(p["attn1"], mh, mh,
                                         heads, hypernet, upcast=upcast))
    elif tile > 0 and hw is not None and hw[0] * hw[1] > tile * tile:
        x = x + _hypertiled_self_attention(p["attn1"], h, heads, hw, tile,
                                           hypernet, upcast=upcast)
    else:
        x = x + _cross_attention(p["attn1"], h, h, heads, hypernet,
                                 upcast=upcast)
    h = layer_norm_p(p["norm2"], x)
    x = x + _cross_attention(p["attn2"], h, context, heads, hypernet,
                             upcast=upcast)
    x = x + _ff_geglu(p["ff"], layer_norm_p(p["norm3"], x))
    return x


def _spatial_transformer(p, x, context, cfg: UNetConfig, depth: int,
                         hypernet=None):
    b, h, w, c = x.shape
    heads = cfg.heads_for(c)
    residual = x
    x = group_norm_p(p["norm"], x, eps=1e-6)
    if cfg.use_linear_in_transformer:
        x = x.reshape(b, h * w, c)
        x = linear(p["proj_in"], x)
    else:
        x = conv2d(p["proj_in"], x, padding=0)
        x = x.reshape(b, h * w, c)
    for d in range(depth):
        x = _basic_block(p["transformer_blocks"][str(d)], x, context, heads,
                         hypernet, hw=(h, w), tile=cfg.hypertile_tile,
                         tome_ratio=cfg.tome_ratio, upcast=cfg.upcast_attn)
    if cfg.use_linear_in_transformer:
        x = linear(p["proj_out"], x)
        x = x.reshape(b, h, w, c)
    else:
        x = x.reshape(b, h, w, c)
        x = conv2d(p["proj_out"], x, padding=0)
    return x + residual


def _legacy_attention_block(p, x, cfg):
    """LDM AttentionBlock (no-context UNets: LDSR's bsr model): GroupNorm →
    fused qkv 1x1 conv → self-attention → proj (reference
    ldm openaimodel AttentionBlock via extensions-builtin/LDSR)."""
    b, h, w, c = x.shape
    heads = cfg.heads_for(c)
    t = group_norm_p(p["norm"], x).reshape(b, h * w, c)
    wq = p["qkv"]["weight"]          # conv1d (3C, C, 1) torch layout kept
    qkv = t @ wq[:, :, 0].T.astype(t.dtype) + p["qkv"]["bias"].astype(t.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = attention(q, k, v, num_heads=heads)
    wo = p["proj_out"]["weight"]
    out = out @ wo[:, :, 0].T.astype(t.dtype) + p["proj_out"]["bias"].astype(t.dtype)
    return x + out.reshape(b, h, w, c)


def _apply_layers(plan, p, x, emb, context, cfg, hypernet=None):
    for slot, layer in enumerate(plan):
        sp = p[str(slot)]
        kind = layer[0]
        if kind == "conv_in":
            x = conv2d(sp, x, circular=cfg.tiling)
        elif kind == "res":
            x = _resblock(sp, x, emb, circular=cfg.tiling)
        elif kind == "attn":
            if "qkv" in sp:     # legacy AttentionBlock (context-free UNets)
                x = _legacy_attention_block(sp, x, cfg)
            else:
                # depth read from the params, not the plan: pruned variants
                # (SSD-1B, reference convert_sdxl_to_ssd,
                # modules/sd_hijack.py:191) shrink depth per BLOCK
                x = _spatial_transformer(sp, x, context, cfg,
                                         len(sp["transformer_blocks"]),
                                         hypernet)
        elif kind == "down":
            x = conv2d(sp["op"], x, stride=2, circular=cfg.tiling)
        elif kind == "up":
            x = conv2d(sp["conv"], upsample_nearest_2x(x), circular=cfg.tiling)
        else:  # pragma: no cover
            raise ValueError(kind)
    return x


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def apply(params, cfg: UNetConfig, x, timesteps, context, y=None, control=None,
          hypernet=None):
    """UNet forward.

    x: (B,H,W,C_in) latent; timesteps: (B,); context: (B,S,context_dim);
    y: (B, adm_in_channels) SDXL vector conds; control: optional dict with
    "input" (list, per input block) and "middle" residuals to add
    (ControlNet injection points, designed-in per SURVEY.md §7.8).

    fp8 weight storage (opts.fp8_storage): float8 leaves are upcast to the
    compute dtype here, inside jit — XLA fuses the convert into each
    consumer, so HBM keeps the half-size copies while the MXU sees bf16.
    """
    f8 = (jnp.float8_e4m3fn, jnp.float8_e5m2)
    params = jax.tree.map(
        lambda w: w.astype(jnp.bfloat16)
        if getattr(w, "dtype", None) in f8 else w, params)
    input_plan, middle_depth, output_plan, _ = build_plan(cfg)

    t_emb = timestep_embedding(timesteps, cfg.model_channels)
    emb = linear(params["time_embed"]["0"], t_emb)
    emb = linear(params["time_embed"]["2"], silu(emb))
    if cfg.adm_in_channels:
        assert y is not None, "this model requires vector conditioning y"
        le = params["label_emb"]["0"]
        ye = linear(le["0"], y.astype(emb.dtype))
        emb = emb + linear(le["2"], silu(ye))
    emb = emb.astype(x.dtype)
    context = context.astype(x.dtype) if context is not None else None

    hs = []
    h = x
    for i, plan in enumerate(input_plan):
        h = _apply_layers(plan, params["input_blocks"][str(i)], h, emb, context,
                          cfg, hypernet)
        if control is not None and "input" in control:
            h = h + control["input"][i]
        hs.append(h)

    mp = params["middle_block"]
    h = _resblock(mp["0"], h, emb, circular=cfg.tiling)
    if "1" in mp:       # SSD-1B deletes the middle attn + second res
        if "qkv" in mp["1"]:
            h = _legacy_attention_block(mp["1"], h, cfg)
        else:
            h = _spatial_transformer(mp["1"], h, context, cfg,
                                     len(mp["1"]["transformer_blocks"]),
                                     hypernet)
    if "2" in mp:
        h = _resblock(mp["2"], h, emb, circular=cfg.tiling)
    if control is not None and "middle" in control:
        h = h + control["middle"]

    for i, plan in enumerate(output_plan):
        h = jnp.concatenate([h, hs.pop()], axis=-1)
        h = _apply_layers(plan, params["output_blocks"][str(i)], h, emb, context,
                          cfg, hypernet)

    h = group_norm_p(params["out"]["0"], h, silu=True)
    return conv2d(params["out"]["2"], h, circular=cfg.tiling)


# --------------------------------------------------------------------------
# init (random weights — tests / bench; real weights come from checkpoints)
# --------------------------------------------------------------------------

def _init_resblock(ini, cin, cout, emb_dim, dtype):
    p = {
        "in_layers": {"0": ini.norm(cin, dtype), "2": ini.conv(3, 3, cin, cout, dtype)},
        "emb_layers": {"1": ini.linear(emb_dim, cout, dtype)},
        "out_layers": {"0": ini.norm(cout, dtype), "3": ini.conv(3, 3, cout, cout, dtype)},
    }
    if cin != cout:
        p["skip_connection"] = ini.conv(1, 1, cin, cout, dtype)
    return p


def _init_transformer(ini, c, depth, cfg: UNetConfig, dtype):
    inner = c
    ctx = cfg.context_dim
    blocks = {}
    for d in range(depth):
        blocks[str(d)] = {
            "norm1": ini.norm(c, dtype), "norm2": ini.norm(c, dtype),
            "norm3": ini.norm(c, dtype),
            "attn1": {
                "to_q": ini.linear(c, inner, dtype, bias=False),
                "to_k": ini.linear(c, inner, dtype, bias=False),
                "to_v": ini.linear(c, inner, dtype, bias=False),
                "to_out": {"0": ini.linear(inner, c, dtype)},
            },
            "attn2": {
                "to_q": ini.linear(c, inner, dtype, bias=False),
                "to_k": ini.linear(ctx, inner, dtype, bias=False),
                "to_v": ini.linear(ctx, inner, dtype, bias=False),
                "to_out": {"0": ini.linear(inner, c, dtype)},
            },
            "ff": {"net": {
                "0": {"proj": ini.linear(c, c * 8, dtype)},
                "2": ini.linear(c * 4, c, dtype),
            }},
        }
    if cfg.use_linear_in_transformer:
        proj = lambda ci, co: ini.linear(ci, co, dtype)
    else:
        proj = lambda ci, co: ini.conv(1, 1, ci, co, dtype)
    return {
        "norm": ini.norm(c, dtype),
        "proj_in": proj(c, inner),
        "proj_out": proj(inner, c),
        "transformer_blocks": blocks,
    }


def init_params(cfg: UNetConfig, key, dtype=jnp.bfloat16, ini=None):
    from sdwebui_tpu.models.init_utils import HostInit

    ini = ini or HostInit(key)
    input_plan, middle_depth, output_plan, _ = build_plan(cfg)
    ted = cfg.time_embed_dim

    def init_block(plan):
        out = {}
        for slot, layer in enumerate(plan):
            kind = layer[0]
            if kind == "conv_in":
                out[str(slot)] = ini.conv(3, 3, layer[1], layer[2], dtype)
            elif kind == "res":
                out[str(slot)] = _init_resblock(ini, layer[1], layer[2], ted, dtype)
            elif kind == "attn":
                out[str(slot)] = _init_transformer(ini, layer[1], layer[2], cfg, dtype)
            elif kind == "down":
                out[str(slot)] = {"op": ini.conv(3, 3, layer[1], layer[1], dtype)}
            elif kind == "up":
                out[str(slot)] = {"conv": ini.conv(3, 3, layer[1], layer[1], dtype)}
        return out

    params = {
        "time_embed": {"0": ini.linear(cfg.model_channels, ted, dtype),
                       "2": ini.linear(ted, ted, dtype)},
        "input_blocks": {str(i): init_block(plan) for i, plan in enumerate(input_plan)},
        "middle_block": {
            "0": _init_resblock(ini, _mid_ch(cfg), _mid_ch(cfg), ted, dtype),
            "1": _init_transformer(ini, _mid_ch(cfg), middle_depth, cfg, dtype),
            "2": _init_resblock(ini, _mid_ch(cfg), _mid_ch(cfg), ted, dtype),
        },
        "output_blocks": {str(i): init_block(plan) for i, plan in enumerate(output_plan)},
        "out": {"0": ini.norm(cfg.model_channels, dtype),
                "2": ini.conv(3, 3, cfg.model_channels, cfg.out_channels, dtype)},
    }
    if cfg.adm_in_channels:
        params["label_emb"] = {"0": {
            "0": ini.linear(cfg.adm_in_channels, ted, dtype),
            "2": ini.linear(ted, ted, dtype),
        }}
    return params


def _mid_ch(cfg: UNetConfig) -> int:
    return cfg.model_channels * cfg.channel_mult[-1]

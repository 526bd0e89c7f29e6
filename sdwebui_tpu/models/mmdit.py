"""SD3 MMDiT — NHWC JAX rebuild of the reference's in-repo model
(modules/models/sd3/mmdit.py, 622 LoC torch; arch: Esser et al. 2024,
"Scaling Rectified Flow Transformers").

Param tree mirrors the ``model.diffusion_model.*`` checkpoint layout:

    x_embedder.proj            2x2 patch conv (16 -> hidden)
    pos_embed                  (1, max_size², hidden) learned, center-cropped
    t_embedder.mlp.{0,2}       sinusoid(256) -> hidden MLP
    y_embedder.mlp.{0,2}       pooled text (2048) -> hidden MLP
    context_embedder           Linear(4096 -> hidden)
    joint_blocks.N.{context_block,x_block}.
        attn.{qkv,proj} [.ln_q/.ln_k rms]  adaLN_modulation.1  mlp.{fc1,fc2}
    final_layer.{adaLN_modulation.1, linear}

Joint attention concatenates context+image tokens through one flash/XLA
attention call per block; adaLN modulation conditions on t_emb + y_emb.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sdwebui_tpu.models.layers import layer_norm, linear, silu, timestep_embedding
from sdwebui_tpu.ops import attention


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    patch_size: int = 2
    in_channels: int = 16
    depth: int = 24                  # sd3-medium; hidden = 64*depth
    context_dim: int = 4096
    pooled_dim: int = 2048
    pos_embed_max_size: int = 192
    qk_norm: bool = False            # sd3.5 uses rms qk-norm

    @property
    def hidden(self) -> int:
        return 64 * self.depth

    @property
    def num_heads(self) -> int:
        return self.depth


def _mlp(p, x):
    h = jax.nn.gelu(linear(p["fc1"], x), approximate=True)
    return linear(p["fc2"], h)


def _rms_norm(p, x, eps=1e-6):
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if p is not None and "weight" in p:
        out = out * p["weight"].astype(jnp.float32)
    return out.astype(x.dtype)


def modulate(x, shift, scale):
    return x * (1 + scale[:, None]) + shift[:, None]


def _pre_attention(p, x, c_mods, cfg: MMDiTConfig, pre_only: bool):
    """(q,k,v) after adaLN-modulated norm; returns (qkv..., mods)."""
    n_mods = 2 if pre_only else 6
    mods = jnp.split(linear(p["adaLN_modulation"]["1"], silu(c_mods)),
                     n_mods, axis=-1)
    h = layer_norm(x, eps=1e-6)  # elementwise_affine=False
    h = modulate(h, mods[0], mods[1])
    qkv = linear(p["attn"]["qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if "ln_q" in p["attn"]:
        b, s, hd = q.shape
        d = hd // cfg.num_heads
        q = _rms_norm(p["attn"]["ln_q"], q.reshape(b, s, cfg.num_heads, d)).reshape(b, s, hd)
        k = _rms_norm(p["attn"]["ln_k"], k.reshape(b, s, cfg.num_heads, d)).reshape(b, s, hd)
    return q, k, v, mods


def _post_attention(p, attn_out, x, mods):
    gate_msa, shift_mlp, scale_mlp, gate_mlp = mods[2], mods[3], mods[4], mods[5]
    x = x + gate_msa[:, None] * linear(p["attn"]["proj"], attn_out)
    h = modulate(layer_norm(x, eps=1e-6), shift_mlp, scale_mlp)
    x = x + gate_mlp[:, None] * _mlp(p["mlp"], h)
    return x


def _joint_block(p, context, x, c_mods, cfg: MMDiTConfig, last: bool):
    ctx_pre_only = last
    cq, ck, cv, cmods = _pre_attention(p["context_block"], context, c_mods,
                                       cfg, ctx_pre_only)
    xq, xk, xv, xmods = _pre_attention(p["x_block"], x, c_mods, cfg, False)

    sc = context.shape[1]
    q = jnp.concatenate([cq, xq], axis=1)
    k = jnp.concatenate([ck, xk], axis=1)
    v = jnp.concatenate([cv, xv], axis=1)
    out = attention(q, k, v, num_heads=cfg.num_heads)
    ctx_attn, x_attn = out[:, :sc], out[:, sc:]

    x = _post_attention(p["x_block"], x_attn, x, xmods)
    if not ctx_pre_only:
        context = _post_attention(p["context_block"], ctx_attn, context, cmods)
    return context, x


def cropped_pos_embed(pos_embed, h_patches, w_patches, max_size):
    """Center-crop the learned (1, max², hidden) table to the image grid."""
    grid = pos_embed.reshape(max_size, max_size, -1)
    top = (max_size - h_patches) // 2
    left = (max_size - w_patches) // 2
    crop = grid[top: top + h_patches, left: left + w_patches]
    return crop.reshape(1, h_patches * w_patches, -1)


def apply(params, cfg: MMDiTConfig, x, timesteps, context, y):
    """x: (B,H,W,16) latent; timesteps (B,) in [0,1000]; context (B,S,4096);
    y (B,2048) pooled. Returns velocity prediction (B,H,W,16)."""
    b, h, w, _ = x.shape
    ps = cfg.patch_size
    hp, wp = h // ps, w // ps

    # patchify: 2x2 conv stride 2 == conv_general with stride ps
    xw = params["x_embedder"]["proj"]["weight"]
    xp = jax.lax.conv_general_dilated(
        x, xw.astype(x.dtype), (ps, ps), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xp = xp + params["x_embedder"]["proj"]["bias"].astype(x.dtype)
    xp = xp.reshape(b, hp * wp, cfg.hidden)
    pos = cropped_pos_embed(params["pos_embed"], hp, wp, cfg.pos_embed_max_size)
    xp = xp + pos.astype(xp.dtype)

    t_freq = timestep_embedding(timesteps, 256)
    t_emb = linear(params["t_embedder"]["mlp"]["2"],
                   silu(linear(params["t_embedder"]["mlp"]["0"],
                               t_freq.astype(xp.dtype))))
    c_mods = t_emb
    if y is not None and "y_embedder" in params:
        y_emb = linear(params["y_embedder"]["mlp"]["2"],
                       silu(linear(params["y_embedder"]["mlp"]["0"],
                                   y.astype(xp.dtype))))
        c_mods = c_mods + y_emb

    ctx = linear(params["context_embedder"], context.astype(xp.dtype))

    n_blocks = len(params["joint_blocks"])
    for i in range(n_blocks):
        ctx, xp = _joint_block(params["joint_blocks"][str(i)], ctx, xp, c_mods,
                               cfg, last=(i == n_blocks - 1))

    fl = params["final_layer"]
    shift, scale = jnp.split(
        linear(fl["adaLN_modulation"]["1"], silu(c_mods)), 2, axis=-1)
    out = modulate(layer_norm(xp, eps=1e-6), shift, scale)
    out = linear(fl["linear"], out)  # (B, hp*wp, ps*ps*out_ch)

    # unpatchify
    out_ch = out.shape[-1] // (ps * ps)
    out = out.reshape(b, hp, wp, ps, ps, out_ch)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp * ps, wp * ps, out_ch)
    return out


# --------------------------------------------------------------------------
# init (tiny, for tests)
# --------------------------------------------------------------------------

def init_params(cfg: MMDiTConfig, seed: int = 0, dtype=jnp.float32):
    from sdwebui_tpu.models.init_utils import HostInit

    ini = HostInit(seed)
    hd = cfg.hidden
    lin = lambda cin, cout: ini.linear(cin, cout, dtype)

    def dismantled(pre_only=False):
        p = {
            "attn": {"qkv": lin(hd, hd * 3), "proj": lin(hd, hd)},
            "adaLN_modulation": {"1": lin(hd, hd * (2 if pre_only else 6))},
        }
        if cfg.qk_norm:
            p["attn"]["ln_q"] = {"weight": np.ones(hd // cfg.num_heads, np.float32)}
            p["attn"]["ln_k"] = {"weight": np.ones(hd // cfg.num_heads, np.float32)}
        if not pre_only:
            p["mlp"] = {"fc1": lin(hd, hd * 4), "fc2": lin(hd * 4, hd)}
        return p

    blocks = {}
    for i in range(cfg.depth):
        blocks[str(i)] = {
            "context_block": dismantled(pre_only=(i == cfg.depth - 1)),
            "x_block": dismantled(False),
        }
    return {
        "x_embedder": {"proj": ini.conv(cfg.patch_size, cfg.patch_size,
                                        cfg.in_channels, hd, dtype)},
        "pos_embed": ini._normal((1, cfg.pos_embed_max_size ** 2, hd), 0.01, dtype),
        "t_embedder": {"mlp": {"0": lin(256, hd), "2": lin(hd, hd)}},
        "y_embedder": {"mlp": {"0": lin(cfg.pooled_dim, hd), "2": lin(hd, hd)}},
        "context_embedder": lin(cfg.context_dim, hd),
        "joint_blocks": blocks,
        "final_layer": {
            "adaLN_modulation": {"1": lin(hd, hd * 2)},
            "linear": lin(hd, cfg.patch_size ** 2 * cfg.in_channels),
        },
    }

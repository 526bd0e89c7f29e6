"""Normalization ops with fp32 statistics islands (NHWC layout).

GroupNorm(+SiLU) is the elementwise glue around every UNet/VAE ResBlock
(reference relies on cuDNN + torch eager; SURVEY.md §2.7 calls for a fused
TPU equivalent).  XLA already fuses `rsqrt`/mul/add chains into the
surrounding convs, so the default implementation is plain jnp with fp32
stats; a Pallas variant can slot in behind the same signature if profiling
shows the fusion boundary matters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm(x, weight, bias, num_groups: int = 32, eps: float = 1e-5,
               silu: bool = False):
    """x: (..., C) NHWC; weight/bias: (C,). Stats in fp32 over all but the
    batch dim, per channel-group.  Under spatial sharding
    (models/layers.spatial_sharding) each device holds an H-slice; the
    statistics psum over the mesh axis so the result is bit-comparable to
    the unsharded op."""
    from sdwebui_tpu.models.layers import spatial_axis

    # All big reductions stay in the native (..., C) layout: reshaping the
    # activation itself to (B, HW, g, C/g) puts C/g (=10 for SD's C=320) on
    # the lane axis and forces a full relayout of every activation twice —
    # measured ~2x on the whole UNet forward.  Instead reduce spatially to
    # per-channel sums (B, C), then group the tiny (B, C) tensor.
    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    g = num_groups
    xf = x.astype(jnp.float32)
    red_axes = tuple(range(1, x.ndim - 1))
    s1 = xf.sum(axis=red_axes)                       # (B, C)
    s2 = (xf * xf).sum(axis=red_axes)                # (B, C)
    n_spatial = 1
    for a in red_axes:
        n_spatial *= x.shape[a]
    sp_axis = spatial_axis()
    if sp_axis is not None:
        n_spatial = n_spatial * jax.lax.psum(1, sp_axis)
        s1 = jax.lax.psum(s1, sp_axis)
        s2 = jax.lax.psum(s2, sp_axis)
    cnt = n_spatial * (c // g)
    s1g = s1.reshape(b, g, c // g).sum(axis=-1)      # (B, g)
    s2g = s2.reshape(b, g, c // g).sum(axis=-1)
    mean_g = s1g / cnt
    var_g = s2g / cnt - mean_g * mean_g
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    mean_c = jnp.repeat(mean_g, c // g, axis=-1).reshape(shape)
    rstd_c = jnp.repeat(jax.lax.rsqrt(var_g + eps), c // g,
                        axis=-1).reshape(shape)
    out = (xf - mean_c) * rstd_c
    out = out * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(orig_dtype)


def layer_norm(x, weight=None, bias=None, eps: float = 1e-5):
    """LayerNorm over the last dim, fp32 stats."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = (xf - mean) / jnp.sqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)

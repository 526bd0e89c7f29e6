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

    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    g = num_groups
    xf = x.astype(jnp.float32).reshape(b, -1, g, c // g)
    sp_axis = spatial_axis()
    if sp_axis is not None:
        cnt = xf.shape[1] * xf.shape[3] * jax.lax.psum(1, sp_axis)
        s1 = jax.lax.psum(xf.sum(axis=(1, 3), keepdims=True), sp_axis)
        s2 = jax.lax.psum((xf * xf).sum(axis=(1, 3), keepdims=True), sp_axis)
        mean = s1 / cnt
        var = s2 / cnt - mean * mean
    else:
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(x.shape)
    out = xf * weight.astype(jnp.float32) + bias.astype(jnp.float32)
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

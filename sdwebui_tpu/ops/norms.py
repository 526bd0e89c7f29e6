"""Normalization ops with fp32 statistics islands (NHWC layout).

GroupNorm(+SiLU) is the elementwise glue around every UNet/VAE ResBlock and
LayerNorm brackets every transformer sub-block (reference relies on cuDNN +
torch eager; SURVEY.md §2.7 calls for a fused TPU equivalent).

Perf shape (measured on v5e, SDXL 1024² step trace): norm statistics were
~20% of UNet step time when computed as separate sum/var passes in fp32.
Both norms therefore use ONE paired reduce for (Σx, Σx²) — a single read of
the activation — and normalize as `x * scale + shift` with the per-row
affine folded to the input dtype, which XLA fuses into the consumer
(conv/GEMM operand read).  fp32 accumulation throughout; fp32 inputs keep a
bit-identical fp32 path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sum_and_sumsq(xf, axes):
    """(Σx, Σx²) over `axes` in ONE pass (variadic reduce — XLA fuses the
    square into the reduce so the activation is read once)."""
    zero = jnp.float32(0)
    return jax.lax.reduce((xf, xf * xf), (zero, zero),
                          lambda a, b: (a[0] + b[0], a[1] + b[1]), axes)


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
    b = x.shape[0]
    c = x.shape[-1]
    g = num_groups
    xf = x.astype(jnp.float32)
    red_axes = tuple(range(1, x.ndim - 1))
    s1, s2 = _sum_and_sumsq(xf, red_axes)            # (B, C) each
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
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # per-channel affine folded with the norm: out = x*scale + shift, cast
    # to the input dtype so the elementwise pass fuses into the consumer
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    wf = weight.astype(jnp.float32)
    bf = bias.astype(jnp.float32)
    mean_c = jnp.repeat(mean_g, c // g, axis=-1)
    rstd_c = jnp.repeat(rstd_g, c // g, axis=-1)
    scale = (rstd_c * wf).astype(x.dtype).reshape(shape)
    shift = (bf - mean_c * rstd_c * wf).astype(x.dtype).reshape(shape)
    out = x * scale + shift
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out


def _layer_norm_xla(x, weight=None, bias=None, eps: float = 1e-5):
    """jnp LayerNorm (CPU / fallback path): one-pass fp32 stats,
    input-dtype normalize."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    s1, s2 = _sum_and_sumsq(xf, (x.ndim - 1,))
    mean = s1 / c
    var = s2 / c - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    wf = (weight.astype(jnp.float32) if weight is not None
          else jnp.float32(1.0))
    bf = bias.astype(jnp.float32) if bias is not None else jnp.float32(0.0)
    scale = (rstd[..., None] * wf).astype(x.dtype)
    shift = (bf - mean[..., None] * rstd[..., None] * wf).astype(x.dtype)
    return x * scale + shift


def layer_norm(x, weight=None, bias=None, eps: float = 1e-5):
    """LayerNorm over the last dim, fp32 stats.

    Measured-and-rejected (r4): a fused one-pass Pallas kernel
    (ops/pallas_norms.py) runs the LN itself ~12x faster in isolation
    (1.4 ms vs ~18 ms of stats reduces per SDXL step), but routing the
    UNet's ~210 LayerNorms through it made the whole step ~9% SLOWER by
    device-side trace (122 → 134 ms): the pallas_call boundary blocks
    XLA from fusing the residual-add producers and GEMM consumers around
    each norm, and the extra materialized passes cost more than the
    kernel saves.  The jnp path (one paired-reduce pass + affine folded
    into the consumer) is the fastest in-context form found."""
    return _layer_norm_xla(x, weight, bias, eps=eps)

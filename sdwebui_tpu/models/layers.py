"""Primitive layer applications over ldm-shaped param subtrees.

Every function takes a param dict whose keys mirror the torch state-dict
entry names (``{"weight": ..., "bias": ...}``) with arrays already converted
to JAX layout by loader/convert.py:

    conv weight   (O,I,kh,kw) → (kh,kw,I,O)   NHWC / HWIO
    linear weight (O,I)       → (I,O)

so model code is a direct functional readout of the checkpoint structure —
no module classes, no name-mapping tables (design stance: SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sdwebui_tpu.ops.norms import group_norm, layer_norm  # noqa: F401 (re-export)

_CONV_DIMSPEC = ("NHWC", "HWIO", "NHWC")

# --------------------------------------------------------------------------
# spatial (context-parallel) sharding: when set, tensors inside the active
# shard_map hold an H-slice of the image; conv2d halo-exchanges boundary
# rows over the mesh axis and GroupNorm psums its statistics
# (parallel/spatial.py drives this; SURVEY.md §5's context-parallel upgrade)
# --------------------------------------------------------------------------

_SPATIAL_AXIS: list = [None]


def spatial_axis():
    return _SPATIAL_AXIS[0]


class spatial_sharding:
    """Context manager marking that ops run inside an H-sharded shard_map."""

    def __init__(self, axis_name: str):
        self.axis_name = axis_name

    def __enter__(self):
        _SPATIAL_AXIS[0] = self.axis_name
        return self

    def __exit__(self, *exc):
        _SPATIAL_AXIS[0] = None


def _halo_exchange_rows(x, pad: int, axis_name: str):
    """Prepend the previous shard's bottom `pad` rows and append the next
    shard's top rows (zeros at the image border — matches zero conv pad)."""
    n = jax.lax.psum(1, axis_name)
    if n == 1:
        return jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    from_above = jax.lax.ppermute(
        x[:, -pad:], axis_name, [(i, i + 1) for i in range(n - 1)])
    from_below = jax.lax.ppermute(
        x[:, :pad], axis_name, [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([from_above, x, from_below], axis=1)


def conv2d(p, x, stride: int = 1, padding: int = 1, circular: bool = False):
    """circular=True: wrap padding for seamless/tiling generation (the
    reference monkey-patches Conv2d padding_mode='circular',
    modules/sd_hijack.py:311 apply_circular; here it is an argument)."""
    w = p["weight"]
    sp_axis = spatial_axis()
    if sp_axis is not None and padding > 0 and stride == 1 and not circular:
        x = _halo_exchange_rows(x, padding, sp_axis)
        pad_cfg = ((0, 0), (padding, padding))
    elif circular and padding > 0:
        x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)),
                    mode="wrap")
        pad_cfg = ((0, 0), (0, 0))
    else:
        pad_cfg = ((padding, padding), (padding, padding))
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad_cfg,
        dimension_numbers=_CONV_DIMSPEC,
    )
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def linear(p, x):
    out = x @ p["weight"].astype(x.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def group_norm_p(p, x, num_groups: int = 32, silu: bool = False, eps: float = 1e-5):
    return group_norm(x, p["weight"], p["bias"], num_groups=num_groups,
                      eps=eps, silu=silu)


def layer_norm_p(p, x, eps: float = 1e-5):
    return layer_norm(x, p.get("weight"), p.get("bias"), eps=eps)


def embedding(p, ids):
    return jnp.take(p["weight"], ids, axis=0)


def silu(x):
    return x * jax.nn.sigmoid(x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def timestep_embedding(timesteps, dim: int, max_period: int = 10000):
    """ldm sinusoidal embedding: cat([cos, sin]) over log-spaced freqs.

    fp32 island — runs once per step, feeds the time MLP.
    """
    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def upsample_nearest_2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


# per-dim tap-combination map for fusing nearest-2x upsample into a 3x3
# conv: output parity a uses a 2-tap kernel over input offsets, each tap a
# sum of original taps ky (derived from up[r] = x[r//2]):
#   a=0: [w0, w1+w2]      a=1: [w0+w1, w2]
_UP2_M = np.zeros((2, 2, 3), np.float32)
_UP2_M[0, 0, 0] = 1
_UP2_M[0, 1, 1] = _UP2_M[0, 1, 2] = 1
_UP2_M[1, 0, 0] = _UP2_M[1, 0, 1] = 1
_UP2_M[1, 1, 2] = 1


def upsample2x_conv(p, x):
    """conv3x3(upsample_nearest_2x(x)) computed at the LOW resolution.

    Each output phase (a, b) = parity of the output pixel needs only a 2x2
    tap window of the original kernel (4 taps vs 36 on the upsampled grid —
    4.5x fewer flops, no 4x intermediate).  One conv with the four phase
    kernels stacked on out-channels, then an interleave.  Measured on v5e:
    the naive upsample+conv chain costs 20.5 ms at 256-512/C256/B4; the
    lhs_dilation form 10.4 ms; this form is the flop-optimal variant.
    """
    w = p["weight"]                                  # (3,3,C,Co)
    b, h, ww, c = x.shape
    co = w.shape[-1]
    m = jnp.asarray(_UP2_M, jnp.float32)
    # (a,b,ta,tb,C,Co): phase kernels
    wp = jnp.einsum("atk,bsl,klcd->abtscd", m, m, w.astype(jnp.float32))
    # stack phases on out-channels: (2,2,C,4Co), phase index = 2a+b
    wcat = wp.transpose(2, 3, 4, 0, 1, 5).reshape(2, 2, c, 4 * co)
    full = jax.lax.conv_general_dilated(
        x, wcat.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=_CONV_DIMSPEC)
    # full: (B, H+1, W+1, 4Co); phase (a,b) lives at rows a:a+H, cols b:b+W
    phases = [full[:, a:a + h, bb:bb + ww, (2 * a + bb) * co:(2 * a + bb + 1) * co]
              for a in (0, 1) for bb in (0, 1)]
    t = jnp.stack(phases, axis=0).reshape(2, 2, b, h, ww, co)
    out = t.transpose(2, 3, 0, 4, 1, 5).reshape(b, 2 * h, 2 * ww, co)
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out

"""Fused one-pass LayerNorm Pallas kernel — MEASURED-AND-REJECTED for the
UNet hot path; kept for standalone use and as the record of the experiment.

Motivation (SDXL 1024² UNet step trace, r4): the ~210 transformer
LayerNorms per step cost ~18 ms as XLA stats reduces.  This kernel does
stats + normalize in one VMEM-resident pass (1.4 ms/step for the same
work — visible as `_ln_2d` in the trace).  BUT routing the UNet through
it made the whole step ~9% SLOWER by device-side trace (122 → 134 ms):
the pallas_call boundary stops XLA from fusing the residual-add producers
and GEMM consumers around each norm, and those extra materialized passes
cost more than the kernel saves.  ops/norms.layer_norm therefore stays on
the jnp path; see its docstring.

The reference leans on torch.nn.LayerNorm/cuDNN for the same op
(ldm/sgm transformer blocks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)              # (R, C)
    c = x.shape[-1]
    mean = jnp.sum(x, axis=-1, keepdims=True) / c
    var = jnp.sum(x * x, axis=-1, keepdims=True) / c - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    out = (x - mean) * rstd * w_ref[...].astype(jnp.float32) \
        + b_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows",
                                             "interpret"))
def _ln_2d(x2, w2, b2, eps: float, block_rows: int, interpret: bool):
    rows, c = x2.shape
    nr = (rows + block_rows - 1) // block_rows
    padded = nr * block_rows
    xp = jnp.pad(x2, ((0, padded - rows), (0, 0))) if padded != rows else x2
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(nr,),
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((padded, c), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * padded * c,
            bytes_accessed=2 * padded * c * x2.dtype.itemsize,
            transcendentals=padded,
        ),
        interpret=interpret,
    )(xp, w2, b2)
    return out[:rows] if padded != rows else out


def layer_norm_pallas(x, weight=None, bias=None, eps: float = 1e-5,
                      block_rows: int = 512, interpret: bool = False):
    """LayerNorm over the last dim of any (…, C) tensor.

    C needs no 128-alignment (Mosaic pads lane tiles internally and the
    reductions run over the logical C columns only).  Rows are padded to
    the block size; padding rows normalize garbage that is sliced away.
    """
    c = x.shape[-1]
    w2 = (weight if weight is not None
          else jnp.ones((c,), jnp.float32)).reshape(1, c)
    b2 = (bias if bias is not None
          else jnp.zeros((c,), jnp.float32)).reshape(1, c)
    x2 = x.reshape(-1, c)
    # small row counts: grid/pad overhead beats the fused pass
    br = min(block_rows, max(16, x2.shape[0]))
    out = _ln_2d(x2, w2, b2, eps, br, interpret)
    return out.reshape(x.shape)

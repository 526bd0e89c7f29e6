"""Pallas TPU 3×3 convolution — shift-and-accumulate implicit GEMM.

STATUS: measured SLOWER than XLA's native conv and therefore NOT wired
into models/layers.conv2d.  On the bench chip (2026-08-17, bf16):

    8×64×64×320→320:   XLA 0.314 ms (192 TF/s)  this kernel 0.629 ms
    8×32×32×640→640:   XLA 0.264 ms (229 TF/s)  this kernel 0.338 ms
    8×16×16×1280→1280: XLA 0.267 ms (227 TF/s)  this kernel 0.608 ms

XLA's conv emitter is already near the MXU ceiling at these shapes — the
UNet's hot-path budget goes elsewhere (see ops/flash_attention.py).  Kept
(with tests) as the substrate for a future fused GroupNorm+SiLU+conv
experiment, where the win would come from eliminating memory passes, not
from the GEMM itself.

The kernel reformulates the 3×3/stride-1/pad-1 conv as 9 shifted
(rows·W, Cin) @ (Cin, Cout) matmuls accumulated in VMEM — each tap is a
dense MXU GEMM with K=Cin, N=Cout (ceiling (C/⌈C/128⌉·128)² utilisation),
with no im2col materialisation and the full weight tensor resident in VMEM
across grid steps.

Layout: NHWC in, HWIO weights (the repo's standard — models/layers.py).
The input is pre-padded and row-windowed outside the kernel into
non-overlapping (rows+2, W+2, Cin) blocks so standard BlockSpec pipelining
double-buffers the activation DMAs (the window copy is one cheap XLA gather,
~1.1× input bytes).

Replaces (when enabled) the cuDNN convs the reference leans on implicitly
through torch (SURVEY.md §2.7 native-equivalent checklist).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, o_ref, *, rows: int, width: int,
            has_bias: bool):
    xb = x_ref[0]                                   # (rows+2, W+2, Cin)
    cout = o_ref.shape[-1]
    acc = jnp.zeros((rows * width, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = xb[dy:dy + rows, dx:dx + width, :]
            xs = xs.reshape(rows * width, xb.shape[-1])
            acc = acc + jnp.dot(xs, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    if has_bias:
        acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.reshape(rows, width, cout).astype(o_ref.dtype)


def _pick_rows(h: int, w: int, cin: int, cout: int, itemsize: int) -> int:
    """Largest row-block whose VMEM working set fits comfortably."""
    budget = 12 * 1024 * 1024
    weights = 9 * cin * cout * itemsize
    rows = h
    while rows > 1:
        if h % rows == 0:
            in_blk = 2 * (rows + 2) * (w + 2) * cin * itemsize
            out_blk = 2 * rows * w * cout * itemsize
            acc = rows * w * cout * 4
            if weights + in_blk + out_blk + acc <= budget:
                return rows
        rows -= 1
    return 1


@functools.partial(jax.jit, static_argnames=("interpret", "block_rows"))
def conv3x3(x, w, b=None, *, block_rows: int | None = None,
            interpret: bool = False):
    """3×3 stride-1 pad-1 conv: x (B,H,W,Cin), w (3,3,Cin,Cout) → NHWC."""
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    itemsize = jnp.dtype(x.dtype).itemsize
    rows = block_rows or _pick_rows(h, wd, cin, cout, itemsize)
    nb = h // rows
    assert h % rows == 0, (h, rows)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # overlapping row windows → non-overlapping blocks (B·nb, rows+2, W+2, C)
    if nb > 1:
        idx = (np.arange(nb)[:, None] * rows
               + np.arange(rows + 2)[None, :]).reshape(-1)
        win = xp[:, jnp.asarray(idx)]
        win = win.reshape(bsz * nb, rows + 2, wd + 2, cin)
    else:
        win = xp

    has_bias = b is not None
    if b is None:
        b = jnp.zeros((cout,), x.dtype)
    b2 = b.reshape(1, cout)

    kernel = functools.partial(_kernel, rows=rows, width=wd,
                               has_bias=has_bias)
    out = pl.pallas_call(
        kernel,
        grid=(bsz * nb,),
        in_specs=[
            pl.BlockSpec((1, rows + 2, wd + 2, cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, wd, cout), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz * nb, rows, wd, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wd * 9 * cin * cout,
            bytes_accessed=(win.size + w.size) * itemsize
            + bsz * h * wd * cout * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(win, w.astype(x.dtype), b2)
    return out.reshape(bsz, h, wd, cout)

"""Pallas TPU FlashAttention — the cross-attention kernel of the framework.

TPU-native replacement for the reference's pluggable CUDA attention backends
(xformers / torch SDPA / Doggettx / sub-quadratic chunking,
modules/sd_hijack_optimizations.py, modules/sub_quadratic_attention.py —
see SURVEY.md §2.7).  Those are all ways of never materializing the
(Sq, Skv) score matrix in slow memory; blockwise online softmax is the same
math done once, properly, on the MXU:

- grid (batch*heads, q_blocks, kv_blocks); kv is the innermost sequential
  dimension so Pallas double-buffers the K/V block DMAs against compute
- fp32 running max / denominator / accumulator in VMEM scratch
- bf16 matmuls on the MXU with fp32 accumulation
  (`preferred_element_type`)
- head_dim and sequence lengths are zero-padded to lane/block multiples
  outside the kernel; kv padding is masked with -inf inside

Shapes are static under jit, so block geometry is chosen per-compile from
the real (Sq, Skv, D) — UNet self-attention (S up to 16k, D 40..160),
cross-attention (Skv = 77·chunks), and the VAE's single-head S=4096/D=512
mid-block attention all map onto the same kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30  # large-but-finite: keeps fully-masked rows NaN-free


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
            *, scale: float, kv_len: int, block_kv: int, num_kv_blocks: int,
            kv_grid_axis: int = 2):
    j = pl.program_id(kv_grid_axis)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (Bq, Dp)
    k = k_ref[0]  # (Bk, Dp)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale  # (Bq, Bk) fp32

    if kv_len % block_kv != 0:  # static: mask only if padding exists
        col = j * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scr[:, :1]                       # (Bq, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                      # (Bq, Bk) fp32

    l_scr[:, :1] = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:, :1] = m_new
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == num_kv_blocks - 1)
    def _finish():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def _kernel_single_kv(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                      kv_len: int, block_kv: int):
    """One kv block covers the whole sequence (cross-attention, Skv≤block):
    the softmax is exact in one pass, so the running-max/denominator scratch
    and the rescale of the accumulator are pure overhead — do the whole
    softmax in registers and write out directly."""
    q = q_ref[0]  # (Bq, D)
    k = k_ref[0]  # (Bk, D)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale  # (Bq, Bk) fp32

    if kv_len % block_kv != 0:  # static: mask only if padding exists
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (acc / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv", "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    scale: float | None = None,
                    block_q: int = 1024, block_kv: int = 1024,
                    interpret: bool = False) -> jax.Array:
    """Softmax(q kᵀ · scale) v over (BH, S, D) tensors.

    q: (BH, Sq, D); k, v: (BH, Skv, D).  Returns (BH, Sq, D) in q's dtype.
    """
    bh, sq, d = q.shape
    _, skv, _ = k.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    # head_dim rides UNPADDED through HBM — Mosaic tiles the trailing dim to
    # 128 lanes in VMEM by itself, so padding d in HBM only inflated DMA
    # traffic (3.2x for SD1.5's d=40; measured 4.02→3.68 ms at S=4096) and
    # materialized 3 padded copies.  dp below is only the VMEM-footprint
    # estimate for block sizing.
    dp = _round_up(d, 128)
    bq = min(block_q, _round_up(sq, 16))
    bk = min(block_kv, _round_up(skv, 16))
    if _round_up(skv, 16) <= block_kv:
        # single kv block (cross-attention, Skv=77·chunks): the score block
        # is only (bq, bk≤block_kv), so a whole-sequence q block amortizes
        # grid/scratch overhead — measured 0.73→0.49 ms at (64,4096,40)/77
        # (bq 1024→4096); bk=2048 for self-attention measured SLOWER
        # (4.30 vs 4.14 ms), so only the small-skv case changes
        bq = min(_round_up(sq, 16), 4096)
    # shrink blocks until the VMEM working set fits (double-buffered input
    # blocks + fp32 accumulator + score matrix); large-dp fp32 cases (VAE
    # mid-attention at batch>1) exceed 16MB at the default 1024² blocks
    itemsize = jnp.dtype(q.dtype).itemsize
    def vmem_bytes(bq_, bk_):
        return (2 * bq_ * dp * itemsize      # q double-buffered
                + 2 * 2 * bk_ * dp * itemsize  # k, v double-buffered
                + 2 * bq_ * dp * itemsize    # out
                + bq_ * dp * 4               # fp32 accumulator
                + 2 * bq_ * 128 * 4          # m, l scratch
                + bq_ * bk_ * 4)             # score block
    while vmem_bytes(bq, bk) > 13 * 1024 * 1024 and (bq > 256 or bk > 256):
        if bk >= bq and bk > 256:
            bk //= 2
        else:
            bq //= 2
    sq_p = _round_up(sq, bq)
    skv_p = _round_up(skv, bk)

    qp = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, skv_p - skv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, skv_p - skv), (0, 0)))

    nq = sq_p // bq
    nk = skv_p // bk

    cost = pl.CostEstimate(
        flops=4 * bh * sq_p * skv_p * dp,
        bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
        transcendentals=bh * sq_p * skv_p,
    )
    if nk == 1:
        out = pl.pallas_call(
            functools.partial(_kernel_single_kv, scale=scale, kv_len=skv,
                              block_kv=bk),
            grid=(bh, nq),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, bk, d), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((1, bk, d), lambda b, i: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(qp, kp, vp)
        return out[:, :sq]

    kernel = functools.partial(
        _kernel, scale=scale, kv_len=skv, block_kv=bk, num_kv_blocks=nk)

    out = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),   # running max (col 0 used)
            pltpu.VMEM((bq, 128), jnp.float32),   # running denominator
            pltpu.VMEM((bq, d), jnp.float32),     # output accumulator
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(qp, kp, vp)

    return out[:, :sq]


def _kernel_packed(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                   scale: float, kv_len: int, block_kv: int,
                   num_kv_blocks: int, head_dim: int, heads: int):
    """Multi-head block: q/k/v blocks are (bq, heads·head_dim) lane-packed
    slabs of the un-split (B, S, H·D) tensors; each head is a static lane
    slice.  The per-head online-softmax math is identical to _kernel."""
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qb = q_ref[0]  # (Bq, heads·D)
    kb = k_ref[0]  # (Bk, heads·D)
    vb = v_ref[0]

    for hh in range(heads):
        sl = slice(hh * head_dim, (hh + 1) * head_dim)
        s = jax.lax.dot_general(
            qb[:, sl], kb[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (Bq, Bk) fp32

        if kv_len % block_kv != 0:
            col = (j * block_kv
                   + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
            s = jnp.where(col < kv_len, s, _NEG_INF)

        m_prev = m_scr[hh, :, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)

        l_scr[hh, :, :1] = (alpha * l_scr[hh, :, :1]
                            + jnp.sum(p, axis=1, keepdims=True))
        m_scr[hh, :, :1] = m_new
        acc_scr[hh] = acc_scr[hh] * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == num_kv_blocks - 1)
    def _finish():
        parts = [(acc_scr[hh] / jnp.maximum(l_scr[hh, :, :1], 1e-30))
                 for hh in range(heads)]
        o_ref[0] = jnp.concatenate(parts, axis=1).astype(o_ref.dtype)


def _kernel_packed_single_kv(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                             kv_len: int, block_kv: int, head_dim: int,
                             heads: int):
    """Packed-head variant of _kernel_single_kv: exact one-pass softmax per
    head, no scratch (cross-attention, Skv ≤ block)."""
    qb = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]

    parts = []
    for hh in range(heads):
        sl = slice(hh * head_dim, (hh + 1) * head_dim)
        s = jax.lax.dot_general(
            qb[:, sl], kb[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

        if kv_len % block_kv != 0:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)

        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
        acc = jax.lax.dot_general(
            p.astype(vb.dtype), vb[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        parts.append(acc / denom)
    o_ref[0] = jnp.concatenate(parts, axis=1).astype(o_ref.dtype)


def packed_heads_per_block(head_dim: int, num_heads: int) -> int | None:
    """Heads per 128-lane-aligned block, or None if the packed layout can't
    lower: the block's lane width (heads·head_dim) must be a multiple of
    128 (Mosaic block-shape rule) and divide the head count evenly."""
    hp = 1
    while (head_dim * hp) % 128 != 0:
        hp += 1
        if hp > num_heads:
            return None
    return hp if num_heads % hp == 0 else None


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "scale", "block_q",
                                    "block_kv", "interpret"))
def flash_attention_packed(q: jax.Array, k: jax.Array, v: jax.Array, *,
                           num_heads: int, scale: float | None = None,
                           block_q: int = 1024, block_kv: int = 1024,
                           interpret: bool = False) -> jax.Array:
    """Flash attention directly over head-PACKED (B, S, H·D) tensors.

    The (B, S, H·D) → (B·H, S, D) relayout the 3D entry point needs is a
    real HBM copy of q/k/v/out per attention (~9 ms per SDXL step); Mosaic
    rejects the per-head (…, 1, d) blocks a 4D layout would need (see
    flash_attention_4d).  This kernel blocks the LANE dim at
    heads_per_block·D = a multiple of 128 instead — for SDXL's d=64 a block
    carries 2 heads — so the tensors are consumed exactly as the QKV
    projections produce them, no transpose ever materializes, and each head
    is a static lane slice inside the kernel."""
    b, sq, hd = q.shape
    _, skv, _ = k.shape
    d = hd // num_heads
    hp = packed_heads_per_block(d, num_heads)
    if hp is None:
        raise ValueError(f"head_dim {d} × heads {num_heads} has no "
                         f"128-aligned packing")
    width = d * hp
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    bq = min(block_q, _round_up(sq, 16))
    bk = min(block_kv, _round_up(skv, 16))
    if _round_up(skv, 16) <= block_kv:
        bq = min(_round_up(sq, 16), 4096)
    itemsize = jnp.dtype(q.dtype).itemsize

    def vmem_bytes(bq_, bk_):
        return (2 * bq_ * width * itemsize      # q double-buffered
                + 2 * 2 * bk_ * width * itemsize  # k, v double-buffered
                + 2 * bq_ * width * itemsize    # out
                + hp * bq_ * d * 4              # fp32 accumulators
                + 2 * hp * bq_ * 128 * 4        # m, l scratch
                + hp * bq_ * bk_ * 4)           # per-head live score blocks

    while vmem_bytes(bq, bk) > 13 * 1024 * 1024 and (bq > 256 or bk > 256):
        if bk >= bq and bk > 256:
            bk //= 2
        else:
            bq //= 2
    sq_p = _round_up(sq, bq)
    skv_p = _round_up(skv, bk)

    qp = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, skv_p - skv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, skv_p - skv), (0, 0)))

    nq = sq_p // bq
    nk = skv_p // bk
    ng = num_heads // hp

    cost = pl.CostEstimate(
        flops=4 * b * num_heads * sq_p * skv_p * _round_up(d, 128),
        bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
        transcendentals=b * num_heads * sq_p * skv_p,
    )
    if nk == 1:
        out = pl.pallas_call(
            functools.partial(_kernel_packed_single_kv, scale=scale,
                              kv_len=skv, block_kv=bk, head_dim=d, heads=hp),
            grid=(b, ng, nq),
            in_specs=[
                pl.BlockSpec((1, bq, width), lambda bb, g, i: (bb, i, g)),
                pl.BlockSpec((1, bk, width), lambda bb, g, i: (bb, 0, g)),
                pl.BlockSpec((1, bk, width), lambda bb, g, i: (bb, 0, g)),
            ],
            out_specs=pl.BlockSpec((1, bq, width),
                                   lambda bb, g, i: (bb, i, g)),
            out_shape=jax.ShapeDtypeStruct((b, sq_p, hd), q.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(qp, kp, vp)
        return out[:, :sq]

    kernel = functools.partial(
        _kernel_packed, scale=scale, kv_len=skv, block_kv=bk,
        num_kv_blocks=nk, head_dim=d, heads=hp)
    out = pl.pallas_call(
        kernel,
        grid=(b, ng, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, width), lambda bb, g, i, j: (bb, i, g)),
            pl.BlockSpec((1, bk, width), lambda bb, g, i, j: (bb, j, g)),
            pl.BlockSpec((1, bk, width), lambda bb, g, i, j: (bb, j, g)),
        ],
        out_specs=pl.BlockSpec((1, bq, width),
                               lambda bb, g, i, j: (bb, i, g)),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((hp, bq, 128), jnp.float32),  # running max (col 0)
            pltpu.VMEM((hp, bq, 128), jnp.float32),  # running denominator
            pltpu.VMEM((hp, bq, d), jnp.float32),    # output accumulators
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :sq]


def _kernel_single_kv_4d(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len,
                         block_kv):
    _kernel_single_kv(q_ref.at[:, :, 0], k_ref.at[:, :, 0], v_ref.at[:, :, 0],
                      o_ref.at[:, :, 0], scale=scale, kv_len=kv_len,
                      block_kv=block_kv)


def _kernel_4d(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
               scale, kv_len, block_kv, num_kv_blocks):
    _kernel(q_ref.at[:, :, 0], k_ref.at[:, :, 0], v_ref.at[:, :, 0],
            o_ref.at[:, :, 0], m_scr, l_scr, acc_scr, scale=scale,
            kv_len=kv_len, block_kv=block_kv, num_kv_blocks=num_kv_blocks,
            kv_grid_axis=3)


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_q", "block_kv",
                                    "interpret"))
def flash_attention_4d(q: jax.Array, k: jax.Array, v: jax.Array, *,
                       scale: float | None = None,
                       block_q: int = 1024, block_kv: int = 1024,
                       interpret: bool = False) -> jax.Array:
    """Softmax(q kᵀ · scale) v over HEAD-INTERLEAVED (B, S, H, D) tensors.

    The (B, S, H·D) → (B·H, S, D) relayout the 3D entry point needs is a
    real HBM copy of q/k/v/out per attention (~9 ms/step on the SDXL trace).
    Here the head dim stays in place — the grid indexes (batch, head) and
    each block DMA reads the (bq, d) rows strided across H, so no transpose
    is ever materialized.  Same kernels, same math.

    STATUS (r4): compiled TPU lowering is BLOCKED — Mosaic requires the
    last two block dims to be 8/128-divisible or equal to the array dims,
    and the per-head (1, bq, 1, d) blocks violate that.  Works in
    interpret mode (parity-tested); revisit if Pallas lifts the
    constraint.  ops/attention.attention keeps the 3D split/merge path.
    """
    b, sq, h, d = q.shape
    _, skv, _, _ = k.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    dp = _round_up(d, 128)
    bq = min(block_q, _round_up(sq, 16))
    bk = min(block_kv, _round_up(skv, 16))
    if _round_up(skv, 16) <= block_kv:
        bq = min(_round_up(sq, 16), 4096)
    itemsize = jnp.dtype(q.dtype).itemsize

    def vmem_bytes(bq_, bk_):
        return (2 * bq_ * dp * itemsize
                + 2 * 2 * bk_ * dp * itemsize
                + 2 * bq_ * dp * itemsize
                + bq_ * dp * 4
                + 2 * bq_ * 128 * 4
                + bq_ * bk_ * 4)

    while vmem_bytes(bq, bk) > 13 * 1024 * 1024 and (bq > 256 or bk > 256):
        if bk >= bq and bk > 256:
            bk //= 2
        else:
            bq //= 2
    sq_p = _round_up(sq, bq)
    skv_p = _round_up(skv, bk)
    qp = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, skv_p - skv), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, skv_p - skv), (0, 0), (0, 0)))
    nq = sq_p // bq
    nk = skv_p // bk

    cost = pl.CostEstimate(
        flops=4 * b * h * sq_p * skv_p * dp,
        bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
        transcendentals=b * h * sq_p * skv_p,
    )
    if nk == 1:
        out = pl.pallas_call(
            functools.partial(_kernel_single_kv_4d, scale=scale, kv_len=skv,
                              block_kv=bk),
            grid=(b, h, nq),
            in_specs=[
                pl.BlockSpec((1, bq, 1, d), lambda bb, hh, i: (bb, i, hh, 0)),
                pl.BlockSpec((1, bk, 1, d), lambda bb, hh, i: (bb, 0, hh, 0)),
                pl.BlockSpec((1, bk, 1, d), lambda bb, hh, i: (bb, 0, hh, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, 1, d),
                                   lambda bb, hh, i: (bb, i, hh, 0)),
            out_shape=jax.ShapeDtypeStruct((b, sq_p, h, d), q.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(qp, kp, vp)
        return out[:, :sq]

    kernel = functools.partial(
        _kernel_4d, scale=scale, kv_len=skv, block_kv=bk, num_kv_blocks=nk)
    out = pl.pallas_call(
        kernel,
        grid=(b, h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, 1, d), lambda bb, hh, i, j: (bb, i, hh, 0)),
            pl.BlockSpec((1, bk, 1, d), lambda bb, hh, i, j: (bb, j, hh, 0)),
            pl.BlockSpec((1, bk, 1, d), lambda bb, hh, i, j: (bb, j, hh, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, 1, d),
                               lambda bb, hh, i, j: (bb, i, hh, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, h, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :sq]

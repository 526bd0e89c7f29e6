"""Attention dispatch: Pallas flash kernel on TPU, fused XLA path elsewhere.

Replaces the reference's runtime-pluggable optimizer registry
(`list_optimizers`, modules/sd_hijack_optimizations.py:146): instead of
monkey-patching `CrossAttention.forward`, model code calls
:func:`attention` and the best implementation is chosen per-backend at
trace time.  Selection can be forced via ``set_attention_impl`` (mirrors
the `--opt-...`/settings override surface).
"""

from __future__ import annotations

import contextlib
import math

import jax
import jax.numpy as jnp

from sdwebui_tpu.ops.flash_attention import (flash_attention,
                                             flash_attention_packed,
                                             packed_heads_per_block)
from sdwebui_tpu.utils import devices

_FORCED: str | None = None  # None = auto, else "flash" | "flash-packed" | "xla"

#: auto policy for the lane-packed kernel (no head split/merge relayout):
#: flipped by measurement — see tools/bench_attn_layout.py.  Packing ≤2
#: heads per block (d ≥ 64) keeps full-width MXU operands; wider packs
#: (d=40 → 16 heads/block) shrink each matmul and need measuring first.
_PACKED_AUTO_MAX_HEADS_PER_BLOCK = 2


def set_attention_impl(name: str | None) -> None:
    if name not in (None, "auto", "flash", "flash-packed", "xla"):
        raise ValueError(f"unknown attention impl {name!r}")
    global _FORCED
    _FORCED = None if name in (None, "auto") else name


def get_forced_impl() -> str | None:
    return _FORCED


def training_attention_ctx():
    """Context for UNet calls inside training loss functions (entered at
    trace time, so the choice bakes into the compiled step).  Default
    (training_xattention_optimizations=False): force the plain XLA
    attention — the Pallas flash kernel has no VJP and grads through it
    fail on TPU.  True opts back into the optimized kernels (reference
    modules/shared_options.py training section)."""
    from sdwebui_tpu.utils.options import opts

    if bool(opts.get("training_xattention_optimizations", False)):
        return contextlib.nullcontext()
    return forced_impl("xla")


@contextlib.contextmanager
def forced_impl(name: str | None):
    """Force an implementation for code traced inside the block.

    Training uses this: the Pallas flash kernel has no VJP, so
    differentiating through it fails — training jits trace under "xla"
    unless opts.training_xattention_optimizations asks for the optimized
    kernels (the reference's option has the same motivation: optimized
    attention breaking training, modules/shared_options.py training
    section)."""
    global _FORCED
    prev = _FORCED
    set_attention_impl(name)
    try:
        yield
    finally:
        _FORCED = prev


def _use_packed(d: int, num_heads: int) -> bool:
    hp = packed_heads_per_block(d, num_heads)
    if hp is None or not devices.supports_pallas():
        return False
    if _FORCED == "flash-packed":
        return True
    if _FORCED in ("flash", "xla"):
        return False
    return hp <= _PACKED_AUTO_MAX_HEADS_PER_BLOCK


def _use_flash(skv: int) -> bool:
    if _FORCED == "flash":
        return True
    if _FORCED == "xla":
        return False
    # Measured on v5e (bq=bk=1024): flash wins for every SD self-attention
    # shape (0.96ms vs 2.97ms at S=4096/d40); XLA wins for the 77·chunks
    # cross-attention where the score matrix is tiny and fits in registers.
    return devices.supports_pallas() and skv >= 1024


def xla_attention(q, k, v, scale=None):
    """Plain fused attention: XLA handles this well for short kv (77-token
    cross attention) and it is the CPU/test path. fp32 softmax."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v)


def attention(q, k, v, num_heads: int | None = None, scale=None):
    """Multi-head attention on (B, S, H*D) or (BH, S, D) tensors.

    If ``num_heads`` is given, inputs are (B, S, H*D): split → attend → merge
    (the layout UNet transformer blocks carry).  Otherwise inputs are already
    (BH, S, D).
    """
    if num_heads is not None:
        b, sq, hd = q.shape
        skv = k.shape[1]
        d = hd // num_heads
        # Lane-packed path: consume (B, S, H·D) as produced by the QKV
        # projections — the head split/merge relayouts below are real HBM
        # copies (~9 ms per SDXL step).  A head-interleaved 4D kernel
        # (flash_attention_4d) could not lower (Mosaic rejects per-head
        # (…, 1, d) blocks); packing heads to 128-lane multiples satisfies
        # the block rule instead.
        if _use_packed(d, num_heads) and \
                (_use_flash(skv) or _FORCED == "flash-packed"):
            return flash_attention_packed(q, k, v, num_heads=num_heads,
                                          scale=scale)
        split = lambda t, s: t.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3).reshape(b * num_heads, s, d)
        out = attention(split(q, sq), split(k, skv), split(v, skv), scale=scale)
        return out.reshape(b, num_heads, sq, d).transpose(0, 2, 1, 3).reshape(b, sq, hd)

    if _use_flash(k.shape[1]):
        return flash_attention(q, k, v, scale=scale)
    return xla_attention(q, k, v, scale=scale)

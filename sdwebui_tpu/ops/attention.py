"""Attention dispatch: Pallas flash kernel on TPU, fused XLA path elsewhere.

Replaces the reference's runtime-pluggable optimizer registry
(`list_optimizers`, modules/sd_hijack_optimizations.py:146): instead of
monkey-patching `CrossAttention.forward`, model code calls
:func:`attention` and the best implementation is chosen per-backend at
trace time.  Selection can be forced via ``set_attention_impl`` (mirrors
the `--opt-...`/settings override surface).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from sdwebui_tpu.ops.flash_attention import flash_attention
from sdwebui_tpu.utils import devices

_FORCED: str | None = None  # None = auto, else "flash" | "xla"


def set_attention_impl(name: str | None) -> None:
    if name not in (None, "auto", "flash", "xla"):
        raise ValueError(f"unknown attention impl {name!r}")
    global _FORCED
    _FORCED = None if name in (None, "auto") else name


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
        # NOTE: a head-interleaved 4D kernel (flash_attention_4d) was built
        # to kill these split/merge relayout copies (~9 ms per SDXL step),
        # but Mosaic rejects per-head blocks — the last two block dims must
        # be 8/128-divisible or equal to the array dims, and (…, 1, d)
        # blocks over (B, S, H, D) violate that.  Measured r4; the 4D entry
        # point remains for interpret-mode/API use only.
        split = lambda t, s: t.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3).reshape(b * num_heads, s, d)
        out = attention(split(q, sq), split(k, skv), split(v, skv), scale=scale)
        return out.reshape(b, num_heads, sq, d).transpose(0, 2, 1, 3).reshape(b, sq, hd)

    if _use_flash(k.shape[1]):
        return flash_attention(q, k, v, scale=scale)
    return xla_attention(q, k, v, scale=scale)

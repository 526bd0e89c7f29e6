"""Device-side Philox4x32-10 gaussian noise — the TPU-native randn source.

The reference's default ``randn_source`` is **GPU**: noise comes from the
accelerator's own generator and is vendor-specific (modules/shared_options
"changes seeds drastically").  This module is the TPU analog, selected with
``randn_source = "TPU"``: the SAME Philox4x32-10 counter stream as the host
"NV" implementation (:mod:`sdwebui_tpu.rng.philox`, bit-exact integer
words), with the Box–Muller transform evaluated in float32 on device (TPUs
have no float64 — outputs agree with the NV floats to ~1 ulp, so seeds are
*practically* but not bit-identical across the two sources).

Why it exists: with "NV", every generation ships ``steps × B × H×W×C``
float32 noise host→device — ~21 MB per SD1.5 batch-4 run, ~10% of the whole
pipeline wall time through a remote-device link.  Counter-based Philox is
embarrassingly parallel integer math, a perfect VPU workload: generating on
device removes the transfer entirely and jits into the sampling program.

The 32×32→64-bit multiplies Philox needs are decomposed into 16-bit
halves (TPUs run JAX in 32-bit mode; uint64 is unavailable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_M0 = np.uint32(0xD2511F53)
_M1 = np.uint32(0xCD9E8D57)
_W0 = np.uint32(0x9E3779B9)
_W1 = np.uint32(0xBB67AE85)

_MASK16 = np.uint32(0xFFFF)

# Box–Muller constants, matching the host path's float32-rounded constants
# (rng/philox.py) — the transform itself runs in f32 here.
_INV32 = np.float32(2.3283064e-10)
_INV32_HALF = np.float32(np.float32(2.3283064e-10) / np.float32(2))
_INV32_2PI = np.float32(2.3283064e-10 * 6.2831855)
_INV32_2PI_HALF = np.float32(
    np.float32(2.3283064e-10 * 6.2831855) / np.float32(2))


def _mulhilo(a, m):
    """(hi, lo) of a 32×32→64 unsigned multiply, via 16-bit limbs."""
    a_lo = a & _MASK16
    a_hi = a >> np.uint32(16)
    m_lo = np.uint32(m & 0xFFFF)
    m_hi = np.uint32(int(m) >> 16)
    ll = a_lo * m_lo
    hl = a_hi * m_lo
    lh = a_lo * m_hi
    hh = a_hi * m_hi
    cross = (ll >> np.uint32(16)) + (hl & _MASK16) + (lh & _MASK16)
    hi = hh + (hl >> np.uint32(16)) + (lh >> np.uint32(16)) \
        + (cross >> np.uint32(16))
    lo = (cross << np.uint32(16)) | (ll & _MASK16)
    return hi, lo


def philox10_words(c0, c1, c2, c3, k0, k1):
    """10 Philox rounds on uint32 arrays; returns the (x0, x1) output words
    (bit-exact with the host implementation — tested)."""
    for r in range(10):
        hi0, lo0 = _mulhilo(c0, _M0)
        hi1, lo1 = _mulhilo(c2, _M1)
        c0 = hi1 ^ c1 ^ k0
        c1 = lo1
        c2 = hi0 ^ c3 ^ k1
        c3 = lo0
        if r != 9:
            k0 = k0 + _W0
            k1 = k1 + _W1
    return c0, c1


def _box_muller_sin_f32(x0, x1):
    u = x0.astype(jnp.float32) * _INV32 + _INV32_HALF
    v = x1.astype(jnp.float32) * _INV32_2PI + _INV32_2PI_HALF
    return jnp.sqrt(-2.0 * jnp.log(u)) * jnp.sin(v)


@functools.partial(jax.jit, static_argnames=("n",))
def randn_at_device(seed, offsets, n: int):
    """Gaussian block per offset: (len(offsets), n) float32 on device.

    Same counter/key layout as the host ``randn_at``: counter =
    (offset, 0, lane_lo, lane_hi), key = 64-bit seed split into two words.
    seed: uint32[2] array (lo, hi); offsets: uint32[m].
    """
    m = offsets.shape[0]
    lanes = jnp.arange(n, dtype=jnp.uint32)
    c2 = jnp.broadcast_to(lanes, (m, n))
    # lane_hi is always 0 for n < 2**32 (latent blocks are far smaller)
    c3 = jnp.zeros((m, n), jnp.uint32)
    c0 = jnp.broadcast_to(offsets.astype(jnp.uint32)[:, None], (m, n))
    c1 = jnp.zeros((m, n), jnp.uint32)
    k0 = jnp.broadcast_to(seed[0], (m, n))
    k1 = jnp.broadcast_to(seed[1], (m, n))
    x0, x1 = philox10_words(c0, c1, c2, c3, k0, k1)
    return _box_muller_sin_f32(x0, x1)


def _seed_words(seed: int) -> np.ndarray:
    s = int(seed) & 0xFFFFFFFFFFFFFFFF
    return np.array([s & 0xFFFFFFFF, s >> 32], np.uint32)


@functools.partial(jax.jit, static_argnames=("count", "c", "h", "w"))
def _randn_batch_nhwc(seeds2, offsets0, count: int, c: int, h: int, w: int):
    """(count, B, H, W, C) noise for B per-image generators in one program.

    seeds2: uint32[B,2]; offsets0: uint32[B] (each generator's next offset).
    Draw i for image b uses offset offsets0[b]+i over an n=C*H*W block in
    the reference's CHW lane order, transposed to NHWC on device.
    """
    b = seeds2.shape[0]
    n = c * h * w

    def per_image(seed, off0):
        offs = off0 + jnp.arange(count, dtype=jnp.uint32)
        out = randn_at_device(seed, offs, n)          # (count, n) CHW order
        return out.reshape(count, c, h, w).transpose(0, 2, 3, 1)

    out = jax.vmap(per_image, in_axes=(0, 0), out_axes=1)(seeds2, offsets0)
    return out  # (count, B, H, W, C)


class DevicePhiloxRNG:
    """ImageRNG backend for ``randn_source = "TPU"``: the whole noise
    schedule is generated on device — no host generation, no transfer.

    Subseed slerp and eta-noise-seed-delta follow the host semantics;
    seed-resize (rare) is handled by the caller falling back to the host
    path."""

    def __init__(self, shape, seeds, subseeds=None, subseed_strength=0.0,
                 eta_noise_seed_delta=0):
        self.shape = tuple(int(x) for x in shape)     # (C, H, W)
        self.seeds = [int(s) for s in seeds]
        self.subseeds = [int(s) for s in subseeds] if subseeds is not None \
            else None
        self.subseed_strength = float(subseed_strength)
        self.eta_noise_seed_delta = int(eta_noise_seed_delta or 0)
        self.offsets = np.zeros(len(self.seeds), np.uint32)
        self._seed_arr = jnp.asarray(
            np.stack([_seed_words(s) for s in self.seeds]))
        self.is_first = True

    def _draw(self, count: int):
        c, h, w = self.shape
        out = _randn_batch_nhwc(self._seed_arr,
                                jnp.asarray(self.offsets), count, c, h, w)
        self.offsets = self.offsets + np.uint32(count)
        return out

    def _first(self):
        c, h, w = self.shape
        noise = self._draw(1)[0]                       # (B,H,W,C)
        if self.subseeds is not None and self.subseed_strength != 0:
            subs = [0 if i >= len(self.subseeds) else self.subseeds[i]
                    for i in range(len(self.seeds))]
            sub_arr = jnp.asarray(np.stack([_seed_words(s) for s in subs]))
            subnoise = _randn_batch_nhwc(
                sub_arr, jnp.zeros(len(subs), jnp.uint32), 1, c, h, w)[0]
            noise = _slerp_nhwc(self.subseed_strength, noise, subnoise)
        if self.eta_noise_seed_delta:
            self._seed_arr = jnp.asarray(np.stack(
                [_seed_words(s + self.eta_noise_seed_delta)
                 for s in self.seeds]))
            self.offsets = np.zeros(len(self.seeds), np.uint32)
        return noise

    # ---- ImageRNG-compatible surface ---------------------------------

    def first(self):
        return self._first()

    def next(self):
        if self.is_first:
            self.is_first = False
            return self.first()
        return self._draw(1)[0]

    def next_k(self, k: int):
        if k == 0:
            b = len(self.seeds)
            c, h, w = self.shape
            return jnp.zeros((0, b, h, w, c), jnp.float32)
        if self.is_first:
            head = self.next()[None]
            if k == 1:
                return head
            return jnp.concatenate([head, self.next_k(k - 1)], axis=0)
        return self._draw(k)


@jax.jit
def _slerp_nhwc(val, low, high):
    """Host ImageRNG slerp semantics on batched NHWC tensors: the reference
    slerps each image's (C,H,W) tensor normalizing along ITS axis 1 (the H
    rows — a reference quirk, rng/image_rng.py:19), with a per-image
    lerp fallback when nearly colinear."""
    def one(lo, hi):                       # lo/hi: (C,H,W) float32
        lo_n = lo / jnp.linalg.norm(lo, axis=1, keepdims=True)
        hi_n = hi / jnp.linalg.norm(hi, axis=1, keepdims=True)
        dot = (lo_n * hi_n).sum(1)         # (C,W)
        omega = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
        so = jnp.sin(omega)
        res = (jnp.sin((1.0 - val) * omega) / so)[:, None] * lo \
            + (jnp.sin(val * omega) / so)[:, None] * hi
        lerp = lo * val + hi * (1 - val)
        return jnp.where(dot.mean() > 0.9995, lerp, res)

    lo = jnp.transpose(low.astype(jnp.float32), (0, 3, 1, 2))
    hi = jnp.transpose(high.astype(jnp.float32), (0, 3, 1, 2))
    out = jax.vmap(one)(lo, hi)
    return jnp.transpose(out, (0, 2, 3, 1))

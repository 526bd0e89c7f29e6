"""Device & dtype policy for the TPU build.

Replaces the reference's `modules/devices.py` (device selection, autocast
dtype state, NaN checks — see SURVEY.md L7).  On TPU there is no
"autocast": we hold an explicit ``DtypePolicy`` — bf16 parameters &
activations on the MXU with fp32 islands for schedule math, softmax
accumulation and (optionally) the VAE — and apply it when params are
loaded / models are jitted.  Everything here is process-global but
explicit: no module patching.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def backend() -> str:
    return jax.default_backend()


def is_tpu() -> bool:
    return backend() == "tpu"


def device_count() -> int:
    return jax.device_count()


@functools.lru_cache(maxsize=None)
def supports_pallas() -> bool:
    """Pallas TPU kernels only run compiled on real TPU; CPU uses interpret
    mode (slow — tests only) or the pure-XLA fallback path."""
    return is_tpu()


@dataclasses.dataclass
class DtypePolicy:
    """Explicit replacement for torch autocast (reference modules/devices.py:210).

    param_dtype:   storage dtype of model weights on device
    compute_dtype: activation dtype inside jitted model code
    vae_dtype:     VAE runs fp32 by default — the reference's NaN-fallback
                   behaviour (modules/processing.py:638-665) becomes a policy
                   instead of a retry loop; bf16 is safe on TPU but fp32 VAE
                   decode is cheap relative to the UNet loop.
    island_dtype:  fp32 islands — sigma/schedule math, GroupNorm statistics,
                   softmax accumulation (the Pallas kernels accumulate fp32
                   regardless of this setting).
    """

    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16
    vae_dtype: jnp.dtype = jnp.float32
    island_dtype: jnp.dtype = jnp.float32

    def cast_params(self, params, dtype=None):
        """Cast every floating leaf of a param pytree to `dtype` (param_dtype)."""
        dtype = dtype or self.param_dtype

        def cast(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
            return x

        return jax.tree_util.tree_map(cast, params)


_policy = DtypePolicy()

if os.environ.get("SDTPU_FP32") == "1":  # full-precision escape hatch
    _policy = DtypePolicy(jnp.float32, jnp.float32, jnp.float32, jnp.float32)


def get_policy() -> DtypePolicy:
    return _policy


def set_policy(policy: DtypePolicy) -> None:
    global _policy
    _policy = policy


def has_nans(x) -> bool:
    """NaN check after UNet/VAE (reference modules/devices.py:242-265).

    Pulls one scalar to host; call sites gate this on an option the same way
    the reference gates on --disable-nan-check.
    """
    return bool(jnp.isnan(jnp.sum(x)))


class NansException(Exception):
    pass


def test_for_nans(x, where: str) -> None:
    if not has_nans(x):
        return
    if where == "unet":
        message = (
            "A tensor with NaNs was produced in Unet. "
            "This could be caused by a numerically unstable checkpoint; "
            "try running with SDTPU_FP32=1."
        )
    elif where == "vae":
        message = (
            "A tensor with NaNs was produced in VAE. "
            "Try a different VAE or fp32 VAE decode (the default policy)."
        )
    else:
        message = "A tensor with NaNs was produced."
    raise NansException(message)


def to_host(x) -> np.ndarray:
    """Device → host numpy (one sync point; keep off the hot loop)."""
    return np.asarray(jax.device_get(x))

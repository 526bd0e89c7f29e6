"""Host-side (numpy) random param init.

Used only for tests/bench (real weights come from checkpoints).  Device-side
`jax.random` init through the TPU tunnel costs ~0.5s per leaf in dispatch
latency (~6 min for the SD1.5 UNet); one numpy RNG on the host generates the
same 860M params in seconds.  bf16 leaves use ml_dtypes.
"""

from __future__ import annotations

import numpy as np

try:
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BF16 = np.dtype(np.float32)


def np_dtype(dtype) -> np.dtype:
    name = getattr(dtype, "__name__", None) or str(dtype)
    if "bfloat16" in name:
        return _BF16
    return np.dtype(name)


def seed_of(key) -> int:
    """Accept an int seed or a jax PRNGKey-like array."""
    if isinstance(key, (int, np.integer)):
        return int(key)
    arr = np.asarray(key)
    return int(arr.ravel()[-1])


class HostInit:
    def __init__(self, key):
        self.rng = np.random.default_rng(seed_of(key))

    def _normal(self, shape, scale, dtype):
        return (self.rng.standard_normal(shape, dtype=np.float32) * scale).astype(np_dtype(dtype))

    def conv(self, kh, kw, cin, cout, dtype):
        scale = 1.0 / np.sqrt(kh * kw * cin)
        return {"weight": self._normal((kh, kw, cin, cout), scale, dtype),
                "bias": np.zeros((cout,), np_dtype(dtype))}

    def linear(self, cin, cout, dtype, bias=True):
        p = {"weight": self._normal((cin, cout), 1.0 / np.sqrt(cin), dtype)}
        if bias:
            p["bias"] = np.zeros((cout,), np_dtype(dtype))
        return p

    def norm(self, c, dtype):
        return {"weight": np.ones((c,), np_dtype(dtype)),
                "bias": np.zeros((c,), np_dtype(dtype))}

    def embedding(self, n, d, dtype, scale=0.02):
        return {"weight": self._normal((n, d), scale, dtype)}

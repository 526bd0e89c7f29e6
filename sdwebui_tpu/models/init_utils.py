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


# --------------------------------------------------------------------------
# device-side init: one jitted program generating the whole tree
# --------------------------------------------------------------------------

class _Spec:
    __slots__ = ("shape", "dtype", "kind", "scale")

    def __init__(self, shape, dtype, kind, scale=1.0):
        self.shape = tuple(shape)
        self.dtype = dtype
        self.kind = kind
        self.scale = float(scale)


class SpecInit:
    """HostInit's interface, but records leaf specs instead of
    materializing arrays.  Feed the resulting tree to `device_init` to
    generate every leaf in ONE jitted dispatch on the accelerator —
    through the TPU tunnel this replaces minutes of host numpy + a
    multi-GB host->device transfer per billion params with one compile
    and an on-chip fill (used by bench.py's random full-size models)."""

    def conv(self, kh, kw, cin, cout, dtype):
        return {"weight": _Spec((kh, kw, cin, cout), dtype, "normal",
                                1.0 / np.sqrt(kh * kw * cin)),
                "bias": _Spec((cout,), dtype, "zeros")}

    def linear(self, cin, cout, dtype, bias=True):
        p = {"weight": _Spec((cin, cout), dtype, "normal",
                             1.0 / np.sqrt(cin))}
        if bias:
            p["bias"] = _Spec((cout,), dtype, "zeros")
        return p

    def norm(self, c, dtype):
        return {"weight": _Spec((c,), dtype, "ones"),
                "bias": _Spec((c,), dtype, "zeros")}

    def embedding(self, n, d, dtype, scale=0.02):
        return {"weight": _Spec((n, d), dtype, "normal", scale)}


def jnp_dtype_name(dt):
    import numpy as _n

    return _n.dtype(dt).name


def device_init(spec_tree, key):
    """Materialize a SpecInit tree on the default device (single jit).

    Same-shaped normal leaves are drawn as ONE stacked `random.normal` and
    sliced apart inside the jit: a billion-param UNet has ~1700 leaves but
    only ~80 distinct shapes, and one threefry chain per LEAF made the HLO
    big enough to wedge the remote-compile tunnel for the better part of an
    hour.  ~80 RNG chains + trivial slices compiles in seconds."""
    import jax
    import jax.numpy as jnp

    from sdwebui_tpu.utils.pytree import flatten, unflatten

    specs = flatten(spec_tree)
    paths = sorted(specs)
    groups = {}  # (shape, kind, dtype) -> [path]; scale applied per-slice
    for path in paths:
        s = specs[path]
        groups.setdefault((s.shape, s.kind, str(jnp_dtype_name(s.dtype))),
                          []).append(path)
    group_keys = sorted(groups)

    def gen(k):
        out = {}
        for gi, gk in enumerate(group_keys):
            (shape, kind, _), members = gk, groups[gk]
            if kind == "normal":
                dt = specs[members[0]].dtype
                stack = jax.random.normal(jax.random.fold_in(k, gi),
                                          (len(members),) + shape, dt)
                for j, path in enumerate(members):
                    s = specs[path]
                    out[path] = (stack[j] * jnp.asarray(s.scale, dt)) \
                        .astype(s.dtype)
            else:
                fill = jnp.ones if kind == "ones" else jnp.zeros
                for path in members:
                    out[path] = fill(shape, specs[path].dtype)
        return unflatten(out)

    return jax.jit(gen)(jax.random.PRNGKey(seed_of(key)))

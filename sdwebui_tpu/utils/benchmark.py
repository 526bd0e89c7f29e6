"""Honest device timing through the axon TPU tunnel.

`block_until_ready()` on this setup is acked asynchronously by the relay and
reports ~25x faster than physics; the only trustworthy sync point is a
device→host fetch, which carries a fixed ~20-25 ms round-trip. So: time an
N-iteration `lax.fori_loop` of the op inside ONE jit ending in a scalar
fetch, subtract the measured empty-loop round-trip, divide by N.

(Replaces the reference's torch.profiler wrapper, modules/profiling.py, as
the perf-measurement substrate; `jax.profiler` traces remain available for
op-level breakdowns.)
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x) -> float:
    return float(jax.device_get(x))


def roundtrip_ms(repeats: int = 5) -> float:
    """Fixed host↔device fetch latency."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    _fetch(f(x))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _fetch(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def time_op(fn: Callable, *args, iters: int = 20, repeats: int = 5,
            roundtrip: float | None = None) -> float:
    """Median per-iteration wall time of `fn(*args)` in ms.

    `fn` must map its args to a pytree; iterations are chained by carrying
    the first arg (shapes must line up) — if `fn`'s output shape differs
    from args[0], it is reduced to a scalar and re-broadcast so the loop
    has a data dependency XLA can't elide.
    """
    args = tuple(jax.tree_util.tree_map(jnp.asarray, a) for a in args)
    out_shape = jax.eval_shape(fn, *args)
    chainable = (
        not isinstance(out_shape, (tuple, list, dict))
        and out_shape.shape == args[0].shape
        and out_shape.dtype == args[0].dtype
    )

    if chainable:
        def loop(x0, *rest):
            def body(_, x):
                return fn(x, *rest)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x0).astype(jnp.float32))
    else:
        def loop(x0, *rest):
            def body(_, x):
                out = fn(x, *rest)
                leaves = jax.tree_util.tree_leaves(out)
                s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
                # re-perturb the input so each iteration depends on the last
                return x0 + (s * 0).astype(x0.dtype)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x0).astype(jnp.float32))

    jloop = jax.jit(loop)
    _fetch(jloop(*args))  # compile
    if roundtrip is None:
        roundtrip = roundtrip_ms()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _fetch(jloop(*args))
        ts.append(time.perf_counter() - t0)
    total_ms = float(np.median(ts)) * 1e3
    return max(total_ms - roundtrip, 0.0) / iters

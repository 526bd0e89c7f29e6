"""Sampling driver: one `lax.scan` (fused) or a host step loop (interactive).

Fused mode compiles the entire run — solver steps, CFG batching, UNet — into
one XLA program: zero host round-trips between steps (the reference crosses
host↔device every step for sigma indexing, interrupt checks and previews;
SURVEY.md §3.2).  Stepwise mode reuses a jitted single step and gives the
orchestrator per-step control (interrupt/skip flags, live previews) at the
cost of one dispatch per step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from sdwebui_tpu.sampling.solvers import SOLVERS, SolverSpec


def prepare_noise(spec: SolverSpec, n_steps: int, image_rng, x_shape) -> jnp.ndarray:
    """(n_steps, noises_per_step, B,H,W,C) solver noise from the seeded
    per-image stream (ImageRNG.next_k — one vectorized Philox pass)."""
    per = max(spec.noises_per_step, 1)
    if spec.noises_per_step == 0 or image_rng is None:
        b, h, w, c = x_shape
        return jnp.zeros((n_steps, per, b, h, w, c), jnp.float32)
    flat = image_rng.next_k(n_steps * spec.noises_per_step)  # (n*per, B,...)
    return jnp.asarray(flat.reshape(n_steps, spec.noises_per_step, *flat.shape[1:]))


def sample(model: Callable, x, sigmas, solver: str = "euler",
           noise=None, extra: dict | None = None, mode: str = "scan",
           callback: Callable | None = None):
    """Run `solver` from sigmas[0] to sigmas[-1].

    model(x, sigma, i) -> denoised (CFG-wrapped).
    x: (B,H,W,C) already scaled by sigmas[0].
    noise: (n, noises_per_step, B,H,W,C) pre-generated solver noise.
    """
    spec = SOLVERS[solver]
    sigmas = jnp.asarray(sigmas, jnp.float32)
    n = sigmas.shape[0] - 1
    if noise is None:
        noise = jnp.zeros((n, max(spec.noises_per_step, 1), *x.shape), jnp.float32)
    noise = jnp.asarray(noise, x.dtype)
    extra = dict(extra or {})
    if solver == "restart" and "restart_pairs" not in extra:
        from sdwebui_tpu.sampling.solvers import build_restart_plan

        pairs, nscale = build_restart_plan(np.asarray(jax.device_get(sigmas)))
        extra["restart_pairs"] = jnp.asarray(pairs)
        extra["restart_noise_scale"] = jnp.asarray(nscale)
        n = len(pairs)
        noise = jnp.zeros((n, 1, *x.shape), x.dtype) if noise.shape[0] != n else noise
    if spec.uses_unipc and "unipc_ratio" not in extra:
        from sdwebui_tpu.sampling.solvers import unipc_coefficients

        coeffs = unipc_coefficients(
            np.asarray(jax.device_get(sigmas), np.float64),
            order=int(extra.pop("unipc_order_setting", 3)),
            variant=extra.pop("unipc_variant", "bh1"))
        extra.update({k: jnp.asarray(v) for k, v in coeffs.items()})
    if spec.uses_lms_coeffs and "lms_coeffs" not in extra:
        # needs scipy quadrature — only possible with concrete sigmas; under
        # jit the caller must precompute (pipeline does)
        from sdwebui_tpu.sampling.solvers import lms_coefficients

        extra["lms_coeffs"] = jnp.asarray(
            lms_coefficients(np.asarray(jax.device_get(sigmas), np.float64)),
            jnp.float32)

    if spec.custom_driver is not None:
        return spec.custom_driver(model, x, sigmas, noise, extra)

    state = spec.init_state(x)

    if mode == "scan":
        def body(carry, inp):
            xc, st = carry
            i, noise_i = inp
            xc, st = spec.step(model, xc, i, sigmas, noise_i, st, extra)
            return (xc, st), None

        (x, _), _ = jax.lax.scan(body, (x, state), (jnp.arange(n), noise))
        return x

    for i in range(n):
        x, state = spec.step(model, x, jnp.asarray(i), sigmas, noise[i], state, extra)
        if callback is not None:
            if callback(i, x) is False:
                break
    return x

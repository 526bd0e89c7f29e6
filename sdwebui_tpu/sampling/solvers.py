"""Diffusion ODE/SDE solvers as pure, `lax.scan`-safe step functions.

TPU-first redesign of the k-diffusion sampler zoo the reference drives
through callbacks and Python loops (modules/sd_samplers_kdiffusion.py:11-27):
every solver is a pure function

    step(model, x, i, sigmas, noise, state, extra) -> (x_next, state)

with fixed-shape carried state, so a whole run jit-compiles into one
`lax.scan` (fused mode) or runs stepwise for interrupt/preview support —
the same step math either way.  `model(x, sigma, i) -> denoised` is the
CFG-wrapped denoiser closure.

Step-count-dependent branches (first step of multistep methods, terminal
sigma==0) are resolved with `jnp.where` on traced scalars — both branches
are elementwise-cheap relative to the UNet call.

Formulas follow Karras et al. 2022 and Lu et al. 2022/2023 (DPM-Solver++),
matching k-diffusion's sampling.py semantics (eta/s_noise defaults as the
webui exposes them).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


def _to_d(x, sigma, denoised):
    return (x - denoised) / jnp.maximum(sigma, _EPS)


def _ancestral(sigma_from, sigma_to, eta):
    su = jnp.minimum(
        sigma_to,
        eta * jnp.sqrt(jnp.maximum(
            sigma_to ** 2 * (sigma_from ** 2 - sigma_to ** 2)
            / jnp.maximum(sigma_from ** 2, _EPS), 0.0)),
    )
    sd = jnp.sqrt(jnp.maximum(sigma_to ** 2 - su ** 2, 0.0))
    return sd, su


def _log(s):
    return jnp.log(jnp.maximum(s, _EPS))


# --------------------------------------------------------------------------
# first order
# --------------------------------------------------------------------------

def _apply_churn(x, s, sigmas, noise, extra):
    """Karras stochastic churn (k-diffusion sample_euler/heun/dpm_2; the
    reference forwards s_churn/s_tmin/s_tmax/s_noise into exactly those
    samplers, sd_samplers_kdiffusion.py extra_params).  Adds noise to lift
    σ → σ̂ = σ·(γ+1) when s_tmin ≤ σ ≤ s_tmax.  Returns (x̂, σ̂).
    `extra` is compile-time static, so the no-churn path costs nothing."""
    s_churn = float(extra.get("s_churn", 0.0) or 0.0)
    if s_churn <= 0:
        return x, s
    s_tmin = float(extra.get("s_tmin", 0.0) or 0.0)
    s_tmax = float(extra.get("s_tmax", 0.0) or 0.0) or float("inf")
    s_noise = extra.get("s_noise", 1.0)
    gamma_max = min(s_churn / (sigmas.shape[0] - 1), 2 ** 0.5 - 1)
    gamma = jnp.where((s >= s_tmin) & (s <= s_tmax), gamma_max, 0.0)
    s_hat = s * (gamma + 1.0)
    x = x + noise[0] * s_noise * jnp.sqrt(jnp.maximum(s_hat ** 2 - s ** 2, 0.0))
    return x, s_hat


def euler_step(model, x, i, sigmas, noise, state, extra):
    s, s_next = sigmas[i], sigmas[i + 1]
    x, s = _apply_churn(x, s, sigmas, noise, extra)
    denoised = model(x, s, i)
    x = x + _to_d(x, s, denoised) * (s_next - s)
    return x, state


def euler_ancestral_step(model, x, i, sigmas, noise, state, extra):
    s, s_next = sigmas[i], sigmas[i + 1]
    eta = extra.get("eta", 1.0)
    denoised = model(x, s, i)
    sd, su = _ancestral(s, s_next, eta)
    x = x + _to_d(x, s, denoised) * (sd - s)
    x = jnp.where(s_next > 0, x + noise[0] * su * extra.get("s_noise", 1.0), x)
    return x, state


# --------------------------------------------------------------------------
# second order (2 model calls)
# --------------------------------------------------------------------------

def heun_step(model, x, i, sigmas, noise, state, extra):
    s, s_next = sigmas[i], sigmas[i + 1]
    x, s = _apply_churn(x, s, sigmas, noise, extra)
    denoised = model(x, s, i)
    d = _to_d(x, s, denoised)
    dt = s_next - s
    x_euler = x + d * dt
    denoised_2 = model(x_euler, jnp.maximum(s_next, _EPS), i)
    d_2 = _to_d(x_euler, s_next, denoised_2)
    x_heun = x + (d + d_2) / 2 * dt
    x = jnp.where(s_next > 0, x_heun, x_euler)
    return x, state


def dpm_2_step(model, x, i, sigmas, noise, state, extra):
    s, s_next = sigmas[i], sigmas[i + 1]
    x, s = _apply_churn(x, s, sigmas, noise, extra)
    denoised = model(x, s, i)
    d = _to_d(x, s, denoised)
    # geometric (log-space) midpoint — the reference's pinned k-diffusion
    # (ab527a9 sample_dpm_2) lerps in log-sigma space, NOT rho=1/3 space
    # (the rho midpoint was an older k-diffusion; caught by the twin oracle)
    s_mid = jnp.exp((_log(s) + _log(jnp.maximum(s_next, _EPS))) / 2)
    x_2 = x + d * (s_mid - s)
    denoised_2 = model(x_2, s_mid, i)
    d_2 = _to_d(x_2, s_mid, denoised_2)
    x_dpm = x + d_2 * (s_next - s)
    x = jnp.where(s_next > 0, x_dpm, x + d * (s_next - s))
    return x, state


def dpm_2_ancestral_step(model, x, i, sigmas, noise, state, extra):
    s, s_next = sigmas[i], sigmas[i + 1]
    eta = extra.get("eta", 1.0)
    denoised = model(x, s, i)
    sd, su = _ancestral(s, s_next, eta)
    d = _to_d(x, s, denoised)
    # log-space midpoint between σ and σ_down (k-diffusion ab527a9
    # sample_dpm_2_ancestral); Euler fallback steps to σ_down, not σ_next
    s_mid = jnp.exp((_log(s) + _log(jnp.maximum(sd, _EPS))) / 2)
    x_2 = x + d * (s_mid - s)
    denoised_2 = model(x_2, s_mid, i)
    d_2 = _to_d(x_2, s_mid, denoised_2)
    x_dpm = x + d_2 * (sd - s) + noise[0] * su * extra.get("s_noise", 1.0)
    x = jnp.where(sd > 0, x_dpm, x + d * (sd - s))
    return x, state


def dpmpp_2s_ancestral_step(model, x, i, sigmas, noise, state, extra):
    s, s_next = sigmas[i], sigmas[i + 1]
    eta = extra.get("eta", 1.0)
    denoised = model(x, s, i)
    sd, su = _ancestral(s, s_next, eta)
    # euler fallback (sd == 0)
    x_euler = x + _to_d(x, s, denoised) * (sd - s)
    # DPM-Solver++(2S)
    t, t_next = -_log(s), -_log(sd)
    r = 0.5
    h = t_next - t
    s_mid = jnp.exp(-(t + r * h))
    x_2 = (s_mid / jnp.maximum(s, _EPS)) * x - jnp.expm1(-h * r) * denoised
    denoised_2 = model(x_2, s_mid, i)
    x_2s = (jnp.maximum(sd, _EPS) / jnp.maximum(s, _EPS)) * x - jnp.expm1(-h) * denoised_2
    x = jnp.where(sd > 0, x_2s, x_euler)
    x = x + noise[0] * su * extra.get("s_noise", 1.0)
    return x, state


def dpmpp_sde_step(model, x, i, sigmas, noise, state, extra):
    s, s_next = sigmas[i], sigmas[i + 1]
    eta = extra.get("eta", 1.0)
    s_noise = extra.get("s_noise", 1.0)
    r = extra.get("r", 0.5)
    denoised = model(x, s, i)
    # euler fallback
    x_euler = x + _to_d(x, s, denoised) * (s_next - s)
    # DPM-Solver++ SDE
    t, t_next = -_log(s), -_log(s_next)
    h = t_next - t
    s_ = t + h * r
    fac = 1.0 / (2.0 * r)
    sig_s = jnp.exp(-s_)
    sd_1, su_1 = _ancestral(s, sig_s, eta)
    t_d1 = -_log(sd_1)
    x_2 = (jnp.exp(-t_d1) / jnp.maximum(s, _EPS)) * x - jnp.expm1(t - t_d1) * denoised
    x_2 = x_2 + noise[0] * su_1 * s_noise
    denoised_2 = model(x_2, sig_s, i)
    sd_2, su_2 = _ancestral(s, s_next, eta)
    t_d2 = -_log(sd_2)
    denoised_d = (1 - fac) * denoised + fac * denoised_2
    x_sde = (jnp.exp(-t_d2) / jnp.maximum(s, _EPS)) * x - jnp.expm1(t - t_d2) * denoised_d
    x_sde = x_sde + noise[1] * su_2 * s_noise
    x = jnp.where(s_next > 0, x_sde, x_euler)
    return x, state


# --------------------------------------------------------------------------
# multistep (1 model call, carried history)
# --------------------------------------------------------------------------

def dpmpp_2m_step(model, x, i, sigmas, noise, state, extra):
    s, s_next = sigmas[i], sigmas[i + 1]
    denoised = model(x, s, i)
    t, t_next = -_log(s), -_log(s_next)
    h = t_next - t
    s_prev = sigmas[jnp.maximum(i - 1, 0)]
    h_last = t - (-_log(s_prev))
    r = h_last / jnp.where(h == 0, _EPS, h)
    denoised_d = jnp.where(
        (i == 0) | (s_next == 0),
        denoised,
        (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * state["old_denoised"],
    )
    x = (s_next / jnp.maximum(s, _EPS)) * x - jnp.expm1(-h) * denoised_d
    state = {**state, "old_denoised": denoised}
    return x, state


def dpmpp_2m_sde_step(model, x, i, sigmas, noise, state, extra):
    s, s_next = sigmas[i], sigmas[i + 1]
    eta = extra.get("eta", 1.0)
    s_noise = extra.get("s_noise", 1.0)
    heun_type = extra.get("solver_type", "midpoint") == "heun"
    denoised = model(x, s, i)

    t, t_n = -_log(s), -_log(s_next)
    h = t_n - t
    eta_h = eta * h
    x_new = (s_next / jnp.maximum(s, _EPS)) * jnp.exp(-eta_h) * x \
        + (-jnp.expm1(-h - eta_h)) * denoised

    s_prev = sigmas[jnp.maximum(i - 1, 0)]
    h_last = t - (-_log(s_prev))
    r = h_last / jnp.where(h == 0, _EPS, h)
    diff = denoised - state["old_denoised"]
    if heun_type:
        corr = ((-jnp.expm1(-h - eta_h)) / jnp.where(h + eta_h == 0, _EPS, -h - eta_h) + 1.0) \
            * (1.0 / r) * diff
    else:
        corr = 0.5 * (-jnp.expm1(-h - eta_h)) * (1.0 / r) * diff
    x_new = jnp.where(i > 0, x_new + corr, x_new)

    x_new = x_new + noise[0] * s_next * jnp.sqrt(jnp.maximum(-jnp.expm1(-2 * eta_h), 0.0)) * s_noise
    x = jnp.where(s_next > 0, x_new, denoised)
    state = {**state, "old_denoised": denoised}
    return x, state


def dpmpp_3m_sde_step(model, x, i, sigmas, noise, state, extra):
    s, s_next = sigmas[i], sigmas[i + 1]
    eta = extra.get("eta", 1.0)
    s_noise = extra.get("s_noise", 1.0)
    denoised = model(x, s, i)

    t, t_n = -_log(s), -_log(s_next)
    h = t_n - t
    h_eta = h * (eta + 1.0)
    x_new = jnp.exp(-h_eta) * x + (-jnp.expm1(-h_eta)) * denoised

    h_1 = state["h_1"]
    h_2 = state["h_2"]
    r0 = h_1 / jnp.where(h == 0, _EPS, h)
    r1 = h_2 / jnp.where(h == 0, _EPS, h)
    d1_0 = (denoised - state["denoised_1"]) / jnp.where(r0 == 0, _EPS, r0)
    d1_1 = (state["denoised_1"] - state["denoised_2"]) / jnp.where(r1 == 0, _EPS, r1)
    d1 = d1_0 + (d1_0 - d1_1) * r0 / jnp.maximum(r0 + r1, _EPS)
    d2 = (d1_0 - d1_1) / jnp.maximum(r0 + r1, _EPS)
    phi_2 = jnp.expm1(-h_eta) / jnp.where(h_eta == 0, _EPS, h_eta) + 1.0
    phi_3 = phi_2 / jnp.where(h_eta == 0, _EPS, h_eta) - 0.5
    corr3 = phi_2 * d1 - phi_3 * d2
    corr2 = phi_2 * d1_0
    corr = jnp.where(i >= 2, corr3, jnp.where(i == 1, corr2, 0.0))
    x_new = x_new + corr

    x_new = x_new + noise[0] * s_next * jnp.sqrt(jnp.maximum(-jnp.expm1(-2 * h * eta), 0.0)) * s_noise
    x = jnp.where(s_next > 0, x_new, denoised)
    state = {**state, "denoised_2": state["denoised_1"], "denoised_1": denoised,
             "h_2": h_1, "h_1": h}
    return x, state


def lms_step(model, x, i, sigmas, noise, state, extra):
    """Linear multistep (order ≤ 4); coefficients precomputed host-side
    (lms_coefficients) because they need numerical integration."""
    s = sigmas[i]
    denoised = model(x, s, i)
    d = _to_d(x, s, denoised)
    ds = state["ds"]
    ds = jnp.concatenate([d[None], ds[:-1]], axis=0)  # newest first
    coeffs = extra["lms_coeffs"][i]  # (order,)
    x = x + jnp.tensordot(coeffs.astype(x.dtype), ds.astype(x.dtype), axes=1)
    return x, {**state, "ds": ds}


def lms_coefficients(sigmas: np.ndarray, order: int = 4) -> np.ndarray:
    """(n, order) integrated Lagrange coefficients (k-diffusion's
    linear_multistep_coeff, vectorized with fixed-sample Gauss quadrature)."""
    import scipy.integrate

    sigmas = np.asarray(sigmas, dtype=np.float64)
    n = len(sigmas) - 1
    out = np.zeros((n, order))
    for i in range(n):
        cur_order = min(i + 1, order)
        for j in range(cur_order):
            def fn(tau):
                prod = 1.0
                for k in range(cur_order):
                    if k == j:
                        continue
                    prod *= (tau - sigmas[i - k]) / (sigmas[i - j] - sigmas[i - k])
                return prod
            out[i, j] = scipy.integrate.quad(fn, sigmas[i], sigmas[i + 1], epsrel=1e-4)[0]
    return out


# --------------------------------------------------------------------------
# timestep ("CompVis") samplers in VE sigma space
# --------------------------------------------------------------------------
# VP ↔ VE: a = 1/(1+σ²); x_vp = x_ve·√a.  The reference's alphas-domain DDIM
# (modules/sd_samplers_timesteps_impl.py:12) maps exactly to:
#   x0 = x − σ·ε;  x' = x0 + √((1−a')/a' − s_vp²/a')·ε + (s_vp/√a')·noise
# with s_vp = η·√((1−a')/(1−a)·(1−a/a')).  At η=0 this is x0 + σ'·ε.

def ddim_step(model, x, i, sigmas, noise, state, extra):
    s, s_next = sigmas[i], sigmas[i + 1]
    eta = extra.get("eta", 0.0)
    a = 1.0 / (1.0 + s ** 2)
    a_prev = 1.0 / (1.0 + s_next ** 2)
    denoised = model(x, s, i)
    eps = _to_d(x, s, denoised)
    s_vp = eta * jnp.sqrt(jnp.maximum(
        (1 - a_prev) / jnp.maximum(1 - a, _EPS) * (1 - a / a_prev), 0.0))
    dir_coeff = jnp.sqrt(jnp.maximum((1 - a_prev) / a_prev - s_vp ** 2 / a_prev, 0.0))
    x = denoised + dir_coeff * eps
    x = x + (s_vp / jnp.sqrt(a_prev)) * noise[0] * extra.get("s_noise", 1.0)
    return x, state


def ddim_cfgpp_step(model, x, i, sigmas, noise, state, extra):
    """DDIM CFG++ (reference sd_samplers_timesteps_impl ddim_cfgpp): the
    x0 prediction uses the CFG combine, but the noise *direction* uses the
    unconditional eps. model must return stacked [cfg, uncond] (the
    pipeline builds the denoiser with return_uncond=True)."""
    s, s_next = sigmas[i], sigmas[i + 1]
    eta = extra.get("eta", 0.0)
    a = 1.0 / (1.0 + s ** 2)
    a_prev = 1.0 / (1.0 + s_next ** 2)
    both = model(x, s, i)
    denoised, uncond = both[0], both[1]
    eps_uncond = _to_d(x, s, uncond)
    s_vp = eta * jnp.sqrt(jnp.maximum(
        (1 - a_prev) / jnp.maximum(1 - a, _EPS) * (1 - a / a_prev), 0.0))
    dir_coeff = jnp.sqrt(jnp.maximum((1 - a_prev) / a_prev - s_vp ** 2 / a_prev, 0.0))
    x = denoised + dir_coeff * eps_uncond
    x = x + (s_vp / jnp.sqrt(a_prev)) * noise[0] * extra.get("s_noise", 1.0)
    return x, state


def plms_step(model, x, i, sigmas, noise, state, extra):
    """Pseudo linear multistep (reference sd_samplers_timesteps_impl.py:84):
    Adams-Bashforth on ε with an RK2 priming step at i==0."""
    s, s_next = sigmas[i], sigmas[i + 1]
    denoised = model(x, s, i)
    e_t = _to_d(x, s, denoised)

    def x_prev_for(e):
        return (x - s * e) + s_next * e

    old = state["eps_hist"]  # (3, ...) newest first

    def first_step(_):
        x_1 = x_prev_for(e_t)
        den2 = model(x_1, jnp.maximum(s_next, _EPS), i)
        e_2 = _to_d(x_1, jnp.maximum(s_next, _EPS), den2)
        return (e_t + e_2) / 2

    def multistep(_):
        ep1 = (3 * e_t - old[0]) / 2
        ep2 = (23 * e_t - 16 * old[0] + 5 * old[1]) / 12
        ep3 = (55 * e_t - 59 * old[0] + 37 * old[1] - 9 * old[2]) / 24
        return jnp.where(i == 1, ep1, jnp.where(i == 2, ep2, ep3))

    e_prime = jax.lax.cond(i == 0, first_step, multistep, None)
    x = x_prev_for(e_prime)
    state = {**state, "eps_hist": jnp.concatenate([e_t[None], old[:-1]], axis=0)}
    return x, state


# --------------------------------------------------------------------------
# Restart sampling (Xu et al. 2023; reference modules/sd_samplers_extra.py:7)
# --------------------------------------------------------------------------

def restart_step(model, x, i, sigmas, noise, state, extra):
    """Heun over a precomputed (old, new) sigma pair list with noise
    re-injection at upward sigma jumps (build_restart_plan)."""
    pairs = extra["restart_pairs"]          # (n, 2)
    nscale = extra["restart_noise_scale"]   # (n,)
    s, s_next = pairs[i, 0], pairs[i, 1]
    x = x + noise[0] * nscale[i] * extra.get("s_noise", 1.0)
    denoised = model(x, s, i)
    d = _to_d(x, s, denoised)
    dt = s_next - s
    x_euler = x + d * dt
    denoised_2 = model(x_euler, jnp.maximum(s_next, _EPS), i)
    d_2 = _to_d(x_euler, s_next, denoised_2)
    x_heun = x + (d + d_2) / 2 * dt
    return jnp.where(s_next > 0, x_heun, x_euler), state


def build_restart_plan(sigmas: np.ndarray, restart_list: dict | None = None):
    """(pairs (n,2), noise_scale (n,)) replicating the reference's automatic
    restart segment construction (incl. the karras re-schedule for ≥20
    steps)."""
    from sdwebui_tpu.sampling.schedulers import karras as karras_schedule

    sigmas = np.asarray(sigmas, np.float64)
    steps = len(sigmas) - 1
    if restart_list is None:
        if steps >= 20:
            restart_steps = 9
            restart_times = 1
            if steps >= 36:
                restart_steps = steps // 4
                restart_times = 2
            sigmas = karras_schedule(steps - restart_steps * restart_times,
                                     float(sigmas[-2]), float(sigmas[0]))
            restart_list = {0.1: [restart_steps + 1, restart_times, 2]}
        else:
            restart_list = {}

    restart_idx = {int(np.argmin(np.abs(sigmas - key))): value
                   for key, value in restart_list.items()}

    step_list = []
    for i in range(len(sigmas) - 1):
        step_list.append((sigmas[i], sigmas[i + 1]))
        if i + 1 in restart_idx:
            r_steps, r_times, r_max = restart_idx[i + 1]
            min_idx = i + 1
            max_idx = int(np.argmin(np.abs(sigmas - r_max)))
            if max_idx < min_idx:
                sigma_restart = karras_schedule(
                    r_steps, float(sigmas[min_idx]), float(sigmas[max_idx]))[:-1]
                for _ in range(r_times):
                    step_list.extend(zip(sigma_restart[:-1], sigma_restart[1:]))

    pairs = np.asarray(step_list, np.float64)
    noise_scale = np.zeros(len(pairs))
    last = None
    for j, (old, new) in enumerate(pairs):
        if last is not None and last < old:
            noise_scale[j] = np.sqrt(old ** 2 - last ** 2)
        last = new
    return pairs.astype(np.float32), noise_scale.astype(np.float32)


# --------------------------------------------------------------------------
# UniPC (Zhao et al. 2023; reference modules/models/diffusion/uni_pc)
# --------------------------------------------------------------------------
# Multistep predictor-corrector in λ = −log σ space (data prediction).  All
# step coefficients depend only on the σ schedule, so they are precomputed
# host-side (unipc_coefficients) and the scan body is pure arithmetic plus
# the corrector's single model call (whose output doubles as the next
# step's model value — one call per step, like the reference).

def unipc_coefficients(sigmas: np.ndarray, order: int = 3,
                       variant: str = "bh1", lower_order_final: bool = True):
    """Per-step arrays: ratio, h_phi_1, B_h, rks (n,2), rhos_p (n,2),
    rhos_c (n,3), order (n,)."""
    sigmas = np.asarray(sigmas, np.float64)
    n = len(sigmas) - 1
    lam = -np.log(np.maximum(sigmas, 1e-12))

    ratio = np.zeros(n)
    h_phi_1 = np.zeros(n)
    B_h = np.zeros(n)
    rks_arr = np.zeros((n, 2))
    rhos_p = np.zeros((n, 2))
    rhos_c = np.zeros((n, 3))
    orders = np.zeros(n, np.int32)

    for i in range(n):
        cur_order = min(i + 1, order)
        if lower_order_final:
            cur_order = min(cur_order, n - i)
        cur_order = max(cur_order, 1)
        orders[i] = cur_order

        if sigmas[i + 1] <= 0:
            # terminal step: x_t = m0 exactly
            ratio[i] = 0.0
            h_phi_1[i] = -1.0
            B_h[i] = 0.0
            continue

        h = lam[i + 1] - lam[i]
        hh = -h
        ratio[i] = sigmas[i + 1] / sigmas[i]
        h_phi_1[i] = np.expm1(hh)
        B_h[i] = hh if variant == "bh1" else np.expm1(hh)

        rks = []
        for k in range(1, cur_order):
            rks.append((lam[i - k] - lam[i]) / h)
        rks_full = rks + [1.0]
        rks_arr[i, :len(rks)] = rks

        # b_k = h_phi_k · k! / B_h with the phi recursion
        b = []
        h_phi_k = h_phi_1[i] / hh - 1
        fact = 1
        for k in range(1, cur_order + 1):
            b.append(h_phi_k * fact / B_h[i])
            fact *= (k + 1)
            h_phi_k = h_phi_k / hh - 1 / fact
        b = np.asarray(b)
        R = np.stack([np.asarray(rks_full) ** k for k in range(cur_order)])

        if cur_order >= 2:
            if cur_order == 2:
                rhos_p[i, 0] = 0.5
            else:
                sol = np.linalg.solve(R[:-1, :-1], b[:-1])
                rhos_p[i, :len(sol)] = sol
        if cur_order == 1:
            rhos_c[i, 0] = 0.5
        else:
            sol = np.linalg.solve(R, b)
            rhos_c[i, :len(sol)] = sol

    return {"unipc_ratio": ratio.astype(np.float32),
            "unipc_h_phi_1": h_phi_1.astype(np.float32),
            "unipc_B_h": B_h.astype(np.float32),
            "unipc_rks": rks_arr.astype(np.float32),
            "unipc_rhos_p": rhos_p.astype(np.float32),
            "unipc_rhos_c": rhos_c.astype(np.float32),
            "unipc_order": orders}


def unipc_step(model, x, i, sigmas, noise, state, extra):
    s, s_next = sigmas[i], sigmas[i + 1]
    ratio = extra["unipc_ratio"][i]
    h_phi_1 = extra["unipc_h_phi_1"][i]
    B_h = extra["unipc_B_h"][i]
    rks = extra["unipc_rks"][i]
    rhos_p = extra["unipc_rhos_p"][i]
    rhos_c = extra["unipc_rhos_c"][i]
    cur_order = extra["unipc_order"][i]

    # model value at (x, σ_i): evaluated fresh on the first step, reused
    # from the previous corrector afterwards
    m0 = jax.lax.cond(i == 0,
                      lambda _: model(x, s, i),
                      lambda _: state["m0"], None)

    d1_1 = (state["m1"] - m0) / jnp.where(rks[0] == 0, 1.0, rks[0])
    d1_2 = (state["m2"] - m0) / jnp.where(rks[1] == 0, 1.0, rks[1])

    x_t_ = ratio * x - h_phi_1 * m0
    pred_res = rhos_p[0] * d1_1 + rhos_p[1] * d1_2
    x_pred = x_t_ - B_h * pred_res

    # corrector (also produces next step's m0)
    m_t = model(x_pred, jnp.maximum(s_next, _EPS), i)
    corr = jnp.where(cur_order >= 3, rhos_c[0] * d1_1 + rhos_c[1] * d1_2,
                     jnp.where(cur_order == 2, rhos_c[0] * d1_1, 0.0))
    rho_last = jnp.where(cur_order >= 3, rhos_c[2],
                         jnp.where(cur_order == 2, rhos_c[1], rhos_c[0]))
    x_corr = x_t_ - B_h * (corr + rho_last * (m_t - m0))
    x = jnp.where(s_next > 0, x_corr, x_pred)

    state = {**state, "m2": state["m1"], "m1": m0, "m0": m_t}
    return x, state


# --------------------------------------------------------------------------
# LCM
# --------------------------------------------------------------------------

def lcm_step(model, x, i, sigmas, noise, state, extra):
    """Latent Consistency Models: predicted x0 + fresh noise at next sigma
    (reference modules/sd_samplers_lcm.py sampling rule)."""
    s, s_next = sigmas[i], sigmas[i + 1]
    denoised = model(x, s, i)
    x = jnp.where(s_next > 0, denoised + s_next * noise[0], denoised)
    return x, state


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------



# --------------------------------------------------------------------------
# DPM-Solver fast / adaptive (reference k_diffusion/sampling.py DPMSolver
# class via sd_samplers_kdiffusion "DPM fast"/"DPM adaptive"):  these do not
# walk the sigma schedule index-by-index, so they ship as custom whole-run
# drivers.  Everything is jnp (traceable) — fast unrolls its static order
# plan in Python; adaptive is a lax.while_loop with a PID step controller.
# --------------------------------------------------------------------------

def dpm_fast_orders(n: int) -> list:
    """k-diffusion dpm_solver_fast order plan for n model-eval budget."""
    m = n // 3 + 1
    if n % 3 == 0:
        return [3] * (m - 2) + [2, 1]
    return [3] * (m - 1) + [n % 3]


def _dpm_eps(model, x, t, i):
    """eps in t=-log sigma space: (x - denoised) / sigma."""
    s = jnp.exp(-t)
    return (x - model(x, s, i)) / jnp.maximum(s, _EPS)


def _dpm_1_update(x, t, t_next, eps):
    h = t_next - t
    return x - jnp.exp(-t_next) * jnp.expm1(h) * eps


def _dpm_2_update(x, t, t_next, eps, eps_r1, r1):
    h = t_next - t
    st = jnp.exp(-t_next)
    return x - st * jnp.expm1(h) * eps \
             - st / (2 * r1) * jnp.expm1(h) * (eps_r1 - eps)


def _dpm_3_update(x, t, t_next, eps, eps_r1, eps_r2, r1, r2):
    h = t_next - t
    st = jnp.exp(-t_next)
    return x - st * jnp.expm1(h) * eps \
             - st / r2 * (jnp.expm1(h) / h - 1.0) * (eps_r2 - eps)


def _dpm_u2(x, t, h, eps, eps_r1, r1, r2):
    """intermediate u2 for the 3rd-order step."""
    s2 = t + r2 * h
    ss2 = jnp.exp(-s2)
    return x - ss2 * jnp.expm1(r2 * h) * eps \
             - ss2 * (r2 / r1) * (jnp.expm1(r2 * h) / (r2 * h) - 1.0) \
               * (eps_r1 - eps)


def sample_dpm_fast_driver(model, x, sigmas, noise, extra):
    """DPM-Solver fast: uniform grid in t=-log sigma over
    [sigma_max, sigma_min], orders 3,3,...,remainder; ancestral noise per
    outer step when eta>0.  The order plan depends only on n (static), so
    the loop unrolls at trace time and fuses into one XLA program."""
    n = int(sigmas.shape[0]) - 1
    orders = dpm_fast_orders(n)
    m = len(orders)
    eta = float(extra.get("eta", 1.0))
    s_noise = extra.get("s_noise", 1.0)
    t_start = -jnp.log(jnp.maximum(sigmas[0], _EPS))
    t_end = -jnp.log(jnp.maximum(sigmas[-2], _EPS))   # last nonzero sigma
    ts = t_start + (t_end - t_start) * jnp.arange(m + 1) / m

    ev = 0   # model-eval counter -> prompt-editing schedule index (the
             # reference CFGDenoiser advances its step per model call)
    for k in range(m):
        t, t_next = ts[k], ts[k + 1]
        if eta > 0:
            sd, _ = _ancestral(jnp.exp(-t), jnp.exp(-t_next), eta)
            t_next_ = jnp.minimum(t_end, -jnp.log(jnp.maximum(sd, _EPS)))
            su = jnp.sqrt(jnp.maximum(
                jnp.exp(-t_next) ** 2 - jnp.exp(-t_next_) ** 2, 0.0))
        else:
            t_next_, su = t_next, jnp.asarray(0.0)
        idx = lambda e: jnp.asarray(min(e, n - 1))
        eps = _dpm_eps(model, x, t, idx(ev)); ev += 1
        h = t_next_ - t
        if orders[k] == 1:
            x = _dpm_1_update(x, t, t_next_, eps)
        elif orders[k] == 2:
            r1 = 0.5
            s1 = t + r1 * h
            u1 = x - jnp.exp(-s1) * jnp.expm1(r1 * h) * eps
            eps_r1 = _dpm_eps(model, u1, s1, idx(ev)); ev += 1
            x = _dpm_2_update(x, t, t_next_, eps, eps_r1, r1)
        else:
            r1, r2 = 1.0 / 3.0, 2.0 / 3.0
            s1 = t + r1 * h
            u1 = x - jnp.exp(-s1) * jnp.expm1(r1 * h) * eps
            eps_r1 = _dpm_eps(model, u1, s1, idx(ev)); ev += 1
            u2 = _dpm_u2(x, t, h, eps, eps_r1, r1, r2)
            eps_r2 = _dpm_eps(model, u2, t + r2 * h, idx(ev)); ev += 1
            x = _dpm_3_update(x, t, t_next_, eps, eps_r1, eps_r2, r1, r2)
        if eta > 0:
            x = x + su * s_noise * noise[min(k, noise.shape[0] - 1), 0]
    return x


def sample_dpm_adaptive_driver(model, x, sigmas, noise, extra):
    """DPM-Solver-12/23 adaptive: embedded lower-order error estimate with a
    PID step-size controller (k-diffusion dpm_solver_adaptive defaults:
    order 3, rtol .05, atol .0078, h_init .05, icoeff 1, accept_safety .81).
    Runs as one lax.while_loop on device; iteration count is bounded by
    max_steps (default 80) so the compiled program always terminates."""
    eta = float(extra.get("eta", 1.0))
    s_noise = extra.get("s_noise", 1.0)
    rtol = float(extra.get("dpm_rtol", 0.05))
    atol = float(extra.get("dpm_atol", 0.0078))
    max_steps = int(extra.get("dpm_adaptive_max_steps", 80))
    order = 3
    pid_order = 1.5 if eta > 0 else order
    b1 = 1.0 / pid_order            # pcoeff=0, icoeff=1, dcoeff=0
    accept_safety = 0.81

    t_start = -jnp.log(jnp.maximum(sigmas[0], _EPS))
    t_end = -jnp.log(jnp.maximum(sigmas[-2], _EPS))
    numel = float(np.prod(x.shape))
    n_pool = noise.shape[0]
    n_sched = int(sigmas.shape[0]) - 1

    def cond(carry):
        xc, x_prev, s, h, inv_prev, k = carry
        return jnp.logical_and(s < t_end - 1e-5, k < max_steps)

    def body(carry):
        xc, x_prev, s, h, inv_prev, k = carry
        t = jnp.minimum(t_end, s + h)
        if eta > 0:
            sd, _ = _ancestral(jnp.exp(-s), jnp.exp(-t), eta)
            t_ = jnp.minimum(t_end, -jnp.log(jnp.maximum(sd, _EPS)))
            su = jnp.sqrt(jnp.maximum(
                jnp.exp(-t) ** 2 - jnp.exp(-t_) ** 2, 0.0))
        else:
            t_, su = t, jnp.asarray(0.0)
        i = jnp.minimum(k, n_sched - 1)
        hh = t_ - s
        r1, r2 = 1.0 / 3.0, 2.0 / 3.0
        eps = _dpm_eps(model, xc, s, i)
        s1 = s + r1 * hh
        u1 = xc - jnp.exp(-s1) * jnp.expm1(r1 * hh) * eps
        eps_r1 = _dpm_eps(model, u1, s1, i)
        x_low = _dpm_2_update(xc, s, t_, eps, eps_r1, r1)
        u2 = _dpm_u2(xc, s, hh, eps, eps_r1, r1, r2)
        eps_r2 = _dpm_eps(model, u2, s + r2 * hh, i)
        x_high = _dpm_3_update(xc, s, t_, eps, eps_r1, eps_r2, r1, r2)

        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low),
                                                     jnp.abs(x_prev)))
        error = jnp.sqrt(jnp.sum(((x_low - x_high) / delta) ** 2)) \
            / jnp.sqrt(numel)
        inv_err = 1.0 / (error + 1e-8)
        factor = 1.0 + jnp.arctan(inv_err ** b1 - 1.0)   # PID limiter
        accept = factor >= accept_safety
        noise_k = noise[jnp.minimum(k, n_pool - 1), 0]
        x_acc = x_high + su * s_noise * noise_k
        xc = jnp.where(accept, x_acc, xc)
        x_prev = jnp.where(accept, x_low, x_prev)
        s = jnp.where(accept, t, s)
        h = h * factor
        return (xc, x_prev, s, h, inv_err, k + 1)

    carry = (x, x, t_start, jnp.asarray(0.05, jnp.float32),
             jnp.asarray(1.0, jnp.float32), jnp.asarray(0, jnp.int32))
    xc, *_ = jax.lax.while_loop(cond, body, carry)
    return xc


@dataclasses.dataclass(frozen=True)
class SolverSpec:
    name: str
    step: Callable
    noises_per_step: int = 0
    model_calls_per_step: int = 1
    needs_old_denoised: bool = False
    order3_state: bool = False
    uses_lms_coeffs: bool = False
    eps_history: bool = False
    uses_unipc: bool = False
    default_eta: float = 1.0
    custom_driver: object = None   # full-run driver (DPM fast/adaptive):
                                   # (model, x, sigmas, noise, extra) -> x

    def init_state(self, x):
        state = {}
        if self.needs_old_denoised:
            state["old_denoised"] = jnp.zeros_like(x)
        if self.order3_state:
            state.update(denoised_1=jnp.zeros_like(x), denoised_2=jnp.zeros_like(x),
                         h_1=jnp.zeros((), jnp.float32), h_2=jnp.zeros((), jnp.float32))
        if self.uses_lms_coeffs:
            state["ds"] = jnp.zeros((4, *x.shape), x.dtype)
        if self.eps_history:
            state["eps_hist"] = jnp.zeros((3, *x.shape), x.dtype)
        if self.uses_unipc:
            state.update(m0=jnp.zeros_like(x), m1=jnp.zeros_like(x),
                         m2=jnp.zeros_like(x))
        return state


SOLVERS = {
    "euler": SolverSpec("euler", euler_step),
    "euler_ancestral": SolverSpec("euler_ancestral", euler_ancestral_step, noises_per_step=1),
    "heun": SolverSpec("heun", heun_step, model_calls_per_step=2),
    "dpm_2": SolverSpec("dpm_2", dpm_2_step, model_calls_per_step=2),
    "dpm_2_ancestral": SolverSpec("dpm_2_ancestral", dpm_2_ancestral_step,
                                  noises_per_step=1, model_calls_per_step=2),
    "dpmpp_2s_ancestral": SolverSpec("dpmpp_2s_ancestral", dpmpp_2s_ancestral_step,
                                     noises_per_step=1, model_calls_per_step=2),
    "dpmpp_sde": SolverSpec("dpmpp_sde", dpmpp_sde_step, noises_per_step=2,
                            model_calls_per_step=2),
    "dpmpp_2m": SolverSpec("dpmpp_2m", dpmpp_2m_step, needs_old_denoised=True),
    "dpmpp_2m_sde": SolverSpec("dpmpp_2m_sde", dpmpp_2m_sde_step, noises_per_step=1,
                               needs_old_denoised=True),
    "dpmpp_3m_sde": SolverSpec("dpmpp_3m_sde", dpmpp_3m_sde_step, noises_per_step=1,
                               order3_state=True),
    "lms": SolverSpec("lms", lms_step, uses_lms_coeffs=True),
    "lcm": SolverSpec("lcm", lcm_step, noises_per_step=1),
    "ddim": SolverSpec("ddim", ddim_step, noises_per_step=1, default_eta=0.0),
    "ddim_cfgpp": SolverSpec("ddim_cfgpp", ddim_cfgpp_step, noises_per_step=1,
                             default_eta=0.0),
    "dpm_fast": SolverSpec("dpm_fast", None, noises_per_step=1,
                           custom_driver=sample_dpm_fast_driver),
    "dpm_adaptive": SolverSpec("dpm_adaptive", None, noises_per_step=1,
                               custom_driver=sample_dpm_adaptive_driver),
    "restart": SolverSpec("restart", restart_step, noises_per_step=1,
                          model_calls_per_step=2),
    "unipc": SolverSpec("unipc", unipc_step, model_calls_per_step=2,
                        order3_state=False, eps_history=False,
                        uses_unipc=True),
    "plms": SolverSpec("plms", plms_step, eps_history=True,
                       model_calls_per_step=2),
}

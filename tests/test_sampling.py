"""Sampler/scheduler math tests — analytic validations (the reference has
none; SURVEY.md §4 'add what the reference lacks')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdwebui_tpu.sampling import (
    Discretization, SCHEDULERS, SOLVERS, get_schedule, make_alphas_cumprod,
)
from sdwebui_tpu.sampling.cfg import CondSchedule, make_cfg_denoiser
from sdwebui_tpu.sampling.sampler import sample
from sdwebui_tpu.sampling.solvers import lms_coefficients
from sdwebui_tpu.sampling.registry import get_sampler, visible_sampler_names

DISC = Discretization(make_alphas_cumprod())


# --------------------------------------------------------------------------
# discretization
# --------------------------------------------------------------------------

def test_sigma_range_matches_sd15():
    # SD1.5 trained range (k-diffusion wrapping of ldm alphas)
    assert DISC.sigma_min == pytest.approx(0.0292, abs=1e-3)
    assert DISC.sigma_max == pytest.approx(14.615, abs=1e-2)


def test_sigma_t_roundtrip():
    ts = np.array([0.0, 100.5, 500.0, 999.0])
    sig = DISC.t_to_sigma(ts)
    back = DISC.sigma_to_t(sig, do_quantize=False)
    np.testing.assert_allclose(back, ts, atol=1e-6)


def test_quantized_t_integer():
    t = DISC.sigma_to_t(np.array([1.0, 5.0]))
    assert np.all(t == np.round(t))


def test_traced_sigma_to_t_matches_host():
    # _sigma_to_t_traced (used inside the fused sampling jit) must agree with
    # the host-side Discretization.sigma_to_t in both quantize modes.
    from sdwebui_tpu.pipeline.processing import _sigma_to_t_traced

    log_sigmas = jnp.asarray(np.log(DISC.sigmas))
    sig = np.exp(np.random.default_rng(0).uniform(
        np.log(DISC.sigma_min), np.log(DISC.sigma_max), size=32))
    for quantize in (False, True):
        host = DISC.sigma_to_t(sig, do_quantize=quantize)
        traced = np.asarray(_sigma_to_t_traced(jnp.asarray(sig), log_sigmas,
                                               quantize))
        np.testing.assert_allclose(traced, host, atol=2e-4)


def test_v_prediction_scalings():
    d = Discretization(make_alphas_cumprod(), prediction_type="v")
    c_in, c_out, c_skip = d.scalings(2.0)
    assert c_in == pytest.approx(1 / np.sqrt(5))
    assert c_out == pytest.approx(-2 / np.sqrt(5))
    assert c_skip == pytest.approx(1 / 5)


# --------------------------------------------------------------------------
# schedulers
# --------------------------------------------------------------------------

@pytest.mark.parametrize("name", list(SCHEDULERS))
def test_schedules_monotone_and_terminated(name):
    s = get_schedule(name, 12, DISC)
    # the reference ddim scheduler's integer stride can overshoot by one step
    # (modules/sd_schedulers.py:107-116)
    assert s.shape == (13,) or (name == "ddim" and s.shape == (14,))
    # kl_optimal is the one reference scheduler that terminates at σ_min
    # instead of 0 (modules/sd_schedulers.py:73-78 appends no zero)
    assert s[-1] == 0.0 or (name == "kl_optimal" and s[-1] == pytest.approx(DISC.sigma_min, rel=1e-6))
    assert np.all(np.diff(s) < 1e-9), s  # strictly decreasing
    assert s[0] <= DISC.sigma_max * 1.001


def test_karras_endpoints():
    s = get_schedule("karras", 10, DISC)
    assert s[0] == pytest.approx(DISC.sigma_max, rel=1e-6)
    assert s[-2] == pytest.approx(DISC.sigma_min, rel=1e-6)


def test_ays_exact_table_at_10_steps():
    s = get_schedule("align_your_steps", 10, DISC)
    assert s[0] == pytest.approx(14.615, abs=1e-4)


def test_kl_optimal_formula():
    s = get_schedule("kl_optimal", 4, DISC)
    expected0 = np.tan(np.arctan(DISC.sigma_max))
    assert s[0] == pytest.approx(expected0, rel=1e-6)


# --------------------------------------------------------------------------
# solvers — analytic checks
# --------------------------------------------------------------------------

SIGMAS = get_schedule("karras", 8, DISC)


def _run(solver, model, x0, sigmas=SIGMAS, mode="scan", seed=0):
    spec = SOLVERS[solver]
    n = len(sigmas) - 1
    rng = np.random.default_rng(seed)
    noise = jnp.asarray(rng.standard_normal(
        (n, max(spec.noises_per_step, 1), *x0.shape)), jnp.float32)
    return sample(model, x0, sigmas, solver=solver, noise=noise, mode=mode)


@pytest.mark.parametrize(
    "solver",
    [s for s in SOLVERS if SOLVERS[s].custom_driver is None])
def test_perfect_denoiser_recovers_target(solver):
    """With model(x,σ)=x_target, every solver must land exactly on x_target
    (deterministic ones) or within noise-scale of it (ancestral/sde with the
    final σ=0 step killing the noise).  Custom-driver solvers (DPM
    fast/adaptive) stop at σ_min like k-diffusion and are covered by
    test_dpm_drivers_analytic instead."""
    target = jnp.full((1, 4, 4, 2), 3.25, jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 4, 2)),
                    jnp.float32) * SIGMAS[0]
    model = lambda xc, s, i: target
    out = _run(solver, model, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-3)


@pytest.mark.parametrize("solver,tol", [
    ("euler", 0.05), ("heun", 0.01), ("dpmpp_2m", 0.01), ("lms", 0.01),
    ("dpm_2", 0.01),
])
def test_linear_model_ode_accuracy(solver, tol):
    """denoised = a·x ⇒ exact ODE solution x(σ) = x₀·(σ/σ₀)^(1-a).

    Integrate to a small positive σ_end (avoid the singular σ→0 limit) and
    compare; higher-order solvers must hit a tighter tolerance.
    """
    a = 0.5
    sig = np.concatenate([np.geomspace(10.0, 0.5, 40), [0.4]])
    x0 = jnp.full((1, 2, 2, 1), 1.7, jnp.float32)
    model = lambda xc, s, i: a * xc
    out = _run(solver, model, x0, sigmas=jnp.asarray(sig, jnp.float32))
    exact = 1.7 * (sig[-1] / sig[0]) ** (1 - a)
    np.testing.assert_allclose(np.asarray(out).ravel()[0], exact, rtol=tol)


def test_scan_vs_stepwise_identical():
    a = 0.3
    model = lambda xc, s, i: a * xc
    x0 = jnp.full((1, 2, 2, 1), 1.0, jnp.float32)
    o1 = _run("dpmpp_2m", model, x0, mode="scan")
    o2 = _run("dpmpp_2m", model, x0, mode="step")
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6)


def test_ancestral_noise_changes_output_deterministically():
    model = lambda xc, s, i: 0.5 * xc
    x0 = jnp.full((1, 2, 2, 1), 1.0, jnp.float32)
    o1 = _run("euler_ancestral", model, x0, seed=1)
    o2 = _run("euler_ancestral", model, x0, seed=1)
    o3 = _run("euler_ancestral", model, x0, seed=2)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))


def test_lms_order1_coefficient_is_dt():
    sig = np.array([10.0, 5.0, 2.0, 0.0])
    c = lms_coefficients(sig, order=4)
    assert c[0, 0] == pytest.approx(sig[1] - sig[0], rel=1e-6)
    assert np.all(c[0, 1:] == 0)


# --------------------------------------------------------------------------
# CFG
# --------------------------------------------------------------------------

def test_cfg_combine_matches_formula():
    """denoised = uncond + Σ w_k·scale·(cond_k − uncond), with the context
    row driving a distinguishable output."""
    def denoise_fn(x, sigma, ctx, y, c_concat):
        # output = mean of context per item, broadcast over the latent
        m = jnp.mean(ctx, axis=(1, 2))
        return jnp.ones_like(x) * m[:, None, None, None]

    cond1 = np.full((7, 3), 2.0, np.float32)
    cond2 = np.full((7, 3), 5.0, np.float32)
    uncond = np.full((7, 3), 1.0, np.float32)
    sched = CondSchedule(
        cond_bank=jnp.asarray(np.stack([cond1, cond2])[:, None]),
        cond_idx=jnp.zeros((2, 4), jnp.int32),
        cond_weights=jnp.asarray([1.0, 0.5]),
        uncond_bank=jnp.asarray(uncond[None]),
        uncond_idx=jnp.zeros((4,), jnp.int32),
        cond_scale=3.0)
    model = make_cfg_denoiser(denoise_fn, sched)
    out = model(jnp.zeros((2, 4, 4, 3)), jnp.asarray(1.0), 0)
    expect = 1.0 + (1.0 * (2 - 1) + 0.5 * (5 - 1)) * 3.0
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


def test_cfg_skip_uncond_returns_cond_mean():
    def denoise_fn(x, sigma, ctx, y, c_concat):
        m = jnp.mean(ctx, axis=(1, 2))
        return jnp.ones_like(x) * m[:, None, None, None]

    sched = CondSchedule.simple(
        np.full((7, 3), 2.0, np.float32), np.full((7, 3), 1.0, np.float32),
        cond_scale=7.0, n_steps=2)
    sched.skip_uncond = jnp.asarray([False, True])
    model = make_cfg_denoiser(denoise_fn, sched)
    o0 = model(jnp.zeros((1, 2, 2, 3)), jnp.asarray(1.0), 0)
    o1 = model(jnp.zeros((1, 2, 2, 3)), jnp.asarray(1.0), 1)
    np.testing.assert_allclose(np.asarray(o0), 1 + 7.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(o1), 2.0, rtol=1e-5)


def test_cfg_mask_blend():
    def denoise_fn(x, sigma, ctx, y, c_concat):
        return x  # identity: output = (blended) input

    sched = CondSchedule.simple(np.zeros((7, 3), np.float32),
                                np.zeros((7, 3), np.float32), cond_scale=1.0)
    mask = jnp.zeros((1, 2, 2, 1)).at[0, 0].set(1.0)
    init = jnp.full((1, 2, 2, 3), 9.0)
    model = make_cfg_denoiser(denoise_fn, sched, mask=mask, nmask=1 - mask,
                              init_latent=init)
    out = model(jnp.full((1, 2, 2, 3), 4.0), jnp.asarray(1.0), 0)
    np.testing.assert_allclose(np.asarray(out)[0, 0], 9.0)
    np.testing.assert_allclose(np.asarray(out)[0, 1], 4.0)


def test_sampler_registry_names():
    names = visible_sampler_names()
    for expected in ["Euler a", "Euler", "LMS", "Heun", "DPM++ 2M",
                     "DPM++ 2M SDE", "DPM++ 3M SDE", "DPM++ SDE", "LCM"]:
        assert expected in names
    assert get_sampler("k_euler_a").name == "Euler a"
    assert get_sampler("DPM++ 2M SDE Heun").extra == (("solver_type", "heun"),)
    with pytest.raises(ValueError):
        get_sampler("nonexistent")


# --------------------------------------------------------------------------
# timestep samplers (DDIM / PLMS)
# --------------------------------------------------------------------------

def test_ddim_eta0_equals_euler():
    """DDIM with η=0 is exactly Euler in VE space on the same schedule."""
    a = 0.4
    model = lambda xc, s, i: a * xc
    x0 = jnp.full((1, 2, 2, 1), 1.3, jnp.float32)
    sig = jnp.asarray(np.geomspace(10, 0.05, 12).tolist() + [0.0], jnp.float32)
    o_ddim = sample(model, x0, sig, solver="ddim",
                    noise=jnp.zeros((12, 1, 1, 2, 2, 1)), extra={"eta": 0.0})
    o_euler = sample(model, x0, sig, solver="euler",
                     noise=jnp.zeros((12, 1, 1, 2, 2, 1)))
    np.testing.assert_allclose(np.asarray(o_ddim), np.asarray(o_euler), rtol=1e-5)


def test_ddim_eta_nonzero_differs():
    model = lambda xc, s, i: 0.4 * xc
    x0 = jnp.full((1, 2, 2, 1), 1.3, jnp.float32)
    sig = jnp.asarray(np.geomspace(10, 0.05, 8).tolist() + [0.0], jnp.float32)
    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.standard_normal((8, 1, 1, 2, 2, 1)), jnp.float32)
    o0 = sample(model, x0, sig, solver="ddim", noise=noise, extra={"eta": 0.0})
    o1 = sample(model, x0, sig, solver="ddim", noise=noise, extra={"eta": 1.0})
    assert not np.allclose(np.asarray(o0), np.asarray(o1))


def test_plms_perfect_denoiser():
    target = jnp.full((1, 4, 4, 2), 2.5, jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 4, 2)),
                    jnp.float32) * SIGMAS[0]
    out = sample(lambda xc, s, i: target, x, SIGMAS, solver="plms",
                 noise=jnp.zeros((len(SIGMAS) - 1, 1, 1, 4, 4, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-3)


def test_plms_higher_order_than_euler():
    a = 0.5
    sig = np.concatenate([np.geomspace(10.0, 0.5, 40), [0.4]])
    x0 = jnp.full((1, 2, 2, 1), 1.7, jnp.float32)
    model = lambda xc, s, i: a * xc
    exact = 1.7 * (sig[-1] / sig[0]) ** (1 - a)
    zeros = jnp.zeros((len(sig) - 1, 1, 1, 2, 2, 1))
    e_plms = abs(float(np.asarray(sample(model, x0, jnp.asarray(sig, jnp.float32),
                                         solver="plms", noise=zeros)).ravel()[0]) - exact)
    e_euler = abs(float(np.asarray(sample(model, x0, jnp.asarray(sig, jnp.float32),
                                          solver="euler", noise=zeros)).ravel()[0]) - exact)
    assert e_plms < e_euler


def test_ddim_plms_in_registry():
    assert get_sampler("DDIM").solver == "ddim"
    assert get_sampler("PLMS").scheduler_override == "ddim"


# --------------------------------------------------------------------------
# Restart sampler
# --------------------------------------------------------------------------

def test_restart_plan_structure():
    from sdwebui_tpu.sampling.solvers import build_restart_plan

    sig = get_schedule("karras", 30, DISC)
    pairs, nscale = build_restart_plan(sig)
    # 30 steps ≥ 20 → karras re-schedule of 21 + a 10-step restart segment
    assert len(pairs) > 21
    # at least one upward jump with noise injection
    assert (nscale > 0).any()
    # pairs are contiguous within segments
    assert pairs[0, 0] == pytest.approx(DISC.sigma_max, rel=1e-4)
    assert pairs[-1, 1] == 0.0


def test_restart_small_steps_plain_heun():
    from sdwebui_tpu.sampling.solvers import build_restart_plan

    sig = get_schedule("karras", 8, DISC)
    pairs, nscale = build_restart_plan(sig)
    assert len(pairs) == 8
    assert (nscale == 0).all()


def test_restart_perfect_denoiser():
    target = jnp.full((1, 4, 4, 2), 1.5, jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 4, 2)),
                    jnp.float32) * SIGMAS[0]
    out = sample(lambda xc, s, i: target, x, SIGMAS, solver="restart")
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-3)


def test_restart_in_registry():
    assert get_sampler("Restart").solver == "restart"


# --------------------------------------------------------------------------
# UniPC
# --------------------------------------------------------------------------

def test_unipc_perfect_denoiser():
    target = jnp.full((1, 4, 4, 2), 2.0, jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 4, 2)),
                    jnp.float32) * SIGMAS[0]
    out = sample(lambda xc, s, i: target, x, SIGMAS, solver="unipc")
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-3)


def test_unipc_higher_order_than_euler():
    a = 0.5
    sig = np.concatenate([np.geomspace(10.0, 0.5, 14), [0.4]])
    x0 = jnp.full((1, 2, 2, 1), 1.7, jnp.float32)
    model = lambda xc, s, i: a * xc
    exact = 1.7 * (sig[-1] / sig[0]) ** (1 - a)
    sigj = jnp.asarray(sig, jnp.float32)
    e_unipc = abs(float(np.asarray(sample(model, x0, sigj, solver="unipc")).ravel()[0]) - exact)
    e_euler = abs(float(np.asarray(sample(model, x0, sigj, solver="euler")).ravel()[0]) - exact)
    e_2m = abs(float(np.asarray(sample(model, x0, sigj, solver="dpmpp_2m")).ravel()[0]) - exact)
    assert e_unipc < e_euler
    assert e_unipc < e_2m * 2  # at least comparable to 2nd order


def test_unipc_coefficients_terminal_step():
    from sdwebui_tpu.sampling.solvers import unipc_coefficients

    sig = np.array([10.0, 5.0, 1.0, 0.0])
    c = unipc_coefficients(sig)
    # terminal: x = m0 exactly (ratio 0, h_phi_1 = -1, B_h = 0)
    assert c["unipc_ratio"][-1] == 0.0
    assert c["unipc_h_phi_1"][-1] == -1.0
    assert c["unipc_B_h"][-1] == 0.0
    # lower_order_final caps the tail orders
    assert c["unipc_order"][-1] == 1


def test_unipc_in_registry():
    assert get_sampler("UniPC").solver == "unipc"


def test_ddim_cfgpp():
    """CFG++ uses the uncond eps for the direction: with cfg==uncond model
    it must equal plain DDIM; with differing outputs it must differ."""
    target = jnp.full((1, 4, 4, 2), 2.0, jnp.float32)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 4, 2)),
                     jnp.float32) * SIGMAS[0]

    same = lambda xc, s, i: jnp.stack([target * jnp.ones_like(xc),
                                       target * jnp.ones_like(xc)])
    out_pp = sample(same, x0, SIGMAS, solver="ddim_cfgpp",
                    noise=jnp.zeros((len(SIGMAS) - 1, 1, 1, 4, 4, 2)))
    out_ddim = sample(lambda xc, s, i: target * jnp.ones_like(xc), x0, SIGMAS,
                      solver="ddim", noise=jnp.zeros((len(SIGMAS) - 1, 1, 1, 4, 4, 2)),
                      extra={"eta": 0.0})
    np.testing.assert_allclose(np.asarray(out_pp), np.asarray(out_ddim), rtol=1e-5)

    diff = lambda xc, s, i: jnp.stack([target + 0.1 * xc,
                                       0.5 * xc])
    out_diff = sample(diff, x0, SIGMAS, solver="ddim_cfgpp",
                      noise=jnp.zeros((len(SIGMAS) - 1, 1, 1, 4, 4, 2)))
    out_diff_ddim = sample(lambda xc, s, i: target + 0.1 * xc, x0, SIGMAS,
                           solver="ddim",
                           noise=jnp.zeros((len(SIGMAS) - 1, 1, 1, 4, 4, 2)),
                           extra={"eta": 0.0})
    assert not np.allclose(np.asarray(out_diff), np.asarray(out_diff_ddim))
    assert get_sampler("DDIM CFG++").solver == "ddim_cfgpp"


def test_dpm_fast_order_plan():
    from sdwebui_tpu.sampling.solvers import dpm_fast_orders

    assert dpm_fast_orders(1) == [1]
    assert dpm_fast_orders(2) == [2]
    assert dpm_fast_orders(3) == [2, 1]
    assert dpm_fast_orders(6) == [3, 2, 1]
    assert dpm_fast_orders(7) == [3, 3, 1]
    for n in range(1, 40):
        assert sum(dpm_fast_orders(n)) == n


@pytest.mark.parametrize("solver", ["dpm_fast", "dpm_adaptive"])
def test_dpm_drivers_analytic(solver):
    """DPM-Solver integrates the semi-linear ODE exactly for constant
    denoised output; both drivers stop at sigma_min (k-diffusion ends
    there, no final step to 0)."""
    sig = jnp.asarray(np.geomspace(10.0, 0.05, 9).tolist() + [0.0], jnp.float32)
    target = jnp.full((1, 4, 4, 2), 1.5)
    model = lambda x, s, i: target * jnp.ones_like(x)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 4, 2)),
                     jnp.float32) * sig[0]
    exact = target + (0.05 / 10.0) * (x0 - target)
    zero_noise = jnp.zeros((len(sig) - 1, 1, 1, 4, 4, 2))
    out = sample(model, x0, sig, solver=solver, noise=zero_noise,
                 extra={"eta": 0.0})
    np.testing.assert_allclose(np.asarray(out), np.asarray(exact), atol=1e-5)

    # default eta=1 is ancestral: the noise stream must matter
    rnd = jnp.asarray(np.random.default_rng(1).standard_normal(
        (len(sig) - 1, 1, 1, 4, 4, 2)), jnp.float32)
    out_eta = sample(model, x0, sig, solver=solver, noise=rnd)
    assert not np.allclose(np.asarray(out_eta), np.asarray(out))


def test_dpm_fast_under_jit():
    """Custom drivers must trace into one program (fused pipeline path)."""
    import jax as _jax

    sig = jnp.asarray(np.geomspace(8.0, 0.1, 7).tolist() + [0.0], jnp.float32)
    model = lambda x, s, i: 0.5 * x

    @_jax.jit
    def run(x0, noise):
        return sample(model, x0, sig, solver="dpm_fast", noise=noise,
                      extra={"eta": 0.0})

    x0 = jnp.ones((1, 4, 4, 2)) * sig[0]
    out = run(x0, jnp.zeros((len(sig) - 1, 1, 1, 4, 4, 2)))
    assert np.all(np.isfinite(np.asarray(out)))

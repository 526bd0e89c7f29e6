"""Sampler-parameter options graduated this round: Karras churn
(s_churn/s_tmin/s_tmax), NGMS skip-uncond plans (s_min_uncond[_all],
skip_early_cond), penultimate-sigma discard, old-karras compat sigmas,
SGM noise multiplier, Zero-Terminal-SNR noise schedule, UniPC skip types,
eta option fallbacks, hide_samplers.

Oracles: k-diffusion sampling.py churn algebra, reference
sd_samplers_kdiffusion.get_sigmas / sd_samplers_cfg_denoiser.py:219-229 /
sd_models.rescale_zero_terminal_snr_abar semantics.
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from sdwebui_tpu.pipeline.params import GenerationParams
from sdwebui_tpu.pipeline.processing import (
    _skip_uncond_mask, _solver_extra, process_txt2img)
from sdwebui_tpu.pipeline.img2img import process_img2img
from sdwebui_tpu.pipeline.sd_model import create_tiny_sd
from sdwebui_tpu.sampling.discretization import (
    Discretization, make_alphas_cumprod, rescale_zero_terminal_snr_abar)
from sdwebui_tpu.sampling.registry import (
    build_sigmas, get_sampler, visible_sampler_names)
from sdwebui_tpu.sampling.sampler import sample
from sdwebui_tpu.sampling.schedulers import get_schedule
from sdwebui_tpu.utils.options import opts

DISC = Discretization(make_alphas_cumprod())


@pytest.fixture(scope="module")
def model():
    return create_tiny_sd()


def _img(color=(200, 60, 60), size=(64, 64)):
    return Image.new("RGB", size, color)


# --------------------------------------------------------------------------
# churn
# --------------------------------------------------------------------------

def _linear_model(x, sigma, i):
    return x * 0.9


def _run_euler(extra):
    sigmas = get_schedule("karras", 6, DISC)
    x0 = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 4), jnp.float32)
    n = len(sigmas) - 1
    noise = jnp.asarray(
        np.random.RandomState(1).standard_normal((n, 1, *x0.shape)),
        jnp.float32)
    return np.asarray(sample(_linear_model, x0, sigmas, solver="euler",
                             noise=noise, extra=extra))


def test_churn_changes_euler_output():
    base = _run_euler({})
    churned = _run_euler({"s_churn": 1.0})
    assert not np.allclose(base, churned)


def test_churn_gated_out_by_tmin():
    base = _run_euler({})
    gated = _run_euler({"s_churn": 1.0, "s_tmin": 1e6})
    # not bit-identical: the gated graph still carries the (zero) churn ops,
    # so XLA fuses/reassociates differently — equality is semantic only
    np.testing.assert_allclose(base, gated, rtol=1e-4, atol=1e-5)


def test_churn_matches_kdiffusion_algebra():
    """One churned Euler step against the hand-computed k-diffusion update."""
    sigmas = jnp.asarray([10.0, 5.0, 0.0], jnp.float32)
    x0 = jnp.ones((1, 4, 4, 4), jnp.float32)
    eps = np.random.RandomState(2).standard_normal((2, 1, 1, 4, 4, 4))
    noise = jnp.asarray(eps, jnp.float32)
    got = np.asarray(sample(_linear_model, x0, sigmas, solver="euler",
                            noise=noise, extra={"s_churn": 0.5}))
    gamma = min(0.5 / 2, 2 ** 0.5 - 1)
    x = np.ones((1, 4, 4, 4))
    for i, (s, s_next) in enumerate([(10.0, 5.0), (5.0, 0.0)]):
        s_hat = s * (gamma + 1)
        x = x + eps[i, 0] * np.sqrt(s_hat ** 2 - s ** 2)
        d = (x - x * 0.9) / s_hat
        x = x + d * (s_next - s_hat)
    np.testing.assert_allclose(got, x, rtol=1e-4)


def test_solver_extra_churn_only_for_karras_samplers():
    p = GenerationParams(s_churn=1.0, s_tmin=0.1)
    assert _solver_extra(p, get_sampler("Euler"))["s_churn"] == 1.0
    assert "s_churn" not in _solver_extra(p, get_sampler("Euler a"))
    assert "s_churn" not in _solver_extra(p, get_sampler("DPM++ 2M"))
    assert _solver_extra(p, get_sampler("Heun"))["s_tmin"] == 0.1


# --------------------------------------------------------------------------
# sigma-schedule post-passes
# --------------------------------------------------------------------------

def test_dpm2_discards_penultimate_sigma():
    dpm2 = get_sampler("DPM2")
    euler = get_sampler("Euler")
    sig = build_sigmas(dpm2, "Automatic", 8, DISC)
    base = build_sigmas(euler, "Automatic", 8, DISC)
    assert len(sig) == len(base) == 9          # steps+1 either way
    plus1 = get_schedule("Automatic", 9, DISC)
    np.testing.assert_allclose(sig[:-1], plus1[:-2])
    assert sig[-1] == 0.0
    assert sig[-2] > base[-2]                  # penultimate dropped


def test_always_discard_option_forces_euler():
    rec = {}
    with opts.override({"always_discard_next_to_last_sigma": True}):
        sig = build_sigmas(get_sampler("Euler"), "Automatic", 8, DISC,
                           extra_params_out=rec)
    assert rec.get("Discard penultimate sigma") == "True"
    plus1 = get_schedule("Automatic", 9, DISC)
    np.testing.assert_allclose(sig[:-1], plus1[:-2])


def test_use_old_karras_scheduler_sigmas():
    with opts.override({"use_old_karras_scheduler_sigmas": True}):
        sig = build_sigmas(get_sampler("Euler"), "Karras", 8, DISC)
    assert abs(sig[0] - 10.0) < 1e-6
    assert abs(sig[-2] - 0.1) < 1e-6


def test_unipc_skip_types():
    from sdwebui_tpu.pipeline.processing import _resolve_scheduler

    unipc = get_sampler("UniPC")
    assert _resolve_scheduler(unipc, "Automatic") == "ddim"
    with opts.override({"uni_pc_skip_type": "logSNR"}):
        assert _resolve_scheduler(unipc, "Automatic") == "exponential"
    with opts.override({"uni_pc_skip_type": "time_quadratic"}):
        key = _resolve_scheduler(unipc, "Automatic")
    sig = get_schedule(key, 8, DISC)
    assert sig[-1] == 0.0 and len(sig) == 9
    assert all(np.diff(sig[:-1]) < 0)          # strictly decreasing


# --------------------------------------------------------------------------
# skip-uncond plans (NGMS / skip_early_cond)
# --------------------------------------------------------------------------

def test_ngms_alternating_steps():
    sigmas = np.array([10.0, 5.0, 2.0, 1.0, 0.5, 0.0])
    p = GenerationParams(s_min_uncond=3.0)
    mask = np.asarray(_skip_uncond_mask(sigmas, p))
    # σ<3 at i=2,3,4; alternating keeps odd i only
    assert mask.tolist() == [False, False, False, True, False]
    assert p.extra_generation_params["NGMS"] == 3.0


def test_ngms_all_steps_option():
    sigmas = np.array([10.0, 5.0, 2.0, 1.0, 0.5, 0.0])
    p = GenerationParams(s_min_uncond=3.0)
    with opts.override({"s_min_uncond_all": True}):
        mask = np.asarray(_skip_uncond_mask(sigmas, p))
    assert mask.tolist() == [False, False, True, True, True]
    assert p.extra_generation_params["NGMS all steps"] == "True"


def test_skip_early_cond():
    sigmas = np.linspace(10, 0, 11)
    p = GenerationParams()
    with opts.override({"skip_early_cond": 0.3}):
        mask = np.asarray(_skip_uncond_mask(sigmas, p))
    assert mask.tolist() == [True] * 4 + [False] * 6   # i/10 <= 0.3
    assert p.extra_generation_params["Skip Early CFG"] == 0.3


def test_no_plan_returns_none():
    assert _skip_uncond_mask(np.array([1.0, 0.0]), GenerationParams()) is None


# --------------------------------------------------------------------------
# noise-schedule overrides
# --------------------------------------------------------------------------

def test_rescale_zero_terminal_snr():
    abar = make_alphas_cumprod()
    fixed = rescale_zero_terminal_snr_abar(abar)
    assert fixed[-1] == pytest.approx(4.8973451890853435e-08)
    assert fixed[0] == pytest.approx(abar[0])
    assert np.all(np.diff(fixed) < 0)


def test_ztsnr_changes_sigma_table(model):
    from sdwebui_tpu.pipeline.processing import _apply_schedule_overrides

    p = GenerationParams()
    with opts.override({"sd_noise_schedule": "Zero Terminal SNR"}):
        m2 = _apply_schedule_overrides(model, p)
    assert m2.disc.sigma_max > 100 * model.disc.sigma_max  # σ→large at zero SNR
    assert p.extra_generation_params["Noise Schedule"] == "Zero Terminal SNR"
    with opts.override({"use_downcasted_alpha_bar": True}):
        m3 = _apply_schedule_overrides(model, p)
    assert not np.allclose(m3.disc.alphas_cumprod, model.disc.alphas_cumprod)
    assert np.allclose(m3.disc.alphas_cumprod, model.disc.alphas_cumprod,
                       atol=1e-3)


# --------------------------------------------------------------------------
# eta fallbacks + hide_samplers
# --------------------------------------------------------------------------

def test_eta_option_fallbacks():
    p = GenerationParams()
    with opts.override({"eta_ddim": 0.3}):
        assert _solver_extra(p, get_sampler("DDIM"))["eta"] == 0.3
        assert "eta" not in _solver_extra(p, get_sampler("Euler a"))
    with opts.override({"eta_ancestral": 0.5}):
        assert _solver_extra(p, get_sampler("Euler a"))["eta"] == 0.5
        assert "eta" not in _solver_extra(p, get_sampler("DDIM"))
    p2 = GenerationParams(eta=0.9)
    with opts.override({"eta_ddim": 0.3}):
        assert _solver_extra(p2, get_sampler("DDIM"))["eta"] == 0.9


def test_hide_samplers_filters_listing():
    assert "Heun" in visible_sampler_names()
    with opts.override({"hide_samplers": ["Heun", "LMS"]}):
        names = visible_sampler_names()
    assert "Heun" not in names and "LMS" not in names
    assert get_sampler("Heun").name == "Heun"   # still addressable


# --------------------------------------------------------------------------
# end-to-end through the pipeline
# --------------------------------------------------------------------------

def test_sgm_noise_multiplier_e2e(model):
    kw = dict(prompt="a cat", seed=7, steps=3, width=64, height=64)
    base = process_txt2img(model, GenerationParams(**kw))
    sgm = process_txt2img(model, GenerationParams(
        **kw, override_settings={"sgm_noise_multiplier": True}))
    assert "SGM noise multiplier: True" in sgm.infotext
    assert np.asarray(base.images[0]).tolist() != \
        np.asarray(sgm.images[0]).tolist()


def test_churn_e2e_infotext(model):
    kw = dict(prompt="a cat", seed=7, steps=3, width=64, height=64,
              sampler_name="Euler")
    base = process_txt2img(model, GenerationParams(**kw))
    churned = process_txt2img(model, GenerationParams(**kw, s_churn=1.0))
    assert "Sigma churn" in churned.infotext
    assert np.asarray(base.images[0]).tolist() != \
        np.asarray(churned.images[0]).tolist()


def test_img2img_extra_noise_e2e(model):
    kw = dict(prompt="a cat", seed=3, steps=3, width=64, height=64,
              denoising_strength=0.6)
    base = process_img2img(model, GenerationParams(
        **kw, init_images=[_img()]))
    extra = process_img2img(model, GenerationParams(
        **kw, init_images=[_img()],
        override_settings={"img2img_extra_noise": 0.5}))
    assert "Extra noise" in extra.infotext
    assert np.asarray(base.images[0]).tolist() != \
        np.asarray(extra.images[0]).tolist()


def test_ngms_e2e_changes_output(model):
    kw = dict(prompt="a cat", negative_prompt="dog", seed=7, steps=4,
              width=64, height=64)
    base = process_txt2img(model, GenerationParams(**kw))
    ngms = process_txt2img(model, GenerationParams(
        **kw, s_min_uncond=100.0))   # skip uncond on every odd step
    assert "NGMS" in ngms.infotext
    assert np.asarray(base.images[0]).tolist() != \
        np.asarray(ngms.images[0]).tolist()


def test_ddim_discretize_quad(monkeypatch):
    """opts.ddim_discretize='quad' changes the DDIM sigma grid (reference
    make_ddim_timesteps quadratic spacing)."""
    from sdwebui_tpu.sampling.discretization import (Discretization,
                                                     make_alphas_cumprod)
    from sdwebui_tpu.sampling.schedulers import ddim
    from sdwebui_tpu.utils.options import opts

    disc = Discretization(make_alphas_cumprod())
    uni = ddim(10, 0.03, 14.6, disc)
    monkeypatch.setitem(opts.data, "ddim_discretize", "quad")
    quad = ddim(10, 0.03, 14.6, disc)
    assert uni.shape == quad.shape
    assert not np.allclose(uni, quad)
    assert np.all(np.diff(quad) <= 0)  # still monotonically decreasing
    assert quad[-1] == 0.0

"""End-to-end sampling golden: the REAL tiny UNet driven for 20 DDIM steps
with CFG by (a) the reference's own in-repo sampler loop
(modules/sd_samplers_timesteps_impl.ddim, torch) over the torch twin of the
same weights, and (b) our fused CFG + scan solver path — final latents and
every intermediate state must agree.

This is the whole-pipeline composition check the per-piece parity tests
can't provide: σ→t quantization, CFG combine, VP↔VE mapping, solver loop
and UNet numerics together.  (Euler-a's reference implementation lives in
the k-diffusion clone which is absent from this image; DDIM/PLMS are the
reference's in-repo sampler loops.)
"""

import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, str(Path(__file__).parent))
import reference_oracle as ro  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from sdwebui_tpu.pipeline.sd_model import create_tiny_sd, make_denoise_fn  # noqa: E402
from sdwebui_tpu.sampling.cfg import CondSchedule, make_cfg_denoiser  # noqa: E402
from sdwebui_tpu.sampling.sampler import sample  # noqa: E402

STEPS = 20
CFG_SCALE = 7.0


@pytest.fixture(scope="module")
def setup():
    # fp32 everywhere: the torch side runs fp32, and CFG (w=7) amplifies
    # bf16 rounding past any useful tolerance
    from sdwebui_tpu.utils import devices as dv

    old = dv.get_policy()
    dv.set_policy(dv.DtypePolicy(jnp.float32, jnp.float32, jnp.float32,
                                 jnp.float32))
    model = create_tiny_sd(seed=0)
    rng = np.random.default_rng(11)
    ctx_cond = rng.standard_normal((1, 7, 64)).astype(np.float32)
    ctx_uncond = rng.standard_normal((1, 7, 64)).astype(np.float32)
    x0 = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    timesteps = np.clip(np.arange(0, 1000, 1000 // STEPS) + 1, 0, 999)
    yield model, ctx_cond, ctx_uncond, x0, timesteps
    dv.set_policy(old)


def _reference_run(model, ctx_cond, ctx_uncond, x0, timesteps,
                   method="ddim"):
    import torch

    from torch_twin_unet import make_torch_unet

    impl = ro.load("modules.sd_samplers_timesteps_impl")
    twin = make_torch_unet(model.unet_cfg, model.unet_params)
    ac = np.asarray(model.disc.alphas_cumprod, np.float64)

    class _Chain:
        def __init__(self):
            inner2 = type("I2", (), {})()
            inner2.alphas_cumprod = torch.as_tensor(ac, dtype=torch.float32)
            inner = type("I1", (), {})()
            inner.inner_model = inner2
            self.inner_model = inner

        def __call__(self, x, ts, **kw):
            # CFG in eps space — linear, so identical to the reference's
            # denoised-space combine_denoised for an eps-pred model
            t = float(ts.reshape(-1)[0])
            xn = x.numpy().transpose(0, 2, 3, 1)
            with torch.no_grad():
                e_c = twin(xn, t, ctx_cond)
                e_u = twin(xn, t, ctx_uncond)
            eps = e_u + CFG_SCALE * (e_c - e_u)
            return torch.from_numpy(
                np.ascontiguousarray(eps.transpose(0, 3, 1, 2)))

    states = []
    fn = getattr(impl, method)
    out = fn(_Chain(),
             torch.from_numpy(x0.transpose(0, 3, 1, 2).copy()),
             torch.as_tensor(timesteps), disable=True,
             callback=lambda d: states.append(
                 d["x"].numpy().transpose(0, 2, 3, 1).copy()))
    return out.numpy().transpose(0, 2, 3, 1), states


def _our_run(model, ctx_cond, ctx_uncond, x0, timesteps, solver="ddim"):
    disc = model.disc
    t_desc = timesteps[::-1].astype(int)
    sigmas = np.asarray(disc.sigmas[t_desc], np.float64)

    sched = CondSchedule(
        cond_bank=jnp.asarray(ctx_cond)[None],           # (K=1,1,S,D)
        cond_idx=jnp.zeros((1, STEPS), jnp.int32),
        cond_weights=jnp.asarray([1.0], jnp.float32),
        uncond_bank=jnp.asarray(ctx_uncond),             # (1,S,D)
        uncond_idx=jnp.zeros((STEPS,), jnp.int32),
        cond_scale=CFG_SCALE,
    )
    model_fn = make_cfg_denoiser(make_denoise_fn(model), sched)

    # VP noise → VE start
    a0 = float(disc.alphas_cumprod[t_desc[0]])
    x = jnp.asarray(x0 / np.sqrt(a0), jnp.float32)
    states = []

    def cb(i, xs):
        s = float(sigmas[i + 1])
        states.append(np.asarray(xs) * np.sqrt(1.0 / (1.0 + s ** 2)))

    out = sample(model_fn, x, sigmas.astype(np.float32), solver=solver,
                 mode="loop", callback=cb)
    s_last = float(sigmas[-1])
    return np.asarray(out) * np.sqrt(1.0 / (1.0 + s_last ** 2)), states


def test_ddim_cfg_e2e_golden(setup):
    model, ctx_cond, ctx_uncond, x0, timesteps = setup
    want, ref_states = _reference_run(model, ctx_cond, ctx_uncond, x0,
                                      timesteps)
    got, our_states = _our_run(model, ctx_cond, ctx_uncond, x0, timesteps)

    assert len(ref_states) == len(our_states) == STEPS - 1
    for i, (a, b) in enumerate(zip(ref_states, our_states)):
        np.testing.assert_allclose(b, a, atol=2e-3, rtol=2e-3,
                                   err_msg=f"state {i}")
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
    # guard against degenerate agreement (both zero / unchanged input)
    assert np.abs(want - x0).max() > 0.1


# ---------------------------------------------------------------------------
# DPM++ 2M Karras e2e — the sampler the reference's users live on
# (modules/sd_samplers_kdiffusion.py:13 "DPM++ 2M"), composed through the
# REAL tiny UNet: torch side = independent twin UNet + hand-written
# k-diffusion update rule + CompVisDenoiser scalings (x/√(σ²+1), quantized
# σ→t, denoised = x − σ·ε) + CFG; jax side = the production CondSchedule +
# make_denoise_fn + scan solver.  Catches σ→t quantization, scaling and CFG
# composition errors the synthetic-denoiser twin tests (test_reference_oracle
# §18) cannot see.
# ---------------------------------------------------------------------------

def _karras_sigmas(n, sigma_min, sigma_max, rho=7.0):
    """Karras et al. 2022 eq. 5 (k-diffusion get_sigmas_karras),
    hand-written here for independence from sampling/schedulers.py."""
    ramp = np.linspace(0, 1, n)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    sig = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return np.concatenate([sig, [0.0]])


def test_dpmpp_2m_karras_cfg_e2e_golden(setup):
    import math

    import torch

    from torch_twin_unet import make_torch_unet

    model, ctx_cond, ctx_uncond, x0, _timesteps = setup
    disc = model.disc
    # karras builds the schedule descending already
    sigmas = _karras_sigmas(STEPS, float(disc.sigmas.min()),
                            float(disc.sigmas.max()))

    twin = make_torch_unet(model.unet_cfg, model.unet_params)
    log_sig = np.log(np.asarray(disc.sigmas, np.float64))

    def denoiser(x, sigma):
        # CompVisDenoiser: t = nearest log-sigma row (quantize=True),
        # c_in = 1/√(σ²+1), ε-pred → denoised = x − σ·ε; CFG in ε space
        t = int(np.argmin(np.abs(math.log(sigma) - log_sig)))
        xn = (x.numpy() / math.sqrt(sigma ** 2 + 1.0)).astype(np.float32)
        with torch.no_grad():
            e_c = twin(xn, t, ctx_cond)
            e_u = twin(xn, t, ctx_uncond)
        eps = e_u + CFG_SCALE * (e_c - e_u)
        return x - sigma * torch.from_numpy(np.asarray(eps))

    # hand-written k-diffusion sample_dpmpp_2m update (see oracle §18)
    x_t = torch.from_numpy((x0 * float(sigmas[0])).astype(np.float32))
    old_denoised = None
    ref_states = []
    for i in range(len(sigmas) - 1):
        sig, sig_next = float(sigmas[i]), float(sigmas[i + 1])
        denoised = denoiser(x_t, sig)
        t, t_next = -math.log(sig), -math.log(max(sig_next, 1e-12))
        h = t_next - t
        if old_denoised is None or sig_next == 0:
            denoised_d = denoised
        else:
            h_last = t - (-math.log(float(sigmas[i - 1])))
            r = h_last / h
            denoised_d = (1 + 1 / (2 * r)) * denoised \
                - (1 / (2 * r)) * old_denoised
        x_t = (sig_next / sig) * x_t - math.expm1(-h) * denoised_d
        old_denoised = denoised
        ref_states.append(x_t.numpy().copy())

    # production path: CondSchedule + make_denoise_fn + the scan solver
    sched = CondSchedule(
        cond_bank=jnp.asarray(ctx_cond)[None],
        cond_idx=jnp.zeros((1, STEPS), jnp.int32),
        cond_weights=jnp.asarray([1.0], jnp.float32),
        uncond_bank=jnp.asarray(ctx_uncond),
        uncond_idx=jnp.zeros((STEPS,), jnp.int32),
        cond_scale=CFG_SCALE,
    )
    model_fn = make_cfg_denoiser(make_denoise_fn(model), sched)
    our_states = []
    out = sample(model_fn, jnp.asarray(x0 * float(sigmas[0])),
                 sigmas.astype(np.float32), solver="dpmpp_2m", mode="loop",
                 callback=lambda i, xs: our_states.append(np.asarray(xs)))
    for i, (a, b) in enumerate(zip(ref_states, our_states)):
        np.testing.assert_allclose(b, a, atol=3e-3, rtol=3e-3,
                                   err_msg=f"state {i}")
    np.testing.assert_allclose(np.asarray(out), ref_states[-1],
                               atol=3e-3, rtol=3e-3)
    assert np.abs(ref_states[-1] - x0).max() > 0.1


def test_plms_cfg_e2e_golden(setup):
    """PLMS through the REAL tiny UNet vs the reference's own in-repo PLMS
    loop (modules/sd_samplers_timesteps_impl.py:84) — the multistep
    eps-history composition (PNDM warmup + 4th-order Adams-Bashforth) on
    top of the same VP↔VE mapping the DDIM golden pins."""
    model, ctx_cond, ctx_uncond, x0, timesteps = setup
    want, ref_states = _reference_run(model, ctx_cond, ctx_uncond, x0,
                                      timesteps, method="plms")
    got, our_states = _our_run(model, ctx_cond, ctx_uncond, x0, timesteps,
                               solver="plms")
    assert len(ref_states) == len(our_states) == STEPS - 1
    for i, (a, b) in enumerate(zip(ref_states, our_states)):
        np.testing.assert_allclose(b, a, atol=5e-3, rtol=5e-3,
                                   err_msg=f"state {i}")
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)
    assert np.abs(want - x0).max() > 0.1

"""Noise-schedule discretization: alphas_cumprod ↔ sigma tables.

Host-side fp64 numpy (fp32 islands rule: schedule math never runs in bf16 —
SURVEY.md §2.7).  Replicates the behaviour of k-diffusion's
``DiscreteSchedule``/``DiscreteEpsDDPMDenoiser`` (the reference wraps ldm
models with these; modules/sd_samplers_kdiffusion.py:56) and ldm's
``register_schedule`` beta schedule.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def rescale_zero_terminal_snr_abar(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Shift/scale √ᾱ so the terminal step has zero SNR (Lin et al. 2023,
    'Common Diffusion Noise Schedules and Sample Steps are Flawed';
    reference modules/sd_models.py rescale_zero_terminal_snr_abar, applied
    by the sd_noise_schedule='Zero Terminal SNR' setting for CosXL-style
    v-prediction checkpoints)."""
    sqrt = np.sqrt(np.asarray(alphas_cumprod, np.float64))
    sqrt_0, sqrt_t = sqrt[0], sqrt[-1]
    sqrt = (sqrt - sqrt_t) * sqrt_0 / (sqrt_0 - sqrt_t)
    abar = sqrt ** 2
    abar[-1] = 4.8973451890853435e-08   # the reference's terminal epsilon
    return abar


def make_alphas_cumprod(linear_start: float = 0.00085, linear_end: float = 0.0120,
                        timesteps: int = 1000) -> np.ndarray:
    """ldm 'linear' schedule: betas linear in sqrt-space."""
    betas = np.linspace(linear_start ** 0.5, linear_end ** 0.5, timesteps,
                        dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas, axis=0)


@dataclasses.dataclass
class Discretization:
    """sigma table + parameterization for one trained diffusion model.

    prediction_type: 'eps' (SD1.x/SDXL) or 'v' (SD2.x 768-v).
    quantize: round sigma→t to integers before the model sees them
    (k-diffusion `quantize=True`, the behaviour webui uses for checkpoints).
    """

    alphas_cumprod: np.ndarray
    prediction_type: str = "eps"
    quantize: bool = True

    def __post_init__(self):
        ac = np.asarray(self.alphas_cumprod, dtype=np.float64)
        self.sigmas = np.sqrt((1.0 - ac) / ac)  # (T,)
        self.log_sigmas = np.log(self.sigmas)

    # ---- sigma <-> t ---------------------------------------------------

    @property
    def sigma_min(self) -> float:
        return float(self.sigmas[0])

    @property
    def sigma_max(self) -> float:
        return float(self.sigmas[-1])

    def sigma_to_t(self, sigma, do_quantize: bool | None = None):
        """Continuous (interpolated) or quantized timestep for sigma."""
        sigma = np.asarray(sigma, dtype=np.float64)
        log_sigma = np.log(sigma)
        dists = log_sigma[..., None] - self.log_sigmas[None, :]
        if do_quantize if do_quantize is not None else self.quantize:
            return np.abs(dists).argmin(axis=-1).astype(np.float64)
        low_idx = np.clip((dists >= 0).cumsum(axis=-1).argmax(axis=-1),
                          0, len(self.sigmas) - 2)
        high_idx = low_idx + 1
        low = self.log_sigmas[low_idx]
        high = self.log_sigmas[high_idx]
        w = np.clip((low - log_sigma) / (low - high), 0, 1)
        return (1 - w) * low_idx + w * high_idx

    def t_to_sigma(self, t):
        t = np.asarray(t, dtype=np.float64)
        low_idx = np.floor(t).astype(int)
        high_idx = np.ceil(t).astype(int)
        w = t - low_idx
        return np.exp((1 - w) * self.log_sigmas[low_idx] + w * self.log_sigmas[high_idx])

    def get_sigmas(self, n: int) -> np.ndarray:
        """k-diffusion default ('Automatic'/'Uniform') schedule: n sigmas
        log-interpolated over the full trained range + terminal 0."""
        t = np.linspace(len(self.sigmas) - 1, 0, n)
        return np.append(self.t_to_sigma(t), 0.0).astype(np.float64)

    # ---- model-call scalings (used inside jit; pure formulas) ----------

    def scalings(self, sigma):
        """Returns (c_in, c_out, c_skip) such that
        denoised = c_skip*x + c_out*model(c_in*x, t)."""
        if self.prediction_type == "eps":
            c_in = 1.0 / (sigma ** 2 + 1.0) ** 0.5
            return c_in, -sigma, 1.0
        elif self.prediction_type == "v":
            c_in = 1.0 / (sigma ** 2 + 1.0) ** 0.5
            c_out = -sigma / (sigma ** 2 + 1.0) ** 0.5
            c_skip = 1.0 / (sigma ** 2 + 1.0)
            return c_in, c_out, c_skip
        raise ValueError(self.prediction_type)


class FlowDiscretization(Discretization):
    """Rectified-flow (SD3) sigma table: σ(t) = shift·t / (1 + (shift−1)·t),
    t ∈ (0,1]; model timestep = σ·1000 (reference
    modules/models/sd3/sd3_impls.py ModelSamplingDiscreteFlow).  x_t is a
    LERP (σ·noise + (1−σ)·x0), not variance-exploding — the pipeline
    branches on prediction_type == 'flow'."""

    def __init__(self, shift: float = 3.0, timesteps: int = 1000):
        self.shift = shift
        t = np.arange(1, timesteps + 1, dtype=np.float64) / timesteps
        self.prediction_type = "flow"
        self.quantize = False
        self.alphas_cumprod = None
        self.sigmas = self.shift * t / (1 + (self.shift - 1) * t)
        self.log_sigmas = np.log(self.sigmas)

    def __post_init__(self):  # pragma: no cover - dataclass hook unused
        pass

    def noise_scaling(self, sigma, noise, latent):
        return sigma * noise + (1.0 - sigma) * latent

    def scalings(self, sigma):
        return 1.0, -sigma, 1.0


def lcm_subtable(disc, original_timesteps: int = 50):
    """LCM's 50-entry distillation sigma subtable (reference
    modules/sd_samplers_lcm.py LCMCompVisDenoiser.__init__):
    alphas_cumprod_valid[orig-1-x] = alphas_cumprod[T-1-x*skip], i.e. full
    timesteps t = skip-1, 2*skip-1, …, T-1 ascending.  Returns
    (t_full (orig,), sigmas (orig,)) both ascending."""
    ac = np.asarray(disc.alphas_cumprod, np.float64)
    T = len(ac)
    skip = T // original_timesteps
    t_full = np.arange(skip - 1, T, skip)
    sub_ac = ac[t_full]
    return t_full, np.sqrt((1.0 - sub_ac) / sub_ac)


def lcm_schedule(disc, n: int, original_timesteps: int = 50) -> np.ndarray:
    """LCM 'Automatic' schedule (LCMCompVisDenoiser.get_sigmas(n)): uniform
    in full-range timestep between the subtable's max and min, each mapped
    back through the subtable's interpolated t→sigma, then append zero."""
    t_full, sub_sigmas = lcm_subtable(disc, original_timesteps)
    log_sub = np.log(sub_sigmas)
    skip = len(disc.alphas_cumprod) // original_timesteps
    start, end = float(t_full[-1]), float(t_full[0])
    t = np.linspace(start, end, n)
    # t_to_sigma: clamp to subtable index space, lerp in log sigma
    ts = np.clip((t - (skip - 1)) / skip, 0, original_timesteps - 1)
    low = np.floor(ts).astype(int)
    high = np.ceil(ts).astype(int)
    w = ts - low
    log_sigma = (1 - w) * log_sub[low] + w * log_sub[high]
    return np.concatenate([np.exp(log_sigma), [0.0]])

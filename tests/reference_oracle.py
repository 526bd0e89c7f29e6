"""Import /root/reference modules verbatim, as parity oracles.

The reference repo (AUTOMATIC1111/stable-diffusion-webui) is importable
in-image for its pure-torch/pure-python pieces; what it cannot satisfy are
its *environment* imports: the `modules.shared` options blackboard, the
git-cloned `k_diffusion` repo, and `modules.devices`.  This loader inserts
minimal stand-ins for exactly those names into ``sys.modules`` and then
imports the requested reference module from its real source tree, so the
oracle code that runs is the reference's own.

Stub inventory (everything else is genuine reference code):
  - ``modules.shared``     — `opts` namespace with the handful of defaults
    the imported modules read (uni_pc_*, beta_dist_*), `sd_model.is_sdxl`.
  - ``modules.devices``    — `unet_needs_upcast=False` (deepbooru_model).
  - ``modules.sd_hijack``  — empty (sd3 other_impls imports it at top level
    but only uses it inside weight-loading paths we don't exercise).
  - ``k_diffusion.sampling`` — the three public Karras-paper schedule
    formulas (get_sigmas_karras/exponential/polyexponential, each <=5 lines
    from arXiv:2206.00364 eq.5) plus a `torch` attribute; the reference
    clones the k-diffusion repo at launch (modules/launch_utils.py:348-415),
    which a zero-egress image cannot.  Schedules that rely on these three
    are therefore oracle-checked against the published formula, not cloned
    code; the other nine schedules run the reference's own implementation.
"""

from __future__ import annotations

import importlib
import sys
import types

REFERENCE = "/root/reference"


def _k_diffusion_stub():
    import torch

    sampling = types.ModuleType("k_diffusion.sampling")
    sampling.torch = torch

    def append_zero(x):
        return torch.cat([x, x.new_zeros([1])])

    def get_sigmas_karras(n, sigma_min, sigma_max, rho=7.0, device="cpu"):
        ramp = torch.linspace(0, 1, n, device=device)
        min_inv_rho = sigma_min ** (1 / rho)
        max_inv_rho = sigma_max ** (1 / rho)
        sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
        return append_zero(sigmas).to(device)

    def get_sigmas_exponential(n, sigma_min, sigma_max, device="cpu"):
        sigmas = torch.linspace(
            __import__("math").log(sigma_max), __import__("math").log(sigma_min),
            n, device=device).exp()
        return append_zero(sigmas)

    def get_sigmas_polyexponential(n, sigma_min, sigma_max, rho=1.0, device="cpu"):
        import math

        ramp = torch.linspace(1, 0, n, device=device) ** rho
        sigmas = torch.exp(
            ramp * (math.log(sigma_max) - math.log(sigma_min)) + math.log(sigma_min))
        return append_zero(sigmas)

    def to_d(x, sigma, denoised):
        # k-diffusion's public ODE-derivative utility (one line, Karras
        # eq.(3)); needed by the reference's restart sampler
        return (x - denoised) / sigma.view(-1, *([1] * (x.ndim - 1)))

    def default_noise_sampler(x):
        return lambda sigma, sigma_next: torch.randn_like(x)

    def trange(n, disable=None, **kw):
        return range(n)

    sampling.append_zero = append_zero
    sampling.to_d = to_d
    sampling.get_sigmas_karras = get_sigmas_karras
    sampling.get_sigmas_exponential = get_sigmas_exponential
    sampling.get_sigmas_polyexponential = get_sigmas_polyexponential
    sampling.default_noise_sampler = default_noise_sampler
    sampling.trange = trange

    # k_diffusion.utils.append_dims (one-liner from the public repo)
    utils = types.ModuleType("k_diffusion.utils")

    def append_dims(x, target_dims):
        return x[(...,) + (None,) * (target_dims - x.ndim)]

    utils.append_dims = append_dims

    # k_diffusion.external.Discrete(EpsDDPM)Denoiser — the public base class
    # the reference's in-repo LCM denoiser subclasses
    # (modules/sd_samplers_lcm.py:9); buffers + t<->sigma + eps scalings per
    # the published source.  The LCM-specific math stays reference code.
    external = types.ModuleType("k_diffusion.external")

    class DiscreteSchedule(torch.nn.Module):
        def __init__(self, sigmas, quantize):
            super().__init__()
            self.register_buffer("sigmas", sigmas)
            self.register_buffer("log_sigmas", sigmas.log())
            self.quantize = quantize

        @property
        def sigma_min(self):
            return self.sigmas[0]

        @property
        def sigma_max(self):
            return self.sigmas[-1]

        def t_to_sigma(self, t):
            t = t.float()
            low_idx = t.floor().long()
            high_idx = t.ceil().long()
            w = t.frac()
            log_sigma = (1 - w) * self.log_sigmas[low_idx] \
                + w * self.log_sigmas[high_idx]
            return log_sigma.exp()

        def sigma_to_t(self, sigma, quantize=None):
            quantize = self.quantize if quantize is None else quantize
            log_sigma = sigma.log()
            dists = log_sigma - self.log_sigmas[:, None]
            if quantize:
                return dists.abs().argmin(dim=0).view(sigma.shape)
            low_idx = dists.ge(0).cumsum(dim=0).argmax(dim=0).clamp(
                max=self.log_sigmas.shape[0] - 2)
            high_idx = low_idx + 1
            low, high = self.log_sigmas[low_idx], self.log_sigmas[high_idx]
            w = (low - log_sigma) / (low - high)
            w = w.clamp(0, 1)
            t = (1 - w) * low_idx + w * high_idx
            return t.view(sigma.shape)

    class DiscreteEpsDDPMDenoiser(DiscreteSchedule):
        def __init__(self, model, alphas_cumprod, quantize):
            super().__init__(((1 - alphas_cumprod) / alphas_cumprod) ** 0.5,
                             quantize)
            self.inner_model = model
            self.sigma_data = 1.0

        def get_scalings(self, sigma):
            c_out = -sigma
            c_in = 1 / (sigma ** 2 + self.sigma_data ** 2) ** 0.5
            return c_out, c_in

        def get_eps(self, *args, **kwargs):
            return self.inner_model(*args, **kwargs)

        def forward(self, input, sigma, **kwargs):
            c_out, c_in = [append_dims(x, input.ndim)
                           for x in self.get_scalings(sigma)]
            eps = self.get_eps(input * c_in, self.sigma_to_t(sigma), **kwargs)
            return input + eps * c_out

    external.DiscreteSchedule = DiscreteSchedule
    external.DiscreteEpsDDPMDenoiser = DiscreteEpsDDPMDenoiser

    pkg = types.ModuleType("k_diffusion")
    pkg.sampling = sampling
    pkg.utils = utils
    pkg.external = external
    return pkg, sampling


class _Opts:
    """Defaults mirrored from reference modules/shared_options.py."""

    beta_dist_alpha = 0.6
    beta_dist_beta = 0.6
    uni_pc_variant = "bh1"
    uni_pc_skip_type = "time_uniform"
    uni_pc_order = 3
    uni_pc_lower_order_final = True
    use_old_scheduling = False
    sdxl_crop_left = 0
    sdxl_crop_top = 0
    randn_source = "NV"
    eta_noise_seed_delta = 0
    emphasis = "Original"
    comma_padding_backtrack = 20


class _SharedSDModel:
    is_sdxl = False


def install_stubs():
    """Idempotently seed sys.modules with the reference's env stand-ins."""
    if REFERENCE not in sys.path:
        # append (not insert) so the repo's own packages always win lookups
        sys.path.append(REFERENCE)
    if "k_diffusion" not in sys.modules:
        pkg, sampling = _k_diffusion_stub()
        pkg.__path__ = []  # mark as package so submodule imports resolve
        sys.modules["k_diffusion"] = pkg
        sys.modules["k_diffusion.sampling"] = sampling
        sys.modules["k_diffusion.utils"] = pkg.utils
        sys.modules["k_diffusion.external"] = pkg.external

    import modules  # namespace package rooted at /root/reference/modules

    for name, maker in {
        "modules.shared": lambda m: (
            setattr(m, "opts", _Opts()), setattr(m, "sd_model", _SharedSDModel()),
            setattr(m, "state", types.SimpleNamespace(interrupted=False, skipped=False)),
            setattr(m, "device", "cpu"),
        ),
        "modules.devices": lambda m: (
            setattr(m, "unet_needs_upcast", False),
            setattr(m, "device", "cpu"),
        ),
        "modules.sd_hijack": lambda m: None,
        # heavy environment modules the sampler import chain pulls at module
        # level but only touches at generation time (images needs pytz,
        # sd_models needs ldm/sgm, sd_samplers re-imports every sampler
        # module): empty stand-ins keep `modules.sd_samplers_lcm` importable
        # so ITS code runs as the oracle.
        "modules.images": lambda m: None,
        "modules.sd_models": lambda m: None,
        "modules.sd_samplers": lambda m: None,
        # sd_samplers_common monkeypatches torchsde's brownian RNG at import
        # (replace_torchsde_browinan); a skeleton module accepts the patch
        "torchsde": lambda m: setattr(m, "_brownian", types.SimpleNamespace(
            brownian_interval=types.SimpleNamespace(_randn=None))),
        "torchsde._brownian": lambda m: setattr(
            m, "brownian_interval",
            types.SimpleNamespace(_randn=None)),
        "torchsde._brownian.brownian_interval": lambda m: setattr(
            m, "_randn", None),
        # script_callbacks pulls fastapi/gradio/diskcache; the CFG denoiser
        # only needs the callback entry points (no-ops here — we oracle the
        # denoiser math, not the extension hook fan-out)
        "modules.script_callbacks": lambda m: (
            setattr(m, "CFGDenoiserParams", lambda *a, **k: None),
            setattr(m, "CFGDenoisedParams", lambda *a, **k: None),
            setattr(m, "AfterCFGCallbackParams", lambda *a, **k: None),
            setattr(m, "cfg_denoiser_callback", lambda *a, **k: None),
            setattr(m, "cfg_denoised_callback", lambda *a, **k: None),
            setattr(m, "cfg_after_cfg_callback", lambda *a, **k: None),
            setattr(m, "ExtraNoiseParams", lambda *a, **k: None),
            setattr(m, "extra_noise_callback", lambda *a, **k: None),
        ),
        # modules/paths.py asserts a git-cloned stable-diffusion repo exists;
        # sd_vae_approx only reads models_path/script_path from it.
        "modules.paths": lambda m: (
            setattr(m, "models_path", "/tmp/ref-models"),
            setattr(m, "script_path", REFERENCE),
            setattr(m, "data_path", "/tmp/ref-data"),
        ),
    }.items():
        if name not in sys.modules:
            mod = types.ModuleType(name)
            maker(mod)
            sys.modules[name] = mod
            setattr(modules, name.split(".")[-1], mod)
    return sys.modules["modules.shared"]


def load(name: str):
    """Import a reference module (e.g. 'modules.sd_schedulers') as-is."""
    install_stubs()
    return importlib.import_module(name)

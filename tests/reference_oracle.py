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

    sampling.append_zero = append_zero
    sampling.to_d = to_d
    sampling.get_sigmas_karras = get_sigmas_karras
    sampling.get_sigmas_exponential = get_sigmas_exponential
    sampling.get_sigmas_polyexponential = get_sigmas_polyexponential

    pkg = types.ModuleType("k_diffusion")
    pkg.sampling = sampling
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
        sys.modules["k_diffusion"] = pkg
        sys.modules["k_diffusion.sampling"] = sampling

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

"""User-facing sampler registry — the reference's sampler name surface.

Mirrors the name table of modules/sd_samplers_kdiffusion.py:11-27 (+ LCM,
timestep samplers).  Each entry: solver key, forced scheduler (the
"... Karras"/"... Exponential" aliases), extra solver options, and whether
the sampler consumes ancestral noise (drives ENSD / seed reproducibility).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SamplerData:
    name: str
    solver: str
    aliases: tuple = ()
    scheduler_override: str | None = None
    extra: tuple = ()                 # (key, value) pairs for solver extra
    uses_ensd: bool = False           # ancestral/sde: eta-noise-seed-delta applies
    second_order: bool = False


_S = SamplerData

SAMPLERS = [
    _S("DPM++ 2M", "dpmpp_2m", ("k_dpmpp_2m",)),
    _S("DPM++ SDE", "dpmpp_sde", ("k_dpmpp_sde",), uses_ensd=True, second_order=True),
    _S("DPM++ 2M SDE", "dpmpp_2m_sde", ("k_dpmpp_2m_sde",), uses_ensd=True),
    _S("DPM++ 2M SDE Heun", "dpmpp_2m_sde", ("k_dpmpp_2m_sde_heun",),
       extra=(("solver_type", "heun"),), uses_ensd=True),
    _S("DPM++ 2S a", "dpmpp_2s_ancestral", ("k_dpmpp_2s_a",), uses_ensd=True,
       second_order=True),
    _S("DPM++ 3M SDE", "dpmpp_3m_sde", ("k_dpmpp_3m_sde",), uses_ensd=True),
    _S("Euler a", "euler_ancestral", ("k_euler_a", "k_euler_ancestral"), uses_ensd=True),
    _S("Euler", "euler", ("k_euler",)),
    _S("LMS", "lms", ("k_lms",)),
    _S("Heun", "heun", ("k_heun",), second_order=True),
    _S("DPM2", "dpm_2", ("k_dpm_2",), second_order=True),
    _S("DPM2 a", "dpm_2_ancestral", ("k_dpm_2_a",), uses_ensd=True, second_order=True),
    _S("LCM", "lcm", ("k_lcm",), uses_ensd=True),
    _S("DPM fast", "dpm_fast", ("k_dpm_fast",), uses_ensd=True),
    _S("DPM adaptive", "dpm_adaptive", ("k_dpm_ad",), uses_ensd=True),
    _S("Restart", "restart", ("restart",), scheduler_override="karras",
       uses_ensd=True, second_order=True),
    # timestep ("CompVis") samplers — integer-timestep schedules
    _S("DDIM", "ddim", ("ddim",), scheduler_override="ddim", uses_ensd=True),
    _S("UniPC", "unipc", ("unipc",), scheduler_override="ddim",
       second_order=True),
    _S("DDIM CFG++", "ddim_cfgpp", ("ddim_cfgpp",), scheduler_override="ddim",
       uses_ensd=True),
    _S("PLMS", "plms", ("plms",), scheduler_override="ddim", second_order=True),
    # scheduler-suffix aliases kept for infotext back-compat
    _S("LMS Karras", "lms", ("k_lms_ka",), scheduler_override="karras"),
    _S("DPM2 Karras", "dpm_2", ("k_dpm_2_ka",), scheduler_override="karras",
       uses_ensd=True, second_order=True),
    _S("DPM2 a Karras", "dpm_2_ancestral", ("k_dpm_2_a_ka",),
       scheduler_override="karras", uses_ensd=True, second_order=True),
    _S("DPM++ 2S a Karras", "dpmpp_2s_ancestral", ("k_dpmpp_2s_a_ka",),
       scheduler_override="karras", uses_ensd=True, second_order=True),
]

SAMPLER_MAP = {}
for s in SAMPLERS:
    SAMPLER_MAP[s.name] = s
    for a in s.aliases:
        SAMPLER_MAP[a] = s


def get_sampler(name: str) -> SamplerData:
    if name in ("", None, "Automatic"):
        name = "Euler a"
    if name not in SAMPLER_MAP:
        raise ValueError(f"unknown sampler {name!r}")
    return SAMPLER_MAP[name]


def visible_sampler_names():
    return [s.name for s in SAMPLERS]

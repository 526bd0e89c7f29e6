"""Generation orchestrator — the reference's `process_images`
(modules/processing.py:819) redesigned around compiled device programs.

Host side: seeds, prompt schedules, infotext, PIL.  Device side: ONE fused
jit per (shape, steps, solver) signature covering the entire sampling loop
(CFG batching + UNet + solver scan) — no host↔device crossings between
steps — plus a second jit for VAE decode.  Weight pytrees are jit arguments,
so LoRA/checkpoint swaps never retrace.
"""

from __future__ import annotations

import functools
import random
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from sdwebui_tpu import __version__
from sdwebui_tpu.models import unet as unet_model
from sdwebui_tpu.models import vae as vae_model
from sdwebui_tpu.pipeline.params import GenerationParams, Processed
from sdwebui_tpu.pipeline.sd_model import SDModel
from sdwebui_tpu.rng import ImageRNG, create_rng
from sdwebui_tpu.sampling.cfg import CondSchedule, make_cfg_denoiser
from sdwebui_tpu.sampling.registry import get_sampler
from sdwebui_tpu.sampling.sampler import prepare_noise, sample
from sdwebui_tpu.sampling.schedulers import get_schedule
from sdwebui_tpu.text.conditioner import build_cond_schedule
from sdwebui_tpu.utils import images as images_util
from sdwebui_tpu.utils import infotext as infotext_util
from sdwebui_tpu.utils.timer import Timer

#: stage timing of the most recent generation (reference keeps a per-job
#: wall clock in the UI footer, modules/call_queue.py:96; set
#: SDTPU_STAGE_TIMING=1 to print the summary per batch)
last_job_timer: Timer | None = None

MAX_SEED = 2 ** 32 - 1


# ==========================================================================
# fused device programs
# ==========================================================================

def _control_for_step(control, step):
    """Index each tower's per-step scale array at `step` (clamped), so the
    denoise closure sees scalar gates."""
    if not control:
        return control
    out = []
    for cp, hint, scales, mode in control:
        s = scales[jnp.clip(step, 0, scales.shape[0] - 1)]
        out.append((cp, hint, s, mode))
    return tuple(out)


def _apply_control(control, control_cfgs, x_in, t, ctx, y, n_cond_rows=None):
    """control here carries per-tower scalar scales (already step-indexed)
    plus the unit's control_mode:

      0 Balanced — residuals on every CFG row (extension default);
      1 "My prompt is more important" — soft per-layer decay 0.825^(n-1-i)
        (sd-webui-controlnet hook.py soft_injection weights);
      2 "ControlNet is more important" — residuals only on the cond rows,
        so the CFG combine amplifies them by cond_scale (cfg_injection).
    """
    from sdwebui_tpu.models import controlnet as controlnet_model

    b, hh, ww = x_in.shape[0], x_in.shape[1], x_in.shape[2]
    ctrl = None
    for (cp, hint, s, mode), ccfg in zip(control, control_cfgs):
        reps = b // hint.shape[0]
        hint_in = jnp.tile(hint, (reps, 1, 1, 1)).astype(x_in.dtype)

        def _run(cp=cp, ccfg=ccfg, hint_in=hint_in, s=s, mode=mode):
            res = controlnet_model.apply(
                cp, ccfg, x_in[..., :ccfg.in_channels], t, ctx, hint_in,
                y=y if ccfg.adm_in_channels else None)
            n = len(res["input"]) + 1
            one = jnp.asarray(1.0, x_in.dtype)
            soft = [jnp.where(mode == 1,
                              jnp.asarray(0.825 ** (n - 1 - i), x_in.dtype),
                              one) for i in range(n)]
            gate = one
            if n_cond_rows is not None:
                rows = (jnp.arange(b) < n_cond_rows).astype(x_in.dtype)
                gate = jnp.where(mode == 2, rows,
                                 jnp.ones_like(rows))[:, None, None, None]
            res = {"input": tuple(r * (w * gate)
                                  for r, w in zip(res["input"], soft[:-1])),
                   "middle": res["middle"] * (soft[-1] * gate)}
            return controlnet_model.scale_control(res, s.astype(x_in.dtype))

        def _zero(ccfg=ccfg):
            return controlnet_model.zero_control(ccfg, b, hh, ww, x_in.dtype)

        res = jax.lax.cond(s > 0, _run, _zero)
        ctrl = controlnet_model.add_controls(ctrl, res)
    return ctrl


def _sigma_to_t_traced(sigma, log_sigmas, quantize: bool):
    """σ → model timestep inside jit.  quantize=False (the reference's
    default: k-diffusion CompVisDenoiser built with
    quantize=opts.enable_quantization, modules/sd_samplers_kdiffusion.py)
    interpolates a fractional t between table entries; True snaps to the
    nearest trained timestep ("sharper and cleaner results. This may change
    existing seeds")."""
    log_sigma = jnp.log(jnp.maximum(sigma, 1e-12))
    dists = log_sigma[:, None] - log_sigmas[None, :]
    if quantize:
        return jnp.argmin(jnp.abs(dists), axis=-1).astype(jnp.float32)
    ge = (dists >= 0).astype(jnp.int32)
    low_idx = jnp.clip(jnp.argmax(jnp.cumsum(ge, axis=-1), axis=-1),
                       0, log_sigmas.shape[0] - 2)
    high_idx = low_idx + 1
    low = log_sigmas[low_idx]
    high = log_sigmas[high_idx]
    w = jnp.clip((low - log_sigma) / (low - high), 0.0, 1.0)
    return ((1 - w) * low_idx + w * high_idx).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("solver", "unet_cfg", "prediction_type", "extra_items",
                     "hn_meta", "control_cfgs"))
def _sample_fused(unet_params, log_sigmas, x, sigmas, noise, sched: CondSchedule,
                  mask, nmask, init_latent, lms_coeffs, hypernet_tree,
                  solver: str, unet_cfg, prediction_type: str, extra_items,
                  hn_meta=None, control=None, control_cfgs=()):
    from sdwebui_tpu.utils import devices as _dv

    extra = dict(extra_items)
    compute_dtype = jnp.dtype(extra.pop(
        "compute_dtype", jnp.dtype(_dv.get_policy().compute_dtype).name))
    attn_impl = extra.pop("attn_impl", "")
    quantize_t = bool(extra.pop("quantize_t", True))
    if lms_coeffs is not None:
        # traced aux channel: LMS / restart / UniPC host-precomputed arrays
        if solver == "restart":
            extra["restart_pairs"], extra["restart_noise_scale"] = lms_coeffs
        elif solver == "unipc":
            extra.update(lms_coeffs)
        else:
            extra["lms_coeffs"] = lms_coeffs

    def denoise(xb, sigma, ctx, y=None, c_concat=None, step=None):
        sigma = sigma.astype(jnp.float32)
        sig = sigma[:, None, None, None]
        if prediction_type == "flow":
            # rectified flow (SD3): raw input, timestep = σ·1000, velocity out
            from sdwebui_tpu.models import mmdit as mmdit_model

            out = mmdit_model.apply(unet_params, unet_cfg,
                                    xb.astype(compute_dtype), sigma * 1000.0,
                                    ctx, y).astype(jnp.float32)
            return xb - out * sig
        if solver == "lcm":
            # LCM consistency-model wrapper (reference modules/
            # sd_samplers_lcm.py LCMCompVisDenoiser): sigma quantizes to the
            # 50-entry distillation subtable (t = 19, 39, …, 999) and the
            # raw eps prediction passes through the CM output transform in
            # the lcm-return branch below
            orig = 50
            skip = log_sigmas.shape[0] // orig
            sub = log_sigmas[skip - 1::skip]                       # (50,)
            j = jnp.argmin(jnp.abs(
                jnp.log(jnp.maximum(sigma, 1e-12))[:, None] - sub[None, :]),
                axis=-1)
            t = (j * skip + (skip - 1)).astype(jnp.float32)
        else:
            t = _sigma_to_t_traced(sigma, log_sigmas, quantize_t)
        c_in = (1.0 / jnp.sqrt(sigma ** 2 + 1.0))[:, None, None, None]
        x_in = (xb * c_in).astype(compute_dtype)
        ctrl = None
        if control:
            # cond rows come first in the CFG batch (B*K cond + B uncond);
            # mode-2 units apply only there
            n_cond = x_in.shape[0] - x_in.shape[0] // (
                sched.cond_bank.shape[0] + 1)
            ctrl = _apply_control(_control_for_step(control, step),
                                  control_cfgs, x_in, t, ctx, y,
                                  n_cond_rows=n_cond)
        if c_concat is not None:
            x_in = jnp.concatenate([x_in, c_concat.astype(x_in.dtype)], axis=-1)
        hypernet = (hypernet_tree, hn_meta) if hypernet_tree is not None else None
        out = unet_model.apply(unet_params, unet_cfg, x_in, t, ctx,
                               y=y, hypernet=hypernet,
                               control=ctrl).astype(jnp.float32)
        if prediction_type == "v":
            return xb / (sig ** 2 + 1.0) - out * sig / jnp.sqrt(sig ** 2 + 1.0)
        if solver == "lcm":
            # get_scaled_out (sd_samplers_lcm.py:52): boundary-condition
            # scalings with sigma_data=0.5 over scaled_timestep = t·10
            st = (t * 10.0)[:, None, None, None]
            c_skip = 0.25 / (st ** 2 + 0.25)
            c_out = st / jnp.sqrt(st ** 2 + 0.25)
            return c_out * (xb - out * sig) + c_skip * xb
        return xb - out * sig

    soft = extra.pop("soft_inpainting", None)
    model_fn = make_cfg_denoiser(denoise, sched, mask=mask, nmask=nmask,
                                 init_latent=init_latent,
                                 soft_inpainting=soft,
                                 return_uncond=(solver == "ddim_cfgpp"))
    from sdwebui_tpu.ops.attention import forced_impl as _forced_impl

    with _forced_impl(attn_impl or None):   # applied at trace time
        return sample(model_fn, x, sigmas, solver=solver, noise=noise,
                      extra=extra, mode="scan")


@functools.partial(
    jax.jit,
    static_argnames=("solver", "unet_cfg", "prediction_type", "extra_items",
                     "hn_meta", "n_steps", "control_cfgs"))
def _sample_one_step(unet_params, log_sigmas, x, solver_state, i, sigmas,
                     noise_i, sched: CondSchedule, mask, nmask, init_latent,
                     lms_coeffs, hypernet_tree,
                     solver: str, unet_cfg, prediction_type: str, extra_items,
                     hn_meta=None, n_steps: int = 1, control=None,
                     control_cfgs=()):
    """A chunk of `n_steps` solver steps with carried state (stepwise mode:
    live previews + interrupt between chunks). The start index `i` is traced
    so chunks of equal length share one compiled program; noise_i carries
    the chunk's noise (n_steps, per, B, ...)."""
    from sdwebui_tpu.sampling.solvers import SOLVERS
    from sdwebui_tpu.utils import devices as _dv

    extra = dict(extra_items)
    compute_dtype = jnp.dtype(extra.pop(
        "compute_dtype", jnp.dtype(_dv.get_policy().compute_dtype).name))
    attn_impl = extra.pop("attn_impl", "")
    quantize_t = bool(extra.pop("quantize_t", True))
    if lms_coeffs is not None:
        if solver == "restart":
            extra["restart_pairs"], extra["restart_noise_scale"] = lms_coeffs
        elif solver == "unipc":
            extra.update(lms_coeffs)
        else:
            extra["lms_coeffs"] = lms_coeffs

    def denoise(xb, sigma, ctx, y=None, c_concat=None, step=None):
        sigma = sigma.astype(jnp.float32)
        sig = sigma[:, None, None, None]
        if prediction_type == "flow":
            from sdwebui_tpu.models import mmdit as mmdit_model

            out = mmdit_model.apply(unet_params, unet_cfg,
                                    xb.astype(compute_dtype), sigma * 1000.0,
                                    ctx, y).astype(jnp.float32)
            return xb - out * sig
        if solver == "lcm":
            # LCM consistency-model wrapper (reference modules/
            # sd_samplers_lcm.py LCMCompVisDenoiser): sigma quantizes to the
            # 50-entry distillation subtable (t = 19, 39, …, 999) and the
            # raw eps prediction passes through the CM output transform in
            # the lcm-return branch below
            orig = 50
            skip = log_sigmas.shape[0] // orig
            sub = log_sigmas[skip - 1::skip]                       # (50,)
            j = jnp.argmin(jnp.abs(
                jnp.log(jnp.maximum(sigma, 1e-12))[:, None] - sub[None, :]),
                axis=-1)
            t = (j * skip + (skip - 1)).astype(jnp.float32)
        else:
            t = _sigma_to_t_traced(sigma, log_sigmas, quantize_t)
        c_in = (1.0 / jnp.sqrt(sigma ** 2 + 1.0))[:, None, None, None]
        x_in = (xb * c_in).astype(compute_dtype)
        ctrl = None
        if control:
            # cond rows come first in the CFG batch (B*K cond + B uncond);
            # mode-2 units apply only there
            n_cond = x_in.shape[0] - x_in.shape[0] // (
                sched.cond_bank.shape[0] + 1)
            ctrl = _apply_control(_control_for_step(control, step),
                                  control_cfgs, x_in, t, ctx, y,
                                  n_cond_rows=n_cond)
        if c_concat is not None:
            x_in = jnp.concatenate([x_in, c_concat.astype(x_in.dtype)], axis=-1)
        hypernet = (hypernet_tree, hn_meta) if hypernet_tree is not None else None
        out = unet_model.apply(unet_params, unet_cfg, x_in, t, ctx,
                               y=y, hypernet=hypernet,
                               control=ctrl).astype(jnp.float32)
        if prediction_type == "v":
            return xb / (sig ** 2 + 1.0) - out * sig / jnp.sqrt(sig ** 2 + 1.0)
        if solver == "lcm":
            # get_scaled_out (sd_samplers_lcm.py:52): boundary-condition
            # scalings with sigma_data=0.5 over scaled_timestep = t·10
            st = (t * 10.0)[:, None, None, None]
            c_skip = 0.25 / (st ** 2 + 0.25)
            c_out = st / jnp.sqrt(st ** 2 + 0.25)
            return c_out * (xb - out * sig) + c_skip * xb
        return xb - out * sig

    soft = extra.pop("soft_inpainting", None)
    model_fn = make_cfg_denoiser(denoise, sched, mask=mask, nmask=nmask,
                                 init_latent=init_latent, soft_inpainting=soft,
                                 return_uncond=(solver == "ddim_cfgpp"))
    spec = SOLVERS[solver]

    def body(carry, inp):
        xc, st = carry
        step_i, noise_step = inp
        xc, st = spec.step(model_fn, xc, step_i, sigmas, noise_step, st, extra)
        return (xc, st), None

    from sdwebui_tpu.ops.attention import forced_impl as _forced_impl

    with _forced_impl(attn_impl or None):   # applied at trace time
        (x, solver_state), _ = jax.lax.scan(
            body, (x, solver_state), (i + jnp.arange(n_steps), noise_i))
    return x, solver_state


@functools.partial(jax.jit, static_argnames=("vae_cfg",))
def _decode_fused(vae_params, vae_cfg, latents):
    img = vae_model.decode(vae_params, vae_cfg, latents.astype(jnp.float32))
    return jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("vae_cfg",))
def _decode_fused_u8(vae_params, vae_cfg, latents):
    """Decode straight to uint8 on device: the host fetch through the TPU
    tunnel is 4x smaller than f32 (measured ~0.2s/batch saved)."""
    img = vae_model.decode(vae_params, vae_cfg, latents.astype(jnp.float32))
    img = jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
    return (img * 255.0 + 0.5).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("vae_cfg",))
def _decode_fused_u8_bf16(vae_params, vae_cfg, latents):
    """bf16 decode (reference runs the VAE in fp16 by default on CUDA,
    modules/devices.py; GroupNorm stats stay fp32 inside ops/norms).
    Returns (u8, nan_flag) — the caller retries fp32 on NaN like the
    reference's no-half-vae fallback."""
    p16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), vae_params)
    img = vae_model.decode(p16, vae_cfg, latents.astype(jnp.bfloat16))
    bad = jnp.any(~jnp.isfinite(img.astype(jnp.float32)))
    img = jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
    return (img * 255.0 + 0.5).astype(jnp.uint8), bad


@functools.partial(jax.jit, static_argnames=("vae_cfg",))
def _encode_fused(vae_params, vae_cfg, images):
    x = images.astype(jnp.float32) * 2.0 - 1.0
    m = vae_model.encode_moments(vae_params, vae_cfg, x)
    return vae_model.encode_mode(m, vae_cfg)


def sample_latents(model: SDModel, sched: CondSchedule, x, sigmas, noise,
                   solver: str, extra: dict | None = None,
                   mask=None, nmask=None, init_latent=None, hypernet=None,
                   step_callback=None, control=None, control_cfgs=()):
    from sdwebui_tpu.utils.options import opts as _q_opts

    extra = dict(extra or {})
    # reference default: CONTINUOUS σ→t (CompVisDenoiser quantize =
    # opts.enable_quantization, off by default)
    extra.setdefault("quantize_t",
                     bool(_q_opts.get("enable_quantization", False)))
    # the dtype policy and forced attention impl are read inside the jitted
    # samplers at trace time; riding them in the static extra_items makes
    # them part of the jit cache key, so a runtime flip (precision option,
    # cross_attention_optimization) can never reuse a stale program
    from sdwebui_tpu.ops.attention import get_forced_impl
    from sdwebui_tpu.utils import devices as _dv_pol

    extra.setdefault("compute_dtype",
                     jnp.dtype(_dv_pol.get_policy().compute_dtype).name)
    extra.setdefault("attn_impl", get_forced_impl() or "")
    extra_items = tuple(sorted(extra.items()))
    lms_coeffs = None
    if solver == "lms":
        from sdwebui_tpu.sampling.solvers import lms_coefficients

        lms_coeffs = jnp.asarray(
            lms_coefficients(np.asarray(sigmas, np.float64)), jnp.float32)
    elif solver == "unipc":
        from sdwebui_tpu.sampling.solvers import unipc_coefficients
        from sdwebui_tpu.utils.options import opts as _uopts

        coeffs = unipc_coefficients(
            np.asarray(sigmas, np.float64),
            order=int(_uopts.get("uni_pc_order", 3)),
            variant=_uopts.get("uni_pc_variant", "bh1"),
            lower_order_final=bool(
                _uopts.get("uni_pc_lower_order_final", True)))
        lms_coeffs = {k: jnp.asarray(v) for k, v in coeffs.items()}
    elif solver == "restart":
        from sdwebui_tpu.sampling.solvers import build_restart_plan

        pairs, nscale = build_restart_plan(np.asarray(sigmas, np.float64))
        lms_coeffs = (jnp.asarray(pairs), jnp.asarray(nscale))
        # noise/steps follow the (longer) restart plan
        n = len(pairs)
        if noise.shape[0] != n:
            b = x.shape[0]
            reps = int(np.ceil(n / max(noise.shape[0], 1)))
            noise = jnp.tile(noise, (reps, 1, 1, 1, 1))[:n]
        sigmas = np.concatenate([pairs[:, 0], pairs[-1:, 1]])
    hn_tree, hn_meta = (hypernet if hypernet is not None else (None, None))

    # data-parallel batch: shard latents/noise over the mesh's `data` axis
    # (XLA partitions the whole fused program; conds/params ride replicated)
    from sdwebui_tpu.parallel.mesh import get_runtime

    rt = get_runtime()
    if rt.data_size > 1 and x.shape[0] % rt.data_size == 0:
        x = jax.device_put(x, rt.sharding("data"))
        noise = jax.device_put(noise, rt.sharding(None, None, "data"))
        if init_latent is not None:
            init_latent = jax.device_put(init_latent, rt.sharding("data"))

    from sdwebui_tpu.sampling.solvers import SOLVERS as _SOLVERS

    if step_callback is None or _SOLVERS[solver].custom_driver is not None:
        # custom whole-run drivers (DPM fast/adaptive) have no per-step
        # boundary to chunk on; they always run fused
        return _sample_fused(
            model.unet_params, jnp.asarray(model.disc.log_sigmas, jnp.float32),
            x, jnp.asarray(np.asarray(sigmas), jnp.float32), noise, sched,
            mask, nmask, init_latent, lms_coeffs, hn_tree,
            solver, model.unet_cfg, model.disc.prediction_type, extra_items,
            hn_meta=hn_meta, control=control, control_cfgs=control_cfgs)

    # chunked stepwise: scan `chunk` steps per dispatch with carried solver
    # state; previews/interrupt between chunks (tunnel dispatch costs ~10ms
    # per call — per-step loops would add ~45% to a 20-step SD1.5 run)
    from sdwebui_tpu.sampling.solvers import SOLVERS
    from sdwebui_tpu.utils.options import opts as _opts

    chunk = max(int(_opts.get("show_progress_every_n_steps", 10)), 1)
    spec = SOLVERS[solver]
    sig_j = jnp.asarray(np.asarray(sigmas), jnp.float32)
    log_sig = jnp.asarray(model.disc.log_sigmas, jnp.float32)
    state = spec.init_state(jnp.asarray(x, jnp.float32))
    n = sig_j.shape[0] - 1
    noise = jnp.asarray(noise)
    i = 0
    while i < n:
        k = min(chunk, n - i)
        x, state = _sample_one_step(
            model.unet_params, log_sig, x, state, jnp.asarray(i), sig_j,
            noise[i: i + k], sched, mask, nmask, init_latent, lms_coeffs,
            hn_tree, solver, model.unet_cfg, model.disc.prediction_type,
            extra_items, hn_meta=hn_meta, n_steps=k, control=control,
            control_cfgs=control_cfgs)
        i += k
        if step_callback(i - 1, n, x) is False:
            break
    return x


def _taesd_for(model: SDModel, which: str):
    """TAESD params when opts.sd_vae_{decode,encode}_method == 'TAESD' and
    weights exist under models/VAE-taesd (reference decode_first_stage /
    images_tensor_to_samples dispatch, modules/sd_samplers_common.py:75,92);
    None → full VAE."""
    from sdwebui_tpu.utils.options import opts as _opts

    opt = "sd_vae_decode_method" if which == "decoder" else "sd_vae_encode_method"
    if _opts.get(opt, "Full") != "TAESD":
        return None
    from sdwebui_tpu.models.vae_approx import get_taesd

    return get_taesd(model.kind, which)


def _fast_interrupt_method():
    """Non-None when an interrupted job should decode its finals with the
    live-preview approximator instead of the full VAE (reference
    opts.live_preview_fast_interrupt, modules/sd_samplers_common.py:41)."""
    from sdwebui_tpu.runtime.state import state
    from sdwebui_tpu.utils.options import opts as _opts

    if state.interrupted and _opts.get("live_preview_fast_interrupt", False):
        return _opts.get("show_progress_type", "Approx NN")
    return None


def decode_first_stage(model: SDModel, latents):
    fast = _fast_interrupt_method()
    if fast is not None and fast != "Full":
        from sdwebui_tpu.models.vae_approx import approx_decode

        return approx_decode(model.kind, fast, latents)
    taesd = _taesd_for(model, "decoder")
    if taesd is not None:
        from sdwebui_tpu.models.vae_approx import taesd_decode

        return taesd_decode(taesd, latents)
    return _decode_fused(model.vae_params, model.vae_cfg, latents)


def _spatial_decode_if_beneficial(model: SDModel, latents):
    """Context-parallel decode for big single images on a multi-device mesh
    (batch-axis sharding wins when the batch divides; see parallel/spatial)."""
    from sdwebui_tpu.parallel.mesh import get_runtime

    rt = get_runtime()
    if rt.data_size > 1 and latents.shape[0] % rt.data_size != 0 \
            and latents.shape[1] % rt.data_size == 0 \
            and latents.shape[1] >= 128:
        from sdwebui_tpu.parallel.spatial import decode_spatial

        img = decode_spatial(model.vae_params, model.vae_cfg,
                             latents.astype(jnp.float32), rt)
        return jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
    return None


@functools.partial(jax.jit)
def _taesd_decode_u8(params, latents):
    from sdwebui_tpu.models.vae_approx import taesd_decode

    return (taesd_decode(params, latents) * 255.0 + 0.5).astype(jnp.uint8)


def decode_first_stage_u8(model: SDModel, latents):
    from sdwebui_tpu.utils.options import opts as _opts

    fast = _fast_interrupt_method()
    if fast is not None and fast != "Full":
        from sdwebui_tpu.models.vae_approx import approx_decode

        rgb = approx_decode(model.kind, fast, latents)
        return (rgb * 255.0 + 0.5).astype(jnp.uint8)
    taesd = _taesd_for(model, "decoder")
    if taesd is not None:
        return _taesd_decode_u8(taesd, latents)
    spatial = _spatial_decode_if_beneficial(model, latents)
    if spatial is not None:
        return (spatial * 255.0 + 0.5).astype(jnp.uint8)
    if _opts.get("sdtpu_vae_bf16", True):
        u8, bad = _decode_fused_u8_bf16(model.vae_params, model.vae_cfg,
                                        latents)
        # reference opts.auto_vae_precision (shared_options "Automatically
        # revert VAE to 32-bit floats", modules/devices.py after_gc NaN
        # hook): on NaN output retry in fp32; disabled → keep the bf16 NaNs
        if not bool(bad) or not _opts.get("auto_vae_precision", True):
            return u8
    return _decode_fused_u8(model.vae_params, model.vae_cfg, latents)


def decode_fetch_pils(model: SDModel, latents):
    """Decode→uint8 and fetch to PIL, overlapping device compute with the
    tunnel transfer: every per-image decode program is enqueued up front
    (async dispatch), so the host's device_get + PIL conversion of image i
    runs while the device decodes image i+1.  Worth ~the smaller of
    (decode, fetch) per batch on the tunnel.  Single images, preview/TAESD
    decoders, and multi-device meshes keep the one-program batch decode."""
    import numpy as _np

    from sdwebui_tpu.parallel.mesh import get_runtime
    from sdwebui_tpu.utils import images as _images_util
    from sdwebui_tpu.utils.options import opts as _opts

    n = int(latents.shape[0])
    fast = _fast_interrupt_method()
    if (n <= 1 or (fast is not None and fast != "Full")
            or _taesd_for(model, "decoder") is not None
            or get_runtime().data_size > 1
            or not _opts.get("sdtpu_overlap_decode_fetch", True)):
        images = decode_first_stage_u8(model, latents)
        return _images_util.tensor_to_pil(_np.asarray(images))
    bf16 = _opts.get("sdtpu_vae_bf16", True)
    if bf16:
        parts = [_decode_fused_u8_bf16(model.vae_params, model.vae_cfg,
                                       latents[i:i + 1]) for i in range(n)]
    else:
        parts = [(_decode_fused_u8(model.vae_params, model.vae_cfg,
                                   latents[i:i + 1]), None)
                 for i in range(n)]
    pils = []
    for i, (u8, bad) in enumerate(parts):
        if bad is not None and bool(bad) \
                and _opts.get("auto_vae_precision", True):
            u8 = _decode_fused_u8(model.vae_params, model.vae_cfg,
                                  latents[i:i + 1])
        pils.extend(_images_util.tensor_to_pil(_np.asarray(u8)))
    return pils


def encode_first_stage(model: SDModel, images):
    taesd = _taesd_for(model, "encoder")
    if taesd is not None:
        from sdwebui_tpu.models.vae_approx import taesd_encode

        return taesd_encode(taesd, images)
    return _encode_fused(model.vae_params, model.vae_cfg, images)


# ==========================================================================
# hires fix (reference sample_hr_pass, modules/processing.py:1364)
# ==========================================================================

LATENT_UPSCALE_MODES = {
    "Latent": "bilinear",
    "Latent (antialiased)": "bilinear",
    "Latent (bicubic)": "bicubic",
    "Latent (bicubic antialiased)": "bicubic",
    "Latent (nearest)": "nearest",
    "Latent (nearest-exact)": "nearest",
}


def apply_old_hires_behavior(p: GenerationParams):
    """opts.use_old_hires_fix_width_height (reference processing.py:1214):
    the requested width/height become the hires TARGET and the first pass
    auto-computes a ~512² size (old_hires_fix_first_pass_dimensions)."""
    import math

    from sdwebui_tpu.utils.options import opts as _opts

    if not (p.enable_hr
            and _opts.get("use_old_hires_fix_width_height", False)):
        return
    p.hr_resize_x, p.hr_resize_y = p.width, p.height
    scale = math.sqrt(512 * 512 / (p.width * p.height))
    p.width = math.ceil(scale * p.width / 64) * 64
    p.height = math.ceil(scale * p.height / 64) * 64


def calculate_hr_target(p: GenerationParams):
    """(hr_width, hr_height) — reference calculate_target_resolution
    (modules/processing.py:1213)."""
    if p.hr_resize_x == 0 and p.hr_resize_y == 0:
        return int(p.width * p.hr_scale), int(p.height * p.hr_scale)
    if p.hr_resize_y == 0:
        return p.hr_resize_x, p.hr_resize_x * p.height // p.width
    if p.hr_resize_x == 0:
        return p.hr_resize_y * p.width // p.height, p.hr_resize_y
    return p.hr_resize_x, p.hr_resize_y


def _refiner_split_idx(model: SDModel, sigmas, switch_at: float,
                       max_steps: int) -> int:
    """Step index where the base→refiner handoff happens.  The reference
    decides per step in the NOISE domain (apply_refiner,
    sd_samplers_common.py:156-167: completed_ratio = (999 - timestep(σ))/
    1000, switch once it reaches switch_at); computed from the schedule's
    sigmas here because the run is scan-fused.
    opts.refiner_switch_by_sample_steps restores the old step-quantized
    behavior (reference sd_samplers_common.py:169)."""
    from sdwebui_tpu.utils.options import opts as _opts

    if _opts.get("refiner_switch_by_sample_steps", False):
        n = len(sigmas) - 1
        return min(max(int(n * switch_at), 1), max_steps - 1)
    log_s = np.log(np.maximum(np.asarray(sigmas[:-1]), 1e-12))
    tsteps = np.argmin(
        np.abs(log_s[:, None]
               - np.asarray(model.disc.log_sigmas)[None, :]), axis=1)
    ratios = (999.0 - tsteps) / 1000.0
    hit = np.nonzero(ratios >= switch_at)[0]
    s_idx = int(hit[0]) if hit.size else len(log_s) - 1
    return min(max(s_idx, 1), max_steps - 1)


def _hires_pass(model: SDModel, p: GenerationParams, latents, seeds, subseeds,
                upscale_image_fn=None, refiner_model: SDModel | None = None):
    """First-pass latents → hires latents (second sampling pass)."""
    from sdwebui_tpu.pipeline.img2img import setup_img2img_steps
    from sdwebui_tpu.rng import ImageRNG
    from sdwebui_tpu.sampling.sampler import prepare_noise
    from sdwebui_tpu.sampling.solvers import SOLVERS

    model = _apply_hypertile(model, kind="hr")
    hr_w, hr_h = calculate_hr_target(p)
    th, tw = hr_h // 8, hr_w // 8
    c = model.latent_channels
    b = latents.shape[0]

    denoising = p.denoising_strength if p.denoising_strength is not None else 0.7
    steps = p.hr_second_pass_steps or p.steps
    sampler = get_sampler(p.hr_sampler_name or p.sampler_name)
    scheduler = _resolve_scheduler(sampler, p.hr_scheduler or p.scheduler)
    spec = SOLVERS[sampler.solver]
    cfg = p.hr_cfg_scale or p.cfg_scale

    if p.hr_upscaler in LATENT_UPSCALE_MODES or not p.hr_upscaler:
        method = LATENT_UPSCALE_MODES.get(p.hr_upscaler, "bilinear")
        up = jax.image.resize(latents, (b, th, tw, c), method=method)
    else:
        # image-space upscale: decode → upscaler (registry; PIL fallback) → encode
        imgs = decode_first_stage(model, latents)
        pils = images_util.tensor_to_pil(np.asarray(imgs))
        if upscale_image_fn is None:
            from sdwebui_tpu.postprocessing.upscalers import upscale_by_name

            upscale_image_fn = lambda im: upscale_by_name(p.hr_upscaler, im, hr_w, hr_h)
        ups = [upscale_image_fn(im) for im in pils]
        arr = np.stack([images_util.pil_to_tensor(im.resize((hr_w, hr_h)))
                        for im in ups])
        up = encode_first_stage(model, jnp.asarray(arr))

    sched_steps, t_enc = setup_img2img_steps(steps, denoising)
    from sdwebui_tpu.sampling.registry import build_sigmas

    sigmas_full = build_sigmas(sampler, scheduler, sched_steps, model.disc,
                               extra_params_out=p.extra_generation_params,
                               is_sdxl=model.is_sdxl)
    sigma_sched = sigmas_full[sched_steps - t_enc - 1:]
    hr_extra = _solver_extra(p, sampler)
    if hr_extra.get("s_churn"):
        import dataclasses as _dc_spec

        spec = _dc_spec.replace(
            spec, noises_per_step=max(spec.noises_per_step, 1))

    # hires conds: schedule numbers continue past the first pass unless
    # opts.use_old_scheduling (reference setup_conds hires_steps arg);
    # opts.hires_fix_use_firstpass_conds keeps the first pass's SDXL size
    # vectors (reference processing.py:1526 calculate_hr_conds)
    from sdwebui_tpu.utils.options import opts as _hrc_opts

    if _hrc_opts.get("hires_fix_use_firstpass_conds", False):
        cond_w, cond_h = p.width, p.height
    else:
        cond_w, cond_h = hr_w, hr_h
    cond = _build_conds(model, p, p.steps, cfg_scale=cfg,
                        prompt=p.hr_prompt or p.prompt,
                        negative=p.hr_negative_prompt or p.negative_prompt,
                        width=cond_w, height=cond_h, hires_steps=t_enc + 1)

    rng = create_rng((c, th, tw), seeds, subseeds=subseeds,
                     subseed_strength=p.subseed_strength)
    noise0 = jnp.asarray(rng.first(), jnp.float32)
    if model.disc.prediction_type == "flow":
        s0 = float(sigma_sched[0])
        xi = s0 * noise0 + (1.0 - s0) * up
    else:
        xi = up + noise0 * float(sigma_sched[0])
    from sdwebui_tpu.utils.options import opts as _en_opts

    extra_noise = float(_en_opts.get("img2img_extra_noise", 0.0) or 0.0)
    if extra_noise > 0:
        # "Extra noise multiplier for img2img and hires fix" (reference
        # sd_samplers_kdiffusion.py:145-150, shared by the hires pass)
        p.extra_generation_params["Extra noise"] = extra_noise
        xi = xi + noise0 * extra_noise
    noise = prepare_noise(spec, len(sigma_sched) - 1, rng, (b, th, tw, c))
    control, control_cfgs = (), ()
    if p.controlnet_units:
        # hints re-prepared at the hires resolution (the extension re-resizes
        # control images for the second pass)
        from sdwebui_tpu.pipeline.control import prepare_controls

        control, control_cfgs = prepare_controls(
            p.controlnet_units, hr_w, hr_h, t_enc + 1, latent_channels=c)
    cond.skip_uncond = _skip_uncond_mask(sigma_sched, p)
    if refiner_model is not None and 0 < (p.refiner_switch_at or 0) < 1:
        # opts.hires_fix_refiner_pass gates this call from the orchestrator
        # ("second pass"/"both passes" — reference sd_samplers_common.py:183)
        s_idx = _refiner_split_idx(model, sigma_sched, p.refiner_switch_at,
                                   t_enc + 1)
        out = sample_latents(model, cond, xi, sigma_sched[: s_idx + 1],
                             noise[:s_idx], sampler.solver, hr_extra,
                             control=control, control_cfgs=control_cfgs)
        r_cond = _build_conds(refiner_model, p, t_enc + 1 - s_idx,
                              cfg_scale=cfg,
                              prompt=p.hr_prompt or p.prompt,
                              negative=p.hr_negative_prompt
                              or p.negative_prompt,
                              width=hr_w, height=hr_h)
        if cond.skip_uncond is not None:
            r_cond.skip_uncond = cond.skip_uncond[s_idx:]
        return sample_latents(refiner_model, r_cond, out,
                              sigma_sched[s_idx:], noise[s_idx:],
                              sampler.solver, hr_extra)
    return sample_latents(model, cond, xi, sigma_sched, noise,
                          sampler.solver, hr_extra,
                          control=control, control_cfgs=control_cfgs)


# ==========================================================================
# orchestration
# ==========================================================================

def _strip_prompt_comments(p: GenerationParams):
    """# comments in prompts (reference processing_scripts/comments.py,
    gated on enable_prompt_comments — default on)."""
    from sdwebui_tpu.text.prompt_parser import strip_comments
    from sdwebui_tpu.utils.options import opts as _opts

    if not _opts.get("enable_prompt_comments", True):
        return
    if "#" not in p.prompt and "#" not in p.negative_prompt:
        return
    p.prompt = strip_comments(p.prompt)
    p.negative_prompt = strip_comments(p.negative_prompt)
    p.all_prompts = [strip_comments(x) for x in p.all_prompts]
    p.all_negative_prompts = [strip_comments(x) for x in p.all_negative_prompts]


def _resolve_seeds(p: GenerationParams):
    if p.seed in (-1, None):
        p.seed = random.randrange(MAX_SEED)
    if p.subseed in (-1, None):
        p.subseed = random.randrange(MAX_SEED)
    n = p.batch_size * p.n_iter
    p.all_seeds = [int(p.seed) + (i if p.subseed_strength == 0 else 0) for i in range(n)]
    p.all_subseeds = [int(p.subseed) + i for i in range(n)]
    p.all_prompts = [p.prompt] * n
    p.all_negative_prompts = [p.negative_prompt] * n


def _reset_ti_usage(model: SDModel):
    """Per-job reset of the TI-usage log feeding the 'TI hashes' infotext
    field (reference model_hijack clears embedding usage per process)."""
    db = getattr(model.conditioner, "embedding_db", None)
    if db is not None:
        db.used_names = set()


def _console_log_prompt(kind: str, p: GenerationParams):
    """opts.enable_console_prompts (reference txt2img.py:62/img2img.py:202):
    print each job's prompt to stdout."""
    from sdwebui_tpu.utils.options import opts as _opts

    if _opts.get("enable_console_prompts", False):
        print(f"\n{kind}: {p.prompt}", flush=True)


def should_save_samples(p: GenerationParams, outdir) -> bool:
    """Reference modules/processing.py:513 save_samples(): samples_save
    option, per-request do_not_save_samples, and interrupted/skipped jobs
    only saved when opts.save_incomplete_images."""
    from sdwebui_tpu.runtime.state import state
    from sdwebui_tpu.utils.options import opts as _opts

    if not outdir or p.do_not_save_samples:
        return False
    if not _opts.get("samples_save", True):
        return False
    return bool(_opts.get("save_incomplete_images", False)) or \
        not (state.interrupted or state.skipped)


def save_extra_copies(pils: list, p: GenerationParams, model,
                      outdir: str | None, seeds, suffix: str, lo: int = 0):
    """Save \"-before-*\" / mask copies next to the main samples (reference
    modules/processing.py:1037-1090 save_intermediate / save_mask blocks)."""
    if not should_save_samples(p, outdir):
        return
    for i, img in enumerate(pils):
        images_util.save_image(
            img, outdir, seed=seeds[i] if i < len(seeds) else p.seed,
            prompt=p.all_prompts[lo + i] if lo + i < len(p.all_prompts)
            else p.prompt,
            info=create_infotext(p, model, lo + i), p=p, suffix=suffix)


def apply_grid_stage(all_images: list, infotexts: list, p: GenerationParams,
                     model) -> int:
    """Grid assembly + return/save stage at the end of process_images
    (reference modules/processing.py:1118-1130): build an n_iter×batch grid
    when opts.return_grid/grid_save ask for one, prepend it to the result
    images (return_grid), and save it to p.outpath_grids honoring
    grid_format / grid_extended_filename / grid_only_if_multiple.

    Mutates all_images/infotexts in place; returns index_of_first_image."""
    from sdwebui_tpu.utils.options import opts as _opts

    index_of_first_image = 0
    unwanted = len(all_images) < 2 and _opts.get("grid_only_if_multiple", True)
    return_grid = _opts.get("return_grid", True)
    grid_save = _opts.get("grid_save", True)
    if not ((return_grid or grid_save) and not p.do_not_save_grid
            and not unwanted):
        return index_of_first_image

    grid = images_util.image_grid(all_images, p.batch_size)
    text = infotexts[0] if infotexts else create_infotext(p, model, 0)
    if return_grid:
        infotexts.insert(0, text)
        all_images.insert(0, grid)
        index_of_first_image = 1
    if grid_save and p.outpath_grids:
        images_util.save_image(
            grid, p.outpath_grids, basename="grid",
            seed=p.all_seeds[0] if p.all_seeds else p.seed,
            prompt=p.all_prompts[0] if p.all_prompts else p.prompt,
            info=text, extension=_opts.get("grid_format", "png") or "png",
            short_filename=not _opts.get("grid_extended_filename", False),
            p=p, grid=True)
    return index_of_first_image


def _maybe_restore_faces(p: GenerationParams, pils: list) -> list:
    """reference process_images_inner face restoration stage
    (modules/processing.py:1043) — applied before color correction."""
    if not p.restore_faces:
        return pils
    from sdwebui_tpu.postprocessing import faces as faces_mod
    from sdwebui_tpu.utils.options import opts as _opts

    name = _opts.get("face_restoration_model", "CodeFormer")
    try:
        return [faces_mod.restore_faces(
            im, name, weight=float(_opts.get("code_former_weight", 0.5)))
            for im in pils]
    except FileNotFoundError as e:
        import logging

        logging.getLogger(__name__).warning("face restoration skipped: %s", e)
        return pils


def create_infotext(p: GenerationParams, model: SDModel, index: int = 0,
                    extra: dict | None = None) -> str:
    from sdwebui_tpu.utils.options import opts as _opts

    pairs = {
        "Steps": p.steps,
        "Sampler": p.sampler_name,
        "Schedule type": p.scheduler if p.scheduler != "Automatic" else None,
        "CFG scale": p.cfg_scale,
        "Seed": p.all_seeds[index] if p.all_seeds else p.seed,
        "Size": f"{p.width}x{p.height}",
        "Model hash": (model.sha256[:10] if model.sha256
                       and _opts.get("add_model_hash_to_info", True) else None),
        "Model": (model.title.split(" [")[0] if model.title
                  and _opts.get("add_model_name_to_info", True) else None),
        "Denoising strength": p.denoising_strength,
        "Init image hash": getattr(p, "init_img_hash", None),
        "Face restoration": (_opts.get("face_restoration_model", "CodeFormer")
                             if p.restore_faces else None),
        "Clip skip": p.clip_skip if p.clip_skip > 1 else None,
        "Version": (f"sdwebui-tpu-{__version__}"
                    if _opts.get("add_version_to_infotext", True) else None),
    }
    if p.subseed_strength > 0:
        pairs["Variation seed"] = p.all_subseeds[index] if p.all_subseeds else p.subseed
        pairs["Variation seed strength"] = p.subseed_strength
    # hires fix fields (reference processing.py:1224-1305 via
    # extra_generation_params)
    if p.enable_hr:
        if p.hr_resize_x or p.hr_resize_y:
            pairs["Hires resize"] = f"{p.hr_resize_x}x{p.hr_resize_y}"
        else:
            pairs["Hires upscale"] = p.hr_scale
        if p.hr_second_pass_steps:
            pairs["Hires steps"] = p.hr_second_pass_steps
        if p.hr_upscaler:
            pairs["Hires upscaler"] = p.hr_upscaler
        if p.hr_sampler_name:
            pairs["Hires sampler"] = p.hr_sampler_name
        if p.hr_cfg_scale and p.hr_cfg_scale != p.cfg_scale:
            pairs["Hires CFG Scale"] = p.hr_cfg_scale
        # recorded only when they differ from the main prompts (reference
        # modules/processing.py:1267-1276 get_hr_prompt)
        if p.hr_prompt and p.hr_prompt != p.prompt:
            pairs["Hires prompt"] = p.hr_prompt
        if p.hr_negative_prompt and p.hr_negative_prompt != p.negative_prompt:
            pairs["Hires negative prompt"] = p.hr_negative_prompt
    if p.refiner_checkpoint and 0 < (p.refiner_switch_at or 0) < 1:
        pairs["Refiner"] = p.refiner_checkpoint
        pairs["Refiner switch at"] = p.refiner_switch_at
    from sdwebui_tpu.loader import load as _load_mod

    if _load_mod.loaded_vae_file:
        import os as _os2

        if _opts.get("add_vae_hash_to_info", True):
            from sdwebui_tpu.loader.registry import file_sha256

            try:
                pairs["VAE hash"] = file_sha256(
                    _load_mod.loaded_vae_file, "cache.json")[:10]
            except OSError:
                pass
        if _opts.get("add_vae_name_to_info", True):
            pairs["VAE"] = _os2.path.splitext(
                _os2.path.basename(_load_mod.loaded_vae_file))[0]
    if p.eta:
        pairs["Eta"] = p.eta
    ensd = p.override_settings.get(
        "eta_noise_seed_delta", _opts.get("eta_noise_seed_delta", 0))
    if ensd:
        pairs["ENSD"] = ensd
    if p.tiling:
        pairs["Tiling"] = "True"
    tome = float(_opts.get("token_merging_ratio", 0.0) or 0.0)
    if tome > 0:
        pairs["Token merging ratio"] = tome
    emphasis = _opts.get("emphasis", "Original")
    if emphasis != "Original":
        pairs["Emphasis"] = emphasis
    if p.user and _opts.get("add_user_name_to_info", False):
        # reference processing.py create_infotext "User" field
        pairs["User"] = p.user
    if _opts.get("textual_inversion_add_hashes_to_infotext", True):
        # reference sd_hijack TI hash recording: name its used embeddings
        db = getattr(getattr(model, "conditioner", None), "embedding_db",
                     None)
        used = sorted(getattr(db, "used_names", []) or []) if db else []
        if used:
            pairs["TI hashes"] = ", ".join(
                f"{n}: {getattr(db.embeddings.get(n), 'shorthash', '') or 'unknown'}"
                for n in used)
    # script/extension-contributed pairs (reference p.extra_generation_params)
    pairs.update(p.extra_generation_params)
    pairs.update(extra or {})
    return infotext_util.build(
        p.all_prompts[index] if p.all_prompts else p.prompt,
        p.all_negative_prompts[index] if p.all_negative_prompts else p.negative_prompt,
        pairs)


#: opts.persistent_cond_cache (reference shared_options optimizations +
#: processing.get_conds_with_caching): re-encoding identical prompts across
#: jobs is skipped; bounded LRU, keyed on everything that shapes the banks
_COND_CACHE: dict = {}


def _build_conds(model: SDModel, p: GenerationParams, steps: int,
                 cfg_scale: float | None = None,
                 prompt: str | None = None, negative: str | None = None,
                 width: int | None = None, height: int | None = None,
                 adm_vector=None, hires_steps: int | None = None):
    import copy as _copy

    from sdwebui_tpu.utils.options import opts as _cc_opts

    cache_on = bool(_cc_opts.get("persistent_cond_cache", True)) \
        and adm_vector is None
    key = None
    if cache_on:
        key = (id(model), model.kind,
               id(getattr(model.conditioner, "embedding_db", None)),
               prompt if prompt is not None else p.prompt,
               negative if negative is not None else p.negative_prompt,
               steps, hires_steps,
               cfg_scale if cfg_scale is not None else p.cfg_scale,
               p.clip_skip, width or p.width, height or p.height,
               bool(_cc_opts.get("use_old_scheduling", False)),
               bool(_cc_opts.get("sdxl_clip_l_skip", False)),
               int(_cc_opts.get("sdxl_crop_top", 0)),
               int(_cc_opts.get("sdxl_crop_left", 0)),
               str(_cc_opts.get("emphasis", "Original")))
        hit = _COND_CACHE.get(key)
        if hit is not None:
            _COND_CACHE[key] = _COND_CACHE.pop(key)  # LRU touch
            # shallow copy: callers assign .skip_uncond per run
            return _copy.copy(hit)
    sched = _build_conds_uncached(model, p, steps, cfg_scale, prompt,
                                  negative, width, height, adm_vector,
                                  hires_steps)
    if key is not None:
        _COND_CACHE[key] = _copy.copy(sched)
        while len(_COND_CACHE) > 16:
            _COND_CACHE.pop(next(iter(_COND_CACHE)))
    return sched


def _build_conds_uncached(model: SDModel, p: GenerationParams, steps: int,
                          cfg_scale: float | None = None,
                          prompt: str | None = None,
                          negative: str | None = None,
                          width: int | None = None, height: int | None = None,
                          adm_vector=None, hires_steps: int | None = None):
    from sdwebui_tpu.utils.options import opts as _cs_opts

    if model.is_sdxl and not _cs_opts.get("sdxl_clip_l_skip", False):
        # reference default: SDXL's CLIP-L stays at the penultimate layer;
        # Clip skip applies to it only with opts.sdxl_clip_l_skip
        model.conditioner.clip_skip = 2
    else:
        model.conditioner.clip_skip = max(p.clip_skip,
                                          2 if model.kind != "sd1" else 1)
    if model.conditioner2 is not None:
        model.conditioner2.clip_skip = max(p.clip_skip, 2)
    encode_fn = lambda texts: model.encode_texts(texts)
    vector_maker = None
    if model.is_sdxl:
        from sdwebui_tpu.pipeline.sd_model import sdxl_vector_maker
        from sdwebui_tpu.utils.options import opts as _opts

        vector_maker = sdxl_vector_maker(
            model, width or p.width, height or p.height,
            crop=(int(_opts.get("sdxl_crop_top", 0)),
                  int(_opts.get("sdxl_crop_left", 0))),
            aesthetic_score=float(
                _opts.get("sdxl_refiner_high_aesthetic_score", 6.0)),
            negative_aesthetic_score=float(
                _opts.get("sdxl_refiner_low_aesthetic_score", 2.5)))
    elif model.is_sd3:
        vector_maker = lambda pooled, is_uncond: pooled.astype(jnp.float32)
    from sdwebui_tpu.utils.options import opts as _sched_opts

    sched = build_cond_schedule(
        encode_fn,
        prompt if prompt is not None else p.prompt,
        negative if negative is not None else p.negative_prompt,
        steps, cond_scale=cfg_scale if cfg_scale is not None else p.cfg_scale,
        vector_maker=vector_maker, hires_steps=hires_steps,
        use_old_scheduling=bool(_sched_opts.get("use_old_scheduling", False)))
    if adm_vector is not None:
        # unclip (crossattn-adm): one constant image-derived vector shared
        # by every schedule entry and both CFG branches (reference passes
        # the same c_adm for cond and uncond)
        v = jnp.asarray(adm_vector, jnp.float32)
        k, max_sched = sched.cond_bank.shape[:2]
        sched.vector_bank = jnp.broadcast_to(v, (k, max_sched) + v.shape)
        sched.vector_uncond_bank = jnp.broadcast_to(
            v, (sched.uncond_bank.shape[0],) + v.shape)
    return sched


def _apply_hypertile(model, kind: str = "txt2img"):
    """Options-driven attention speedups: hypertile (reference
    extensions-builtin/hypertile; latent tile = image tile/8) and token
    merging.  kind selects the ratio like the reference's
    get_token_merging_ratio: img2img and the hires pass fall back to the
    base ratio when their own option is 0."""
    import dataclasses as _dc

    from sdwebui_tpu.utils.options import opts as _opts

    cfg = model.unet_cfg
    if not hasattr(cfg, "tome_ratio"):
        return model   # MMDiT (SD3): no UNet-style attention tiling
    if _opts.get("hypertile_enable_unet", False):
        cfg = _dc.replace(cfg, hypertile_tile=max(
            int(_opts.get("hypertile_max_tile_unet", 256)) // 8, 16))
    base = float(_opts.get("token_merging_ratio", 0.0))
    if kind == "img2img":
        ratio = float(_opts.get("token_merging_ratio_img2img", 0.0)) or base
    elif kind == "hr":
        ratio = float(_opts.get("token_merging_ratio_hr", 0.0)) or base
    else:
        ratio = base
    if ratio > 0:
        cfg = _dc.replace(cfg, tome_ratio=ratio)
    elif cfg.tome_ratio:
        cfg = _dc.replace(cfg, tome_ratio=0.0)
    upcast = bool(_opts.get("upcast_attn", False))
    if cfg.upcast_attn != upcast:
        cfg = _dc.replace(cfg, upcast_attn=upcast)
    if cfg == model.unet_cfg:
        return model
    return _dc.replace(model, unet_cfg=cfg)


@functools.partial(
    jax.jit, static_argnames=("unet_cfg", "prediction_type"))
def _invert_noise_fused(unet_params, log_sigmas, init_latent, sigmas,
                        sched: CondSchedule, unet_cfg,
                        prediction_type: str):
    """Reverse-Euler noise reconstruction (reference
    scripts/img2imgalt.py find_noise_for_image): walk the schedule UPWARD
    using the denoised estimate at each target sigma; returns x at
    sigma_max, normalized to unit noise."""
    from sdwebui_tpu.utils import devices as _dv

    compute_dtype = _dv.get_policy().compute_dtype

    def denoise(xb, sigma, ctx, y=None, c_concat=None):
        sigma = sigma.astype(jnp.float32)
        sig = sigma[:, None, None, None]
        t = jnp.argmin(
            jnp.abs(jnp.log(jnp.maximum(sigma, 1e-12))[:, None]
                    - log_sigmas[None, :]), axis=-1).astype(jnp.float32)
        c_in = (1.0 / jnp.sqrt(sigma ** 2 + 1.0))[:, None, None, None]
        out = unet_model.apply(unet_params, unet_cfg,
                               (xb * c_in).astype(compute_dtype), t, ctx,
                               y=y).astype(jnp.float32)
        if prediction_type == "v":
            return xb / (sig ** 2 + 1.0) - out * sig / jnp.sqrt(sig ** 2 + 1.0)
        return xb - out * sig

    model_fn = make_cfg_denoiser(denoise, sched)

    def body(x, i):
        s_prev, s = sigmas[i - 1], sigmas[i]
        denoised = model_fn(x, jnp.maximum(s, 1e-5), i - 1)
        d = (x - denoised) / jnp.maximum(s, 1e-5)
        return x + d * (s - s_prev), None

    x, _ = jax.lax.scan(body, init_latent,
                        jnp.arange(1, sigmas.shape[0]))
    return x / jnp.std(x)    # reference: return x / x.std()


def invert_noise(model: SDModel, sched, init_latent, sigmas):
    """Host wrapper for the fused inversion scan."""
    return _invert_noise_fused(
        model.unet_params, jnp.asarray(model.disc.log_sigmas, jnp.float32),
        init_latent, jnp.asarray(np.asarray(sigmas), jnp.float32), sched,
        model.unet_cfg, model.disc.prediction_type)


_TIMESTEP_SOLVERS = ("ddim", "ddim_cfgpp", "plms", "unipc")
_CHURN_SOLVERS = ("euler", "heun", "dpm_2")


def _solver_extra(p: GenerationParams, sampler) -> dict:
    """Per-run solver knobs: eta (request > eta_ddim/eta_ancestral options >
    per-solver default), s_noise, and Karras churn for the samplers the
    reference forwards s_churn/s_tmin/s_tmax into
    (sd_samplers_kdiffusion.py extra_params)."""
    from sdwebui_tpu.utils.options import opts as _opts

    extra = dict(sampler.extra)
    if p.eta is not None and p.eta > 0:
        extra["eta"] = float(p.eta)
    elif sampler.solver in _TIMESTEP_SOLVERS:
        v = float(_opts.get("eta_ddim", 0.0) or 0.0)
        if v > 0:
            extra["eta"] = v
    else:
        v = float(_opts.get("eta_ancestral", 1.0))
        if v != 1.0:
            extra["eta"] = v
    if p.s_noise not in (None, 1.0):
        extra["s_noise"] = float(p.s_noise)
    if sampler.solver in _CHURN_SOLVERS:
        churn = float(p.s_churn or _opts.get("s_churn", 0.0) or 0.0)
        if churn > 0:
            extra["s_churn"] = churn
            extra["s_tmin"] = float(p.s_tmin or _opts.get("s_tmin", 0.0) or 0.0)
            extra["s_tmax"] = float(p.s_tmax or _opts.get("s_tmax", 0.0) or 0.0)
            p.extra_generation_params["Sigma churn"] = churn
    return extra


def _skip_uncond_mask(sigmas, p: GenerationParams):
    """Per-step uncond-skip plan: NGMS (skip the negative prompt on
    alternating steps once σ < s_min_uncond; every step with
    s_min_uncond_all) + skip_early_cond (ignore the negative prompt for the
    first fraction of steps) — reference
    sd_samplers_cfg_denoiser.py:219-229, precomputed host-side here because
    the CFG combine is scan-fused."""
    from sdwebui_tpu.utils.options import opts as _opts

    smu = float(p.s_min_uncond or _opts.get("s_min_uncond", 0.0) or 0.0)
    early = float(_opts.get("skip_early_cond", 0.0) or 0.0)
    if smu <= 0 and early <= 0:
        return None
    all_steps = bool(_opts.get("s_min_uncond_all", False))
    n = len(sigmas) - 1
    mask = np.zeros((n,), bool)
    for i in range(n):
        if early > 0 and i / n <= early:
            mask[i] = True
            p.extra_generation_params["Skip Early CFG"] = early
        elif smu > 0 and (i % 2 or all_steps) and float(sigmas[i]) < smu:
            mask[i] = True
            p.extra_generation_params["NGMS"] = smu
            if all_steps:
                p.extra_generation_params["NGMS all steps"] = "True"
    return jnp.asarray(mask) if mask.any() else None


def _apply_schedule_overrides(model: SDModel, p: GenerationParams) -> SDModel:
    """sd_noise_schedule='Zero Terminal SNR' + use_downcasted_alpha_bar
    rebuild the model's sigma table for this run (reference
    modules/sd_models.py apply_alpha_schedule_override)."""
    import dataclasses as _dc

    from sdwebui_tpu.sampling.discretization import (
        Discretization, rescale_zero_terminal_snr_abar)
    from sdwebui_tpu.utils.options import opts as _opts

    disc = model.disc
    if getattr(disc, "alphas_cumprod", None) is None:
        return model     # rectified flow (SD3): no ᾱ schedule
    abar = disc.alphas_cumprod
    changed = False
    if _opts.get("use_downcasted_alpha_bar", False):
        abar = abar.astype(np.float16).astype(np.float64)
        p.extra_generation_params["Downcast alphas_cumprod"] = "True"
        changed = True
    if _opts.get("sd_noise_schedule", "Default") == "Zero Terminal SNR":
        abar = rescale_zero_terminal_snr_abar(abar)
        p.extra_generation_params["Noise Schedule"] = "Zero Terminal SNR"
        changed = True
    if not changed:
        return model
    return _dc.replace(model, disc=Discretization(
        abar, prediction_type=disc.prediction_type, quantize=disc.quantize))


def _resolve_scheduler(sampler, requested: str):
    """Sampler-forced scheduler, with UniPC's skip-type option mapped onto
    the equivalent schedule (reference uni_pc skip_type: time_uniform =
    the DDIM uniform grid; logSNR = uniform in λ = −log σ, i.e. the
    exponential schedule; time_quadratic = √t-space spacing)."""
    from sdwebui_tpu.utils.options import opts as _opts

    scheduler = sampler.scheduler_override or requested
    if sampler.solver == "unipc":
        skip = _opts.get("uni_pc_skip_type", "time_uniform")
        scheduler = {"logSNR": "exponential",
                     "time_quadratic": "unipc_quadratic"}.get(skip, scheduler)
    return scheduler


def process_txt2img(model: SDModel, p: GenerationParams,
                    outdir: str | None = None,
                    callback: Callable | None = None,
                    refiner_model: SDModel | None = None,
                    step_callback: Callable | None = None) -> Processed:
    """txt2img with per-request override_settings applied + auto-restored
    (reference modules/processing.py:823-858)."""
    from sdwebui_tpu.pipeline import sd_unet as _sd_unet
    from sdwebui_tpu.utils.options import opts as _opts

    with _opts.override(p.override_settings):
        return _process_txt2img(_sd_unet.resolve(model), p, outdir=outdir,
                                callback=callback,
                                refiner_model=refiner_model,
                                step_callback=step_callback)


def _process_txt2img(model: SDModel, p: GenerationParams,
                     outdir: str | None = None,
                     callback: Callable | None = None,
                     refiner_model: SDModel | None = None,
                     step_callback: Callable | None = None) -> Processed:
    """txt2img batch loop (reference process_images_inner, trimmed to the
    first-slice feature set: batching, seeds/subseeds, prompt schedules,
    AND, all samplers/schedulers, infotext, saving)."""
    from sdwebui_tpu.scripts.framework import (
        PostprocessBatchListArgs, PostSampleArgs, get_runner)

    runner = get_runner()
    runner.setup_scripts(p)
    runner.before_process(p)
    _console_log_prompt("txt2img", p)
    _reset_ti_usage(model)
    apply_old_hires_behavior(p)
    _resolve_seeds(p)
    _strip_prompt_comments(p)
    # extra networks: strip <lora:...> tags, swap in merged param trees
    from sdwebui_tpu.networks import extra_networks

    clean_prompt, model, hypernet = extra_networks.activate(model, p.prompt)
    if p.hypernet_override is not None:
        hypernet = p.hypernet_override
    runner.after_extra_networks_activate(p)
    runner.process(p)
    if p.tiling:
        import dataclasses as _dc

        model = _dc.replace(
            model,
            unet_cfg=_dc.replace(model.unet_cfg, tiling=True),
            vae_cfg=_dc.replace(model.vae_cfg, tiling=True))
    model = _apply_hypertile(model)
    model = _apply_schedule_overrides(model, p)
    sampler = get_sampler(p.sampler_name)
    scheduler = _resolve_scheduler(sampler, p.scheduler)
    h, w = p.latent_size()
    c = model.latent_channels

    from sdwebui_tpu.sampling.registry import build_sigmas

    sigmas = build_sigmas(sampler, scheduler, p.steps, model.disc,
                          extra_params_out=p.extra_generation_params,
                          is_sdxl=model.is_sdxl)
    from sdwebui_tpu.sampling.solvers import SOLVERS

    spec = SOLVERS[sampler.solver]
    solver_extra = _solver_extra(p, sampler)
    if solver_extra.get("s_churn"):
        import dataclasses as _dc_spec

        spec = _dc_spec.replace(
            spec, noises_per_step=max(spec.noises_per_step, 1))

    control, control_cfgs = (), ()
    if p.controlnet_units:
        from sdwebui_tpu.pipeline.control import prepare_controls

        control, control_cfgs = prepare_controls(
            p.controlnet_units, p.width, p.height, p.steps,
            latent_channels=c)

    # fixed image conditioning for hybrid models in txt2img (reference
    # txt2img_image_conditioning, modules/processing.py:100-131)
    t2i_concat = None
    if model.unet_cfg.in_channels == 9:
        # inpaint model: everything masked — latent of a 0.5 gray image
        # under an all-ones mask channel
        gray = jnp.full((p.batch_size, p.height, p.width, 3), 0.5,
                        jnp.float32)
        masked = encode_first_stage(model, gray)
        t2i_concat = jnp.concatenate(
            [jnp.ones((p.batch_size, h, w, 1), jnp.float32), masked],
            axis=-1)
    elif model.is_depth and model.unet_cfg.in_channels == 5:
        # depth model without a source image: neutral mid-plane depth
        t2i_concat = jnp.zeros((p.batch_size, h, w, 1), jnp.float32)

    all_images = []
    infotexts = []
    for n in range(p.n_iter):
        if callback is not None and callback("batch", n, None) is False:
            break
        lo = n * p.batch_size
        seeds = p.all_seeds[lo: lo + p.batch_size]
        subseeds = p.all_subseeds[lo: lo + p.batch_size]
        runner.before_process_batch(p, batch_number=n, seeds=seeds)

        import os as _os

        global last_job_timer
        jt = last_job_timer = Timer()
        adm = None
        if model.is_unclip:     # txt2img: zero adm (processing.py:113)
            from sdwebui_tpu.pipeline.sd_model import unclip_adm
            adm = unclip_adm(model)
        sched = _build_conds(model, p, p.steps, prompt=clean_prompt,
                             adm_vector=adm)
        sched.skip_uncond = _skip_uncond_mask(sigmas, p)
        if t2i_concat is not None:
            sched.c_concat = t2i_concat
        jt.record("conds")
        runner.process_batch(p, batch_number=n, seeds=seeds)
        runner.process_before_every_sampling(p, batch_number=n)

        rng = create_rng((c, h, w), seeds, subseeds=subseeds,
                         subseed_strength=p.subseed_strength,
                         seed_resize_from_h=max(p.seed_resize_from_h, 0),
                         seed_resize_from_w=max(p.seed_resize_from_w, 0),
                         eta_noise_seed_delta=p.override_settings.get(
                             "eta_noise_seed_delta", 0))
        from sdwebui_tpu.utils.options import opts as _sgm_opts

        if _sgm_opts.get("sgm_noise_multiplier", False):
            # SGM/CosXL initial-noise convention: ·√(1+σ₀²) instead of ·σ₀
            # (reference sd_samplers_kdiffusion.py:234)
            p.extra_generation_params["SGM noise multiplier"] = "True"
            x_scale = float(np.sqrt(1.0 + float(sigmas[0]) ** 2))
        else:
            x_scale = float(sigmas[0])
        x = jnp.asarray(rng.first(), jnp.float32) * x_scale
        noise = prepare_noise(spec, len(sigmas) - 1, rng, (p.batch_size, h, w, c))
        jt.record("noise")

        from sdwebui_tpu.utils.options import opts as _rp_opts

        # opts.hires_fix_refiner_pass (reference sd_samplers_common.py:183):
        # with hires fix on, choose which pass(es) the refiner handles
        ref_pass = str(_rp_opts.get("hires_fix_refiner_pass", "second pass"))
        refine_first = refiner_model is not None and \
            (not p.enable_hr or ref_pass in ("first pass", "both passes"))
        if refine_first and 0 < p.refiner_switch_at < 1:
            # base → refiner handoff at the switch-point sigma (see
            # _refiner_split_idx; multistep history resets at the boundary,
            # matching a fresh sampler)
            s_idx = _refiner_split_idx(model, sigmas, p.refiner_switch_at,
                                       p.steps)
            latents = sample_latents(model, sched, x, sigmas[: s_idx + 1],
                                     noise[:s_idx], sampler.solver,
                                     solver_extra, hypernet=hypernet)
            r_sched = _build_conds(refiner_model, p, p.steps - s_idx)
            if sched.skip_uncond is not None:
                r_sched.skip_uncond = sched.skip_uncond[s_idx:]
            latents = sample_latents(refiner_model, r_sched, latents,
                                     sigmas[s_idx:], noise[s_idx:],
                                     sampler.solver, solver_extra)
        else:
            latents = sample_latents(model, sched, x, sigmas, noise,
                                     sampler.solver, solver_extra,
                                     hypernet=hypernet,
                                     step_callback=step_callback,
                                     control=control,
                                     control_cfgs=control_cfgs)
        jt.record("sample_dispatch")
        if p.enable_hr:
            runner.process_before_every_sampling(p, batch_number=n,
                                                 is_hr_pass=True)
            from sdwebui_tpu.utils.options import opts as _hr_opts

            if _hr_opts.get("save_images_before_highres_fix", False) \
                    and outdir and not p.do_not_save_samples:
                lowres = images_util.tensor_to_pil(
                    np.asarray(decode_first_stage(model, latents)))
                save_extra_copies(lowres, p, model, outdir, seeds,
                                  "-before-highres-fix", lo)
            hr_refiner = refiner_model if ref_pass in (
                "second pass", "both passes") else None
            latents = _hires_pass(model, p, latents, seeds, subseeds,
                                  refiner_model=hr_refiner)
        runner.post_sample(p, PostSampleArgs(latents))
        pils = decode_fetch_pils(model, latents)
        jt.record("decode_fetch_pil")
        runner.postprocess_batch(p, images=pils, batch_number=n)
        blist = PostprocessBatchListArgs(pils)
        runner.postprocess_batch_list(p, blist)
        pils = blist.images
        from sdwebui_tpu.utils.options import opts as _sv_opts

        if p.restore_faces and _sv_opts.get(
                "save_images_before_face_restoration", False):
            save_extra_copies(pils, p, model, outdir, seeds,
                              "-before-face-restoration", lo)
        pils = _maybe_restore_faces(p, pils)
        pils = [runner.postprocess_image(p, img) for img in pils]

        for i, img in enumerate(pils):
            info = create_infotext(p, model, lo + i)
            infotexts.append(info)
            if _sv_opts.get("samples_log_stdout", False):
                print(info, flush=True)   # reference shared_options system
            if should_save_samples(p, outdir):
                p.batch_index, p.iteration = i, n
                p.sd_model_name, p.sd_model_hash = model.title, model.sha256[:10]
                images_util.save_image(img, outdir, seed=seeds[i],
                                       prompt=p.all_prompts[lo + i], info=info,
                                       p=p)
        all_images.extend(pils)
        jt.record("postprocess_and_save")
        if _os.environ.get("SDTPU_STAGE_TIMING"):
            print("stage timing:", jt.summary(), flush=True)
        if callback is not None:
            callback("batch_done", n, pils)

    first_idx = apply_grid_stage(all_images, infotexts, p, model)
    res = Processed(
        images=all_images, params=p, seed=p.all_seeds[0] if p.all_seeds else p.seed,
        subseed=p.all_subseeds[0] if p.all_subseeds else p.subseed,
        infotexts=infotexts, all_seeds=p.all_seeds, all_subseeds=p.all_subseeds,
        all_prompts=p.all_prompts, width=p.width, height=p.height,
        index_of_first_image=first_idx,
        sd_model_name=(model.title or "").split(" [")[0],
        sd_model_hash=model.sha256[:10] if model.sha256 else "")
    runner.postprocess(p, res)
    return res

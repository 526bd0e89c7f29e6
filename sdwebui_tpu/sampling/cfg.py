"""Classifier-free-guidance denoiser — the per-step hot loop.

TPU redesign of the reference's `CFGDenoiser.forward`
(modules/sd_samplers_cfg_denoiser.py:156): prompt-edit schedules become
pre-gathered cond banks indexed per step (`reconstruct_cond_batch` → a
device gather), cond+uncond ride one batched UNet call, AND-composition
weights and skip-uncond (NGMS) are applied in the combine — all pure and
scan-safe.

Cond layout (per run, static shapes):
    cond_bank   (K, n_sched, S, D)  K composable prompts (AND), each with a
                                    prompt-edit schedule bank
    cond_idx    (K, n_steps)        which schedule entry each step uses
    cond_weights(K,)                AND weights (parsed from ``prompt :w``)
    uncond_bank (n_sched_u, S, D) + uncond_idx (n_steps,)
Batched images share conds (the reference's per-batch cond path); x is
(B,H,W,C) and the UNet call carries B*(K+1) items.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class CondSchedule:
    """Device-ready conditioning for one sampling run."""

    cond_bank: Any          # (K, n_sched, S, D)
    cond_idx: Any           # (K, n_steps) int32
    cond_weights: Any       # (K,) float32
    uncond_bank: Any        # (n_sched_u, S, D)
    uncond_idx: Any         # (n_steps,) int32
    cond_scale: float = 7.5
    # NGMS: per-step bool, True = uncond contribution skipped this step
    skip_uncond: Any = None          # (n_steps,) bool or None
    # SDXL vector conds (pooled text + size/crop embeds), scheduled like the
    # crossattn banks — per-entry pooled outputs differ across prompt edits
    vector_bank: Any = None          # (K, n_sched, D_adm)
    vector_uncond_bank: Any = None   # (n_sched_u, D_adm)
    # inpainting-model image conditioning, concatenated on channels
    c_concat: Any = None             # (B,H,W,Cc)
    # instruct-pix2pix 3-way CFG (reference combine_denoised_for_edit_model)
    image_cfg_scale: Any = None      # scalar or None

    def tree_flatten(self):
        # cond_scale is a traced child (users sweep CFG per request; it must
        # not bake into the compiled program)
        children = (self.cond_bank, self.cond_idx, self.cond_weights,
                    self.uncond_bank, self.uncond_idx, self.skip_uncond,
                    self.vector_bank, self.vector_uncond_bank, self.c_concat,
                    self.image_cfg_scale,
                    jnp.asarray(self.cond_scale, jnp.float32))
        return children, ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        (cb, ci, cw, ub, ui, su, vb, vub, cc, ics, scale) = children
        return cls(cond_bank=cb, cond_idx=ci, cond_weights=cw, uncond_bank=ub,
                   uncond_idx=ui, cond_scale=scale, skip_uncond=su,
                   vector_bank=vb, vector_uncond_bank=vub, c_concat=cc,
                   image_cfg_scale=ics)

    @staticmethod
    def simple(cond, uncond, cond_scale=7.5, n_steps=1, **kw):
        """Single prompt, no scheduling: cond/uncond (S, D) or (1, S, D)."""
        cond = jnp.asarray(cond)
        uncond = jnp.asarray(uncond)
        if cond.ndim == 2:
            cond = cond[None]
        if uncond.ndim == 2:
            uncond = uncond[None]
        return CondSchedule(
            cond_bank=cond[None],                      # (1,1,S,D)
            cond_idx=jnp.zeros((1, n_steps), jnp.int32),
            cond_weights=jnp.ones((1,), jnp.float32),
            uncond_bank=uncond,
            uncond_idx=jnp.zeros((n_steps,), jnp.int32),
            cond_scale=cond_scale, **kw)


jax.tree_util.register_pytree_node(
    CondSchedule, CondSchedule.tree_flatten, CondSchedule.tree_unflatten)


def soft_latent_blend(a, b, t, detail_preservation: float = 4.0):
    """Magnitude-corrected lerp (soft-inpainting latent_blend,
    extensions-builtin/soft-inpainting/scripts/soft_inpainting.py:50):
    directions lerp linearly; magnitudes lerp in a power-`detail` space,
    biasing toward the stronger of the two. Channel dim is last (NHWC)."""
    interp = (a * (1 - t) + b * t).astype(jnp.float32)
    cur_mag = jnp.linalg.norm(interp, axis=-1, keepdims=True) + 1e-5
    a_mag = jnp.linalg.norm(a.astype(jnp.float32), axis=-1,
                            keepdims=True) ** detail_preservation
    b_mag = jnp.linalg.norm(b.astype(jnp.float32), axis=-1,
                            keepdims=True) ** detail_preservation
    t1 = t[..., :1].astype(jnp.float32)
    desired = (a_mag * (1 - t1) + b_mag * t1) ** (1 / detail_preservation)
    return (interp * desired / cur_mag).astype(a.dtype)


def make_cfg_denoiser(denoise_fn: Callable, sched: CondSchedule,
                      mask=None, nmask=None, init_latent=None,
                      mask_before_denoising: bool = False,
                      soft_inpainting: tuple | None = None,
                      return_uncond: bool = False) -> Callable:
    """Build model(x, sigma, i) -> denoised for the solver loop.

    denoise_fn(x, sigma, context, y, c_concat) -> denoised, where x is
    (N,H,W,C) and sigma a scalar (the denoise scaling already applied inside
    — see pipeline.denoiser).  mask (keep-region weight) / nmask / init_latent
    implement the reference's latent mask blend: applied to the denoised
    output for k-diffusion samplers (sd_samplers_cfg_denoiser.py:68,292) or
    to the input for timestep samplers (mask_before_denoising=True,
    sd_samplers_timesteps.py:54).

    A denoise_fn that declares a 6th parameter additionally receives the
    step index (ControlNet guidance-range gating needs it).
    """
    import inspect

    k = sched.cond_bank.shape[0]
    try:
        pass_step = len(inspect.signature(denoise_fn).parameters) >= 6
    except (TypeError, ValueError):  # pragma: no cover
        pass_step = False

    if sched.image_cfg_scale is not None:
        return _make_edit_denoiser(denoise_fn, sched, mask, nmask, init_latent,
                                   mask_before_denoising)

    def model(x, sigma, i):
        if soft_inpainting is not None and nmask is not None:
            # σ-scheduled soft mask: t = nmask^(σ^power · scale), blended
            # with detail preservation BEFORE denoising (reference
            # soft_inpainting get_modified_nmask + latent_blend)
            power, scale, detail = soft_inpainting
            t = jnp.power(nmask, (sigma ** power) * scale)
            x = soft_latent_blend(init_latent, x, t, detail)
        elif mask is not None and mask_before_denoising:
            x = init_latent * mask + nmask * x
        b = x.shape[0]

        # gather this step's conds: (K, S, D) + (S, D)
        conds = jnp.take_along_axis(
            sched.cond_bank, sched.cond_idx[:, i][:, None, None, None], axis=1)[:, 0]
        uncond = sched.uncond_bank[sched.uncond_idx[i]]

        # context: K cond copies per image then uncond — (B*(K+1), S, D)
        ctx = jnp.concatenate([conds, uncond[None]], axis=0)       # (K+1,S,D)
        ctx = jnp.repeat(ctx, b, axis=0)                           # (B*(K+1),S,D)
        x_in = jnp.tile(x, (k + 1, 1, 1, 1))
        sigma_in = jnp.broadcast_to(sigma, (x_in.shape[0],))

        y = None
        if sched.vector_bank is not None:
            vec_conds = jnp.take_along_axis(
                sched.vector_bank, sched.cond_idx[:, i][:, None, None], axis=1)[:, 0]
            vec_uncond = sched.vector_uncond_bank[sched.uncond_idx[i]]
            y = jnp.concatenate([
                jnp.repeat(vec_conds, b, axis=0),
                jnp.tile(vec_uncond[None], (b, 1))], axis=0)

        c_concat = None
        if sched.c_concat is not None:
            c_concat = jnp.tile(sched.c_concat, (k + 1, 1, 1, 1))

        out = denoise_fn(x_in, sigma_in, ctx, y, c_concat, i) if pass_step \
            else denoise_fn(x_in, sigma_in, ctx, y, c_concat)
        out = out.reshape(k + 1, b, *out.shape[1:])
        out_conds, out_uncond = out[:k], out[k]

        # reference combine_denoised (sd_samplers_cfg_denoiser.py:74):
        # uncond + Σ_k w_k * scale * (cond_k - uncond).  CFG++ maps the
        # scale from [0, 12.5] to [0, 1] (reference ddim_cfgpp:56
        # cond_scale_miltiplier = 1/12.5)
        scale = sched.cond_scale * (1.0 / 12.5 if return_uncond else 1.0)
        w = sched.cond_weights.astype(out.dtype)[:, None, None, None, None]
        cfg = out_uncond + jnp.sum(
            w * (out_conds - out_uncond[None]), axis=0) * scale

        if sched.skip_uncond is not None:
            # NGMS semantics: the skipped-uncond step returns the weighted
            # cond mean (reference builds x_out without uncond and combines
            # against itself → guidance term vanishes)
            wsum = jnp.sum(sched.cond_weights)
            cond_mean = jnp.sum(w * out_conds, axis=0) / wsum.astype(out.dtype)
            cfg = jnp.where(sched.skip_uncond[i], cond_mean, cfg)

        if soft_inpainting is None and mask is not None \
                and not mask_before_denoising:
            cfg = cfg * nmask + init_latent * mask

        if return_uncond:
            # CFG++ solvers need the unconditional prediction for the noise
            # direction (reference ddim_cfgpp, sd_samplers_timesteps_impl)
            return jnp.stack([cfg, out_uncond], axis=0)
        return cfg

    return model


def _make_edit_denoiser(denoise_fn, sched: CondSchedule, mask, nmask,
                        init_latent, mask_before_denoising):
    """instruct-pix2pix 3-way CFG (reference
    combine_denoised_for_edit_model, sd_samplers_cfg_denoiser.py:84):

        rows = [text-cond + img, text-uncond + img, text-uncond + zero-img]
        out  = uncond + s_txt·(cond − img_cond) + s_img·(img_cond − uncond)
    AND composition is unsupported for edit models (reference assert)."""

    def model(x, sigma, i):
        if mask is not None and mask_before_denoising:
            x = init_latent * mask + nmask * x
        b = x.shape[0]
        cond = sched.cond_bank[0, sched.cond_idx[0, i]]
        uncond = sched.uncond_bank[sched.uncond_idx[i]]
        ctx = jnp.concatenate([
            jnp.repeat(cond[None], b, axis=0),
            jnp.repeat(uncond[None], b, axis=0),
            jnp.repeat(uncond[None], b, axis=0)], axis=0)
        x_in = jnp.tile(x, (3, 1, 1, 1))
        sigma_in = jnp.broadcast_to(sigma, (x_in.shape[0],))
        cc = sched.c_concat
        c_concat = jnp.concatenate([cc, cc, jnp.zeros_like(cc)], axis=0)
        out = denoise_fn(x_in, sigma_in, ctx, None, c_concat)
        out = out.reshape(3, b, *out.shape[1:])
        out_cond, out_img, out_uncond = out[0], out[1], out[2]
        cfg = out_uncond \
            + sched.cond_scale * (out_cond - out_img) \
            + sched.image_cfg_scale * (out_img - out_uncond)
        if mask is not None and not mask_before_denoising:
            cfg = cfg * nmask + init_latent * mask
        return cfg

    return model

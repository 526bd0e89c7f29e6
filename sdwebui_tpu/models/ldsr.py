"""LDSR — latent-diffusion 4x super-resolution (reference
extensions-builtin/LDSR: ldsr_model_arch.py + the in-repo ddpm_v1 fork).

Pipeline (reference ldsr_model_arch.get_cond/make_convolutional_sample):
pad the LR image to a multiple of 64 → z-space shape = LR pixels (the f=4
VQ latent of the 4x target) → DDIM (eta=1, 100 steps) over a 6-channel
UNet whose conditioning is the RAW LR image concatenated per step (identity
cond stage) → VQ-quantized decode to the 4x image → crop, then Lanczos to
the requested target scale.

Architecture from the checkpoint: the LDM no-context UNet (legacy
AttentionBlocks — models/unet.py dispatches on the `qkv` key) and an f=4
VQGAN (8192-entry codebook) whose encoder/decoder reuse models/vae.py.
Weights are user-supplied (zero-egress: the reference auto-downloads
last.ckpt; place it under models/LDSR/).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from sdwebui_tpu.models import unet as unet_model
from sdwebui_tpu.models import vae as vae_model
from sdwebui_tpu.models.configs import UNetConfig, VAEConfig


@dataclasses.dataclass(frozen=True)
class LDSRConfig:
    unet: UNetConfig = None
    vq: VAEConfig = None
    n_embed: int = 8192
    timesteps: int = 1000
    linear_start: float = 0.0015
    linear_end: float = 0.0155


# --------------------------------------------------------------------------
# VQ pieces (encoder/decoder ride on models/vae.py; VQ scale/shift are 1/0)
# --------------------------------------------------------------------------

def vq_encode(params, cfg: VAEConfig, x):
    """image [-1,1] → pre-quant h (reference VQModelInterface.encode)."""
    return vae_model.encode_moments(params, cfg, x)   # conv_out is z-wide


def vq_quantize(h, codebook):
    """nearest-codebook lookup (reference vqvae_quantize.VectorQuantizer2)."""
    b, hh, ww, c = h.shape
    flat = h.reshape(-1, c).astype(jnp.float32)
    cb = codebook.astype(jnp.float32)                  # (n_embed, c)
    d = (flat ** 2).sum(-1, keepdims=True) \
        - 2.0 * flat @ cb.T + (cb ** 2).sum(-1)[None]
    idx = jnp.argmin(d, axis=-1)
    return cb[idx].reshape(b, hh, ww, c).astype(h.dtype)


def vq_decode(params, cfg: VAEConfig, h, quantize: bool = True):
    if quantize:
        h = vq_quantize(h, params["quantize"]["embedding"]["weight"])
    return vae_model.decode(params, cfg, h)


# --------------------------------------------------------------------------
# DDIM in alpha space (the reference's DDIMSampler, eta=1)
# --------------------------------------------------------------------------

def make_alphas(cfg: LDSRConfig) -> np.ndarray:
    betas = np.linspace(cfg.linear_start ** 0.5, cfg.linear_end ** 0.5,
                        cfg.timesteps, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


@functools.partial(jax.jit, static_argnames=("ucfg", "steps", "eta",
                                              "eps_fn"))
def _ddim_sample(unet_params, ucfg, lr_cond, noise_seq, x_T,
                 alphas_cumprod, timesteps_seq, steps: int, eta: float,
                 eps_fn=None):
    """x_T → x_0 over the DDIM subsequence; UNet input = [x_t ⊕ LR].

    ldm DDIMSampler conventions (oracle-matched against the reference's own
    integer-timestep DDIM, tests/test_ldsr.py): the step BELOW the last
    subsequence timestep is t=0 — a_prev ends at alphas_cumprod[0], not 1.
    eps_fn(x_concat, t_batch) overrides the UNet for trajectory tests."""
    n_ts = timesteps_seq.shape[0]

    def step(x, inp):
        i, z_noise = inp
        t = timesteps_seq[i]
        t_prev = jnp.where(i + 1 < n_ts, timesteps_seq[jnp.minimum(
            i + 1, n_ts - 1)], 0)
        a_t = alphas_cumprod[t]
        a_prev = alphas_cumprod[t_prev]
        x_in = jnp.concatenate([x, lr_cond], axis=-1)
        tb = jnp.broadcast_to(t.astype(jnp.float32), (x.shape[0],))
        if eps_fn is None:
            eps = unet_model.apply(unet_params, ucfg,
                                   x_in.astype(jnp.bfloat16), tb,
                                   None).astype(jnp.float32)
        else:
            eps = eps_fn(x_in, tb)
        x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        sigma = eta * jnp.sqrt((1 - a_prev) / (1 - a_t)
                               * (1 - a_t / a_prev))
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma ** 2, 0.0)) * eps
        x = jnp.sqrt(a_prev) * x0 + dir_xt + sigma * z_noise
        return x, None

    x, _ = jax.lax.scan(step, x_T, (jnp.arange(steps), noise_seq))
    return x


# --------------------------------------------------------------------------
# loading
# --------------------------------------------------------------------------

def _convert_vq(sd: dict):
    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.utils.pytree import unflatten

    pre = "first_stage_model."
    flat = {}
    for k, v in sd.items():
        if not k.startswith(pre):
            continue
        kk = k[len(pre):]
        arr = np.asarray(v)
        if kk == "quantize.embedding.weight":
            flat[kk] = arr          # (n_embed, dim) stays
        else:
            flat[kk] = convert_leaf(kk, arr)
    tree = unflatten(flat)
    enc = tree["encoder"]
    ch = enc["conv_in"]["weight"].shape[-1]
    n_levels = len(enc["down"])
    ch_mult = tuple(
        enc["down"][str(i)]["block"]["0"]["conv1"]["weight"].shape[-1] // ch
        for i in range(n_levels))
    z = tree["quant_conv"]["weight"].shape[-1]
    cfg = VAEConfig(embed_dim=z, z_channels=z, ch=ch, ch_mult=ch_mult,
                    num_res_blocks=len(enc["down"]["0"]["block"]),
                    scale_factor=1.0, shift_factor=0.0)
    return tree, cfg


def load_ldsr(path: str):
    from sdwebui_tpu.loader.convert import cast_tree, convert_unet
    from sdwebui_tpu.loader.load import read_checkpoint
    from sdwebui_tpu.utils import devices

    sd = read_checkpoint(path)
    unet_tree, ucfg = convert_unet(sd)
    vq_tree, vcfg = _convert_vq(sd)
    policy = devices.get_policy()
    cfg = LDSRConfig(unet=ucfg, vq=vcfg,
                     n_embed=vq_tree["quantize"]["embedding"]["weight"].shape[0])
    return (jax.device_put(cast_tree(unet_tree, policy.param_dtype)),
            jax.device_put(cast_tree(vq_tree, jnp.float32)), cfg)


# --------------------------------------------------------------------------
# inference
# --------------------------------------------------------------------------

def super_resolution(unet_params, vq_params, cfg: LDSRConfig,
                     image: Image.Image, steps: int = 100,
                     target_scale: float = 4.0, eta: float = 1.0,
                     seed: int = 0) -> Image.Image:
    """Reference LDSR.super_resolution: pad to /64, 4x diffuse, downscale to
    the requested target (the model itself is always 4x)."""
    img = image.convert("RGB")
    w0, h0 = img.size
    pw, ph = (-w0) % 64, (-h0) % 64
    arr = np.asarray(img, np.float32) / 255.0
    if pw or ph:
        arr = np.pad(arr, ((0, ph), (0, pw), (0, 0)), "edge")
    lr = jnp.asarray(arr[None] * 2.0 - 1.0)              # (1,H,W,3) [-1,1]

    hh, ww = lr.shape[1], lr.shape[2]
    rng = np.random.default_rng(seed)
    x_T = jnp.asarray(rng.standard_normal((1, hh, ww, cfg.vq.embed_dim)),
                      jnp.float32)
    noise_seq = jnp.asarray(
        rng.standard_normal((steps, 1, hh, ww, cfg.vq.embed_dim)), jnp.float32)

    # DDIM subsequence (ldm make_ddim_timesteps uniform: the +1 "to get the
    # final alpha right", clipped like the reference's own timestep DDIM —
    # modules/sd_samplers_timesteps.py)
    c = cfg.timesteps // steps
    ts = np.clip(np.asarray(range(0, cfg.timesteps, c)) + 1, 0,
                 cfg.timesteps - 1)[::-1].copy()
    alphas = jnp.asarray(make_alphas(cfg), jnp.float32)

    z = _ddim_sample(unet_params, cfg.unet, lr, noise_seq, x_T, alphas,
                     jnp.asarray(ts, jnp.int32), steps, float(eta))
    out = vq_decode(vq_params, cfg.vq, z.astype(jnp.float32))
    out = np.asarray(jnp.clip(out / 2.0 + 0.5, 0.0, 1.0))[0]
    out = out[: h0 * 4, : w0 * 4]
    pil = Image.fromarray((out * 255 + 0.5).astype(np.uint8))
    if target_scale != 4.0:
        pil = pil.resize((round(w0 * target_scale), round(h0 * target_scale)),
                         Image.LANCZOS)
    return pil


def register_ldsr_dir(dirs=("models/LDSR",)):
    import os

    from sdwebui_tpu.postprocessing.upscalers import register_upscaler
    from sdwebui_tpu.utils.options import opts

    found = []
    for d in dirs:
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            if not fn.lower().endswith((".ckpt", ".safetensors", ".pt")):
                continue
            name = "LDSR" if fn.startswith(("model", "last")) else \
                f"LDSR ({os.path.splitext(fn)[0]})"
            path = os.path.join(d, fn)

            def make_fn(p=path):
                cache = {}

                def fn_(image, scale):
                    if "cfg" not in cache:
                        cache["unet"], cache["vq"], cache["cfg"] = load_ldsr(p)
                    return super_resolution(
                        cache["unet"], cache["vq"], cache["cfg"], image,
                        steps=int(opts.get("ldsr_steps", 100)),
                        target_scale=float(scale))

                return fn_

            register_upscaler(name, make_fn(), default_scale=4)
            found.append(name)
    return found

"""Fast latent→RGB approximations for live previews.

Three tiers (reference modules/sd_vae_approx.py, sd_vae_taesd.py):
  1. cheap linear coefficients (public constants from the HF forum post the
     reference cites) — instant, no weights needed
  2. VAEApprox — 8 small convs (weights optional, auto-skipped if absent)
  3. TAESD — tiny 4x-upsampling AE (arch implemented; weights load from
     models/VAE-taesd when present)
All NHWC, jit-compiled once per latent shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sdwebui_tpu.models.layers import conv2d, upsample_nearest_2x

# https://discuss.huggingface.co/t/decoding-latents-to-rgb-without-upscaling/23204/2
_CHEAP_SD = [[0.298, 0.207, 0.208], [0.187, 0.286, 0.173],
             [-0.158, 0.189, 0.264], [-0.184, -0.271, -0.473]]
_CHEAP_SDXL = [[0.3448, 0.4168, 0.4395], [-0.1953, -0.0290, 0.0250],
               [0.1074, 0.0886, -0.0163], [-0.3730, -0.2499, -0.2088]]
_CHEAP_SD3 = [
    [-0.0645, 0.0177, 0.1052], [0.0028, 0.0312, 0.0650],
    [0.1848, 0.0762, 0.0360], [0.0944, 0.0360, 0.0889],
    [0.0897, 0.0506, -0.0364], [-0.0020, 0.1203, 0.0284],
    [0.0855, 0.0118, 0.0283], [-0.0539, 0.0658, 0.1047],
    [-0.0057, 0.0116, 0.0700], [-0.0412, 0.0281, -0.0039],
    [0.1106, 0.1171, 0.1220], [-0.0248, 0.0682, -0.0481],
    [0.0815, 0.0846, 0.1207], [-0.0120, -0.0055, -0.0867],
    [-0.0749, -0.0634, -0.0456], [-0.1418, -0.1457, -0.1259],
]


@functools.partial(jax.jit, static_argnames=("kind",))
def cheap_approximation(latent, kind: str = "sd1"):
    """Sampler-space latent (B,h,w,C) → RGB (B,h,w,3) in [0,1].

    Like the reference (modules/sd_vae_approx.py:71 cheap_approximation),
    the coefficients apply to the latent exactly as it appears in the
    sampling loop — i.e. the scaled first-stage encoding; callers must NOT
    divide by the VAE scale factor first."""
    table = {"sd1": _CHEAP_SD, "sd2": _CHEAP_SD, "sdxl": _CHEAP_SDXL,
             "sd3": _CHEAP_SD3}.get(kind, _CHEAP_SD)
    coefs = jnp.asarray(table, jnp.float32)
    rgb = jnp.einsum("bhwl,lr->bhwr", latent.astype(jnp.float32), coefs)
    return jnp.clip(rgb / 2.0 + 0.5, 0.0, 1.0)


# --------------------------------------------------------------------------
# VAEApprox — tier-2 "Approx NN" preview net (reference
# modules/sd_vae_approx.py:10-31): nearest-2x upsample, 11-px zero pad,
# then 8 valid (unpadded) convs 4→8→16→32→64→32→16→8→3, each followed by
# leaky_relu(0.1).  Input is the sampler-space latent; output is sample
# space, mapped to [0,1] via x/2+0.5 like the reference's
# single_sample_to_image (modules/sd_samplers_common.py:66).
# --------------------------------------------------------------------------

@jax.jit
def vae_approx_decode(params, latent):
    x = upsample_nearest_2x(latent.astype(jnp.float32))
    x = jnp.pad(x, ((0, 0), (11, 11), (11, 11), (0, 0)))
    for i in range(1, 9):
        x = conv2d(params[f"conv{i}"], x, padding=0)
        x = jax.nn.leaky_relu(x, 0.1)
    return jnp.clip(x / 2.0 + 0.5, 0.0, 1.0)


def load_vae_approx(path: str):
    """Load model.pt / vaeapprox-sdxl.pt / vaeapprox-sd3.pt state dicts
    (keys conv1..conv8) into our NHWC tree."""
    if path.endswith(".safetensors"):
        from sdwebui_tpu.loader.safetensors_io import read_state_dict

        sd = read_state_dict(path)
    else:
        from sdwebui_tpu.loader.torch_ckpt import load_torch_checkpoint

        sd = load_torch_checkpoint(path)
    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.utils.pytree import unflatten

    return unflatten({k: convert_leaf(k, np.asarray(v)) for k, v in sd.items()})


# --------------------------------------------------------------------------
# TAESD (arch: github.com/madebyollin/taesd — decoder of conv blocks with
# residual clamp; reference modules/sd_vae_taesd.py:37-54)
# --------------------------------------------------------------------------

def _taesd_block(p, x):
    h = jax.nn.relu(conv2d(p["conv"]["0"], x))
    h = jax.nn.relu(conv2d(p["conv"]["2"], h))
    h = conv2d(p["conv"]["4"], h)
    skip = conv2d(p["skip"], x, padding=0) if "skip" in p else x
    return jax.nn.relu(h + skip)


@jax.jit
def taesd_decode(params, latent):
    """TAESD decoder: (B,h,w,4|16) sampler-space latent → (B,8h,8w,3) in
    [0,1] (TAESD consumes the scaled latent exactly as sampled, reference
    modules/sd_samplers_common.py:51).

    Param tree mirrors the sequential indices of the torch checkpoint
    (decoder.1 conv, 3 blocks + upsample per stage...)."""
    x = jnp.tanh(latent.astype(jnp.float32) / 3.0) * 3.0   # Clamp
    x = jax.nn.relu(conv2d(params["1"], x))
    # fixed TAESD topology: upsample precedes the parameter-less-gap convs
    # at sequential indices 7/12/17 (Clamp/ReLU/Upsample carry no params)
    for idx in sorted(int(k) for k in params.keys() if k != "1"):
        p = params[str(idx)]
        if "conv" in p:            # residual block
            x = _taesd_block(p, x)
        elif idx in (7, 12, 17):   # bias-less conv following an Upsample
            x = upsample_nearest_2x(x)
            x = conv2d(p, x)
        else:                      # final conv(64→3)
            x = conv2d(p, x)
    return jnp.clip(x, 0.0, 1.0)


@jax.jit
def taesd_encode(params, img):
    """TAESD encoder: (B,H,W,3) RGB in [0,1] → (B,H/8,W/8,4|16)
    sampler-space latent (reference modules/sd_vae_taesd.py:47 encoder;
    consumed by images_tensor_to_samples when opts.sd_vae_encode_method is
    'TAESD', modules/sd_samplers_common.py:92)."""
    x = img.astype(jnp.float32)
    for idx in sorted(int(k) for k in params.keys()):
        p = params[str(idx)]
        if "conv" in p:            # residual block
            x = _taesd_block(p, x)
        elif idx in (2, 6, 10):    # bias-less stride-2 downsample convs
            x = conv2d(p, x, stride=2)
        else:                      # first conv(3→64) / final conv(64→C)
            x = conv2d(p, x)
    return x


def load_taesd(path: str):
    """Load a TAESD decoder/encoder .safetensors / .pth into our tree.
    Published checkpoints key by bare sequential index ('1.weight'); some
    re-exports prefix 'decoder.'/'encoder.' — both accepted."""
    if path.endswith(".safetensors"):
        from sdwebui_tpu.loader.safetensors_io import read_state_dict

        sd = read_state_dict(path)
    else:
        from sdwebui_tpu.loader.torch_ckpt import load_torch_checkpoint

        sd = load_torch_checkpoint(path)
    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.utils.pytree import unflatten

    flat = {}
    for k, v in sd.items():
        k = k.replace("decoder.", "").replace("encoder.", "")
        flat[k] = convert_leaf(k, np.asarray(v))
    return unflatten(flat)


load_taesd_decoder = load_taesd


_TAESD_CACHE: dict = {}


def get_taesd(kind: str, which: str = "decoder", root: str = "models"):
    """Discover + cache per-kind TAESD weights under models/VAE-taesd
    (reference modules/sd_vae_taesd.py decoder_model/encoder_model paths).
    Returns None when absent."""
    key = (kind, which, root)
    if key in _TAESD_CACHE:
        return _TAESD_CACHE[key]
    stem = {"sdxl": "taesdxl", "sd3": "taesd3"}.get(kind, "taesd")
    params = None
    import os

    for ext in (".safetensors", ".pth"):
        path = os.path.join(root, "VAE-taesd", f"{stem}_{which}{ext}")
        if os.path.exists(path):
            try:
                params = load_taesd(path)
                break
            except Exception:
                pass
    _TAESD_CACHE[key] = params
    return params


_APPROX_CACHE: dict = {}


def get_vae_approx(kind: str, root: str = "models"):
    """Discover + cache per-kind VAEApprox weights under models/VAE-approx
    (reference modules/sd_vae_approx.py model() paths). None when absent."""
    key = (kind, root)
    if key in _APPROX_CACHE:
        return _APPROX_CACHE[key]
    name = {"sdxl": "vaeapprox-sdxl.pt", "sd3": "vaeapprox-sd3.pt"}.get(
        kind, "model.pt")
    params = None
    import os

    path = os.path.join(root, "VAE-approx", name)
    if os.path.exists(path):
        try:
            params = load_vae_approx(path)
        except Exception:
            pass
    _APPROX_CACHE[key] = params
    return params


def approx_decode(kind: str, method: str, latent):
    """Latent → RGB [0,1] by preview method name, degrading to the cheap
    matrix when the chosen net's weights are absent (reference
    samples_to_images_tensor mode table, modules/sd_samplers_common.py:34)."""
    if method == "TAESD":
        params = get_taesd(kind, "decoder")
        if params is not None:
            return taesd_decode(params, latent)
    elif method == "Approx NN":
        params = get_vae_approx(kind)
        if params is not None:
            return vae_approx_decode(params, latent)
    return cheap_approximation(latent, kind)


class LivePreviewer:
    """Chooses the best available preview decoder (reference
    sd_samplers_common.samples_to_images_tensor approximation modes).
    All tiers take the sampler-space latent directly, like the reference."""

    def __init__(self, model_kind: str, taesd_params=None, approx_params=None):
        self.kind = model_kind
        self.taesd_params = taesd_params
        self.approx_params = approx_params

    def decode(self, latent):
        if self.taesd_params is not None:
            return taesd_decode(self.taesd_params, latent)
        if self.approx_params is not None:
            return vae_approx_decode(self.approx_params, latent)
        return cheap_approximation(latent, self.kind)

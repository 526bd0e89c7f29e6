"""GFPGAN v1 "clean" face restorer (JAX/NHWC, functional).

The reference loads GFPGANv1.3/1.4 through spandrel and runs it on CUDA
(modules/gfpgan_model.py:69); the architecture is GFPGANv1Clean — a U-Net
degradation-removal encoder producing (a) a latent style code and (b) per
-resolution SFT conditions, feeding a StyleGAN2 "clean" generator (bilinear
resampling, no custom CUDA ops — which is exactly what makes it map cleanly
onto XLA).  Param tree mirrors the official checkpoint's `params_ema` keys:

    conv_body_first                  1x1 conv, 3 → C(512)
    conv_body_down.{i}               ResBlock (conv1 3x3, conv2 3x3, skip 1x1)
    final_conv                       3x3 at 4x4
    conv_body_up.{i}                 ResUpBlock
    condition_scale.{i}.{0,2} / condition_shift.{i}.{0,2}
    toRGB.{i}                        per-level RGB heads (training aux)
    final_linear                     C·4·4 → n_latent·512 (different_w)
    stylegan_decoder.constant_input.weight
    stylegan_decoder.style_conv1 / style_convs.{i} (modulated_conv.{weight,
        modulation.*}, weight (noise strength), bias)
    stylegan_decoder.to_rgb1 / to_rgbs.{i}
    stylegan_decoder.noises.noise{i}

Modulated convs become per-sample grouped convs (feature_group_count=B) —
one big MXU-friendly conv per layer instead of a python loop over the batch.
Noise injection uses the checkpoint's registered buffers (the reference's
randomize_noise path is sampling-time cosmetics; deterministic here).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class GFPGANConfig:
    out_size: int = 512
    num_style_feat: int = 512
    channel_multiplier: int = 2
    narrow: float = 1.0
    sft_half: bool = True
    different_w: bool = True

    @property
    def log_size(self) -> int:
        return int(math.log2(self.out_size))

    @property
    def num_latent(self) -> int:
        return self.log_size * 2 - 2

    def channels(self, unet: bool = False) -> dict:
        base = {4: 512, 8: 512, 16: 512, 32: 512,
                64: 256 * self.channel_multiplier,
                128: 128 * self.channel_multiplier,
                256: 64 * self.channel_multiplier,
                512: 32 * self.channel_multiplier,
                1024: 16 * self.channel_multiplier}
        mult = self.narrow * (0.5 if unet else 1.0)
        return {k: int(v * mult) for k, v in base.items()}


def _lrelu(x, slope=0.2):
    return jnp.where(x >= 0, x, x * slope)


def _conv(p, x, stride=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def _interp2x(x, up=True):
    b, h, w, c = x.shape
    size = (h * 2, w * 2) if up else (h // 2, w // 2)
    # torch F.interpolate(bilinear, align_corners=False) == jax linear resize
    # with antialias OFF (torch does not low-pass on downscale)
    return jax.image.resize(x, (b, *size, c), method="linear", antialias=False)


def _resblock_down(p, x):
    """basicsr gfpgan ResBlock: lrelu convs, 0.5x bilinear, 1x1 skip, /sqrt2."""
    out = _lrelu(_conv(p["conv1"], x))
    out = _interp2x(out, up=False)
    out = _lrelu(_conv(p["conv2"], out))
    skip = _conv(p["skip"], _interp2x(x, up=False))
    return (out + skip) / math.sqrt(2)


def _resupblock(p, x):
    out = _lrelu(_conv(p["conv1"], x))
    out = _lrelu(_conv(p["conv2"], _interp2x(out, up=True)))
    skip = _conv(p["skip"], _interp2x(x, up=True))
    return (out + skip) / math.sqrt(2)


def _modulated_conv(p, x, style, demodulate=True, sample_mode=None,
                    eps=1e-8):
    """StyleGAN2-clean ModulatedConv2d.

    p["weight"]: stored in torch layout (1, Cout, Cin, k, k) — kept verbatim
    (convert.py's 4D transpose does not apply to 5D leaves).
    style: (B, num_style_feat) → modulation linear → (B, Cin).
    Per-sample kernels run as ONE grouped conv: x (1,H,W,B·Cin),
    kernels (k,k,Cin,B·Cout), feature_group_count=B.
    """
    w = p["weight"].astype(jnp.float32)[0]          # (Cout, Cin, k, k)
    cout, cin, k, _ = w.shape
    b = x.shape[0]
    style = (style.astype(jnp.float32) @ p["modulation"]["weight"].astype(jnp.float32)
             + p["modulation"]["bias"].astype(jnp.float32))    # (B, Cin)
    scale = 1.0 / math.sqrt(cin * k * k)
    wk = scale * w[None] * style[:, None, :, None, None]       # (B,Cout,Cin,k,k)
    if demodulate:
        demod = jax.lax.rsqrt(jnp.sum(wk * wk, axis=(2, 3, 4)) + eps)
        wk = wk * demod[:, :, None, None, None]
    if sample_mode == "upsample":
        x = _interp2x(x, up=True)
    elif sample_mode == "downsample":
        x = _interp2x(x, up=False)
    h, wdt = x.shape[1], x.shape[2]
    xg = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h, wdt, b * cin)
    # (B,Cout,Cin,k,k) → (k,k,Cin,B·Cout)
    kern = jnp.transpose(wk, (3, 4, 2, 0, 1)).reshape(k, k, cin, b * cout)
    out = jax.lax.conv_general_dilated(
        xg.astype(x.dtype), kern.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b)
    out = out.reshape(out.shape[1], out.shape[2], b, cout)
    return jnp.transpose(out, (2, 0, 1, 3))


def _style_conv(p, x, style, noise=None, sample_mode=None):
    out = _modulated_conv(p["modulated_conv"], x, style,
                          sample_mode=sample_mode) * (2 ** 0.5)
    if noise is not None:
        out = out + p["weight"].astype(out.dtype) * noise
    out = out + p["bias"].astype(out.dtype).reshape(1, 1, 1, -1)
    return _lrelu(out, 0.2)


def _to_rgb(p, x, style, skip=None):
    out = _modulated_conv(p["modulated_conv"], x, style, demodulate=False)
    out = out + p["bias"].astype(out.dtype).reshape(1, 1, 1, -1)
    if skip is not None:
        out = out + _interp2x(skip, up=True)
    return out


def decoder_apply(p, cfg: GFPGANConfig, latent, conditions):
    """StyleGAN2GeneratorCSFT: latent (B, num_latent, style_feat) +
    interleaved [scale, shift] conditions per upsample level → (B,S,S,3)."""
    b = latent.shape[0]
    const = p["constant_input"]["weight"].astype(jnp.float32)  # (1,C,4,4)
    out = jnp.broadcast_to(jnp.transpose(const, (0, 2, 3, 1)),
                           (b, 4, 4, const.shape[1]))
    noises = p.get("noises", {})

    def noise_for(i):
        n = noises.get(f"noise{i}")
        if n is None:
            return None
        return jnp.transpose(n.astype(jnp.float32), (0, 2, 3, 1))

    out = _style_conv(p["style_conv1"], out, latent[:, 0], noise=noise_for(0))
    skip = _to_rgb(p["to_rgb1"], out, latent[:, 1])

    n_conds = len(conditions)
    i = 1
    for li in range(0, cfg.num_latent - 2, 2):
        c1 = p["style_convs"][str(li)]
        c2 = p["style_convs"][str(li + 1)]
        out = _style_conv(c1, out, latent[:, i],
                          noise=noise_for(li + 1), sample_mode="upsample")
        # CSFT: spatial feature transform after the upsampling conv
        if i < n_conds:
            sc, sh = conditions[i - 1], conditions[i]
            if cfg.sft_half:
                half = out.shape[-1] // 2
                same, sft = out[..., :half], out[..., half:]
                sft = sft * sc.astype(out.dtype) + sh.astype(out.dtype)
                out = jnp.concatenate([same, sft], axis=-1)
            else:
                out = out * sc.astype(out.dtype) + sh.astype(out.dtype)
        out = _style_conv(c2, out, latent[:, i + 1],
                          noise=noise_for(li + 2))
        skip = _to_rgb(p["to_rgbs"][str(li // 2)], out, latent[:, i + 2], skip)
        i += 2
    return skip


def apply(params, cfg: GFPGANConfig, x, weight: float = 0.5):
    """x: (B, out_size, out_size, 3) in [-1, 1] → restored (B,S,S,3) [-1,1].

    `weight` mirrors the GFPGANer fidelity knob (unused by the clean arch's
    forward — kept for API parity)."""
    del weight
    log_size = cfg.log_size

    feat = _lrelu(_conv(params["conv_body_first"], x))
    skips = []
    for i in range(log_size - 2):
        feat = _resblock_down(params["conv_body_down"][str(i)], feat)
        skips.insert(0, feat)
    feat = _lrelu(_conv(params["final_conv"], feat))

    b = feat.shape[0]
    flat = jnp.transpose(feat, (0, 3, 1, 2)).reshape(b, -1)   # torch view order
    w_lin = params["final_linear"]["weight"].astype(jnp.float32)
    style = flat.astype(jnp.float32) @ w_lin \
        + params["final_linear"]["bias"].astype(jnp.float32)
    if cfg.different_w:
        latent = style.reshape(b, cfg.num_latent, cfg.num_style_feat)
    else:
        latent = jnp.repeat(style[:, None], cfg.num_latent, axis=1)

    conditions = []
    for i in range(log_size - 2):
        feat = feat + skips[i]
        feat = _resupblock(params["conv_body_up"][str(i)], feat)
        sc = params["condition_scale"][str(i)]
        scale = _conv(sc["2"], _lrelu(_conv(sc["0"], feat)))
        sh = params["condition_shift"][str(i)]
        shift = _conv(sh["2"], _lrelu(_conv(sh["0"], feat)))
        conditions += [scale, shift]

    return decoder_apply(params["stylegan_decoder"], cfg, latent, conditions)


# --------------------------------------------------------------------------
# loading / init
# --------------------------------------------------------------------------

def convert_gfpgan(sd: dict):
    """state dict (`params_ema` already unwrapped or prefixed) → tree, cfg.

    5D modulated-conv weights stay in torch layout; plain convs → HWIO."""
    from sdwebui_tpu.utils.pytree import unflatten

    if any(k.startswith("params_ema.") for k in sd):
        sd = {k[len("params_ema."):]: v for k, v in sd.items()
              if k.startswith("params_ema.")}
    flat = {}
    for k, v in sd.items():
        if ".style_mlp." in k:
            continue    # unused at inference (input_is_latent=True)
        arr = np.ascontiguousarray(v)
        if k.endswith(".weight") and arr.ndim == 4 \
                and "modulated_conv" not in k and "constant_input" not in k:
            arr = np.ascontiguousarray(np.transpose(arr, (2, 3, 1, 0)))
        elif k.endswith("final_linear.weight"):
            arr = np.ascontiguousarray(arr.T)
        elif k.endswith("modulation.weight"):
            arr = np.ascontiguousarray(arr.T)
        flat[k] = arr
    tree = unflatten(flat)
    n_up = len(tree["conv_body_up"])
    out_size = 4 * (2 ** n_up)
    # channel multiplier from the 512-res unet channel: C = 32·cm·narrow·0.5
    first_ch = tree["conv_body_first"]["weight"].shape[-1]
    cm = 2 if first_ch >= 32 else 1
    style_feat = tree["stylegan_decoder"]["style_conv1"]["modulated_conv"][
        "modulation"]["weight"].shape[0]
    cfg = GFPGANConfig(out_size=out_size, num_style_feat=style_feat,
                       channel_multiplier=cm)
    return tree, cfg


def init_params(cfg: GFPGANConfig, seed: int = 0):
    """Random params with the exact checkpoint tree (tests / twins)."""
    rng = np.random.RandomState(seed)
    f32 = np.float32

    def conv(cin, cout, k):
        return {"weight": rng.randn(k, k, cin, cout).astype(f32) * 0.1,
                "bias": np.zeros(cout, f32)}

    def mconv(cin, cout, k, style):
        return {"weight": (rng.randn(1, cout, cin, k, k) * 0.5).astype(f32),
                "modulation": {"weight": rng.randn(style, cin).astype(f32) * 0.1,
                               "bias": np.ones(cin, f32)}}

    def style_conv(cin, cout, style):
        return {"modulated_conv": mconv(cin, cout, 3, style),
                "weight": np.zeros((), f32),          # noise strength
                "bias": np.zeros(cout, f32)}

    def to_rgb(cin, style):
        return {"modulated_conv": mconv(cin, 3, 1, style),
                "bias": np.zeros(3, f32)}

    uch = cfg.channels(unet=True)
    gch = cfg.channels(unet=False)
    log_size = cfg.log_size
    p = {"conv_body_first": conv(3, uch[cfg.out_size], 1)}
    cin = uch[cfg.out_size]
    down = {}
    for i, res in enumerate(range(log_size, 2, -1)):
        cout = uch[2 ** (res - 1)]
        down[str(i)] = {"conv1": conv(cin, cin, 3), "conv2": conv(cin, cout, 3),
                        "skip": {"weight": conv(cin, cout, 1)["weight"]}}
        cin = cout
    p["conv_body_down"] = down
    p["final_conv"] = conv(cin, uch[4], 3)

    n_lat = cfg.num_latent if cfg.different_w else 1
    p["final_linear"] = {
        "weight": (rng.randn(uch[4] * 16, n_lat * cfg.num_style_feat) * 0.02).astype(f32),
        "bias": np.zeros(n_lat * cfg.num_style_feat, f32)}

    up, cond_s, cond_h, torgb = {}, {}, {}, {}
    cin = uch[4]
    for i, res in enumerate(range(3, log_size + 1)):
        cout = uch[2 ** res]
        up[str(i)] = {"conv1": conv(cin, cin, 3), "conv2": conv(cin, cout, 3),
                      "skip": {"weight": conv(cin, cout, 1)["weight"]}}
        sft_ch = gch[2 ** res] // 2 if cfg.sft_half else gch[2 ** res]
        cond_s[str(i)] = {"0": conv(cout, cout, 3), "2": conv(cout, sft_ch, 3)}
        cond_h[str(i)] = {"0": conv(cout, cout, 3), "2": conv(cout, sft_ch, 3)}
        torgb[str(i)] = conv(cout, 3, 1)
        cin = cout
    p["conv_body_up"] = up
    p["condition_scale"] = cond_s
    p["condition_shift"] = cond_h
    p["toRGB"] = torgb

    dec = {
        "constant_input": {"weight": rng.randn(1, gch[4], 4, 4).astype(f32)},
        "style_conv1": style_conv(gch[4], gch[4], cfg.num_style_feat),
        "to_rgb1": to_rgb(gch[4], cfg.num_style_feat),
        "style_convs": {}, "to_rgbs": {}, "noises": {},
    }
    dec["noises"]["noise0"] = np.zeros((1, 1, 4, 4), f32)
    cin = gch[4]
    n = 1
    for li, res in enumerate(range(3, log_size + 1)):
        cout = gch[2 ** res]
        dec["style_convs"][str(2 * li)] = style_conv(cin, cout, cfg.num_style_feat)
        dec["style_convs"][str(2 * li + 1)] = style_conv(cout, cout, cfg.num_style_feat)
        dec["to_rgbs"][str(li)] = to_rgb(cout, cfg.num_style_feat)
        dec["noises"][f"noise{n}"] = np.zeros((1, 1, 2 ** res, 2 ** res), f32)
        dec["noises"][f"noise{n + 1}"] = np.zeros((1, 1, 2 ** res, 2 ** res), f32)
        n += 2
        cin = cout
    p["stylegan_decoder"] = dec
    return p

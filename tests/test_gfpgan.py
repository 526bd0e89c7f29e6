"""GFPGAN v1 clean: forward parity against an independent torch twin.

The twin below is written directly from the published GFPGANv1Clean /
StyleGAN2-clean architecture description (bilinear resampling, modulated
convs, CSFT) — it shares no code with either the JAX module or upstream."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from `-m 'not slow'` quick runs

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdwebui_tpu.models import gfpgan  # noqa: E402

CFG = gfpgan.GFPGANConfig(out_size=32, num_style_feat=16,
                          channel_multiplier=1)


# --------------------------------------------------------------------------
# torch twin
# --------------------------------------------------------------------------

def up2(x):
    return F.interpolate(x, scale_factor=2, mode="bilinear",
                         align_corners=False)


def down2(x):
    return F.interpolate(x, scale_factor=0.5, mode="bilinear",
                         align_corners=False)


class TResBlockDown(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cin, 3, 1, 1)
        self.conv2 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.skip = nn.Conv2d(cin, cout, 1, bias=False)

    def forward(self, x):
        out = F.leaky_relu(self.conv1(x), 0.2)
        out = F.leaky_relu(self.conv2(down2(out)), 0.2)
        return (out + self.skip(down2(x))) / math.sqrt(2)


class TResUpBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cin, 3, 1, 1)
        self.conv2 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.skip = nn.Conv2d(cin, cout, 1, bias=False)

    def forward(self, x):
        out = F.leaky_relu(self.conv1(x), 0.2)
        out = F.leaky_relu(self.conv2(up2(out)), 0.2)
        return (out + self.skip(up2(x))) / math.sqrt(2)


class TModConv(nn.Module):
    def __init__(self, cin, cout, k, style_feat, demodulate=True,
                 sample_mode=None):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(1, cout, cin, k, k))
        self.modulation = nn.Linear(style_feat, cin)
        self.demodulate = demodulate
        self.sample_mode = sample_mode
        self.k = k

    def forward(self, x, style):
        b, c, h, w = x.shape
        cout = self.weight.shape[1]
        s = self.modulation(style).view(b, 1, c, 1, 1)
        wt = self.weight * s / math.sqrt(c * self.k * self.k)
        if self.demodulate:
            demod = torch.rsqrt(wt.pow(2).sum([2, 3, 4]) + 1e-8)
            wt = wt * demod.view(b, cout, 1, 1, 1)
        wt = wt.view(b * cout, c, self.k, self.k)
        if self.sample_mode == "upsample":
            x = up2(x)
        h, w = x.shape[2:]
        x = x.reshape(1, b * c, h, w)
        out = F.conv2d(x, wt, padding=self.k // 2, groups=b)
        return out.view(b, cout, h, w)


class TStyleConv(nn.Module):
    def __init__(self, cin, cout, style_feat, sample_mode=None):
        super().__init__()
        self.modulated_conv = TModConv(cin, cout, 3, style_feat,
                                       sample_mode=sample_mode)
        self.weight = nn.Parameter(torch.zeros(1))
        self.bias = nn.Parameter(torch.zeros(1, cout, 1, 1))

    def forward(self, x, style, noise):
        out = self.modulated_conv(x, style) * 2 ** 0.5
        if noise is not None:
            out = out + self.weight * noise
        return F.leaky_relu(out + self.bias, 0.2)


class TToRGB(nn.Module):
    def __init__(self, cin, style_feat):
        super().__init__()
        self.modulated_conv = TModConv(cin, 3, 1, style_feat,
                                       demodulate=False)
        self.bias = nn.Parameter(torch.zeros(1, 3, 1, 1))

    def forward(self, x, style, skip=None):
        out = self.modulated_conv(x, style) + self.bias
        if skip is not None:
            out = out + up2(skip)
        return out


class TGFPGAN(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        uch, gch = cfg.channels(unet=True), cfg.channels(unet=False)
        ls = cfg.log_size
        self.conv_body_first = nn.Conv2d(3, uch[cfg.out_size], 1)
        cin = uch[cfg.out_size]
        self.conv_body_down = nn.ModuleList()
        for res in range(ls, 2, -1):
            self.conv_body_down.append(TResBlockDown(cin, uch[2 ** (res - 1)]))
            cin = uch[2 ** (res - 1)]
        self.final_conv = nn.Conv2d(cin, uch[4], 3, 1, 1)
        self.final_linear = nn.Linear(uch[4] * 16,
                                      cfg.num_latent * cfg.num_style_feat)
        self.conv_body_up = nn.ModuleList()
        self.condition_scale = nn.ModuleList()
        self.condition_shift = nn.ModuleList()
        cin = uch[4]
        for res in range(3, ls + 1):
            cout = uch[2 ** res]
            self.conv_body_up.append(TResUpBlock(cin, cout))
            sft = gch[2 ** res] // 2 if cfg.sft_half else gch[2 ** res]
            self.condition_scale.append(nn.Sequential(
                nn.Conv2d(cout, cout, 3, 1, 1), nn.Identity(),
                nn.Conv2d(cout, sft, 3, 1, 1)))
            self.condition_shift.append(nn.Sequential(
                nn.Conv2d(cout, cout, 3, 1, 1), nn.Identity(),
                nn.Conv2d(cout, sft, 3, 1, 1)))
            cin = cout

        dec = nn.Module()
        dec.constant_input = nn.Module()
        dec.constant_input.weight = nn.Parameter(torch.randn(1, gch[4], 4, 4))
        dec.style_conv1 = TStyleConv(gch[4], gch[4], cfg.num_style_feat)
        dec.to_rgb1 = TToRGB(gch[4], cfg.num_style_feat)
        dec.style_convs = nn.ModuleList()
        dec.to_rgbs = nn.ModuleList()
        noises = {"noise0": torch.zeros(1, 1, 4, 4)}
        cin = gch[4]
        n = 1
        for res in range(3, ls + 1):
            cout = gch[2 ** res]
            dec.style_convs.append(TStyleConv(cin, cout, cfg.num_style_feat,
                                              sample_mode="upsample"))
            dec.style_convs.append(TStyleConv(cout, cout, cfg.num_style_feat))
            dec.to_rgbs.append(TToRGB(cout, cfg.num_style_feat))
            noises[f"noise{n}"] = torch.zeros(1, 1, 2 ** res, 2 ** res)
            noises[f"noise{n+1}"] = torch.zeros(1, 1, 2 ** res, 2 ** res)
            n += 2
            cin = cout
        for k, v in noises.items():
            dec.register_buffer(f"noises_{k}", v)
        dec.noise_names = list(noises)
        self.stylegan_decoder = dec

    def forward(self, x):
        cfg = self.cfg
        feat = F.leaky_relu(self.conv_body_first(x), 0.2)
        skips = []
        for blk in self.conv_body_down:
            feat = blk(feat)
            skips.insert(0, feat)
        feat = F.leaky_relu(self.final_conv(feat), 0.2)
        b = feat.shape[0]
        latent = self.final_linear(feat.reshape(b, -1)).view(
            b, cfg.num_latent, cfg.num_style_feat)
        conds = []
        for i, blk in enumerate(self.conv_body_up):
            feat = feat + skips[i]
            feat = blk(feat)
            sc = self.condition_scale[i]
            conds.append(sc[2](F.leaky_relu(sc[0](feat), 0.2)))
            sh = self.condition_shift[i]
            conds.append(sh[2](F.leaky_relu(sh[0](feat), 0.2)))

        dec = self.stylegan_decoder
        noise = [getattr(dec, f"noises_noise{i}")
                 for i in range(len(dec.noise_names))]
        out = dec.constant_input.weight.repeat(b, 1, 1, 1)
        out = dec.style_conv1(out, latent[:, 0], noise[0])
        skip = dec.to_rgb1(out, latent[:, 1])
        i = 1
        for c1, c2, n1, n2, trgb in zip(dec.style_convs[::2],
                                        dec.style_convs[1::2],
                                        noise[1::2], noise[2::2],
                                        dec.to_rgbs):
            out = c1(out, latent[:, i], n1)
            if i < len(conds):
                if cfg.sft_half:
                    same, sft = torch.split(out, out.size(1) // 2, dim=1)
                    sft = sft * conds[i - 1] + conds[i]
                    out = torch.cat([same, sft], dim=1)
                else:
                    out = out * conds[i - 1] + conds[i]
            out = c2(out, latent[:, i + 1], n2)
            skip = trgb(out, latent[:, i + 2], skip)
            i += 2
        return skip


def _twin_state_dict(m: TGFPGAN):
    sd = {}
    for k, v in m.state_dict().items():
        k = k.replace("stylegan_decoder.noises_noise",
                      "stylegan_decoder.noises.noise")
        sd[k] = v.detach().numpy()
    return sd


def test_gfpgan_forward_parity():
    torch.manual_seed(0)
    m = TGFPGAN(CFG).eval()
    # nonzero noise strengths so the noise path is exercised
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, TStyleConv):
                mod.weight.fill_(0.3)
    tree, cfg = gfpgan.convert_gfpgan(_twin_state_dict(m))
    assert cfg.out_size == CFG.out_size

    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = m(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(gfpgan.apply(jax.tree_util.tree_map(jnp.asarray, tree),
                                  CFG, jnp.asarray(x)))
    assert np.max(np.abs(ref - got)) < 5e-4 * max(np.abs(ref).max(), 1.0)


def test_gfpgan_params_ema_prefix_and_init_layout():
    p = gfpgan.init_params(CFG, 1)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 32, 32, 3), jnp.float32)
    y = gfpgan.apply(p, CFG, x)
    assert y.shape == (1, 32, 32, 3)

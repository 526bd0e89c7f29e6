"""HAT: forward parity against an independent torch twin (window attention +
CAB channel branch, overlapping cross-attention, pixelshuffle upsampler)."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from `-m 'not slow'` quick runs

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdwebui_tpu.models import hat  # noqa: E402

CFG = hat.HATConfig(embed_dim=24, depths=(2, 2), num_heads=(3, 3),
                    window_size=4, overlap_ratio=0.5, compress_ratio=3,
                    squeeze_factor=4, mlp_ratio=2.0, scale=2)


def wpart(x, w):
    b, h, wd, c = x.shape
    x = x.view(b, h // w, w, wd // w, w, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def wrev(win, w, b, h, wd):
    c = win.shape[-1]
    x = win.view(b, h // w, wd // w, w, w, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, wd, c)


class TWinAttn(nn.Module):
    def __init__(self, dim, win, heads):
        super().__init__()
        self.heads = heads
        self.win = win
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * win - 1) ** 2, heads) * 0.02)

    def forward(self, x, rpi, mask=None):
        b_, n, c = x.shape
        d = c // self.heads
        qkv = self.qkv(x).reshape(b_, n, 3, self.heads, d).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * d ** -0.5) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[rpi.reshape(-1)].reshape(
            n, n, self.heads).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.heads, n, n) \
                + mask.unsqueeze(0).unsqueeze(2)
            attn = attn.view(b_, self.heads, n, n)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(out)


class TCAB(nn.Module):
    def __init__(self, dim, compress, squeeze):
        super().__init__()
        self.cab = nn.Sequential(
            nn.Conv2d(dim, dim // compress, 3, 1, 1), nn.GELU(),
            nn.Conv2d(dim // compress, dim, 3, 1, 1),
            TChanAttn(dim, squeeze))

    def forward(self, x):
        return self.cab(x)


class TChanAttn(nn.Module):
    def __init__(self, dim, squeeze):
        super().__init__()
        self.attention = nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(dim, dim // squeeze, 1), nn.ReLU(),
            nn.Conv2d(dim // squeeze, dim, 1), nn.Sigmoid())

    def forward(self, x):
        return x * self.attention(x)


class THAB(nn.Module):
    def __init__(self, cfg, heads):
        super().__init__()
        d = cfg.embed_dim
        self.norm1 = nn.LayerNorm(d)
        self.attn = TWinAttn(d, cfg.window_size, heads)
        self.conv_block = TCAB(d, cfg.compress_ratio, cfg.squeeze_factor)
        self.norm2 = nn.LayerNorm(d)
        self.mlp = nn.ModuleDict({
            "fc1": nn.Linear(d, int(d * cfg.mlp_ratio)),
            "fc2": nn.Linear(int(d * cfg.mlp_ratio), d)})
        self.cfg = cfg

    def forward(self, x, hw, heads, shift, rpi, mask):
        cfg = self.cfg
        h, w = hw
        b, n, c = x.shape
        shortcut = x
        x = self.norm1(x)
        img = x.view(b, h, w, c)
        conv_x = self.conv_block(img.permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).reshape(b, n, c)
        if shift:
            img = torch.roll(img, (-shift, -shift), dims=(1, 2))
        wins = wpart(img, cfg.window_size)
        wins = self.attn(wins, rpi, mask if shift else None)
        img = wrev(wins, cfg.window_size, b, h, w)
        if shift:
            img = torch.roll(img, (shift, shift), dims=(1, 2))
        x = shortcut + img.reshape(b, n, c) + conv_x * cfg.conv_scale
        y = self.norm2(x)
        return x + self.mlp["fc2"](F.gelu(self.mlp["fc1"](y)))


class TOCAB(nn.Module):
    def __init__(self, cfg, heads):
        super().__init__()
        d = cfg.embed_dim
        self.heads = heads
        self.cfg = cfg
        self.norm1 = nn.LayerNorm(d)
        self.qkv = nn.Linear(d, d * 3)
        self.proj = nn.Linear(d, d)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((cfg.window_size + cfg.overlap_win - 1) ** 2, heads)
            * 0.02)
        self.norm2 = nn.LayerNorm(d)
        self.mlp = nn.ModuleDict({
            "fc1": nn.Linear(d, int(d * cfg.mlp_ratio)),
            "fc2": nn.Linear(int(d * cfg.mlp_ratio), d)})

    def forward(self, x, hw, rpi):
        cfg = self.cfg
        win, owin = cfg.window_size, cfg.overlap_win
        h, w = hw
        b, n, c = x.shape
        d = c // self.heads
        shortcut = x
        x = self.norm1(x)
        qkv = self.qkv(x).reshape(b, h, w, 3, c).permute(3, 0, 4, 1, 2)
        q = qkv[0].permute(0, 2, 3, 1)                  # b,h,w,c
        kv = torch.cat((qkv[1], qkv[2]), dim=1)         # b,2c,h,w
        qw = wpart(q, win)                              # (b·nw, win², c)
        kvw = F.unfold(kv, kernel_size=owin, stride=win,
                       padding=(owin - win) // 2)       # b, 2c·owin², nw
        nw = kvw.shape[-1]
        kvw = kvw.view(b, 2, c, owin * owin, nw).permute(1, 0, 4, 3, 2) \
            .reshape(2, b * nw, owin * owin, c)
        kw, vw = kvw[0], kvw[1]
        bq, nq, nk = qw.shape[0], win * win, owin * owin
        qh = qw.reshape(bq, nq, self.heads, d).permute(0, 2, 1, 3)
        kh = kw.reshape(bq, nk, self.heads, d).permute(0, 2, 1, 3)
        vh = vw.reshape(bq, nk, self.heads, d).permute(0, 2, 1, 3)
        attn = (qh * d ** -0.5) @ kh.transpose(-2, -1)
        bias = self.relative_position_bias_table[rpi.reshape(-1)].reshape(
            nq, nk, self.heads).permute(2, 0, 1)
        attn = (attn + bias.unsqueeze(0)).softmax(-1)
        out = (attn @ vh).transpose(1, 2).reshape(bq, nq, c)
        out = wrev(out, win, b, h, w).reshape(b, n, c)
        x = shortcut + self.proj(out)
        y = self.norm2(x)
        return x + self.mlp["fc2"](F.gelu(self.mlp["fc1"](y)))


class TRHAG(nn.Module):
    def __init__(self, cfg, depth, heads):
        super().__init__()
        rg = nn.Module()
        rg.blocks = nn.ModuleList([THAB(cfg, heads) for _ in range(depth)])
        rg.overlap_attn = TOCAB(cfg, heads)
        self.residual_group = rg
        self.conv = nn.Conv2d(cfg.embed_dim, cfg.embed_dim, 3, 1, 1)
        self.cfg = cfg
        self.heads = heads

    def forward(self, x, hw, rpi_sa, rpi_o, mask):
        b, n, c = x.shape
        tin = x
        for j, blk in enumerate(self.residual_group.blocks):
            shift = 0 if j % 2 == 0 else self.cfg.window_size // 2
            x = blk(x, hw, self.heads, shift, rpi_sa, mask)
        x = self.residual_group.overlap_attn(x, hw, rpi_o)
        img = x.view(b, hw[0], hw[1], c).permute(0, 3, 1, 2)
        img = self.conv(img).permute(0, 2, 3, 1).reshape(b, n, c)
        return img + tin


class THAT(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        e = cfg.embed_dim
        self.conv_first = nn.Conv2d(3, e, 3, 1, 1)
        self.layers = nn.ModuleList(
            [TRHAG(cfg, d, h) for d, h in zip(cfg.depths, cfg.num_heads)])
        self.norm = nn.LayerNorm(e)
        self.conv_after_body = nn.Conv2d(e, e, 3, 1, 1)
        self.conv_before_upsample = nn.Conv2d(e, e, 3, 1, 1)
        ups, s, k = {}, cfg.scale, 0
        while s > 1:
            r = 3 if s % 3 == 0 else 2
            ups[str(k)] = nn.Conv2d(e, e * r * r, 3, 1, 1)
            s //= r
            k += 2
        self.upsample = nn.ModuleDict(ups)
        self.conv_last = nn.Conv2d(e, 3, 3, 1, 1)

    def forward(self, x):
        cfg = self.cfg
        from sdwebui_tpu.models.hat import rpi_oca
        from sdwebui_tpu.models.swinir import (relative_position_index,
                                               shift_attn_mask)

        b, _, h, w = x.shape
        rpi_sa = torch.from_numpy(relative_position_index(cfg.window_size))
        rpi_o = torch.from_numpy(rpi_oca(cfg.window_size, cfg.overlap_win))
        mask = torch.from_numpy(
            shift_attn_mask(h, w, cfg.window_size, cfg.window_size // 2))
        mean = torch.tensor([0.4488, 0.4371, 0.4040]).view(1, 3, 1, 1)
        x = (x - mean) * cfg.img_range
        feat = self.conv_first(x)
        t = feat.permute(0, 2, 3, 1).reshape(b, h * w, cfg.embed_dim)
        for layer in self.layers:
            t = layer(t, (h, w), rpi_sa, rpi_o, mask)
        t = self.norm(t)
        body = t.view(b, h, w, cfg.embed_dim).permute(0, 3, 1, 2)
        feat = self.conv_after_body(body) + feat
        feat = F.leaky_relu(self.conv_before_upsample(feat), 0.01)
        s, k = cfg.scale, 0
        while s > 1:
            r = 3 if s % 3 == 0 else 2
            feat = F.pixel_shuffle(self.upsample[str(k)](feat), r)
            s //= r
            k += 2
        out = self.conv_last(feat)
        return (out / cfg.img_range + mean).clamp(0, 1)


def test_hat_forward_parity():
    torch.manual_seed(0)
    m = THAT(CFG).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    tree, cfg = hat.convert_hat(sd)
    assert cfg.window_size == CFG.window_size
    assert cfg.overlap_win == CFG.overlap_win
    assert cfg.scale == CFG.scale
    assert cfg.num_heads == CFG.num_heads

    x = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    got = np.asarray(hat.apply(jax.tree_util.tree_map(jnp.asarray, tree),
                               cfg, jnp.asarray(x)))
    assert got.shape == ref.shape
    assert np.max(np.abs(ref - got)) < 2e-5


def test_hat_tiled_upscale():
    from PIL import Image

    p = hat.init_params(CFG, 1)
    img = Image.fromarray((np.random.RandomState(2).rand(20, 28, 3) * 255)
                          .astype(np.uint8))
    out = hat.upscale_image(p, CFG, img, tile=16, overlap=4)
    assert out.size == (28 * CFG.scale, 20 * CFG.scale)

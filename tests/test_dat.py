"""DAT: forward parity against an independent torch twin (dual-branch
rectangle-window attention + channel attention, AIM interactions, SGFN,
dynamic position bias), plus config derivation from checkpoint buffers."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from `-m 'not slow'` quick runs

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdwebui_tpu.models import dat  # noqa: E402

CFG = dat.DATConfig(embed_dim=64, depths=(2, 2), num_heads=(4, 4),
                    split_size=(2, 4), expansion_factor=2.0, scale=2,
                    resi_connection="1conv", upsampler="pixelshuffle")

CFG_LIGHT = dat.DATConfig(embed_dim=64, depths=(3,), num_heads=(4,),
                          split_size=(2, 4), expansion_factor=2.0, scale=3,
                          resi_connection="3conv",
                          upsampler="pixelshuffledirect")


class TDynamicPosBias(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.pos_dim = dim // 4
        self.pos_proj = nn.Linear(2, self.pos_dim)
        self.pos1 = nn.Sequential(nn.LayerNorm(self.pos_dim), nn.ReLU(),
                                  nn.Linear(self.pos_dim, self.pos_dim))
        self.pos2 = nn.Sequential(nn.LayerNorm(self.pos_dim), nn.ReLU(),
                                  nn.Linear(self.pos_dim, self.pos_dim))
        self.pos3 = nn.Sequential(nn.LayerNorm(self.pos_dim), nn.ReLU(),
                                  nn.Linear(self.pos_dim, num_heads))

    def forward(self, biases):
        return self.pos3(self.pos2(self.pos1(self.pos_proj(biases))))


class TSpatialBranch(nn.Module):
    """One rect-window branch (official Spatial_Attention, position_bias)."""

    def __init__(self, dim, idx, split_size, num_heads):
        super().__init__()
        self.dim = dim
        self.heads = num_heads
        if idx == 0:
            self.H_sp, self.W_sp = split_size[0], split_size[1]
        else:
            self.W_sp, self.H_sp = split_size[0], split_size[1]
        self.pos = TDynamicPosBias(dim // 4, num_heads)
        self.register_buffer(
            "rpe_biases",
            torch.from_numpy(dat.rect_rpe_biases(self.H_sp, self.W_sp)))
        self.register_buffer(
            "relative_position_index",
            torch.from_numpy(dat.rect_rpi(self.H_sp, self.W_sp)))

    def forward(self, qkv, H, W, mask=None):
        wh, ww = self.H_sp, self.W_sp
        n = wh * ww
        b = qkv.shape[1]
        c = qkv.shape[-1]
        d = c // self.heads
        outs = []
        for t in qkv:       # q, k, v: (B, L, C) → (B·nW, heads, N, d)
            img = t.view(b, H, W, c)
            win = img.view(b, H // wh, wh, W // ww, ww, c) \
                .permute(0, 1, 3, 2, 4, 5).reshape(-1, n, c)
            outs.append(win.reshape(-1, n, self.heads, d)
                        .permute(0, 2, 1, 3))
        q, k, v = outs
        attn = (q * d ** -0.5) @ k.transpose(-2, -1)
        pos = self.pos(self.rpe_biases)
        bias = pos[self.relative_position_index.view(-1)].view(
            n, n, self.heads).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b, nw, self.heads, n, n) \
                + mask.unsqueeze(0).unsqueeze(2)
            attn = attn.view(-1, self.heads, n, n)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(-1, n, c)
        return out.view(b, H // wh, W // ww, wh, ww, c) \
            .permute(0, 1, 3, 2, 4, 5).reshape(b, H, W, c)


def _interactions(dim):
    dwconv = nn.Sequential(
        nn.Conv2d(dim, dim, 3, 1, 1, groups=dim), nn.BatchNorm2d(dim),
        nn.GELU())
    ci = nn.Sequential(
        nn.AdaptiveAvgPool2d(1), nn.Conv2d(dim, dim // 8, 1),
        nn.BatchNorm2d(dim // 8), nn.GELU(), nn.Conv2d(dim // 8, dim, 1))
    si = nn.Sequential(
        nn.Conv2d(dim, dim // 16, 1), nn.BatchNorm2d(dim // 16), nn.GELU(),
        nn.Conv2d(dim // 16, 1, 1))
    return dwconv, ci, si


class TAdaptiveSpatial(nn.Module):
    def __init__(self, dim, num_heads, split_size, shifted):
        super().__init__()
        self.split_size = split_size
        self.shift_size = (split_size[0] // 2, split_size[1] // 2)
        self.shifted = shifted
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.attns = nn.ModuleList([
            TSpatialBranch(dim // 2, i, split_size, num_heads // 2)
            for i in range(2)])
        self.dwconv, self.channel_interaction, self.spatial_interaction = \
            _interactions(dim)

    def forward(self, x, H, W):
        b, L, c = x.shape
        qkv = self.qkv(x).reshape(b, L, 3, c).permute(2, 0, 1, 3)
        v_img = qkv[2].transpose(-2, -1).contiguous().view(b, c, H, W)
        s0, s1 = self.split_size
        sh0, sh1 = self.shift_size
        halves = []
        for idx in range(2):
            sl = slice(0, c // 2) if idx == 0 else slice(c // 2, None)
            part = qkv[:, :, :, sl]
            rh, rw = ((sh0, sh1) if idx == 0 else (sh1, sh0))
            wh, ww = ((s0, s1) if idx == 0 else (s1, s0))
            if self.shifted:
                part = part.view(3, b, H, W, c // 2)
                part = torch.roll(part, (-rh, -rw), dims=(2, 3))
                part = part.view(3, b, L, c // 2)
                mask = torch.from_numpy(
                    dat.rect_shift_mask(H, W, wh, ww, rh, rw))
            else:
                mask = None
            hx = self.attns[idx](part, H, W, mask)
            if self.shifted:
                hx = torch.roll(hx, (rh, rw), dims=(1, 2))
            halves.append(hx.reshape(b, L, c // 2))
        attened = torch.cat(halves, dim=2)
        conv_x = self.dwconv(v_img)
        channel_map = self.channel_interaction(conv_x) \
            .permute(0, 2, 3, 1).contiguous().view(b, 1, c)
        attn_img = attened.transpose(-2, -1).contiguous().view(b, c, H, W)
        spatial_map = self.spatial_interaction(attn_img)
        attened = attened * torch.sigmoid(channel_map)
        conv_x = torch.sigmoid(spatial_map) * conv_x
        conv_x = conv_x.permute(0, 2, 3, 1).contiguous().view(b, L, c)
        return self.proj(attened + conv_x)


class TAdaptiveChannel(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.heads = num_heads
        self.temperature = nn.Parameter(torch.rand(num_heads, 1, 1) + 0.5)
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.dwconv, self.channel_interaction, self.spatial_interaction = \
            _interactions(dim)

    def forward(self, x, H, W):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, c // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = (t.transpose(-2, -1) for t in (qkv[0], qkv[1], qkv[2]))
        v_img = v.reshape(b, c, n).contiguous().view(b, c, H, W)
        q = F.normalize(q, dim=-1)
        k = F.normalize(k, dim=-1)
        attn = (q @ k.transpose(-2, -1)) * self.temperature
        attn = attn.softmax(dim=-1)
        out = (attn @ v).permute(0, 3, 1, 2).reshape(b, n, c)
        conv_x = self.dwconv(v_img)
        attn_img = out.transpose(-2, -1).contiguous().view(b, c, H, W)
        channel_map = self.channel_interaction(attn_img)
        spatial_map = self.spatial_interaction(conv_x) \
            .permute(0, 2, 3, 1).contiguous().view(b, n, 1)
        out = out * torch.sigmoid(spatial_map)
        conv_x = conv_x * torch.sigmoid(channel_map)
        conv_x = conv_x.permute(0, 2, 3, 1).contiguous().view(b, n, c)
        return self.proj(out + conv_x)


class TSpatialGate(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.conv = nn.Conv2d(dim, dim, 3, 1, 1, groups=dim)

    def forward(self, x, H, W):
        x1, x2 = x.chunk(2, dim=-1)
        b, n, c = x.shape
        x2 = self.conv(self.norm(x2).transpose(1, 2).contiguous()
                       .view(b, c // 2, H, W)) \
            .flatten(2).transpose(-1, -2).contiguous()
        return x1 * x2


class TSGFN(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.sg = TSpatialGate(hidden // 2)
        self.fc2 = nn.Linear(hidden // 2, dim)

    def forward(self, x, H, W):
        return self.fc2(self.sg(F.gelu(self.fc1(x)), H, W))


class TDATB(nn.Module):
    def __init__(self, cfg, heads, rg_idx, b_idx):
        super().__init__()
        e = cfg.embed_dim
        self.norm1 = nn.LayerNorm(e)
        if b_idx % 2 == 0:
            self.attn = TAdaptiveSpatial(
                e, heads, cfg.split_size, dat._is_shifted(rg_idx, b_idx))
        else:
            self.attn = TAdaptiveChannel(e, heads)
        self.norm2 = nn.LayerNorm(e)
        self.ffn = TSGFN(e, int(e * cfg.expansion_factor))

    def forward(self, x, H, W):
        x = x + self.attn(self.norm1(x), H, W)
        return x + self.ffn(self.norm2(x), H, W)


def _resi_conv(cfg):
    e = cfg.embed_dim
    if cfg.resi_connection == "1conv":
        return nn.Conv2d(e, e, 3, 1, 1)
    return nn.Sequential(
        nn.Conv2d(e, e // 4, 3, 1, 1), nn.LeakyReLU(0.2, True),
        nn.Conv2d(e // 4, e // 4, 1), nn.LeakyReLU(0.2, True),
        nn.Conv2d(e // 4, e, 3, 1, 1))


class TGroup(nn.Module):
    def __init__(self, cfg, depth, heads, rg_idx):
        super().__init__()
        self.blocks = nn.ModuleList(
            [TDATB(cfg, heads, rg_idx, j) for j in range(depth)])
        self.conv = _resi_conv(cfg)

    def forward(self, x, H, W):
        b, n, c = x.shape
        res = x
        for blk in self.blocks:
            x = blk(x, H, W)
        img = x.view(b, H, W, c).permute(0, 3, 1, 2)
        return self.conv(img).permute(0, 2, 3, 1).reshape(b, n, c) + res


class TDAT(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        e = cfg.embed_dim
        self.conv_first = nn.Conv2d(3, e, 3, 1, 1)
        self.before_RG = nn.Sequential(nn.Identity(), nn.LayerNorm(e))
        self.layers = nn.ModuleList(
            [TGroup(cfg, d, h, i)
             for i, (d, h) in enumerate(zip(cfg.depths, cfg.num_heads))])
        self.norm = nn.LayerNorm(e)
        self.conv_after_body = _resi_conv(cfg)
        if cfg.upsampler == "pixelshuffle":
            nf = cfg.num_feat
            self.conv_before_upsample = nn.Sequential(
                nn.Conv2d(e, nf, 3, 1, 1))
            ups, s, k = {}, cfg.scale, 0
            while s > 1:
                r = 3 if s % 3 == 0 else 2
                ups[str(k)] = nn.Conv2d(nf, nf * r * r, 3, 1, 1)
                s //= r
                k += 2
            self.upsample = nn.ModuleDict(ups)
            self.conv_last = nn.Conv2d(nf, 3, 3, 1, 1)
        else:
            self.upsample = nn.ModuleDict(
                {"0": nn.Conv2d(e, 3 * cfg.scale ** 2, 3, 1, 1)})

    def forward(self, x):
        cfg = self.cfg
        b, _, H, W = x.shape
        mean = torch.tensor([0.4488, 0.4371, 0.4040]).view(1, 3, 1, 1)
        x = (x - mean) * cfg.img_range
        feat = self.conv_first(x)
        t = feat.permute(0, 2, 3, 1).reshape(b, H * W, cfg.embed_dim)
        t = self.before_RG[1](t)
        for layer in self.layers:
            t = layer(t, H, W)
        t = self.norm(t)
        body = t.view(b, H, W, cfg.embed_dim).permute(0, 3, 1, 2)
        feat = self.conv_after_body(body) + feat
        if cfg.upsampler == "pixelshuffle":
            feat = F.leaky_relu(self.conv_before_upsample(feat), 0.01)
            s, k = cfg.scale, 0
            while s > 1:
                r = 3 if s % 3 == 0 else 2
                feat = F.pixel_shuffle(self.upsample[str(k)](feat), r)
                s //= r
                k += 2
            out = self.conv_last(feat)
        else:
            out = F.pixel_shuffle(self.upsample["0"](feat), cfg.scale)
        return (out / cfg.img_range + mean).clamp(0, 1)


def _parity(cfg, seed=0, hw=(8, 8)):
    torch.manual_seed(seed)
    m = TDAT(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    tree, dcfg = dat.convert_dat(sd)
    assert dcfg.split_size == cfg.split_size
    assert dcfg.depths == cfg.depths
    assert dcfg.num_heads == cfg.num_heads
    assert dcfg.scale == cfg.scale
    assert dcfg.resi_connection == cfg.resi_connection
    assert dcfg.upsampler == cfg.upsampler
    assert dcfg.expansion_factor == cfg.expansion_factor

    x = np.random.RandomState(seed).rand(2, *hw, 3).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    got = np.asarray(dat.apply(jax.tree_util.tree_map(jnp.asarray, tree),
                               dcfg, jnp.asarray(x)))
    assert got.shape == ref.shape
    assert np.max(np.abs(ref - got)) < 2e-5


def test_dat_forward_parity():
    """pixelshuffle + 1conv; rg1 block0 exercises the shifted windows."""
    _parity(CFG)


def test_dat_light_variant_parity():
    """pixelshuffledirect + 3conv + depth-3 group (shifted block at j=2)."""
    _parity(CFG_LIGHT, seed=1)


def test_dat_shift_mask_and_rpi():
    m = dat.rect_shift_mask(8, 8, 2, 4, 1, 2)
    assert m.shape == (8, 8, 8)         # (nW, N, N)
    assert set(np.unique(m)) <= {0.0, -100.0}
    idx = dat.rect_rpi(2, 4)
    assert idx.shape == (8, 8)
    assert idx.max() == (2 * 2 - 1) * (2 * 4 - 1) - 1
    # buffer-driven split disambiguation: (2,4) vs (4,2)
    assert not np.array_equal(dat.rect_rpi(2, 4), dat.rect_rpi(4, 2))


def test_dat_tiled_upscale():
    from PIL import Image

    p = dat.init_params(CFG, 1)
    img = Image.fromarray((np.random.RandomState(2).rand(10, 14, 3) * 255)
                          .astype(np.uint8))
    out = dat.upscale_image(p, CFG, img, tile=8, overlap=4)
    assert out.size == (14 * CFG.scale, 10 * CFG.scale)

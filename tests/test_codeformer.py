"""CodeFormer: forward parity against an independent torch twin.

The twin is written from the published CodeFormer / VQGAN architecture
description (flat blocks lists, GroupNorm-swish ResBlocks, single-head attn,
pre-norm transformer over codebook logits, SFT fusion)."""

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

from sdwebui_tpu.models import codeformer as cf  # noqa: E402

CFG = cf.CodeFormerConfig(img_size=32, nf=8, ch_mult=(1, 2, 4), res_blocks=2,
                          attn_resolutions=(8,), emb_dim=16, codebook_size=32,
                          dim_embd=32, n_head=4, n_layers=2,
                          connect_list=("16",))


def gn(c):
    return nn.GroupNorm(min(32, c), c, eps=1e-6)


class TRes(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = gn(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.norm2 = gn(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
        if cin != cout:
            self.conv_out = nn.Conv2d(cin, cout, 1, 1, 0)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_out"):
            x = self.conv_out(x)
        return x + h


class TAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = gn(c)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        t = self.norm(x)
        q = self.q(t).reshape(b, c, h * w).permute(0, 2, 1)
        k = self.k(t).reshape(b, c, h * w)
        v = self.v(t).reshape(b, c, h * w).permute(0, 2, 1)
        att = torch.softmax(q @ k * c ** -0.5, dim=-1)
        out = (att @ v).permute(0, 2, 1).reshape(b, c, h, w)
        return x + self.proj_out(out)


class TDown(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, 2, 0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TUp(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, 1, 1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TNorm(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.n = gn(c)
        # register under this module's own names so state_dict key is bare
        self.weight = self.n.weight
        self.bias = self.n.bias

    def forward(self, x):
        return F.silu(F.group_norm(x, self.n.num_groups, self.weight,
                                   self.bias, 1e-6))


def build_blocks(plan):
    mods = nn.ModuleList()
    for kind, cin, cout in plan:
        if kind == "conv":
            mods.append(nn.Conv2d(cin, cout, 3, 1, 1))
        elif kind == "res":
            mods.append(TRes(cin, cout))
        elif kind == "attn":
            mods.append(TAttn(cin))
        elif kind == "down":
            mods.append(TDown(cin))
        elif kind == "up":
            mods.append(TUp(cin))
        elif kind == "norm":
            mods.append(TNorm(cin))
    return mods


class TSALayer(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, heads)
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)
        self.linear1 = nn.Linear(d, d * 2)
        self.linear2 = nn.Linear(d * 2, d)

    def forward(self, tgt, pos):
        t = self.norm1(tgt)
        qk = t + pos
        tgt = tgt + self.self_attn(qk, qk, value=t)[0]
        t = self.norm2(tgt)
        return tgt + self.linear2(F.gelu(self.linear1(t)))


class TFuse(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.encode_enc = TRes(2 * ch, ch)
        self.scale = nn.Sequential(nn.Conv2d(ch, ch, 3, 1, 1),
                                   nn.LeakyReLU(0.2, True),
                                   nn.Conv2d(ch, ch, 3, 1, 1))
        self.shift = nn.Sequential(nn.Conv2d(ch, ch, 3, 1, 1),
                                   nn.LeakyReLU(0.2, True),
                                   nn.Conv2d(ch, ch, 3, 1, 1))

    def forward(self, enc, dec, w):
        e = self.encode_enc(torch.cat([enc, dec], 1))
        return dec + w * (dec * self.scale(e) + self.shift(e))


class TCodeFormer(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        e_plan, self.e_fuse = cf.encoder_plan(cfg)
        g_plan, self.g_fuse = cf.generator_plan(cfg)
        enc = nn.Module()
        enc.blocks = build_blocks(e_plan)
        self.encoder = enc
        gen = nn.Module()
        gen.blocks = build_blocks(g_plan)
        self.generator = gen
        q = nn.Module()
        q.embedding = nn.Embedding(cfg.codebook_size, cfg.emb_dim)
        self.quantize = q
        self.position_emb = nn.Parameter(
            torch.randn(cfg.latent_size ** 2, cfg.dim_embd) * 0.02)
        self.feat_emb = nn.Linear(cfg.emb_dim, cfg.dim_embd)
        self.ft_layers = nn.ModuleList(
            [TSALayer(cfg.dim_embd, cfg.n_head) for _ in range(cfg.n_layers)])
        self.idx_pred_layer = nn.Sequential(
            nn.LayerNorm(cfg.dim_embd),
            nn.Linear(cfg.dim_embd, cfg.codebook_size, bias=False))
        res_map = {}
        rr = cfg.latent_size
        for i in reversed(range(len(cfg.ch_mult))):
            res_map[rr] = cfg.nf * cfg.ch_mult[i]
            rr *= 2
        self.fuse_convs_dict = nn.ModuleDict(
            {r: TFuse(res_map[int(r)]) for r in cfg.connect_list})

    def forward(self, x, w=0.5, adain=True):
        cfg = self.cfg
        connect = {int(r) for r in cfg.connect_list}
        enc_feats = {}
        capture = {i: r for r, i in self.e_fuse.items()}
        for i, blk in enumerate(self.encoder.blocks):
            x = blk(x)
            if i in capture and capture[i] in connect:
                enc_feats[capture[i]] = x
        lq = x
        b, c, hh, ww = lq.shape
        tokens = lq.flatten(2).permute(2, 0, 1)            # (S, B, C)
        pos = self.position_emb.unsqueeze(1).repeat(1, b, 1)
        q = self.feat_emb(tokens)
        for layer in self.ft_layers:
            q = layer(q, pos)
        logits = self.idx_pred_layer(q).permute(1, 0, 2)   # (B, S, code)
        idx = logits.argmax(2)
        code = self.quantize.embedding.weight[idx]         # (B, S, emb)
        quant = code.view(b, hh, ww, cfg.emb_dim).permute(0, 3, 1, 2)
        if adain:
            # published calc_mean_std: unbiased var + eps, then sqrt
            cm = quant.mean((2, 3), keepdim=True)
            cs = (quant.var(dim=(2, 3), keepdim=True, unbiased=True) + 1e-5).sqrt()
            sm = lq.mean((2, 3), keepdim=True)
            ss = (lq.var(dim=(2, 3), keepdim=True, unbiased=True) + 1e-5).sqrt()
            quant = (quant - cm) / cs * ss + sm
        x = quant
        gfuse = {i: r for r, i in self.g_fuse.items()}
        for i, blk in enumerate(self.generator.blocks):
            x = blk(x)
            if i in gfuse and gfuse[i] in connect and w > 0:
                x = self.fuse_convs_dict[str(gfuse[i])](
                    enc_feats[gfuse[i]], x, w)
        return x


def _state_dict_np(m):
    sd = {}
    for k, v in m.state_dict().items():
        # TNorm registered n.* duplicates; keep bare weight/bias only
        if ".n.weight" in k or ".n.bias" in k:
            continue
        sd[k] = v.detach().numpy()
    return sd


def test_codeformer_forward_parity():
    torch.manual_seed(0)
    m = TCodeFormer(CFG).eval()
    sd = _state_dict_np(m)
    tree, cfg = cf.convert_codeformer(sd)
    assert cfg.codebook_size == CFG.codebook_size
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    for w, adain in ((0.6, True), (0.0, False)):
        with torch.no_grad():
            ref = m(torch.from_numpy(x).permute(0, 3, 1, 2), w=w,
                    adain=adain).permute(0, 2, 3, 1).numpy()
        got = np.asarray(cf.apply(
            jax.tree_util.tree_map(jnp.asarray, tree),
            cf.CodeFormerConfig(**{**CFG.__dict__}), jnp.asarray(x), w=w,
            adain=adain))
        scale = max(np.abs(ref).max(), 1.0)
        assert np.max(np.abs(ref - got)) < 2e-4 * scale, (w, adain)


def test_standard_fuse_tables():
    """The plan builder must reproduce the official hardcoded index maps."""
    std = cf.CodeFormerConfig()
    _, ef = cf.encoder_plan(std)
    _, gf = cf.generator_plan(std)
    assert ef == {512: 2, 256: 5, 128: 8, 64: 11, 32: 14, 16: 18}
    assert gf == {16: 6, 32: 9, 64: 12, 128: 15, 256: 18, 512: 21}

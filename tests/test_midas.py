"""MiDaS DPT-hybrid parity (torch twin) + depth2img end-to-end.

The reference consumes MiDaS through ldm's LatentDepth2ImageDiffusion
(dispatch at modules/processing.py:304-321, 375-396); the DPT tower itself
is not in the reference image, so the oracle here is a torch twin built
from the public DPT structure (Ranftl et al., isl-org/DPT dpt_hybrid).
"""

import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from `-m 'not slow'` quick runs

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdwebui_tpu.models.midas import DPTConfig, apply, convert_dpt  # noqa: E402

torch.manual_seed(0)

# tiny hybrid: stem 32, stages (1,1,1) -> 64/128/256, ViT 64x2, scratch 32
STEM, STAGE_OUT, VIT_W, VIT_L, FEAT = 32, (64, 128, 256), 64, 2, 32
IMG = 64


class StdConv2d(nn.Conv2d):
    def forward(self, x):
        w = self.weight
        m = w.mean(dim=[1, 2, 3], keepdim=True)
        v = w.var(dim=[1, 2, 3], unbiased=False, keepdim=True)
        return F.conv2d(x, (w - m) / torch.sqrt(v + 1e-8), self.bias,
                        self.stride, self.padding)


def gn(c):
    return nn.GroupNorm(min(32, c), c)


class PreActBottleneck(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        mid = cout // 4
        self.norm1 = gn(cin)
        self.conv1 = StdConv2d(cin, mid, 1, bias=False)
        self.norm2 = gn(mid)
        self.conv2 = StdConv2d(mid, mid, 3, stride=stride, padding=1,
                               bias=False)
        self.norm3 = gn(mid)
        self.conv3 = StdConv2d(mid, cout, 1, bias=False)
        self.downsample = None
        if cin != cout or stride != 1:
            self.downsample = nn.Module()
            self.downsample.conv = StdConv2d(cin, cout, 1, stride=stride,
                                             bias=False)

    def forward(self, x):
        pre = F.relu(self.norm1(x))
        short = self.downsample.conv(pre) if self.downsample is not None else x
        out = self.conv1(pre)
        out = self.conv2(F.relu(self.norm2(out)))
        out = self.conv3(F.relu(self.norm3(out)))
        return out + short


class VitBlock(nn.Module):
    def __init__(self, w, heads):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(w, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(w, 3 * w)
        self.attn.proj = nn.Linear(w, w)
        self.norm2 = nn.LayerNorm(w, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(w, 4 * w)
        self.mlp.fc2 = nn.Linear(4 * w, w)

    def forward(self, x):
        b, n, w = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(b, n, 3, self.heads, -1)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, n, w)
        x = x + self.attn.proj(o)
        h = self.norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(h)))


class ResidualConvUnit(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = nn.Conv2d(f, f, 3, padding=1)
        self.conv2 = nn.Conv2d(f, f, 3, padding=1)

    def forward(self, x):
        out = self.conv1(F.relu(x))
        out = self.conv2(F.relu(out))
        return out + x


class FusionBlock(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.resConfUnit1 = ResidualConvUnit(f)
        self.resConfUnit2 = ResidualConvUnit(f)
        self.out_conv = nn.Conv2d(f, f, 1)

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        return self.out_conv(x)


class TorchDPT(nn.Module):
    """Key names mirror the dpt_hybrid state dict (pretrained.model.* /
    pretrained.act_postprocessN.* / scratch.*)."""

    def __init__(self):
        super().__init__()
        pm = nn.Module()
        pm.cls_token = nn.Parameter(torch.randn(1, 1, VIT_W) * 0.02)
        grid = IMG // 16
        pm.pos_embed = nn.Parameter(torch.randn(1, grid * grid + 1, VIT_W) * 0.02)
        pe = nn.Module()
        backbone = nn.Module()
        stem = nn.Module()
        stem.conv = StdConv2d(3, STEM, 7, stride=2, padding=3, bias=False)
        stem.norm = gn(STEM)
        backbone.stem = stem
        stages = nn.ModuleList()
        cin = STEM
        for si, cout in enumerate(STAGE_OUT):
            stage = nn.Module()
            stage.blocks = nn.ModuleList(
                [PreActBottleneck(cin, cout, stride=2 if si > 0 else 1)])
            stages.append(stage)
            cin = cout
        backbone.stages = stages
        backbone.norm = gn(STAGE_OUT[-1])
        pe.backbone = backbone
        pe.proj = nn.Conv2d(STAGE_OUT[-1], VIT_W, 1)
        pm.patch_embed = pe
        pm.blocks = nn.ModuleList(
            [VitBlock(VIT_W, 4) for _ in range(VIT_L)])
        self.pretrained = nn.Module()
        self.pretrained.model = pm

        def readout(out_f):
            seq = nn.Module()
            proj = nn.Module()
            proj.project = nn.Sequential(nn.Linear(2 * VIT_W, VIT_W),
                                         nn.GELU())
            mods = nn.ModuleDict({"0": proj,
                                  "3": nn.Conv2d(VIT_W, out_f, 1)})
            return mods

        self.pretrained.act_postprocess3 = readout(VIT_W)
        pp4 = readout(VIT_W)
        pp4["4"] = nn.Conv2d(VIT_W, VIT_W, 3, stride=2, padding=1)
        self.pretrained.act_postprocess4 = pp4

        sc = nn.Module()
        sc.layer1_rn = nn.Conv2d(STAGE_OUT[0], FEAT, 3, padding=1, bias=False)
        sc.layer2_rn = nn.Conv2d(STAGE_OUT[1], FEAT, 3, padding=1, bias=False)
        sc.layer3_rn = nn.Conv2d(VIT_W, FEAT, 3, padding=1, bias=False)
        sc.layer4_rn = nn.Conv2d(VIT_W, FEAT, 3, padding=1, bias=False)
        for i in range(1, 5):
            setattr(sc, f"refinenet{i}", FusionBlock(FEAT))
        sc.output_conv = nn.ModuleDict({
            "0": nn.Conv2d(FEAT, FEAT // 2, 3, padding=1),
            "2": nn.Conv2d(FEAT // 2, 8, 3, padding=1),
            "4": nn.Conv2d(8, 1, 1)})
        self.scratch = sc

    def forward(self, x):
        pm = self.pretrained.model
        x = pm.patch_embed.backbone.stem.conv(x)
        x = F.relu(pm.patch_embed.backbone.stem.norm(x))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        feats = []
        for stage in pm.patch_embed.backbone.stages:
            for blk in stage.blocks:
                x = blk(x)
            feats.append(x)
        layer1, layer2, deep = feats
        deep = F.relu(pm.patch_embed.backbone.norm(deep))
        b, _, gh, gw = deep.shape
        tok = pm.patch_embed.proj(deep).flatten(2).transpose(1, 2)
        cls = pm.cls_token.expand(b, -1, -1)
        tok = torch.cat([cls, tok], dim=1) + pm.pos_embed
        hooks = {}
        for i, blk in enumerate(pm.blocks):
            tok = blk(tok)
            hooks[i] = tok

        def reassemble(pp, t):
            cat = torch.cat(
                [t[:, 1:], t[:, :1].expand(-1, t.shape[1] - 1, -1)], dim=-1)
            h = pp["0"].project(cat)
            h = h.transpose(1, 2).reshape(b, VIT_W, gh, gw)
            h = pp["3"](h)
            if "4" in pp:
                h = pp["4"](h)
            return h

        layer3 = reassemble(self.pretrained.act_postprocess3, hooks[0])
        layer4 = reassemble(self.pretrained.act_postprocess4, hooks[1])
        sc = self.scratch
        rn1, rn2 = sc.layer1_rn(layer1), sc.layer2_rn(layer2)
        rn3, rn4 = sc.layer3_rn(layer3), sc.layer4_rn(layer4)
        path = sc.refinenet4(rn4)
        path = sc.refinenet3(path, rn3)
        path = sc.refinenet2(path, rn2)
        path = sc.refinenet1(path, rn1)
        out = sc.output_conv["0"](path)
        out = F.interpolate(out, scale_factor=2, mode="bilinear",
                            align_corners=True)
        out = F.relu(sc.output_conv["2"](out))
        out = F.relu(sc.output_conv["4"](out))
        return out


@pytest.fixture(scope="module")
def twin():
    model = TorchDPT().eval()
    sd = {"depth_model.model." + k: v.detach().numpy()
          for k, v in model.state_dict().items()}
    tree, cfg = convert_dpt(sd)
    return model, tree, cfg


def test_convert_dpt_config(twin):
    _, _, cfg = twin
    assert cfg.image_size == IMG
    assert cfg.stage_blocks == (1, 1, 1)
    assert cfg.vit_width == VIT_W and cfg.vit_layers == VIT_L
    assert cfg.features == FEAT


def test_dpt_forward_parity(twin):
    model, tree, cfg = twin
    # hooks for the tiny 2-layer ViT
    import dataclasses
    cfg = dataclasses.replace(cfg, hooks=(0, 1), vit_heads=4)
    rng = np.random.default_rng(3)
    img = rng.uniform(-1, 1, (2, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    got = apply(tree, cfg, jnp.asarray(img))
    np.testing.assert_allclose(
        np.asarray(got)[..., 0], want.numpy()[:, 0], atol=2e-3, rtol=1e-3)


def test_depth_conditioning_range(twin):
    from sdwebui_tpu.models.midas import depth_conditioning

    import dataclasses
    model, tree, cfg = twin
    cfg = dataclasses.replace(cfg, hooks=(0, 1), vit_heads=4)
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (1, 48, 80, 3)).astype(np.float32)
    d = np.asarray(depth_conditioning(tree, cfg, jnp.asarray(img), 8, 8))
    assert d.shape == (1, 8, 8, 1)
    assert d.min() >= -1.0 - 1e-5 and d.max() <= 1.0 + 1e-5
    assert np.isclose(d.min(), -1.0, atol=1e-4)
    assert np.isclose(d.max(), 1.0, atol=1e-4)


# --------------------------------------------------------------------------
# end-to-end: tiny SD2-depth checkpoint
# --------------------------------------------------------------------------

def test_depth2img_end_to_end(twin):
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_unclip import _tiny_unclip_state_dict

    from sdwebui_tpu.loader import sniff
    from sdwebui_tpu.loader.load import model_from_state_dict
    from sdwebui_tpu.pipeline.img2img import process_img2img
    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.pipeline.processing import process_txt2img

    torch_model, _, _ = twin
    # reuse the tiny SD2 pieces, swap conditioning: 5ch UNet + depth tower
    # (drop the unclip adm head — SD2-depth has no label_emb)
    sd = {k: v for k, v in _tiny_unclip_state_dict().items()
          if not k.startswith(("embedder.", "noise_augmentor."))
          and "label_emb" not in k}
    w = sd["model.diffusion_model.input_blocks.0.0.weight"]  # (32,4,3,3)
    sd["model.diffusion_model.input_blocks.0.0.weight"] = np.concatenate(
        [w, np.random.default_rng(0).standard_normal(
            (w.shape[0], 1) + w.shape[2:]).astype(np.float32) * 0.02], axis=1)
    sd.update({"depth_model.model." + k: v.detach().numpy()
               for k, v in torch_model.state_dict().items()})

    info = sniff.sniff(sd)
    assert info.family == "sd2" and info.variant == "depth"
    assert info.in_channels == 5

    model = model_from_state_dict(sd, title="tiny-depth")
    assert model.is_depth and not model.is_unclip

    from PIL import Image
    init = Image.new("RGB", (64, 64), (90, 120, 200))
    res = process_img2img(
        model, GenerationParams(prompt="a cat", seed=5, steps=2, width=64,
                                height=64, denoising_strength=0.7,
                                init_images=[init]))
    assert res.images[0].size == (64, 64)

    # txt2img on a depth model: neutral zero depth conditioning
    res2 = process_txt2img(
        model, GenerationParams(prompt="a cat", seed=5, steps=2,
                                width=64, height=64))
    assert res2.images[0].size == (64, 64)

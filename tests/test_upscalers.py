"""ESRGAN port tests (incl. torch numeric parity) + preview decoders."""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from sdwebui_tpu.models import esrgan
from sdwebui_tpu.models.vae_approx import cheap_approximation, taesd_decode


def test_esrgan_shapes():
    params = esrgan.init_params(n_blocks=1, nf=16, gc=8)
    x = jnp.ones((1, 16, 16, 3))
    out = esrgan.apply(params, x, scale=4)
    assert out.shape == (1, 64, 64, 3)
    assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_esrgan_parity_vs_torch():
    """Full RRDBNet vs a torch reference implementation on the same weights."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    nf, gc = 8, 4

    class RDB(nn.Module):
        def __init__(self):
            super().__init__()
            for i in range(5):
                cout = gc if i < 4 else nf
                setattr(self, f"conv{i+1}", nn.Conv2d(nf + i * gc, cout, 3, 1, 1))

        def forward(self, x):
            x1 = F.leaky_relu(self.conv1(x), 0.2)
            x2 = F.leaky_relu(self.conv2(torch.cat([x, x1], 1)), 0.2)
            x3 = F.leaky_relu(self.conv3(torch.cat([x, x1, x2], 1)), 0.2)
            x4 = F.leaky_relu(self.conv4(torch.cat([x, x1, x2, x3], 1)), 0.2)
            x5 = self.conv5(torch.cat([x, x1, x2, x3, x4], 1))
            return x + 0.2 * x5

    class RRDBNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_first = nn.Conv2d(3, nf, 3, 1, 1)
            self.body = nn.ModuleList([nn.Module() for _ in range(1)])
            self.body[0].rdb1, self.body[0].rdb2, self.body[0].rdb3 = RDB(), RDB(), RDB()
            self.conv_body = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_up1 = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_up2 = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_hr = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_last = nn.Conv2d(nf, 3, 3, 1, 1)

    torch.manual_seed(0)
    net = RRDBNet().eval()

    # convert state dict → our tree
    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.utils.pytree import unflatten

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    tree = unflatten({k: convert_leaf(k, v) for k, v in sd.items()})

    rng = np.random.default_rng(0)
    x = rng.random((1, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(esrgan.apply(tree, jnp.asarray(x), scale=4))

    # torch forward replicating the full arch (RRDB residual + upsample)
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        fea = net.conv_first(xt)
        b = net.body[0]
        # RRDB: x + 0.2 * rdb3(rdb2(rdb1(x)))
        body = fea + 0.2 * b.rdb3(b.rdb2(b.rdb1(fea)))
        fea2 = fea + net.conv_body(body)
        up = F.leaky_relu(net.conv_up1(F.interpolate(fea2, scale_factor=2, mode="nearest")), 0.2)
        up = F.leaky_relu(net.conv_up2(F.interpolate(up, scale_factor=2, mode="nearest")), 0.2)
        ref = net.conv_last(F.leaky_relu(net.conv_hr(up), 0.2))
        ref = torch.clamp(ref, 0, 1).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_esrgan_old_key_translation():
    sd = {
        "model.0.weight": np.zeros((8, 3, 3, 3)),
        "model.1.sub.0.RDB1.conv1.0.weight": np.zeros((4, 8, 3, 3)),
        "model.1.sub.23.weight": np.zeros((8, 8, 3, 3)),
        "model.3.weight": np.zeros((8, 8, 3, 3)),
        "model.10.bias": np.zeros(3),
    }
    out = esrgan.normalize_keys(sd)
    assert "conv_first.weight" in out
    assert "body.0.rdb1.conv1.weight" in out
    assert "conv_body.weight" in out
    assert "conv_up1.weight" in out
    assert "conv_last.bias" in out


def test_tiled_upscale_matches_single(tmp_path):
    """Tiled inference ≈ single-pass on a small image (feathering tolerance)."""
    params = esrgan.init_params(n_blocks=1, nf=8, gc=4)
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    single = esrgan.upscale_image(params, img, 4, tile=256, overlap=8)
    tiled = esrgan.upscale_image(params, img, 4, tile=32, overlap=8)
    assert single.size == tiled.size == (256, 192)
    diff = np.abs(np.asarray(single, int) - np.asarray(tiled, int))
    # conv halo effects at seams only; overall should be close
    assert diff.mean() < 10


def test_cheap_approximation_shapes():
    lat = jnp.ones((2, 8, 8, 4))
    rgb = cheap_approximation(lat, "sd1")
    assert rgb.shape == (2, 8, 8, 3)
    rgb16 = cheap_approximation(jnp.ones((1, 8, 8, 16)), "sd3")
    assert rgb16.shape == (1, 8, 8, 3)


def test_taesd_decoder_shapes():
    """Synthetic TAESD-shaped params → 8x upsampling decode."""
    from sdwebui_tpu.models.init_utils import HostInit

    ini = HostInit(0)
    conv = lambda cin, cout: ini.conv(3, 3, cin, cout, jnp.float32)

    def block(c):
        return {"conv": {"0": conv(c, c), "2": conv(c, c), "4": conv(c, c)}}

    # sequential indices: 1 conv, 3/4/5 blocks, 7 conv(after up), 8/9/10,
    # 12, 13/14/15, 17, 18 block, 19 final conv
    params = {"1": conv(4, 16),
              "3": block(16), "4": block(16), "5": block(16), "7": conv(16, 16),
              "8": block(16), "9": block(16), "10": block(16), "12": conv(16, 16),
              "13": block(16), "14": block(16), "15": block(16), "17": conv(16, 16),
              "18": block(16), "19": conv(16, 3)}
    out = taesd_decode(params, jnp.ones((1, 8, 8, 4)))
    assert out.shape == (1, 64, 64, 3)


def test_upscale_cache(monkeypatch):
    """opts.upscaling_max_images_in_cache: repeated model upscales of the
    same image hit the cache (reference upscaler cache)."""
    from PIL import Image

    from sdwebui_tpu.postprocessing import upscalers as up

    calls = {"n": 0}

    def fake_fn(im, s):
        calls["n"] += 1
        return im.resize((im.width * 2, im.height * 2))

    up.register_upscaler("cache-test", fake_fn, default_scale=2)
    try:
        img = Image.new("RGB", (8, 8), (10, 20, 30))
        a = up.upscale("cache-test", img, 2.0)
        b = up.upscale("cache-test", img, 2.0)
        assert calls["n"] == 1
        assert a.size == b.size == (16, 16)
        monkeypatch.setitem(
            __import__("sdwebui_tpu.utils.options", fromlist=["opts"]).opts.data,
            "upscaling_max_images_in_cache", 0)
        up.upscale("cache-test", img, 2.0)
        assert calls["n"] == 2   # cache disabled
    finally:
        up._REGISTRY.pop("cache-test", None)
        up._UPSCALE_CACHE.clear()


def test_realesrgan_x2_pixel_unshuffle_parity():
    """RealESRGAN x2plus topology (12-ch conv_first after pixel_unshuffle(2),
    both upsample convs): net output is 2x, matches torch pixel_unshuffle +
    the same conv stack."""
    import torch
    import torch.nn.functional as F

    nf = 8
    torch.manual_seed(1)
    convs = {
        "conv_first": torch.nn.Conv2d(12, nf, 3, 1, 1),
        "conv_body": torch.nn.Conv2d(nf, nf, 3, 1, 1),
        "conv_up1": torch.nn.Conv2d(nf, nf, 3, 1, 1),
        "conv_up2": torch.nn.Conv2d(nf, nf, 3, 1, 1),
        "conv_hr": torch.nn.Conv2d(nf, nf, 3, 1, 1),
        "conv_last": torch.nn.Conv2d(nf, 3, 3, 1, 1),
    }
    # one trivial body block whose rdb convs are zero → body(x) == x
    zeros = {}
    for bi in ("rdb1", "rdb2", "rdb3"):
        for ci in range(1, 6):
            cout = 4 if ci < 5 else nf
            cin = nf + (ci - 1) * 4
            zeros[f"body.0.{bi}.conv{ci}.weight"] = np.zeros(
                (cout, cin, 3, 3), np.float32)
            zeros[f"body.0.{bi}.conv{ci}.bias"] = np.zeros((cout,), np.float32)

    sd = {k: v.weight.detach().numpy() for k, v in convs.items()}
    sd = {f"{k}.weight": v for k, v in sd.items()}
    sd.update({f"{k}.bias": v.bias.detach().numpy() for k, v in convs.items()})
    sd.update(zeros)

    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.utils.pytree import unflatten

    tree = unflatten({k: convert_leaf(k, np.asarray(v))
                      for k, v in sd.items()})
    rng = np.random.default_rng(1)
    x = rng.random((1, 6, 10, 3)).astype(np.float32)
    ours = np.asarray(esrgan.apply(tree, jnp.asarray(x), scale=2))
    assert ours.shape == (1, 12, 20, 3)

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        u = F.pixel_unshuffle(xt, 2)
        fea = convs["conv_first"](u)
        # zeroed rdbs: each rdb is identity, RRDB adds x + 0.2*chain(x)
        body = fea + 0.2 * fea
        fea = fea + convs["conv_body"](body)
        fea = F.leaky_relu(convs["conv_up1"](
            F.interpolate(fea, scale_factor=2, mode="nearest")), 0.2)
        fea = F.leaky_relu(convs["conv_up2"](
            F.interpolate(fea, scale_factor=2, mode="nearest")), 0.2)
        out = convs["conv_last"](F.leaky_relu(convs["conv_hr"](fea), 0.2))
        ref = np.clip(out.numpy(), 0, 1).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)

    # loader derives net scale 2 for the 12-channel variant
    # (4 from two upsamples, /2 from the unshuffle)
    from sdwebui_tpu.models.esrgan import load_esrgan  # noqa: F401


def test_srvgg_compact_parity():
    """SRVGGNetCompact (realesr-general-v3 family) vs a torch twin: conv+
    PReLU stack, pixel-shuffle upsampler, nearest input residual."""
    import torch
    import torch.nn.functional as F

    nf, num_conv, scale = 8, 2, 2
    torch.manual_seed(3)
    layers = [torch.nn.Conv2d(3, nf, 3, 1, 1), torch.nn.PReLU(nf)]
    for _ in range(num_conv):
        layers += [torch.nn.Conv2d(nf, nf, 3, 1, 1), torch.nn.PReLU(nf)]
    layers += [torch.nn.Conv2d(nf, 3 * scale * scale, 3, 1, 1)]
    body = torch.nn.Sequential(*layers).eval()

    sd = {f"body.{i}.{k}": v.detach().numpy()
          for i, m in enumerate(layers)
          for k, v in m.state_dict().items()}

    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.models.esrgan import (apply_srvgg, is_srvgg, load_srvgg)
    from sdwebui_tpu.utils.pytree import unflatten

    assert is_srvgg(sd)
    tree = unflatten({k: convert_leaf(k, np.asarray(v))
                      for k, v in sd.items()})

    rng = np.random.default_rng(3)
    x = rng.random((1, 6, 7, 3)).astype(np.float32)
    ours = np.asarray(apply_srvgg(tree, jnp.asarray(x), scale))
    assert ours.shape == (1, 12, 14, 3)

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        out = body(xt)
        out = F.pixel_shuffle(out, scale)
        out = out + F.interpolate(xt, scale_factor=scale, mode="nearest")
        ref = np.clip(out.numpy(), 0, 1).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)

    # loader round-trip derives scale from the final conv width
    import tempfile

    from sdwebui_tpu.loader.safetensors_io import write_safetensors

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/srvgg.safetensors"
        write_safetensors(path, {k: np.asarray(v) for k, v in sd.items()})
        params, s = load_srvgg(path)
        assert s == scale

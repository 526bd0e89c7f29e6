"""LDSR: checkpoint conversion, legacy attention, VQ quantize, 4x output."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from `-m 'not slow'` quick runs

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from sdwebui_tpu.models import ldsr
from sdwebui_tpu.models.configs import UNetConfig, VAEConfig


def _tiny_ldsr_sd(seed=0):
    """torch-layout state dict: LDM no-context UNet + f=4 VQ autoencoder."""
    rng = np.random.default_rng(seed)
    sd = {}

    def w(k, *shape, scale=0.05):
        sd[k] = (rng.standard_normal(shape) * scale).astype(np.float32)

    def conv(k, cin, cout, kk=3):
        w(k + ".weight", cout, cin, kk, kk)
        w(k + ".bias", cout, scale=0.01)

    def norm(k, c):
        sd[k + ".weight"] = np.ones(c, np.float32)
        sd[k + ".bias"] = np.zeros(c, np.float32)

    def lin(k, cin, cout):
        w(k + ".weight", cout, cin)
        w(k + ".bias", cout, scale=0.01)

    def resblock(pre, cin, cout, temb):
        norm(pre + ".in_layers.0", cin)
        conv(pre + ".in_layers.2", cin, cout)
        lin(pre + ".emb_layers.1", temb, cout)
        norm(pre + ".out_layers.0", cout)
        conv(pre + ".out_layers.3", cout, cout)
        if cin != cout:
            conv(pre + ".skip_connection", cin, cout, 1)

    def legacy_attn(pre, c):
        norm(pre + ".norm", c)
        w(pre + ".qkv.weight", 3 * c, c, 1)
        w(pre + ".qkv.bias", 3 * c, scale=0.01)
        w(pre + ".proj_out.weight", c, c, 1)
        w(pre + ".proj_out.bias", c, scale=0.01)

    mc, temb = 32, 64   # GroupNorm needs >=32 channels
    u = "model.diffusion_model."
    lin(u + "time_embed.0", mc, temb)
    lin(u + "time_embed.2", temb, temb)
    conv(u + "input_blocks.0.0", 6, mc)
    # level 0: res; downsample; level 1: res + legacy attn
    resblock(u + "input_blocks.1.0", mc, mc, temb)
    conv(u + "input_blocks.2.0.op", mc, mc)
    resblock(u + "input_blocks.3.0", mc, 2 * mc, temb)
    legacy_attn(u + "input_blocks.3.1", 2 * mc)
    # middle
    resblock(u + "middle_block.0", 2 * mc, 2 * mc, temb)
    legacy_attn(u + "middle_block.1", 2 * mc)
    resblock(u + "middle_block.2", 2 * mc, 2 * mc, temb)
    # output: level 1 (2 blocks w/ attn + upsample on last), level 0 (2)
    resblock(u + "output_blocks.0.0", 4 * mc, 2 * mc, temb)
    legacy_attn(u + "output_blocks.0.1", 2 * mc)
    resblock(u + "output_blocks.1.0", 3 * mc, 2 * mc, temb)
    legacy_attn(u + "output_blocks.1.1", 2 * mc)
    conv(u + "output_blocks.1.2.conv", 2 * mc, 2 * mc)
    resblock(u + "output_blocks.2.0", 3 * mc, mc, temb)
    resblock(u + "output_blocks.3.0", 2 * mc, mc, temb)
    norm(u + "out.0", mc)
    conv(u + "out.2", mc, 3)

    # f=4 VQ: 3 levels ch_mult (1,1,2) → two downsamples; z=3, codebook 32x3
    v = "first_stage_model."
    c0 = 32   # GroupNorm needs >=32 channels
    mults = (1, 1, 2)
    chans = [c0 * m for m in mults]
    conv(v + "encoder.conv_in", 3, c0)
    cin = c0
    for lvl, cout in enumerate(chans):
        pre = f"{v}encoder.down.{lvl}.block.0"
        norm(pre + ".norm1", cin); conv(pre + ".conv1", cin, cout)
        norm(pre + ".norm2", cout); conv(pre + ".conv2", cout, cout)
        if cin != cout:
            conv(pre + ".nin_shortcut", cin, cout, 1)
        if lvl < len(mults) - 1:
            conv(f"{v}encoder.down.{lvl}.downsample.conv", cout, cout)
        cin = cout
    top = chans[-1]
    for blk in ("block_1", "block_2"):
        pre = f"{v}encoder.mid.{blk}"
        norm(pre + ".norm1", top); conv(pre + ".conv1", top, top)
        norm(pre + ".norm2", top); conv(pre + ".conv2", top, top)
    norm(v + "encoder.mid.attn_1.norm", top)
    for nm in ("q", "k", "v", "proj_out"):
        conv(f"{v}encoder.mid.attn_1.{nm}", top, top, 1)
    norm(v + "encoder.norm_out", top)
    conv(v + "encoder.conv_out", top, 3)
    conv(v + "quant_conv", 3, 3, 1)
    w(v + "quantize.embedding.weight", 32, 3, scale=1.0)
    conv(v + "post_quant_conv", 3, 3, 1)
    conv(v + "decoder.conv_in", 3, top)
    for blk in ("block_1", "block_2"):
        pre = f"{v}decoder.mid.{blk}"
        norm(pre + ".norm1", top); conv(pre + ".conv1", top, top)
        norm(pre + ".norm2", top); conv(pre + ".conv2", top, top)
    norm(v + "decoder.mid.attn_1.norm", top)
    for nm in ("q", "k", "v", "proj_out"):
        conv(f"{v}decoder.mid.attn_1.{nm}", top, top, 1)
    cin = top
    for lvl in reversed(range(len(mults))):
        cout = chans[lvl]
        for i in range(2):   # num_res_blocks + 1
            pre = f"{v}decoder.up.{lvl}.block.{i}"
            norm(pre + ".norm1", cin); conv(pre + ".conv1", cin, cout)
            norm(pre + ".norm2", cout); conv(pre + ".conv2", cout, cout)
            if cin != cout:
                conv(pre + ".nin_shortcut", cin, cout, 1)
            cin = cout
        if lvl > 0:
            conv(f"{v}decoder.up.{lvl}.upsample.conv", cout, cout)
    norm(v + "decoder.norm_out", c0)
    conv(v + "decoder.conv_out", c0, 3)
    return sd


def test_vq_quantize_nearest():
    cb = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [-1.0, 2.0]])
    h = jnp.asarray([[[[0.1, -0.1], [0.9, 1.2]]]])
    q = np.asarray(ldsr.vq_quantize(h, cb))
    np.testing.assert_allclose(q[0, 0, 0], [0.0, 0.0])
    np.testing.assert_allclose(q[0, 0, 1], [1.0, 1.0])


def test_load_and_super_resolution(tmp_path):
    from sdwebui_tpu.loader.safetensors_io import write_safetensors

    sd = _tiny_ldsr_sd()
    p = str(tmp_path / "ldsr-tiny.safetensors")
    write_safetensors(p, sd)
    unet_p, vq_p, cfg = ldsr.load_ldsr(p)
    assert cfg.unet.in_channels == 6 and cfg.unet.out_channels == 3
    assert cfg.unet.attention_resolutions == (2,)
    assert cfg.vq.ch_mult == (1, 1, 2) and cfg.n_embed == 32

    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (24, 40, 3), np.uint8))
    out = ldsr.super_resolution(unet_p, vq_p, cfg, img, steps=3)
    assert out.size == (160, 96)    # 4x, padding cropped
    assert np.asarray(out).std() > 0.5

    # target_scale=2 downsamples the 4x result (reference behavior)
    out2 = ldsr.super_resolution(unet_p, vq_p, cfg, img, steps=3,
                                 target_scale=2)
    assert out2.size == (80, 48)


def test_register_ldsr_missing(tmp_path):
    assert ldsr.register_ldsr_dir((str(tmp_path / "nope"),)) == []


# ---------------------------------------------------------------------------
# reference oracles (VERDICT r2 item 4): the pieces of the reference's LDSR
# implementation that are complete in-image — the VQ quantizer
# (extensions-builtin/LDSR/vqvae_quantize.py, self-contained torch) and the
# integer-timestep DDIM trajectory (modules/sd_samplers_timesteps_impl.ddim,
# the reference's own ldm-convention DDIM: +1 uniform subsequence, final
# a_prev = alphas_cumprod[0]).  The ldm-cloned UNet/VQGAN classes are NOT
# in-image (git-clone deps), so their load paths stay covered by the
# synthetic-checkpoint round-trip above.
# ---------------------------------------------------------------------------

def test_vq_quantize_matches_reference_quantizer():
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location(
        "vqvae_quantize",
        "/root/reference/extensions-builtin/LDSR/vqvae_quantize.py")
    vq_ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vq_ref)

    rng = np.random.default_rng(3)
    n_embed, e_dim = 512, 3
    codebook = rng.standard_normal((n_embed, e_dim)).astype(np.float32)
    z = rng.standard_normal((2, 8, 8, e_dim)).astype(np.float32) * 1.7

    q = vq_ref.VectorQuantizer2(n_embed, e_dim, beta=0.25)
    with torch.no_grad():
        q.embedding.weight.copy_(torch.from_numpy(codebook))
        z_q, _, _ = q(torch.from_numpy(z).permute(0, 3, 1, 2))
    expected = z_q.permute(0, 2, 3, 1).numpy()

    got = np.asarray(ldsr.vq_quantize(jnp.asarray(z), jnp.asarray(codebook)))
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)


def test_ldsr_ddim_trajectory_matches_reference():
    """Our LDSR scan (concat-conditioned, eta=1, uniform +1 subsequence)
    against the reference's own integer-timestep DDIM with intercepted
    noise and the LDSR beta schedule.

    The in-image oracle (sd_samplers_timesteps_impl.ddim) runs
    len(timesteps)-1 updates — it never takes the final t=timesteps[0]
    step that ldm's DDIMSampler does — so the comparison drives our scan
    for steps-1 iterations; the final-step convention
    (a_prev -> alphas_cumprod[0]) is ldm's documented behavior and stays
    covered by the synthetic round-trip test."""
    import types

    import torch

    from tests import reference_oracle as ro

    impl = ro.load("modules.sd_samplers_timesteps_impl")

    cfg = ldsr.LDSRConfig(timesteps=1000)
    ac = ldsr.make_alphas(cfg)
    steps = 10
    ts = np.clip(np.arange(0, cfg.timesteps, cfg.timesteps // steps) + 1,
                 0, cfg.timesteps - 1)

    rng = np.random.default_rng(11)
    x0 = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    lr = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    noises = [rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
              for _ in range(steps)]

    # elementwise analytic eps (layout-agnostic across NCHW/NHWC)
    def eps_np(x, lr_, t):                     # t: (B,)
        return (np.sin(1.7 * x) * 0.9 + 0.3 * np.cos(2.1 * lr_)
                + 0.02 * t.reshape(-1, 1, 1, 1) / 1000.0)

    class _Chain:
        def __init__(self):
            inner2 = type("I2", (), {})()
            inner2.alphas_cumprod = torch.as_tensor(ac, dtype=torch.float32)
            inner = type("I1", (), {})()
            inner.inner_model = inner2
            self.inner_model = inner
            self.lr = torch.from_numpy(lr).permute(0, 3, 1, 2)

        def __call__(self, x, tsteps, **kw):
            t = tsteps.float().numpy()
            e = eps_np(x.numpy(), self.lr.numpy(),
                       np.broadcast_to(t, (x.shape[0],)))
            return torch.from_numpy(e.astype(np.float32))

    queue = [torch.from_numpy(
        np.transpose(n, (0, 3, 1, 2)).copy()) for n in noises]
    fake_torch = types.SimpleNamespace(randn_like=lambda x: queue.pop(0))
    orig = impl.k_diffusion.sampling.torch
    impl.k_diffusion.sampling.torch = fake_torch
    try:
        with torch.no_grad():
            x_t = torch.from_numpy(
                np.transpose(x0, (0, 3, 1, 2)).copy())
            ref = impl.ddim(_Chain(), x_t, torch.as_tensor(ts),
                            disable=True, eta=1.0).numpy()
    finally:
        impl.k_diffusion.sampling.torch = orig
    ref = np.transpose(ref, (0, 2, 3, 1))

    def eps_fn(x_in, tb):
        x, lr_ = x_in[..., :3], x_in[..., 3:]
        return (jnp.sin(1.7 * x) * 0.9 + 0.3 * jnp.cos(2.1 * lr_)
                + 0.02 * tb[:, None, None, None] / 1000.0)

    got = np.asarray(ldsr._ddim_sample(
        None, None, jnp.asarray(lr),
        jnp.asarray(np.stack(noises[:steps - 1])),
        jnp.asarray(x0), jnp.asarray(ac, jnp.float32),
        jnp.asarray(ts[::-1].copy(), jnp.int32), steps - 1, 1.0,
        eps_fn=eps_fn))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)

"""SD3 path: MMDiT forward, flow discretization, end-to-end generation,
checkpoint load/derive."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from `-m 'not slow'` quick runs

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdwebui_tpu.models import mmdit
from sdwebui_tpu.models.mmdit import MMDiTConfig
from sdwebui_tpu.pipeline.params import GenerationParams
from sdwebui_tpu.pipeline.processing import process_txt2img
from sdwebui_tpu.pipeline.sd_model import create_tiny_sd3
from sdwebui_tpu.sampling.discretization import FlowDiscretization


@pytest.fixture(scope="module")
def model():
    return create_tiny_sd3()


def test_flow_discretization():
    d = FlowDiscretization(shift=3.0)
    assert d.sigma_max == pytest.approx(1.0)
    # σ(t) = 3t/(1+2t): t=0.5 → 0.75
    assert d.sigmas[499] == pytest.approx(3 * 0.5 / (1 + 2 * 0.5), abs=1e-3)
    assert d.prediction_type == "flow"
    # noise scaling is a lerp
    out = d.noise_scaling(0.25, np.ones(3), np.zeros(3))
    np.testing.assert_allclose(out, 0.25)


def test_mmdit_forward_shapes():
    cfg = MMDiTConfig(depth=2, in_channels=16, context_dim=96, pooled_dim=96,
                      pos_embed_max_size=16)
    params = jax.device_put(mmdit.init_params(cfg, 0))
    x = jnp.ones((2, 8, 8, 16))
    t = jnp.array([500.0, 100.0])
    ctx = jnp.ones((2, 77, 96))
    y = jnp.ones((2, 96))
    out = mmdit.apply(params, cfg, x, t, ctx, y)
    assert out.shape == (2, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_mmdit_pos_embed_crop():
    pos = jnp.arange(16 * 16 * 4, dtype=jnp.float32).reshape(1, 256, 4)
    crop = mmdit.cropped_pos_embed(pos, 4, 4, 16)
    assert crop.shape == (1, 16, 4)
    # center crop: rows 6..10, cols 6..10
    grid = np.asarray(pos).reshape(16, 16, 4)
    np.testing.assert_array_equal(np.asarray(crop).reshape(4, 4, 4),
                                  grid[6:10, 6:10])


def test_sd3_txt2img_end_to_end(model):
    p = GenerationParams(prompt="a cat", negative_prompt="bad", seed=3,
                         steps=3, width=64, height=64, sampler_name="Euler")
    res = process_txt2img(model, p)
    assert len(res.images) == 1
    assert res.images[0].size == (64, 64)


def test_sd3_img2img(model):
    from PIL import Image

    from sdwebui_tpu.pipeline.img2img import process_img2img

    p = GenerationParams(prompt="a cat", seed=3, steps=3, width=64, height=64,
                         denoising_strength=0.6,
                         init_images=[Image.new("RGB", (64, 64), (90, 90, 90))])
    res = process_img2img(model, p)
    assert len(res.images) == 1


def test_sd3_checkpoint_load(tmp_path):
    """Inverse-convert a tiny SD3 tree into an sd3-named checkpoint and load."""
    from sdwebui_tpu.loader.load import load_model
    from sdwebui_tpu.loader.safetensors_io import write_safetensors
    from sdwebui_tpu.utils.pytree import flatten

    m = create_tiny_sd3(seed=5)

    def inverse(key, arr):
        arr = np.asarray(jax.device_get(arr))
        if not key.endswith(".weight"):
            return arr
        if arr.ndim == 4:
            return np.ascontiguousarray(np.transpose(arr, (3, 2, 0, 1)))
        if arr.ndim == 2 and not any(t in key for t in
                                     ("token_embedding", "position_embedding")):
            return np.ascontiguousarray(arr.T)
        return arr

    sd = {}
    for k, v in flatten(m.unet_params).items():
        sd["model.diffusion_model." + k] = inverse(k, v)
    for k, v in flatten(m.vae_params).items():
        sd["first_stage_model." + k] = inverse(k, v)
    for k, v in flatten(m.conditioner.params).items():
        sd["text_encoders.clip_l.transformer.text_model." + k] = inverse(k, v)
    # clip_g in open_clip layout
    flat_g = flatten(m.conditioner2.params)
    g = {}
    g["model.token_embedding.weight"] = np.asarray(flat_g["embeddings.token_embedding.weight"])
    g["model.positional_embedding"] = np.asarray(flat_g["embeddings.position_embedding.weight"])
    g["model.ln_final.weight"] = np.asarray(flat_g["final_layer_norm.weight"])
    g["model.ln_final.bias"] = np.asarray(flat_g["final_layer_norm.bias"])
    g["model.text_projection"] = np.asarray(flat_g["text_projection.weight"])
    for i in range(2):
        b = f"encoder.layers.{i}."
        o = f"model.transformer.resblocks.{i}."
        g[o + "attn.in_proj_weight"] = np.concatenate(
            [np.asarray(flat_g[b + f"self_attn.{n}_proj.weight"]).T for n in "qkv"], 0)
        g[o + "attn.in_proj_bias"] = np.concatenate(
            [np.asarray(flat_g[b + f"self_attn.{n}_proj.bias"]) for n in "qkv"], 0)
        g[o + "attn.out_proj.weight"] = np.asarray(flat_g[b + "self_attn.out_proj.weight"]).T
        g[o + "attn.out_proj.bias"] = np.asarray(flat_g[b + "self_attn.out_proj.bias"])
        g[o + "ln_1.weight"] = np.asarray(flat_g[b + "layer_norm1.weight"])
        g[o + "ln_1.bias"] = np.asarray(flat_g[b + "layer_norm1.bias"])
        g[o + "ln_2.weight"] = np.asarray(flat_g[b + "layer_norm2.weight"])
        g[o + "ln_2.bias"] = np.asarray(flat_g[b + "layer_norm2.bias"])
        g[o + "mlp.c_fc.weight"] = np.asarray(flat_g[b + "mlp.fc1.weight"]).T
        g[o + "mlp.c_fc.bias"] = np.asarray(flat_g[b + "mlp.fc1.bias"])
        g[o + "mlp.c_proj.weight"] = np.asarray(flat_g[b + "mlp.fc2.weight"]).T
        g[o + "mlp.c_proj.bias"] = np.asarray(flat_g[b + "mlp.fc2.bias"])
    sd.update({"text_encoders.clip_g." + k: v for k, v in g.items()})

    path = str(tmp_path / "sd3-tiny.safetensors")
    write_safetensors(path, sd)
    loaded = load_model(path)
    assert loaded.kind == "sd3"
    assert loaded.unet_cfg.depth == 2
    assert loaded.disc.prediction_type == "flow"
    assert loaded.vae_cfg.embed_dim == 16
    assert loaded.vae_cfg.shift_factor == pytest.approx(0.0609)

    res = process_txt2img(loaded, GenerationParams(
        prompt="x", seed=1, steps=2, width=64, height=64, sampler_name="Euler"))
    assert len(res.images) == 1


def test_mmdit_parity_with_torch_twin():
    """MMDiT forward vs an independently-written torch twin: adaLN
    modulation split order, joint ctx⊕x attention, gating, final layer,
    unpatchify — the SD3 core math."""
    import math

    import torch
    import torch.nn.functional as F

    from sdwebui_tpu.models import mmdit
    from sdwebui_tpu.utils.pytree import flatten as flat_tree

    cfg = mmdit.MMDiTConfig(depth=2, context_dim=32, patch_size=2,
                            in_channels=16, pos_embed_max_size=8,
                            pooled_dim=24)
    params = mmdit.init_params(cfg, seed=0)
    t = {k: torch.from_numpy(np.array(jax.device_get(v)))
         for k, v in flat_tree(params).items()}

    def lin(pre, x):
        w = t[pre + ".weight"]
        return F.linear(x, w.T if w.ndim == 2 else w, t.get(pre + ".bias"))

    def ln(x):
        return F.layer_norm(x, (x.shape[-1],), eps=1e-6)

    def mod(x, shift, scale):
        return x * (1 + scale[:, None]) + shift[:, None]

    heads = cfg.num_heads

    def pre_attn(pre, x, c, n_mods):
        mods = lin(pre + ".adaLN_modulation.1", F.silu(c)).chunk(n_mods, -1)
        h = mod(ln(x), mods[0], mods[1])
        q, k, v = lin(pre + ".attn.qkv", h).chunk(3, -1)
        return q, k, v, mods

    def mha(q, k, v):
        b, s, hd = q.shape
        d = hd // heads
        q = q.view(b, s, heads, d).transpose(1, 2)
        k = k.view(b, k.shape[1], heads, d).transpose(1, 2)
        v = v.view(b, v.shape[1], heads, d).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        return o.transpose(1, 2).reshape(b, s, hd)

    def post_attn(pre, a, x, mods):
        x = x + mods[2][:, None] * lin(pre + ".attn.proj", a)
        h = mod(ln(x), mods[3], mods[4])
        h = lin(pre + ".mlp.fc2",
                F.gelu(lin(pre + ".mlp.fc1", h), approximate="tanh"))
        return x + mods[5][:, None] * h

    def torch_forward(x_nhwc, tstep, ctx_np, y_np):
        x = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
        b = x.shape[0]
        ps = cfg.patch_size
        hp, wp = x.shape[2] // ps, x.shape[3] // ps
        w = t["x_embedder.proj.weight"].permute(3, 2, 0, 1)
        xp = F.conv2d(x, w, t["x_embedder.proj.bias"], stride=ps)
        xp = xp.flatten(2).transpose(1, 2)
        grid = t["pos_embed"].view(cfg.pos_embed_max_size,
                                   cfg.pos_embed_max_size, -1)
        top = (cfg.pos_embed_max_size - hp) // 2
        left = (cfg.pos_embed_max_size - wp) // 2
        xp = xp + grid[top:top + hp, left:left + wp].reshape(1, hp * wp, -1)

        half = 128
        freqs = torch.exp(-math.log(10000) * torch.arange(half) / half)
        args = tstep * freqs
        emb = torch.cat([torch.cos(args), torch.sin(args)])[None].float()
        c = lin("t_embedder.mlp.2", F.silu(lin("t_embedder.mlp.0", emb)))
        c = c + lin("y_embedder.mlp.2", F.silu(lin(
            "y_embedder.mlp.0", torch.from_numpy(y_np))))
        ctx = lin("context_embedder", torch.from_numpy(ctx_np))

        for i in range(cfg.depth):
            last = i == cfg.depth - 1
            pre = f"joint_blocks.{i}"
            cq, ck, cv, cmods = pre_attn(pre + ".context_block", ctx, c,
                                         2 if last else 6)
            xq, xk, xv, xmods = pre_attn(pre + ".x_block", xp, c, 6)
            sc = ctx.shape[1]
            o = mha(torch.cat([cq, xq], 1), torch.cat([ck, xk], 1),
                    torch.cat([cv, xv], 1))
            xp = post_attn(pre + ".x_block", o[:, sc:], xp, xmods)
            if not last:
                ctx = post_attn(pre + ".context_block", o[:, :sc], ctx, cmods)

        shift, scale = lin("final_layer.adaLN_modulation.1",
                           F.silu(c)).chunk(2, -1)
        out = lin("final_layer.linear", mod(ln(xp), shift, scale))
        out_ch = out.shape[-1] // (ps * ps)
        out = out.view(b, hp, wp, ps, ps, out_ch).permute(0, 1, 3, 2, 4, 5)
        return out.reshape(b, hp * ps, wp * ps, out_ch).numpy()

    x = np.random.default_rng(0).standard_normal((1, 8, 8, 16)).astype(np.float32)
    ctx = np.random.default_rng(1).standard_normal((1, 6, 32)).astype(np.float32)
    y = np.random.default_rng(2).standard_normal((1, 24)).astype(np.float32)
    with torch.no_grad():
        want = torch_forward(x, 537.0, ctx, y)
    got = np.asarray(mmdit.apply(params, cfg, jnp.asarray(x),
                                 jnp.asarray([537.0]), jnp.asarray(ctx),
                                 jnp.asarray(y)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

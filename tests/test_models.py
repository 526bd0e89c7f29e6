"""Model core tests: structural parity with ldm checkpoints + forward shapes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdwebui_tpu.models import clip, unet, vae
from sdwebui_tpu.models.configs import (
    CLIPTextConfig, SD15_UNET, SDXL_UNET, UNetConfig, VAEConfig,
)
from sdwebui_tpu.utils.pytree import flatten, unflatten

TINY_UNET = UNetConfig(model_channels=32, channel_mult=(1, 2),
                       attention_resolutions=(2, 1), transformer_depth=(1, 1),
                       context_dim=64, num_heads=4)
TINY_VAE = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
TINY_CLIP = CLIPTextConfig(vocab_size=128, width=64, layers=3, heads=4)


def test_sd15_plan_structure():
    """SD1.5 block layout matches the ldm checkpoint structure."""
    input_plan, middle_depth, output_plan, _ = unet.build_plan(SD15_UNET)
    assert len(input_plan) == 12 and len(output_plan) == 12
    kinds_in = [[l[0] for l in b] for b in input_plan]
    assert kinds_in[0] == ["conv_in"]
    for i in (1, 2, 4, 5, 7, 8):
        assert kinds_in[i] == ["res", "attn"], i
    for i in (3, 6, 9):
        assert kinds_in[i] == ["down"], i
    for i in (10, 11):
        assert kinds_in[i] == ["res"], i
    assert middle_depth == 1
    kinds_out = [[l[0] for l in b] for b in output_plan]
    assert kinds_out[2] == ["res", "up"]
    assert kinds_out[3] == ["res", "attn"]
    assert kinds_out[5] == ["res", "attn", "up"]
    assert kinds_out[11] == ["res", "attn"]


def test_sdxl_plan_structure():
    input_plan, middle_depth, output_plan, _ = unet.build_plan(SDXL_UNET)
    assert len(input_plan) == 9 and len(output_plan) == 9
    kinds_in = [[l[0] for l in b] for b in input_plan]
    # level0 (ds1): no attention; level1 (ds2): depth-2; level2 (ds4): depth-10
    assert kinds_in[1] == ["res"] and kinds_in[4] == ["res", "attn"]
    assert input_plan[7][1][2] == 10  # depth at level 2
    assert middle_depth == 10


def test_unet_param_keys_match_ldm_names():
    """Sentinel state-dict keys exist in the generated tree (SD1.5 layout,
    tiny channels — names depend only on structure)."""
    cfg = dataclasses.replace(SD15_UNET, model_channels=32, context_dim=64)
    params = unet.init_params(cfg, jax.random.PRNGKey(0))
    keys = set(flatten(params).keys())
    for sentinel in [
        "time_embed.0.weight",
        "input_blocks.0.0.weight",
        "input_blocks.1.0.in_layers.2.weight",
        "input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight",
        "input_blocks.3.0.op.weight",
        "input_blocks.4.0.skip_connection.weight",
        "middle_block.1.transformer_blocks.0.ff.net.0.proj.weight",
        "output_blocks.2.1.conv.weight",
        "output_blocks.11.1.proj_out.weight",
        "out.2.bias",
    ]:
        assert sentinel in keys, sentinel


def test_vae_param_keys_match_ldm_names():
    params = vae.init_params(VAEConfig(), jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    keys = set(flatten(params).keys())
    for sentinel in [
        "encoder.conv_in.weight",
        "encoder.down.0.block.0.norm1.weight",
        "encoder.down.0.downsample.conv.weight",
        "encoder.mid.attn_1.q.weight",
        "decoder.up.3.upsample.conv.weight",
        "decoder.up.0.block.2.conv2.weight",
        "quant_conv.weight",
        "post_quant_conv.bias",
    ]:
        assert sentinel in keys, sentinel
    assert "decoder.up.0.upsample" not in {k.rsplit(".", 2)[0] for k in keys}


def test_unet_forward_shapes_and_jit():
    params = unet.init_params(TINY_UNET, jax.random.PRNGKey(0), dtype=jnp.float32)
    x = jnp.ones((2, 16, 16, 4), jnp.float32)
    t = jnp.array([3.0, 4.0])
    ctx = jnp.ones((2, 77, 64), jnp.float32)
    fn = jax.jit(lambda p, x, t, c: unet.apply(p, TINY_UNET, x, t, c))
    out = fn(params, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_adm_vector_cond():
    cfg = dataclasses.replace(TINY_UNET, adm_in_channels=16,
                              use_linear_in_transformer=True)
    params = unet.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    x = jnp.ones((1, 16, 16, 4))
    out = unet.apply(params, cfg, x, jnp.array([1.0]),
                     jnp.ones((1, 77, 64)), y=jnp.ones((1, 16)))
    assert out.shape == (1, 16, 16, 4)
    with pytest.raises(AssertionError):
        unet.apply(params, cfg, x, jnp.array([1.0]), jnp.ones((1, 77, 64)))


def test_unet_control_injection():
    params = unet.init_params(TINY_UNET, jax.random.PRNGKey(0), dtype=jnp.float32)
    x = jnp.ones((1, 16, 16, 4))
    t = jnp.array([1.0])
    ctx = jnp.ones((1, 77, 64))
    base = unet.apply(params, TINY_UNET, x, t, ctx)
    input_plan, _, _, input_chs = unet.build_plan(TINY_UNET)
    control = {
        "input": [jnp.zeros((1, 16 // (2 ** min(i // 3, 1)), 16 // (2 ** min(i // 3, 1)), c))
                  for i, c in enumerate(input_chs)],
        "middle": jnp.zeros((1, 8, 8, 64)),
    }
    # zero-residual control must be a no-op
    same = unet.apply(params, TINY_UNET, x, t, ctx, control=control)
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), atol=1e-6)


def test_vae_roundtrip_shapes():
    params = vae.init_params(TINY_VAE, jax.random.PRNGKey(0))
    x = jnp.ones((1, 32, 32, 3))
    moments = vae.encode_moments(params, TINY_VAE, x)
    assert moments.shape == (1, 16, 16, 8)  # one downsample in tiny cfg
    z = vae.sample_latent(moments, jnp.zeros((1, 16, 16, 4)), TINY_VAE)
    assert z.shape == (1, 16, 16, 4)
    zm = vae.encode_mode(moments, TINY_VAE)
    np.testing.assert_allclose(np.asarray(z), np.asarray(zm), atol=1e-6)
    img = vae.decode(params, TINY_VAE, z)
    assert img.shape == (1, 32, 32, 3)


def test_full_vae_shapes_512():
    """Full SD VAE: 512² image ↔ 64² latent, 8× factor."""
    params = vae.init_params(VAEConfig(), jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    x = jnp.ones((1, 64, 64, 3), jnp.bfloat16)  # small spatial, full channels
    m = vae.encode_moments(params, VAEConfig(), x)
    assert m.shape == (1, 8, 8, 8)
    img = vae.decode(params, VAEConfig(), vae.encode_mode(m, VAEConfig()))
    assert img.shape == (1, 64, 64, 3)


def test_clip_encode_shapes_and_skip():
    params = clip.init_params(TINY_CLIP, jax.random.PRNGKey(0))
    tokens = jnp.full((2, 77), 5, jnp.int32).at[:, 0].set(1).at[:, -1].set(127)
    h0, pooled = clip.encode(params, TINY_CLIP, tokens)
    assert h0.shape == (2, 77, 64) and pooled.shape == (2, 64)
    h1, _ = clip.encode(params, TINY_CLIP, tokens, stop_at_layer=1)
    assert not np.allclose(np.asarray(h0), np.asarray(h1))
    # no-final-norm variant (SDXL CLIP-L branch)
    h2, _ = clip.encode(params, TINY_CLIP, tokens, stop_at_layer=1,
                        apply_final_norm=False)
    assert not np.allclose(np.asarray(h1), np.asarray(h2))


def test_clip_pooled_uses_eot_position():
    params = clip.init_params(TINY_CLIP, jax.random.PRNGKey(0))
    t1 = jnp.full((1, 77), 5, jnp.int32).at[0, 10].set(127)
    t2 = jnp.full((1, 77), 5, jnp.int32).at[0, 60].set(127)
    _, p1 = clip.encode(params, TINY_CLIP, t1)
    _, p2 = clip.encode(params, TINY_CLIP, t2)
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": 1, "c": {"d": 2}}, "e": 3}
    flat = flatten(tree)
    assert flat == {"a.b": 1, "a.c.d": 2, "e": 3}
    assert unflatten(flat) == tree


def test_hypertile_self_attention():
    """Hypertile: tiled self-attn must equal full attention when tokens
    don't interact across tiles (block-diagonal check) and must change the
    output in general (it's an approximation, not a refactor)."""
    from sdwebui_tpu.models import unet as unet_model
    from sdwebui_tpu.models.unet import init_params

    cfg = dataclasses.replace(TINY_UNET, hypertile_tile=4)
    params = init_params(TINY_UNET, 0, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 16, 4)),
                    jnp.float32)
    t = jnp.asarray([3.0])
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal((1, 7, 64)),
                      jnp.float32)
    full = np.asarray(unet_model.apply(params, TINY_UNET, x, t, ctx))
    tiled = np.asarray(unet_model.apply(params, cfg, x, t, ctx))
    assert full.shape == tiled.shape
    assert np.isfinite(tiled).all()
    assert not np.allclose(full, tiled, atol=1e-5)   # attention scope shrank


def test_hypertile_split_factor():
    from sdwebui_tpu.models.unet import _split_factor

    assert _split_factor(64, 32) == 2
    assert _split_factor(64, 64) == 1
    assert _split_factor(64, 20) == 4   # 64/4=16 ≤ 20; 64/3 not integer
    assert _split_factor(17, 4) == 17   # prime: degenerates to per-token


def test_unet_parity_with_torch_twin():
    """Full tiny-UNet forward vs an independently-written torch LDM UNet
    (timestep embedding order, resblock wiring, skip-concat order, GEGLU
    halves, attention projections — the places a port silently diverges).
    Twin lives in tests/torch_twin_unet.py (shared with the e2e sampling
    golden)."""
    import sys
    from pathlib import Path

    import torch

    sys.path.insert(0, str(Path(__file__).parent))
    from torch_twin_unet import make_torch_unet

    from sdwebui_tpu.models.unet import apply as unet_apply
    from sdwebui_tpu.models.unet import init_params

    cfg = TINY_UNET
    params = init_params(cfg, 0, dtype=jnp.float32)
    torch_forward = make_torch_unet(cfg, params)

    x = np.random.default_rng(0).standard_normal((1, 16, 16, 4)).astype(np.float32)
    ctx = np.random.default_rng(1).standard_normal((1, 7, 64)).astype(np.float32)
    with torch.no_grad():
        want = torch_forward(x, 37.0, ctx)
    got = np.asarray(unet_apply(params, cfg, jnp.asarray(x),
                                jnp.asarray([37.0]), jnp.asarray(ctx)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_vae_decode_parity_with_torch_twin():
    """VAE decoder vs an independent torch twin (mid attention, asymmetric
    encode downsample handled elsewhere; this pins the decode path)."""
    import torch
    import torch.nn.functional as F

    from sdwebui_tpu.models import vae as vae_model
    from sdwebui_tpu.utils.pytree import flatten as flat_tree

    cfg = TINY_VAE
    params = vae_model.init_params(cfg, 3)
    t = {k: torch.from_numpy(np.array(jax.device_get(v)))
         for k, v in flat_tree(params).items()}

    def W(key):
        w = t[key]
        return w.permute(3, 2, 0, 1) if w.ndim == 4 else w

    def conv(pre, x, padding=1):
        return F.conv2d(x, W(pre + ".weight"), t[pre + ".bias"],
                        padding=padding)

    def gn(pre, x):
        return F.group_norm(x, 32 if x.shape[1] >= 32 else x.shape[1] // 4,
                            t[pre + ".weight"], t[pre + ".bias"], eps=1e-6)

    def res(pre, x):
        h = conv(pre + ".conv1", F.silu(gn(pre + ".norm1", x)))
        h = conv(pre + ".conv2", F.silu(gn(pre + ".norm2", h)))
        if (pre + ".nin_shortcut.weight") in t:
            x = conv(pre + ".nin_shortcut", x, padding=0)
        return x + h

    def attn(pre, x):
        b, c, hh, ww = x.shape
        h = gn(pre + ".norm", x)
        q = conv(pre + ".q", h, padding=0).flatten(2).transpose(1, 2)
        k = conv(pre + ".k", h, padding=0).flatten(2).transpose(1, 2)
        v = conv(pre + ".v", h, padding=0).flatten(2).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).view(b, c, hh, ww)
        return x + conv(pre + ".proj_out", o, padding=0)

    def torch_decode(z_nhwc):
        z = torch.from_numpy(z_nhwc).permute(0, 3, 1, 2)
        z = z / cfg.scale_factor + cfg.shift_factor
        h = conv("post_quant_conv", z, padding=0)
        h = conv("decoder.conv_in", h)
        h = res("decoder.mid.block_1", h)
        h = attn("decoder.mid.attn_1", h)
        h = res("decoder.mid.block_2", h)
        for lvl in reversed(range(len(cfg.ch_mult))):
            for i in range(cfg.num_res_blocks + 1):
                h = res(f"decoder.up.{lvl}.block.{i}", h)
            if lvl > 0:
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = conv(f"decoder.up.{lvl}.upsample.conv", h)
        h = conv("decoder.conv_out", F.silu(gn("decoder.norm_out", h)))
        return h.permute(0, 2, 3, 1).numpy()

    z = np.random.default_rng(4).standard_normal((1, 8, 8, cfg.embed_dim)) \
        .astype(np.float32)
    with torch.no_grad():
        want = torch_decode(z)
    got = np.asarray(vae_model.decode(params, cfg, jnp.asarray(z)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_ssd_pruned_unet_forward():
    """SSD-1B-style pruning (reference convert_sdxl_to_ssd,
    modules/sd_hijack.py:191): per-block transformer depths shrink and the
    middle block loses its attn + second res — depths are read from the
    params, so the pruned tree runs without config surgery."""
    import copy

    import jax.numpy as jnp
    import numpy as np

    from sdwebui_tpu.models import unet as unet_model
    from sdwebui_tpu.models.configs import UNetConfig

    cfg = UNetConfig(model_channels=32, channel_mult=(1, 2),
                     attention_resolutions=(2,), transformer_depth=(0, 3),
                     context_dim=64, num_heads=4,
                     use_linear_in_transformer=True)
    params = unet_model.init_params(cfg, 0, dtype=jnp.float32)

    pruned = copy.deepcopy(params)
    # shrink one input block's transformer depth 3 → 1
    for name, tree in pruned["input_blocks"].items():
        if "1" in tree and "transformer_blocks" in tree.get("1", {}):
            tb = tree["1"]["transformer_blocks"]
            for k in list(tb):
                if k != "0":
                    del tb[k]
            break
    # SSD middle: only the first resblock remains
    del pruned["middle_block"]["1"]
    del pruned["middle_block"]["2"]

    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(np.random.RandomState(1).randn(1, 77, 64), jnp.float32)
    full = unet_model.apply(params, cfg, x, t, ctx)
    cut = unet_model.apply(pruned, cfg, x, t, ctx)
    assert cut.shape == full.shape
    assert np.all(np.isfinite(np.asarray(cut)))
    assert not np.allclose(np.asarray(cut), np.asarray(full))

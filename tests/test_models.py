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

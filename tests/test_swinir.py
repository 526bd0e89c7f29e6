"""SwinIR upscaler: window helpers, config derivation, forward, tiling."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from `-m 'not slow'` quick runs

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from sdwebui_tpu.models import swinir
from sdwebui_tpu.models.swinir import (
    SwinIRConfig, apply, convert_swinir, derive_swinir_config, init_params,
    relative_position_index, shift_attn_mask, upscale_image,
    _window_partition, _window_reverse,
)

TINY = SwinIRConfig(embed_dim=12, depths=(2, 2), num_heads=(2, 2),
                    window_size=4, mlp_ratio=2.0, upsampler="nearest+conv",
                    scale=4)


def test_window_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 12, 5)),
                    jnp.float32)
    w = _window_partition(x, 4)
    assert w.shape == (2 * 2 * 3, 16, 5)
    back = _window_reverse(w, 4, 2, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_bruteforce():
    w = 3
    idx = relative_position_index(w)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < (2 * w - 1) ** 2
    # brute force: bias index must be a bijection of the 2D offset
    coords = [(i, j) for i in range(w) for j in range(w)]
    seen = {}
    for a, (ia, ja) in enumerate(coords):
        for b, (ib, jb) in enumerate(coords):
            off = (ia - ib, ja - jb)
            if off in seen:
                assert seen[off] == idx[a, b]
            seen[off] = idx[a, b]
    assert len(set(seen.values())) == (2 * w - 1) ** 2


def test_shift_mask_blocks_cross_region():
    m = shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    # within the untouched top-left window everything attends freely
    np.testing.assert_array_equal(m[0], 0.0)
    # the wrapped bottom-right window mixes 4 regions → masked pairs exist
    assert (m[-1] == -100.0).any()
    # mask is symmetric in its -inf pattern
    np.testing.assert_array_equal((m[-1] != 0), (m[-1] != 0).T)


def test_derive_config_and_convert():
    """Round-trip: torch-layout state dict → config + tree."""
    rng = np.random.default_rng(0)
    e, heads, win = 12, 2, 4
    sd = {}

    def conv(k, cin, cout):
        sd[k + ".weight"] = rng.standard_normal((cout, cin, 3, 3), np.float32)
        sd[k + ".bias"] = np.zeros((cout,), np.float32)

    def lin(k, cin, cout):
        sd[k + ".weight"] = rng.standard_normal((cout, cin), np.float32)
        sd[k + ".bias"] = np.zeros((cout,), np.float32)

    def norm(k, c):
        sd[k + ".weight"] = np.ones((c,), np.float32)
        sd[k + ".bias"] = np.zeros((c,), np.float32)

    conv("conv_first", 3, e)
    norm("patch_embed.norm", e)
    for i in range(2):
        for j in range(2):
            pre = f"layers.{i}.residual_group.blocks.{j}"
            norm(pre + ".norm1", e)
            norm(pre + ".norm2", e)
            lin(pre + ".attn.qkv", e, 3 * e)
            lin(pre + ".attn.proj", e, e)
            sd[pre + ".attn.relative_position_bias_table"] = \
                rng.standard_normal(((2 * win - 1) ** 2, heads), np.float32)
            sd[pre + ".attn.relative_position_index"] = \
                np.zeros((win * win, win * win), np.int64)   # dropped buffer
            lin(pre + ".mlp.fc1", e, 2 * e)
            lin(pre + ".mlp.fc2", 2 * e, e)
        conv(f"layers.{i}.conv", e, e)
    norm("norm", e)
    conv("conv_after_body", e, e)
    conv("conv_before_upsample.0", e, 8)
    conv("conv_up1", 8, 8)
    conv("conv_up2", 8, 8)
    conv("conv_hr", 8, 8)
    conv("conv_last", 8, 3)

    tree, cfg = convert_swinir(sd)
    assert cfg == SwinIRConfig(embed_dim=12, depths=(2, 2), num_heads=(2, 2),
                               window_size=4, mlp_ratio=2.0,
                               upsampler="nearest+conv", scale=4)
    # layouts converted: conv OIHW→HWIO, linear (O,I)→(I,O)
    assert tree["conv_first"]["weight"].shape == (3, 3, 3, 12)
    q = tree["layers"]["0"]["residual_group"]["blocks"]["0"]["attn"]["qkv"]
    assert q["weight"].shape == (12, 36)
    assert "relative_position_index" not in \
        tree["layers"]["0"]["residual_group"]["blocks"]["0"]["attn"]
    out = apply(tree, cfg, jnp.full((1, 8, 8, 3), 0.5))
    assert out.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_forward_shapes_and_determinism():
    params = init_params(TINY, seed=1)
    x = jnp.asarray(np.random.default_rng(2).random((2, 8, 8, 3)), jnp.float32)
    a = np.asarray(apply(params, TINY, x))
    b = np.asarray(apply(params, TINY, x))
    assert a.shape == (2, 32, 32, 3)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0.0 and a.max() <= 1.0


def test_shift_changes_output():
    """Depth-2 layers include one shifted block; rolling the input must NOT
    equal rolling the output (attention crosses window boundaries)."""
    params = init_params(TINY, seed=3)
    x = jnp.asarray(np.random.default_rng(4).random((1, 16, 16, 3)), jnp.float32)
    y = np.asarray(apply(params, TINY, x))
    x_roll = jnp.roll(x, 4, axis=1)
    y_roll = np.asarray(apply(params, TINY, x_roll))
    assert not np.allclose(np.roll(y, 16, axis=1), y_roll, atol=1e-4)


def test_pixelshuffle_matches_torch():
    import torch

    x = np.random.default_rng(5).standard_normal((1, 8, 4, 4)).astype(np.float32)
    want = torch.pixel_shuffle(torch.from_numpy(x), 2).numpy()  # NCHW
    got = np.asarray(swinir._pixel_shuffle(
        jnp.asarray(x.transpose(0, 2, 3, 1)), 2)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_upscale_image_tiled_and_padding():
    params = init_params(TINY, seed=6)
    img = Image.fromarray(
        np.random.default_rng(7).integers(0, 255, (21, 30, 3), np.uint8))
    out = upscale_image(params, TINY, img, tile=16, overlap=4)
    assert out.size == (120, 84)   # non-multiple-of-window input padded


def test_register_swinir_dir(tmp_path):
    # no dir → no registration, no crash
    assert swinir.register_swinir_dir((str(tmp_path / "missing"),)) == []


def test_3conv_residual_connection():
    """SwinIR-L (the webui's default SwinIR download) uses '3conv'
    bottleneck residual connections: layers.i.conv.{0,2,4} + same for
    conv_after_body."""
    rng = np.random.default_rng(8)
    e, heads, win = 12, 2, 4
    sd = {}

    def conv(k, cin, cout, kk=3):
        sd[k + ".weight"] = rng.standard_normal((cout, cin, kk, kk), np.float32)
        sd[k + ".bias"] = np.zeros((cout,), np.float32)

    def lin(k, cin, cout):
        sd[k + ".weight"] = rng.standard_normal((cout, cin), np.float32)
        sd[k + ".bias"] = np.zeros((cout,), np.float32)

    def norm(k, c):
        sd[k + ".weight"] = np.ones((c,), np.float32)
        sd[k + ".bias"] = np.zeros((c,), np.float32)

    def conv3(k, dim):
        conv(k + ".0", dim, dim // 4, 3)
        conv(k + ".2", dim // 4, dim // 4, 1)
        conv(k + ".4", dim // 4, dim, 3)

    conv("conv_first", 3, e)
    norm("patch_embed.norm", e)
    for j in range(2):
        pre = f"layers.0.residual_group.blocks.{j}"
        norm(pre + ".norm1", e); norm(pre + ".norm2", e)
        lin(pre + ".attn.qkv", e, 3 * e); lin(pre + ".attn.proj", e, e)
        sd[pre + ".attn.relative_position_bias_table"] = \
            rng.standard_normal(((2 * win - 1) ** 2, heads), np.float32)
        lin(pre + ".mlp.fc1", e, 2 * e); lin(pre + ".mlp.fc2", 2 * e, e)
    conv3("layers.0.conv", e)
    norm("norm", e)
    conv3("conv_after_body", e)
    conv("conv_before_upsample.0", e, 8)
    conv("conv_up1", 8, 8); conv("conv_up2", 8, 8)
    conv("conv_hr", 8, 8); conv("conv_last", 8, 3)

    tree, cfg = convert_swinir(sd)
    assert cfg.upsampler == "nearest+conv" and cfg.scale == 4
    out = apply(tree, cfg, jnp.full((1, 8, 8, 3), 0.5))
    assert out.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))

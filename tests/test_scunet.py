"""SCUNet denoiser: forward shapes, conversion, transpose-conv equivalence."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from `-m 'not slow'` quick runs

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from sdwebui_tpu.models import scunet
from sdwebui_tpu.models.scunet import (SCUNetConfig, apply, convert_scunet,
                                       denoise_image, derive_scunet_config,
                                       init_params, _conv_transpose_2x)

TINY = SCUNetConfig(dim=16, config=(1, 1, 1, 1, 1, 1, 1), head_dim=4,
                    window_size=4)


def test_conv_transpose_matches_torch():
    import torch

    x = np.random.default_rng(0).standard_normal((1, 6, 5, 7)).astype(np.float32)
    w = np.random.default_rng(1).standard_normal((6, 4, 2, 2)).astype(np.float32)
    want = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2).numpy()
    got = np.asarray(_conv_transpose_2x(
        {"weight": jnp.asarray(w)},
        jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_forward_shape_and_determinism():
    params = init_params(TINY, seed=0)
    x = jnp.asarray(np.random.default_rng(1).random((1, 64, 64, 3)), jnp.float32)
    a = np.asarray(apply(params, TINY, x))
    assert a.shape == (1, 64, 64, 3)
    assert np.isfinite(a).all() and a.min() >= 0 and a.max() <= 1
    np.testing.assert_array_equal(a, np.asarray(apply(params, TINY, x)))


def test_derive_config_and_convert_torch_layout():
    rng = np.random.default_rng(2)
    d, hd, w = 16, 4, 4
    sd = {}
    # fan-in-ish scale: std-1 weights through 7 residual blocks overflow
    # f32 in the window-attention softmax (exp of ~1e3 logits) — the NaNs
    # that produced were numerics of the synthetic checkpoint, not the
    # conversion under test
    scale = 0.05

    def conv(k, ci, co, kk=3, bias=False):
        sd[k + ".weight"] = scale * rng.standard_normal(
            (co, ci, kk, kk), np.float32)
        if bias:
            sd[k + ".bias"] = np.zeros((co,), np.float32)

    def lin(k, ci, co):
        sd[k + ".weight"] = scale * rng.standard_normal((co, ci), np.float32)
        sd[k + ".bias"] = np.zeros((co,), np.float32)

    def ctb(pre, dim):
        half = dim // 2
        heads = half // hd
        conv(pre + ".conv1_1", dim, dim, 1, bias=True)
        conv(pre + ".conv1_2", dim, dim, 1, bias=True)
        conv(pre + ".conv_block.0", half, half)
        conv(pre + ".conv_block.2", half, half)
        for ln in (".trans_block.ln1", ".trans_block.ln2"):
            sd[pre + ln + ".weight"] = np.ones((half,), np.float32)
            sd[pre + ln + ".bias"] = np.zeros((half,), np.float32)
        lin(pre + ".trans_block.msa.embedding_layer", half, 3 * half)
        lin(pre + ".trans_block.msa.linear", half, half)
        sd[pre + ".trans_block.msa.relative_position_params"] = \
            rng.standard_normal((heads, 2 * w - 1, 2 * w - 1), np.float32)
        lin(pre + ".trans_block.mlp.0", half, 4 * half)
        lin(pre + ".trans_block.mlp.2", 4 * half, half)

    conv("m_head.0", 3, d)
    ctb("m_down1.0", d); conv("m_down1.1", d, 2 * d, 2)
    ctb("m_down2.0", 2 * d); conv("m_down2.1", 2 * d, 4 * d, 2)
    ctb("m_down3.0", 4 * d); conv("m_down3.1", 4 * d, 8 * d, 2)
    ctb("m_body.0", 8 * d)
    sd["m_up3.0.weight"] = rng.standard_normal((8 * d, 4 * d, 2, 2), np.float32)
    ctb("m_up3.1", 4 * d)
    sd["m_up2.0.weight"] = rng.standard_normal((4 * d, 2 * d, 2, 2), np.float32)
    ctb("m_up2.1", 2 * d)
    sd["m_up1.0.weight"] = rng.standard_normal((2 * d, d, 2, 2), np.float32)
    ctb("m_up1.1", d)
    conv("m_tail.0", d, 3)

    tree, cfg = convert_scunet(sd)
    assert cfg == TINY
    # ConvTranspose weights untouched (Cin, Cout, k, k)
    assert tree["m_up3"]["0"]["weight"].shape == (8 * d, 4 * d, 2, 2)
    # normal convs converted to HWIO
    assert tree["m_head"]["0"]["weight"].shape == (3, 3, 3, d)
    out = apply(tree, cfg, jnp.full((1, 64, 64, 3), 0.4, jnp.float32))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_flat_relative_position_params_reshaped():
    """KAIR checkpoints may store the bias flat ((2w-1)², heads)."""
    rng = np.random.default_rng(3)
    flat = rng.standard_normal((49, 2), np.float32)   # w=4, 2 heads
    sd = {"m_head.0.weight": rng.standard_normal((16, 3, 3, 3), np.float32),
          "m_down1.0.conv1_1.weight": rng.standard_normal((16, 16, 1, 1), np.float32),
          "m_down1.0.trans_block.msa.relative_position_params": flat}
    cfg = derive_scunet_config(sd)
    assert cfg.window_size == 4 and cfg.head_dim == 4


def test_denoise_image_tiled():
    params = init_params(TINY, seed=4)
    img = Image.fromarray(
        np.random.default_rng(5).integers(0, 255, (70, 90, 3), np.uint8))
    out = denoise_image(params, TINY, img, tile=64, overlap=8)
    assert out.size == img.size     # scale 1


def test_register_scunet_dir_missing(tmp_path):
    assert scunet.register_scunet_dir((str(tmp_path / "nope"),)) == []

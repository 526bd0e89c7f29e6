"""Per-kernel unit tests vs jnp references (SURVEY.md §4 'implication')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdwebui_tpu.ops.attention import xla_attention
from sdwebui_tpu.ops.flash_attention import flash_attention
from sdwebui_tpu.ops.norms import group_norm, layer_norm
from sdwebui_tpu.ops import attention


def _ref_attention(q, k, v):
    d = q.shape[-1]
    s = np.einsum("bqd,bkd->bqk", q, k) / np.sqrt(d)
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)
    return np.einsum("bqk,bkd->bqd", p, v)


@pytest.mark.parametrize("bh,sq,skv,d", [
    (2, 64, 64, 40),     # SD1.5 self-attn head geometry (tiny seq)
    (2, 64, 77, 40),     # cross-attn with 77-token conds (kv padding mask)
    (1, 128, 128, 512),  # VAE mid-block single head
    (3, 100, 33, 64),    # ragged: q pad + kv pad
])
def test_flash_matches_reference(bh, sq, skv, d):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((bh, sq, d), dtype=np.float32)
    k = rng.standard_normal((bh, skv, d), dtype=np.float32)
    v = rng.standard_normal((bh, skv, d), dtype=np.float32)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          block_q=64, block_kv=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref_attention(q, k, v),
                               rtol=2e-5, atol=2e-5)


def test_flash_bf16():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((2, 64, 40), dtype=np.float32)
    k = rng.standard_normal((2, 77, 40), dtype=np.float32)
    v = rng.standard_normal((2, 77, 40), dtype=np.float32)
    out = flash_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), block_q=64, block_kv=64, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               _ref_attention(q, k, v), rtol=0.1, atol=0.1)


def test_xla_attention_matches_reference():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((2, 50, 32), dtype=np.float32)
    k = rng.standard_normal((2, 30, 32), dtype=np.float32)
    v = rng.standard_normal((2, 30, 32), dtype=np.float32)
    out = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), _ref_attention(q, k, v),
                               rtol=1e-5, atol=1e-5)


def test_multihead_dispatch_split_merge():
    """(B,S,H*D) head split/merge wrapper equals per-head reference."""
    rng = np.random.default_rng(3)
    b, s, h, d = 2, 16, 4, 8
    q = rng.standard_normal((b, s, h * d), dtype=np.float32)
    k = rng.standard_normal((b, s, h * d), dtype=np.float32)
    v = rng.standard_normal((b, s, h * d), dtype=np.float32)
    out = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), num_heads=h)
    qh = q.reshape(b, s, h, d).transpose(0, 2, 1, 3).reshape(b * h, s, d)
    kh = k.reshape(b, s, h, d).transpose(0, 2, 1, 3).reshape(b * h, s, d)
    vh = v.reshape(b, s, h, d).transpose(0, 2, 1, 3).reshape(b * h, s, d)
    ref = _ref_attention(qh, kh, vh).reshape(b, h, s, d).transpose(0, 2, 1, 3).reshape(b, s, h * d)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_group_norm_matches_torch_formula():
    import torch

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 8, 8, 32), dtype=np.float32)  # NHWC
    w = rng.standard_normal(32).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    out = group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), num_groups=4)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW for torch
    tref = torch.nn.functional.group_norm(
        tx, 4, torch.from_numpy(w), torch.from_numpy(b)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), tref, rtol=1e-4, atol=1e-4)


def test_group_norm_silu():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 4, 4, 8), dtype=np.float32)
    w = np.ones(8, np.float32)
    b = np.zeros(8, np.float32)
    plain = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), num_groups=2))
    fused = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), num_groups=2, silu=True))
    np.testing.assert_allclose(fused, plain / (1 + np.exp(-plain)), rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_torch():
    import torch

    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 7, 16), dtype=np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    out = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (16,), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_upsample2x_conv_matches_naive():
    """Fused 4-phase upsample-conv == conv3x3(nearest_up2(x)) exactly
    (flop-optimal decoder upsample; models/layers.upsample2x_conv)."""
    import jax.numpy as jnp
    import numpy as np

    from sdwebui_tpu.models.layers import (conv2d, upsample2x_conv,
                                           upsample_nearest_2x)

    rng = np.random.RandomState(0)
    for (b, h, w, ci, co) in [(2, 6, 6, 8, 12), (1, 5, 7, 4, 4)]:
        x = jnp.asarray(rng.randn(b, h, w, ci), jnp.float32)
        p = {"weight": jnp.asarray(rng.randn(3, 3, ci, co) * 0.2, jnp.float32),
             "bias": jnp.asarray(rng.randn(co), jnp.float32)}
        ref = conv2d(p, upsample_nearest_2x(x))
        got = upsample2x_conv(p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_async_save_flush(tmp_path):
    """save_image reserves names synchronously and flush_saves makes the
    bytes durable (utils/images async writer)."""
    import numpy as np
    from PIL import Image

    from sdwebui_tpu.utils import images as images_util

    img = Image.fromarray((np.random.RandomState(0).rand(32, 32, 3) * 255)
                          .astype(np.uint8))
    paths = [images_util.save_image(img, str(tmp_path), seed=i, info="x")
             for i in range(3)]
    assert len(set(paths)) == 3          # collision-free numbering
    images_util.flush_saves()
    for p in paths:
        im = Image.open(p)
        assert im.size == (32, 32)
        assert images_util.read_info_from_image(im) == "x"


@pytest.mark.parametrize("b,sq,skv,h,d", [
    (2, 64, 64, 4, 40),    # self-attention, multi-kv grid
    (2, 64, 77, 4, 40),    # cross-attention (single-kv fast path) + kv pad
    (1, 100, 100, 2, 64),  # ragged rows
])
def test_flash_4d_matches_3d(b, sq, skv, h, d):
    """Head-interleaved (B, S, H, D) kernel == split-transpose + 3D kernel
    (the 4D path exists to kill the head relayout copies — ~8 ms/step on
    the SDXL trace)."""
    from sdwebui_tpu.ops.flash_attention import flash_attention_4d

    rng = np.random.default_rng(3)
    q = rng.standard_normal((b, sq, h, d), dtype=np.float32)
    k = rng.standard_normal((b, skv, h, d), dtype=np.float32)
    v = rng.standard_normal((b, skv, h, d), dtype=np.float32)

    def to3(t):
        return t.transpose(0, 2, 1, 3).reshape(b * h, t.shape[1], d)

    ref = flash_attention(jnp.asarray(to3(q)), jnp.asarray(to3(k)),
                          jnp.asarray(to3(v)), block_q=64, block_kv=64,
                          interpret=True)
    out = flash_attention_4d(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                             block_q=64, block_kv=64, interpret=True)
    np.testing.assert_allclose(to3(np.asarray(out)), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("b,sq,skv,h,d", [
    (2, 64, 64, 4, 64),    # SDXL head dim: 2 heads per 128-lane block
    (2, 64, 77, 4, 64),    # cross-attention (single-kv fast path) + kv pad
    (1, 100, 100, 2, 64),  # ragged rows
    (1, 64, 64, 2, 128),   # hp=1 (block width = head dim)
    (2, 64, 64, 8, 40),    # SD1.5 head dim: 16 heads... -> hp=16>8? no: 8×40=320, hp must make 40hp%128==0 -> hp=16 > heads -> unpackable, covered below
])
def test_flash_packed_matches_3d(b, sq, skv, h, d):
    """Lane-packed (B, S, H·D) kernel == split-transpose + 3D kernel (the
    packed path exists to kill the head relayout copies the Mosaic-blocked
    4D layout couldn't)."""
    from sdwebui_tpu.ops.flash_attention import (flash_attention_packed,
                                                 packed_heads_per_block)

    if packed_heads_per_block(d, h) is None:
        with pytest.raises(ValueError):
            flash_attention_packed(jnp.zeros((b, sq, h * d)),
                                   jnp.zeros((b, skv, h * d)),
                                   jnp.zeros((b, skv, h * d)),
                                   num_heads=h, interpret=True)
        return

    rng = np.random.default_rng(3)
    q = rng.standard_normal((b, sq, h * d), dtype=np.float32)
    k = rng.standard_normal((b, skv, h * d), dtype=np.float32)
    v = rng.standard_normal((b, skv, h * d), dtype=np.float32)

    def to3(t):
        s = t.shape[1]
        return (t.reshape(b, s, h, d).transpose(0, 2, 1, 3)
                .reshape(b * h, s, d))

    ref = flash_attention(jnp.asarray(to3(q)), jnp.asarray(to3(k)),
                          jnp.asarray(to3(v)), block_q=64, block_kv=64,
                          interpret=True)
    out = flash_attention_packed(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), num_heads=h,
                                 block_q=64, block_kv=64, interpret=True)
    got = np.asarray(out).reshape(b, sq, h, d).transpose(0, 2, 1, 3) \
        .reshape(b * h, sq, d)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape", [(2, 64, 1280), (2, 33, 320), (3, 77, 768),
                                   (2, 5, 640)])
def test_layer_norm_pallas_matches_xla(shape):
    """Fused one-pass Pallas LayerNorm == the jnp fallback path (which is
    itself oracle-tested against torch in the model twins)."""
    from sdwebui_tpu.ops.norms import _layer_norm_xla
    from sdwebui_tpu.ops.pallas_norms import layer_norm_pallas

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal(shape) * 3 + 1, jnp.float32)
    w = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    bb = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    ref = _layer_norm_xla(x, w, bb)
    out = layer_norm_pallas(x, w, bb, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # no weight/bias + bf16 IO
    xb = x.astype(jnp.bfloat16)
    out2 = layer_norm_pallas(xb, None, None, interpret=True)
    ref2 = _layer_norm_xla(xb, None, None)
    assert out2.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out2, dtype=np.float32),
                               np.asarray(ref2, dtype=np.float32),
                               rtol=0.05, atol=0.05)

"""Token merging: roundtrip identity, reduction, jit-compatibility."""

import numpy as np
import jax
import jax.numpy as jnp

from sdwebui_tpu.ops.tome import build_merge, _grid_split


def test_grid_split_partition():
    dst, src = _grid_split(8, 8)
    assert len(dst) == 16 and len(src) == 48
    assert sorted(np.concatenate([dst, src]).tolist()) == list(range(64))


def test_merge_reduces_and_unmerge_restores_shape():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 8)),
                    jnp.float32)
    merge, unmerge, mlen = build_merge(x, 8, 8, ratio=0.5)
    assert mlen == 64 - 32
    y = merge(x)
    assert y.shape == (2, mlen, 8)
    z = unmerge(y)
    assert z.shape == x.shape
    assert np.isfinite(np.asarray(z)).all()


def test_duplicate_tokens_merge_losslessly():
    """If every token in a 2x2 block is identical, merging the block into
    its dst and unmerging must reproduce the input exactly."""
    blocks = np.random.default_rng(1).standard_normal((1, 4, 4, 4)).astype(np.float32)
    x = np.repeat(np.repeat(blocks, 2, axis=1), 2, axis=2)   # 8x8, 2x2-constant
    x = jnp.asarray(x.reshape(1, 64, 4))
    merge, unmerge, _ = build_merge(x, 8, 8, ratio=0.74)  # merge 47 of 48 src
    z = np.asarray(unmerge(merge(x)))
    np.testing.assert_allclose(z, np.asarray(x), atol=1e-5)


def test_zero_ratio_noop():
    x = jnp.zeros((1, 64, 4))
    assert build_merge(x, 8, 8, ratio=0.0) is None
    assert build_merge(x, 7, 8, ratio=0.5) is None   # grid not divisible


def test_tome_under_jit_in_unet():
    import dataclasses

    from sdwebui_tpu.models import unet as unet_model
    from sdwebui_tpu.models.unet import init_params
    from tests.test_models import TINY_UNET

    cfg = dataclasses.replace(TINY_UNET, tome_ratio=0.3)
    params = init_params(TINY_UNET, 0, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 16, 4)),
                    jnp.float32)
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal((1, 7, 64)),
                      jnp.float32)

    @jax.jit
    def run(p, xx):
        return unet_model.apply(p, cfg, xx, jnp.asarray([3.0]), ctx)

    out = np.asarray(run(params, x))
    base = np.asarray(unet_model.apply(params, TINY_UNET, x,
                                       jnp.asarray([3.0]), ctx))
    assert out.shape == base.shape and np.isfinite(out).all()
    assert not np.allclose(out, base, atol=1e-5)   # approximation kicked in

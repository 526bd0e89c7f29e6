"""Pallas 3×3 conv kernel vs XLA conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdwebui_tpu.ops.conv import conv3x3


def _ref(x, w, b=None):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b if b is not None else out


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 16, 24),      # multi-batch
    (1, 16, 8, 8, 8),       # tall
    (1, 8, 16, 24, 16),     # wide
])
def test_conv3x3_matches_xla(shape):
    bsz, h, w, ci, co = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(bsz, h, w, ci), jnp.float32)
    wt = jnp.asarray(rng.randn(3, 3, ci, co) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(co), jnp.float32)
    got = conv3x3(x, wt, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, wt, b)),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_row_blocks_and_no_bias():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 8), jnp.float32)
    wt = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)
    full = conv3x3(x, wt, None, interpret=True, block_rows=8)
    split = conv3x3(x, wt, None, interpret=True, block_rows=2)
    np.testing.assert_allclose(np.asarray(full), np.asarray(split),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(full), np.asarray(_ref(x, wt)),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_bf16():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 16), jnp.bfloat16)
    wt = jnp.asarray(rng.randn(3, 3, 16, 16) * 0.1, jnp.bfloat16)
    got = conv3x3(x, wt, None, interpret=True)
    assert got.dtype == jnp.bfloat16
    ref = _ref(x.astype(jnp.float32), wt.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=0.15, rtol=0.1)

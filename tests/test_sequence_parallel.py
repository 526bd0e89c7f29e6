"""Ring attention parity on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdwebui_tpu.parallel.sequence import ring_attention, seq_mesh


def _reference_attention(q, k, v, scale):
    s = (q @ np.swapaxes(k, -1, -2)) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return p @ v


@pytest.mark.parametrize("ring", [2, 4, 8])
def test_ring_attention_matches_full(ring):
    if len(jax.devices()) < ring:
        pytest.skip("needs virtual multi-device mesh")
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 3, 32, 8
    q = rng.standard_normal((b, h, s, d)).astype(np.float32)
    k = rng.standard_normal((b, h, s, d)).astype(np.float32)
    v = rng.standard_normal((b, h, s, d)).astype(np.float32)
    scale = d ** -0.5
    want = _reference_attention(q, k, v, scale)
    got = np.asarray(ring_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), seq_mesh(ring), scale))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_ring_attention_under_jit():
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device mesh")
    mesh = seq_mesh(4)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 16, 4)), jnp.float32)

    @jax.jit
    def run(q):
        return ring_attention(q, q, q, mesh)

    out = np.asarray(run(q))
    want = _reference_attention(np.asarray(q), np.asarray(q), np.asarray(q),
                                4 ** -0.5)
    np.testing.assert_allclose(out, want, atol=2e-5, rtol=1e-4)


def test_ring_vs_single_shard():
    """ring=1 degenerates to plain attention (sanity of the recurrence)."""
    mesh = seq_mesh(1)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 1, 8, 4)), jnp.float32)
    out = np.asarray(ring_attention(q, q, q, mesh))
    want = _reference_attention(*([np.asarray(q)] * 3), 4 ** -0.5)
    np.testing.assert_allclose(out, want, atol=2e-5, rtol=1e-4)

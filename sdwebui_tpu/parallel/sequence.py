"""Sequence/context parallelism: ring attention over a `seq` mesh axis.

No reference counterpart (the reference is single-GPU; it handles long
sequences with chunked attention on one device — SURVEY §2.4).  For
megapixel latents the attention sequence grows quadratically; here the
token axis shards over devices and K/V blocks rotate around the ICI ring
(`lax.ppermute`) while each device keeps a running online-softmax
accumulator — no device ever materializes the full K/V or the full
attention matrix (Liu et al. 2023, "Ring Attention").

The math matches ops/flash_attention.py's online softmax; the ring is the
distributed dimension of the same recurrence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SEQ_AXIS = "seq"


def _ring_step(carry, _, scale, axis_name, perm):
    m, l, acc, k, v, q = carry
    s = (q @ k.transpose(0, 1, 3, 2)).astype(jnp.float32) * scale
    m_new = jnp.maximum(m, s.max(-1))
    p = jnp.exp(s - m_new[..., None])
    corr = jnp.exp(m - m_new)
    l = l * corr + p.sum(-1)
    acc = acc * corr[..., None] + (p.astype(v.dtype) @ v).astype(jnp.float32)
    k = jax.lax.ppermute(k, axis_name, perm)
    v = jax.lax.ppermute(v, axis_name, perm)
    return (m_new, l, acc, k, v, q), None


def _ring_attention_local(q, k, v, scale: float, axis_name: str, ring: int):
    """Per-shard body: q stays put, k/v visit every shard once."""
    qf = q.astype(jnp.float32)
    m = jnp.full(q.shape[:-1], -jnp.inf, jnp.float32)
    l = jnp.zeros(q.shape[:-1], jnp.float32)
    acc = jnp.zeros(q.shape, jnp.float32)
    perm = [(j, (j + 1) % ring) for j in range(ring)]
    step = functools.partial(_ring_step, scale=scale, axis_name=axis_name,
                             perm=perm)
    (m, l, acc, _, _, _), _ = jax.lax.scan(
        step, (m, l, acc, k, v, qf), None, length=ring)
    return (acc / jnp.maximum(l[..., None], 1e-30)).astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, scale: float | None = None):
    """q,k,v: (B, H, S, D) with S divisible by the mesh's `seq` axis.
    Shards the token axis, runs the ring, returns the full (B, H, S, D)
    output with the same sharding (gathered transparently by jit)."""
    ring = mesh.shape[SEQ_AXIS]
    if scale is None:
        scale = q.shape[-1] ** -0.5
    assert q.shape[2] % ring == 0, "sequence must divide the seq axis"

    spec = P(None, None, SEQ_AXIS, None)
    fn = jax.shard_map(
        functools.partial(_ring_attention_local, scale=scale,
                          axis_name=SEQ_AXIS, ring=ring),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v)


def seq_mesh(n: int | None = None) -> Mesh:
    """A 1-D `seq` mesh over n (default all) devices."""
    import numpy as np

    devs = jax.devices()[:n] if n else jax.devices()
    return Mesh(np.array(devs), (SEQ_AXIS,))

"""A/B: 3D flash (explicit head split/merge transposes) vs 4D flash
(head-interleaved blocks, no transposes) at UNet shapes, measured jitted
end-to-end from/to the (B, S, H*D) layout the transformer blocks carry.

    python tools/bench_attn_layout.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sdwebui_tpu.ops.flash_attention import (flash_attention,
                                             flash_attention_4d,
                                             flash_attention_packed,
                                             packed_heads_per_block)


def bench(label, fn, *args, iters=30):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    outs = []
    t0 = time.perf_counter()
    for _ in range(iters):
        outs.append(f(*args))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:44s} {dt * 1e6:9.1f} us", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("sdxl L1 self (B2 S4096 h10 d64)", 2, 4096, 4096, 10, 64),
        ("sdxl L2 self (B2 S1024 h20 d64)", 2, 1024, 1024, 20, 64),
        ("sdxl L1 cross (B2 S4096 kv77 h10 d64)", 2, 4096, 77, 10, 64),
        ("sdxl L2 cross (B2 S1024 kv77 h20 d64)", 2, 1024, 77, 20, 64),
        ("sd15 L1 self (B2 S4096 h8 d40)", 2, 4096, 4096, 8, 40),
        ("sd15 L2 self (B2 S1024 h8 d80)", 2, 1024, 1024, 8, 80),
    ]
    for label, b, sq, skv, h, d in cases:
        x_q = jnp.asarray(rng.standard_normal((b, sq, h * d)), jnp.bfloat16)
        x_k = jnp.asarray(rng.standard_normal((b, skv, h * d)), jnp.bfloat16)
        x_v = jnp.asarray(rng.standard_normal((b, skv, h * d)), jnp.bfloat16)

        def via3(q, k, v):
            def split(t, s):
                return (t.reshape(b, s, h, d).transpose(0, 2, 1, 3)
                        .reshape(b * h, s, d))
            o = flash_attention(split(q, sq), split(k, skv), split(v, skv))
            return (o.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
                    .reshape(b, sq, h * d))

        def via4(q, k, v):
            o = flash_attention_4d(q.reshape(b, sq, h, d),
                                   k.reshape(b, skv, h, d),
                                   v.reshape(b, skv, h, d))
            return o.reshape(b, sq, h * d)

        def via_xla3(q, k, v):
            from sdwebui_tpu.ops.attention import xla_attention

            def split(t, s):
                return (t.reshape(b, s, h, d).transpose(0, 2, 1, 3)
                        .reshape(b * h, s, d))
            o = xla_attention(split(q, sq), split(k, skv), split(v, skv))
            return (o.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
                    .reshape(b, sq, h * d))

        def via_xla4(q, k, v):
            import math
            qs = q.reshape(b, sq, h, d)
            ks = k.reshape(b, skv, h, d)
            vs = v.reshape(b, skv, h, d)
            s = jnp.einsum("bqhd,bkhd->bhqk", qs, ks,
                           preferred_element_type=jnp.float32)
            s = s * (1.0 / math.sqrt(d))
            p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, vs)
            return o.reshape(b, sq, h * d)

        def via_packed(q, k, v):
            return flash_attention_packed(q, k, v, num_heads=h)

        t3 = bench(label + " [3d+transpose]", via3, x_q, x_k, x_v)
        if packed_heads_per_block(d, h) is not None:
            tp = bench(label + " [packed]", via_packed, x_q, x_k, x_v)
            print(f"  -> packed is {t3 / tp:.2f}x", flush=True)
            a = jax.jit(via3)(x_q, x_k, x_v)
            c = jax.jit(via_packed)(x_q, x_k, x_v)
            err = float(jnp.abs(a.astype(jnp.float32)
                                - c.astype(jnp.float32)).max())
            print(f"  packed max |diff| {err:.2e}", flush=True)
        if os.environ.get("BENCH_4D"):
            t4 = bench(label + " [4d]", via4, x_q, x_k, x_v)
            print(f"  -> 4d is {t3 / t4:.2f}x", flush=True)
        if skv < sq:  # cross-attention: XLA is the current production path
            bench(label + " [xla 3d+transpose]", via_xla3, x_q, x_k, x_v)
            bench(label + " [xla 4d einsum]", via_xla4, x_q, x_k, x_v)
        if os.environ.get("BENCH_4D"):
            a = jax.jit(via3)(x_q, x_k, x_v)
            c = jax.jit(via4)(x_q, x_k, x_v)
            err = float(jnp.abs(a.astype(jnp.float32)
                                - c.astype(jnp.float32)).max())
            print(f"  4d max |diff| {err:.2e}", flush=True)


if __name__ == "__main__":
    sys.exit(main())

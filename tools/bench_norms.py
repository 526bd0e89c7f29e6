"""Microbench GroupNorm/LayerNorm at SDXL UNet shapes on the TPU.

The SDXL step trace shows convert_reduce_fusion (norm statistics) at
~24.6 ms/step — ~10x over the HBM roofline for the bytes the norms touch.
This isolates each shape, reports achieved GB/s, and A/B-tests variants.

    python tools/bench_norms.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sdwebui_tpu.ops import norms

    shapes = [
        ("L0 gn", (2, 128, 128, 320)),
        ("L1 gn", (2, 64, 64, 640)),
        ("L2 gn", (2, 32, 32, 1280)),
    ]
    ln_shapes = [
        ("L1 ln", (2, 4096, 640)),
        ("L2 ln", (2, 1024, 1280)),
    ]

    def bench(label, shape, fn, *args):
        x = jnp.asarray(np.random.default_rng(0).standard_normal(shape),
                        jnp.bfloat16)
        f = jax.jit(fn)
        f(x, *args)
        jax.block_until_ready(f(x, *args))
        iters = 30
        t0 = time.perf_counter()
        outs = []
        for _ in range(iters):
            outs.append(f(x, *args))
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / iters
        nbytes = x.size * 2 * 2  # read + write, bf16
        print(f"{label:28s} {dt * 1e6:8.1f} us  "
              f"{nbytes / dt / 1e9:7.1f} GB/s (r+w)", flush=True)
        return dt

    print("== current group_norm (fp32 stats, +silu) ==")
    tot = 0.0
    for label, shape in shapes:
        c = shape[-1]
        w = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        tot += bench(label, shape, functools.partial(
            norms.group_norm, silu=True), w, b)
    print("== current layer_norm ==")
    for label, shape in ln_shapes:
        c = shape[-1]
        w = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        bench(label, shape, norms.layer_norm, w, b)

    # variant A: stats via ONE variadic reduce (sum and sumsq in one pass)
    def gn_variadic(x, w, b, num_groups=32, eps=1e-5):
        bsz, c = x.shape[0], x.shape[-1]
        g = num_groups
        xf = x.astype(jnp.float32)
        red = tuple(range(1, x.ndim - 1))
        s1, s2 = jax.lax.reduce((xf, xf * xf), (jnp.float32(0), jnp.float32(0)),
                                lambda a, bq: (a[0] + bq[0], a[1] + bq[1]),
                                red)
        n = 1
        for a in red:
            n *= x.shape[a]
        cnt = n * (c // g)
        s1g = s1.reshape(bsz, g, c // g).sum(-1)
        s2g = s2.reshape(bsz, g, c // g).sum(-1)
        mg = s1g / cnt
        vg = s2g / cnt - mg * mg
        shape = (bsz,) + (1,) * (x.ndim - 2) + (c,)
        mc = jnp.repeat(mg, c // g, -1).reshape(shape)
        rc = jnp.repeat(jax.lax.rsqrt(vg + eps), c // g, -1).reshape(shape)
        out = (xf - mc) * rc * w + b
        return (out * jax.nn.sigmoid(out)).astype(x.dtype)

    print("== variant A: variadic one-pass stats ==")
    for label, shape in shapes:
        c = shape[-1]
        w = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        bench(label, shape, gn_variadic, w, b)

    # variant B: reshape batch*spatial to 2D before reducing (single big
    # row-major reduce over axis 0; lanes = C)
    def gn_2d(x, w, b, num_groups=32, eps=1e-5):
        bsz, c = x.shape[0], x.shape[-1]
        g = num_groups
        x2 = x.reshape(bsz, -1, c)
        xf = x2.astype(jnp.float32)
        s1 = xf.sum(1)
        s2 = (xf * xf).sum(1)
        n = x2.shape[1]
        cnt = n * (c // g)
        s1g = s1.reshape(bsz, g, c // g).sum(-1)
        s2g = s2.reshape(bsz, g, c // g).sum(-1)
        mg = s1g / cnt
        vg = s2g / cnt - mg * mg
        mc = jnp.repeat(mg, c // g, -1)[:, None, :]
        rc = jnp.repeat(jax.lax.rsqrt(vg + eps), c // g, -1)[:, None, :]
        out = (xf - mc) * rc * w + b
        return (out * jax.nn.sigmoid(out)).astype(x.dtype).reshape(x.shape)

    print("== variant B: flat (B, HW, C) reduce ==")
    for label, shape in shapes:
        c = shape[-1]
        w = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        bench(label, shape, gn_2d, w, b)

    # variant C: bf16 elementwise output path (stats fp32, normalize in bf16)
    def gn_bf16_norm(x, w, b, num_groups=32, eps=1e-5):
        bsz, c = x.shape[0], x.shape[-1]
        g = num_groups
        x2 = x.reshape(bsz, -1, c)
        s1 = x2.astype(jnp.float32).sum(1)
        s2 = (x2.astype(jnp.float32) ** 2).sum(1)
        n = x2.shape[1]
        cnt = n * (c // g)
        s1g = s1.reshape(bsz, g, c // g).sum(-1)
        s2g = s2.reshape(bsz, g, c // g).sum(-1)
        mg = s1g / cnt
        vg = s2g / cnt - mg * mg
        mc = jnp.repeat(mg, c // g, -1)[:, None, :]
        rc = jnp.repeat(jax.lax.rsqrt(vg + eps), c // g, -1)[:, None, :]
        scale = (rc * w).astype(jnp.bfloat16)
        shift = (b - mc * rc * w).astype(jnp.bfloat16)
        out = x2 * scale + shift
        out = out * jax.nn.sigmoid(out)
        return out.reshape(x.shape)

    print("== variant C: bf16 normalize (fp32 stats) ==")
    for label, shape in shapes:
        c = shape[-1]
        w = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        bench(label, shape, gn_bf16_norm, w, b)


if __name__ == "__main__":
    sys.exit(main())

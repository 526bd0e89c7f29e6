"""VERDICT r5 item 6: is the ControlNet throughput tax (32% measured) just
the tower's FLOPs, or overhead?  Compares XLA cost-analysis FLOPs of the
UNet forward vs the ControlNet tower forward at bench shapes, and times a
guidance-range run to check the lax.cond actually skips tower compute.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/analyze_controlnet_cost.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def flops_of(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c["flops"])


def main():
    from sdwebui_tpu.models import controlnet as cn
    from sdwebui_tpu.models import unet as unet_model
    from sdwebui_tpu.models.configs import SD15_UNET

    cfg = SD15_UNET
    b = 8  # batch4 x CFG
    x = jnp.ones((b, 64, 64, 4), jnp.bfloat16)
    t = jnp.full((b,), 500.0, jnp.float32)
    ctx = jnp.ones((b, 77, cfg.context_dim), jnp.bfloat16)
    hint = jnp.ones((b, 512, 512, 3), jnp.bfloat16)

    print("building params", flush=True)
    up = jax.device_put(unet_model.init_params(cfg, 0, dtype=jnp.bfloat16))
    cp = jax.device_put(cn.init_params(cfg, 11, dtype=jnp.bfloat16,
                                       zero_init=False))

    f_unet = flops_of(lambda p, x, t, c: unet_model.apply(p, cfg, x, t, c),
                      up, x, t, ctx)
    f_cn = flops_of(lambda p, x, t, c, h: cn.apply(p, cfg, x, t, c, h),
                    cp, x, t, ctx, hint)
    pred = f_unet / (f_unet + f_cn)
    print(f"UNet fwd FLOPs {f_unet:.3e}; CN tower FLOPs {f_cn:.3e}; "
          f"tower/unet = {f_cn / f_unet:.3f}", flush=True)
    print(f"FLOP-predicted throughput ratio with CN: {pred:.3f} "
          f"(measured r4: 1.503/2.199 = 0.683)", flush=True)

    # does the guidance-range lax.cond skip tower compute on device?
    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.pipeline import control as control_mod
    from sdwebui_tpu.pipeline.processing import process_txt2img
    from sdwebui_tpu.pipeline.sd_model import create_random_sd15

    model = create_random_sd15()
    control_mod._cache["bench_cn"] = (cp, cfg, 3)
    from PIL import Image

    hint_img = Image.fromarray(
        (np.indices((512, 512)).sum(0) % 32 * 8).astype(np.uint8)) \
        .convert("RGB")

    def run(seed, gs, ge):
        p = GenerationParams(
            prompt="x", seed=seed, steps=20, cfg_scale=7.5,
            sampler_name="Euler a", width=512, height=512, batch_size=4,
            do_not_save_grid=True, do_not_save_samples=True,
            controlnet_units=[{"model": "bench_cn", "image": hint_img,
                               "module": "none", "weight": 1.0,
                               "guidance_start": gs, "guidance_end": ge}])
        return process_txt2img(model, p)

    for label, gs, ge in (("full range 0-1", 0.0, 1.0),
                          ("half range 0-0.5", 0.0, 0.5),
                          ("never 0-0", 0.0, 0.0)):
        run(1, gs, ge)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            run(2 + i, gs, ge)
            ts.append(time.perf_counter() - t0)
        print(f"CN {label}: median {float(np.median(ts)):.3f}s", flush=True)


if __name__ == "__main__":
    main()

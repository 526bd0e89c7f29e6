"""Stage-level profile of the SDXL base+refiner 1024x1024 bench config.

Times each pipeline stage with explicit block_until_ready so the 2.9s e2e
p50 decomposes into: cond encode (base, refiner), base scan (16 steps),
refiner scan (4 steps), VAE decode 1024, host u8 fetch, python overhead.

Run ON THE TPU (not under the CPU-mesh conftest):
    python tools/profile_sdxl_stages.py
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(label, fn, n=3):
    fn()  # warm/compile
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{label:34s} {best * 1e3:9.1f} ms   (runs: "
          + " ".join(f"{x * 1e3:.0f}" for x in times) + ")", flush=True)
    return best


def main():
    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.pipeline import processing as proc
    from sdwebui_tpu.pipeline.processing import (
        _build_conds, _refiner_split_idx, process_txt2img, sample_latents,
        _decode_fused_u8_bf16)
    from sdwebui_tpu.pipeline.sd_model import create_random_sdxl
    from sdwebui_tpu.rng.image_rng import ImageRNG
    from sdwebui_tpu.sampling import schedulers as sched_mod
    from sdwebui_tpu.sampling.registry import SAMPLER_MAP

    print("building SDXL base + refiner", flush=True)
    t0 = time.time()
    base = create_random_sdxl(0)
    refiner = create_random_sdxl(100, refiner=True)
    refiner = dataclasses.replace(refiner, conditioner=base.conditioner2,
                                  vae_params=base.vae_params)
    print(f"built in {time.time() - t0:.1f}s", flush=True)

    steps, switch_at = 20, 0.8
    p = GenerationParams(
        prompt="a photograph of an astronaut riding a horse",
        negative_prompt="blurry", seed=1, steps=steps, cfg_scale=7.0,
        sampler_name="DPM++ 2M", scheduler="Karras",
        width=1024, height=1024, batch_size=1,
        refiner_checkpoint=refiner.title, refiner_switch_at=switch_at,
        do_not_save_grid=True)

    import os

    if os.environ.get("PROFILE_E2E", "0") == "1":
        def e2e():
            pp = dataclasses.replace(p, seed=np.random.randint(1, 1 << 30))
            return process_txt2img(base, pp, refiner_model=refiner)

        print("e2e warm (compiling; may take minutes)", flush=True)
        tw0 = time.time()
        e2e()
        print(f"e2e compile+run {time.time() - tw0:.1f}s", flush=True)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            e2e()
            times.append(time.perf_counter() - t0)
        times.sort()
        print(f"e2e p50 {times[len(times)//2]:.3f}s  all="
              + " ".join(f"{x:.3f}" for x in times), flush=True)
        jt = proc.last_job_timer
        if jt is not None:
            print("last_job_timer:", jt.summary() if hasattr(jt, "summary")
                  else vars(jt), flush=True)

    # ---- stages ----
    from sdwebui_tpu.sampling.registry import build_sigmas, get_sampler

    sampler = get_sampler("DPM++ 2M")
    sigmas = build_sigmas(sampler, "karras", steps, base.disc, is_sdxl=True)
    s_idx = _refiner_split_idx(base, sigmas, switch_at, steps)
    print(f"refiner split idx: {s_idx} (base {s_idx}, refiner "
          f"{steps - s_idx})", flush=True)

    h, w, c = 128, 128, 4
    rng = ImageRNG((c, h, w), [1])
    x = jnp.asarray(rng.first(), jnp.float32) * float(sigmas[0])
    zero_noise = jnp.zeros((steps, 1, h, w, c), jnp.float32)

    t("cond encode (base)", lambda: _build_conds(base, p, steps))
    t("cond encode (refiner)",
      lambda: _build_conds(refiner, p, steps - s_idx))

    sched = _build_conds(base, p, steps)
    r_sched = _build_conds(refiner, p, steps - s_idx)

    def base_scan():
        return sample_latents(base, sched, x, sigmas[: s_idx + 1],
                              zero_noise[:s_idx], sampler.solver, {})

    def ref_scan(lat):
        return sample_latents(refiner, r_sched, lat, sigmas[s_idx:],
                              zero_noise[s_idx:], sampler.solver, {})

    tb = t(f"base scan ({s_idx} steps)", base_scan)
    lat = base_scan()
    jax.block_until_ready(lat)
    tr = t(f"refiner scan ({steps - s_idx} steps)", lambda: ref_scan(lat))
    print(f"  per-step: base {tb / s_idx * 1e3:.1f} ms, refiner "
          f"{tr / (steps - s_idx) * 1e3:.1f} ms", flush=True)

    def dec():
        u8, bad = _decode_fused_u8_bf16(base.vae_params, base.vae_cfg, lat)
        return u8

    t("vae decode 1024 u8 bf16", dec)
    u8 = dec()
    jax.block_until_ready(u8)
    t("host fetch u8 (3MB)", lambda: np.asarray(jax.device_get(u8)), n=5)

    from PIL import Image

    arr = np.asarray(jax.device_get(u8))[0]
    t("PIL fromarray", lambda: Image.fromarray(arr), n=5)

    # single UNet step (CFG batch 2) for base and refiner: how close is the
    # scan per-step time to one raw forward?
    from sdwebui_tpu.models import unet as unet_model

    for name, m in (("base", base), ("refiner", refiner)):
        cfgm = m.unet_cfg
        xb = jnp.ones((2, 128, 128, 4), jnp.bfloat16)
        tt = jnp.full((2,), 500.0, jnp.float32)
        ctx = jnp.ones((2, 77, cfgm.context_dim), jnp.bfloat16)
        y = (jnp.ones((2, cfgm.adm_in_channels), jnp.bfloat16)
             if cfgm.adm_in_channels else None)
        fwd = jax.jit(lambda pp, x_, t_, c_, y_, _cfgm=cfgm:
                      unet_model.apply(pp, _cfgm, x_, t_, c_, y=y_))
        t(f"unet fwd CFG2 ({name})",
          lambda m=m, fwd=fwd, xb=xb, tt=tt, ctx=ctx, y=y:
          fwd(m.unet_params, xb, tt, ctx, y))


if __name__ == "__main__":
    sys.exit(main())

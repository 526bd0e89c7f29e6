"""Round benchmark: SD1.5 512x512, Euler a 20 steps, CFG 7.5 (BASELINE.json
config #1) on the real TPU chip. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline = 1.0 image/sec (the BASELINE target "< 1 s/image" on v5e).
Random weights (the reference CI's empty-checkpoint strategy): identical
compute graph and data movement as real weights, so the perf number is
representative while no checkpoint assets exist in the container.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    import numpy as np

    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.pipeline.processing import process_txt2img
    from sdwebui_tpu.pipeline.sd_model import create_random_sd15

    batch = int(os.environ.get("BENCH_BATCH", "4"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))

    model = create_random_sd15()

    def run(seed):
        p = GenerationParams(prompt="a photograph of an astronaut riding a horse",
                             negative_prompt="blurry", seed=seed, steps=steps,
                             cfg_scale=7.5, sampler_name="Euler a",
                             width=512, height=512, batch_size=batch,
                             do_not_save_grid=True)  # measure generation only
        return process_txt2img(model, p)

    # the axon compile tunnel occasionally returns a transient 500 —
    # retry the warmup once before giving up
    for attempt in range(2):
        try:
            run(1)  # compile
            break
        except Exception:
            if attempt == 1:
                raise
            time.sleep(30)
    times = []
    for i in range(5):   # median of 5: the axon tunnel adds ±10% noise
        t0 = time.perf_counter()
        res = run(2 + i)
        times.append(time.perf_counter() - t0)
        assert len(res.images) == batch
    sec_per_batch = float(np.median(times))
    ips = batch / sec_per_batch

    print(json.dumps({
        "metric": f"txt2img SD1.5 512x512 Euler-a {steps} steps CFG7.5 batch{batch}",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / 1.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())

"""Op-level breakdown of one SDXL (or SD1.5) UNet forward on the TPU.

Runs the jitted UNet under jax.profiler.trace, then parses the written
trace (.trace.json.gz, Chrome trace format) host-side and aggregates
device-op durations by fusion/op kind — no TensorBoard needed.

    python tools/profile_unet_trace.py [sdxl|sd15|refiner]
"""

import glob
import gzip
import json
import os
import re
import sys
import time


def aggregate(trace_dir, top=40):
    files = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not files:
        print("no trace files under", trace_dir)
        return
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid whose name mentions TPU/device; fall back to
    # aggregating complete events with args.long_name (XLA ops)
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device:" in n or "XLA" in n.upper()}
    by_name = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if name.startswith(("Steal", "Infeed", "Outfeed")):
            continue
        dur = e["dur"] / 1e3  # us -> ms
        total += dur
        # collapse fusion numbering: fusion.123 -> fusion; keep op kind
        key = re.sub(r"[.\d]+$", "", name)
        by_name[key] = by_name.get(key, 0.0) + dur
    print(f"\ndevice total {total:.2f} ms over {len(by_name)} op kinds "
          f"(file {os.path.basename(files[-1])})")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v:9.3f} ms  {100 * v / max(total, 1e-9):5.1f}%  {k}")
    return by_name, total


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "sdxl"
    import jax
    import jax.numpy as jnp

    from sdwebui_tpu.models import unet as unet_model
    from sdwebui_tpu.models.configs import (SD15_UNET, SDXL_REFINER_UNET,
                                            SDXL_UNET)
    impl = os.environ.get("SDTPU_ATTN_IMPL")
    if impl:
        import importlib
        attn_mod = importlib.import_module("sdwebui_tpu.ops.attention")
        attn_mod.set_attention_impl(impl)
        print(f"attention impl forced: {impl}", flush=True)

    cfg = {"sdxl": SDXL_UNET, "refiner": SDXL_REFINER_UNET,
           "sd15": SD15_UNET}[which]
    hw = 128 if which in ("sdxl", "refiner") else 64
    print(f"building {which} UNet params", flush=True)
    key = jax.random.PRNGKey(0)
    params = jax.device_put(unet_model.init_params(cfg, key,
                                                   dtype=jnp.bfloat16))
    x = jnp.ones((2, hw, hw, cfg.in_channels), jnp.bfloat16)
    t = jnp.full((2,), 500.0, jnp.float32)
    ctx = jnp.ones((2, 77, cfg.context_dim), jnp.bfloat16)
    y = (jnp.ones((2, cfg.adm_in_channels), jnp.bfloat16)
         if cfg.adm_in_channels else None)
    fwd = jax.jit(lambda p, x, t, c, y: unet_model.apply(p, cfg, x, t, c, y=y))
    print("compiling", flush=True)
    jax.block_until_ready(fwd(params, x, t, ctx, y))
    # timed loop (5 iters, tunnel-safe timing via a chained dep)
    t0 = time.perf_counter()
    r = None
    for _ in range(5):
        r = fwd(params, x, t, ctx, y)
    jax.block_until_ready(r)
    wall = (time.perf_counter() - t0) / 5
    print(f"fwd wall {wall * 1e3:.1f} ms/iter", flush=True)

    outdir = f"/tmp/unet_trace_{which}"
    os.system(f"rm -rf {outdir}")
    jax.profiler.start_trace(outdir)
    for _ in range(3):
        r = fwd(params, x, t, ctx, y)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    res = aggregate(outdir)
    if res:
        _, total = res
        print(f"\nper-iter device time {total / 3:.2f} ms "
              f"(vs wall {wall * 1e3:.1f})")


if __name__ == "__main__":
    main()

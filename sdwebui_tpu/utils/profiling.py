"""Generation profiling (reference modules/profiling.py torch.profiler
wrapper → jax.profiler traces, viewable in TensorBoard/Perfetto)."""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def profile(enable: bool = False, outdir: str = "profile-traces"):
    """Wrap a generation in a jax.profiler trace when enabled (the
    reference's opts.profiling_enable flow, modules/call_queue.py:123).

    The reference's torch.profiler knobs map onto jax.profiler trace
    options (modules/shared_options.py profiler section):
      profiling_activities   ['CPU', ...] → host-side tracing on/off
                             (device/XLA events are always captured)
      profiling_with_stack   → python tracer (call-stack annotation)
    profiling_record_shapes / profiling_profile_memory have no off-switch
    in XLA traces (shapes and allocation events are always present) and
    stay accepted-but-inert."""
    if not enable:
        yield None
        return
    import jax

    from sdwebui_tpu.utils.options import opts

    os.makedirs(outdir, exist_ok=True)
    kwargs = {}
    try:
        activities = list(opts.get("profiling_activities", ["CPU"]) or [])
        host = "CPU" in activities
        stack = bool(opts.get("profiling_with_stack", True))
        kwargs["profiler_options"] = jax.profiler.ProfileOptions(
            host_tracer_level=2 if host else 0,
            python_tracer_level=1 if stack else 0)
    except Exception:   # older jax without ProfileOptions: default trace
        kwargs = {}
    try:
        jax.profiler.start_trace(outdir, **kwargs)
        yield outdir
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass


class MemoryMonitor:
    """Device HBM usage sampling (reference modules/memmon.py thread;
    here on-demand via PJRT memory_stats — no polling thread needed)."""

    def __init__(self):
        self.peak = 0

    def read(self) -> dict:
        try:
            import jax

            stats = jax.local_devices()[0].memory_stats() or {}
        except Exception:
            stats = {}
        used = stats.get("bytes_in_use", 0)
        self.peak = max(self.peak, stats.get("peak_bytes_in_use", used))
        return {
            "used": used,
            "peak": self.peak,
            "total": stats.get("bytes_limit", 0),
            "free": max(stats.get("bytes_limit", 0) - used, 0),
        }

    def summary(self) -> str:
        r = self.read()
        gb = 1 << 30
        return (f"HBM: {r['used'] / gb:.2f}GB used, peak {r['peak'] / gb:.2f}GB"
                f" of {r['total'] / gb:.2f}GB")


memory_monitor = MemoryMonitor()

"""Generation profiling (reference modules/profiling.py torch.profiler
wrapper → jax.profiler traces, viewable in TensorBoard/Perfetto)."""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def profile(enable: bool = False, outdir: str = "profile-traces"):
    """Wrap a generation in a jax.profiler trace when enabled (the
    reference's opts.profiling_enable flow, modules/call_queue.py:123)."""
    if not enable:
        yield None
        return
    import jax

    os.makedirs(outdir, exist_ok=True)
    try:
        jax.profiler.start_trace(outdir)
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

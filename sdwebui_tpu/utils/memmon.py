"""Device-memory monitor (reference modules/memmon.py: a thread polling
cuda.mem_get_info at opts.memmon_poll_rate Hz during generation; here it
samples jax memory_stats() so /sdapi/v1/memory and the gallery footer can
report the job's PEAK HBM use, not just the point-in-time value)."""

from __future__ import annotations

import threading


class MemMonitor:
    def __init__(self):
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.peak_used = 0
        self.polls = 0

    @staticmethod
    def _used() -> int:
        try:
            import jax

            stats = jax.local_devices()[0].memory_stats() or {}
            return int(stats.get("bytes_in_use", 0))
        except Exception:
            return 0

    def start(self, poll_rate: float = 8.0):
        """Begin sampling at poll_rate Hz (0 disables, like the reference)."""
        self.stop()
        self.peak_used = self._used()
        self.polls = 0
        if poll_rate <= 0:
            return
        self._stop.clear()
        interval = 1.0 / float(poll_rate)

        def run():
            while not self._stop.wait(interval):
                self.peak_used = max(self.peak_used, self._used())
                self.polls += 1

        self._thread = threading.Thread(target=run, daemon=True,
                                        name="memmon")
        self._thread.start()

    def stop(self):
        if self._thread is not None:
            self._stop.set()
            self._thread.join(timeout=2)
            self._thread = None
        # one final sample so even poll_rate=0 reports an end-of-job figure
        self.peak_used = max(self.peak_used, self._used())


monitor = MemMonitor()

"""Job state machine (reference modules/shared_state.py).

interrupt/skip flags are polled by the orchestrator between batches and —
in stepwise sampling mode — between steps; progress numbers feed
/sdapi/v1/progress and /internal/progress."""

from __future__ import annotations

import threading
import time


class State:
    def __init__(self):
        self.skipped = False
        self.interrupted = False
        self.stopping_generation = False
        self.job = ""
        self.job_no = 0
        self.job_count = 0
        self.processing_has_refined_job_count = False
        self.job_timestamp = "0"
        self.sampling_step = 0
        self.sampling_steps = 0
        self.current_latent = None
        self.current_image = None
        self.current_image_sampling_step = 0
        self.id_live_preview = 0
        self.textinfo = None
        self.time_start = 0.0
        self.server_start = time.time()
        self._lock = threading.Lock()
        self.server_command_signal = threading.Event()
        self._server_command = None

    # ---- flags --------------------------------------------------------

    def skip(self):
        self.skipped = True

    def interrupt(self):
        # immediate, like the reference State.interrupt() used by the API
        self.interrupted = True

    def interrupt_ui(self):
        """UI Interrupt button semantics (reference ui_toprow.py:106 with
        opts.interrupt_after_current): the first interrupt of a multi-image
        job finishes the in-flight image and stops before the next; a
        second click stops immediately."""
        from sdwebui_tpu.utils.options import opts as _opts

        if not self.stopping_generation and self.job_count > 1 \
                and _opts.get("interrupt_after_current", True):
            self.stopping_generation = True
        else:
            self.interrupted = True

    def stop_generating(self):
        self.stopping_generation = True

    # ---- lifecycle ----------------------------------------------------

    def begin(self, job: str = "(unknown)"):
        with self._lock:
            self.sampling_step = 0
            self.job_count = -1
            self.processing_has_refined_job_count = False
            self.job_no = 0
            self.job_timestamp = time.strftime("%Y%m%d%H%M%S")
            self.current_latent = None
            self.current_image = None
            self.current_image_sampling_step = 0
            self.id_live_preview = 0
            self.skipped = False
            self.interrupted = False
            self.stopping_generation = False
            self.textinfo = None
            self.job = job
            self.time_start = time.time()
        # device-memory peak tracking for the job (opts.memmon_poll_rate;
        # reference memmon.monitor starts/stops around shared.state jobs)
        try:
            from sdwebui_tpu.utils.memmon import monitor
            from sdwebui_tpu.utils.options import opts

            monitor.start(float(opts.get("memmon_poll_rate", 8) or 0))
        except Exception:
            pass

    def end(self):
        with self._lock:
            self.job = ""
            self.job_count = 0
        try:
            from sdwebui_tpu.runtime import console

            console.finish()
        except Exception:
            pass
        try:
            from sdwebui_tpu.utils.memmon import monitor

            monitor.stop()
        except Exception:
            pass

    def nextjob(self):
        self.job_no += 1
        self.sampling_step = 0
        self.current_image_sampling_step = 0

    # ---- progress -----------------------------------------------------

    @property
    def progress(self) -> float:
        p = 0.0
        if self.job_count > 0:
            p += self.job_no / self.job_count
            if self.sampling_steps > 0:
                p += (1 / self.job_count) * (self.sampling_step / self.sampling_steps)
        return min(p, 1.0)

    def set_current_image(self, image):
        with self._lock:
            self.current_image = image
            self.id_live_preview += 1

    # ---- server commands ----------------------------------------------

    @property
    def server_command(self):
        return self._server_command

    @server_command.setter
    def server_command(self, value):
        self._server_command = value
        self.server_command_signal.set()

    def wait_for_server_command(self, timeout=None):
        if self.server_command_signal.wait(timeout):
            self.server_command_signal.clear()
            req = self._server_command
            self._server_command = None
            return req
        return None


state = State()

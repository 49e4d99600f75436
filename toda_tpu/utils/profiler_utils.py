"""Profiling / tracing hooks.

Reference: the hand-rolled AverageMeter timing surface (SURVEY.md §5, tracing) —
kept in train_utils — plus this jax.profiler integration for real device traces
(the reference has no profiler integration at all; torch profiler/NVTX unused).
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Capture a device trace viewable in TensorBoard / Perfetto.

    with profiler_utils.trace("/tmp/trace"):
        for _ in range(3):
            state, tb = train_step(state, batch)
        jax.block_until_ready(tb["loss"])
    """
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step host wall-clock breakdown (data/compute), mirroring the
    reference's data_time/forward_time/batch_time meters (train_utils.py:23-86)."""

    def __init__(self):
        self.t_end = time.time()
        self.data_time = 0.0
        self.step_time = 0.0
        self.count = 0

    def data_ready(self):
        self._t_data = time.time()
        self.data_time += self._t_data - self.t_end

    def step_done(self):
        now = time.time()
        self.step_time += now - self._t_data
        self.t_end = now
        self.count += 1

    def averages(self):
        n = max(self.count, 1)
        return {"data_time": self.data_time / n, "step_time": self.step_time / n}

"""Per-phase timing and profiler integration.

Reference: hand-rolled std::chrono timers around pre-processing / tracking /
publish with running averages (trackdlo_node.cpp:83-86, 249-252, 371-375,
518-528). Here: a PhaseTimers helper emitting the same three-phase report,
plus a jax.profiler trace context for TPU-level analysis (replacing the
reference's "Iteration until convergence" logs with StepOutputs.iterations).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

logger = logging.getLogger("trackdlo_tpu")


class PhaseTimers:
    """Accumulates wall time per named phase with running averages."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - t0) * 1000.0
            self.totals[name] += dt
            self.counts[name] += 1
            logger.debug("%s: %.3f ms", name, dt)

    def averages(self) -> dict[str, float]:
        return {k: self.totals[k] / self.counts[k] for k in self.totals}

    def report(self) -> str:
        # Mirrors the reference's "Avg ..." log block (trackdlo_node.cpp:525-528).
        lines = [f"Avg {k}: {v:.3f} ms" for k, v in self.averages().items()]
        total = sum(self.averages().values())
        lines.append(f"Avg total: {total:.3f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_step(log_dir: str = "/tmp/trackdlo_tpu_trace"):
    """jax.profiler trace around a block (TPU timeline for the jitted step)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


OCCLUSION_STATE_NAMES = {
    0: "All nodes visible",
    1: "Mid-section occluded",
    2: "Tail occluded",
    3: "Head occluded",
    4: "Both ends occluded",
    5: "No visible nodes",
}


def log_step_outputs(outputs, frame_idx: int | None = None) -> None:
    """Observability hook: the reference's per-frame ROS_INFO lines
    (occlusion state trackdlo.cpp:931-981, downsample size
    trackdlo_node.cpp:243, convergence trackdlo.cpp:426-434)."""
    state = OCCLUSION_STATE_NAMES.get(int(outputs.occlusion_state), "?")
    prefix = f"[frame {frame_idx}] " if frame_idx is not None else ""
    logger.info(
        "%s%s | points=%d | EM iterations=%d%s",
        prefix,
        state,
        int(outputs.n_points),
        int(outputs.iterations),
        "" if bool(outputs.converged) else " (did not converge)",
    )

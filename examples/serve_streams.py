"""Production serving loop: raw sequence -> tracker -> outputs, end to end.

The deployment shape of the framework (replaces the reference's ROS node
graph): the native double-buffered FrameFeeder prefetches RGB-D frames off
disk on a worker thread while the chip tracks; results stream to markers /
an annotated video. Works single-stream or many streams time-multiplexed
(MultiTracker).

    python examples/serve_streams.py <seq.tdlo> [out.mp4]

(Record a .tdlo with trackdlo_tpu.io.raw_sequence.write_raw_sequence or
tools/record.py.)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def serve(seq_path: str, out_video: str | None = None, params=None,
          intrinsics=None, max_frames: int | None = None):
    """Track a recorded raw sequence end to end; returns (fps, n_frames,
    final state)."""
    from trackdlo_tpu import native
    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.models.trackdlo import Tracker
    from trackdlo_tpu.utils.health import TrackingSupervisor
    from trackdlo_tpu.utils.profiling import PhaseTimers

    params = params or live_params()
    intr = intrinsics or CameraIntrinsics()
    tracker = Tracker(params, intr)
    supervisor = TrackingSupervisor(tracker)

    view = None
    if out_video:
        from trackdlo_tpu.tools.live_view import LiveView

        view = LiveView(tracker, out_path=out_video)

    timers = PhaseTimers()
    state = None
    n = 0
    t0 = time.perf_counter()
    with native.FrameFeeder(seq_path) as feeder:
        for rgb, depth in feeder:
            if state is None:
                with timers.phase("init"):
                    state = tracker.init_from_frame(rgb, depth)
                continue
            with timers.phase("track"):
                state, out = supervisor.step(state, rgb, depth)
            if view is not None:
                with timers.phase("render"):
                    view.show(rgb, state, out)
            n += 1
            if max_frames and n >= max_frames:
                break
    # Force completion of the last step before timing.
    y = np.asarray(state.y)
    assert np.isfinite(y).all()
    wall = time.perf_counter() - t0
    if view is not None:
        view.close()
    fps = n / wall if wall > 0 else float("nan")
    print(f"served {n} frames in {wall:.2f}s = {fps:.1f} fps "
          f"(reinit_count={supervisor.reinit_count})")
    print(timers.report())
    return fps, n, state


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    serve(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)

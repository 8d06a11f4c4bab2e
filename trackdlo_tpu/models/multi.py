"""Multi-stream tracking on one chip: time-multiplexed alternative to vmap.

With the exact M-step solve (round 3) a vmapped 8-stream batch runs at the
single-stream per-frame rate (docs/ALGORITHM.md "Batch scaling"), so
batching and time-multiplexing are both viable on one chip. MultiTracker
multiplexes sequentially with ONE shared compiled step, which additionally
decouples stream lifecycles (streams join/leave without recompiling or
re-padding a batch) and keeps per-stream latency at the single-frame step
time. The vmapped batch (parallel/sharding.build_batched_step_fn) trades
those for a single launch per frame set; lockstep trip coupling only grows
mildly with batch (b16 ~+14%/frame). Scale-out beyond one chip shards
streams over the mesh `data` axis (trackdlo_tpu.parallel), where each
device runs its own trip counts.
"""

from __future__ import annotations

import numpy as np

from trackdlo_tpu.config import CameraIntrinsics, TrackerParams
from trackdlo_tpu.models.trackdlo import Tracker, TrackerState


class MultiTracker:
    """Track many independent camera streams with one compiled step.

    Usage::

        mt = MultiTracker(live_params(), CameraIntrinsics())
        mt.add_stream("cam0", init_nodes=nodes0)
        mt.add_stream("cam1", init_frame=(rgb, depth))
        outs = mt.step_all({"cam0": (rgb0, depth0), "cam1": (rgb1, depth1)})
    """

    def __init__(self, params: TrackerParams, intrinsics: CameraIntrinsics):
        self.tracker = Tracker(params, intrinsics)
        self.states: dict[str, TrackerState] = {}
        self.last_outputs: dict[str, object] = {}

    def add_stream(self, name: str, init_nodes=None, init_frame=None) -> None:
        if (init_nodes is None) == (init_frame is None):
            raise ValueError("provide exactly one of init_nodes / init_frame")
        if init_nodes is not None:
            self.states[name] = self.tracker.init_from_nodes(init_nodes)
        else:
            rgb, depth = init_frame
            self.states[name] = self.tracker.init_from_frame(rgb, depth)

    def remove_stream(self, name: str) -> None:
        self.states.pop(name, None)
        self.last_outputs.pop(name, None)

    def step(self, name: str, rgb, depth, occlusion_mask=None):
        """Advance one stream; returns its StepOutputs."""
        state, out = self.tracker.step(
            self.states[name], rgb, depth, occlusion_mask
        )
        self.states[name] = state
        self.last_outputs[name] = out
        return out

    def step_all(self, frames: dict, occlusion_masks: dict | None = None) -> dict:
        """Advance every stream (sequentially — see module docstring);
        ``frames[name] = (rgb, depth)``. Returns {name: StepOutputs}."""
        occlusion_masks = occlusion_masks or {}
        outs = {}
        for name, (rgb, depth) in frames.items():
            outs[name] = self.step(name, rgb, depth, occlusion_masks.get(name))
        return outs

    def nodes(self, name: str) -> np.ndarray:
        return np.asarray(self.states[name].y)

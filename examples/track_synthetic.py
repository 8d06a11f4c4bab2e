"""Track a synthetic rope end to end, with occlusion injection and overlays.

Run:  python examples/track_synthetic.py [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys

import numpy as np

from trackdlo_tpu.config import CameraIntrinsics, live_params
from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
from trackdlo_tpu.models.trackdlo import Tracker
from trackdlo_tpu.utils.profiling import PhaseTimers, log_step_outputs
from trackdlo_tpu.utils.viz import draw_tracking_overlay


def main(out_dir=None):
    import logging

    logging.basicConfig(level=logging.INFO)

    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    tracker = Tracker(params, intr)
    timers = PhaseTimers()

    rgb, depth = render_frame(rope, 0.0, intr)
    state = tracker.init_from_frame(rgb, depth)

    occ = np.ones((intr.height, intr.width), np.uint8) * 255
    occ[:, 500:800] = 0

    for i in range(1, 16):
        rgb, depth = render_frame(rope, i / 15.0, intr)
        mask = occ if 5 <= i < 11 else None
        with timers.phase("tracking_step"):
            state, out = tracker.step(state, rgb, depth, mask)
        log_step_outputs(out, frame_idx=i)

        gt = rope.nodes(i / 15.0, params.M)
        err = min(
            np.linalg.norm(np.asarray(state.y) - gt, axis=1).mean(),
            np.linalg.norm(np.asarray(state.y)[::-1] - gt, axis=1).mean(),
        )
        print(f"frame {i}: mean node error {err * 1000:.2f} mm")

        if out_dir:
            import cv2
            import os

            os.makedirs(out_dir, exist_ok=True)
            img = draw_tracking_overlay(
                rgb, np.asarray(state.y), intr.proj_matrix(),
                visible=np.asarray(out.not_self_occluded), occlusion_mask=mask,
            )
            cv2.imwrite(f"{out_dir}/frame_{i:03d}.png", img[..., ::-1])

    print(timers.report())


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)

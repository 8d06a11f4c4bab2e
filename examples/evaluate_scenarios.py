"""Run the evaluation protocol over a synthetic sequence and an occlusion
sweep, writing reference-format error files.

Run:  python examples/evaluate_scenarios.py [save_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys

import numpy as np

from trackdlo_tpu.config import CameraIntrinsics, live_params
from trackdlo_tpu.evaluation import EvalConfig, OcclusionSchedule, run_evaluation
from trackdlo_tpu.evaluation.sweep import occlusion_sweep
from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
from trackdlo_tpu.models.trackdlo import Tracker


def main(save_dir="eval_results"):
    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()

    frames, gt = [], []
    for i in range(20):
        t = i / 15.0
        frames.append(render_frame(rope, t, intr, markers=12))
        gt.append(rope.nodes(t, params.M))
    gt = np.array(gt)

    # Single scored run with scheduled occlusion → error file.
    tracker = Tracker(params, intr)
    state = tracker.init_from_nodes(gt[0])
    config = EvalConfig(scenario="stationary", pct_occlusion=25, save_location=save_dir)
    schedule = OcclusionSchedule(start_record_at=0.0, wait_before_occlusion=0.4)
    result = run_evaluation(tracker, state, frames, config, intr,
                            gt_nodes=gt, schedule=schedule)
    print(f"stationary@25%: mean error {result.mean_error * 1000:.2f} mm "
          f"over {len(result.errors)} frames -> {config.error_filename}")

    # Batched occlusion sweep: every percentage in parallel on one chip.
    pcts, errors = occlusion_sweep(params, intr, frames[:10], gt[:10], gt[0],
                                   pct_values=(0, 25, 50, 75))
    for p, e in zip(pcts, errors):
        print(f"pct={p:3d}: mean {e.mean() * 1000:.2f} mm, final {e[-1] * 1000:.2f} mm")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "eval_results")

"""Run ALL six reference evaluation scenarios end to end (VERDICT r1 #4).

Each scenario: >=100 synthetic frames over the reference schedule horizon,
scheduled occlusion (per-scenario rectangle or pct-bbox), scored with the
(E1+E2)/2 metric against exact GT, reference-format error files, annotated
eval images every 0.5 s, and the occlusion states seen.

    python examples/run_scenarios.py [save_dir] [n_frames]

Writes <save_dir>/SCENARIOS.md with the error-vs-time table.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_all(save_dir="eval_results", n_frames=105, use_markers=False):
    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.evaluation import EvalConfig, run_evaluation
    from trackdlo_tpu.evaluation.scenarios import ALL_SCENARIOS, generate, make_scenario
    from trackdlo_tpu.models.trackdlo import Tracker
    from trackdlo_tpu.utils.profiling import OCCLUSION_STATE_NAMES

    params = live_params()
    intr = CameraIntrinsics()
    os.makedirs(save_dir, exist_ok=True)

    rows = []
    all_states = {}
    for name in ALL_SCENARIOS:
        sc = make_scenario(name)
        frames, gt, rate = generate(
            sc, n_frames, intr, params.M, markers=12 if use_markers else 0
        )

        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(gt[0])

        # Track occlusion states through a wrapper (the runner only returns
        # trajectories).
        states_seen = []

        class _Probe:
            def step(self, st, rgb, depth, occ=None):
                st, out = tracker.step(st, rgb, depth, occ)
                states_seen.append(int(out.occlusion_state))
                return st, out

        config = EvalConfig(
            scenario=name,
            pct_occlusion=25,
            save_location=save_dir,
            save_images=True,
            image_interval_s=0.5,
            rate=rate,
        )
        res = run_evaluation(
            _Probe(), state, frames, config, intr, gt_nodes=gt
        )
        errs = res.errors * 1000
        q = lambda p: float(np.percentile(errs, p)) if len(errs) else float("nan")
        seen = sorted(set(states_seen))
        all_states[name] = seen
        rows.append(
            f"| {name} | {len(frames)} | {len(errs)} | {errs.mean():.2f} | "
            f"{q(50):.2f} | {q(95):.2f} | {errs.max():.2f} | "
            f"{', '.join(OCCLUSION_STATE_NAMES[s].split()[0] for s in seen)} |"
        )
        print(rows[-1])

    md = [
        "## Long-horizon scenario evaluation (synthetic analogs of the six "
        "reference bags)",
        "",
        f"{n_frames} frames/scenario over each reference schedule horizon; "
        "(E1+E2)/2 vs exact GT (mm); scheduled occlusion (per-scenario rects "
        "/ pct-bbox, run_evaluation.cpp:112-282); error files + 0.5 s eval "
        "images in the save dir. Backend: "
        f"`{__import__('jax').default_backend()}` · "
        f"{__import__('time').strftime('%Y-%m-%d %H:%M')}.",
        "",
        "| scenario | frames | scored | mean | p50 | p95 | max | states seen |",
        "|---|---|---|---|---|---|---|---|",
        *rows,
    ]
    out = os.path.join(save_dir, "SCENARIOS.md")
    with open(out, "w") as f:
        f.write("\n".join(md) + "\n")
    print(f"wrote {out}")
    return all_states


if __name__ == "__main__":
    save = sys.argv[1] if len(sys.argv) > 1 else "eval_results"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 105
    run_all(save, n)

"""Noise-robustness evaluation: the six scenarios under degraded input.

VERDICT r2 missing #1: the reference's verification medium is real noisy
D435 recordings (docs/RUN.md:90-115); every prior accuracy number here came
from clean synthetic frames. This sweep re-runs the full evaluation protocol
(scheduled occlusion, (E1+E2)/2 vs exact GT) with sensor-degradation models:

- depth_noise_mm in {0, 2, 5}: mm-quantized Gaussian depth noise;
- holes:   2 mm noise + 10% depth dropout (specular holes);
- clutter: 2 mm noise + 8 rope-colored background blobs (HSV false
           positives the prune/EM must reject).

    python examples/noise_sweep.py [save_dir] [n_frames]

Writes <save_dir>/NOISE.md with the error-vs-noise table.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOISE_CONFIGS = {
    "clean": {},
    "noise2mm": {"depth_noise_mm": 2.0},
    "noise5mm": {"depth_noise_mm": 5.0},
    "holes": {"depth_noise_mm": 2.0, "dropout_frac": 0.10},
    "clutter": {"depth_noise_mm": 2.0, "clutter_blobs": 8},
}


def run_sweep(save_dir="eval_results", n_frames=105, configs=None):
    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.evaluation import EvalConfig, run_evaluation
    from trackdlo_tpu.evaluation.scenarios import (
        ALL_SCENARIOS,
        generate,
        make_scenario,
    )
    from trackdlo_tpu.models.trackdlo import Tracker

    params = live_params()
    intr = CameraIntrinsics()
    os.makedirs(save_dir, exist_ok=True)
    configs = configs or NOISE_CONFIGS

    table = {}  # scenario -> {config: mean_mm}
    tracker = Tracker(params, intr)
    for name in ALL_SCENARIOS:
        sc = make_scenario(name)
        table[name] = {}
        for cfg_name, noise_kwargs in configs.items():
            frames, gt, rate = generate(
                sc, n_frames, intr, params.M, noise_kwargs=noise_kwargs
            )
            state = tracker.init_from_nodes(gt[0])
            config = EvalConfig(
                scenario=name, pct_occlusion=25, rate=rate,
                save_errors=False,
            )
            res = run_evaluation(tracker, state, frames, config, intr, gt_nodes=gt)
            mean_mm = float(res.errors.mean() * 1000) if len(res.errors) else float("nan")
            max_mm = float(res.errors.max() * 1000) if len(res.errors) else float("nan")
            table[name][cfg_name] = (mean_mm, max_mm)
            print(f"{name:24s} {cfg_name:10s} mean {mean_mm:7.2f} mm  max {max_mm:7.2f} mm")

    cfg_names = list(configs)
    md = [
        "## Noise robustness (six scenarios under degraded input)",
        "",
        f"{n_frames} frames/scenario, full occlusion-scheduled protocol, "
        "(E1+E2)/2 vs exact GT, mean mm (max mm). Degradations: mm-quantized "
        "Gaussian depth noise; 10% depth dropout holes; 8 rope-colored "
        "background clutter blobs (io/sequence.render_frame).",
        "",
        "| scenario | " + " | ".join(cfg_names) + " |",
        "|---" * (len(cfg_names) + 1) + "|",
    ]
    for name in table:
        cells = [
            f"{table[name][c][0]:.2f} ({table[name][c][1]:.1f})"
            for c in cfg_names
        ]
        md.append(f"| {name} | " + " | ".join(cells) + " |")
    out = os.path.join(save_dir, "NOISE.md")
    with open(out, "w") as f:
        f.write("\n".join(md) + "\n")
    print("wrote", out)
    return table


if __name__ == "__main__":
    save = sys.argv[1] if len(sys.argv) > 1 else "eval_results"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 105
    run_sweep(save, n)

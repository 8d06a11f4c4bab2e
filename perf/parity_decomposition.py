"""Closed-loop parity decomposition (VERDICT r1 next-round #2).

Runs >=30 closed-loop frames through four trackers and reports per-frame mean
node deviation from the f64 oracle (the reference-math ground truth):

  full      : jitted tracker, its own preprocessing           (ship config)
  same_pts  : jitted tracker fed the ORACLE's point clouds    (isolates f32/EM)
  oracle_jp : f64 oracle fed the JITTED preprocessing clouds  (isolates downsample)
  lstsq     : `full` with the COD-semantics M-step solver

The two isolation runs attribute the `full` gap to its two candidate causes:
float-precision compounding vs downsample detail (different point sets).

Usage: python perf/parity_decomposition.py [--frames 30] [--occlude]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--occlude", action="store_true",
                    help="inject a mid-section occlusion for frames 10-20")
    ap.add_argument("--json", default=None)
    ap.add_argument("--cap", type=int, default=None,
                    help="override parity_candidate_cap for the split run")
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--tpu", action="store_true",
                    help="run the jitted trackers on the ambient (TPU) "
                         "backend — audits the real compiled kernel path")
    ap.add_argument("--only", default=None,
                    help="comma list of runs (full,same_pts,oracle_jp,"
                         "lstsq,split); default all. The f64 oracle "
                         "reference always runs.")
    args = ap.parse_args()

    all_runs = ["full", "same_pts", "oracle_jp", "lstsq", "split"]
    want = set(args.only.split(",")) if args.only else set(all_runs)
    unknown = want - set(all_runs)
    if unknown:
        ap.error(f"unknown --only runs: {sorted(unknown)}")
    if "oracle_jp" in want:
        want.add("full")  # oracle_jp consumes full's preprocessed cloud

    import jax

    if args.cpu and not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.models.trackdlo import Tracker
    from trackdlo_tpu.oracle.pipeline import init_state as oracle_init, step_frame
    from trackdlo_tpu.oracle.preprocess import preprocess_frame as oracle_pre

    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    m = params.M

    maker = {
        "full": lambda: Tracker(params, intr),
        "same_pts": lambda: Tracker(params, intr),
        "lstsq": lambda: Tracker(
            dataclasses.replace(params, solver="lstsq"), intr
        ),
        # Voxel-parity-split preprocessing: near-exact PCL VoxelGrid clouds.
        "split": lambda: Tracker(
            dataclasses.replace(
                params, parity_split=True,
                **({"parity_candidate_cap": args.cap} if args.cap else {}),
            ),
            intr,
        ),
    }
    trackers = {k: mk() for k, mk in maker.items() if k in want}
    states = {k: t.init_from_nodes(rope.nodes(0.0, m)) for k, t in trackers.items()}
    o_state = oracle_init(rope.nodes(0.0, m), params)       # reference run
    ojp_state = oracle_init(rope.nodes(0.0, m), params)     # oracle on jitted points

    dev = {k: [] for k in all_runs if k in want}
    gt_err = {k: [] for k in ["full", "oracle"]}

    for i in range(1, args.frames + 1):
        t = i / 15.0
        rgb, depth = render_frame(rope, t, intr)
        occ = None
        if args.occlude and 10 <= i <= 20:
            occ = np.ones((intr.height, intr.width), np.uint8) * 255
            occ[:, 500:800] = 0

        # Reference run: f64 oracle on its own preprocessing.
        o_state, _, aux = step_frame(o_state, rgb, depth, params, intr, occ)
        oracle_pts = aux["points"]

        ref = o_state.y

        if "full" in want:
            # full: jitted tracker end to end.
            states["full"], out_full = trackers["full"].step(
                states["full"], rgb, depth, occ
            )
            dev["full"].append(
                np.linalg.norm(np.asarray(states["full"].y) - ref, axis=1).mean()
            )
            gt = rope.nodes(t, m)
            gt_err["full"].append(
                np.linalg.norm(np.asarray(states["full"].y) - gt, axis=1).mean()
            )

        if "same_pts" in want:
            # same_pts: jitted tracker on the oracle's cloud (f32 effects only).
            states["same_pts"], _ = trackers["same_pts"].step_from_points(
                states["same_pts"], oracle_pts
            )
            dev["same_pts"].append(
                np.linalg.norm(np.asarray(states["same_pts"].y) - ref, axis=1).mean()
            )

        if "oracle_jp" in want:
            # oracle_jp: f64 oracle on the jitted preprocessing's cloud
            # (downsample-detail effects only).
            jp = np.asarray(out_full.points)[np.asarray(out_full.points_mask)]
            ojp_state, _, _ = step_frame(
                ojp_state, rgb, depth, params, intr, occ, points=jp
            )
            dev["oracle_jp"].append(np.linalg.norm(ojp_state.y - ref, axis=1).mean())

        if "lstsq" in want:
            # lstsq: ship config with the COD-semantics solver.
            states["lstsq"], _ = trackers["lstsq"].step(
                states["lstsq"], rgb, depth, occ
            )
            dev["lstsq"].append(
                np.linalg.norm(np.asarray(states["lstsq"].y) - ref, axis=1).mean()
            )

        if "split" in want:
            # split: parity-split preprocessing, full jitted pipeline.
            states["split"], _ = trackers["split"].step(
                states["split"], rgb, depth, occ
            )
            dev["split"].append(
                np.linalg.norm(np.asarray(states["split"].y) - ref, axis=1).mean()
            )

        gt_err["oracle"].append(
            np.linalg.norm(o_state.y - rope.nodes(t, m), axis=1).mean()
        )

        line = " | ".join(
            f"{k} {dev[k][-1]*1000:6.3f}" for k in all_runs if k in want
        )
        gt_bits = f"oracle {gt_err['oracle'][-1]*1000:5.2f}"
        if "full" in want:
            gt_bits = f"jit {gt_err['full'][-1]*1000:5.2f} " + gt_bits
        print(f"frame {i:3d}: {line} mm | gt: {gt_bits}")

    print("\n=== summary (mm, vs f64 oracle closed loop) ===")
    out = {}
    for k, v in dev.items():
        v = np.asarray(v) * 1000
        out[k] = {"mean": round(float(v.mean()), 4),
                  "max": round(float(v.max()), 4),
                  "final": round(float(v[-1]), 4)}
        print(f"{k:10s} mean {v.mean():6.3f}  max {v.max():6.3f}  final {v[-1]:6.3f}")
    for k, v in gt_err.items():
        if not v:
            continue
        v = np.asarray(v) * 1000
        print(f"gt:{k:8s} mean {v.mean():6.3f}  max {v.max():6.3f}")
        out[f"gt_{k}"] = {"mean": round(float(v.mean()), 4), "max": round(float(v.max()), 4)}

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

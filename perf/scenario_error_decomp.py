"""Decompose the two high-error scenarios' (E1+E2)/2 score (VERDICT r3 #8).

`stationary` (6.40 mm mean) and `short_rope_stationary` (9.04 mm mean) carry
the highest long-horizon error of the six synthetic reference-bag analogs
(RESULTS.md). The scenario runs already score against EXACT synthetic GT
(examples/run_scenarios.py passes gt_nodes=gt), so blob-detection error is
NOT in those numbers — this script attributes the millimetres that remain:

- per-frame error tagged with the occlusion schedule phase (pre-occlusion vs
  occluded scoring) and the tracker's dispatch state;
- the blob-GT protocol score on the same run, for the blob-vs-exact delta
  the reference's protocol would add (evaluator.cpp:153-231);
- error of the OCCLUDED node subset vs the visible subset (is the error
  where the tracker cannot see?).

Usage: python perf/scenario_error_decomp.py [--frames 105]
Writes perf/scenario_error_decomp.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=105)
    args = ap.parse_args()

    import jax

    if jax.default_backend() not in ("tpu",):
        jax.config.update("jax_platforms", "cpu")

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.evaluation.evaluator import (
        extract_marker_ground_truth, piecewise_error,
    )
    from trackdlo_tpu.evaluation.occlusion import (
        OcclusionSchedule, gt_bbox_rect, rect_mask,
    )
    from trackdlo_tpu.evaluation.runner import SCENARIO_RECTS
    from trackdlo_tpu.evaluation.scenarios import generate, make_scenario
    from trackdlo_tpu.models.trackdlo import Tracker
    from trackdlo_tpu.utils.profiling import OCCLUSION_STATE_NAMES

    params = live_params()
    intr = CameraIntrinsics()
    proj = intr.proj_matrix()
    h, w = intr.height, intr.width
    out = {}

    for name in ("stationary", "short_rope_stationary"):
        sc = make_scenario(name)
        frames, gt, rate = generate(sc, args.frames, intr, params.M, markers=12)
        schedule = OcclusionSchedule.for_scenario(name, rate)
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(gt[0])

        recs = []
        head = None
        for i, (rgb, depth) in enumerate(frames):
            t = (i + 1) * (1.0 / 15.0) / rate
            if schedule.finished(t):
                break
            y_true = np.asarray(gt[i])
            occluding = schedule.occluding(t)
            occlusion_mask = None
            rect = None
            if occluding:
                rect = SCENARIO_RECTS.get(name) or gt_bbox_rect(
                    y_true, 25, proj, h, w
                )
                occlusion_mask = rect_mask(h, w, rect)
            state, outp = tracker.step(state, rgb, depth, occlusion_mask)
            if not schedule.recording(t):
                continue
            y_track = np.asarray(state.y)
            err = piecewise_error(y_track, y_true) * 1000

            # blob-GT protocol score on the same frame (markers rendered)
            blob_gt = extract_marker_ground_truth(
                rgb, depth, intr, head=head, gate=name
            )
            if len(blob_gt) >= 2:
                head = blob_gt[0]
                err_blob = piecewise_error(y_track, blob_gt) * 1000
            else:
                err_blob = float("nan")

            # which GT nodes sit inside the occlusion rectangle?
            occ_nodes = np.zeros(len(y_true), bool)
            if rect is not None:
                uvw = (proj @ np.concatenate(
                    [y_true, np.ones((len(y_true), 1))], axis=1).T)
                uu, vv = uvw[0] / uvw[2], uvw[1] / uvw[2]
                x1, y1, x2, y2 = rect
                occ_nodes = (uu >= x1) & (uu <= x2) & (vv >= y1) & (vv <= y2)
            d_nodes = np.linalg.norm(y_track - y_true, axis=1) * 1000
            recs.append(dict(
                frame=i, t=t, err=float(err), err_blob=float(err_blob),
                occluding=bool(occluding),
                state=OCCLUSION_STATE_NAMES[int(outp.occlusion_state)],
                err_occluded_nodes=float(d_nodes[occ_nodes].mean())
                if occ_nodes.any() else float("nan"),
                err_visible_nodes=float(d_nodes[~occ_nodes].mean())
                if (~occ_nodes).any() else float("nan"),
            ))

        errs = np.array([r["err"] for r in recs])
        pre = np.array([r["err"] for r in recs if not r["occluding"]])
        occ = np.array([r["err"] for r in recs if r["occluding"]])
        blob = np.array([r["err_blob"] for r in recs
                         if np.isfinite(r["err_blob"])])
        vis_n = np.array([r["err_visible_nodes"] for r in recs
                          if np.isfinite(r["err_visible_nodes"])])
        occ_n = np.array([r["err_occluded_nodes"] for r in recs
                          if np.isfinite(r["err_occluded_nodes"])])
        summary = dict(
            scored=len(errs),
            mean=float(errs.mean()),
            mean_pre_occlusion=float(pre.mean()) if len(pre) else None,
            n_pre_occlusion=int(len(pre)),
            mean_while_occluding=float(occ.mean()) if len(occ) else None,
            mean_blob_gt=float(blob.mean()) if len(blob) else None,
            n_blob_frames=int(len(blob)),
            mean_visible_nodes=float(vis_n.mean()) if len(vis_n) else None,
            mean_occluded_nodes=float(occ_n.mean()) if len(occ_n) else None,
            states=sorted({r["state"] for r in recs}),
            first_scored_state=recs[0]["state"] if recs else None,
            first_scored_occluding=recs[0]["occluding"] if recs else None,
        )
        out[name] = dict(summary=summary, frames=recs)
        print(name, json.dumps(summary, indent=1))

    path = os.path.join(os.path.dirname(__file__), "scenario_error_decomp.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()

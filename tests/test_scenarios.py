"""Scenario generators, runner image output, GT gates, step_from_points."""

import os

import numpy as np
import pytest

from trackdlo_tpu.config import CameraIntrinsics, live_params
from trackdlo_tpu.evaluation import EvalConfig, OcclusionSchedule, run_evaluation
from trackdlo_tpu.evaluation.evaluator import SCENARIO_GT_GATES
from trackdlo_tpu.evaluation.scenarios import ALL_SCENARIOS, generate, make_scenario
from trackdlo_tpu.io.sequence import FoldingRope, MovingRope, SyntheticRope
from trackdlo_tpu.models.trackdlo import Tracker


class TestGenerators:
    def test_folding_preserves_length(self):
        fold = FoldingRope()
        base = None
        for t in [0.0, 2.0, 4.0, 8.0]:
            c = fold.curve(t)
            ln = np.linalg.norm(np.diff(c, axis=0), axis=1).sum()
            base = base or ln
            assert abs(ln - base) / base < 0.02
        # Folded: the tips approach each other far closer than the length.
        tips = np.linalg.norm(fold.curve(12.0)[0] - fold.curve(12.0)[-1])
        assert tips < 0.45 * fold.length

    def test_folding_straight_at_start(self):
        c = FoldingRope(fold_start=1.0).curve(0.0)
        # Heading spread tiny -> straight.
        d = np.diff(c, axis=0)
        angles = np.arctan2(d[:, 1], d[:, 0])
        assert np.ptp(angles) < 0.02

    def test_moving_rope_translates(self):
        perp = MovingRope(axis=(0, 1, 0), amplitude=0.1, period=8.0, base_motion=0.0)
        c0 = perp.curve(0.0)
        c2 = perp.curve(2.0)  # quarter period: offset = amplitude
        np.testing.assert_allclose(c2 - c0, [[0.0, 0.1, 0.0]] * len(c0), atol=1e-9)

    def test_all_scenarios_build_and_project_in_frame(self):
        intr = CameraIntrinsics()
        for name in ALL_SCENARIOS:
            sc = make_scenario(name)
            for t in np.linspace(0.5, sc.horizon_s, 7):
                pts = sc.rope.curve(t)
                u = pts[:, 0] / pts[:, 2] * intr.fx + intr.cx
                v = pts[:, 1] / pts[:, 2] * intr.fy + intr.cy
                assert u.min() > -60 and u.max() < intr.width + 60, (name, t)
                assert v.min() > -60 and v.max() < intr.height + 60, (name, t)


class TestGtGates:
    def test_perpendicular_gate_matches_reference_predicate(self):
        g = SCENARIO_GT_GATES["perpendicular_motion"]
        pts = np.array([
            [-0.1, 0.0, 0.7],   # x<0 & y<0.05 -> drop
            [-0.25, 0.2, 0.7],  # x<-0.2 -> drop
            [0.05, -0.1, 0.7],  # x<0.1 & y<-0.05 -> drop
            [0.2, 0.1, 0.5],    # z<0.58 -> drop
            [0.2, 0.1, 0.7],    # keep
        ])
        np.testing.assert_array_equal(g(pts), [False, False, False, False, True])

    def test_parallel_gate_matches_reference_predicate(self):
        g = SCENARIO_GT_GATES["parallel_motion"]
        pts = np.array([
            [-0.2, 0.0, 0.7],   # x<-0.15 -> drop
            [0.0, -0.2, 0.7],   # y<-0.15 -> drop
            [0.0, 0.0, 0.5],    # z<0.58 -> drop
            [0.0, 0.0, 0.7],    # keep
        ])
        np.testing.assert_array_equal(g(pts), [False, False, False, True])

    def test_gate_by_name_in_extraction(self):
        from trackdlo_tpu.evaluation.evaluator import extract_marker_ground_truth
        from trackdlo_tpu.io.sequence import render_frame

        intr = CameraIntrinsics()
        rope = SyntheticRope()
        rgb, depth = render_frame(rope, 0.0, intr, markers=10)
        all_pts = extract_marker_ground_truth(rgb, depth, intr)
        gated = extract_marker_ground_truth(rgb, depth, intr, gate="default")
        # Synthetic rope sits at z in [0.62, 0.68]: the default depth gate
        # keeps everything.
        assert len(gated) == len(all_pts) >= 8


class TestRunnerImagesAndFiles:
    def test_runner_emits_error_file_and_images(self, tmp_path):
        intr = CameraIntrinsics(
            fx=240.0, fy=240.0, cx=160.0, cy=120.0, width=320, height=240
        )
        params = live_params(max_points=512, downsample_cell_px=4)
        sc = make_scenario("short_rope_stationary")
        frames, gt, rate = generate(sc, 24, intr, params.M)
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(gt[0])
        config = EvalConfig(
            scenario="short_rope_stationary",
            save_location=str(tmp_path),
            save_images=True,
            image_interval_s=2.0,
            rate=rate,
        )
        res = run_evaluation(tracker, state, frames, config, intr, gt_nodes=gt)
        assert len(res.errors) > 0
        assert res.mean_error < 0.02
        files = os.listdir(tmp_path)
        assert config.error_filename in files
        pngs = [f for f in files if f.endswith(".png") or f.endswith(".npy")]
        assert len(pngs) >= 2, files


class TestStepFromPoints:
    def test_matches_full_step_on_same_cloud(self):
        intr = CameraIntrinsics(
            fx=120.0, fy=120.0, cx=80.0, cy=60.0, width=160, height=120
        )
        params = live_params(max_points=256, downsample_cell_px=4)
        rope = SyntheticRope()
        from trackdlo_tpu.io.sequence import render_frame

        t1 = Tracker(params, intr)
        t2 = Tracker(params, intr)
        s1 = t1.init_from_nodes(rope.nodes(0.0, params.M))
        s2 = t2.init_from_nodes(rope.nodes(0.0, params.M))
        rgb, depth = render_frame(rope, 1 / 15.0, intr, rope_pixel_radius=3)
        s1n, out = t1.step(s1, rgb, depth)
        pts = np.asarray(out.points)[np.asarray(out.points_mask)]
        s2n, _ = t2.step_from_points(s2, pts)
        np.testing.assert_allclose(
            np.asarray(s2n.y), np.asarray(s1n.y), atol=1e-5
        )

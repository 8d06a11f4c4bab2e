"""Evaluation-harness tests: metric parity, GT extraction, occlusion
schedules, end-to-end scoring runs."""

import numpy as np
import pytest

from trackdlo_tpu.config import CameraIntrinsics, live_params
from trackdlo_tpu.evaluation import (
    EvalConfig,
    OcclusionSchedule,
    extract_marker_ground_truth,
    gt_bbox_rect,
    piecewise_error,
    piecewise_error_batch,
    rect_mask,
    run_evaluation,
)
from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
from trackdlo_tpu.models.trackdlo import Tracker


@pytest.fixture(scope="module")
def setup():
    return live_params(), CameraIntrinsics(), SyntheticRope()


class TestPiecewiseError:
    def test_identical_curves_zero(self):
        y = SyntheticRope().nodes(0.0, 30)
        assert piecewise_error(y, y) < 1e-12

    def test_known_offset(self):
        # A straight line offset perpendicular by d has error exactly d.
        y = np.zeros((10, 3))
        y[:, 0] = np.linspace(0, 1, 10)
        y2 = y + np.array([0, 0.01, 0])
        assert abs(piecewise_error(y, y2) - 0.01) < 1e-9

    def test_oracle_vs_cpp_semantics(self):
        # E1 uses track→true, E2 true→track; asymmetric curves give different
        # directional errors but the metric averages them.
        y_true = SyntheticRope().nodes(0.0, 37)
        y_track = SyntheticRope().nodes(0.1, 45)
        e = piecewise_error(y_track, y_true)
        assert 0 < e < 0.05

    def test_batched_matches_scalar(self):
        rope = SyntheticRope()
        tracks = np.stack([rope.nodes(t, 45) for t in (0.0, 0.3)])
        trues = np.stack([rope.nodes(t + 0.05, 40) for t in (0.0, 0.3)])
        batched = piecewise_error_batch(tracks, trues)
        for b in range(2):
            assert abs(batched[b] - piecewise_error(tracks[b], trues[b])) < 1e-6


class TestMarkerGroundTruth:
    def test_extracts_ordered_markers(self, setup):
        params, intr, rope = setup
        rgb, depth = render_frame(rope, 0.0, intr, markers=10)
        gt = extract_marker_ground_truth(rgb, depth, intr)
        assert 8 <= len(gt) <= 12  # ~10 bands detected
        # Ordered chain: consecutive spacing is regular (uniform arc bands).
        seg = np.linalg.norm(np.diff(gt, axis=0), axis=1)
        assert seg.max() < 3.0 * seg.min() + 1e-9
        # Markers lie on the rope curve.
        curve = rope.curve(0.0)
        d = np.linalg.norm(gt[:, None, :] - curve[None, :, :], axis=2).min(axis=1)
        assert d.max() < 0.01

    def test_head_anchor_orients_chain(self, setup):
        params, intr, rope = setup
        rgb, depth = render_frame(rope, 0.0, intr, markers=10)
        gt1 = extract_marker_ground_truth(rgb, depth, intr)
        gt2 = extract_marker_ground_truth(rgb, depth, intr, head=gt1[-1])
        np.testing.assert_allclose(gt2, gt1[::-1])


class TestOcclusion:
    def test_rect_mask(self):
        m = rect_mask(100, 200, (10, 20, 30, 40))
        assert not m[20:41, 10:31].any()
        assert m[:20].all() and m[41:].all()

    def test_gt_bbox_rect(self, setup):
        params, intr, rope = setup
        y = rope.nodes(0.0, 40)
        rect = gt_bbox_rect(y, 25, intr.proj_matrix(), intr.height, intr.width)
        x1, y1, x2, y2 = rect
        assert x1 < x2 and y1 < y2
        # First 10 nodes project inside the rectangle.
        h = np.hstack([y[:10], np.ones((10, 1))])
        img = (intr.proj_matrix() @ h.T).T
        px = img[:, 0] / img[:, 2]
        py = img[:, 1] / img[:, 2]
        assert ((px >= x1) & (px <= x2) & (py >= y1) & (py <= y2)).all()

    def test_zero_pct_no_rect(self, setup):
        params, intr, rope = setup
        y = rope.nodes(0.0, 40)
        assert gt_bbox_rect(y, 1, intr.proj_matrix(), intr.height, intr.width) is None

    def test_schedule(self):
        s = OcclusionSchedule(start_record_at=2.0, wait_before_occlusion=1.0, exit_at=5.0)
        assert not s.recording(1.0)
        assert s.recording(2.5) and not s.occluding(2.5)
        assert s.occluding(3.5)
        assert s.finished(5.5)


class TestRunner:
    def test_full_evaluation_run(self, setup, tmp_path):
        params, intr, rope = setup
        frames, gt = [], []
        for i in range(6):
            t = i / 15.0
            frames.append(render_frame(rope, t, intr, markers=12))
            gt.append(rope.nodes(t, params.M))

        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(gt[0])
        config = EvalConfig(
            scenario="stationary",
            pct_occlusion=25,
            save_location=str(tmp_path),
            dt=1.0 / 15.0,
        )
        schedule = OcclusionSchedule(
            start_record_at=0.0, wait_before_occlusion=2.5 / 15.0, exit_at=None
        )
        result = run_evaluation(
            tracker, state, frames, config, intr, gt_nodes=np.array(gt),
            schedule=schedule,
        )
        assert len(result.errors) == 6
        assert result.mean_error < 0.01
        # Error file in the reference format.
        path = tmp_path / "trackdlo_0_25_stationary_error.txt"
        assert path.exists()
        lines = path.read_text().strip().split("\n")
        assert len(lines) == 6
        t0, e0 = map(float, lines[0].split())
        assert e0 == pytest.approx(result.errors[0], abs=1e-5)

    def test_marker_gt_evaluation(self, setup, tmp_path):
        # Score against blob-extracted ground truth instead of exact GT.
        params, intr, rope = setup
        frames = [render_frame(rope, i / 15.0, intr, markers=12) for i in range(4)]
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        config = EvalConfig(save_errors=False)
        schedule = OcclusionSchedule(start_record_at=0.0, wait_before_occlusion=99.0)
        result = run_evaluation(tracker, state, frames, config, intr, schedule=schedule)
        assert len(result.errors) == 4
        # Marker GT is sparse (12 bands) but errors stay small.
        assert result.mean_error < 0.01


class TestSweep:
    def test_occlusion_sweep_parallel(self, setup):
        from trackdlo_tpu.evaluation.sweep import occlusion_sweep

        params, intr, rope = setup
        frames, gt = [], []
        for i in range(5):
            t = i / 15.0
            frames.append(render_frame(rope, t, intr))
            gt.append(rope.nodes(t, params.M))
        pcts, errors = occlusion_sweep(
            params, intr, frames, np.array(gt), gt[0],
            pct_values=(0, 30, 60), occlude_from_frame=1,
        )
        assert errors.shape == (3, 5)
        # Unoccluded trial tracks tightly; occlusion degrades gracefully.
        assert errors[0, -1] < 0.006
        assert errors[2, -1] < 0.05
        assert errors[2].mean() >= errors[0].mean() - 1e-4


class TestConfigLoader:
    def test_reference_param_names(self, tmp_path):
        import json

        from trackdlo_tpu.config import params_from_json

        data = {
            "beta": 0.5,
            "lambda": 50000,
            "alpha": 3,
            "mu": 0.1,
            "max_iter": 50,
            "tol": 0.0002,
            "k_vis": 500,
            "d_vis": 0.06,
            "visibility_threshold": 0.005,
            "dlo_pixel_width": 30,
            "beta_pre_proc": 3.0,
            "lambda_pre_proc": 1.0,
            "lle_weight": 10.0,
            "downsample_leaf_size": 0.005,
            "multi_color_dlo": True,
            "num_of_nodes": 40,
            "hsv_threshold_upper_limit": "130 255 255",
            "hsv_threshold_lower_limit": "90 90 30",
        }
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps(data))
        params = params_from_json(str(p))
        assert params.lam == 50000
        assert params.hsv_lower == (90, 90, 30)
        assert params.num_of_nodes == 40
        # Matches the shipped eval preset exactly: since round 3 the default
        # profile (parity_split on) IS the reference-exact pipeline, so a
        # reference launch file loads to the same params as the preset.
        from trackdlo_tpu.config import eval_params

        assert params == eval_params()

    def test_unknown_key_raises(self):
        from trackdlo_tpu.config import params_from_dict

        with pytest.raises(KeyError):
            params_from_dict({"nonsense": 1})


class TestScenarioRects:
    def test_fixed_rectangle_scenario(self, setup, tmp_path):
        # Exercises the hardcoded-rectangle branch (run_evaluation.cpp:235-277)
        # via a scenario name with a fixed occlusion rect.
        params, intr, rope = setup
        frames, gt = [], []
        for i in range(5):
            t = i / 15.0
            frames.append(render_frame(rope, t, intr))
            gt.append(rope.nodes(t, params.M))
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(gt[0])
        config = EvalConfig(
            scenario="parallel_motion", save_location=str(tmp_path), trial=1,
        )
        schedule = OcclusionSchedule(start_record_at=0.0, wait_before_occlusion=0.1)
        res = run_evaluation(
            tracker, state, frames, config, intr, gt_nodes=np.array(gt),
            schedule=schedule,
        )
        assert (tmp_path / "trackdlo_1_25_parallel_motion_error.txt").exists()
        assert res.mean_error < 0.02

"""Tests for visualization, tooling, profiling, and checkpoint IO."""

import logging

import numpy as np
import pytest

from trackdlo_tpu.config import CameraIntrinsics, live_params
from trackdlo_tpu.io.checkpoint import load_state, save_state
from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
from trackdlo_tpu.models.trackdlo import Tracker
from trackdlo_tpu.oracle.preprocess import segment_dlo
from trackdlo_tpu.tools.color_picker import coverage, suggest_hsv_bounds
from trackdlo_tpu.tools.mask_preview import mask_stats, preview_mask
from trackdlo_tpu.tools.record import SequenceRecorder
from trackdlo_tpu.tools.simulate_occlusion import OcclusionSimulator
from trackdlo_tpu.utils.profiling import PhaseTimers, log_step_outputs
from trackdlo_tpu.utils.viz import draw_tracking_overlay, geometry_markers


@pytest.fixture(scope="module")
def scene():
    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    rgb, depth = render_frame(rope, 0.0, intr)
    return params, intr, rope, rgb, depth


class TestViz:
    def test_overlay_draws_nodes(self, scene):
        params, intr, rope, rgb, depth = scene
        y = rope.nodes(0.0, params.M)
        img = draw_tracking_overlay(rgb, y, intr.proj_matrix())
        assert img.shape == rgb.shape
        assert (img != rgb).any()  # something drawn

    def test_overlay_occlusion_label(self, scene):
        params, intr, rope, rgb, depth = scene
        occ = np.ones((intr.height, intr.width), np.uint8)
        occ[:, 500:800] = 0
        img = draw_tracking_overlay(
            rgb, rope.nodes(0.0, params.M), intr.proj_matrix(), occlusion_mask=occ
        )
        # The occluded region is dimmed.
        assert img[:, 600:700].mean() < rgb[:, 600:700].mean()

    def test_markers_structure(self, scene):
        params, intr, rope, *_ = scene
        y = rope.nodes(0.0, 10)
        vis = np.ones(10, bool)
        vis[4] = False
        markers = geometry_markers(y, visible=vis)
        spheres = [m for m in markers if m["type"] == "sphere"]
        cylinders = [m for m in markers if m["type"] == "cylinder"]
        assert len(spheres) == 10 and len(cylinders) == 9
        # Occluded node gets the occluded colour; its two edges too.
        assert spheres[4]["color"] == [1.0, 0.0, 0.0, 1.0]
        # Cylinder scale z equals segment length; orientation is unit quat.
        seg = np.linalg.norm(y[1] - y[0])
        assert cylinders[0]["scale"][2] == pytest.approx(seg)
        q = np.array(cylinders[0]["orientation"])
        assert np.linalg.norm(q) == pytest.approx(1.0, abs=1e-6)


class TestTools:
    def test_color_picker_suggests_working_bounds(self, scene):
        params, intr, rope, rgb, depth = scene
        region = segment_dlo(rgb, params.hsv_lower, params.hsv_upper, False)
        lower, upper = suggest_hsv_bounds(rgb, region)
        assert coverage(rgb, lower, upper, region) > 0.9

    def test_mask_preview(self, scene):
        params, intr, rope, rgb, depth = scene
        img = preview_mask(rgb, params)
        stats = mask_stats(rgb, params)
        assert img.shape == rgb.shape
        assert 0.001 < stats["fraction"] < 0.2

    def test_occlusion_simulator_moves(self):
        sim = OcclusionSimulator(height=100, width=200, rect=(10, 10, 30, 30),
                                 velocity=(5, 0))
        m0 = sim.mask_at(0)
        m5 = sim.mask_at(5)
        assert not m0[15, 15] and m5[15, 15]
        assert not m5[15, 40]

    def test_recorder_roundtrip(self, scene, tmp_path):
        params, intr, rope, rgb, depth = scene
        rec = SequenceRecorder()
        rec.record(rgb, depth)
        rec.record(rgb, depth)
        path = rec.save(str(tmp_path / "seq.npz"))
        data = np.load(path)
        assert data["rgbs"].shape[0] == 2


class TestProfilingAndCheckpoint:
    def test_phase_timers_report(self):
        timers = PhaseTimers()
        with timers.phase("pre_processing"):
            pass
        with timers.phase("tracking_step"):
            pass
        rep = timers.report()
        assert "pre_processing" in rep and "Avg total" in rep

    def test_log_step_outputs(self, scene, caplog):
        params, intr, rope, rgb, depth = scene
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        state, out = tracker.step(state, rgb, depth)
        with caplog.at_level(logging.INFO, logger="trackdlo_tpu"):
            log_step_outputs(out, frame_idx=0)
        assert "visible" in caplog.text or "occluded" in caplog.text

    def test_checkpoint_roundtrip(self, scene, tmp_path):
        params, intr, rope, rgb, depth = scene
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        state, _ = tracker.step(state, rgb, depth)
        p = save_state(str(tmp_path / "state.npz"), state)
        restored = load_state(p)
        np.testing.assert_allclose(np.asarray(restored.y), np.asarray(state.y))
        s2_a, _ = tracker.step(state, rgb, depth)
        s2_b, _ = tracker.step(restored, rgb, depth)
        np.testing.assert_allclose(np.asarray(s2_a.y), np.asarray(s2_b.y), atol=1e-7)


class TestLiveView:
    def test_records_video_frames(self, tmp_path):
        """rviz/tracking.rviz equivalent: overlay + cloud dots per frame,
        recorded to a video file."""
        import numpy as np

        from trackdlo_tpu.config import CameraIntrinsics, live_params
        from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
        from trackdlo_tpu.models.trackdlo import Tracker
        from trackdlo_tpu.tools.live_view import LiveView

        intr = CameraIntrinsics(
            fx=120.0, fy=120.0, cx=80.0, cy=60.0, width=160, height=120
        )
        params = live_params(max_points=256, downsample_cell_px=4)
        rope = SyntheticRope()
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        out_file = str(tmp_path / "view.mp4")
        view = LiveView(tracker, out_path=out_file)
        for i in range(1, 4):
            rgb, depth = render_frame(rope, i / 15.0, intr, rope_pixel_radius=3)
            state, out = tracker.step(state, rgb, depth)
            img = view.show(rgb, state, out)
            assert img.shape == (intr.height, intr.width, 3)
        view.close()
        assert view.frames_shown == 3
        import os

        assert os.path.getsize(out_file) > 0

"""Edge cases and robustness: eval preset, empty frames, NaN discipline,
sequence IO round trips."""

import jax
import numpy as np
import pytest

from trackdlo_tpu.config import CameraIntrinsics, eval_params, live_params
from trackdlo_tpu.io.sequence import (
    SyntheticRope,
    load_sequence,
    render_frame,
    save_sequence,
    synthetic_sequence,
)
from trackdlo_tpu.models.trackdlo import Tracker


class TestEvalPreset:
    def test_multi_color_tracks_marker_rope(self):
        # The eval profile segments blue + red/yellow tape bands
        # (color_thresholding, trackdlo_node.cpp:88-119) — markers must be
        # part of the cloud, not holes in it.
        params = eval_params()
        intr = CameraIntrinsics()
        rope = SyntheticRope()
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        for i in range(1, 4):
            rgb, depth = render_frame(rope, i / 15.0, intr, markers=12)
            state, out = tracker.step(state, rgb, depth)
        gt = rope.nodes(3 / 15.0, params.M)
        err = np.linalg.norm(np.asarray(state.y) - gt, axis=1).mean()
        assert err < 0.008
        # Marker bands did not punch holes into the cloud: point count is in
        # the same range as the single-colour live profile would see.
        assert int(out.n_points) > 200


class TestEmptyFrame:
    def test_blank_frame_keeps_state(self):
        params = live_params()
        intr = CameraIntrinsics()
        rope = SyntheticRope()
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        y_before = np.asarray(state.y).copy()  # step donates its state arg
        blank_rgb = np.zeros((intr.height, intr.width, 3), np.uint8)
        blank_depth = np.zeros((intr.height, intr.width), np.uint16)
        new_state, out = tracker.step(state, blank_rgb, blank_depth)
        assert int(out.n_points) == 0
        np.testing.assert_allclose(np.asarray(new_state.y), y_before, atol=1e-6)
        assert np.isfinite(np.asarray(new_state.sigma2))

    def test_fully_occluded_frame_keeps_state(self):
        params = live_params()
        intr = CameraIntrinsics()
        rope = SyntheticRope()
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        y_before = np.asarray(state.y).copy()
        rgb, depth = render_frame(rope, 1 / 15.0, intr)
        occ = np.zeros((intr.height, intr.width), np.uint8)  # occlude all
        new_state, out = tracker.step(state, rgb, depth, occ)
        assert int(out.n_points) == 0
        np.testing.assert_allclose(np.asarray(new_state.y), y_before, atol=1e-6)


class TestNanDiscipline:
    def test_step_under_debug_nans(self):
        # The SURVEY's sanitizer analogue: a normal step must not generate
        # NaNs anywhere in the graph (jax debug_nans raises if it does).
        params = live_params(max_points=256, downsample_cell_px=8)
        intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=80.0, cy=60.0,
                                width=160, height=120)
        rope = SyntheticRope()
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        rgb, depth = render_frame(rope, 1 / 15.0, intr, rope_pixel_radius=3)
        try:
            jax.config.update("jax_debug_nans", True)
            state, out = tracker.step(state, rgb, depth)
            _ = np.asarray(state.y)
        finally:
            jax.config.update("jax_debug_nans", False)
        assert np.isfinite(np.asarray(state.y)).all()


class TestSequenceIO:
    def test_npz_roundtrip(self, tmp_path):
        intr = CameraIntrinsics(fx=100, fy=100, cx=60, cy=40, width=120, height=80)
        frames, gt = synthetic_sequence(3, intrinsics=intr, rope_pixel_radius=3)
        p = str(tmp_path / "seq.npz")
        save_sequence(p, frames, gt)
        frames2, gt2 = load_sequence(p)
        assert len(frames2) == 3
        np.testing.assert_array_equal(frames2[1][0], frames[1][0])
        np.testing.assert_allclose(gt2, gt)


class TestMultiColorInit:
    def test_green_tip_orients_chain(self):
        # Multi-colour init: the green-tape tip end must come first
        # (initialize.py:93-97), and the <0.57 m depth gate applies.
        from trackdlo_tpu.config import eval_params
        from trackdlo_tpu.dlo_init.api import skeleton_initialize

        params = eval_params()
        intr = CameraIntrinsics()
        rope = SyntheticRope()
        rgb, depth = render_frame(rope, 0.0, intr, markers=10, green_tip=True)
        nodes = skeleton_initialize(rgb, depth, params, intr)
        gt = rope.nodes(0.0, params.M)
        # The renderer paints the tip at the head (arc start): node 0 of the
        # result must be the head end, not the tail.
        d_head = np.linalg.norm(nodes[0] - gt[0])
        d_tail = np.linalg.norm(nodes[0] - gt[-1])
        assert d_head < d_tail
        err = np.linalg.norm(nodes - gt, axis=1).mean()
        assert err < 0.01

"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trackdlo_tpu.config import CameraIntrinsics, live_params
from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
from trackdlo_tpu.models.trackdlo import Tracker, init_state
from trackdlo_tpu.parallel import (
    build_batched_step_fn,
    build_parallel_step_fn,
    make_tracking_mesh,
    replicate_state,
)


@pytest.fixture(scope="module")
def small_setup():
    # Tiny frames keep multi-device compiles fast; divisible by cell sizes.
    intr = CameraIntrinsics(
        fx=120.0, fy=120.0, cx=80.0, cy=60.0, width=160, height=120
    )
    params = live_params(max_points=256, downsample_cell_px=4)
    rope = SyntheticRope()
    return params, intr, rope


def _frames(rope, intr, batch, t=1.0 / 15.0):
    rgbs, depths = [], []
    for b in range(batch):
        rgb, depth = render_frame(rope, t + 0.01 * b, intr, rope_pixel_radius=3)
        rgbs.append(rgb)
        depths.append(depth)
    occ = np.ones((batch, intr.height, intr.width), bool)
    return (
        jnp.asarray(np.stack(rgbs)),
        jnp.asarray(np.stack(depths)),
        jnp.asarray(occ),
    )


def test_eight_devices_available():
    assert len(jax.devices()) == 8


class TestBatchedDP:
    def test_batched_matches_single(self, small_setup):
        params, intr, rope = small_setup
        tracker = Tracker(params, intr)
        state0 = tracker.init_from_nodes(rope.nodes(0.0, params.M))

        batch = 8
        rgbs, depths, occ = _frames(rope, intr, batch)
        mesh = make_tracking_mesh()
        fn = build_batched_step_fn(params, intr, mesh)
        bstate = replicate_state(state0, batch)
        new_bstate, outs = fn(bstate, rgbs, depths, occ)

        # Stream 3 must equal a single-stream run on the same frame.
        s_single, _ = tracker.step(state0, np.asarray(rgbs[3]), np.asarray(depths[3]))
        np.testing.assert_allclose(
            np.asarray(new_bstate.y[3]), np.asarray(s_single.y), atol=1e-5
        )

    def test_cohort_split_is_bitwise_identical(self, small_setup):
        """Convergence cohorts (r5, VERDICT r4 #6): splitting a stream batch
        into independent cohort while_loops changes ONLY the loop schedule —
        lax.while_loop's batching rule freezes converged elements by select,
        so each stream's math is independent of its lockstep grouping. The
        large-batch perf mode must therefore be BITWISE equal to the
        single-loop batch."""
        params, intr, rope = small_setup
        tracker = Tracker(params, intr)
        state0 = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        batch = 8
        rgbs, depths, occ = _frames(rope, intr, batch)
        bstate = replicate_state(state0, batch)
        fn_lock = build_batched_step_fn(params, intr)
        fn_coh = build_batched_step_fn(params, intr, cohort_size=2)
        s_lock, _ = fn_lock(
            jax.tree.map(lambda v: v.copy(), bstate), rgbs, depths, occ
        )
        s_coh, _ = fn_coh(
            jax.tree.map(lambda v: v.copy(), bstate), rgbs, depths, occ
        )
        np.testing.assert_array_equal(
            np.asarray(s_lock.y), np.asarray(s_coh.y)
        )
        np.testing.assert_array_equal(
            np.asarray(s_lock.sigma2), np.asarray(s_coh.sigma2)
        )

    def test_cohort_size_must_divide_batch(self, small_setup):
        params, intr, rope = small_setup
        rgbs, depths, occ = _frames(rope, intr, 6)
        state0 = init_state(rope.nodes(0.0, params.M), params)
        fn = build_batched_step_fn(params, intr, cohort_size=4)
        with pytest.raises(ValueError, match="not divisible"):
            fn(replicate_state(state0, 6), rgbs, depths, occ)

    def test_distinct_streams_track_distinct_poses(self, small_setup):
        params, intr, rope = small_setup
        tracker = Tracker(params, intr)
        state0 = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        rgbs, depths, occ = _frames(rope, intr, 4)
        fn = build_batched_step_fn(params, intr, make_tracking_mesh(n_devices=4))
        bstate = replicate_state(state0, 4)
        new_bstate, _ = fn(bstate, rgbs, depths, occ)
        ys = np.asarray(new_bstate.y)
        assert not np.allclose(ys[0], ys[3], atol=1e-4)


class TestParallelDPxSP:
    def test_dp_sp_matches_unsharded(self, small_setup):
        params, intr, rope = small_setup
        mesh = make_tracking_mesh(model_parallel=2)  # 4 data x 2 model
        fn = build_parallel_step_fn(params, intr, mesh)

        state0 = init_state(rope.nodes(0.0, params.M), params)
        batch = 4
        rgbs, depths, occ = _frames(rope, intr, batch)
        bstate = replicate_state(state0, batch)
        new_bstate, outs = fn(bstate, rgbs, depths, occ)

        tracker = Tracker(params, intr)
        ref, _ = tracker.step(state0, np.asarray(rgbs[1]), np.asarray(depths[1]))
        err = np.abs(np.asarray(new_bstate.y[1]) - np.asarray(ref.y)).max()
        # Collective reduction order differs from single-device summation,
        # so allow small float drift.
        assert err < 1e-3, err

    def test_full_model_axis(self, small_setup):
        params, intr, rope = small_setup
        mesh = make_tracking_mesh(model_parallel=8)  # 1 data x 8 model
        fn = build_parallel_step_fn(params, intr, mesh)
        state0 = init_state(rope.nodes(0.0, params.M), params)
        rgbs, depths, occ = _frames(rope, intr, 1)
        bstate = replicate_state(state0, 1)
        new_bstate, outs = fn(bstate, rgbs, depths, occ)
        assert np.isfinite(np.asarray(new_bstate.y)).all()
        assert int(outs.n_points[0]) > 0

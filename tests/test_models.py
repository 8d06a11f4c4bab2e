"""Model-family tests: GLTP and plain CPD registration."""

import jax.numpy as jnp
import numpy as np
import pytest

from trackdlo_tpu.config import CameraIntrinsics, live_params
from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
from trackdlo_tpu.models.cpd import register_gmm
from trackdlo_tpu.models.gltp import GltpTracker
from trackdlo_tpu.oracle.cpd_lle import register_cold_start
from trackdlo_tpu.oracle.geometry import sort_pts


class TestGltp:
    def test_tracks_unoccluded(self):
        params = live_params()
        intr = CameraIntrinsics()
        rope = SyntheticRope()
        tracker = GltpTracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        for i in range(1, 4):
            rgb, depth = render_frame(rope, i / 15.0, intr)
            state, res = tracker.step(state, rgb, depth)
        gt = rope.nodes(3 / 15.0, params.M)
        err = np.linalg.norm(np.asarray(state.y) - gt, axis=1).mean()
        assert err < 0.01

    def test_same_front_end_as_flagship(self):
        """GLTP and the flagship see identical point clouds for the same
        frame (run_evaluation.cpp:457 scores algorithms on identical
        input; VERDICT r2 weak #5)."""
        import jax

        from trackdlo_tpu.models.trackdlo import (
            _resolve_use_pallas,
            preprocess_for_step,
        )
        from trackdlo_tpu.ops.preprocess import default_cell_px

        params = live_params()
        intr = CameraIntrinsics()
        rope = SyntheticRope()
        rgb, depth = render_frame(rope, 1 / 15.0, intr)
        occ = jnp.ones((intr.height, intr.width), bool)
        cell_px = params.downsample_cell_px or default_cell_px(
            params.downsample_leaf_size, intr.fx
        )
        use_pallas = _resolve_use_pallas(params)
        pc = jax.jit(
            lambda r, d, o: preprocess_for_step(
                r, d, o,
                params=params, intr=intr, cell_px=cell_px,
                use_pallas=use_pallas,
            )
        )(jnp.asarray(rgb), jnp.asarray(depth), occ)

        # The gltp step calls the SAME function with the SAME arguments —
        # assert at the call-graph level by checking the import identity,
        # then at the data level by rerunning through the gltp module path.
        import trackdlo_tpu.models.gltp as gltp_mod

        assert gltp_mod.preprocess_for_step is preprocess_for_step
        pc2 = jax.jit(
            lambda r, d, o: gltp_mod.preprocess_for_step(
                r, d, o,
                params=params, intr=intr, cell_px=cell_px,
                use_pallas=use_pallas,
            )
        )(jnp.asarray(rgb), jnp.asarray(depth), occ)
        np.testing.assert_array_equal(np.asarray(pc.points), np.asarray(pc2.points))
        np.testing.assert_array_equal(np.asarray(pc.mask), np.asarray(pc2.mask))


class TestCpdRegister:
    def test_matches_oracle(self, rope_cloud):
        ref_y, ref_s2 = register_cold_start(rope_cloud, 40, mu=0.05, max_iter=60)
        n_cap = 512
        xp = np.zeros((n_cap, 3), np.float32)
        xp[: len(rope_cloud)] = rope_cloud
        xm = np.zeros(n_cap, bool)
        xm[: len(rope_cloud)] = True
        y, s2 = register_gmm(jnp.asarray(xp), jnp.asarray(xm), m=40, mu=0.05, max_iter=60)
        err = np.linalg.norm(np.asarray(y) - ref_y, axis=1)
        assert err.max() < 1e-3
        assert abs(float(s2) - ref_s2) < 1e-5

    def test_registered_then_sorted_is_a_chain(self, rope_cloud):
        n_cap = 512
        xp = np.zeros((n_cap, 3), np.float32)
        xp[: len(rope_cloud)] = rope_cloud
        xm = np.zeros(n_cap, bool)
        xm[: len(rope_cloud)] = True
        y, _ = register_gmm(jnp.asarray(xp), jnp.asarray(xm), m=40)
        chain = sort_pts(np.asarray(y, float))
        seg = np.linalg.norm(np.diff(chain, axis=0), axis=1)
        assert seg.max() < 5 * np.median(seg)


class TestMultiTracker:
    def test_streams_track_independently(self):
        import numpy as np

        from trackdlo_tpu.config import CameraIntrinsics, live_params
        from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
        from trackdlo_tpu.models.multi import MultiTracker

        intr = CameraIntrinsics(
            fx=120.0, fy=120.0, cx=80.0, cy=60.0, width=160, height=120
        )
        params = live_params(max_points=256, downsample_cell_px=4)
        rope = SyntheticRope()
        mt = MultiTracker(params, intr)
        mt.add_stream("a", init_nodes=rope.nodes(0.0, params.M))
        mt.add_stream("b", init_nodes=rope.nodes(0.1, params.M))

        for i in range(1, 4):
            frames = {
                "a": render_frame(rope, i / 15.0, intr, rope_pixel_radius=3),
                "b": render_frame(rope, i / 15.0 + 0.1, intr, rope_pixel_radius=3),
            }
            outs = mt.step_all(frames)
        for name, t in (("a", 3 / 15.0), ("b", 3 / 15.0 + 0.1)):
            gt = rope.nodes(t, params.M)
            err = np.linalg.norm(mt.nodes(name) - gt, axis=1).mean()
            assert err < 0.015, (name, err)  # coarse 160x120 scale
        # Streams stayed distinct.
        assert not np.allclose(mt.nodes("a"), mt.nodes("b"), atol=1e-3)
        # One occluded stream does not disturb the other.
        occ = np.zeros((intr.height, intr.width), np.uint8)
        frames = {
            "a": render_frame(rope, 4 / 15.0, intr, rope_pixel_radius=3),
            "b": render_frame(rope, 4 / 15.0 + 0.1, intr, rope_pixel_radius=3),
        }
        outs = mt.step_all(frames, occlusion_masks={"a": occ})
        assert int(outs["a"].n_points) == 0  # fully occluded
        gt = rope.nodes(4 / 15.0 + 0.1, params.M)
        err = np.linalg.norm(mt.nodes("b") - gt, axis=1).mean()
        assert err < 0.02  # coarse 160x120 scale

    def test_add_stream_validation(self):
        from trackdlo_tpu.config import CameraIntrinsics, live_params
        from trackdlo_tpu.models.multi import MultiTracker

        mt = MultiTracker(live_params(), CameraIntrinsics())
        import pytest

        with pytest.raises(ValueError, match="exactly one"):
            mt.add_stream("x")

"""Robustness edges (VERDICT r1 next-round #8): input validation,
sigma^2-collapse stress on both solve paths, singular-A EM behavior, and
end-to-end supervisor recovery under occlusion."""

import jax.numpy as jnp
import numpy as np
import pytest

from trackdlo_tpu.config import CameraIntrinsics, live_params
from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
from trackdlo_tpu.models.trackdlo import Tracker
from trackdlo_tpu.ops.cpd_lle import CpdParams, cpd_lle


@pytest.fixture(scope="module")
def small():
    intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=80.0, cy=60.0, width=160, height=120)
    params = live_params(max_points=256, downsample_cell_px=4)
    return params, intr, SyntheticRope()


class TestInputValidation:
    def test_wrong_rgb_shape(self, small):
        params, intr, rope = small
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        rgb, depth = render_frame(rope, 0.0, intr, rope_pixel_radius=3)
        with pytest.raises(ValueError, match=r"rgb must be \(120, 160, 3\)"):
            tracker.step(state, rgb[:60], depth)

    def test_wrong_depth_shape(self, small):
        params, intr, rope = small
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        rgb, depth = render_frame(rope, 0.0, intr, rope_pixel_radius=3)
        with pytest.raises(ValueError, match="depth must be"):
            tracker.step(state, rgb, depth[:, :80])

    def test_wrong_state_shape(self, small):
        params, intr, rope = small
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        rgb, depth = render_frame(rope, 0.0, intr, rope_pixel_radius=3)
        bad = state._replace(y=state.y[:10])
        with pytest.raises(ValueError, match="state.y must be"):
            tracker.step(bad, rgb, depth)

    def test_wrong_node_count_at_init(self, small):
        params, intr, rope = small
        tracker = Tracker(params, intr)
        with pytest.raises(ValueError, match="expected"):
            tracker.init_from_nodes(rope.nodes(0.0, 10))


def _em(x, y0, solver, max_iter=400, lam=50000.0, tol=0.0):
    m = y0.shape[0]
    cp = CpdParams(
        beta=0.35, lam=lam, lle_weight=10.0, mu=0.1, max_iter=max_iter,
        tol=tol, include_lle=False, solver=solver,
    )
    cap = 512
    xp = np.zeros((cap, 3), np.float32)
    xp[: len(x)] = x
    xm = np.zeros(cap, bool)
    xm[: len(x)] = True
    return cpd_lle(
        jnp.asarray(xp), jnp.asarray(xm), jnp.asarray(y0, jnp.float32),
        jnp.ones(m, bool), jnp.asarray(0.001, jnp.float32), cp,
    )


class TestSigmaCollapseStress:
    """Run the EM far past convergence (tol=0, 400 iterations) so sigma^2
    collapses to ~1e-5; neither solver may emit NaN/Inf or diverge."""

    @pytest.mark.parametrize("solver", ["lu", "lstsq"])
    def test_deep_iteration_stays_finite(self, rope_cloud, solver):
        y0 = SyntheticRope().nodes(0.0, 45)
        res = _em(rope_cloud, y0, solver)
        y = np.asarray(res.y)
        assert np.isfinite(y).all()
        assert float(res.sigma2) > 0
        # The chain must still lie on the data, not have exploded.
        d = np.linalg.norm(y[:, None, :] - rope_cloud[None, :, :], axis=2)
        assert d.min(axis=1).max() < 0.05

    def test_solvers_agree_when_well_conditioned(self, rope_cloud):
        y0 = SyntheticRope().nodes(0.0, 45)
        a = np.asarray(_em(rope_cloud, y0, "lu", max_iter=20, tol=1e-4).y)
        b = np.asarray(_em(rope_cloud, y0, "lstsq", max_iter=20, tol=1e-4).y)
        assert np.abs(a - b).max() < 1e-4


class TestSingularSystem:
    """With lam=0 and coincident nodes the M-step matrix A is exactly
    singular; the lstsq (COD-semantics, trackdlo.cpp:415) path must return
    the finite minimum-norm solution."""

    def _singular_setup(self, rope_cloud):
        y0 = SyntheticRope().nodes(0.0, 45).astype(np.float32)
        y0[1] = y0[0]  # coincident nodes -> duplicate geodesic coords -> G singular
        return y0

    def test_lstsq_stays_finite_on_singular_a(self, rope_cloud):
        y0 = self._singular_setup(rope_cloud)
        res = _em(rope_cloud, y0, "lstsq", max_iter=10, lam=0.0, tol=1e-4)
        assert np.isfinite(np.asarray(res.y)).all()

    def test_full_step_with_lstsq_solver_param(self, small):
        params, intr, rope = small
        import dataclasses

        params2 = dataclasses.replace(params, solver="lstsq")
        tracker = Tracker(params2, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params2.M))
        rgb, depth = render_frame(rope, 1 / 15.0, intr, rope_pixel_radius=3)
        new_state, out = tracker.step(state, rgb, depth)
        assert np.isfinite(np.asarray(new_state.y)).all()
        # And it tracks: nodes stay near the analytic rope.
        gt = rope.nodes(1 / 15.0, params2.M)
        err = np.linalg.norm(np.asarray(new_state.y) - gt, axis=1).mean()
        assert err < 0.01


class TestSupervisorRecoveryUnderOcclusion:
    def test_corrupted_state_mid_sequence_recovers(self, small):
        """End-to-end: corrupt the state mid-sequence while an occlusion mask
        is active; the supervisor must re-initialize and keep tracking."""
        from trackdlo_tpu.utils.health import TrackingSupervisor

        _, __, rope = small
        # Frame large enough for the skeleton re-initializer to recover the
        # full rope extent (at 160x120/r=3 it only captures the midsection).
        intr = CameraIntrinsics(
            fx=240.0, fy=240.0, cx=160.0, cy=120.0, width=320, height=240
        )
        params = live_params(max_points=512, downsample_cell_px=4)
        tracker = Tracker(params, intr)
        sup = TrackingSupervisor(tracker, failure_patience=2)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))

        occ = np.ones((intr.height, intr.width), np.uint8) * 255
        occ[:, :80] = 0  # persistent partial occlusion
        for i in range(3):
            rgb, depth = render_frame(rope, i / 15.0, intr, rope_pixel_radius=4)
            state, out = sup.step(state, rgb, depth, occ)
        assert sup.reinit_count == 0

        # Corrupt: NaN a node (e.g. a host-side glitch).
        bad_y = np.asarray(state.y).copy()
        bad_y[7] = np.nan
        state = state._replace(y=jnp.asarray(bad_y))

        rgb, depth = render_frame(rope, 4 / 15.0, intr, rope_pixel_radius=4)
        state, out = sup.step(state, rgb, depth, occ)
        assert sup.reinit_count == 1
        assert np.isfinite(np.asarray(state.y)).all()

        # Tracking continues and converges back onto the rope.
        for i in range(5, 8):
            rgb, depth = render_frame(rope, i / 15.0, intr, rope_pixel_radius=4)
            state, out = sup.step(state, rgb, depth, occ)
        # Orientation after re-init is ambiguous (single-colour rope, no
        # green-tip cue), so score against both chain directions.
        gt = rope.nodes(7 / 15.0, params.M)
        y = np.asarray(state.y)
        err = min(
            np.linalg.norm(y - gt, axis=1).mean(),
            np.linalg.norm(y[::-1] - gt, axis=1).mean(),
        )
        assert err < 0.02, err


class TestNoisyInput:
    """Degraded-input tracking (VERDICT r2 missing #1): the reference's
    verification medium is real noisy D435 bags; these pin tracking quality
    under the sensor-degradation models of io/sequence.render_frame."""

    def _track(self, noise_kwargs, n=5):
        intr = CameraIntrinsics()
        params = live_params()
        rope = SyntheticRope()
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        errs = []
        for i in range(1, n + 1):
            rgb, depth = render_frame(
                rope, i / 15.0, intr, seed=i, **noise_kwargs
            )
            state, out = tracker.step(state, rgb, depth)
            gt = rope.nodes(i / 15.0, params.M)
            errs.append(
                np.linalg.norm(np.asarray(state.y) - gt, axis=1).mean()
            )
        assert np.isfinite(np.asarray(state.y)).all()
        return float(np.mean(errs)), errs

    def test_tracks_through_depth_noise_and_holes(self):
        # 2 mm depth noise + 10% dropout: within ~2x the clean-frame error
        # (clean tracks <2 mm on this sequence) — the VERDICT r2 #3 gate.
        mean_err, errs = self._track(
            {"depth_noise_mm": 2.0, "dropout_frac": 0.10}
        )
        assert mean_err < 0.004, errs

    def test_survives_near_rope_clutter(self):
        # Rope-colored blobs can land within the 0.1 m prune radius and
        # enter the EM as inliers (the reference would admit them too —
        # same HSV front end); tracking must degrade gracefully, not break.
        # The outcome is BIMODAL across builds: whether a near-rope blob is
        # partially absorbed flips with any f32 summation-order change
        # (measured: the same build passes at 6-7 mm or lands at 11-12 mm
        # under a semantically-neutral permutation of the compacted point
        # order), so the gate pins the bad mode's ceiling — nodes pulled a
        # blob-radius toward clutter, not tracking loss.
        mean_err, errs = self._track(
            {"depth_noise_mm": 2.0, "dropout_frac": 0.10, "clutter_blobs": 8}
        )
        assert mean_err < 0.02, errs
        # No divergence across frames (absorbed blob is a bounded bias).
        assert errs[-1] < 2.5 * errs[0] + 0.005, errs

"""Failure-detection / recovery tests, incl. a genuine self-occlusion scene."""

import numpy as np
import pytest

from trackdlo_tpu.config import CameraIntrinsics, live_params
from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
from trackdlo_tpu.models.trackdlo import Tracker, init_state
from trackdlo_tpu.utils.health import HealthReport, TrackingSupervisor, check_state


@pytest.fixture(scope="module")
def setup():
    return live_params(), CameraIntrinsics(), SyntheticRope()


class TestCheckState:
    def test_healthy(self, setup):
        params, intr, rope = setup
        state = init_state(rope.nodes(0.0, params.M), params)
        rep = check_state(np.asarray(state.y), state)
        assert rep.healthy and rep.finite
        assert rep.length_ratio == pytest.approx(1.0)

    def test_detects_nan(self, setup):
        params, intr, rope = setup
        state = init_state(rope.nodes(0.0, params.M), params)
        bad = state._replace(y=state.y.at[3, 1].set(np.nan))
        rep = check_state(np.asarray(state.y), bad)
        assert not rep.healthy and not rep.finite

    def test_detects_jump(self, setup):
        params, intr, rope = setup
        state = init_state(rope.nodes(0.0, params.M), params)
        jumped = state._replace(y=state.y.at[0].add(np.array([0.5, 0, 0])))
        rep = check_state(np.asarray(rope.nodes(0.0, params.M)), jumped)
        assert not rep.healthy and "jump" in rep.reason

    def test_detects_length_blowup(self, setup):
        params, intr, rope = setup
        state = init_state(rope.nodes(0.0, params.M), params)
        stretched = state._replace(y=state.y * 2.0)
        rep = check_state(np.asarray(state.y), stretched, max_jump=10.0)
        assert not rep.healthy and "length" in rep.reason


class TestSupervisor:
    def test_passthrough_when_healthy(self, setup):
        params, intr, rope = setup
        sup = TrackingSupervisor(Tracker(params, intr))
        state = sup.tracker.init_from_nodes(rope.nodes(0.0, params.M))
        for i in range(1, 3):
            rgb, depth = render_frame(rope, i / 15.0, intr)
            state, out = sup.step(state, rgb, depth)
        assert sup.reinit_count == 0
        assert sup.last_report.healthy

    def test_reinit_on_corrupt_state(self, setup):
        params, intr, rope = setup
        sup = TrackingSupervisor(Tracker(params, intr))
        state = sup.tracker.init_from_nodes(rope.nodes(0.0, params.M))
        # Corrupt the state (teleported chain far from the rope).
        state = state._replace(y=state.y + 5.0)
        rgb, depth = render_frame(rope, 1 / 15.0, intr)
        state, out = sup.step(state, rgb, depth)
        # The EM finds no points near the teleported chain -> state barely
        # moves -> huge distance from rope persists; after patience frames
        # the supervisor re-initializes from the live frame.
        for i in range(2, 6):
            rgb, depth = render_frame(rope, i / 15.0, intr)
            state, out = sup.step(state, rgb, depth)
            if sup.reinit_count:
                break
        assert sup.reinit_count >= 1
        gt = rope.nodes(i / 15.0, params.M)
        err = min(
            np.linalg.norm(np.asarray(state.y) - gt, axis=1).mean(),
            np.linalg.norm(np.asarray(state.y)[::-1] - gt, axis=1).mean(),
        )
        assert err < 0.02  # recovered onto the rope


class TestSelfOcclusion:
    def test_crossing_rope_painter(self, setup):
        """A rope whose middle crosses over itself in view: the nearer strand
        stays visible, the farther strand under the crossing is marked
        self-occluded (painter's algorithm, trackdlo_node.cpp:279-343)."""
        params, intr, _ = setup
        # Build a crossing chain explicitly: two straight diagonal strands at
        # different depths crossing at the image centre.
        m = params.M
        half = m // 2
        t1 = np.linspace(-0.3, 0.3, half)
        strand1 = np.stack([t1, t1 * 0.5, np.full(half, 0.60)], axis=1)  # near
        t2 = np.linspace(-0.3, 0.3, m - half)
        strand2 = np.stack([t2, -t2 * 0.5, np.full(m - half, 0.66)], axis=1)  # far
        # Join into one chain: strand1 then strand2 reversed so ends connect.
        y = np.concatenate([strand1, strand2[::-1]], axis=0)

        from trackdlo_tpu.oracle.geometry import geodesic_coords
        import jax.numpy as jnp
        from trackdlo_tpu.ops.visibility import compute_visibility

        # Dense synthetic points on both strands so proximity passes.
        pts = np.concatenate([
            np.repeat(strand1, 8, axis=0) + np.random.default_rng(0).normal(0, 0.002, (half * 8, 3)),
            np.repeat(strand2, 8, axis=0) + np.random.default_rng(1).normal(0, 0.002, ((m - half) * 8, 3)),
        ])
        cap = 1024
        xp = np.zeros((cap, 3), np.float32)
        xp[: len(pts)] = pts
        xm = np.zeros(cap, bool)
        xm[: len(pts)] = True

        vis = compute_visibility(
            jnp.asarray(y, jnp.float32), jnp.asarray(xp), jnp.asarray(xm),
            jnp.asarray(intr.proj_matrix(), jnp.float32),
            jnp.asarray(geodesic_coords(y), jnp.float32),
            intr.height, intr.width,
            visibility_threshold=0.01,
            dlo_pixel_width=params.dlo_pixel_width,
            d_vis=params.d_vis,
        )
        not_occ = np.asarray(vis.not_self_occluded)
        # Nodes of the far strand near the crossing are self-occluded; the
        # near strand is fully non-occluded.
        far_mid = m - half // 2 - 1  # middle of the reversed far strand...
        far_indices = np.arange(half, m)
        far_center = far_indices[np.argmin(np.abs(y[half:, 0]))]
        assert not not_occ[far_center]
        near_center = np.argmin(np.abs(y[:half, 0]))
        assert not_occ[near_center]
        assert not_occ[:half].all()

"""Parity: JAX pure-pursuit prior walks + dispatch vs the oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from trackdlo_tpu.io.sequence import SyntheticRope
from trackdlo_tpu.oracle.geometry import geodesic_coords
from trackdlo_tpu.oracle.tracking import classify_occlusion, _merge_all_visible
from trackdlo_tpu.oracle.traverse import traverse_euclidean
from trackdlo_tpu.ops.priors import (
    ALL_VISIBLE,
    BOTH_ENDS_OCCLUDED,
    HEAD_OCCLUDED,
    MID_SECTION_OCCLUDED,
    NO_VISIBLE_NODES,
    TAIL_OCCLUDED,
    correspondence_priors,
)

M = 45


def oracle_priors(y, coord, vis, vis_ext):
    """Replicates the dispatch of tracking_step (trackdlo.cpp:929-995) at the
    prior level, on pre-registered guide nodes == y[vis_ext] (identity
    pre-registration so walks see the true chain geometry)."""
    guide = y[np.array(vis_ext)]
    state = classify_occlusion(vis_ext, M)
    if state == 0:
        pv1 = traverse_euclidean(coord, guide, vis_ext, 0)
        pv2 = traverse_euclidean(coord, guide, vis_ext, 1)[::-1]
        priors = _merge_all_visible(pv1, pv2, M)
    elif state == 1:
        pv1 = traverse_euclidean(coord, guide, vis_ext, 0)
        pv2 = traverse_euclidean(coord, guide, vis_ext, 1)
        priors = np.concatenate([pv1, pv2], axis=0)
    elif state == 2:
        priors = traverse_euclidean(coord, guide, vis_ext, 0)
    elif state == 3:
        priors = traverse_euclidean(coord, guide, vis_ext, 1)
    else:
        moved = [np.linalg.norm(y[vis[i]] - guide[i]) for i in range(len(vis))]
        align = int(np.argmin(moved))
        priors = traverse_euclidean(coord, guide, vis_ext, 2, align)
    pos = np.zeros((M, 3))
    mask = np.zeros(M, bool)
    for row in priors:  # later rows overwrite (reference Y_extended semantics)
        pos[int(row[0])] = row[1:4]
        mask[int(row[0])] = True
    return pos, mask, state


def jax_priors(y, coord, vis, vis_ext):
    guide = np.zeros((M, 3), np.float32)
    guide[: len(vis_ext)] = y[np.array(vis_ext, dtype=int)]
    vis_ext_idx = np.zeros(M, np.int32)
    vis_ext_idx[: len(vis_ext)] = vis_ext
    vis_idx = np.zeros(M, np.int32)
    vis_idx[: len(vis)] = vis
    res = correspondence_priors(
        jnp.asarray(y, jnp.float32),
        jnp.asarray(coord, jnp.float32),
        jnp.asarray(guide),
        jnp.asarray(vis_ext_idx),
        jnp.asarray(len(vis_ext), jnp.int32),
        jnp.asarray(vis_idx),
        jnp.asarray(len(vis), jnp.int32),
    )
    return (
        np.asarray(res.prior_pos),
        np.asarray(res.prior_mask),
        int(res.state),
    )


@pytest.fixture(scope="module")
def chain():
    rope = SyntheticRope()
    y = rope.nodes(0.0, M)
    return y, geodesic_coords(y)


def _check(y, coord, vis, vis_ext, expected_state, atol=2e-5):
    ref_pos, ref_mask, ref_state = oracle_priors(y, coord, vis, vis_ext)
    got_pos, got_mask, got_state = jax_priors(y, coord, vis, vis_ext)
    assert ref_state == got_state == expected_state
    assert (ref_mask == got_mask).all(), (
        np.nonzero(ref_mask != got_mask),
        ref_mask.sum(),
        got_mask.sum(),
    )
    err = np.linalg.norm(got_pos - ref_pos, axis=1) * ref_mask
    assert err.max() < atol, err.max()


class TestPriorParity:
    def test_all_visible(self, chain):
        y, coord = chain
        vis = list(range(M))
        _check(y, coord, vis, vis, ALL_VISIBLE)

    def test_mid_section(self, chain):
        y, coord = chain
        vis = list(range(0, 18)) + list(range(30, M))
        _check(y, coord, vis, vis, MID_SECTION_OCCLUDED)

    def test_tail_occluded(self, chain):
        y, coord = chain
        vis = list(range(0, 28))
        _check(y, coord, vis, vis, TAIL_OCCLUDED)

    def test_head_occluded(self, chain):
        y, coord = chain
        vis = list(range(12, M))
        _check(y, coord, vis, vis, HEAD_OCCLUDED)

    def test_both_ends(self, chain):
        y, coord = chain
        vis = list(range(8, 37))
        _check(y, coord, vis, vis, BOTH_ENDS_OCCLUDED)

    def test_both_ends_with_gap(self, chain):
        # Raw-visible differs from extended (a filled gap) — exercises the
        # alignment-anchor quirk (raw indices against extended guide rows).
        y, coord = chain
        vis_ext = list(range(8, 37))
        vis = [i for i in vis_ext if i not in (20, 21)]
        _check(y, coord, vis, vis_ext, BOTH_ENDS_OCCLUDED)

    def test_mid_section_with_single_node_island(self, chain):
        y, coord = chain
        vis = [0, 1, 2, 3, 22, 41, 42, 43, 44]
        _check(y, coord, vis, vis, MID_SECTION_OCCLUDED)

    def test_single_visible_node_both_ends(self, chain):
        y, coord = chain
        vis = [21]
        _check(y, coord, vis, vis, BOTH_ENDS_OCCLUDED)

    def test_perturbed_guides(self, chain):
        # Guide nodes displaced from Y (post-registration situation): walks
        # must re-walk arc length along the displaced polyline.
        y, coord = chain
        rng = np.random.default_rng(7)
        vis = list(range(M))
        y_disp = y + rng.normal(0, 0.002, y.shape)

        ref_pos, ref_mask, _ = oracle_priors_displaced(y, y_disp, coord, vis)
        got = jax_priors_displaced(y, y_disp, coord, vis)
        err = np.linalg.norm(got[0] - ref_pos, axis=1) * ref_mask
        assert (ref_mask == got[1]).all()
        assert err.max() < 5e-5


def oracle_priors_displaced(y, guide_full, coord, vis_ext):
    guide = guide_full[np.array(vis_ext)]
    pv1 = traverse_euclidean(coord, guide, vis_ext, 0)
    pv2 = traverse_euclidean(coord, guide, vis_ext, 1)[::-1]
    priors = _merge_all_visible(pv1, pv2, M)
    pos = np.zeros((M, 3))
    mask = np.zeros(M, bool)
    for row in priors:
        pos[int(row[0])] = row[1:4]
        mask[int(row[0])] = True
    return pos, mask, 0


def jax_priors_displaced(y, guide_full, coord, vis_ext):
    guide = np.zeros((M, 3), np.float32)
    guide[: len(vis_ext)] = guide_full[np.array(vis_ext)]
    idxs = np.zeros(M, np.int32)
    idxs[: len(vis_ext)] = vis_ext
    res = correspondence_priors(
        jnp.asarray(y, jnp.float32),
        jnp.asarray(coord, jnp.float32),
        jnp.asarray(guide),
        jnp.asarray(idxs),
        jnp.asarray(len(vis_ext), jnp.int32),
        jnp.asarray(idxs),
        jnp.asarray(len(vis_ext), jnp.int32),
    )
    return np.asarray(res.prior_pos), np.asarray(res.prior_mask)


class TestZeroVisibleNodes:
    """ADVICE r1 (medium): vis_ext_count == 0 must yield NO priors and a
    dedicated state, not a spurious origin prior on node M-1."""

    def test_no_priors_and_dedicated_state(self, chain):
        y, coord = chain
        got_pos, got_mask, got_state = jax_priors(y, coord, [], [])
        assert got_state == NO_VISIBLE_NODES
        assert not got_mask.any(), np.nonzero(got_mask)

    def test_oracle_classifies_empty(self):
        from trackdlo_tpu.oracle.tracking import classify_occlusion

        assert classify_occlusion([], M) == NO_VISIBLE_NODES

    def test_full_step_on_fully_occluded_frame_stays_finite(self):
        """End-to-end: a frame where every node is beyond the visibility
        threshold must not pull any node toward the camera origin."""
        import jax.numpy as jnp
        from trackdlo_tpu.config import CameraIntrinsics, live_params
        from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
        from trackdlo_tpu.models.trackdlo import Tracker

        intr = CameraIntrinsics(
            fx=120.0, fy=120.0, cx=80.0, cy=60.0, width=160, height=120
        )
        params = live_params(max_points=256, downsample_cell_px=4)
        rope = SyntheticRope()
        tracker = Tracker(params, intr)
        state0 = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        # Shift the tracker state far from the cloud so every node fails the
        # visibility threshold but the pruned cloud is still non-empty for
        # some nodes' prune radius -> zero visible, non-degenerate frame.
        far = state0._replace(y=state0.y + jnp.asarray([0.0, 0.0, 0.09]))
        rgb, depth = render_frame(rope, 0.0, intr, rope_pixel_radius=3)
        new_state, out = tracker.step(far, rgb, depth)
        assert int(out.occlusion_state) == NO_VISIBLE_NODES
        assert not np.asarray(out.prior_mask).any()
        assert np.isfinite(np.asarray(new_state.y)).all()
        # No node may have been dragged to the camera origin.
        assert np.linalg.norm(np.asarray(new_state.y), axis=1).min() > 0.05


class TestFusedWalksKernel:
    """pursuit_walks_fused (one Pallas kernel) vs the vmapped scan walks,
    across every dispatch case (interpret mode on CPU)."""

    @pytest.mark.parametrize(
        "vis",
        [
            list(range(M)),                                 # all visible
            list(range(0, 18)) + list(range(30, M)),        # mid-section
            list(range(0, 28)),                             # tail occluded
            list(range(12, M)),                             # head occluded
            list(range(8, 37)),                             # both ends
            [0, 1, 2, 3, 22, 41, 42, 43, 44],               # island
            [21],                                           # single node
        ],
    )
    def test_matches_scan_walks(self, chain, vis):
        y, coord = chain
        guide = np.zeros((M, 3), np.float32)
        guide[: len(vis)] = y[np.array(vis, dtype=int)]
        idxs = np.zeros(M, np.int32)
        idxs[: len(vis)] = vis
        args = (
            jnp.asarray(y, jnp.float32),
            jnp.asarray(coord, jnp.float32),
            jnp.asarray(guide),
            jnp.asarray(idxs),
            jnp.asarray(len(vis), jnp.int32),
            jnp.asarray(idxs),
            jnp.asarray(len(vis), jnp.int32),
        )
        ref = correspondence_priors(*args)
        got = correspondence_priors(*args, use_pallas=True, interpret=True)
        assert int(ref.state) == int(got.state)
        np.testing.assert_array_equal(
            np.asarray(got.prior_mask), np.asarray(ref.prior_mask)
        )
        err = (
            np.linalg.norm(
                np.asarray(got.prior_pos) - np.asarray(ref.prior_pos), axis=1
            )
            * np.asarray(ref.prior_mask)
        )
        assert err.max() < 1e-5, err.max()

    def test_batched_vmap_matches_per_stream(self, chain):
        """Under jax.vmap the walks of all streams pack into ONE kernel call
        (4·B rows); results must match the per-stream kernel exactly."""
        import jax

        y, coord = chain
        cases = [
            list(range(0, 18)) + list(range(30, M)),        # mid-section
            list(range(0, 28)),                             # tail occluded
            list(range(12, M)),                             # head occluded
        ]
        b_args, singles = [], []
        for k, vis in enumerate(cases):
            yk = y + 0.002 * k
            guide = np.zeros((M, 3), np.float32)
            guide[: len(vis)] = yk[np.array(vis, dtype=int)]
            idxs = np.zeros(M, np.int32)
            idxs[: len(vis)] = vis
            args = (
                jnp.asarray(yk, jnp.float32),
                jnp.asarray(coord, jnp.float32),
                jnp.asarray(guide),
                jnp.asarray(idxs),
                jnp.asarray(len(vis), jnp.int32),
                jnp.asarray(idxs),
                jnp.asarray(len(vis), jnp.int32),
            )
            b_args.append(args)
            singles.append(
                correspondence_priors(*args, use_pallas=True, interpret=True)
            )
        stacked = tuple(jnp.stack(a) for a in zip(*b_args))
        batched = jax.vmap(
            lambda *a: correspondence_priors(
                *a, use_pallas=True, interpret=True
            ).prior_pos
        )(*stacked)
        for k, single in enumerate(singles):
            mask = np.asarray(single.prior_mask)
            err = (
                np.linalg.norm(
                    np.asarray(batched[k]) - np.asarray(single.prior_pos),
                    axis=1,
                )
                * mask
            )
            assert err.max() < 1e-6, (k, err.max())

"""Integration tests: the full jitted pipeline on synthetic sequences, plus
visibility/preprocess parity against the oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

import trackdlo_tpu.oracle.visibility as oracle_vis_mod
from trackdlo_tpu.config import CameraIntrinsics, live_params
from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
from trackdlo_tpu.models.trackdlo import Tracker, init_state
from trackdlo_tpu.oracle.geometry import geodesic_coords
from trackdlo_tpu.oracle.pipeline import init_state as oracle_init, step_frame
from trackdlo_tpu.oracle.preprocess import preprocess_frame as oracle_preprocess
from trackdlo_tpu.ops.preprocess import preprocess_frame as jax_preprocess, default_cell_px
from trackdlo_tpu.ops.priors import ALL_VISIBLE, MID_SECTION_OCCLUDED
from trackdlo_tpu.ops.visibility import compute_visibility as jax_visibility


@pytest.fixture(scope="module")
def setup():
    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    return params, intr, rope


class TestHsvPredicate:
    @pytest.mark.parametrize(
        "lo,hi",
        [
            ((90, 80, 80), (130, 255, 255)),
            # Zero lower bounds exercise the degenerate-denominator branches
            # (v==0 / delta==0 fold to True): these are trace-time Python
            # branches since the Mosaic boolean-select fix, so both sides
            # need pinning.
            ((0, 80, 50), (10, 255, 255)),
            ((0, 0, 0), (180, 255, 255)),
        ],
    )
    def test_cross_multiplied_equals_float_hsv(self, lo, hi):
        """The division-free in-range predicate (ops.preprocess.hsv_in_range)
        must equal the classical float HSV computation + threshold compare on
        a dense RGB grid (it IS the same rational predicate, evaluated
        exactly; f64 here removes the float path's own rounding noise)."""
        import numpy as np

        from trackdlo_tpu.ops.preprocess import hsv_in_range

        vals = np.arange(0, 256, 5, dtype=np.float64)
        r, g, b = (a.ravel() for a in np.meshgrid(vals, vals, vals, indexing="ij"))
        v = np.maximum(np.maximum(r, g), b)
        mn = np.minimum(np.minimum(r, g), b)
        delta = v - mn
        ds = np.where(delta == 0, 1.0, delta)
        s = np.where(v > 0, delta * 255.0 / np.where(v == 0, 1.0, v), 0.0)
        h = np.where(
            v == r,
            60.0 * (g - b) / ds,
            np.where(v == g, 120.0 + 60.0 * (b - r) / ds, 240.0 + 60.0 * (r - g) / ds),
        )
        h = np.where(delta == 0, 0.0, h)
        h = np.where(h < 0, h + 360.0, h) / 2.0
        ref = (
            (h >= lo[0]) & (h <= hi[0])
            & (s >= lo[1]) & (s <= hi[1])
            & (v >= lo[2]) & (v <= hi[2])
        )
        got = np.asarray(
            hsv_in_range(
                jnp.asarray(r, jnp.float32), jnp.asarray(g, jnp.float32),
                jnp.asarray(b, jnp.float32), lo, hi,
            )
        )
        np.testing.assert_array_equal(got, ref)


class TestPreprocessParity:
    def test_mask_and_cloud_agree(self, setup):
        params, intr, rope = setup
        rgb, depth = render_frame(rope, 0.0, intr)
        ref_cloud = oracle_preprocess(rgb, depth, params, intr)
        cell = default_cell_px(params.downsample_leaf_size, intr.fx)
        pc = jax_preprocess(
            jnp.asarray(rgb), jnp.asarray(depth),
            jnp.ones((intr.height, intr.width), bool),
            intr.fx, intr.fy, intr.cx, intr.cy,
            params.hsv_lower, params.hsv_upper, False,
            cell, params.max_points,
        )
        got = np.asarray(pc.points)[np.asarray(pc.mask)]
        # Drop the reference's zero-depth origin cluster for comparison.
        ref = ref_cloud[ref_cloud[:, 2] > 0]
        # Different downsampling (cells vs voxels) → compare as point sets:
        # every cell centroid lies within a voxel diagonal of the reference
        # cloud and vice versa (both sample the same rope surface).
        d_g2r = np.linalg.norm(got[:, None, :] - ref[None, :, :], axis=2).min(axis=1)
        d_r2g = np.linalg.norm(ref[:, None, :] - got[None, :, :], axis=2).min(axis=1)
        leaf_diag = params.downsample_leaf_size * np.sqrt(3)
        assert d_g2r.max() < leaf_diag
        assert d_r2g.max() < leaf_diag
        # Comparable densities.
        assert 0.5 < len(got) / len(ref) < 2.0

    def test_occlusion_mask_removes_points(self, setup):
        params, intr, rope = setup
        rgb, depth = render_frame(rope, 0.0, intr)
        cell = default_cell_px(params.downsample_leaf_size, intr.fx)
        occ = np.ones((intr.height, intr.width), bool)
        occ[:, 400:900] = False
        full = jax_preprocess(
            jnp.asarray(rgb), jnp.asarray(depth), jnp.ones_like(jnp.asarray(occ)),
            intr.fx, intr.fy, intr.cx, intr.cy,
            params.hsv_lower, params.hsv_upper, False, cell, params.max_points,
        )
        masked = jax_preprocess(
            jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(occ),
            intr.fx, intr.fy, intr.cx, intr.cy,
            params.hsv_lower, params.hsv_upper, False, cell, params.max_points,
        )
        assert int(masked.count) < int(full.count)
        pts = np.asarray(masked.points)[np.asarray(masked.mask)]
        us = pts[:, 0] / pts[:, 2] * intr.fx + intr.cx
        assert not np.any((us > 410) & (us < 890))


class TestVisibilityParity:
    def test_same_cloud_same_visibility(self, setup, monkeypatch):
        params, intr, rope = setup
        # Force the oracle onto the capsule rasterizer (the JAX closed form
        # is the capsule predicate; cv2.line differs on boundary pixels).
        monkeypatch.setattr(oracle_vis_mod, "cv2", None)
        rgb, depth = render_frame(rope, 1.0 / 15.0, intr)
        x = oracle_preprocess(rgb, depth, params, intr)
        x = x[x[:, 2] > 0]
        y = rope.nodes(0.0, params.M)
        coord = geodesic_coords(y)

        ref = oracle_vis_mod.compute_visibility(
            y, x, intr.proj_matrix(), intr.height, intr.width,
            params.visibility_threshold, params.dlo_pixel_width, params.d_vis,
            coord,
        )
        n_cap = 512
        xp = np.zeros((n_cap, 3), np.float32)
        xp[: len(x)] = x
        xm = np.zeros(n_cap, bool)
        xm[: len(x)] = True
        got = jax_visibility(
            jnp.asarray(y, jnp.float32), jnp.asarray(xp), jnp.asarray(xm),
            jnp.asarray(intr.proj_matrix(), jnp.float32),
            jnp.asarray(coord, jnp.float32),
            intr.height, intr.width,
            params.visibility_threshold, params.dlo_pixel_width, params.d_vis,
        )
        got_visible = set(np.nonzero(np.asarray(got.visible_mask))[0].tolist())
        assert got_visible == set(ref.visible_nodes)
        got_ext = set(np.nonzero(np.asarray(got.extended_mask))[0].tolist())
        assert got_ext == set(ref.visible_nodes_extended)
        np.testing.assert_allclose(
            np.asarray(got.shortest_node_pt_dists),
            ref.shortest_node_pt_dists,
            rtol=1e-4, atol=1e-6,
        )


class TestEndToEnd:
    def test_tracks_and_handles_occlusion(self, setup):
        params, intr, rope = setup
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        occ = np.ones((intr.height, intr.width), np.uint8) * 255
        occ[:, 500:800] = 0
        errs, states = [], []
        for i in range(1, 8):
            rgb, depth = render_frame(rope, i / 15.0, intr)
            m = occ if i >= 4 else None
            state, out = tracker.step(state, rgb, depth, m)
            gt = rope.nodes(i / 15.0, params.M)
            errs.append(np.linalg.norm(np.asarray(state.y) - gt, axis=1).mean())
            states.append(int(out.occlusion_state))
        assert states[0] == ALL_VISIBLE
        assert states[-1] == MID_SECTION_OCCLUDED
        assert max(errs[:3]) < 0.008
        assert errs[-1] < 0.015

    def test_init_from_frame(self, setup):
        params, intr, rope = setup
        tracker = Tracker(params, intr)
        rgb, depth = render_frame(rope, 0.0, intr)
        state = tracker.init_from_frame(rgb, depth)
        gt = rope.nodes(0.0, params.M)
        y = np.asarray(state.y)
        err = min(
            np.linalg.norm(y - gt, axis=1).mean(),
            np.linalg.norm(y[::-1] - gt, axis=1).mean(),
        )
        assert err < 0.006

    def test_oracle_vs_jax_trajectories(self, setup):
        """The north-star parity check: same sequence through the oracle
        (exact reference math, voxel downsample) and the TPU pipeline; mean
        node error between trajectories within ~1 mm + downsample noise."""
        params, intr, rope = setup
        nodes0 = rope.nodes(0.0, params.M)
        jt = Tracker(params, intr)
        js = jt.init_from_nodes(nodes0)
        os_ = oracle_init(nodes0, params)
        worst = 0.0
        for i in range(1, 5):
            rgb, depth = render_frame(rope, i / 15.0, intr)
            js, _ = jt.step(js, rgb, depth)
            os_, _, _ = step_frame(os_, rgb, depth, params, intr)
            err = np.linalg.norm(np.asarray(js.y) - os_.y, axis=1).mean()
            worst = max(worst, err)
        # ~1 mm EM parity (test_cpd_parity) + residual downsample noise and
        # closed-loop f32 compounding. Defaults (leaf-sized cells + voxel
        # snap) sit at ~2.4 mm; halving downsample_cell_px reaches ~1.7 mm at
        # ~10x the downsample cost; no snap is ~2.6 mm. Per-frame EM parity
        # (the BASELINE criterion) is < 1 mm in test_cpd_parity.
        assert worst < 2.5e-3, worst

    def test_state_is_checkpointable(self, setup):
        """State is an explicit pytree: save/restore mid-sequence and results
        continue identically (the reference has no checkpointing at all)."""
        params, intr, rope = setup
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        rgb, depth = render_frame(rope, 1 / 15.0, intr)
        state, _ = tracker.step(state, rgb, depth)

        saved = {k: np.asarray(v) for k, v in state._asdict().items()}
        restored = init_state(saved["y"], params)._replace(
            sigma2=jnp.asarray(saved["sigma2"]),
            geodesic_coord=jnp.asarray(saved["geodesic_coord"]),
        )
        rgb2, depth2 = render_frame(rope, 2 / 15.0, intr)
        s_a, _ = tracker.step(state, rgb2, depth2)
        s_b, _ = tracker.step(restored, rgb2, depth2)
        np.testing.assert_allclose(np.asarray(s_a.y), np.asarray(s_b.y), atol=1e-6)


class TestSkeleton:
    def test_zhang_suen_thin_bar(self):
        from trackdlo_tpu.dlo_init.skeleton import zhang_suen_skeletonize

        m = np.zeros((40, 200), np.uint8)
        m[15:26, 10:190] = 255
        sk = zhang_suen_skeletonize(m)
        per_col = (sk[:, 20:180] > 0).sum(axis=0)
        assert (per_col == 1).all()  # single-pixel-wide centerline

    def test_skeleton_chain_order(self, setup):
        from trackdlo_tpu.dlo_init.skeleton import extract_connected_skeleton
        from trackdlo_tpu.oracle.preprocess import segment_dlo

        params, intr, rope = setup
        rgb, _ = render_frame(rope, 0.0, intr)
        mask = segment_dlo(rgb, params.hsv_lower, params.hsv_upper, False)
        chains = extract_connected_skeleton(mask)
        pts = np.array([p for c in chains for p in c], float)
        # Ordered traversal: consecutive steps stay local (no back-jumps).
        steps = np.linalg.norm(np.diff(pts, axis=0), axis=1)
        assert np.median(steps) < 15
        assert steps.max() < 60
        # Covers the rope end to end in x.
        assert pts[:, 0].max() - pts[:, 0].min() > 1000


class TestOcclusionScenarios:
    """End-to-end coverage of the remaining dispatch cases (mid-section is
    covered above; these drive tip occlusions like the reference's eval
    scenarios, launch/evaluation.launch:14-19)."""

    def _run(self, occ_cols, n_frames=6, occlude_from=2):
        params = live_params()
        intr = CameraIntrinsics()
        rope = SyntheticRope()
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        occ = np.ones((intr.height, intr.width), np.uint8) * 255
        occ[:, occ_cols[0]:occ_cols[1]] = 0
        states, errs = [], []
        for i in range(1, n_frames + 1):
            rgb, depth = render_frame(rope, i / 15.0, intr)
            m = occ if i >= occlude_from else None
            state, out = tracker.step(state, rgb, depth, m)
            gt = rope.nodes(i / 15.0, params.M)
            errs.append(np.linalg.norm(np.asarray(state.y) - gt, axis=1).mean())
            states.append(int(out.occlusion_state))
        return states, errs

    def test_tail_occlusion(self):
        # Occlude the right end of the rope (high node indices = tail).
        from trackdlo_tpu.ops.priors import TAIL_OCCLUDED

        states, errs = self._run((950, 1280))
        assert TAIL_OCCLUDED in states
        assert errs[-1] < 0.02

    def test_head_occlusion(self):
        from trackdlo_tpu.ops.priors import HEAD_OCCLUDED

        states, errs = self._run((0, 330))
        assert HEAD_OCCLUDED in states
        assert errs[-1] < 0.02

    def test_both_ends_occlusion(self):
        from trackdlo_tpu.ops.priors import BOTH_ENDS_OCCLUDED

        params = live_params()
        intr = CameraIntrinsics()
        rope = SyntheticRope()
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        occ = np.ones((intr.height, intr.width), np.uint8) * 255
        occ[:, :300] = 0
        occ[:, 980:] = 0
        states = []
        for i in range(1, 6):
            rgb, depth = render_frame(rope, i / 15.0, intr)
            state, out = tracker.step(state, rgb, depth, occ if i >= 2 else None)
            states.append(int(out.occlusion_state))
        gt = rope.nodes(5 / 15.0, params.M)
        err = np.linalg.norm(np.asarray(state.y) - gt, axis=1).mean()
        assert BOTH_ENDS_OCCLUDED in states
        assert err < 0.025


class TestSelfOcclusion:
    def test_tracks_crossing_rope(self):
        """The self_occlusion scenario: a rope crossing over itself. The far
        strand is self-occluded at the crossing (painter's algorithm) and
        tracking survives the overlap."""
        from trackdlo_tpu.io.sequence import CrossingRope

        params = live_params()
        intr = CameraIntrinsics()
        rope = CrossingRope()
        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(rope.nodes(0.0, params.M))
        saw_self_occlusion = False
        errs = []
        for i in range(1, 6):
            rgb, depth = render_frame(rope, i / 15.0, intr)
            state, out = tracker.step(state, rgb, depth)
            gt = rope.nodes(i / 15.0, params.M)
            errs.append(np.linalg.norm(np.asarray(state.y) - gt, axis=1).mean())
            nso = np.asarray(out.not_self_occluded)
            if (~nso).any():
                # occluded nodes must sit on the far strand (last third).
                occluded_idx = np.nonzero(~nso)[0]
                assert occluded_idx.min() >= params.M // 3
                saw_self_occlusion = True
        assert saw_self_occlusion
        assert errs[-1] < 0.02


class TestServeStreams:
    def test_serve_raw_sequence_end_to_end(self, tmp_path):
        """Production loop: native feeder -> init -> supervised tracking ->
        video output, on a recorded raw sequence."""
        import pytest

        from trackdlo_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")

        import numpy as np

        from examples.serve_streams import serve
        from trackdlo_tpu.config import CameraIntrinsics, live_params
        from trackdlo_tpu.io.raw_sequence import write_raw_sequence
        from trackdlo_tpu.io.sequence import SyntheticRope, render_frame

        intr = CameraIntrinsics(
            fx=240.0, fy=240.0, cx=160.0, cy=120.0, width=320, height=240
        )
        params = live_params(max_points=512, downsample_cell_px=4)
        rope = SyntheticRope()
        frames = [
            render_frame(rope, i / 15.0, intr, rope_pixel_radius=4)
            for i in range(8)
        ]
        path = write_raw_sequence(str(tmp_path / "seq.tdlo"), frames)
        out_video = str(tmp_path / "out.mp4")

        fps, n, state = serve(path, out_video, params=params, intrinsics=intr)
        assert n == 7  # first frame consumed by init
        assert np.isfinite(np.asarray(state.y)).all()
        import os

        assert os.path.getsize(out_video) > 0
        # Tracked onto the rope (orientation-agnostic after skeleton init).
        gt = rope.nodes(7 / 15.0, params.M)
        y = np.asarray(state.y)
        err = min(
            np.linalg.norm(y - gt, axis=1).mean(),
            np.linalg.norm(y[::-1] - gt, axis=1).mean(),
        )
        assert err < 0.02, err


class TestChannelCompaction:
    def test_channelled_compact_matches_flat(self):
        """compact_cells(n_channels=8) must produce the same post-snap point
        SET as the flat sort: only the (irrelevant) candidate selection order
        differs when no channel overflows its per-channel cap. Candidates are
        parity-consistent (channel == voxel parities), the invariant the
        parity-split pooling guarantees and the channel-local snap relies
        on."""
        import numpy as np

        from trackdlo_tpu.ops.preprocess import compact_cells

        rng = np.random.default_rng(7)
        n_per, ch = 960, 8
        n = n_per * ch
        counts = np.zeros(n, np.float32)
        cells = np.zeros((n, 3), np.float32)
        for c in range(ch):
            par = np.array([(c >> 2) & 1, (c >> 1) & 1, c & 1])
            # 60/channel keeps occupied voxels under max_points: with
            # overflow the even-stride decimation legitimately selects a
            # different (equally even) subset per candidate ordering, which
            # is covered by TestOverflowDecimation instead.
            idx = rng.choice(n_per, size=60, replace=False) + c * n_per
            vox = rng.integers(-38, 37, size=(60, 3)) * 2 + par
            frac = rng.uniform(0.1, 0.9, size=(60, 3))
            cells[idx] = ((vox + frac) * 0.008).astype(np.float32)
            counts[idx] = rng.integers(1, 30, size=60)

        flat = compact_cells(
            jnp.asarray(cells), jnp.asarray(counts), 512, 0.008,
            candidate_cap=1024, n_channels=1,
        )
        chan = compact_cells(
            jnp.asarray(cells), jnp.asarray(counts), 512, 0.008,
            candidate_cap=1024, n_channels=ch,
        )
        assert int(flat.count) == int(chan.count)
        fp = np.asarray(flat.points)[np.asarray(flat.mask)]
        cp = np.asarray(chan.points)[np.asarray(chan.mask)]
        # Same voxel-snapped point set (order may differ).
        fp_sorted = fp[np.lexsort(fp.T)]
        cp_sorted = cp[np.lexsort(cp.T)]
        np.testing.assert_allclose(fp_sorted, cp_sorted, atol=1e-6)


class TestOverflowDecimation:
    def test_voxel_overflow_decimates_evenly(self):
        """When occupied voxels exceed max_points, the compaction must keep
        spatial EXTENT and thin density — not chop a contiguous band (the
        voxel-key sort is x-major, so a prefix keep would drop the high-x
        half of the scene and blind the tracker there). The reference's
        VoxelGrid has no cap (trackdlo_node.cpp:236-241); the cap is our
        static-shape artifact and must degrade gracefully."""
        import numpy as np

        from trackdlo_tpu.ops.preprocess import compact_cells

        # 600 occupied cells along a 1-D line, one voxel each (leaf 8 mm,
        # 10 mm spacing) -> 600 occupied voxels, cap at 256.
        n, keep = 600, 256
        cells = np.zeros((1024, 3), np.float32)
        counts = np.zeros(1024, np.float32)
        cells[:n, 0] = np.arange(n) * 0.010
        counts[:n] = 1.0
        out = compact_cells(
            jnp.asarray(cells), jnp.asarray(counts), keep, 0.008,
            candidate_cap=1024, n_channels=1,
        )
        assert int(out.count) == keep
        pts = np.asarray(out.points)[np.asarray(out.mask)]
        # Full extent survives (within one stride of each end) ...
        stride = n / keep
        assert pts[:, 0].min() < stride * 0.010
        assert pts[:, 0].max() > (n - 1 - stride) * 0.010
        # ... at roughly even density: no gap wider than 3 strides.
        xs = np.sort(pts[:, 0])
        assert np.diff(xs).max() < 3 * stride * 0.010

    def test_no_overflow_is_identity(self):
        """Below max_points the decimation path must keep every voxel."""
        import numpy as np

        from trackdlo_tpu.ops.preprocess import compact_cells

        n = 100
        cells = np.zeros((1024, 3), np.float32)
        counts = np.zeros(1024, np.float32)
        cells[:n, 0] = np.arange(n) * 0.010
        counts[:n] = 1.0
        out = compact_cells(
            jnp.asarray(cells), jnp.asarray(counts), 256, 0.008,
            candidate_cap=1024, n_channels=1,
        )
        assert int(out.count) == n

    def test_cell_overflow_decimates_evenly_no_voxel(self):
        """Same graceful degradation for the exact_voxels=False path: cell
        keys are raster-order, so prefix truncation would drop the bottom
        band of the image."""
        import numpy as np

        from trackdlo_tpu.ops.preprocess import compact_cells

        n, keep = 600, 256
        cells = np.zeros((1024, 3), np.float32)
        counts = np.zeros(1024, np.float32)
        cells[:n, 1] = np.arange(n) * 0.010  # y grows with raster index
        counts[:n] = 1.0
        out = compact_cells(
            jnp.asarray(cells), jnp.asarray(counts), keep, None,
            candidate_cap=1024, n_channels=1,
        )
        assert int(out.count) == keep
        pts = np.asarray(out.points)[np.asarray(out.mask)]
        stride = n / keep
        assert pts[:, 1].max() > (n - 1 - stride) * 0.010
        xs = np.sort(pts[:, 1])
        assert np.diff(xs).max() < 3 * stride * 0.010

    def test_production_shaped_compaction_matches_flat(self):
        """Same set-equality at the production shape (n_per 4096, cap 2048):
        pins channel compaction against the flat sort at full scale. (A
        two-level segment compaction was tried here in round 3 and measured
        perf-neutral on v5e — sort width is not the compaction bottleneck —
        so the one-level batched sort stays.)"""
        import numpy as np

        from trackdlo_tpu.ops.preprocess import compact_cells

        rng = np.random.default_rng(11)
        n_per, ch = 4096, 8
        n = n_per * ch
        counts = np.zeros(n, np.float32)
        cells = np.zeros((n, 3), np.float32)
        # Parity-consistent candidates (see test_channelled_compact_matches_flat).
        for c in range(ch):
            par = np.array([(c >> 2) & 1, (c >> 1) & 1, c & 1])
            idx = rng.choice(n_per, size=175, replace=False) + c * n_per
            vox = rng.integers(-38, 37, size=(175, 3)) * 2 + par
            frac = rng.uniform(0.1, 0.9, size=(175, 3))
            cells[idx] = ((vox + frac) * 0.008).astype(np.float32)
            counts[idx] = rng.integers(1, 30, size=175)

        flat = compact_cells(
            jnp.asarray(cells), jnp.asarray(counts), 2048, 0.008,
            candidate_cap=2048, n_channels=1,
        )
        chan = compact_cells(
            jnp.asarray(cells), jnp.asarray(counts), 2048, 0.008,
            candidate_cap=2048, n_channels=ch,
        )
        assert int(flat.count) == int(chan.count)
        fp = np.asarray(flat.points)[np.asarray(flat.mask)]
        cp = np.asarray(chan.points)[np.asarray(chan.mask)]
        fp_sorted = fp[np.lexsort(fp.T)]
        cp_sorted = cp[np.lexsort(cp.T)]
        np.testing.assert_allclose(fp_sorted, cp_sorted, atol=1e-6)

    def test_channel_overflow_decimates_evenly(self):
        """One parity channel holding more valid cells than its cap slots
        must thin evenly (cumsum-rank stride), not keep a raster-prefix band
        — finer voxel leaves overflow live-tuned caps (eval 5 mm leaf:
        749/channel vs the live profile's 190)."""
        import numpy as np

        from trackdlo_tpu.ops.preprocess import compact_cells

        n_per, ch, cap = 4096, 8, 1024  # cap_per = 128
        n = n_per * ch
        cells = np.zeros((n, 3), np.float32)
        counts = np.zeros(n, np.float32)
        # 600 occupied cells, ALL in channel 0, spread along x.
        idx = np.arange(600) * 6
        cells[idx, 0] = np.arange(600) * 0.010
        counts[idx] = 1.0
        out = compact_cells(
            jnp.asarray(cells), jnp.asarray(counts), 1024, 0.008,
            candidate_cap=cap, n_channels=ch,
        )
        pts = np.asarray(out.points)[np.asarray(out.mask)]
        assert len(pts) == cap // ch  # exactly the channel's slot count
        stride = 600 / (cap // ch)
        assert pts[:, 0].max() > (600 - 1 - stride) * 0.010  # extent kept
        xs = np.sort(pts[:, 0])
        assert np.diff(xs).max() < 3 * stride * 0.010  # even density


class TestLeafDerivedCap:
    def test_candidate_cap_scales_with_leaf(self):
        from trackdlo_tpu.config import eval_params, live_params

        assert live_params().candidate_cap() == 2048
        # 5 mm leaf measures up to 749 occupied cells/channel across the six
        # scenarios — the derived 8192 (1024/channel) covers it; a
        # live-tuned 2048 would truncate 27% of eval voxels (round-3 bug).
        assert eval_params().candidate_cap() == 8192
        assert live_params(parity_candidate_cap=4096).candidate_cap() == 4096

    def test_eval_profile_not_truncated(self):
        """A dense eval-leaf frame must produce the same voxel set through
        the capacity-bounded product path as through an effectively
        unbounded cap."""
        import numpy as np

        from trackdlo_tpu.config import CameraIntrinsics, eval_params
        from trackdlo_tpu.evaluation.scenarios import generate, make_scenario
        from trackdlo_tpu.models.trackdlo import preprocess_for_step
        from trackdlo_tpu.ops.preprocess import default_cell_px

        params = eval_params()
        intr = CameraIntrinsics()
        cell = default_cell_px(params.downsample_leaf_size, intr.fx)
        sc = make_scenario("self_occlusion")
        frames, _, _ = generate(sc, 12, intr, params.M)
        rgb, depth = frames[6]  # the densest part of the crossing
        occ = jnp.ones((intr.height, intr.width), bool)
        got = preprocess_for_step(
            jnp.asarray(rgb), jnp.asarray(depth), occ,
            params=params, intr=intr, cell_px=cell, use_pallas=True,
        )
        import dataclasses

        big = preprocess_for_step(
            jnp.asarray(rgb), jnp.asarray(depth), occ,
            params=dataclasses.replace(params, parity_candidate_cap=32768),
            intr=intr, cell_px=cell, use_pallas=True,
        )
        assert int(got.count) == int(big.count)
        gp = np.asarray(got.points)[np.asarray(got.mask)]
        bp = np.asarray(big.points)[np.asarray(big.mask)]
        np.testing.assert_allclose(
            gp[np.lexsort(gp.T)], bp[np.lexsort(bp.T)], atol=1e-6
        )

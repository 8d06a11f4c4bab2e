"""Real-statistics DEPTH through the full pipeline (VERDICT r4 item 7).

tests/test_real_image.py put real photons through segmentation and
skeletonization, but its depth was a two-value flat plane — deprojection,
voxelization, and the EM had still never seen depth with real-sensor
statistics. No real RGB-D recording exists in this environment (the
reference's rosbags are external DOI downloads), so this module drives the
LABELED SECOND-BEST stand-in end-to-end: a pseudo-real depth map
reconstructed from the reference's real rope photograph
(trackdlo_tpu/io/pseudo_depth.py — cylinder-from-mask geometry, the photo's
actual shading as surface relief, and a D435-style artifact model: mm
quantization, z-noise, mixed/flying silhouette pixels, stereo occlusion
shadow, speckle holes, invalid left band).

What this validates that the flat-plane test could not:
- deprojection + voxel-parity pooling on mm-quantized NOISY depth where
  voxel z-boundaries sweep diagonally across a tilted plane (the knife-edge
  regime the bit-pinned floors target) — jitted-vs-oracle voxel sets must
  still match EXACTLY in count;
- invalid-pixel (0) handling through the whole chain: skeleton init, cell
  pooling, compaction;
- closed-loop tracking where every frame re-rolls the sensor model (noise,
  flying pixels, and holes all change per frame, as on a live sensor).

Remaining real-depth risk (named in RESULTS.md): texture-correlated dropout,
RGB-depth extrinsic misalignment, temporal flicker correlation, multi-path.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

REFERENCE = os.environ.get("TRACKDLO_REFERENCE", "/root/reference")
ROPE_PNG = os.path.join(REFERENCE, "images", "rope.png")

cv2 = pytest.importorskip("cv2")
pytestmark = pytest.mark.skipif(
    not os.path.exists(ROPE_PNG),
    reason=f"reference checkout image not found at {ROPE_PNG}",
)


@pytest.fixture(scope="module")
def scene():
    """Real photo + pseudo-real clean surface (sensor model applied per test)."""
    rgb = cv2.cvtColor(cv2.imread(ROPE_PNG), cv2.COLOR_BGR2RGB)
    h, w = rgb.shape[:2]
    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.pseudo_depth import pseudo_surface_mm
    from trackdlo_tpu.oracle.preprocess import segment_dlo

    params = live_params()
    intr = CameraIntrinsics(
        fx=450.0, fy=450.0, cx=w / 2.0, cy=h / 2.0, width=w, height=h
    )
    mask = segment_dlo(rgb, params.hsv_lower, params.hsv_upper) > 0
    surface, plane = pseudo_surface_mm(rgb, mask)
    return rgb, mask, surface, plane, params, intr


def _readout(scene, seed):
    from trackdlo_tpu.io.pseudo_depth import apply_sensor_model

    _, mask, surface, plane, _, _ = scene
    return apply_sensor_model(
        surface, plane, mask, np.random.default_rng(seed)
    )


class TestSensorModel:
    def test_artifact_statistics(self, scene):
        rgb, mask, surface, plane, _, _ = scene
        d = _readout(scene, 0)
        assert d.dtype == np.uint16
        # invalid pixels exist: left band, stereo shadow, speckle
        assert (d == 0).mean() > 0.02
        assert (d[:, :16] == 0).all()
        # the rope is proud of the desk: valid in-mask depth is nearer than
        # the local plane (use interior pixels clear of mixed-pixel edges)
        from scipy import ndimage

        interior = ndimage.binary_erosion(mask, iterations=3) & (d > 0)
        assert interior.sum() > 500
        assert np.median(plane[interior] - d[interior].astype(float)) > 3.0
        # per-frame re-rolls differ (live-feed statistics)
        d2 = _readout(scene, 1)
        valid = (d > 0) & (d2 > 0)
        assert (d[valid] != d2[valid]).mean() > 0.3

    def test_mixed_pixels_fly_between_rope_and_desk(self, scene):
        """Silhouette pixels land BETWEEN the surfaces — the flying-pixel
        artifact that stresses voxel binning."""
        from scipy import ndimage

        _, mask, surface, plane, _, _ = scene
        d = _readout(scene, 0)
        edge = mask & ~ndimage.binary_erosion(mask, iterations=1)
        edge &= d > 0
        gap = plane[edge] - d[edge].astype(float)
        span = np.quantile(gap, 0.9) - np.quantile(gap, 0.1)
        assert span > 2.0  # edge depths spread across the rope-desk gap


class TestVoxelParityOnRealStatistics:
    """Jitted-vs-f64-oracle voxel sets on real-statistics depth.

    FINDING (this test's reason to exist — a regime the synthetic renders
    never exercised): on depth with steep silhouette z-gradients the
    two-stage parity-split downsample is NOT exact against per-pixel PCL
    VoxelGrid semantics. Two measured mechanisms, both bounded sub-half-leaf:

    1. SAME-PARITY INTRA-CELL STRADDLES. The parity split guarantees
       one-voxel-per-candidate only while same-channel pixels of a cell stay
       within 2 leaves per axis. At a rope silhouette, adjacent pixels jump
       the full rope height (+ sensor noise + flying pixels), so one cell's
       same-z-parity pixels can span voxels k and k+2 — the pooled candidate
       merges what PCL splits. Irreducible by cell size (adjacent pixels
       straddle); measured ~5% of voxels on the pseudo-real rope frame.
    2. f32-CHAIN vs f64 X/Y KNIFE EDGES. x/y voxel floors are multiply-only
       f32 chains (bit-pinned ACROSS the repo's four implementations, not
       against ideal f64); noisy real-statistics depth puts far more pixels
       near x/y boundaries than smooth renders, so single-pixel
       reassignments displace more centroids (mm-scale / pixel count).

    Contract pinned here (seed-robust margins around the measured values:
    1290 oracle voxels, 99.1% matched 1:1, 90% exact to 1e-5 [f32 rounding],
    max displacement 4.0 mm < leaf/2, count delta 5):
    the interior/clean structure is exact, silhouette errors stay sub-leaf.
    Closed-loop effect is covered by TestClosedLoopOnRealStatistics (<10 mm
    drift through live rerolls with the DEFAULT config)."""

    def _run(self, scene, depth):
        import dataclasses

        import jax

        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp

        from trackdlo_tpu.models.trackdlo import preprocess_for_step
        from trackdlo_tpu.ops.preprocess import default_cell_px
        from trackdlo_tpu.oracle.preprocess import preprocess_frame as oracle_pre

        rgb, mask, _, _, params, intr = scene
        ref = oracle_pre(rgb, depth, params, intr)
        ref = ref[ref[:, 2] > 0]  # drop the zero-depth origin cluster

        cell = params.downsample_cell_px or default_cell_px(
            params.downsample_leaf_size, intr.fx
        )
        # The real-photo mask (18k px) occupies ~2.5k (cell, channel)
        # candidates — above the live default's 2048 cap (tuned on synthetic
        # rope extents). parity_candidate_cap is the scene-sizing knob;
        # 4096 is converged here (identical output at 16384/32768).
        p = dataclasses.replace(params, parity_candidate_cap=4096)
        pc = preprocess_for_step(
            jnp.asarray(rgb), jnp.asarray(depth),
            jnp.ones(mask.shape, bool),
            params=p, intr=intr, cell_px=cell, use_pallas=False,
        )
        got = np.asarray(pc.points)[np.asarray(pc.mask)]
        d = np.linalg.norm(got[:, None, :] - ref[None, :, :], axis=2)
        return ref, got, d

    def test_noisy_readout_structure(self, scene):
        params = scene[4]
        ref, got, d = self._run(scene, _readout(scene, 2))
        leaf = params.downsample_leaf_size
        # voxel population matches to <1% (a few silhouette merges)
        assert abs(len(got) - len(ref)) <= 0.01 * len(ref), (len(got), len(ref))
        nearest = d.min(axis=1)
        # interior structure is exact to f32 centroid rounding
        assert (nearest < 1e-5).mean() > 0.85, (nearest < 1e-5).mean()
        assert np.quantile(nearest, 0.5) < 1e-6
        # silhouette straddle/knife-edge displacement stays sub-half-leaf
        assert nearest.max() < 0.6 * leaf, nearest.max()
        # near-total one-to-one pairing
        matched = len(np.unique(d.argmin(axis=1)))
        assert matched > 0.98 * len(ref), (matched, len(ref))

    def test_clean_readout_isolates_artifact_model(self, scene):
        """Quantization-only readout (no noise / flying pixels / holes):
        the residual mismatch is the real-photo GEOMETRY itself (silhouette
        straddles), not the artifact model — pinned smaller but nonzero."""
        from trackdlo_tpu.io.pseudo_depth import apply_sensor_model

        _, mask, surface, plane, params, _ = scene
        depth = apply_sensor_model(
            surface, plane, mask, np.random.default_rng(2),
            noise_mm=0.0, mixed_px=0, speckle_frac=0.0,
        )
        ref, got, d = self._run(scene, depth)
        assert abs(len(got) - len(ref)) <= 0.005 * len(ref)
        nearest = d.min(axis=1)
        assert (nearest < 1e-5).mean() > 0.9
        assert nearest.max() < 0.6 * params.downsample_leaf_size


class TestClosedLoopOnRealStatistics:
    def test_track_through_live_sensor_rerolls(self, scene):
        """Init + closed-loop steps where EVERY frame is a fresh sensor
        readout (new noise, new flying pixels, new holes). The scene is
        static: the tracked chain must stay put in 3-D."""
        import jax

        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp

        from trackdlo_tpu.dlo_init.api import initialize_nodes
        from trackdlo_tpu.models.trackdlo import Tracker

        rgb, mask, surface, plane, params, intr = scene
        nodes = initialize_nodes(rgb, _readout(scene, 3), params, intr)
        assert np.isfinite(nodes).all()
        # init must land on the pseudo-real surface, not the desk: node z
        # within the scene's depth span
        z_lo = surface[mask].min() / 1000.0 - 0.01
        z_hi = plane.max() / 1000.0 + 0.01
        assert ((nodes[:, 2] > z_lo) & (nodes[:, 2] < z_hi)).all()

        tracker = Tracker(params, intr)
        state = tracker.init_from_nodes(jnp.asarray(nodes, jnp.float32))
        occ = jnp.ones(mask.shape, bool)
        for i in range(5):
            d = _readout(scene, 10 + i)
            state, out = tracker.step(
                state, jnp.asarray(rgb), jnp.asarray(d), occ
            )
            assert np.isfinite(np.asarray(state.y)).all()
            assert int(out.n_points) > 200
        drift = np.linalg.norm(np.asarray(state.y) - nodes, axis=1)
        # static scene: the chain holds position against per-frame sensor
        # noise/holes (well under one voxel leaf of mean drift)
        assert drift.mean() < 0.010, drift.mean()
        assert drift.max() < 0.030, drift.max()

"""Camera firmware preset ingestion (the L8 analog of
config/preset_decimation_4.0_depth_step_100.json, loaded by
launch/realsense_node.launch:4 in the reference)."""

import json

import numpy as np
import pytest

from trackdlo_tpu.config import CameraIntrinsics
from trackdlo_tpu.io.camera_preset import (
    CameraPreset,
    decimate_depth,
    decimated_intrinsics,
    load_preset,
    sensor_depth_mm,
)


@pytest.fixture
def preset_path(tmp_path):
    """A preset json in the RealSense export schema (the fields the tracking
    pipeline can observe; the reference file carries ~90 more tuning knobs
    that only exist inside the stereo ASIC)."""
    data = {
        "device": {
            "fw version": "05.13.00.50",
            "name": "Intel RealSense D435",
            "product line": "D400",
        },
        "parameters": {
            "param-zunits": "100",
            "param-depthclampmin": "0",
            "param-depthclampmax": "65536",
        },
        "schema version": 1,
        "viewer": {
            "stream-depth-format": "Z16",
            "stream-fps": "30",
            "stream-height": "720",
            "stream-width": "1280",
        },
    }
    p = tmp_path / "preset_decimation_4.0_depth_step_100.json"
    p.write_text(json.dumps(data))
    return str(p)


class TestLoad:
    def test_parses_fields(self, preset_path):
        pr = load_preset(preset_path)
        assert pr.depth_units_um == 100.0
        assert pr.depth_scale_mm == pytest.approx(0.1)
        assert pr.depth_clamp_units == (0, 65536)
        assert (pr.stream_width, pr.stream_height, pr.stream_fps) == (
            1280, 720, 30,
        )
        # Recovered from the filename convention.
        assert pr.decimation == 4

    def test_decimation_override(self, preset_path):
        assert load_preset(preset_path, decimation=2).decimation == 2


class TestSensorModel:
    def test_quantizes_to_units(self):
        pr = CameraPreset(depth_units_um=100.0)
        d = np.array([650.04, 650.06, 0.0], np.float32)
        out = sensor_depth_mm(d, pr)
        np.testing.assert_allclose(out, [650.0, 650.1, 0.0], atol=1e-4)

    def test_clamps(self):
        pr = CameraPreset(depth_units_um=1000.0, depth_clamp_units=(300, 2000))
        out = sensor_depth_mm(np.array([100.0, 5000.0]), pr)
        np.testing.assert_allclose(out, [300.0, 2000.0])


class TestDecimation:
    def test_nonzero_mean_and_holes(self):
        pr = CameraPreset(decimation=2)
        d = np.array(
            [[100, 0, 0, 0],
             [300, 200, 0, 0],
             [5, 5, 7, 7],
             [5, 5, 7, 7]],
            np.uint16,
        )
        out = decimate_depth(d, pr)
        assert out.shape == (2, 2)
        assert out[0, 0] == 200  # mean of the three NON-ZERO pixels
        assert out[0, 1] == 0  # all-hole block stays a hole
        assert out[1, 0] == 5 and out[1, 1] == 7

    def test_identity_at_factor_1(self):
        d = np.arange(16, dtype=np.uint16).reshape(4, 4)
        assert decimate_depth(d, CameraPreset(decimation=1)) is d


class TestIntrinsics:
    def test_scales_with_decimation(self):
        intr = CameraIntrinsics()
        out = decimated_intrinsics(intr, CameraPreset(decimation=4))
        assert (out.width, out.height) == (320, 180)
        assert out.fx == pytest.approx(intr.fx / 4)
        assert out.cy == pytest.approx(intr.cy / 4)

    def test_decimated_stream_tracks(self):
        """End-to-end: a stream pushed through the preset's sensor model +
        decimation still preprocesses to the same rope (coarser cloud)."""
        import jax.numpy as jnp

        from trackdlo_tpu.config import live_params
        from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
        from trackdlo_tpu.ops.preprocess import (
            default_cell_px,
            preprocess_frame,
        )

        params = live_params()
        intr = CameraIntrinsics()
        pr = CameraPreset(decimation=4)
        rope = SyntheticRope()
        rgb, depth = render_frame(rope, 0.0, intr)

        depth_mm = sensor_depth_mm(depth.astype(np.float32), pr)
        dec = decimate_depth(np.round(depth_mm).astype(np.uint16), pr)
        rgb_dec = rgb[::4, ::4]
        intr_dec = decimated_intrinsics(intr, pr)
        cell = default_cell_px(params.downsample_leaf_size, intr_dec.fx)
        pc = preprocess_frame(
            jnp.asarray(rgb_dec), jnp.asarray(dec),
            jnp.ones((intr_dec.height, intr_dec.width), bool),
            intr_dec.fx, intr_dec.fy, intr_dec.cx, intr_dec.cy,
            params.hsv_lower, params.hsv_upper, False, cell,
            params.max_points,
        )
        pts = np.asarray(pc.points)[np.asarray(pc.mask)]
        assert len(pts) > 30
        gt = rope.nodes(0.0, params.M)
        d = np.linalg.norm(pts[:, None] - gt[None], axis=2).min(axis=1)
        # Every decimated-cloud point lies on the rope surface (radius ~6 mm
        # + decimation blur).
        assert np.percentile(d, 95) < 0.02

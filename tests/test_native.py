"""Native C++ library tests: parity with the NumPy oracle + feeder behavior."""

import numpy as np
import pytest

from trackdlo_tpu import native
from trackdlo_tpu.config import CameraIntrinsics, live_params
from trackdlo_tpu.io.raw_sequence import read_raw_sequence, write_raw_sequence
from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
from trackdlo_tpu.oracle.preprocess import (
    preprocess_frame as oracle_preprocess,
    segment_dlo,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.fixture(scope="module")
def scene():
    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    rgb, depth = render_frame(rope, 0.0, intr)
    return params, intr, rope, rgb, depth


class TestNativePreprocess:
    def test_hsv_mask_matches_oracle(self, scene):
        params, intr, rope, rgb, depth = scene
        ref = segment_dlo(rgb, params.hsv_lower, params.hsv_upper, False)
        got = native.hsv_mask(rgb, params.hsv_lower, params.hsv_upper)
        # cv2's fixed-point HSV vs float can flip isolated boundary pixels.
        mismatch = (ref != got).mean()
        assert mismatch < 1e-3

    def test_preprocess_matches_oracle_voxels(self, scene):
        params, intr, rope, rgb, depth = scene
        ref = oracle_preprocess(rgb, depth, params, intr)
        ref = ref[ref[:, 2] > 0]
        got = native.preprocess_frame(rgb, depth, params, intr)
        assert abs(len(got) - len(ref)) <= max(3, 0.01 * len(ref))
        # Same voxel centroids as point sets.
        d = np.linalg.norm(got[:, None, :] - ref[None, :, :], axis=2).min(axis=1)
        assert d.max() < 1e-6

    def test_occlusion_mask_respected(self, scene):
        params, intr, rope, rgb, depth = scene
        occ = np.ones(depth.shape, np.uint8)
        occ[:, 400:900] = 0
        got = native.preprocess_frame(rgb, depth, params, intr, occlusion_mask=occ)
        us = got[:, 0] / got[:, 2] * intr.fx + intr.cx
        assert not np.any((us > 410) & (us < 890))


class TestFrameFeeder:
    def test_roundtrip_and_order(self, tmp_path, scene):
        params, intr, rope, *_ = scene
        small = CameraIntrinsics(fx=100, fy=100, cx=60, cy=40, width=120, height=80)
        frames = [
            render_frame(rope, i / 15.0, small, rope_pixel_radius=3)
            for i in range(7)
        ]
        path = write_raw_sequence(str(tmp_path / "seq.tdlo"), frames)

        back = read_raw_sequence(path)
        np.testing.assert_array_equal(back[3][0], frames[3][0])
        np.testing.assert_array_equal(back[3][1], frames[3][1])

        with native.FrameFeeder(path, n_slots=3) as feeder:
            assert feeder.n_frames == 7
            out = list(feeder)
        assert len(out) == 7
        for i in range(7):
            np.testing.assert_array_equal(out[i][0], frames[i][0])
            np.testing.assert_array_equal(out[i][1], frames[i][1])

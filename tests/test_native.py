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


class TestFeederCloseUnderConcurrentConsumer:
    def test_close_releases_blocked_consumer(self, tmp_path):
        """ADVICE r1: a consumer blocked in tdlo_feeder_next must be released
        by close() (the cv_full wait predicate now observes stop) instead of
        deadlocking while close() joins/frees underneath it.

        Deterministic setup: the sequence is a FIFO that delivers the header
        plus ONE frame then stalls, so the producer thread blocks in fread on
        frame 1 and a consumer asking for frame 1 blocks in cv_full.wait —
        exactly the state the old predicate could never leave.
        """
        import os
        import struct
        import threading

        h, w, n_frames = 4, 4, 3
        frame_bytes = h * w * 3 + h * w * 2
        fifo = str(tmp_path / "seq.tdlo")
        os.mkfifo(fifo)

        writer_fd = {}

        def write_header_and_one_frame():
            fd = os.open(fifo, os.O_WRONLY)  # blocks until the reader opens
            writer_fd["fd"] = fd
            os.write(fd, struct.pack("<5I", 0x4F4C4454, 1, n_frames, h, w))
            os.write(fd, b"\x07" * frame_bytes)  # frame 0 only

        wt = threading.Thread(target=write_header_and_one_frame)
        wt.start()
        feeder = native.FrameFeeder(fifo, n_slots=2)
        wt.join(timeout=10)
        assert not wt.is_alive()
        assert feeder.n_frames == n_frames

        consumed = []

        def consume():
            for rgb, depth in feeder:  # frame 0 arrives; frame 1 blocks
                consumed.append(rgb[0, 0, 0])

        ct = threading.Thread(target=consume)
        ct.start()

        # Wait until the consumer has frame 0 and is blocked on frame 1.
        for _ in range(500):
            if consumed:
                break
            threading.Event().wait(0.01)
        assert consumed == [7]

        # close() must release the blocked consumer. The producer itself is
        # stuck in fread on the FIFO, so unblock it by closing the writer.
        closer = threading.Thread(target=feeder.close)
        closer.start()
        threading.Event().wait(0.05)
        os.close(writer_fd["fd"])  # EOF -> producer's fread returns

        ct.join(timeout=10)
        closer.join(timeout=10)
        assert not ct.is_alive(), "consumer deadlocked in feeder_next"
        assert not closer.is_alive(), "close() never returned"

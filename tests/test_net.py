"""TCP serving surface (io.net): the ROS-free live transport."""

import numpy as np
import pytest

from trackdlo_tpu.config import CameraIntrinsics, live_params
from trackdlo_tpu.io.net import TrackerClient, TrackerServer
from trackdlo_tpu.io.sequence import SyntheticRope, render_frame


@pytest.fixture(scope="module")
def server():
    # 320x240: enough pixels for the skeleton initializer (first-frame
    # init error ~13 mm here vs ~120 mm at 160x120 — the extractor needs a
    # few rope-widths of resolution).
    intr = CameraIntrinsics(
        fx=240.0, fy=240.0, cx=160.0, cy=120.0, width=320, height=240
    )
    params = live_params(max_points=512, downsample_cell_px=4)
    srv = TrackerServer(params=params, intrinsics=intr, host="127.0.0.1", port=0)
    host, port = srv.start()
    yield srv, host, port, intr, params
    srv.shutdown()


class TestServe:
    def test_tracks_over_socket(self, server):
        srv, host, port, intr, params = server
        rope = SyntheticRope()
        with TrackerClient(host, port) as cli:
            res0 = cli.track(
                *render_frame(rope, 0.0, intr, rope_pixel_radius=4)
            )
            assert res0["iterations"] == 0  # init frame
            assert res0["y"].shape == (params.M, 3)
            for i in range(1, 4):
                rgb, depth = render_frame(
                    rope, i / 15.0, intr, rope_pixel_radius=4
                )
                res = cli.track(rgb, depth)
            assert np.isfinite(res["y"]).all()
            gt = rope.nodes(3 / 15.0, params.M)
            err = min(
                np.linalg.norm(res["y"] - gt, axis=1).mean(),
                np.linalg.norm(res["y"][::-1] - gt, axis=1).mean(),
            )
            assert err < 0.015, err
            # Wire round-trip of the per-node mask (visibility COUNTS are
            # resolution-dependent: at 320x240 the 8 mm gate sees a coarse
            # voxel cloud — semantics are pinned by test_pipeline instead).
            assert res["visible"].shape == (params.M,)
            assert res["visible"].dtype == bool

    def test_occlusion_mask_roundtrip(self, server):
        srv, host, port, intr, params = server
        rope = SyntheticRope()
        with TrackerClient(host, port) as cli:
            cli.track(*render_frame(rope, 0.0, intr, rope_pixel_radius=4))
            rgb, depth = render_frame(rope, 1 / 15.0, intr, rope_pixel_radius=4)
            occ = np.ones((intr.height, intr.width), np.uint8)
            occ[:, 60:100] = 0
            res = cli.track(rgb, depth, occ)
            assert np.isfinite(res["y"]).all()
            # Mid-band occluded: fewer visible nodes than the full frame.
            full = cli.track(rgb, depth)
            assert res["visible"].sum() <= full["visible"].sum()

    def test_two_concurrent_streams(self, server):
        srv, host, port, intr, params = server
        rope = SyntheticRope()
        with TrackerClient(host, port) as a, TrackerClient(host, port) as b:
            fa = render_frame(rope, 0.0, intr, rope_pixel_radius=4)
            fb = render_frame(rope, 2 / 15.0, intr, rope_pixel_radius=4)
            a.track(*fa)
            b.track(*fb)
            ra = a.track(*render_frame(rope, 1 / 15.0, intr, rope_pixel_radius=4))
            rb = b.track(*render_frame(rope, 3 / 15.0, intr, rope_pixel_radius=4))
            # Independent per-connection states.
            assert not np.allclose(ra["y"], rb["y"])
            assert np.isfinite(ra["y"]).all() and np.isfinite(rb["y"]).all()

"""How close does the cell-pool+voxel-snap cloud get to the oracle's exact
PCL-style voxel grid, as a function of cell size — and how much of the
closed-loop EM gap does each setting close?

For each cell_px: run the f64 oracle closed-loop on the JITTED preprocessing
clouds (oracle_jp protocol — isolates downsample detail; perf/
parity_decomposition.py showed this carries ~100% of the full-pipeline gap).

Usage: python perf/cell_parity_sweep.py [--frames 12] [--cells 11,6,4,3]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--cells", default="11,6,4,3")
    ap.add_argument("--cap", type=int, default=8192)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.ops.preprocess import preprocess_frame as jit_pre
    from trackdlo_tpu.oracle.pipeline import init_state as oracle_init, step_frame
    from trackdlo_tpu.oracle.preprocess import preprocess_frame as oracle_pre

    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    m = params.M
    occ = jnp.ones((intr.height, intr.width), bool)

    frames = [render_frame(rope, i / 15.0, intr) for i in range(1, args.frames + 1)]

    # Reference closed loop (oracle preprocessing).
    ref_states = []
    st = oracle_init(rope.nodes(0.0, m), params)
    for rgb, depth in frames:
        st, _, aux = step_frame(st, rgb, depth, params, intr)
        ref_states.append((st.y.copy(), aux["points"]))

    for cell in [int(c) for c in args.cells.split(",")]:
        fn = jax.jit(
            lambda r, d: jit_pre(
                r, d, occ, intr.fx, intr.fy, intr.cx, intr.cy,
                params.hsv_lower, params.hsv_upper, False, cell,
                params.max_points, voxel_leaf=params.downsample_leaf_size,
                candidate_cap=args.cap,
            )
        )
        st = oracle_init(rope.nodes(0.0, m), params)
        devs, cloud_stats = [], []
        for (rgb, depth), (ref_y, ref_pts) in zip(frames, ref_states):
            pc = fn(jnp.asarray(rgb), jnp.asarray(depth))
            pts = np.asarray(pc.points)[np.asarray(pc.mask)]
            st, _, _ = step_frame(st, rgb, depth, params, intr, points=pts)
            devs.append(np.linalg.norm(st.y - ref_y, axis=1).mean())
            # Cloud-level agreement: nearest-neighbour residual both ways.
            d1 = np.linalg.norm(pts[:, None] - ref_pts[None], axis=2).min(1)
            d2 = np.linalg.norm(ref_pts[:, None] - pts[None], axis=2).min(1)
            cloud_stats.append((len(pts), len(ref_pts), d1.mean(), d2.mean()))
        devs = np.asarray(devs) * 1000
        n_j, n_o, d1, d2 = np.mean(cloud_stats, axis=0)
        print(
            f"cell={cell:2d}: closed-loop dev mean {devs.mean():6.3f} mm  "
            f"max {devs.max():6.3f}  final {devs[-1]:6.3f} | "
            f"cloud: {n_j:6.0f} vs {n_o:6.0f} pts, nn-res {d1*1000:5.3f}/{d2*1000:5.3f} mm"
        )


if __name__ == "__main__":
    main()

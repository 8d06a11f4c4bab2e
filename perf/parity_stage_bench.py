"""Stage costs of the parity_split preprocessing pipeline (VERDICT r2 #1).

parity_split buys exact PCL-VoxelGrid parity (0.31 mm closed loop) but costs
~0.49 ms/step over the default profile (BENCH_r02). This script decomposes
that cost on the real TPU via in-graph scan slopes:

  - the 8-channel Pallas cell-sums kernel vs the 1-channel kernel,
  - the channelled compaction sort at several per-channel caps,
  - the voxel snap at the resulting candidate counts,
  - measured per-channel occupancy across the six scenarios (how small the
    cap can safely go).

Usage: python perf/parity_stage_bench.py [--occupancy-only]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_time(build_body, k_pair=(16, 96)):
    import jax
    import jax.numpy as jnp

    times = []
    for k in k_pair:
        body = build_body()

        @jax.jit
        def run(c0, k=k, body=body):
            def step(c, _):
                return body(c), None

            c, _ = jax.lax.scan(step, c0, None, length=k)
            return c

        c = run(jnp.asarray(0.0, jnp.float32))
        _ = float(c)
        t0 = time.perf_counter()
        c = run(jnp.asarray(0.0, jnp.float32))
        _ = float(c)
        times.append(time.perf_counter() - t0)
    return (times[1] - times[0]) / (k_pair[1] - k_pair[0]) * 1000.0


def med3(build_body, k_pair=(16, 96)):
    return float(np.median([scan_time(build_body, k_pair) for _ in range(3)]))


def occupancy():
    """Max per-channel candidate occupancy across the six scenarios."""
    import jax
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.evaluation.scenarios import ALL_SCENARIOS, make_scenario
    from trackdlo_tpu.io.sequence import render_frame
    from trackdlo_tpu.ops.preprocess import default_cell_px
    from trackdlo_tpu.ops.preprocess_kernel import cell_sums_pallas

    params = live_params()
    intr = CameraIntrinsics()
    cell = default_cell_px(params.downsample_leaf_size, intr.fx)
    interp = jax.default_backend() != "tpu"

    @jax.jit
    def chan_counts(rgb, depth):
        occ = jnp.ones(depth.shape, bool)
        cells, counts = cell_sums_pallas(
            rgb, depth, occ, intr.fx, intr.fy, intr.cx, intr.cy,
            params.hsv_lower, params.hsv_upper, False, cell,
            interpret=interp, parity_split=True,
            voxel_leaf=params.downsample_leaf_size,
        )
        per = counts.reshape(8, -1)
        return jnp.sum(per > 0, axis=1)

    worst = np.zeros(8, np.int64)
    worst_total = 0
    for name in ALL_SCENARIOS:
        scen = make_scenario(name)
        for i in range(0, 105, 7):
            t = (i + 1) / 105.0 * scen.horizon_s
            rgb, depth = render_frame(scen.rope, t, intr, **scen.render_kwargs)
            c = np.asarray(chan_counts(jnp.asarray(rgb), jnp.asarray(depth)))
            worst = np.maximum(worst, c)
            worst_total = max(worst_total, int(c.sum()))
    return worst, worst_total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--occupancy-only", action="store_true")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.ops.preprocess import compact_cells, voxel_snap
    from trackdlo_tpu.ops.preprocess_kernel import cell_sums_pallas

    worst, worst_total = occupancy()
    print(f"occupancy: per-channel max {worst.tolist()}  total max {worst_total}")
    if args.occupancy_only:
        return

    interp = jax.default_backend() != "tpu"
    params = live_params()
    intr = CameraIntrinsics()
    from trackdlo_tpu.ops.preprocess import default_cell_px

    cell = default_cell_px(params.downsample_leaf_size, intr.fx)
    leaf = params.downsample_leaf_size
    rope = SyntheticRope()
    rgb, depth = render_frame(rope, 1 / 15.0, intr)
    rgbj, depthj = jnp.asarray(rgb), jnp.asarray(depth)
    occ = jnp.ones((intr.height, intr.width), bool)

    results = {}

    def kern_body(parity):
        def body(c):
            cl, ct = cell_sums_pallas(
                rgbj, depthj + (c * 0).astype(depthj.dtype), occ,
                intr.fx, intr.fy, intr.cx, intr.cy,
                params.hsv_lower, params.hsv_upper, False, cell,
                interpret=interp, parity_split=parity,
                voxel_leaf=leaf if parity else None,
            )
            return jnp.sum(ct) * 1e-12 + c * 0.5
        return body

    results["kernel_1ch"] = med3(lambda: kern_body(False))
    results["kernel_8ch"] = med3(lambda: kern_body(True))

    cells1, counts1 = jax.jit(
        lambda r, d: cell_sums_pallas(
            r, d, occ, intr.fx, intr.fy, intr.cx, intr.cy,
            params.hsv_lower, params.hsv_upper, False, cell, interpret=interp,
        )
    )(rgbj, depthj)
    cells8, counts8 = jax.jit(
        lambda r, d: cell_sums_pallas(
            r, d, occ, intr.fx, intr.fy, intr.cx, intr.cy,
            params.hsv_lower, params.hsv_upper, False, cell, interpret=interp,
            parity_split=True, voxel_leaf=leaf,
        )
    )(rgbj, depthj)

    def compact_body(cellsx, countsx, cap, n_ch):
        def body(c):
            p = compact_cells(
                cellsx, countsx + c * 0, params.max_points, leaf,
                candidate_cap=cap, n_channels=n_ch,
            )
            return jnp.sum(p.points) * 1e-12 + c * 0.5
        return body

    results["compact+snap_1ch_4096"] = med3(
        lambda: compact_body(cells1, counts1, 4096, 1)
    )
    for cap in (8192, 4096, 2048, 1024):
        results[f"compact+snap_8ch_{cap}"] = med3(
            lambda cap=cap: compact_body(cells8, counts8, cap, 8)
        )

    from trackdlo_tpu.ops.preprocess import compact_cells_segsum

    def segsum_body(cellsx, countsx, cap, n_ch):
        def body(c):
            p = compact_cells_segsum(
                cellsx, countsx + c * 0, params.max_points, leaf,
                candidate_cap=cap, n_channels=n_ch,
            )
            return jnp.sum(p.points) * 1e-12 + c * 0.5
        return body

    results["segsum+snap_1ch_4096"] = med3(
        lambda: segsum_body(cells1, counts1, 4096, 1)
    )
    for cap in (4096, 2048, 1024):
        results[f"segsum+snap_8ch_{cap}"] = med3(
            lambda cap=cap: segsum_body(cells8, counts8, cap, 8)
        )

    def snap_body(ncand):
        pts = jnp.asarray(np.random.default_rng(0).uniform(-0.3, 0.3, (ncand, 3)),
                          jnp.float32)
        w = jnp.ones((ncand,), jnp.float32)

        def body(c):
            s, _ = voxel_snap(pts + c * 1e-12, w, leaf)
            return jnp.sum(s) * 1e-12 + c * 0.5
        return body

    for ncand in (8192, 4096, 2048, 1024):
        results[f"snap_only_{ncand}"] = med3(lambda n=ncand: snap_body(n))

    for k, v in results.items():
        print(f"{k:28s} {v:8.3f} ms")
    with open(os.path.join(os.path.dirname(__file__), "parity_stage_bench.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

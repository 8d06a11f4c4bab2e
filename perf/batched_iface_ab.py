"""A/B the parity kernel<->compaction interface UNDER VMAP (r5 follow-up).

The r5 channel-grid interface (commit 69483f3) removed ~80 us of (C, 3)
relayout glue from the UNBATCHED composed preprocess (298 -> 219 us), but
it hands the compaction the PADDED cell grid: n_per = 72*128 = 9216 cells
vs the old trimmed interface's 66*117 = 7722. Unbatched that is free (the
one-hot pack skips dead tiles via its liveness flag), but the batched back
end is the packed-key SORT, which is length-dominated
(perf/compact_experiments.json) — +19% sort length is a direct per-frame
tax exactly where the sort already dominates. BENCH b8 moved 2397 -> 2175
fps across the interface change (sessions differ; tunnel variance ~10%),
so this probe measures the three candidates in ONE session at b1/b8:

- new:      channel-grid path, padded grid straight into compaction
            (the briefly-shipped r5 form this probe was written to judge)
- old:      r4 trimmed (C, 3) interface (cell_sums_pallas two-output +
            compact_cells n_channels=8)
- new_trim: channel-grid outputs, pad columns trimmed by a
            (8,72,128)->(8,66,117) slice BEFORE compaction — the relayout
            is paid, but only where the shorter sort buys more than it
            costs

RESULT (committed batched_iface_ab.json): new_trim wins or ties everywhere
(b1 238.6 / b8 244.1 us/frame vs old 248.8 / 240.8; padded-sort "new" pays
+48 us/frame at b8). SHIPPED as compact_parity_channels(grid_shape=...):
sort-routed branches trim, the one-hot branch keeps the padded grid (its
dead-tile flag makes pads free).

Usage (TPU): python perf/batched_iface_ab.py
Writes perf/batched_iface_ab.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onehot_b8_probe import scan_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.ops.preprocess import (
        compact_cells, compact_parity_channels, default_cell_px,
    )
    from trackdlo_tpu.ops import preprocess_kernel as pk

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    cell = default_cell_px(params.downsample_leaf_size, intr.fx)
    leaf = params.downsample_leaf_size
    cap = params.candidate_cap()
    n_rows = -(-intr.height // cell)
    n_cols = -(-intr.width // cell)
    rows_pad = pk._round_up(n_rows, 8)
    cols_pad = pk._round_up(n_cols, 128)

    max_b = 8
    rgbs, depths = [], []
    for b in range(max_b):
        rgb, depth = render_frame(rope, 1 / 15.0 + 0.003 * b, intr)
        rgbs.append(rgb)
        depths.append(depth)
    rgbs_all = jnp.asarray(np.stack(rgbs))
    depths_all = jnp.asarray(np.stack(depths))
    occ_all = jnp.ones((max_b, intr.height, intr.width), bool)

    kargs = lambda r, d, o: (
        r, d, o, intr.fx, intr.fy, intr.cx, intr.cy,
        params.hsv_lower, params.hsv_upper, params.multi_color_dlo, cell,
    )

    gshape = pk.parity_grid_shape(intr.height, intr.width, cell)

    def pre_new(rgb, depth, occ):
        # The SHIPPED form (grid_shape routes sort branches through the
        # trim); the committed artifact's "new" rows predate grid_shape and
        # measured the padded sort.
        sx, sy, sz, cnt = pk.cell_sums_pallas(
            *kargs(rgb, depth, occ), interpret=interp, parity_split=True,
            voxel_leaf=leaf, channel_grids=True,
        )
        return compact_parity_channels(
            sx, sy, sz, cnt, params.max_points, leaf, cap,
            inputs_are_sums=True, grid_shape=gshape,
        )

    def pre_new_trim(rgb, depth, occ):
        sx, sy, sz, cnt = pk.cell_sums_pallas(
            *kargs(rgb, depth, occ), interpret=interp, parity_split=True,
            voxel_leaf=leaf, channel_grids=True,
        )
        trim = lambda a: a.reshape(8, rows_pad, cols_pad)[
            :, :n_rows, :n_cols
        ].reshape(8, -1)
        return compact_parity_channels(
            trim(sx), trim(sy), trim(sz), trim(cnt),
            params.max_points, leaf, cap, inputs_are_sums=True,
        )

    def pre_old(rgb, depth, occ):
        cells, counts = pk.cell_sums_pallas(
            *kargs(rgb, depth, occ), interpret=interp, parity_split=True,
            voxel_leaf=leaf,
        )
        return compact_cells(
            cells, counts, params.max_points, leaf, candidate_cap=cap,
            n_channels=8,
        )

    variants = {"new": pre_new, "new_trim": pre_new_trim, "old": pre_old}

    # Parity of the three variants on frame 0 first. new vs new_trim must be
    # BITWISE equal (identical divide-after-pack structure; the trim only
    # drops count-0 pad cells, preserving raster order and ranks). The old
    # interface divides centroids on the GRID, and XLA's rewrite of that
    # division is jit-context-dependent (1-ulp centroid deltas measured
    # between fusion contexts — the div hazard of CLAUDE.md), which can flip
    # a knife-edge voxel in the snap; compare it at tolerance, with equal
    # counts.
    outs = {}
    for name, fn in variants.items():
        p = jax.jit(fn)(rgbs_all[0], depths_all[0], occ_all[0])
        outs[name] = (np.asarray(p.points), np.asarray(p.mask), int(p.count))
    ref = outs["new"]
    nt = outs["new_trim"]
    assert (ref[0] == nt[0]).all() and (ref[1] == nt[1]).all(), (
        "new_trim diverges bitwise from new"
    )
    old = outs["old"]
    assert old[2] == ref[2], f"old count {old[2]} != new count {ref[2]}"
    a = {tuple(r) for r in ref[0][ref[1]]}
    b = {tuple(r) for r in old[0][old[1]]}
    n_flip = len(a ^ b) // 2
    # Not asserted: the old interface divides centroids on the GRID, and
    # XLA rewrites that division differently per fusion context (measured
    # bitwise-equal standalone, ~323 rows differing — mostly at 1 ulp, plus
    # occasional knife-edge voxel jumps — inside this probe's jit).
    # Recorded as a diagnostic; the timing A/B is unaffected.
    print(f"parity: new==new_trim bitwise; old: count equal, "
          f"{n_flip} row(s) differ (ulp-level div rewrites)", flush=True)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "batched_iface_ab.json"
    )
    results = {}
    if os.path.exists(path):
        with open(path) as f:
            results.update(json.load(f))
    for b in (1, 8):
        rgb_b, depth_b, occ_b = rgbs_all[:b], depths_all[:b], occ_all[:b]
        for name, fn in variants.items():
            key = f"{name}_b{b}_us_per_frame"
            if key in results:
                print(key, results[key], "(cached)", flush=True)
                continue

            def build(fn=fn):
                def body(c):
                    p = jax.vmap(
                        lambda r, d, o: fn(r, d + (c * 0).astype(d.dtype), o)
                    )(rgb_b, depth_b, occ_b)
                    return jnp.sum(p.points) * 1e-12 + c * 0.5
                return body

            ms = np.median([scan_time(build) for _ in range(3)])
            results[key] = round(ms / b * 1000.0, 2)
            print(f"{name} b={b}: {results[key]:8.1f} us/frame", flush=True)
            with open(path, "w") as f:
                json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""A/B the parity-compaction back end (one-hot matmul vs batched sort) at
batch 1 and 8 — isolating whether the one-hot kernel (r4 default on TPU)
regresses the VMAPPED preprocess (vmap adds a batch grid dimension, which
multiplies the kernel's per-grid-step fixed cost by the batch).

Usage: python perf/onehot_b8_probe.py
"""

import functools
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


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.ops.preprocess import compact_cells, default_cell_px
    from trackdlo_tpu.ops.preprocess_kernel import cell_sums_pallas

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    cell = default_cell_px(params.downsample_leaf_size, intr.fx)
    leaf = params.downsample_leaf_size
    cap = params.candidate_cap()

    max_b = 8
    rgbs, depths = [], []
    for b in range(max_b):
        rgb, depth = render_frame(rope, 1 / 15.0 + 0.003 * b, intr)
        rgbs.append(rgb)
        depths.append(depth)
    rgbs_all = jnp.asarray(np.stack(rgbs))
    depths_all = jnp.asarray(np.stack(depths))
    occ_all = jnp.ones((max_b, intr.height, intr.width), bool)

    def pre_one(rgb, depth, occ, use_onehot):
        cells, counts = cell_sums_pallas(
            rgb, depth, occ, intr.fx, intr.fy, intr.cx, intr.cy,
            params.hsv_lower, params.hsv_upper, params.multi_color_dlo,
            cell, interpret=interp, parity_split=True, voxel_leaf=leaf,
        )
        return compact_cells(
            cells, counts, params.max_points, leaf, candidate_cap=cap,
            n_channels=8, use_onehot_compact=use_onehot,
        )

    results = {}
    for b in (1, 8):
        rgb_b, depth_b, occ_b = rgbs_all[:b], depths_all[:b], occ_all[:b]
        for name, onehot in (("auto", None), ("onehot", True), ("sort", False)):
            def build():
                def body(c):
                    p = jax.vmap(
                        lambda r, d, o: pre_one(
                            r, d + (c * 0).astype(d.dtype), o, onehot
                        )
                    )(rgb_b, depth_b, occ_b)
                    return jnp.sum(p.points) * 1e-12 + c * 0.5
                return body

            ms = scan_time(build)
            results[f"preprocess_{name}_b{b}_ms"] = round(ms, 4)
            print(f"preprocess[{name}] b={b}: {ms:8.3f} ms "
                  f"({ms / b * 1000:7.1f} us/frame)", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "onehot_b8_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Preprocess-component microbench on device (VERDICT r1 #3: preprocess is
the top single-frame stage at 0.82 ms).

Times, via in-graph scan slope: the Pallas cell-sums kernel alone, the
cell compaction (argsort vs top_k), the voxel snap, and the assembled
preprocess, across cell sizes.

Usage: python perf/preprocess_microbench.py [--cells 11,6,4,3] [--batch 1]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_time(build_body, k_pair=(8, 32)):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default="11,6,4,3")
    ap.add_argument("--batch", type=int, default=1)
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

    interp = jax.default_backend() != "tpu"
    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    b = args.batch
    rgbs, depths = [], []
    for i in range(b):
        rgb, depth = render_frame(rope, 1 / 15.0 + 0.003 * i, intr)
        rgbs.append(rgb)
        depths.append(depth)
    rgb_b = jnp.asarray(np.stack(rgbs))
    depth_b = jnp.asarray(np.stack(depths))
    occ_b = jnp.ones((b, intr.height, intr.width), bool)

    def vb(f):
        return f if b == 0 else jax.vmap(f)

    for cell in [int(c) for c in args.cells.split(",")]:
        kern = lambda r, d, o: cell_sums_pallas(
            r, d, o, intr.fx, intr.fy, intr.cx, intr.cy,
            params.hsv_lower, params.hsv_upper, False, cell, interpret=interp,
        )
        cells_b, counts_b = jax.jit(vb(kern))(rgb_b, depth_b, occ_b)
        n_cells = cells_b.shape[1]

        def kern_body():
            def body(c):
                cl, ct = vb(lambda r, d, o: kern(r, d + (c * 0).astype(d.dtype), o))(
                    rgb_b, depth_b, occ_b
                )
                return jnp.sum(ct) * 1e-12 + c * 0.5
            return body

        t_kern = scan_time(kern_body)

        def compact_argsort_body():
            def body(c):
                p = vb(
                    lambda cl, ct: compact_cells(
                        cl, ct + c * 0, params.max_points,
                        params.downsample_leaf_size,
                    )
                )(cells_b, counts_b)
                return jnp.sum(p.points) * 1e-12 + c * 0.5
            return body

        t_compact = scan_time(compact_argsort_body)

        def compact_topk_body():
            cap = 4096

            def one(cl, ct):
                valid = ct > 0
                neg = jnp.where(valid, -jnp.arange(n_cells, dtype=jnp.float32),
                                -jnp.asarray(float(n_cells)))
                _, idx = jax.lax.top_k(neg, cap)
                pts = cl[idx]
                v = valid[idx]
                pts = jnp.where(v[:, None], pts, 0.0)
                w = jnp.where(v, ct[idx], 0.0)
                sn, sv = voxel_snap(pts, w, params.downsample_leaf_size)
                return jnp.sum(sn)

            def body(c):
                s = vb(lambda cl, ct: one(cl, ct + c * 0))(cells_b, counts_b)
                return jnp.sum(s) * 1e-12 + c * 0.5
            return body

        t_topk = scan_time(compact_topk_body)

        def snap_only_body():
            pc0 = jax.jit(
                vb(lambda cl, ct: compact_cells(cl, ct, params.max_points, None))
            )(cells_b, counts_b)

            def body(c):
                s = vb(
                    lambda p, mk, ct: voxel_snap(
                        p + c * 1e-12,
                        jnp.where(mk, 1.0, 0.0),
                        params.downsample_leaf_size,
                    )[0]
                )(pc0.points, pc0.mask, counts_b)
                return jnp.sum(s) * 1e-12 + c * 0.5
            return body

        t_snap = scan_time(snap_only_body)

        print(
            f"cell={cell:2d} (cells={n_cells:6d}): kernel {t_kern:7.3f} ms | "
            f"compact+snap(argsort) {t_compact:7.3f} | "
            f"compact+snap(top_k) {t_topk:7.3f} | snap-only {t_snap:7.3f}"
        )


if __name__ == "__main__":
    main()

"""On-device cost of the parity-split preprocess kernel vs the default.

Times (in-graph scan slope, the only dispatch-free method on the tunnelled
backend — see CLAUDE.md):
  - cell_sums_pallas, parity_split off vs on
  - full preprocess_frame (kernel + compact + snap), off vs on
and a Mosaic matmul-precision probe (how many bf16 passes a plain f32
dot_general costs inside a kernel) to size the headroom of exact-bf16
binning.

Usage: python perf/parity_kernel_bench.py [--k 8,32]
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
    ap.add_argument("--k", default="8,32")
    args = ap.parse_args()
    k_pair = tuple(int(v) for v in args.k.split(","))

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.ops.preprocess import default_cell_px, preprocess_frame
    from trackdlo_tpu.ops.preprocess_kernel import cell_sums_pallas

    interp = jax.default_backend() != "tpu"
    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    rgb, depth = render_frame(rope, 1 / 15.0, intr)
    rgb = jnp.asarray(rgb)
    depth = jnp.asarray(depth)
    occ = jnp.ones((intr.height, intr.width), bool)
    cell = default_cell_px(params.downsample_leaf_size, intr.fx)
    leaf = params.downsample_leaf_size
    print(f"backend={jax.default_backend()} cell_px={cell} leaf={leaf}")

    def time_kernel(parity):
        def build():
            def body(c):
                cl, ct = cell_sums_pallas(
                    rgb, depth + (c * 0).astype(depth.dtype), occ,
                    intr.fx, intr.fy, intr.cx, intr.cy,
                    params.hsv_lower, params.hsv_upper, False, cell,
                    interpret=interp, parity_split=parity,
                    voxel_leaf=leaf if parity else None,
                )
                return jnp.sum(ct) * 1e-12 + c * 0.5
            return body
        return scan_time(build, k_pair)

    def time_full(parity):
        def build():
            def body(c):
                pc = preprocess_frame(
                    rgb, depth + (c * 0).astype(depth.dtype), occ,
                    intr.fx, intr.fy, intr.cx, intr.cy,
                    params.hsv_lower, params.hsv_upper, False, cell,
                    params.max_points, voxel_leaf=leaf,
                    candidate_cap=8192 if parity else 4096,
                    parity_split=parity,
                )
                return jnp.sum(pc.points) * 1e-12 + c * 0.5
            return body
        return scan_time(build, k_pair)

    from trackdlo_tpu.ops.preprocess import compact_cells

    def time_model_path(parity):
        """Kernel + compact/snap — the path models/trackdlo.py runs on TPU."""
        def build():
            def body(c):
                cl, ct = cell_sums_pallas(
                    rgb, depth + (c * 0).astype(depth.dtype), occ,
                    intr.fx, intr.fy, intr.cx, intr.cy,
                    params.hsv_lower, params.hsv_upper, False, cell,
                    interpret=interp, parity_split=parity, voxel_leaf=leaf,
                )
                pc = compact_cells(
                    cl, ct, params.max_points, leaf,
                    candidate_cap=8192 if parity else 4096,
                    n_channels=8 if parity else 1,
                )
                return jnp.sum(pc.points) * 1e-12 + c * 0.5
            return body
        return scan_time(build, k_pair)

    print(f"kernel   parity=off : {time_kernel(False):8.3f} ms")
    print(f"kernel   parity=on  : {time_kernel(True):8.3f} ms")
    print(f"model    parity=off : {time_model_path(False):8.3f} ms")
    print(f"model    parity=on  : {time_model_path(True):8.3f} ms")
    print(f"full XLA parity=off : {time_full(False):8.3f} ms")
    print(f"full XLA parity=on  : {time_full(True):8.3f} ms")

    # --- Mosaic f32 matmul pass-count probe ------------------------------
    # One (768,1280)x(1280,128) dot per scan step inside a trivial kernel,
    # under three precisions. Ratios reveal passes (1 / 3 / 6).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a = jnp.asarray(np.random.rand(768, 1280), jnp.float32)
    bmat = jnp.asarray(np.random.rand(1280, 128), jnp.float32)

    def probe(precision):
        def kern(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )

        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((768, 128), jnp.float32),
            interpret=interp,
        )

        def build():
            def body(c):
                o = f(a + c * 0, bmat)
                return jnp.sum(o) * 1e-12 + c * 0.5
            return body
        return scan_time(build, (32, 256))

    for prec in ("default", "highest"):
        print(f"f32 dot precision={prec:8s}: {probe(prec):8.4f} ms")

    a16 = a.astype(jnp.bfloat16)
    b16 = bmat.astype(jnp.bfloat16)

    def probe_bf16():
        def kern(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((768, 128), jnp.float32),
            interpret=interp,
        )

        def build():
            def body(c):
                o = f(a16 + (c * 0).astype(jnp.bfloat16), b16)
                return jnp.sum(o) * 1e-12 + c * 0.5
            return body
        return scan_time(build, (32, 256))

    print(f"bf16 dot                 : {probe_bf16():8.4f} ms")


if __name__ == "__main__":
    main()

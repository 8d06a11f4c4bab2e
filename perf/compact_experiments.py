"""Cost-model experiments for the parity compaction stage (round-3 cont.).

The default-profile preprocess tail — batched (8, 7722) 5-operand
compaction sort + (8, 256) snap — costs ~0.17 ms of the 0.73 ms step.
This script measures, with in-graph scan slopes on the real TPU:

  1. a sort cost model: batch x length x operand-count grid,
  2. batched row-gather cost at candidate scale (take_along_axis),
  3. candidate variants:
     - packed-cnt sort (cnt folded into the int32 key: 5 -> 4 operands),
     - flat any-live spatial compaction + per-channel payload gather,
  vs the shipped compact_cells + channel snap baseline.

Usage: python perf/compact_experiments.py
"""

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


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.ops.preprocess import compact_cells
    from trackdlo_tpu.ops.preprocess_kernel import cell_sums_pallas

    params = live_params()
    intr = CameraIntrinsics()
    from trackdlo_tpu.ops.preprocess import default_cell_px

    cell = default_cell_px(params.downsample_leaf_size, intr.fx)
    leaf = params.downsample_leaf_size
    rope = SyntheticRope()
    rgb, depth = render_frame(rope, 1 / 15.0, intr)
    rgbj, depthj = jnp.asarray(rgb), jnp.asarray(depth)
    occ = jnp.ones((intr.height, intr.width), bool)
    interp = jax.default_backend() != "tpu"

    cells8, counts8 = jax.jit(
        lambda r, d: cell_sums_pallas(
            r, d, occ, intr.fx, intr.fy, intr.cx, intr.cy,
            params.hsv_lower, params.hsv_upper, False, cell, interpret=interp,
            parity_split=True, voxel_leaf=leaf,
        )
    )(rgbj, depthj)
    n_per = cells8.shape[0] // 8
    cap = params.candidate_cap()
    cap_per = cap // 8
    print(f"n_per={n_per} cap={cap} cap_per={cap_per}")

    results = {}

    # --- baseline ---------------------------------------------------------
    def compact_body():
        def body(c):
            p = compact_cells(
                cells8, counts8 + c * 0, params.max_points, leaf,
                candidate_cap=cap, n_channels=8,
            )
            return jnp.sum(p.points) * 1e-12 + c * 0.5
        return body

    results["baseline_compact+snap"] = med3(compact_body)

    # --- sort cost model --------------------------------------------------
    rng = np.random.default_rng(0)

    def sort_body(batch, length, n_ops):
        keys = jnp.asarray(
            rng.integers(0, 1 << 20, (batch, length)), jnp.int32
        )
        pays = [
            jnp.asarray(rng.uniform(size=(batch, length)), jnp.float32)
            for _ in range(n_ops - 1)
        ]

        def body(c):
            out = jax.lax.sort(
                (keys + (c * 0).astype(jnp.int32), *pays), num_keys=1
            )
            return sum(jnp.sum(o[..., :8]) for o in out[1:]) * 1e-12 + c * 0.5

        if n_ops == 1:
            def body(c):  # noqa: F811
                out = jax.lax.sort(
                    (keys + (c * 0).astype(jnp.int32),), num_keys=1
                )
                return jnp.sum(out[0][..., :8]).astype(jnp.float32) * 1e-12 + c * 0.5
        return body

    for batch, length, n_ops in (
        (8, 7722, 5), (8, 7722, 4), (8, 7722, 1),
        (8, 2048, 5), (8, 2048, 1),
    ):
        key = f"sort_b{batch}_L{length}_ops{n_ops}"
        results[key] = med3(lambda b=batch, l=length, o=n_ops: sort_body(b, l, o))
        print(f"{key:28s} {results[key]:8.4f} ms", flush=True)

    # --- gather cost ------------------------------------------------------
    def gather_body(k_rows, width):
        src = jnp.asarray(rng.uniform(size=(8, n_per, width)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n_per, (8, k_rows)), jnp.int32)

        def body(c):
            i = idx + (c * 0).astype(jnp.int32)
            out = jnp.take_along_axis(src, i[..., None], axis=1)
            return jnp.sum(out[..., 0]) * 1e-12 + c * 0.5
        return body

    for k_rows in (256, 1024):
        for width in (4,):
            key = f"gather_rows{k_rows}_w{width}"
            results[key] = med3(lambda k=k_rows, w=width: gather_body(k, w))
            print(f"{key:28s} {results[key]:8.4f} ms")

    # --- variant: packed-cnt 4-operand compact sort -----------------------
    def packed_body():
        cellsr = cells8.reshape(8, n_per, 3)
        countsr = counts8.reshape(8, n_per)
        # cnt <= cell_px^2 < 2^14; n_per < 2^13 -> key fits easily in int31.
        bits = 14

        def body(c):
            cnt = countsr + c * 0
            valid = cnt > 0
            idx = jnp.arange(n_per, dtype=jnp.int32)[None, :]
            key = jnp.where(valid, idx, n_per) << bits
            key = key | jnp.minimum(cnt, float((1 << bits) - 1)).astype(jnp.int32)
            key_s, x_s, y_s, z_s = jax.lax.sort(
                (key, cellsr[..., 0], cellsr[..., 1], cellsr[..., 2]),
                num_keys=1,
            )
            kk = key_s[:, :cap_per]
            validk = (kk >> bits) < n_per
            cnt_k = jnp.where(validk, (kk & ((1 << bits) - 1)).astype(jnp.float32), 0.0)
            return (
                jnp.sum(x_s[:, :cap_per]) * 1e-12
                + jnp.sum(cnt_k) * 1e-12
                + c * 0.5
            )
        return body

    results["variant_packedcnt_sort"] = med3(packed_body)
    print(f"{'variant_packedcnt_sort':28s} {results['variant_packedcnt_sort']:8.4f} ms")

    # --- variant: flat any-live compact + gather ---------------------------
    def anylive_body(cap_any):
        cellsr = cells8.reshape(8, n_per, 3)
        countsr = counts8.reshape(8, n_per)

        def body(c):
            cnt = countsr + c * 0
            live_any = jnp.any(cnt > 0, axis=0)  # (n_per,)
            idx = jnp.arange(n_per, dtype=jnp.int32)
            key = jnp.where(live_any, idx, n_per)
            key_s = jax.lax.sort((key,), num_keys=1)[0][:cap_any]
            kept = jnp.minimum(key_s, n_per - 1)  # (cap_any,)
            payload = jnp.concatenate([cellsr, cnt[..., None]], axis=-1)
            out = jnp.take_along_axis(
                payload, jnp.broadcast_to(kept[None, :, None], (8, cap_any, 1)),
                axis=1,
            )
            validk = (key_s < n_per)[None, :] & (out[..., 3] > 0)
            return jnp.sum(jnp.where(validk, out[..., 0], 0.0)) * 1e-12 + c * 0.5
        return body

    for cap_any in (512, 1024):
        key = f"variant_anylive_{cap_any}"
        results[key] = med3(lambda ca=cap_any: anylive_body(ca))
        print(f"{key:28s} {results[key]:8.4f} ms")

    for k, v in results.items():
        print(f"{k:28s} {v:8.4f} ms")
    with open(os.path.join(os.path.dirname(__file__), "compact_experiments.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

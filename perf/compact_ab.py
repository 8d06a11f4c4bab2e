"""Focused A/B: 5-operand baseline sort vs packed-cnt 4-operand variant.

HISTORICAL NOTE: the recorded compact_ab.json PREDATES the merge of the
packed-count variant into compact_cells (commit 33cb6a2). Since that merge
the in-tree compact_cells IS the packed variant, so this script inlines the
old 5-operand sort below (_baseline_compact) to keep the A/B meaningful —
rerunning compares genuine old-vs-new, not packed-vs-packed.

compact_experiments2.py's tiny bodies produced slopes inside the tunnel
noise floor (rank_thinning measured -0.25 ms). This reruns ONLY the two
end-to-end candidates with larger k_pair and prints every slope sample so
the spread is visible.

Usage: python perf/compact_ab.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_samples(build_body, k_pair=(32, 288), reps=5):
    import jax
    import jax.numpy as jnp

    out = []
    for _ in range(reps):
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
        out.append((times[1] - times[0]) / (k_pair[1] - k_pair[0]) * 1000.0)
    return out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.ops.preprocess import (
        _voxel_snap_channels, default_cell_px,
    )
    from trackdlo_tpu.ops.preprocess_kernel import cell_sums_pallas

    params = live_params()
    intr = CameraIntrinsics()
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
    n_cells = cells8.shape[0]
    n_per = n_cells // 8
    cap = params.candidate_cap()
    cap_per = cap // 8
    parities = jnp.asarray(
        [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], jnp.int32
    )
    cellsr3 = cells8.reshape(8, n_per, 3)
    countsr = counts8.reshape(8, n_per)
    bits = 14

    def baseline_body():
        # The PRE-merge 5-operand sort (counts carried as a separate
        # operand), inlined so the A/B still measures old-vs-new now that
        # compact_cells itself ships the packed variant (commit 33cb6a2).
        def body(c):
            cnt = countsr + c * 0
            vch = cnt > 0
            vi = vch.astype(jnp.int32)
            n_occ = jnp.sum(vi, axis=1, keepdims=True)
            n_eff = jnp.maximum(n_occ, cap_per)
            rank = jnp.cumsum(vi, axis=1) - vi
            kept = vch & ((rank + 1) * cap_per // n_eff > rank * cap_per // n_eff)
            idx = jnp.arange(n_per, dtype=jnp.int32)[None, :]
            key = jnp.where(kept, idx, n_per)
            key_s, cnt_s, x_s, y_s, z_s = jax.lax.sort(
                (key, cnt, cellsr3[..., 0], cellsr3[..., 1], cellsr3[..., 2]),
                num_keys=1,
            )
            validk = key_s[:, :cap_per] < n_per
            cnt_k = jnp.where(validk, cnt_s[:, :cap_per], 0.0)
            pts_k = jnp.stack([a[:, :cap_per] for a in (x_s, y_s, z_s)], axis=-1)
            s, v = _voxel_snap_channels(pts_k, cnt_k, leaf, parities)
            return jnp.sum(s) * 1e-12 + c * 0.5
        return body

    def packed_body():
        def body(c):
            cnt = countsr + c * 0
            vch = cnt > 0
            vi = vch.astype(jnp.int32)
            n_occ = jnp.sum(vi, axis=1, keepdims=True)
            n_eff = jnp.maximum(n_occ, cap_per)
            rank = jnp.cumsum(vi, axis=1) - vi
            kept = vch & ((rank + 1) * cap_per // n_eff > rank * cap_per // n_eff)
            idx = jnp.arange(n_per, dtype=jnp.int32)[None, :]
            key = (jnp.where(kept, idx, n_per) << bits) | jnp.minimum(
                cnt, float((1 << bits) - 1)
            ).astype(jnp.int32)
            key_s, x_s, y_s, z_s = jax.lax.sort(
                (key, cellsr3[..., 0], cellsr3[..., 1], cellsr3[..., 2]),
                num_keys=1,
            )
            kk = key_s[:, :cap_per]
            validk = (kk >> bits) < n_per
            cnt_k = jnp.where(
                validk, (kk & ((1 << bits) - 1)).astype(jnp.float32), 0.0
            )
            pts_k = jnp.stack([a[:, :cap_per] for a in (x_s, y_s, z_s)], axis=-1)
            s, v = _voxel_snap_channels(pts_k, cnt_k, leaf, parities)
            return jnp.sum(s) * 1e-12 + c * 0.5
        return body

    results = {}
    for name, b in (("baseline", baseline_body), ("packedcnt", packed_body)):
        s = slope_samples(b)
        results[name] = {"median": float(np.median(s)), "samples": s}
        print(f"{name:10s} median={np.median(s):8.4f} ms  samples="
              f"{[round(x, 4) for x in s]}", flush=True)

    with open(os.path.join(os.path.dirname(__file__), "compact_ab.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

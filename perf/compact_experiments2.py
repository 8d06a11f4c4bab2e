"""Surgical decomposition of the ACTUAL compact_cells+snap path (round-3).

compact_experiments.py showed raw random-key sorts at 0.086 ms but the
packed-cnt variant at 0.037 — suspicion: XLA's TPU sort is data-dependent
and the real (nearly-sorted) keys sort much cheaper than random ones. This
measures the real path's pieces with the real cell data:

  - the real 5-operand compaction sort alone (real keys),
  - the rank/even-stride-thinning logic alone,
  - the channel snap alone on real candidates,
  - end-to-end packed-cnt and spatial (any-live) variants vs baseline.

Usage: python perf/compact_experiments2.py
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
    from trackdlo_tpu.ops.preprocess import (
        _voxel_snap_channels, compact_cells, default_cell_px,
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
    print(f"n_per={n_per} cap={cap} cap_per={cap_per} "
          f"occ={int(np.asarray(jnp.sum(counts8 > 0)))}")

    results = {}
    cellsr3 = cells8.reshape(8, n_per, 3)
    countsr = counts8.reshape(8, n_per)

    # --- baseline end-to-end ------------------------------------------------
    def baseline_body():
        def body(c):
            p = compact_cells(
                cells8, counts8 + c * 0, params.max_points, leaf,
                candidate_cap=cap, n_channels=8,
            )
            return jnp.sum(p.points) * 1e-12 + c * 0.5
        return body

    results["baseline_e2e"] = med3(baseline_body)
    print(f"baseline_e2e        {results['baseline_e2e']:8.4f} ms", flush=True)

    # --- the real 5-operand sort alone (kept = valid, no thinning) ---------
    def realsort_body():
        def body(c):
            cnt = countsr + c * 0
            vch = cnt > 0
            keys = jnp.where(vch, jnp.arange(n_per, dtype=jnp.int32)[None, :], n_per)
            out = jax.lax.sort(
                (keys, cellsr3[..., 0], cellsr3[..., 1], cellsr3[..., 2], cnt),
                num_keys=1,
            )
            return sum(jnp.sum(o[:, :8]) for o in out[1:]) * 1e-12 + c * 0.5
        return body

    results["real_sort5"] = med3(realsort_body)
    print(f"real_sort5          {results['real_sort5']:8.4f} ms", flush=True)

    # --- rank/even-stride thinning logic alone ------------------------------
    def rank_body():
        def body(c):
            cnt = countsr + c * 0
            vch = cnt > 0
            vi = vch.astype(jnp.int32)
            n_occ = jnp.sum(vi, axis=1, keepdims=True)
            n_eff = jnp.maximum(n_occ, cap_per)
            rank = jnp.cumsum(vi, axis=1) - vi
            kept = vch & ((rank + 1) * cap_per // n_eff > rank * cap_per // n_eff)
            return jnp.sum(kept.astype(jnp.float32)) * 1e-12 + c * 0.5
        return body

    results["rank_thinning"] = med3(rank_body)
    print(f"rank_thinning       {results['rank_thinning']:8.4f} ms", flush=True)

    # --- channel snap alone on real candidates ------------------------------
    pc0 = jax.jit(
        lambda cc, ct: compact_cells(
            cc, ct, params.max_points, leaf, candidate_cap=cap, n_channels=8
        )
    )(cells8, counts8)
    pts_ch = jnp.asarray(np.asarray(pc0.points[: cap].reshape(8, cap_per, 3)))
    w_ch = jnp.asarray(
        np.asarray(pc0.mask[: cap].reshape(8, cap_per)).astype(np.float32)
    )
    parities = jnp.asarray(
        [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], jnp.int32
    )

    def snap_body():
        def body(c):
            s, v = _voxel_snap_channels(pts_ch + c * 1e-12, w_ch, leaf, parities)
            return jnp.sum(s) * 1e-12 + c * 0.5
        return body

    results["channel_snap"] = med3(snap_body)
    print(f"channel_snap        {results['channel_snap']:8.4f} ms", flush=True)

    # --- packed-cnt end-to-end (sort with cnt folded into key + snap) ------
    bits = 14

    def packed_e2e_body():
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
            pts_k = jnp.stack(
                [a[:, :cap_per] for a in (x_s, y_s, z_s)], axis=-1
            )
            s, v = _voxel_snap_channels(pts_k, cnt_k, leaf, parities)
            return jnp.sum(s) * 1e-12 + c * 0.5
        return body

    results["packedcnt_e2e"] = med3(packed_e2e_body)
    print(f"packedcnt_e2e       {results['packedcnt_e2e']:8.4f} ms", flush=True)

    # --- spatial (any-live) end-to-end: flat sort + shared gather + snap ----
    cap_any = params.max_points // 8  # 512: keeps total slots == max_points

    def spatial_e2e_body():
        def body(c):
            cnt = countsr + c * 0
            live_any = jnp.any(cnt > 0, axis=0)
            vi = live_any.astype(jnp.int32)
            n_occ = jnp.sum(vi)
            n_eff = jnp.maximum(n_occ, cap_any)
            rank = jnp.cumsum(vi) - vi
            kept = live_any & (
                (rank + 1) * cap_any // n_eff > rank * cap_any // n_eff
            )
            idx = jnp.arange(n_per, dtype=jnp.int32)
            key = jnp.where(kept, idx, n_per)
            key_s = jax.lax.sort((key,), num_keys=1)[0][:cap_any]
            keptid = jnp.minimum(key_s, n_per - 1)
            payload = jnp.concatenate([cellsr3, cnt[..., None]], axis=-1)
            out = jnp.take_along_axis(
                payload,
                jnp.broadcast_to(keptid[None, :, None], (8, cap_any, 1)),
                axis=1,
            )
            validk = (key_s < n_per)[None, :] & (out[..., 3] > 0)
            w_k = jnp.where(validk, out[..., 3], 0.0)
            s, v = _voxel_snap_channels(out[..., :3], w_k, leaf, parities)
            return jnp.sum(s) * 1e-12 + c * 0.5
        return body

    results["spatial_e2e"] = med3(spatial_e2e_body)
    print(f"spatial_e2e         {results['spatial_e2e']:8.4f} ms", flush=True)

    for k, v in results.items():
        print(f"{k:20s} {v:8.4f} ms")
    with open(os.path.join(os.path.dirname(__file__),
                           "compact_experiments2.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

"""Decompose the compact+snap stage (~158 us, perf/preprocess_roofline.json).

The preprocess roofline bounded the Pallas kernel at ~1.4x its VPU/MXU floor
but left compact_snap without a fundamental-bound argument (ROADMAP round-4
close-out gap #1). This script splits it into its sub-stages, each measured
with the in-graph lax.scan slope harness (the only dispatch-free method on
the tunnelled TPU — CLAUDE.md):

- kept_only: the overflow-stride cumsum producing the kept mask;
- pack_onehot: the one-hot MXU compaction kernel (the unbatched product path);
- pack_sort: the packed-key batched sort back end (the vmap product path);
- snap_only: _voxel_snap_channels on a pre-packed candidate set
  (parity pin + batched 5-op sort + 2 segment_sums + divide);
- snap_sort_only: just the batched 5-operand lax.sort;
- snap_segsum_only: the two segment_sums + centroid divide on pre-sorted data;
- cap_only: _cap_snapped at the shipped cap (statically free: cap<=max_points);
- full: compact_cells end to end (the number the roofline reports).

Data sizes at the shipped default: 8 channels x 7722 cells in, 8 x 256
candidates packed, 2048 snap slots out. All sub-stage inputs come from the
real kernel on the same synthetic frame the roofline uses.

Usage (TPU): python perf/compact_snap_decomp.py
Writes perf/compact_snap_decomp.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf.preprocess_roofline import med3  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.ops.preprocess import (
        _cap_snapped,
        _compact_channels_sort,
        _voxel_snap_channels,
        compact_cells,
        default_cell_px,
    )
    from trackdlo_tpu.ops.preprocess_kernel import (
        cell_sums_pallas,
        compact_onehot_pallas,
    )

    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    rgb, depth = render_frame(rope, 2 / 15.0, intr)
    rgbj, depthj = jnp.asarray(rgb), jnp.asarray(depth)
    occ = jnp.ones((intr.height, intr.width), bool)
    leaf = params.downsample_leaf_size
    cell = params.downsample_cell_px or default_cell_px(leaf, intr.fx)
    cap = params.candidate_cap()
    cap_per = cap // 8

    # r5: the channel-grid interface (dense (8, n_per) coordinate arrays —
    # no (C, 3) lane-padded intermediates; see compact_parity_channels).
    sx8, sy8, sz8, counts_ch = cell_sums_pallas(
        rgbj, depthj, occ, intr.fx, intr.fy, intr.cx, intr.cy,
        params.hsv_lower, params.hsv_upper, False, cell,
        interpret=False, parity_split=True, voxel_leaf=leaf,
        channel_grids=True,
    )
    den8 = jnp.maximum(counts_ch, 1.0)
    xs8, ys8, zs8 = sx8 / den8, sy8 / den8, sz8 / den8
    n_per = counts_ch.shape[1]

    def kept_of(counts_ch):
        vch = counts_ch > 0
        if n_per > cap_per:
            vi = vch.astype(jnp.int32)
            n_occ = jnp.sum(vi, axis=1, keepdims=True)
            n_eff = jnp.maximum(n_occ, cap_per)
            rank = jnp.cumsum(vi, axis=1) - vi
            return vch & (
                (rank + 1) * cap_per // n_eff > rank * cap_per // n_eff
            )
        return vch

    kept = kept_of(counts_ch)
    # Pre-packed candidates for the snap-only stages.
    pts_ch, cnt_s, valid_ch = _compact_channels_sort(
        xs8, ys8, zs8, counts_ch, kept, cap_per
    )
    pts_ch = jnp.stack([pts_ch[..., 0], pts_ch[..., 1], pts_ch[..., 2]], -1)
    w_ch = jnp.where(valid_ch, cnt_s, 0.0)
    parities = jnp.asarray(
        [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], jnp.int32
    )

    results = {}

    def body_of(fn):
        def build():
            def body(c):
                return jnp.sum(fn(c)) * 1e-12 + c * 0.5
            return body
        return build

    results["kept_only"] = med3(
        body_of(lambda c: kept_of(counts_ch + c * 0).astype(jnp.float32))
    )
    results["pack_onehot"] = med3(
        body_of(
            lambda c: compact_onehot_pallas(
                xs8, ys8, zs8, counts_ch + c * 0, kept, cap_per
            )[0]
        )
    )
    results["pack_sort"] = med3(
        body_of(
            lambda c: _compact_channels_sort(
                xs8, ys8, zs8, counts_ch + c * 0, kept, cap_per
            )[0]
        )
    )
    results["snap_only"] = med3(
        body_of(
            lambda c: _voxel_snap_channels(
                pts_ch, w_ch + c * 0, leaf, parities
            )[0]
        )
    )

    # Snap internals, split at the sort boundary.
    inv = 1.0 / leaf

    def snap_keys(w):
        f = pts_ch * inv
        ijk = jnp.floor(f).astype(jnp.int32)
        mismatch = (ijk & 1) != parities[:, None, :]
        adj = jnp.where(f - ijk.astype(jnp.float32) >= 0.5, 1, -1)
        ijk = jnp.where(mismatch, ijk + adj, ijk)
        valid = w > 0
        ijk_min = jnp.min(
            jnp.where(valid[..., None], ijk, jnp.iinfo(jnp.int32).max),
            axis=1, keepdims=True,
        )
        rel = jnp.clip(ijk - ijk_min, 0, (1 << 10) - 1)
        key = rel[..., 0] * (1 << 20) + rel[..., 1] * (1 << 10) + rel[..., 2]
        key = jnp.where(valid, key, jnp.iinfo(jnp.int32).max)
        w_eff = jnp.where(valid, w, 0.0)
        return key, w_eff

    def snap_sorted(w):
        key, w_eff = snap_keys(w)
        return jax.lax.sort(
            (key, w_eff, pts_ch[..., 0] * w_eff, pts_ch[..., 1] * w_eff,
             pts_ch[..., 2] * w_eff),
            num_keys=1,
        )

    results["snap_sort_only"] = med3(body_of(lambda c: snap_sorted(w_ch + c * 0)[1]))

    key_s, w_s, wx_s, wy_s, wz_s = snap_sorted(w_ch)

    def segsum_tail(w_s_in):
        c_ch, p = key_s.shape
        new_seg = jnp.concatenate(
            [jnp.ones((c_ch, 1), bool), key_s[:, 1:] != key_s[:, :-1]], axis=1
        )
        seg_id = (
            jnp.cumsum(new_seg.astype(jnp.int32), axis=1) - 1
            + jnp.arange(c_ch, dtype=jnp.int32)[:, None] * p
        ).reshape(-1)
        wsum = jax.ops.segment_sum(
            w_s_in.reshape(-1), seg_id, num_segments=c_ch * p
        )
        psum = jax.ops.segment_sum(
            jnp.stack([wx_s, wy_s, wz_s], axis=-1).reshape(-1, 3),
            seg_id, num_segments=c_ch * p,
        )
        return psum / jnp.maximum(wsum, 1.0)[:, None]

    results["snap_segsum_only"] = med3(body_of(lambda c: segsum_tail(w_s + c * 0)))

    snapped, snap_valid = _voxel_snap_channels(pts_ch, w_ch, leaf, parities)
    results["cap_only"] = med3(
        body_of(
            lambda c: _cap_snapped(
                snapped + c * 0, snap_valid, cap, params.max_points
            )[0]
        )
    )

    results["full"] = med3(
        body_of(
            lambda c: compact_cells(
                cells8, counts8 + c * 0, params.max_points, leaf,
                candidate_cap=cap, n_channels=8,
            ).points
        )
    )

    for k, v in results.items():
        print(f"{k:18s} {v * 1000:8.1f} us")
    out = {"config": {"cell_px": cell, "leaf": leaf, "cap": cap},
           "measured_us": {k: v * 1000 for k, v in results.items()}}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "compact_snap_decomp.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()

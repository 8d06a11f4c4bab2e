"""Attribute the composed-preprocess glue (VERDICT r4 weak #5 / task #5).

The r4 roofline left a gap unexplained: kernel_8ch 106 us + compact_snap 158
us compose to ~278 us, while the isolated compact pieces sum to ~67 us
(perf/compact_snap_decomp.json). The suspected burner is LAYOUT: the
kernel<->compact interface materializes (C, 3) f32 centroid arrays, and on
TPU a (61776, 3) array tile-pads its lane dimension 3 -> 128 (42x traffic
blowup), plus the trim slice (8,72,128)->(8,66,117)->reshape(-1) forces
relayout copies.

This probe decomposes the composed default path stage-by-stage with the
in-graph lax.scan slope (the only dispatch-free method over the tunnelled
TPU, CLAUDE.md):

- input_prep:    channel-split + pad of rgb/depth/occ into kernel operands
- kernel_raw:    the pallas binning call on PRE-PADDED operands, raw
                 (8, 72, 128) outputs reduced in place (no trim/divide)
- kernel_tail:   + the current trim -> divide -> stack((C,3)) epilogue
- cells_full:    cell_sums_pallas as shipped (= prep + raw + tail)
- compact_front: (C,3)+counts -> reshape/stack (8,n_per,3) + kept cumsum
- onehot_full:   compact_onehot_pallas from pre-shaped (8,n_per,3)
- snap:          _voxel_snap_channels from pre-shaped (8,cap,3)
- composed:      the shipped preprocess_for_step pallas path

Usage (TPU): python perf/preprocess_glue_probe.py
Writes perf/preprocess_glue_probe.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from preprocess_roofline import med3  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.ops.preprocess import (
        compact_cells, default_cell_px, _voxel_snap_channels,
    )
    from trackdlo_tpu.ops import preprocess_kernel as pk

    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    rgb, depth = render_frame(rope, 2 / 15.0, intr)
    rgbj, depthj = jnp.asarray(rgb), jnp.asarray(depth)
    occ = jnp.ones((intr.height, intr.width), bool)
    cell = params.downsample_cell_px or default_cell_px(
        params.downsample_leaf_size, intr.fx
    )
    leaf = params.downsample_leaf_size
    h, w = intr.height, intr.width
    h_pad = pk._round_up(h, pk.ROW_BLOCK)
    w_pad = pk._round_up(w, pk.COL_BLOCK)
    cap = params.candidate_cap()
    cap_per = cap // 8

    path = os.path.join(os.path.dirname(__file__), "preprocess_glue_probe.json")
    res = {"config": {"cell_px": cell, "leaf": leaf, "cap": cap}}
    if os.path.exists(path):
        # Resumable over tunnel outages: keep completed stages.
        with open(path) as f:
            res.update(json.load(f))

    def record(name, fn):
        if name in res:
            print(name, res[name], "(cached)", flush=True)
            return
        res[name] = fn()
        print(name, res[name], flush=True)
        with open(path, "w") as f:
            json.dump(res, f, indent=1)

    # ---- input prep: channel split + pad --------------------------------
    def prep(rgb_in, d_in, o_in):
        r = jnp.zeros((h_pad, w_pad), jnp.uint8).at[:h, :w].set(rgb_in[..., 0])
        g = jnp.zeros((h_pad, w_pad), jnp.uint8).at[:h, :w].set(rgb_in[..., 1])
        b = jnp.zeros((h_pad, w_pad), jnp.uint8).at[:h, :w].set(rgb_in[..., 2])
        d = jnp.zeros((h_pad, w_pad), jnp.uint16).at[:h, :w].set(d_in)
        o = jnp.zeros((h_pad, w_pad), jnp.uint8).at[:h, :w].set(
            o_in.astype(jnp.uint8)
        )
        return r, g, b, d, o

    def prep_body():
        def body(c):
            d = (depthj.astype(jnp.int32) + (c * 0).astype(jnp.int32)).astype(
                jnp.uint16
            )
            outs = prep(rgbj, d, occ)
            s = sum(jnp.sum(a.astype(jnp.float32)) for a in outs)
            return s * 1e-12 + c * 0.5
        return body

    record("input_prep", lambda: med3(prep_body))

    # ---- raw kernel on pre-padded operands -------------------------------
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_cell_rows = -(-h // cell)
    n_cell_cols = -(-w // cell)
    ncr_pad = pk._round_up(n_cell_rows, 8)
    ncc_pad = pk._round_up(n_cell_cols, 128)
    kernel = pk._make_kernel(
        tuple(params.hsv_lower), tuple(params.hsv_upper), False,
        intr.fx, intr.fy, intr.cx, intr.cy, cell, ncr_pad,
        parity_split=True, voxel_leaf_static=leaf, with_votes=False,
        n_cell_cols_pad=ncc_pad, img_width=w, stacked_channels=False,
    )
    grid = (h_pad // pk.ROW_BLOCK, w_pad // pk.COL_BLOCK)
    block = lambda: pl.BlockSpec(
        (pk.ROW_BLOCK, pk.COL_BLOCK), lambda i, j: (i, j),
        memory_space=pltpu.VMEM,
    )
    out_block = (8, ncr_pad, ncc_pad)

    def raw_call(r, g, b, d, o):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[block()] * 5,
            out_specs=[
                pl.BlockSpec(out_block, lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            ] * 4,
            out_shape=[jax.ShapeDtypeStruct(out_block, jnp.float32)] * 4,
        )(r, g, b, d, o)

    rp, gp, bp, dp, op = (np.asarray(a) for a in prep(rgbj, depthj, occ))
    rp, gp, bp, dp, op = (jnp.asarray(a) for a in (rp, gp, bp, dp, op))

    def raw_body():
        def body(c):
            d = (dp.astype(jnp.int32) + (c * 0).astype(jnp.int32)).astype(
                jnp.uint16
            )
            sx, sy, sz, cnt = raw_call(rp, gp, bp, d, op)
            return (jnp.sum(sx) + jnp.sum(cnt)) * 1e-12 + c * 0.5
        return body

    record("kernel_raw", lambda: med3(raw_body))

    # ---- + the shipped trim/divide/stack epilogue ------------------------
    def tail_body():
        def body(c):
            d = (dp.astype(jnp.int32) + (c * 0).astype(jnp.int32)).astype(
                jnp.uint16
            )
            sx, sy, sz, cnt = raw_call(rp, gp, bp, d, op)
            trim = lambda a: a[:, :n_cell_rows, :n_cell_cols].reshape(-1)
            sx, sy, sz, cnt = trim(sx), trim(sy), trim(sz), trim(cnt)
            den = jnp.maximum(cnt, 1.0)
            cells = jnp.stack([sx / den, sy / den, sz / den], axis=1)
            return (jnp.sum(cells) + jnp.sum(cnt)) * 1e-12 + c * 0.5
        return body

    record("kernel_tail", lambda: med3(tail_body))

    # ---- shipped cell_sums_pallas (prep + raw + tail) ---------------------
    def cells_body():
        def body(c):
            d = (depthj.astype(jnp.int32) + (c * 0).astype(jnp.int32)).astype(
                jnp.uint16
            )
            cl, ct = pk.cell_sums_pallas(
                rgbj, d, occ, intr.fx, intr.fy, intr.cx, intr.cy,
                params.hsv_lower, params.hsv_upper, False, cell,
                interpret=False, parity_split=True, voxel_leaf=leaf,
            )
            return (jnp.sum(cl) + jnp.sum(ct)) * 1e-12 + c * 0.5
        return body

    record("cells_full", lambda: med3(cells_body))

    # ---- r5 channel-grid interface (no trim, no (C,3) stack) --------------
    def cells_grids_body():
        def body(c):
            d = (depthj.astype(jnp.int32) + (c * 0).astype(jnp.int32)).astype(
                jnp.uint16
            )
            xs, ys, zs, cnt = pk.cell_sums_pallas(
                rgbj, d, occ, intr.fx, intr.fy, intr.cx, intr.cy,
                params.hsv_lower, params.hsv_upper, False, cell,
                interpret=False, parity_split=True, voxel_leaf=leaf,
                channel_grids=True,
            )
            return (jnp.sum(xs) + jnp.sum(cnt)) * 1e-12 + c * 0.5
        return body

    record("cells_channel_grids", lambda: med3(cells_grids_body))

    # ---- compact front: (C,3) -> (8, n_per, 3) + kept ranks ---------------
    cl8, ct8 = pk.cell_sums_pallas(
        rgbj, depthj, occ, intr.fx, intr.fy, intr.cx, intr.cy,
        params.hsv_lower, params.hsv_upper, False, cell,
        interpret=False, parity_split=True, voxel_leaf=leaf,
    )
    cl8, ct8 = jnp.asarray(np.asarray(cl8)), jnp.asarray(np.asarray(ct8))
    n_per = ct8.shape[0] // 8

    def front(cells, counts):
        resh = lambda a: a.reshape(8, n_per)
        vch = resh(counts > 0)
        vi = vch.astype(jnp.int32)
        n_occ = jnp.sum(vi, axis=1, keepdims=True)
        n_eff = jnp.maximum(n_occ, cap_per)
        rank = jnp.cumsum(vi, axis=1) - vi
        kept = vch & ((rank + 1) * cap_per // n_eff > rank * cap_per // n_eff)
        cells3 = jnp.stack(
            [resh(cells[:, 0]), resh(cells[:, 1]), resh(cells[:, 2])], axis=-1
        )
        return cells3, resh(counts), kept

    def front_body():
        def body(c):
            cells3, cts, kept = front(cl8 + c * 0, ct8)
            return (
                jnp.sum(cells3) + jnp.sum(cts) + jnp.sum(kept)
            ) * 1e-12 + c * 0.5
        return body

    record("compact_front", lambda: med3(front_body))

    # ---- one-hot pack from pre-shaped operands ----------------------------
    cells3_h, cts_h, kept_h = front(cl8, ct8)
    cells3_h = jnp.asarray(np.asarray(cells3_h))
    cts_h = jnp.asarray(np.asarray(cts_h))
    kept_h = jnp.asarray(np.asarray(kept_h))

    xs_h = cells3_h[..., 0]
    ys_h = cells3_h[..., 1]
    zs_h = cells3_h[..., 2]

    def onehot_body():
        def body(c):
            pts, cnt, valid = pk.compact_onehot_pallas(
                xs_h + c * 0, ys_h, zs_h, cts_h, kept_h, cap_per
            )
            return (jnp.sum(pts) + jnp.sum(cnt)) * 1e-12 + c * 0.5
        return body

    record("onehot_full", lambda: med3(onehot_body))

    # ---- snap from pre-shaped (8, cap_per, 3) -----------------------------
    pts_h, cnt_h, valid_h = pk.compact_onehot_pallas(
        xs_h, ys_h, zs_h, cts_h, kept_h, cap_per
    )
    pts_h = jnp.asarray(np.asarray(pts_h))
    w_h = jnp.asarray(np.asarray(jnp.where(valid_h, cnt_h, 0.0)))
    parities = jnp.asarray(
        [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], jnp.int32
    )

    def snap_body():
        def body(c):
            snapped, sv = _voxel_snap_channels(
                pts_h + c * 0, w_h, leaf, parities
            )
            return (jnp.sum(snapped) + jnp.sum(sv)) * 1e-12 + c * 0.5
        return body

    record("snap", lambda: med3(snap_body))

    # ---- the shipped composed path ----------------------------------------
    from trackdlo_tpu.models.trackdlo import preprocess_for_step

    def composed_body():
        def body(c):
            o = occ & (depthj.astype(jnp.float32) + c >= c)
            p = preprocess_for_step(
                rgbj, depthj, o, params=params, intr=intr, cell_px=cell,
                use_pallas=True,
            )
            return jnp.sum(p.points) * 1e-12 + c * 0.5
        return body

    record("composed", lambda: med3(composed_body))

    print("wrote", path)


if __name__ == "__main__":
    main()

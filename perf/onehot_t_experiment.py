"""One-hot pack data-operand layout experiment (r5 glue hunt, step 2).

The shipped compact_onehot_pallas marshals its data operand as
(C, n_pad, 16) bf16 — lane dim 16 tile-pads to 128 in TPU memory, so the
array occupies ~17 MB and its write+read burns ~40 us of the pack's 57 us
(perf/preprocess_glue_probe.json onehot_full vs the dot's FLOP floor).

Variant under test: data TRANSPOSED to (C, 16, n_pad) — pieces on the
SUBLANE dim (16 pads nothing for bf16), cells on the LANE dim (dense) —
~2 MB total, with the in-kernel dot switched to contracting dims
(((2,), (2,)), ((0,), (0,))): onehot (C, cap, tile) x dataT (C, 16, tile)
contracting the tile axis of BOTH (an A@B^T form). Mosaic has a history of
silently mis-lowering nonstandard dot forms (CLAUDE.md r2 finding), so this
script validates the variant BITWISE against the shipped kernel on real
frame data, compiled on the TPU, before timing it. Ships only if exact.

Usage (TPU): python perf/onehot_t_experiment.py
Writes perf/onehot_t_experiment.json.
"""

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from preprocess_roofline import med3  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.ops.preprocess import default_cell_px
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
    cap_per = params.candidate_cap() // 8

    sx, sy, sz, cnt = pk.cell_sums_pallas(
        rgbj, depthj, occ, intr.fx, intr.fy, intr.cx, intr.cy,
        params.hsv_lower, params.hsv_upper, False, cell,
        interpret=False, parity_split=True, voxel_leaf=leaf,
        channel_grids=True,
    )
    den = jnp.maximum(cnt, 1.0)
    xs, ys, zs = sx / den, sy / den, sz / den
    xs, ys, zs, cnt = (jnp.asarray(np.asarray(a)) for a in (xs, ys, zs, cnt))
    c_ch, n_per = cnt.shape
    vch = cnt > 0
    vi = vch.astype(jnp.int32)
    n_occ = jnp.sum(vi, axis=1, keepdims=True)
    n_eff = jnp.maximum(n_occ, cap_per)
    rank0 = jnp.cumsum(vi, axis=1) - vi
    kept = vch & ((rank0 + 1) * cap_per // n_eff > rank0 * cap_per // n_eff)
    kept = jnp.asarray(np.asarray(kept))

    # ---- transposed-data variant -----------------------------------------
    def compact_onehot_t(xs, ys, zs, counts, kept, cap_per, tile=1024):
        c_ch, n_per = counts.shape
        n_pad = pk._round_up(n_per, tile)
        n_tiles = n_pad // tile

        ki = kept.astype(jnp.int32)
        rank = jnp.cumsum(ki, axis=1) - ki
        rank = jnp.where(kept & (rank < cap_per), rank, jnp.int32(2**30))
        n_kept = jnp.minimum(jnp.sum(ki, axis=1), cap_per)

        def split3(a):
            hi = a.astype(jnp.bfloat16)
            r1 = a - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, mid, lo

        pieces = []
        for q in (xs, ys, zs, counts):
            pieces.extend(split3(q))
        # (C, 16, n_pad) bf16: pieces on sublanes (16 = bf16 sublane tile),
        # cells on lanes — DENSE, ~2 MB, vs ~17 MB for (C, n_pad, 16).
        data_t = (
            jnp.zeros((c_ch, 16, n_pad), jnp.bfloat16)
            .at[:, :12, :n_per]
            .set(jnp.stack(pieces, axis=1))
        )
        rank_p = jnp.full((c_ch, n_pad), 2**30, jnp.int32).at[:, :n_per].set(
            rank
        )
        rank_b = jnp.broadcast_to(rank_p[:, None, :], (c_ch, 8, n_pad))
        live = jnp.max(
            (rank_p < cap_per).astype(jnp.float32).reshape(c_ch, n_tiles, tile),
            axis=(0, 2),
        )
        flags = jnp.broadcast_to(
            live.reshape(n_tiles, 1, 1), (n_tiles, 8, 128)
        ).reshape(n_tiles * 8, 128)

        def kernel(rank_ref, data_ref, flag_ref, out_ref):
            t = pl.program_id(0)

            @pl.when(t == 0)
            def _init():
                out_ref[:] = jnp.zeros_like(out_ref)

            @pl.when(flag_ref[0, 0] > 0)
            def _pack():
                ranks = rank_ref[:, 0:1, :]  # (C, 1, tile)
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (c_ch, cap_per, tile), 1
                )
                onehot = (rows == ranks).astype(jnp.bfloat16)
                contrib = jax.lax.dot_general(
                    onehot, data_ref[:],
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )  # (C, cap_per, 16)
                out_ref[:] += contrib

        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((c_ch, 8, tile), lambda t: (0, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c_ch, 16, tile), lambda t: (0, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (c_ch, cap_per, 16), lambda t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((c_ch, cap_per, 16), jnp.float32),
        )(rank_b, data_t, flags)

        x = out[..., 0] + out[..., 1] + out[..., 2]
        y = out[..., 3] + out[..., 4] + out[..., 5]
        z = out[..., 6] + out[..., 7] + out[..., 8]
        c = out[..., 9] + out[..., 10] + out[..., 11]
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (c_ch, cap_per), 1)
            < n_kept[:, None]
        )
        points = jnp.where(
            valid[..., None], jnp.stack([x, y, z], axis=-1), 0.0
        )
        return points, jnp.where(valid, c, 0.0), valid

    res = {}

    # ---- bitwise validation COMPILED ---------------------------------------
    ref = pk.compact_onehot_pallas(xs, ys, zs, cnt, kept, cap_per)
    got = compact_onehot_t(xs, ys, zs, cnt, kept, cap_per)
    for name, a, b in zip(
        ("points", "cnt", "valid"), ref, got
    ):
        a, b = np.asarray(a), np.asarray(b)
        exact = bool((a == b).all())
        res[f"bitwise_{name}"] = exact
        if not exact:
            res[f"max_abs_delta_{name}"] = float(np.abs(a - b).max())
    print("validation:", res, flush=True)

    # ---- timing -------------------------------------------------------------
    def body_of(fn):
        def build():
            def body(c):
                pts, cs, valid = fn(cnt + c * 0)
                return (jnp.sum(pts) + jnp.sum(cs)) * 1e-12 + c * 0.5
            return body
        return build

    res["shipped_us"] = med3(
        body_of(lambda ct: pk.compact_onehot_pallas(xs, ys, zs, ct, kept,
                                                    cap_per))
    ) * 1000.0
    print("shipped_us", res["shipped_us"], flush=True)
    res["transposed_us"] = med3(
        body_of(lambda ct: compact_onehot_t(xs, ys, zs, ct, kept, cap_per))
    ) * 1000.0
    print("transposed_us", res["transposed_us"], flush=True)

    path = os.path.join(os.path.dirname(__file__), "onehot_t_experiment.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()

"""Decompose the pre-EM's per-frame FIXED cost (everything outside the trips).

Round-4 ablation left a gap: in-context pre-EM is ~288 us at 6.85 trips but
the synthetic full-iteration costs ~21.5 us — so ~140 us/frame of the pre-EM
is iteration-INVARIANT staging, unattributed. This probe times each staging
piece on-device with the in-graph scan-slope method (perf/stage_scan_bench):

  - lle_regularizer (chain_lle_weights + H build) — suspected dominant:
    its (M, 7, 7) batched ``jnp.linalg.solve`` is batch-sequential LU on
    TPU (same pathology the M-step GJ kernel fixed for (B, 48, 48)).
  - the same with the solve replaced by an unrolled vectorized Gauss-Jordan
    (7 static elimination steps, fully parallel over the M batch; the Gram
    is SPD + 1e-5 reg so diagonal pivoting is stable).
  - mct staging: masked_geodesic_coords + mct_kernel + masks.
  - pallas pack: the pad_mm/pad_m3 scatters + pack_points transpose.
  - guide gather: state.y[vis_ext_idx] style row gather.

Usage (TPU): python perf/preem_fixed_probe.py [--json perf/preem_fixed_probe.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def scan_time(build_body, k_pair=(64, 448), reps=5):
    import jax
    import jax.numpy as jnp

    best = []
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
            _ = float(c)  # compile + first run
            t0 = time.perf_counter()
            c = run(jnp.asarray(0.0, jnp.float32))
            _ = float(c)
            times.append(time.perf_counter() - t0)
        best.append((times[1] - times[0]) / (k_pair[1] - k_pair[0]) * 1000.0)
    return float(np.median(best))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from trackdlo_tpu.config import live_params
    from trackdlo_tpu.ops.kernels import (
        lle_regularizer,
        masked_geodesic_coords,
        mct_kernel,
    )

    params = live_params()
    m = params.num_of_nodes
    rng = np.random.default_rng(0)
    y_np = np.cumsum(rng.normal(0, 0.01, (m, 3)).astype(np.float32), axis=0)
    y0 = jnp.asarray(y_np)
    node_mask = jnp.arange(m) < (m - 5)
    x_np = rng.normal(0, 0.1, (2048, 3)).astype(np.float32)
    x0 = jnp.asarray(x_np)
    x_mask0 = jnp.arange(2048) < 1800

    results = {}

    def body_lle():
        def body(c):
            y = y0 + c * 1e-6
            h = lle_regularizer(y, node_mask)
            return jnp.sum(h) * 1e-6 + c * 0.5

        return body

    results["lle_regularizer_us"] = scan_time(body_lle) * 1000.0
    print(f"lle_regularizer (batched linalg.solve): {results['lle_regularizer_us']:.1f} us")

    # Variant: chain_lle_weights with the batched LU replaced by unrolled GJ.
    from trackdlo_tpu.ops import kernels as K

    def chain_lle_weights_gj(y, nm, k=6):
        mm = y.shape[0]
        half = k // 2
        width = 2 * half + 1
        valid_count = jnp.sum(nm.astype(jnp.int32))
        idx = jnp.arange(mm)
        offsets = jnp.arange(width) - half
        neigh_idx_raw = idx[:, None] + offsets[None, :]
        slot_mask = (
            (neigh_idx_raw >= 0)
            & (neigh_idx_raw < valid_count)
            & (neigh_idx_raw != idx[:, None])
        )
        neigh_idx = jnp.clip(neigh_idx_raw, 0, mm - 1)
        neigh = y[neigh_idx]
        offsets_vec = y[:, None, :] - neigh
        offsets_vec = jnp.where(slot_mask[:, :, None], offsets_vec, 0.0)
        with jax.default_matmul_precision("highest"):
            gram = jnp.einsum("mwd,mvd->mwv", offsets_vec, offsets_vec)
        eye_w = jnp.eye(width, dtype=y.dtype)
        pair_mask = slot_mask[:, :, None] & slot_mask[:, None, :]
        gram = jnp.where(pair_mask, gram, eye_w[None, :, :])
        gram = gram + 1e-5 * eye_w[None, :, :]
        b = slot_mask.astype(y.dtype)[:, :, None]
        # Unrolled Gauss-Jordan over the width axis, vectorized over M.
        a = jnp.concatenate([gram, b], axis=2)  # (M, width, width+1)
        for j in range(width):
            piv = a[:, j : j + 1, j : j + 1]  # (M,1,1)
            row = a[:, j : j + 1, :] / piv  # (M,1,width+1)
            col = a[:, :, j : j + 1]  # (M,width,1)
            a = a - col * row
            a = a.at[:, j, :].set(row[:, 0, :])
        sol = a[:, :, width]
        denom = jnp.sum(sol * slot_mask, axis=1, keepdims=True)
        wi = jnp.where(slot_mask, sol / jnp.where(denom == 0, 1.0, denom), 0.0)
        w = jnp.zeros((mm, mm), y.dtype)
        rows = jnp.broadcast_to(idx[:, None], (mm, width))
        w = w.at[rows.ravel(), neigh_idx.ravel()].add(
            jnp.where(slot_mask, wi, 0.0).ravel(), mode="drop"
        )
        return jnp.where(nm[:, None], w, 0.0)

    def lle_reg_gj(y, nm):
        l_mat = chain_lle_weights_gj(y, nm)
        eye = jnp.eye(m, dtype=y.dtype) * nm[:, None].astype(y.dtype)
        i_l = eye - l_mat
        return jnp.matmul(i_l.T, i_l, precision=jax.lax.Precision.HIGHEST)

    # Numerics check vs the in-tree LU version (CPU-independent: same device).
    w_lu = np.asarray(K.chain_lle_weights(y0, node_mask))
    w_gj = np.asarray(chain_lle_weights_gj(y0, node_mask))
    max_dw = float(np.abs(w_lu - w_gj).max())
    results["gj_vs_lu_max_abs_dw"] = max_dw
    print(f"unrolled-GJ vs batched-LU weights: max |dW| = {max_dw:.3e}")

    def body_lle_gj():
        def body(c):
            y = y0 + c * 1e-6
            h = lle_reg_gj(y, node_mask)
            return jnp.sum(h) * 1e-6 + c * 0.5

        return body

    results["lle_regularizer_gj_us"] = scan_time(body_lle_gj) * 1000.0
    print(f"lle_regularizer (unrolled GJ):          {results['lle_regularizer_gj_us']:.1f} us")

    # Variant 2: gather/scatter-free — neighbours via jnp.roll (static
    # slices; rolled-wrap slots are masked), W via constant k-diagonal
    # eye matrices instead of the 315-element scatter-add.
    def chain_lle_weights_gj2(y, nm, k=6):
        mm = y.shape[0]
        half = k // 2
        width = 2 * half + 1
        valid_count = jnp.sum(nm.astype(jnp.int32))
        idx = jnp.arange(mm)
        off_vals = list(range(-half, half + 1))
        neigh_idx_raw = idx[:, None] + jnp.arange(width)[None, :] - half
        slot_mask = (
            (neigh_idx_raw >= 0)
            & (neigh_idx_raw < valid_count)
            & (neigh_idx_raw != idx[:, None])
        )
        neigh = jnp.stack([jnp.roll(y, -o, axis=0) for o in off_vals], axis=1)
        offsets_vec = y[:, None, :] - neigh
        offsets_vec = jnp.where(slot_mask[:, :, None], offsets_vec, 0.0)
        with jax.default_matmul_precision("highest"):
            gram = jnp.einsum("mwd,mvd->mwv", offsets_vec, offsets_vec)
        eye_w = jnp.eye(width, dtype=y.dtype)
        pair_mask = slot_mask[:, :, None] & slot_mask[:, None, :]
        gram = jnp.where(pair_mask, gram, eye_w[None, :, :])
        gram = gram + 1e-5 * eye_w[None, :, :]
        b = slot_mask.astype(y.dtype)[:, :, None]
        a = jnp.concatenate([gram, b], axis=2)
        for j in range(width):
            piv = a[:, j : j + 1, j : j + 1]
            row = a[:, j : j + 1, :] / piv
            col = a[:, :, j : j + 1]
            a = a - col * row
            a = a.at[:, j, :].set(row[:, 0, :])
        sol = a[:, :, width]
        denom = jnp.sum(sol * slot_mask, axis=1, keepdims=True)
        wi = jnp.where(slot_mask, sol / jnp.where(denom == 0, 1.0, denom), 0.0)
        w = jnp.zeros((mm, mm), y.dtype)
        for oi, o in enumerate(off_vals):
            w = w + wi[:, oi, None] * jnp.eye(mm, k=o, dtype=y.dtype)
        return jnp.where(nm[:, None], w, 0.0)

    def lle_reg_gj2(y, nm):
        l_mat = chain_lle_weights_gj2(y, nm)
        eye = jnp.eye(m, dtype=y.dtype) * nm[:, None].astype(y.dtype)
        i_l = eye - l_mat
        return jnp.matmul(i_l.T, i_l, precision=jax.lax.Precision.HIGHEST)

    w_gj2 = np.asarray(chain_lle_weights_gj2(y0, node_mask))
    max_dw2 = float(np.abs(w_lu - w_gj2).max())
    results["gj2_vs_lu_max_abs_dw"] = max_dw2
    print(f"gather-free GJ vs batched-LU weights: max |dW| = {max_dw2:.3e}")

    def body_lle_gj2():
        def body(c):
            y = y0 + c * 1e-6
            h = lle_reg_gj2(y, node_mask)
            return jnp.sum(h) * 1e-6 + c * 0.5

        return body

    results["lle_regularizer_gj2_us"] = scan_time(body_lle_gj2) * 1000.0
    print(f"lle_regularizer (gather-free GJ):       {results['lle_regularizer_gj2_us']:.1f} us")

    def body_mct():
        def body(c):
            y = y0 + c * 1e-6
            coord = masked_geodesic_coords(y, node_mask)
            node_dis = jnp.abs(coord[:, None] - coord[None, :])
            g = mct_kernel(node_dis, params.beta_pre_proc)
            pair = node_mask[:, None] & node_mask[None, :]
            g = jnp.where(pair, g, 0.0)
            return jnp.sum(g) * 1e-6 + c * 0.5

        return body

    results["mct_staging_us"] = scan_time(body_mct) * 1000.0
    print(f"mct staging (coords+kernel+mask):       {results['mct_staging_us']:.1f} us")

    from trackdlo_tpu.ops.pallas_kernels import pack_points

    def body_pack():
        def body(c):
            y = y0 + c * 1e-6
            m_pad = (m + 7) // 8 * 8
            g = jnp.outer(y[:, 0], y[:, 0])
            pad_mm = jnp.zeros((m_pad, m_pad), jnp.float32).at[:m, :m].set(g)
            pad_m3 = jnp.zeros((m_pad, 3), jnp.float32).at[:m].set(y)
            x = x0 + c * 1e-6
            xt, xm = pack_points(x, x_mask0)
            return (
                jnp.sum(pad_mm) * 1e-6
                + jnp.sum(pad_m3) * 1e-6
                + jnp.sum(xt) * 1e-9
                + c * 0.5
            )

        return body

    results["pad_pack_us"] = scan_time(body_pack) * 1000.0
    print(f"pads + pack_points:                     {results['pad_pack_us']:.1f} us")

    vis_idx0 = jnp.argsort(jnp.asarray(rng.permutation(m)))

    def body_gather():
        def body(c):
            y = y0 + c * 1e-6
            g0 = y[vis_idx0]
            return jnp.sum(g0) * 1e-6 + c * 0.5

        return body

    results["guide_gather_us"] = scan_time(body_gather) * 1000.0
    print(f"guide row-gather (M rows):              {results['guide_gather_us']:.1f} us")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

"""Decompose one fused-path EM iteration (default profile, M=45, N=4096).

The default step spends ~0.36 ms in its two EM passes at ~20 us/iteration.
This measures, via in-graph scan slopes on the real TPU, where those 20 us
go:

  - the fused E-step kernel alone,
  - the batched Gauss-Jordan solve (B=1) alone,
  - the M-step assembly + post-solve trace/delta XLA glue alone,
  - the complete iteration (cpd_lle 10it-vs-1it slope as reference).

Usage: python perf/em_iter_decomp.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_time(build_body, k_pair=(64, 512)):
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
        _ = float(np.asarray(jnp.sum(c)))
        t0 = time.perf_counter()
        c = run(jnp.asarray(0.0, jnp.float32))
        _ = float(np.asarray(jnp.sum(c)))
        times.append(time.perf_counter() - t0)
    return (times[1] - times[0]) / (k_pair[1] - k_pair[0]) * 1000.0


def med3(build_body, k_pair=(64, 512)):
    return float(np.median([scan_time(build_body, k_pair) for _ in range(3)]))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.models.trackdlo import init_state, preprocess_for_step
    from trackdlo_tpu.ops.cpd_lle import (
        lle_regularizer, masked_geodesic_coords, mct_kernel,
    )
    from trackdlo_tpu.ops.pallas_kernels import (
        estep_scalars, fused_estep_packed, gauss_jordan_solve_batched,
        pack_points,
    )
    from trackdlo_tpu.ops.preprocess import default_cell_px

    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    rgb, depth = render_frame(rope, 2 / 15.0, intr)
    occ = jnp.ones((intr.height, intr.width), bool)
    cell = default_cell_px(params.downsample_leaf_size, intr.fx)
    pc = jax.jit(
        lambda r, d, o: preprocess_for_step(
            r, d, o, params=params, intr=intr, cell_px=cell, use_pallas=True
        )
    )(jnp.asarray(rgb), jnp.asarray(depth), occ)
    state = init_state(rope.nodes(1 / 15.0, params.M), params)

    # Mirror the product's EM matmul precision for the raw solve/glue bodies
    # below. Set AFTER the preprocess trace: a global "highest" at trace time
    # makes Mosaic lower the preprocess kernel's explicit-bf16 binning dots
    # with fp32 contract precision on bf16 operands, which it rejects
    # ("Bad lhs type") — the product scopes "highest" to the EM ops only.
    jax.config.update("jax_default_matmul_precision", "highest")

    m = params.M
    m_pad = (m + 7) // 8 * 8
    dtype = jnp.float32
    y0 = state.y
    node_mask = jnp.ones((m,), bool)
    node_coord = masked_geodesic_coords(y0, node_mask)
    node_dis = jnp.abs(node_coord[:, None] - node_coord[None, :])
    g = mct_kernel(node_dis, params.beta)
    v_count = jnp.asarray(m, jnp.int32)
    n_count = jnp.sum(pc.mask.astype(dtype))

    pad_m3 = lambda v: jnp.zeros((m_pad, 3), dtype).at[:m].set(v)
    pad_mm = lambda v: jnp.zeros((m_pad, m_pad), dtype).at[:m, :m].set(v)
    pad_col = lambda v: jnp.zeros((m_pad, 1), dtype).at[:m, 0].set(v)
    g_p = pad_mm(g)
    eye_p = jnp.eye(m_pad, dtype=dtype)
    y0_p = pad_m3(y0)
    coord_p = pad_col(node_coord)
    nm_p = pad_col(node_mask.astype(dtype))
    node_mask_p = jnp.zeros((m_pad,), bool).at[:m].set(node_mask)
    pair_mask_p = node_mask_p[:, None] & node_mask_p[None, :]
    ones_pv_p = jnp.ones((m_pad, 1), dtype)
    xt_p, xm_p = pack_points(pc.points, pc.mask)

    s2 = jnp.asarray(1e-4, dtype)
    d = 3
    _TWO_PI = 2.0 * np.pi

    def consts(s2v):
        c_base = (_TWO_PI * s2v) ** (d / 2) * params.mu / (1 - params.mu)
        c = c_base * v_count.astype(dtype) / jnp.maximum(n_count, 1.0)
        c_vis = c_base / jnp.maximum(n_count, 1.0)
        return c, c_vis

    results = {}

    # --- E-step kernel alone (chained through y) ---------------------------
    def estep_body():
        def body(carry):
            yp = y0_p + carry * 1e-12
            c, c_vis = consts(s2)
            scalars = estep_scalars(
                s2, c, c_vis, jnp.asarray(0.0, dtype), v_count,
                params.k_vis, params.visibility_threshold, True,
            )
            p1p, pxp, scal, _ = fused_estep_packed(
                scalars, yp, coord_p, nm_p, ones_pv_p, xt_p, xm_p,
                two_phase=True,
            )
            return jnp.sum(p1p) * 1e-12 + jnp.sum(pxp) * 1e-12 + carry * 0.5
        return body

    results["estep_kernel"] = med3(estep_body)
    print(f"estep_kernel      {results['estep_kernel']*1e3:8.2f} us", flush=True)

    # --- GJ solve alone -----------------------------------------------------
    a0 = jnp.eye(m_pad, dtype=dtype) * 2.0 + 0.01 * g_p
    b0 = y0_p

    def solve_body():
        def body(carry):
            a = a0 + carry * 1e-12
            w = gauss_jordan_solve_batched(a[None], b0[None])[0]
            return jnp.sum(w) * 1e-12 + carry * 0.5
        return body

    results["gj_solve_b1"] = med3(solve_body)
    print(f"gj_solve_b1       {results['gj_solve_b1']*1e3:8.2f} us", flush=True)

    # --- assembly + post-solve glue (no kernels) ----------------------------
    p1p_c = jnp.abs(jnp.sum(g_p, axis=1, keepdims=True))
    pxp_c = y0_p * 2.0

    def glue_body():
        def body(carry):
            p1p = p1p_c + carry * 1e-12
            pxp = pxp_c
            a_mat = p1p * g_p + params.lam * s2 * eye_p
            b_mat = pxp - p1p * y0_p
            a_mat = jnp.where(pair_mask_p, a_mat, eye_p)
            b_mat = jnp.where(node_mask_p[:, None], b_mat, 0.0)
            w = b_mat * 0.1  # placeholder for the solve
            t_p = y0_p + g_p @ w
            tr_pxtt = jnp.sum(pxp * t_p)
            tr_ttdp1t = jnp.sum(p1p * t_p * t_p)
            s2_new = (jnp.asarray(1.0, dtype) - 2 * tr_pxtt + tr_ttdp1t) / (100.0 * d)
            s2_new = jnp.maximum(s2_new, 1e-10)
            move = jnp.sum(
                jnp.where(node_mask, jnp.linalg.norm(y0 - t_p[:m], axis=1), 0.0)
            )
            delta = move / jnp.maximum(v_count, 1)
            return jnp.sum(a_mat[:2, :2]) * 1e-12 + delta * 1e-12 + s2_new * 1e-12 + carry * 0.5
        return body

    results["assembly_glue"] = med3(glue_body)
    print(f"assembly_glue     {results['assembly_glue']*1e3:8.2f} us", flush=True)

    # --- complete fused-path iteration --------------------------------------
    def full_iter_body():
        def body(carry):
            y_cur = y0 + carry * 1e-12
            c, c_vis = consts(s2)
            yp = jnp.zeros((m_pad, 3), dtype).at[:m].set(y_cur)
            scalars = estep_scalars(
                s2, c, c_vis, jnp.asarray(0.0, dtype), v_count,
                params.k_vis, params.visibility_threshold, True,
            )
            p1p, pxp, scal, _ = fused_estep_packed(
                scalars, yp, coord_p, nm_p, ones_pv_p, xt_p, xm_p,
                two_phase=True,
            )
            np_total = scal[0, 0]
            tr_xtdpt1x = scal[0, 1]
            a_mat = p1p * g_p + params.lam * s2 * eye_p
            b_mat = pxp - p1p * y0_p
            a_mat = jnp.where(pair_mask_p, a_mat, eye_p)
            b_mat = jnp.where(node_mask_p[:, None], b_mat, 0.0)
            w = gauss_jordan_solve_batched(a_mat[None], b_mat[None])[0]
            t_p = y0_p + g_p @ w
            tr_pxtt = jnp.sum(pxp * t_p)
            tr_ttdp1t = jnp.sum(p1p * t_p * t_p)
            s2_new = (tr_xtdpt1x - 2 * tr_pxtt + tr_ttdp1t) / (np_total * d)
            s2_new = jnp.maximum(s2_new, 1e-10)
            move = jnp.sum(
                jnp.where(node_mask, jnp.linalg.norm(y_cur - t_p[:m], axis=1), 0.0)
            )
            delta = move / jnp.maximum(v_count, 1)
            return jnp.sum(t_p) * 1e-12 + delta * 1e-12 + s2_new * 1e-12 + carry * 0.5
        return body

    results["full_iteration"] = med3(full_iter_body)
    print(f"full_iteration    {results['full_iteration']*1e3:8.2f} us", flush=True)

    for k, v in results.items():
        print(f"{k:20s} {v*1e3:8.2f} us")
    with open(os.path.join(os.path.dirname(__file__), "em_iter_decomp.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

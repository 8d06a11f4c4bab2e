"""COMPILED-mode numerics audit of every Pallas kernel vs its XLA twin.

The Mosaic trap (CLAUDE.md): interpret mode computes exact f32 while the
compiled kernel may round matmul operands through bf16 MXU passes or even
mis-lower. This script runs each kernel compiled on the real TPU and
reports the deviation from the reference (XLA / interpret) path, so silent
on-device precision regressions can't hide behind CPU-only tests.

Run on TPU: python perf/tpu_kernel_numerics.py
bench.py runs `audit()` before timing and hard-fails over THRESHOLDS
(VERDICT r2 weak #3: two genuine silent mis-lowerings were caught by this
audit; making it un-skippable keeps the third from shipping).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Hard-fail bounds for bench.py. Since round 4 the parity-channel floors are
# BIT-PINNED between Mosaic and XLA (integer-mm z + multiply-only x/y,
# ops/preprocess.voxel_parity_bits), so kernel-vs-XLA candidate counts must
# be EQUAL — count_delta bound is 0 (VERDICT r3 item 3; was ±4 tolerating
# knife-edge floor flips).
#
# Round 5 (VERDICT r4 item 8): bounds RATCHETED to ~2-3x the values the
# round-4 driver bench actually recorded (BENCH_r04.json audit_* fields) —
# e.g. em10 2e-3 -> 2e-6 (recorded 5.74e-7), preprocess p95 1e-3 -> 2e-6
# (recorded 7.11e-7) — so a regression of the r2/r4 Mosaic-lowering class
# (bf16 dot rounding, silent mis-lowering: mm-scale errors) cannot land
# green. The fixtures are deterministic (seeded synthetic frame, seeded
# solver matrices), so 2-3x headroom covers accumulation-order jitter
# across compiler versions without admitting a real lowering bug.
THRESHOLDS = {
    "preprocess_kernel_vs_xla_p95_m": 2e-6,   # r4 recorded 7.11e-7
    "preprocess_kernel_count_delta": 0,
    "preprocess_parity_vs_xla_p95_m": 1e-6,   # r4 recorded 2.98e-7
    "preprocess_parity_count_delta": 0,
    "em10_pallas_vs_xla_max_m": 2e-6,         # r4 recorded 5.74e-7
    "em3_fusedloop_vs_xla_max_m": 1e-6,       # strict few-iter (ADVICE r4 #4)
    "em3_fusedloop_lle_vs_xla_max_m": 1e-6,
    "em3_fusedloop_priors_vs_xla_max_m": 1e-6,
    "em10_fusedmstep_vs_xla_max_m": 2e-6,     # r4 recorded 4.82e-7
    "em10_batched_vs_single_max_m": 2e-6,     # r4 recorded 4.06e-7
    "gj_solve_vs_f64_max": 2e-8,              # r4 recorded 5e-9
    "lu_solve_vs_f64_max": 1e-7,              # r4 recorded 1.9e-8
    "visibility_dist_max_m": 1e-6,            # r4 recorded 0.0
    "visibility_idx_mismatch": 0,
    "visibility_pointmin_max": 1e-6,          # r4 recorded 0.0
    "priors_mask_mismatch": 0,
    "priors_pos_max_m": 5e-6,                 # r4 recorded 1.848e-6
    "priors_batched_vs_single_max_m": 1e-6,   # r4 recorded 0.0
}


def audit_failures(results: dict) -> list[str]:
    return [
        k
        for k, bound in THRESHOLDS.items()
        if k in results and abs(results[k]) > bound
    ]


def audit():
    """Run every kernel compiled on the current (TPU) backend; return the
    {metric: value} dict. Raises on non-TPU backends."""
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    if jax.default_backend() != "tpu":
        raise RuntimeError(f"needs the TPU backend; got {jax.default_backend()}")

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.ops.cpd_lle import CpdParams, cpd_lle
    from trackdlo_tpu.ops.preprocess import default_cell_px, preprocess_frame
    from trackdlo_tpu.ops.preprocess_kernel import cell_sums_pallas
    from trackdlo_tpu.ops.priors import correspondence_priors
    from trackdlo_tpu.ops.visibility import compute_visibility
    from trackdlo_tpu.ops.visibility_kernel import fused_visibility

    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    rgb, depth = render_frame(rope, 1 / 15.0, intr)
    rgbj = jnp.asarray(rgb)
    depthj = jnp.asarray(depth)
    occ = jnp.ones((intr.height, intr.width), bool)
    cell = default_cell_px(params.downsample_leaf_size, intr.fx)
    proj = jnp.asarray(intr.proj_matrix(), jnp.float32)
    m = params.M
    nodes = jnp.asarray(rope.nodes(0.0, m), jnp.float32)
    results = {}

    # --- preprocess kernel: compiled vs the exact XLA pooling path --------
    pc_ref = preprocess_frame(
        rgbj, depthj, occ, intr.fx, intr.fy, intr.cx, intr.cy,
        params.hsv_lower, params.hsv_upper, False, cell, params.max_points,
        voxel_leaf=params.downsample_leaf_size,
    )
    from trackdlo_tpu.ops.preprocess import compact_cells

    cl, ct, ks = cell_sums_pallas(
        rgbj, depthj, occ, intr.fx, intr.fy, intr.cx, intr.cy,
        params.hsv_lower, params.hsv_upper, False, cell, interpret=False,
        voxel_leaf=params.downsample_leaf_size, with_votes=True,
    )
    pc_got = compact_cells(
        cl, ct, params.max_points, params.downsample_leaf_size, key_sums=ks
    )
    rp = np.asarray(pc_ref.points)[np.asarray(pc_ref.mask)]
    gp = np.asarray(pc_got.points)[np.asarray(pc_got.mask)]
    d = np.linalg.norm(gp[:, None] - rp[None], axis=2).min(1)
    results["preprocess_kernel_vs_xla_p95_m"] = float(np.percentile(d, 95))
    results["preprocess_kernel_count_delta"] = int(pc_got.count) - int(pc_ref.count)

    # Parity-split mode (8 voxel-parity channels), compiled vs XLA parity
    # pooling — this is the live default's front end.
    pc_ref_p = preprocess_frame(
        rgbj, depthj, occ, intr.fx, intr.fy, intr.cx, intr.cy,
        params.hsv_lower, params.hsv_upper, False, cell, params.max_points,
        voxel_leaf=params.downsample_leaf_size,
        candidate_cap=params.candidate_cap(), parity_split=True,
    )
    # r5: audit the SHIPPED channel-grid interface (preprocess_for_step's
    # parity path) — coordinates stay (8, n_cells) dense end-to-end.
    from trackdlo_tpu.ops.preprocess import compact_parity_channels

    xs_p, ys_p, zs_p, ct_p = cell_sums_pallas(
        rgbj, depthj, occ, intr.fx, intr.fy, intr.cx, intr.cy,
        params.hsv_lower, params.hsv_upper, False, cell, interpret=False,
        parity_split=True, voxel_leaf=params.downsample_leaf_size,
        channel_grids=True,
    )
    from trackdlo_tpu.ops.preprocess_kernel import parity_grid_shape

    pc_got_p = compact_parity_channels(
        xs_p, ys_p, zs_p, ct_p, params.max_points,
        params.downsample_leaf_size, params.candidate_cap(),
        inputs_are_sums=True,
        grid_shape=parity_grid_shape(depthj.shape[0], depthj.shape[1], cell),
    )
    rp = np.asarray(pc_ref_p.points)[np.asarray(pc_ref_p.mask)]
    gp = np.asarray(pc_got_p.points)[np.asarray(pc_got_p.mask)]
    d = np.linalg.norm(gp[:, None] - rp[None], axis=2).min(1)
    results["preprocess_parity_vs_xla_p95_m"] = float(np.percentile(d, 95))
    results["preprocess_parity_count_delta"] = int(pc_got_p.count) - int(
        pc_ref_p.count
    )

    # --- EM: fused Pallas iterations (compiled) vs the XLA while_loop -----
    x, xm = pc_ref.points, pc_ref.mask
    base = dict(
        beta=params.beta, lam=params.lam, lle_weight=params.lle_weight,
        mu=params.mu, max_iter=10, tol=0.0, include_lle=False,
        k_vis=params.k_vis, visibility_threshold=params.visibility_threshold,
        use_visibility=True,
    )
    vc = jnp.asarray(30, jnp.int32)
    nm = jnp.ones(m, bool)
    s2 = jnp.asarray(0.001, jnp.float32)
    r_xla = cpd_lle(x, xm, nodes, nm, s2, CpdParams(**base), visible_count=vc)
    r_pal = cpd_lle(
        x, xm, nodes, nm, s2, CpdParams(**base, use_pallas=True),
        visible_count=vc,
    )
    results["em10_pallas_vs_xla_max_m"] = float(
        jnp.max(jnp.abs(r_pal.y - r_xla.y))
    )
    r_fused = cpd_lle(
        x, xm, nodes, nm, s2,
        CpdParams(**base, use_pallas=True, use_fused_mstep=True),
        visible_count=vc,
    )
    results["em10_fusedmstep_vs_xla_max_m"] = float(
        jnp.max(jnp.abs(r_fused.y - r_xla.y))
    )

    # Strict few-iteration audit of the whole-EM-loop kernel (ADVICE r4 #4):
    # the unbatched use_pallas path routes the ENTIRE tolerance loop —
    # including the in-kernel _gj2d_with_inv M-step solve — through one
    # pallas_call (ops/pallas_kernels.fused_em_loop). At 3 iterations the
    # chaotic compounding that forces the em10 bounds to 2e-6 is negligible,
    # so compiled-vs-XLA must agree to ~1 f32 ulp of the node scale; the
    # LLE and priors variants exercise the kernel's hg/hy0 and jg/pd inputs
    # that the plain config leaves zeroed.
    short = dict(base, max_iter=3)
    for tag, extra, pk in (
        ("em3_fusedloop_vs_xla_max_m", {}, {}),
        ("em3_fusedloop_lle_vs_xla_max_m", {"include_lle": True}, {}),
        (
            "em3_fusedloop_priors_vs_xla_max_m",
            {"use_priors": True, "alpha": params.alpha},
            {
                "prior_pos": nodes + 0.004,
                "prior_mask": jnp.arange(m) < 12,
            },
        ),
    ):
        cfg = {**short, **extra}
        r3x = cpd_lle(
            x, xm, nodes, nm, s2, CpdParams(**cfg), visible_count=vc, **pk
        )
        r3p = cpd_lle(
            x, xm, nodes, nm, s2, CpdParams(**cfg, use_pallas=True),
            visible_count=vc, **pk,
        )
        results[tag] = float(jnp.max(jnp.abs(r3p.y - r3x.y)))

    # Row-packed batched E-step (round 3): the vmapped EM must match the
    # single-stream kernel it replaces.
    r_vmap = jax.vmap(
        lambda xx, xmm, yy, ss: cpd_lle(
            xx, xmm, yy, nm, ss, CpdParams(**base, use_pallas=True),
            visible_count=vc,
        ).y
    )(
        jnp.broadcast_to(x, (4,) + x.shape),
        jnp.broadcast_to(xm, (4,) + xm.shape),
        jnp.broadcast_to(nodes, (4,) + nodes.shape),
        jnp.full((4,), 0.001, jnp.float32),
    )
    results["em10_batched_vs_single_max_m"] = float(
        jnp.max(jnp.abs(r_vmap - r_pal.y[None]))
    )

    # --- M-step solve: GJ kernel vs f64 ------------------------------------
    from trackdlo_tpu.ops.pallas_kernels import gauss_jordan_solve_batched

    rng = np.random.default_rng(0)
    a_np = rng.standard_normal((8, 48, 48)).astype(np.float32)
    a_np = a_np @ a_np.transpose(0, 2, 1) + 48 * np.eye(48, dtype=np.float32)
    b_np = rng.standard_normal((8, 48, 3)).astype(np.float32)
    w64 = np.linalg.solve(a_np.astype(np.float64), b_np.astype(np.float64))
    w_gj = np.asarray(gauss_jordan_solve_batched(jnp.asarray(a_np), jnp.asarray(b_np)))
    results["gj_solve_vs_f64_max"] = float(np.abs(w_gj - w64).max())
    w_lu = np.asarray(jnp.linalg.solve(jnp.asarray(a_np), jnp.asarray(b_np)))
    results["lu_solve_vs_f64_max"] = float(np.abs(w_lu - w64).max())

    # --- visibility: fused kernel vs XLA path ------------------------------
    geo_j = jnp.asarray(
        np.cumsum(
            np.r_[0.0, np.linalg.norm(np.diff(np.asarray(nodes), axis=0), axis=1)]
        ),
        jnp.float32,
    )
    vis_x = compute_visibility(
        nodes, x, xm, proj, geo_j, intr.height, intr.width,
        params.visibility_threshold, params.dlo_pixel_width, params.d_vis,
    )
    vis_p = fused_visibility(
        nodes, x, xm, proj, geo_j, intr.height, intr.width,
        params.visibility_threshold, params.dlo_pixel_width, params.d_vis,
        interpret=False,
    )
    results["visibility_dist_max_m"] = float(
        jnp.max(jnp.abs(vis_p.shortest_node_pt_dists - vis_x.shortest_node_pt_dists))
    )
    results["visibility_idx_mismatch"] = int(
        jnp.sum(
            (vis_p.vis_ext_idx[: int(vis_x.vis_ext_count)]
             != vis_x.vis_ext_idx[: int(vis_x.vis_ext_count)]).astype(jnp.int32)
        )
    )
    # Per-point min outputs (round 3, single-sweep prune): compare within
    # prune-relevant range (both paths clamp invalid points to big values).
    pm_p = jnp.minimum(vis_p.point_min_sq_all, 1.0)
    pm_x = jnp.minimum(vis_x.point_min_sq_all, 1.0)
    pe_p = jnp.minimum(vis_p.point_min_sq_ext, 1.0)
    pe_x = jnp.minimum(vis_x.point_min_sq_ext, 1.0)
    results["visibility_pointmin_max"] = float(
        jnp.maximum(jnp.max(jnp.abs(pm_p - pm_x)), jnp.max(jnp.abs(pe_p - pe_x)))
    )

    # --- priors: fused walk kernel vs XLA scan (both compiled on TPU) ------
    # A tail-occluded case so the walks actually move.
    vcnt = jnp.asarray(m - 10, jnp.int32)
    vidx = jnp.arange(m, dtype=jnp.int32)
    pr_x = correspondence_priors(
        nodes, geo_j, nodes, vidx, vcnt, vidx, vcnt, use_pallas=False,
    )
    pr_p = correspondence_priors(
        nodes, geo_j, nodes, vidx, vcnt, vidx, vcnt, use_pallas=True,
    )
    both = np.asarray(pr_x.prior_mask) & np.asarray(pr_p.prior_mask)
    results["priors_mask_mismatch"] = int(
        (np.asarray(pr_x.prior_mask) != np.asarray(pr_p.prior_mask)).sum()
    )
    diff = np.abs(np.asarray(pr_x.prior_pos) - np.asarray(pr_p.prior_pos))[both]
    results["priors_pos_max_m"] = float(diff.max()) if diff.size else 0.0

    # Row-packed batched walks (round 3): under vmap the 4·B walks of a
    # stream batch pack into one kernel call; must match the single-stream
    # kernel exactly.
    pr_b = jax.vmap(
        lambda yy: correspondence_priors(
            yy, geo_j, yy, vidx, vcnt, vidx, vcnt, use_pallas=True,
        ).prior_pos
    )(jnp.broadcast_to(nodes, (4,) + nodes.shape))
    results["priors_batched_vs_single_max_m"] = float(
        jnp.max(jnp.abs(pr_b - pr_p.prior_pos[None]))
    )

    return results


def main():
    try:
        results = audit()
    except RuntimeError as e:
        print(e)
        return 1
    for k, v in results.items():
        flag = " FAIL" if k in audit_failures(results) else ""
        print(f"{k:40s} {v}{flag}")
    return 1 if audit_failures(results) else 0


if __name__ == "__main__":
    sys.exit(main())

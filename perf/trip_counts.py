"""Per-frame EM trip counts, jitted tracker vs f64 oracle (round 4).

The in-context ablation (perf/step_ablation.py) attributes ~420 us of the
~800 us b1 step to the PRE-REGISTRATION EM — far above the r3 stage table's
~160 us/pass estimate. At ~20 us/EM-iteration that implies ~20 trips/frame.
This probe asks WHOSE trips those are: if the f64 oracle's pre-EM runs the
same counts, they are the reference's own tolerance semantics (not a lever
without changing semantics); if the oracle converges in fewer, our f32
convergence metric is noise-floored and fixable.

Runs the same closed loop both ways and prints per-frame
(pre_iters, main_iters) pairs plus distribution summaries.

Usage: python perf/trip_counts.py [--frames 40] [--cpu]
Writes perf/trip_counts.json.
"""

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--cpu", action="store_true",
                    help="run the jitted tracker on CPU instead of the TPU")
    ap.add_argument(
        "--json",
        default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "trip_counts.json"),
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.models.trackdlo import (
        _resolve_use_pallas, init_state, preprocess_for_step,
    )
    from trackdlo_tpu.ops.cpd_lle import CpdParams, cpd_lle
    from trackdlo_tpu.ops.preprocess import default_cell_px
    from trackdlo_tpu.ops.priors import correspondence_priors
    from trackdlo_tpu.ops.visibility_kernel import fused_visibility

    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    cell = default_cell_px(params.downsample_leaf_size, intr.fx)
    m = params.num_of_nodes
    use_pallas = _resolve_use_pallas(params)
    proj = jnp.asarray(np.array(intr.proj_matrix(), np.float32))
    occ = jnp.ones((intr.height, intr.width), bool)

    # --- jitted step that also returns both passes' iteration counts -----
    # (mirrors models/trackdlo._track_from_points)
    @jax.jit
    def step(state, rgb, depth):
        pc = preprocess_for_step(
            rgb, depth, occ, params=params, intr=intr, cell_px=cell,
            use_pallas=use_pallas,
        )
        vis = fused_visibility(
            state.y, pc.points, pc.mask, proj, state.geodesic_coord,
            intr.height, intr.width, params.visibility_threshold,
            params.dlo_pixel_width, params.d_vis,
            interpret=jax.default_backend() != "tpu",
        )
        iota = jnp.arange(m)
        guide0 = state.y[vis.vis_ext_idx]
        gmask = iota < vis.vis_ext_count
        guide0 = jnp.where(gmask[:, None], guide0, 0.0)
        pre = cpd_lle(
            pc.points, pc.mask, guide0, gmask, state.sigma2,
            CpdParams(
                beta=params.beta_pre_proc, lam=params.lambda_pre_proc,
                lle_weight=params.lle_weight, mu=params.mu,
                max_iter=params.max_iter, tol=params.tol, include_lle=True,
                prune_radius=params.prune_radius,
                visibility_threshold=params.visibility_threshold,
                use_pallas=use_pallas, solver=params.solver,
            ),
            point_min_sq=vis.point_min_sq_ext,
        )
        pr = correspondence_priors(
            state.y, state.geodesic_coord, pre.y,
            vis.vis_ext_idx, vis.vis_ext_count, vis.vis_idx, vis.vis_count,
            use_pallas=use_pallas,
            interpret=jax.default_backend() != "tpu",
        )
        main = cpd_lle(
            pc.points, pc.mask, state.y, jnp.ones((m,), bool), state.sigma2,
            CpdParams(
                beta=params.beta, lam=params.lam,
                lle_weight=params.lle_weight, mu=params.mu,
                max_iter=params.max_iter, tol=params.tol, include_lle=False,
                alpha=params.alpha, k_vis=params.k_vis,
                visibility_threshold=params.visibility_threshold,
                prune_radius=params.prune_radius, use_priors=True,
                use_visibility=True, use_pallas=use_pallas,
                solver=params.solver,
            ),
            prior_pos=pr.prior_pos, prior_mask=pr.prior_mask,
            visible_count=vis.vis_ext_count,
            point_min_sq=vis.point_min_sq_all,
        )
        new_state = state._replace(y=main.y, sigma2=main.sigma2)
        return new_state, pre.iterations, main.iterations, pre.converged

    # --- oracle loop with iteration recording (monkeypatched cpd_lle) ----
    from trackdlo_tpu.oracle import tracking as otracking
    from trackdlo_tpu.oracle.pipeline import init_state as oracle_init
    from trackdlo_tpu.oracle.pipeline import step_frame as oracle_step

    rec = []
    real_cpd = otracking.cpd_lle

    def recording_cpd(*a, **kw):
        r = real_cpd(*a, **kw)
        rec.append(r.iterations)
        return r

    otracking.cpd_lle = recording_cpd

    state = init_state(rope.nodes(0.0, params.M), params)
    o_state = oracle_init(rope.nodes(0.0, params.M), params)

    rows = []
    for t in range(args.frames):
        rgb, depth = render_frame(rope, (t + 1) / 15.0, intr)
        rgb_j, depth_j = jnp.asarray(rgb), jnp.asarray(depth)
        state, pre_it, main_it, pre_conv = step(state, rgb_j, depth_j)
        pre_it, main_it = int(pre_it), int(main_it)
        rec.clear()
        o_state, _, _ = oracle_step(o_state, rgb, depth, params, intr)
        o_pre, o_main = (rec + [0, 0])[:2] if len(rec) >= 2 else (0, rec[0])
        rows.append((pre_it, main_it, o_pre, o_main))
        print(f"frame {t:3d}  jit pre/main {pre_it:3d}/{main_it:3d}   "
              f"oracle {o_pre:3d}/{o_main:3d}   conv={bool(pre_conv)}")

    otracking.cpd_lle = real_cpd
    arr = np.array(rows)
    summary = {
        "frames": args.frames,
        "jit_pre_mean": float(arr[:, 0].mean()),
        "jit_main_mean": float(arr[:, 1].mean()),
        "oracle_pre_mean": float(arr[:, 2].mean()),
        "oracle_main_mean": float(arr[:, 3].mean()),
        "jit_pre_p95": float(np.percentile(arr[:, 0], 95)),
        "oracle_pre_p95": float(np.percentile(arr[:, 2], 95)),
        "jit_pre_max": int(arr[:, 0].max()),
        "oracle_pre_max": int(arr[:, 2].max()),
        "rows": arr.tolist(),
    }
    print("\njit  pre mean {:.1f} p95 {:.0f} max {}   main mean {:.1f}".format(
        summary["jit_pre_mean"], summary["jit_pre_p95"],
        summary["jit_pre_max"], summary["jit_main_mean"]))
    print("orac pre mean {:.1f} p95 {:.0f} max {}   main mean {:.1f}".format(
        summary["oracle_pre_mean"], summary["oracle_pre_p95"],
        summary["oracle_pre_max"], summary["oracle_main_mean"]))
    with open(args.json, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

"""Batched per-stage on-device cost breakdown (VERDICT r1 next-round #3).

Measures each pipeline stage AND the full step at batch sizes 1/8/16/32 with
in-graph lax.scan repetition (dispatch-free; the only trustworthy method over
the tunnelled TPU, see CLAUDE.md). Each stage is vmapped over the stream axis
exactly as production's build_batched_step_fn does.

Usage:  python perf/batch_breakdown.py [--batches 1,8,16,32] [--json out.json]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_time(build_body, k_pair=(16, 96), reps=3):
    """Median-of-`reps` scan-slope estimate (ms per body).

    A single (short, long) slope is noise-prone over the tunnelled TPU —
    one delayed fetch on the short run drives the slope negative (the r4
    batch_breakdown_b1_b8.json pre_em_b1=-0.37 ms artifact, VERDICT r4 weak
    #4). Same robust estimator as perf/step_ablation.scan_slope: take the
    median of three independently-timed slopes.
    """
    import jax
    import jax.numpy as jnp

    body = build_body()
    runs = {}
    for k in k_pair:

        @jax.jit
        def run(c0, k=k, body=body):
            def step(c, _):
                return body(c), None

            c, _ = jax.lax.scan(step, c0, None, length=k)
            return c

        _ = float(run(jnp.asarray(0.0, jnp.float32)))  # compile + warm
        runs[k] = run

    slopes = []
    for _ in range(reps):
        times = []
        for k in k_pair:
            t0 = time.perf_counter()
            c = runs[k](jnp.asarray(0.0, jnp.float32))
            _ = float(c)
            times.append(time.perf_counter() - t0)
        slopes.append((times[1] - times[0]) / (k_pair[1] - k_pair[0]) * 1000.0)
    return sorted(slopes)[reps // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,16,32")
    ap.add_argument("--json", default=None)
    ap.add_argument("--stages", default=None, help="comma list to restrict")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.models.trackdlo import _step_impl, init_state
    from trackdlo_tpu.ops.cpd_lle import CpdParams, cpd_lle
    from trackdlo_tpu.ops.preprocess import compact_cells, default_cell_px
    from trackdlo_tpu.ops.preprocess_kernel import cell_sums_pallas
    from trackdlo_tpu.ops.priors import correspondence_priors
    from trackdlo_tpu.ops.visibility_kernel import fused_visibility

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    cell = params.downsample_cell_px or default_cell_px(
        params.downsample_leaf_size, intr.fx
    )
    m = params.M
    proj = jnp.asarray(np.array(intr.proj_matrix(), np.float32))

    max_b = max(batches)
    rgbs, depths = [], []
    for b in range(max_b):
        rgb, depth = render_frame(rope, 1 / 15.0 + 0.003 * b, intr)
        rgbs.append(rgb)
        depths.append(depth)
    rgbs_all = jnp.asarray(np.stack(rgbs))
    depths_all = jnp.asarray(np.stack(depths))
    state1 = init_state(rope.nodes(0.0, params.M), params)

    # Reference intermediates at batch max (sliced per batch below).
    def pre_one(rgb, depth, occ):
        # The PRODUCTION default (parity_split) preprocess — call the
        # shipped function itself so this stage can never drift from it
        # (r5: it previously hand-copied the pipeline and silently kept
        # measuring the legacy trimmed interface).
        from trackdlo_tpu.models.trackdlo import preprocess_for_step

        return preprocess_for_step(
            rgb, depth, occ, params=params, intr=intr, cell_px=cell,
            use_pallas=not interp,
        )

    occ_all = jnp.ones((max_b, intr.height, intr.width), bool)
    pc_all = jax.jit(jax.vmap(pre_one))(rgbs_all, depths_all, occ_all)
    y_all = jnp.broadcast_to(state1.y, (max_b, m, 3))
    coord_all = jnp.broadcast_to(state1.geodesic_coord, (max_b, m))

    results = {}

    def record(stage, b, ms):
        results[f"{stage}_b{b}"] = round(ms, 4)
        print(f"{stage:18s} b={b:<3d} {ms:8.3f} ms  ({ms / b * 1000:7.1f} us/frame)")

    want = set(args.stages.split(",")) if args.stages else None

    for b in batches:
        rgb_b = rgbs_all[:b]
        depth_b = depths_all[:b]
        occ_b = occ_all[:b]
        pc_pts = pc_all.points[:b]
        pc_msk = pc_all.mask[:b]
        y_b = y_all[:b]
        coord_b = coord_all[:b]

        # --- stage 1: preprocessing (fused kernel + compact) --------------
        if want is None or "preprocess" in want:
            def pre_body():
                def body(c):
                    p = jax.vmap(
                        lambda r, d, o: pre_one(r, d + (c * 0).astype(d.dtype), o)
                    )(rgb_b, depth_b, occ_b)
                    return jnp.sum(p.points) * 1e-12 + c * 0.5
                return body

            record("preprocess", b, scan_time(pre_body))

        # --- stage 2: fused visibility -------------------------------------
        if want is None or "visibility" in want:
            def vis_body():
                def body(c):
                    v = jax.vmap(
                        lambda y, p, mk, co: fused_visibility(
                            y + c * 1e-12, p, mk, proj, co,
                            intr.height, intr.width,
                            params.visibility_threshold, params.dlo_pixel_width,
                            params.d_vis, interpret=interp,
                        )
                    )(y_b, pc_pts, pc_msk, coord_b)
                    return jnp.sum(v.shortest_node_pt_dists) * 1e-12 + c * 0.5
                return body

            record("visibility", b, scan_time(vis_body))

        # --- stage 3: pre-registration EM (GLTP, full tol budget) ---------
        if want is None or "pre_em" in want:
            pre_cp = CpdParams(
                beta=params.beta_pre_proc, lam=params.lambda_pre_proc,
                lle_weight=params.lle_weight, mu=params.mu,
                max_iter=params.max_iter, tol=params.tol, include_lle=True,
                prune_radius=params.prune_radius,
                visibility_threshold=params.visibility_threshold,
                use_pallas=on_tpu,
            )

            def pre_em_body():
                def body(c):
                    r = jax.vmap(
                        lambda x, mk, y: cpd_lle(
                            x, mk, y + c * 1e-12, jnp.ones(m, bool),
                            jnp.asarray(0.001, jnp.float32), pre_cp,
                        )
                    )(pc_pts, pc_msk, y_b)
                    return jnp.sum(r.y) * 1e-12 + c * 0.5
                return body

            record("pre_em", b, scan_time(pre_em_body))

        # --- stage 4: prior walks ------------------------------------------
        if want is None or "priors" in want:
            def priors_body():
                iota = jnp.arange(m, dtype=jnp.int32)
                def body(c):
                    pr = jax.vmap(
                        lambda y, co: correspondence_priors(
                            y + c * 1e-12, co, y, iota,
                            jnp.asarray(m, jnp.int32), iota,
                            jnp.asarray(m, jnp.int32),
                        )
                    )(y_b, coord_b)
                    return jnp.sum(pr.prior_pos) * 1e-12 + c * 0.5
                return body

            record("priors", b, scan_time(priors_body))

        # --- stage 5: main EM (priors + visibility, full budget) ----------
        if want is None or "main_em" in want:
            main_cp = CpdParams(
                beta=params.beta, lam=params.lam, lle_weight=params.lle_weight,
                mu=params.mu, max_iter=params.max_iter, tol=params.tol,
                include_lle=False, alpha=params.alpha, k_vis=params.k_vis,
                visibility_threshold=params.visibility_threshold,
                prune_radius=params.prune_radius, use_priors=True,
                use_visibility=True, use_pallas=on_tpu,
            )

            def main_em_body():
                def body(c):
                    r = jax.vmap(
                        lambda x, mk, y: cpd_lle(
                            x, mk, y + c * 1e-12, jnp.ones(m, bool),
                            jnp.asarray(0.001, jnp.float32), main_cp,
                            prior_pos=y, prior_mask=jnp.ones(m, bool),
                            visible_count=jnp.asarray(30, jnp.int32),
                        )
                    )(pc_pts, pc_msk, y_b)
                    return jnp.sum(r.y) * 1e-12 + c * 0.5
                return body

            record("main_em", b, scan_time(main_em_body))

        # --- full step ------------------------------------------------------
        if want is None or "full" in want:
            step = functools.partial(
                _step_impl, params=params, intr=intr, cell_px=cell
            )

            def full_body():
                st0 = jax.tree.map(
                    lambda v: jnp.broadcast_to(v, (b,) + v.shape), state1
                )
                def body(c):
                    st = jax.tree.map(lambda v: v, st0)
                    st = st._replace(y=st.y + c * 1e-12)
                    ns, _ = jax.vmap(step)(st, rgb_b, depth_b, occ_b)
                    return jnp.sum(ns.y) * 1e-12 + c * 0.5
                return body

            record("full", b, scan_time(full_body))

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

"""In-context per-stage attribution of the production step by ablation.

The stage bodies in perf/batch_breakdown.py run each stage with a synthetic
budget (cold sigma2, self-computed prune sweep), so they do NOT sum to the
full step. This probe instead measures the PRODUCTION closed-loop scan
(bench.py _measure_scan shape: warm steady-state tracking, frames advancing
at camera rate) with stages ablated one at a time, and attributes cost by
subtraction — every number carries the real trip counts, staging, and
fusion context:

Each non-full mode removes exactly ONE stage from the no_pre tail (except
skeleton, which removes priors AND main_em), so:

    preprocess  = full - no_pre          (pc precomputed outside the loop)
    pre_em      = no_pre - no_preem      (guide nodes = masked state.y)
    priors      = no_pre - no_priors     (priors = guide nodes passthrough)
    main_em+vis = no_preem - priors      (remainder of the no_preem tail)

Cross-check: preprocess + pre_em + priors + main_em+vis = full exactly
(the remainder construction makes it an identity).

Caveat: each ablation changes the state trajectory (the rope moves slowly,
all variants keep tracking), so attributions are estimates good to ~10-20
us, not exact accounting. POST-SOLVER-FIX this matters structurally: trip
counts are data-dependent and healthy, so a variant with a degraded
trajectory runs systematically more pre-EM trips than production. The
skeleton mode (y' = raw guide nodes) measured ABOVE no_priors for exactly
that reason (-57 to -187 us main_em subtractions across runs), which is
why main_em is no longer attributed by skeleton subtraction; skeleton is
still measured and reported as a diagnostic bound.

Usage (TPU): python perf/step_ablation.py [--batch 1] [--json out.json]
Mirrors models/trackdlo._track_from_points — keep the stage wiring in sync.
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_variant(params, intr, cell_px, mode, pre_max_iter=None,
                  pre_tol=None):
    """Production step with stages ablated. mode in
    full | no_pre | no_preem | no_priors | skeleton | visonly.
    All no_pre* modes take (state, pc_points, pc_mask) instead of frames.

    ``pre_max_iter`` / ``pre_tol`` override the PRE-EM's loop bounds only
    (perf/preem_trip_slope.py forces exact trip counts with tol=0 to
    separate the stage's per-call fixed cost from its per-trip slope).
    ``visonly`` is skeleton minus the cpd_lle call entirely (y' = raw
    guide nodes): subtracting it from skeleton@0-trips isolates the pre-EM
    call's fixed staging cost (prune fold, kernel/LLE assembly, padding,
    point packing) from the visibility pass."""
    import jax
    import jax.numpy as jnp

    from trackdlo_tpu.models.trackdlo import (
        _resolve_use_pallas, _step_impl, preprocess_for_step,
    )
    from trackdlo_tpu.ops.cpd_lle import CpdParams, cpd_lle
    from trackdlo_tpu.ops.priors import correspondence_priors
    from trackdlo_tpu.ops.visibility_kernel import fused_visibility

    if mode == "full":
        return functools.partial(
            _step_impl, params=params, intr=intr, cell_px=cell_px
        )

    proj = jnp.asarray(np.array(intr.proj_matrix(), np.float32))
    use_pallas = _resolve_use_pallas(params)
    m = params.num_of_nodes

    def step(state, pts, msk):
        vis = fused_visibility(
            state.y, pts, msk, proj, state.geodesic_coord,
            intr.height, intr.width, params.visibility_threshold,
            params.dlo_pixel_width, params.d_vis,
            interpret=jax.default_backend() != "tpu",
        )
        iota = jnp.arange(m)
        guide0 = state.y[vis.vis_ext_idx]
        guide_node_mask = iota < vis.vis_ext_count
        guide0 = jnp.where(guide_node_mask[:, None], guide0, 0.0)
        if mode == "visonly":
            new_y = jnp.where(guide_node_mask[:, None], guide0, state.y)
            return state._replace(y=new_y)
        if mode == "no_preem":
            guide_nodes = guide0
        else:
            pre = cpd_lle(
                pts, msk, guide0, guide_node_mask, state.sigma2,
                CpdParams(
                    beta=params.beta_pre_proc, lam=params.lambda_pre_proc,
                    lle_weight=params.lle_weight, mu=params.mu,
                    max_iter=(params.max_iter if pre_max_iter is None
                              else pre_max_iter),
                    tol=params.tol if pre_tol is None else pre_tol,
                    include_lle=True, prune_radius=params.prune_radius,
                    visibility_threshold=params.visibility_threshold,
                    use_pallas=use_pallas, solver=params.solver,
                ),
                point_min_sq=vis.point_min_sq_ext,
            )
            guide_nodes = pre.y
        if mode in ("no_priors", "skeleton"):
            prior_pos, prior_mask = guide_nodes, guide_node_mask
        else:
            pr = correspondence_priors(
                state.y, state.geodesic_coord, guide_nodes,
                vis.vis_ext_idx, vis.vis_ext_count,
                vis.vis_idx, vis.vis_count,
                use_pallas=use_pallas,
                interpret=jax.default_backend() != "tpu",
            )
            prior_pos, prior_mask = pr.prior_pos, pr.prior_mask
        if mode == "skeleton":
            new_y = jnp.where(guide_node_mask[:, None], guide_nodes, state.y)
            # Persist the pre-EM's converged sigma2: leaving state.sigma2
            # frozen at its cold init forces cold-start trip counts into
            # EVERY frame's pre-EM (~25+ trips vs the warm ~7), inflating
            # the skeleton mode by ~180 us/frame and driving the main_em
            # attribution negative (post-solver-fix r4 finding; pre-fix the
            # pre-EM stalled near max_iter in all modes, hiding this).
            return state._replace(y=new_y, sigma2=pre.sigma2)
        main = cpd_lle(
            pts, msk, state.y, jnp.ones((m,), bool), state.sigma2,
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
            prior_pos=prior_pos, prior_mask=prior_mask,
            visible_count=vis.vis_ext_count,
            point_min_sq=vis.point_min_sq_all,
        )
        return state._replace(y=main.y, sigma2=main.sigma2)

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--n-frames", type=int, default=64)
    ap.add_argument("--k-pair", default="16,64")
    ap.add_argument(
        "--json",
        default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "step_ablation.json"),
    )
    args = ap.parse_args()
    k_short, k_long = (int(s) for s in args.k_pair.split(","))
    b = args.batch

    import jax
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.models.trackdlo import (
        _resolve_use_pallas, init_state, preprocess_for_step,
    )
    from trackdlo_tpu.ops.preprocess import default_cell_px

    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    cell = default_cell_px(params.downsample_leaf_size, intr.fx)
    n_frames = args.n_frames

    rgbs, depths = [], []
    for t in range(n_frames * b):
        rgb, depth = render_frame(
            rope, ((t % n_frames) + 1) / 15.0 + 0.003 * (t // n_frames), intr
        )
        rgbs.append(rgb)
        depths.append(depth)
    rgbs = jnp.asarray(np.stack(rgbs)).reshape(
        (b, n_frames) + rgbs[0].shape
    ).swapaxes(0, 1)  # (n_frames, b, H, W, 3)
    depths = jnp.asarray(np.stack(depths)).reshape(
        (b, n_frames) + depths[0].shape
    ).swapaxes(0, 1)
    occ = jnp.ones((intr.height, intr.width), bool)
    state1 = init_state(rope.nodes(0.0, params.M), params)
    state0 = jax.tree.map(
        lambda v: jnp.broadcast_to(v, (b,) + v.shape), state1
    )

    # Precompute the per-frame point clouds once (outside all timing) for
    # the tail-only variants.
    pre_fn = functools.partial(
        preprocess_for_step, params=params, intr=intr, cell_px=cell,
        use_pallas=_resolve_use_pallas(params),
    )
    pc_all = jax.jit(
        jax.vmap(jax.vmap(lambda r, d: pre_fn(r, d, occ)))
    )(rgbs, depths)
    pts_all = pc_all.points  # (n_frames, b, P, 3)
    msk_all = pc_all.mask

    def scan_slope(make_run):
        slopes = []
        for _ in range(3):
            ts = []
            for k in (k_short, k_long):
                run = make_run(k)
                s = run()
                _ = np.asarray(s)  # compile + warm
                t0 = time.perf_counter()
                s = run()
                y = np.asarray(s)
                assert np.isfinite(y).all()
                ts.append(time.perf_counter() - t0)
            slopes.append((ts[1] - ts[0]) / (k_long - k_short))
        return sorted(slopes)[1] * 1000.0  # ms per scan body

    results = {}

    for mode in ("full", "no_pre", "no_preem", "no_priors", "skeleton"):
        step = build_variant(params, intr, cell, mode)

        if mode == "full":
            def make_run(k, step=step):
                @jax.jit
                def run(s0, rgbs_a, depths_a):
                    def body(s, i):
                        ns, _ = jax.vmap(
                            lambda st, r, d: step(st, r, d, occ)
                        )(s, rgbs_a[i % n_frames], depths_a[i % n_frames])
                        return ns, ns.sigma2
                    s, _ = jax.lax.scan(body, s0, jnp.arange(k))
                    return s.y
                return lambda: run(state0, rgbs, depths)
        else:
            def make_run(k, step=step):
                @jax.jit
                def run(s0, pts_a, msk_a):
                    def body(s, i):
                        ns = jax.vmap(step)(
                            s, pts_a[i % n_frames], msk_a[i % n_frames]
                        )
                        return ns, ns.sigma2
                    s, _ = jax.lax.scan(body, s0, jnp.arange(k))
                    return s.y
                return lambda: run(state0, pts_all, msk_all)

        ms = scan_slope(make_run)
        results[f"{mode}_b{b}"] = round(ms, 4)
        print(f"{mode:10s} b={b:<3d} {ms:8.3f} ms/step  "
              f"({ms / b * 1000:7.1f} us/frame)")

    pre_em = results[f"no_pre_b{b}"] - results[f"no_preem_b{b}"]
    att = {
        "preprocess": results[f"full_b{b}"] - results[f"no_pre_b{b}"],
        "pre_em": pre_em,
        "priors": results[f"no_pre_b{b}"] - results[f"no_priors_b{b}"],
        # main_em + vis as a REMAINDER, not skeleton subtraction: with the
        # r4 solver fix, EM trip counts are data-dependent and healthy, so
        # the skeleton variant's degraded trajectory (y' = raw guide nodes,
        # sigma2 from the pre-EM) runs systematically MORE pre-EM trips
        # than the tracked no_priors trajectory — enough to exceed the main
        # EM's own cost and drive the subtraction negative (measured -57 to
        # -187 us across runs). The remainder charges main_em+vis with any
        # shared-staging overlap instead, which is the honest bound.
        "main_em+vis": results[f"no_preem_b{b}"]
        - (results[f"no_pre_b{b}"] - results[f"no_priors_b{b}"]),
    }
    for k, v in att.items():
        results[f"attr_{k}_b{b}"] = round(v, 4)
        print(f"  attr {k:14s} {v * 1000 / b:7.1f} us/frame")

    with open(args.json, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

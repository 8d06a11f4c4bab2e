"""Pin the pre-EM's in-context per-trip cost vs its per-call fixed cost.

Open question carried from round 4 (ROADMAP "known gaps"): the in-context
ablation charges the pre-registration EM ~210 us/frame at ~6.8 trips/frame,
while the synthetic per-iteration decomposition (perf/em_iter_decomp.json)
prices an EM iteration at ~21.5 us — so EITHER the in-context per-trip cost
exceeds the synthetic estimate (staging/fusion blame inside the loop) OR
the gap is the stage's per-call FIXED cost (prune fold, MCT kernel + LLE
assembly, padding, point packing, kernel entry) and the per-trip price is
honest. This probe decides it by forcing exact trip counts:

  1. skeleton-mode closed-loop scan (vis + pre-EM only, the production
     fused whole-loop kernel path) with pre_tol=0 and pre_max_iter in
     {0, 4, 20}: the scan-slope differences give the IN-CONTEXT per-trip
     cost exactly ((c20-c4)/16, linearity checked against c4-c0), and c0
     is the fixed cost including the visibility pass.
  2. visonly-mode scan (same body minus the cpd_lle call): c0 - visonly
     isolates the pre-EM call's own fixed staging cost.
  3. an ISOLATED cpd_lle scan on one captured production frame (fixed
     inputs, tiny carry perturbation for the data dependency) at
     max_iter {4, 20}: the isolated per-trip price of the same kernel.

If (1) ~= (3) the round-4 "staging blame" dissolves into fixed-cost
attribution; if (1) >> (3) the loop body really is paying a fusion-boundary
tax in context. Usage (TPU): python perf/preem_trip_slope.py
Writes perf/preem_trip_slope.json.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from step_ablation import build_variant  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.models.trackdlo import (
        _resolve_use_pallas, init_state, preprocess_for_step,
    )
    from trackdlo_tpu.ops.cpd_lle import CpdParams, cpd_lle
    from trackdlo_tpu.ops.preprocess import default_cell_px

    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    cell = default_cell_px(params.downsample_leaf_size, intr.fx)
    n_frames = 64
    # Cheap bodies (30-150 us) need LONG scans for the slope to clear the
    # tunnel's multi-ms dispatch jitter (the first run of this probe read
    # NEGATIVE mi=0 slopes at k_pair (16,64)). Large k is safe here even
    # though frames wrap every 64 steps: every EM in this probe runs a
    # FORCED trip count (tol=0), so the backward-wrap trip spike that
    # forbids large k in bench.py cannot occur.
    k_short, k_long = 128, 1024

    rgbs, depths = [], []
    for t in range(n_frames):
        rgb, depth = render_frame(rope, (t + 1) / 15.0, intr)
        rgbs.append(rgb)
        depths.append(depth)
    rgbs = jnp.asarray(np.stack(rgbs))
    depths = jnp.asarray(np.stack(depths))
    occ = jnp.ones((intr.height, intr.width), bool)
    state1 = init_state(rope.nodes(0.0, params.M), params)
    state0 = jax.tree.map(lambda v: v[None], state1)

    pre_fn = functools.partial(
        preprocess_for_step, params=params, intr=intr, cell_px=cell,
        use_pallas=_resolve_use_pallas(params),
    )
    pc_all = jax.jit(jax.vmap(lambda r, d: pre_fn(r, d, occ)))(rgbs, depths)
    pts_all = pc_all.points[:, None]  # (n_frames, 1, P, 3)
    msk_all = pc_all.mask[:, None]

    def scan_slope(step):
        def make_run(k):
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
        return sorted(slopes)[1] * 1e6  # us per frame (b=1)

    results = {}

    step = build_variant(params, intr, cell, "visonly")
    results["visonly_us"] = round(scan_slope(step), 2)
    print(f"visonly        {results['visonly_us']:8.1f} us/frame")

    for mi in (0, 4, 20):
        step = build_variant(
            params, intr, cell, "skeleton", pre_max_iter=mi, pre_tol=0.0
        )
        results[f"skeleton_mi{mi}_us"] = round(scan_slope(step), 2)
        print(f"skeleton mi={mi:<3d}{results[f'skeleton_mi{mi}_us']:8.1f} "
              "us/frame")

    c0 = results["skeleton_mi0_us"]
    c4 = results["skeleton_mi4_us"]
    c20 = results["skeleton_mi20_us"]
    results["incontext_per_trip_us"] = round((c20 - c4) / 16.0, 2)
    results["incontext_per_trip_us_low"] = round((c4 - c0) / 4.0, 2)
    results["preem_fixed_us"] = round(c0 - results["visonly_us"], 2)
    print(f"in-context per-trip   {results['incontext_per_trip_us']:6.1f} us "
          f"(low-range check {results['incontext_per_trip_us_low']:.1f})")
    print(f"pre-EM fixed (staging){results['preem_fixed_us']:6.1f} us")

    # --- isolated kernel: one captured frame, fixed inputs ----------------
    # Run the closed loop a few frames (production params) to get a warm
    # steady-state system, then scan cpd_lle on it with forced trips.
    step_full = build_variant(params, intr, cell, "full")
    warm = jax.jit(lambda s, r, d: step_full(s, r, d, occ)[0])
    st1 = state1
    for t in range(8):
        st1 = warm(st1, rgbs[t], depths[t])
    # capture frame-8 inputs through the ablation wiring
    from trackdlo_tpu.ops.visibility_kernel import fused_visibility
    proj = jnp.asarray(np.array(intr.proj_matrix(), np.float32))
    m = params.num_of_nodes
    use_pallas = _resolve_use_pallas(params)

    @jax.jit
    def capture(state, pts, msk):
        vis = fused_visibility(
            state.y, pts, msk, proj, state.geodesic_coord,
            intr.height, intr.width, params.visibility_threshold,
            params.dlo_pixel_width, params.d_vis,
            interpret=jax.default_backend() != "tpu",
        )
        iota = jnp.arange(m)
        guide0 = state.y[vis.vis_ext_idx]
        gmask = iota < vis.vis_ext_count
        guide0 = jnp.where(gmask[:, None], guide0, 0.0)
        return guide0, gmask, vis.point_min_sq_ext

    guide0, gmask, pmin = capture(st1, pts_all[8, 0], msk_all[8, 0])
    x_fix, m_fix = pts_all[8, 0], msk_all[8, 0]
    s2_fix = st1.sigma2

    for mi in (0, 4, 20):
        cp = CpdParams(
            beta=params.beta_pre_proc, lam=params.lambda_pre_proc,
            lle_weight=params.lle_weight, mu=params.mu,
            max_iter=mi, tol=0.0, include_lle=True,
            prune_radius=params.prune_radius,
            visibility_threshold=params.visibility_threshold,
            use_pallas=use_pallas, solver=params.solver,
        )

        def make_run(k, cp=cp):
            @jax.jit
            def run(g0):
                def body(g, _):
                    r = cpd_lle(
                        x_fix, m_fix, g, gmask, s2_fix, cp,
                        point_min_sq=pmin,
                    )
                    # tiny carry perturbation keeps iterations serialized
                    # without changing the system meaningfully
                    return g + (r.y - g) * 1e-6, r.sigma2
                g, _ = jax.lax.scan(body, g0, None, length=k)
                return g
            return lambda: run(guide0)

        slopes = []
        for _ in range(3):
            ts = []
            for k in (k_short, k_long):
                run = make_run(k)
                _ = np.asarray(run())
                t0 = time.perf_counter()
                y = np.asarray(run())
                assert np.isfinite(y).all()
                ts.append(time.perf_counter() - t0)
            slopes.append((ts[1] - ts[0]) / (k_long - k_short))
        results[f"isolated_mi{mi}_us"] = round(sorted(slopes)[1] * 1e6, 2)
        print(f"isolated mi={mi:<3d}"
              f"{results[f'isolated_mi{mi}_us']:8.1f} us/call")

    i0 = results["isolated_mi0_us"]
    i4 = results["isolated_mi4_us"]
    i20 = results["isolated_mi20_us"]
    results["isolated_per_trip_us"] = round((i20 - i4) / 16.0, 2)
    results["isolated_fixed_us"] = i0
    print(f"isolated per-trip     {results['isolated_per_trip_us']:6.1f} us")
    print(f"isolated fixed        {results['isolated_fixed_us']:6.1f} us")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "preem_trip_slope.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

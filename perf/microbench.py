"""Honest micro-benchmarks for pipeline stages on tunnelled TPU backends.

Timing rules (see bench.py): chain calls through a data dependency where
possible, end with a tiny device->host fetch, and report the slope between a
short and a long run so constant dispatch/fetch latency cancels.
"""

import time

import numpy as np


def slope_time(fn, args, chain_idx=None, reps=(8, 32)):
    """Per-call milliseconds via slope. ``chain_idx``: which positional arg
    receives (a leaf of) the previous output to serialize calls; None chains
    nothing (use for stateless stages — dispatch may overlap, making this a
    throughput, not latency, number)."""
    import jax

    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    times = []
    for k in reps:
        a = list(args)
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*a)
            if chain_idx is not None:
                leaf = jax.tree.leaves(r)[chain_idx]
                a[0] = leaf if a[0].shape == leaf.shape else a[0]
        _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
        times.append(time.perf_counter() - t0)
    return (times[1] - times[0]) / (reps[1] - reps[0]) * 1000.0


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.models.trackdlo import init_state, _step_impl
    from trackdlo_tpu.ops.cpd_lle import CpdParams, cpd_lle
    from trackdlo_tpu.ops.preprocess import default_cell_px, preprocess_frame
    from trackdlo_tpu.ops.visibility import compute_visibility

    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    rgb, depth = render_frame(rope, 1 / 15.0, intr)
    rgbj, depthj = jnp.asarray(rgb), jnp.asarray(depth)
    occ = jnp.ones((intr.height, intr.width), bool)
    cell = default_cell_px(params.downsample_leaf_size, intr.fx)
    state = init_state(rope.nodes(0.0, params.M), params)
    proj = jnp.asarray(intr.proj_matrix(), jnp.float32)

    results = {}

    # Preprocess variants.
    for name, c, leaf in [
        ("preprocess_cells_only", cell, None),
        ("preprocess_snap_fine5", max(2, cell // 2), params.downsample_leaf_size),
        ("preprocess_snap_cell11", cell, params.downsample_leaf_size),
    ]:
        f = jax.jit(
            lambda r, d, o, c=c, leaf=leaf: preprocess_frame(
                r, d, o, intr.fx, intr.fy, intr.cx, intr.cy,
                params.hsv_lower, params.hsv_upper, False, c,
                params.max_points, voxel_leaf=leaf,
            )
        )
        results[name] = slope_time(f, (rgbj, depthj, occ))

    # Visibility.
    pre = jax.jit(
        lambda r, d, o: preprocess_frame(
            r, d, o, intr.fx, intr.fy, intr.cx, intr.cy,
            params.hsv_lower, params.hsv_upper, False, cell, params.max_points,
        )
    )
    pc = pre(rgbj, depthj, occ)
    vis_f = jax.jit(
        lambda y, p, m: compute_visibility(
            y, p, m, proj, state.geodesic_coord, intr.height, intr.width,
            params.visibility_threshold, params.dlo_pixel_width, params.d_vis,
        )
    )
    results["visibility"] = slope_time(vis_f, (state.y, pc.points, pc.mask))

    # EM passes (chained on y for serialization).
    for name, cp in [
        ("em_main_50it_tol", CpdParams(
            beta=params.beta, lam=params.lam, lle_weight=params.lle_weight,
            mu=params.mu, max_iter=params.max_iter, tol=params.tol,
            include_lle=False, k_vis=params.k_vis,
            visibility_threshold=params.visibility_threshold,
            use_visibility=True)),
        ("em_fixed_1it", CpdParams(
            beta=params.beta, lam=params.lam, lle_weight=params.lle_weight,
            mu=params.mu, max_iter=1, tol=0.0, include_lle=False)),
        ("em_fixed_10it", CpdParams(
            beta=params.beta, lam=params.lam, lle_weight=params.lle_weight,
            mu=params.mu, max_iter=10, tol=0.0, include_lle=False)),
        ("em_preproc_lle", CpdParams(
            beta=params.beta_pre_proc, lam=params.lambda_pre_proc,
            lle_weight=params.lle_weight, mu=params.mu,
            max_iter=params.max_iter, tol=params.tol, include_lle=True)),
    ]:
        f = jax.jit(
            lambda y, p, m, cp=cp: cpd_lle(
                p, m, y, jnp.ones(params.M, bool),
                jnp.asarray(0.001, jnp.float32), cp,
                visible_count=jnp.asarray(30, jnp.int32),
            ).y
        )
        results[name] = slope_time(f, (state.y, pc.points, pc.mask), chain_idx=0)

    # Solve alone.
    a = jnp.eye(params.M) * 5.0 + 0.1
    b = jnp.ones((params.M, 3))
    solve_f = jax.jit(lambda a, b: jnp.linalg.solve(a, b))
    results["solve_45x45"] = slope_time(solve_f, (a, b))

    # Full step, chained.
    step = jax.jit(functools.partial(_step_impl, params=params, intr=intr, cell_px=cell))
    def chained_step(k):
        s = state
        t0 = time.perf_counter()
        for _ in range(k):
            s, o = step(s, rgbj, depthj, occ)
        _ = np.asarray(s.y)
        return time.perf_counter() - t0
    step(state, rgbj, depthj, occ)
    t1, t2 = chained_step(8), chained_step(32)
    results["full_step_chained"] = (t2 - t1) / 24 * 1000.0

    for k, v in results.items():
        print(f"{k:28s} {v:8.3f} ms")


if __name__ == "__main__":
    main()

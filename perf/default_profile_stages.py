"""Per-stage on-device costs of the ROUND-3 DEFAULT profile (parity_split).

In-graph lax.scan repetition (dispatch-free), real ~1.4k-point parity
clouds — the numbers that actually compose the 0.71 ms default step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def scan_time(build_body, k_pair=(16, 96)):
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
        _ = float(c)
        t0 = time.perf_counter()
        c = run(jnp.asarray(0.0, jnp.float32))
        _ = float(c)
        times.append(time.perf_counter() - t0)
    return (times[1] - times[0]) / (k_pair[1] - k_pair[0]) * 1000.0


def med3(build_body, k_pair=(16, 96)):
    return float(np.median([scan_time(build_body, k_pair) for _ in range(3)]))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.models.trackdlo import (
        build_step_fn, init_state, preprocess_for_step,
    )
    from trackdlo_tpu.ops.cpd_lle import CpdParams, cpd_lle
    from trackdlo_tpu.ops.preprocess import default_cell_px
    from trackdlo_tpu.ops.priors import correspondence_priors
    from trackdlo_tpu.ops.visibility import compute_visibility

    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    rgb, depth = render_frame(rope, 2 / 15.0, intr)
    rgbj, depthj = jnp.asarray(rgb), jnp.asarray(depth)
    occ = jnp.ones((intr.height, intr.width), bool)
    cell = params.downsample_cell_px or default_cell_px(
        params.downsample_leaf_size, intr.fx
    )
    state = init_state(rope.nodes(1 / 15.0, params.M), params)
    proj = jnp.asarray(intr.proj_matrix(), jnp.float32)
    m = params.M

    pre_fn = jax.jit(
        lambda r, d, o: preprocess_for_step(r, d, o, params=params, intr=intr, cell_px=cell, use_pallas=True)
    )
    pc = pre_fn(rgbj, depthj, occ)
    n_live = int(np.asarray(pc.count))
    print(f"default-profile cloud: {n_live} points (cap {pc.points.shape[0]})")

    results = {}

    def preprocess_body():
        def body(c):
            o = occ & (depthj.astype(jnp.float32) + c >= c)  # depends on c
            p = preprocess_for_step(rgbj, depthj, o, params=params, intr=intr, cell_px=cell, use_pallas=True)
            return jnp.sum(p.points) * 1e-12 + c * 0.5
        return body

    results["preprocess(default)"] = med3(preprocess_body)

    def visibility_body():
        def body(c):
            v = compute_visibility(
                state.y + c * 1e-12, pc.points, pc.mask, proj,
                state.geodesic_coord, intr.height, intr.width,
                params.visibility_threshold, params.dlo_pixel_width,
                params.d_vis,
            )
            return jnp.sum(v.shortest_node_pt_dists) * 1e-12 + c * 0.5
        return body

    results["visibility"] = med3(visibility_body)

    def priors_body():
        def body(c):
            pr = correspondence_priors(
                state.y + c * 1e-12, state.geodesic_coord, state.y,
                jnp.arange(m, dtype=jnp.int32), jnp.asarray(m, jnp.int32),
                jnp.arange(m, dtype=jnp.int32), jnp.asarray(m, jnp.int32),
                use_pallas=True,
            )
            return jnp.sum(pr.prior_pos) * 1e-12 + c * 0.5
        return body

    results["priors_walks"] = med3(priors_body)

    main_cp = dict(
        beta=params.beta, lam=params.lam, lle_weight=params.lle_weight,
        mu=params.mu, include_lle=False, k_vis=params.k_vis,
        visibility_threshold=params.visibility_threshold, use_visibility=True,
        use_pallas=True,  # the product path (as _step_impl passes it)
    )

    def em_body(cp):
        def body(c):
            r = cpd_lle(
                pc.points, pc.mask, state.y + c * 1e-12, jnp.ones(m, bool),
                jnp.asarray(0.001, jnp.float32), cp,
                visible_count=jnp.asarray(30, jnp.int32),
            )
            return jnp.sum(r.y) * 1e-12 + c * 0.5
        return body

    results["em_1it"] = med3(lambda: em_body(CpdParams(**main_cp, max_iter=1, tol=0.0)))
    results["em_10it"] = med3(lambda: em_body(CpdParams(**main_cp, max_iter=10, tol=0.0)))
    results["em_tol(default)"] = med3(
        lambda: em_body(CpdParams(**main_cp, max_iter=params.max_iter, tol=params.tol))
    )

    # Full default step for cross-check against bench ondevice_scan.
    step = build_step_fn(params, intr, jit=False)

    def full_body():
        def body(c):
            s2 = state._replace(y=state.y + c * 1e-12)
            ns, _ = step(s2, rgbj, depthj, occ)
            return jnp.sum(ns.y) * 1e-12 + c * 0.5
        return body

    results["full_step"] = med3(full_body)

    per_it = (results["em_10it"] - results["em_1it"]) / 9.0
    results["em_per_iteration"] = per_it
    for k, v in results.items():
        print(f"{k:24s} {v:7.3f} ms")

    import json
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "default_profile_stages.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

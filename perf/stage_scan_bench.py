"""On-device stage costs via in-graph lax.scan repetition.

Each stage runs K times inside ONE jitted scan whose carry perturbs the
stage input, forcing sequential execution on device; per-call time is the
slope between two K values after a device->host fetch. This is immune to
async dispatch, tunnel latency, and overlap.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def scan_time(build_body, k_pair=(8, 24)):
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
        _ = float(c)  # compile + first run
        t0 = time.perf_counter()
        c = run(jnp.asarray(0.0, jnp.float32))
        _ = float(c)
        times.append(time.perf_counter() - t0)
    return (times[1] - times[0]) / (k_pair[1] - k_pair[0]) * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.models.trackdlo import init_state
    from trackdlo_tpu.ops.cpd_lle import CpdParams, cpd_lle
    from trackdlo_tpu.ops.preprocess import default_cell_px, preprocess_frame
    from trackdlo_tpu.ops.priors import correspondence_priors
    from trackdlo_tpu.ops.visibility import compute_visibility

    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    rgb, depth = render_frame(rope, 1 / 15.0, intr)
    rgbj = jnp.asarray(rgb)
    depthj = jnp.asarray(depth)
    occ = jnp.ones((intr.height, intr.width), bool)
    cell = default_cell_px(params.downsample_leaf_size, intr.fx)
    state = init_state(rope.nodes(0.0, params.M), params)
    proj = jnp.asarray(intr.proj_matrix(), jnp.float32)
    m = params.M

    pre = jax.jit(
        lambda r, d, o: preprocess_frame(
            r, d, o, intr.fx, intr.fy, intr.cx, intr.cy,
            params.hsv_lower, params.hsv_upper, False, cell, params.max_points,
        )
    )
    pc = pre(rgbj, depthj, occ)
    vis = compute_visibility(
        state.y, pc.points, pc.mask, proj, state.geodesic_coord,
        intr.height, intr.width, params.visibility_threshold,
        params.dlo_pixel_width, params.d_vis,
    )

    results = {}

    def preprocess_body(leaf=None):
        def body(c):
            p = preprocess_frame(
                rgbj, depthj, occ, intr.fx, intr.fy, intr.cx, intr.cy + c * 1e-12,
                params.hsv_lower, params.hsv_upper, False, cell,
                params.max_points, voxel_leaf=leaf,
            )
            return jnp.sum(p.points) * 1e-12 + c * 0.5
        return body

    results["preprocess_cells"] = scan_time(lambda: preprocess_body(None))
    results["preprocess_cells+snap"] = scan_time(
        lambda: preprocess_body(params.downsample_leaf_size)
    )

    def visibility_body():
        def body(c):
            v = compute_visibility(
                state.y + c * 1e-12, pc.points, pc.mask, proj,
                state.geodesic_coord, intr.height, intr.width,
                params.visibility_threshold, params.dlo_pixel_width, params.d_vis,
            )
            return jnp.sum(v.shortest_node_pt_dists) * 1e-12 + c * 0.5
        return body

    results["visibility"] = scan_time(visibility_body)

    def priors_body():
        def body(c):
            pr = correspondence_priors(
                state.y + c * 1e-12, state.geodesic_coord, state.y,
                jnp.arange(m, dtype=jnp.int32), jnp.asarray(m, jnp.int32),
                jnp.arange(m, dtype=jnp.int32), jnp.asarray(m, jnp.int32),
            )
            return jnp.sum(pr.prior_pos) * 1e-12 + c * 0.5
        return body

    results["priors_walks"] = scan_time(priors_body)

    def em_body(cp, n_iters_label=None):
        def body(c):
            r = cpd_lle(
                pc.points, pc.mask, state.y + c * 1e-12, jnp.ones(m, bool),
                jnp.asarray(0.001, jnp.float32), cp,
                visible_count=jnp.asarray(30, jnp.int32),
            )
            return jnp.sum(r.y) * 1e-12 + c * 0.5
        return body

    main_cp = dict(
        beta=params.beta, lam=params.lam, lle_weight=params.lle_weight,
        mu=params.mu, include_lle=False, k_vis=params.k_vis,
        visibility_threshold=params.visibility_threshold, use_visibility=True,
    )
    results["em_1it"] = scan_time(
        lambda: em_body(CpdParams(**main_cp, max_iter=1, tol=0.0))
    )
    results["em_10it"] = scan_time(
        lambda: em_body(CpdParams(**main_cp, max_iter=10, tol=0.0))
    )
    results["em_10it_pallas"] = scan_time(
        lambda: em_body(CpdParams(**main_cp, max_iter=10, tol=0.0, use_pallas=True))
    )
    pre_cp = dict(
        beta=params.beta_pre_proc, lam=params.lambda_pre_proc,
        lle_weight=params.lle_weight, mu=params.mu, include_lle=True,
    )
    results["em_preproc_tol"] = scan_time(
        lambda: em_body(CpdParams(**pre_cp, max_iter=params.max_iter, tol=params.tol))
    )

    for k, v in results.items():
        print(f"{k:24s} {v:8.3f} ms")
    em_it = (results["em_10it"] - results["em_1it"]) / 9
    print(f"{'-> per EM iteration':24s} {em_it:8.3f} ms")


if __name__ == "__main__":
    main()

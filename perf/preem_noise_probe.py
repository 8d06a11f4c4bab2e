"""Localize the TPU pre-registration-EM noise floor (round 4).

perf/trip_counts.py found the TPU pre-EM stalling at max_iter=50 on frames
where the f64 oracle converges in ~6 trips, while the CPU f32 XLA path
matches the oracle exactly — the noise is TPU-specific. This probe captures
the EM inputs of one stalling frame from the production closed loop, then
runs 50 UNGATED iterations (cpd_lle return_deltas=True) in four configs:

  pallas+gj   : fused Pallas E-step + Gauss-Jordan kernel solve   (ship)
  pallas+xla  : fused Pallas E-step + XLA LU solve          (solver="xla_lu")
  xla+gj      : XLA E-step + Gauss-Jordan kernel solve   (use_pallas=False)
  xla+xla     : pure XLA                                 (the CPU-equivalent)

plus the f64 oracle on the same system. Whichever component's configs
plateau above tol=2e-4 owns the stall.

Usage (TPU): python perf/preem_noise_probe.py
Writes perf/preem_noise_probe.json.
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    pre_cp = CpdParams(
        beta=params.beta_pre_proc, lam=params.lambda_pre_proc,
        lle_weight=params.lle_weight, mu=params.mu,
        max_iter=params.max_iter, tol=params.tol, include_lle=True,
        prune_radius=params.prune_radius,
        visibility_threshold=params.visibility_threshold,
        use_pallas=use_pallas, solver=params.solver,
    )

    # --- closed loop until the pre-EM stalls; capture that frame's inputs --
    @jax.jit
    def step_capture(state, rgb, depth):
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
            pc.points, pc.mask, guide0, gmask, state.sigma2, pre_cp,
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
        cap = (pc.points, pc.mask, guide0, gmask, state.sigma2,
               vis.point_min_sq_ext)
        return new_state, pre.iterations, cap

    state = init_state(rope.nodes(0.0, params.M), params)
    captured = None
    for t in range(40):
        rgb, depth = render_frame(rope, (t + 1) / 15.0, intr)
        state, pre_it, cap = step_capture(
            state, jnp.asarray(rgb), jnp.asarray(depth)
        )
        pre_it = int(pre_it)
        print(f"frame {t:3d}  pre iters {pre_it}")
        if pre_it >= 40:
            captured = jax.tree.map(np.asarray, cap)
            print(f"captured stalling frame {t}")
            break
    if captured is None:
        print("no stalling frame in 40 — capturing the last frame anyway")
        captured = jax.tree.map(np.asarray, cap)

    x, x_mask, guide0, gmask, sigma2, pmin_ext = captured
    np.savez("/tmp/preem_stall_inputs.npz", x=x, x_mask=x_mask,
             guide0=guide0, gmask=gmask, sigma2=sigma2, pmin_ext=pmin_ext)

    # --- 50 ungated iterations per config --------------------------------
    configs = {
        "pallas+gj": dict(use_pallas=True, solver="lu"),
        "pallas+xla": dict(use_pallas=True, solver="xla_lu"),
        "xla+gj": dict(use_pallas=False, solver="lu"),
        "xla+xla": dict(use_pallas=False, solver="xla_lu"),
    }
    out = {}
    for name, kw in configs.items():
        cp = dataclasses.replace(pre_cp, **kw)

        @jax.jit
        def run(x, x_mask, guide0, gmask, sigma2, pmin_ext, cp=cp):
            return cpd_lle(
                x, x_mask, guide0, gmask, sigma2, cp,
                point_min_sq=pmin_ext, return_deltas=True,
            )

        _, deltas = run(*(jnp.asarray(v) for v in captured))
        deltas = np.asarray(deltas)
        out[name] = deltas.tolist()
        tail = deltas[-10:]
        print(f"{name:11s} delta[0]={deltas[0]:.2e} tail min/med/max "
              f"{tail.min():.2e}/{np.median(tail):.2e}/{tail.max():.2e}")

    # --- f64 oracle reference --------------------------------------------
    from trackdlo_tpu.oracle.cpd_lle import cpd_lle as oracle_cpd
    from trackdlo_tpu.oracle.geometry import pt2pt_dis

    xv = x[x_mask]
    gv = guide0[gmask]
    mg = int(gmask.sum())
    ys = []
    for k in range(1, 51):
        r = oracle_cpd(
            xv, gv, float(sigma2), params.beta_pre_proc,
            params.lambda_pre_proc, params.lle_weight, params.mu,
            k, 0.0, include_lle=True, prune_radius=params.prune_radius,
            visibility_threshold=params.visibility_threshold,
        )
        ys.append(r.y)
    odeltas = [float(pt2pt_dis(a, b) / mg) for a, b in zip([gv] + ys[:-1], ys)]
    out["oracle_f64"] = odeltas
    tail = np.array(odeltas[-10:])
    print(f"{'oracle_f64':11s} delta[0]={odeltas[0]:.2e} tail min/med/max "
          f"{tail.min():.2e}/{np.median(tail):.2e}/{tail.max():.2e}")
    print(f"tol = {params.tol:.1e}")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "preem_noise_probe.json")
    with open(path, "w") as f:
        json.dump({"tol": params.tol, "deltas": out}, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

"""Decompose the TPU lstsq closed-loop divergence (round 5, VERDICT r4 #3).

With the r4 rcond=1e-12 fix the COD-semantics solver (`solver="lstsq"`,
trackdlo.cpp:415) returns to the normal band on CPU (0.34 mm mean,
perf/parity_decomp_30f_r5cpu.json) but reads 7.9 mm mean / final=max
(progressive divergence) on the TPU (perf/parity_decomp_30f_tpu_r5.json).
The rcond trap is a subspace-truncation story and is solved; whatever
remains is TPU-specific. Suspect: `jnp.linalg.lstsq` lowers to the QDWH
SVD on TPU (iterative polar decomposition built from f32 matmuls) vs
LAPACK's gesdd on CPU — a different, potentially much larger, noise floor
on an ill-conditioned system.

Three measurements, mirroring the r4 GJ-stall decomposition
(perf/preem_noise_probe.py):

1. per-solve: the deterministic ill-conditioned pre-proc system of
   tests/test_cpd_parity.py::TestLstsqRcond (cond(A)~4e6, collapsed
   sigma^2) solved by {CPU lstsq, TPU lstsq, TPU LU, TPU GJ kernel} in
   f32 against the f64 COD truth; error reported in T-space (mm through
   G, what the EM actually consumes). Plus the TPU-vs-f64 singular-value
   relative error — the SVD's own accuracy, independent of any solve.
2. per-solve on the WELL-conditioned main-pass system (lambda=50000,
   same sigma^2): is the divergence confined to the pre-proc regime?
3. per-iteration: 50 ungated EM deltas (return_deltas) with
   solver="lstsq" on a captured production frame, TPU vs CPU vs the
   f64 oracle — does the tolerance loop converge at all?

Usage (TPU): python perf/lstsq_tpu_probe.py
Writes perf/lstsq_tpu_probe.json.
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_system(lam, s2):
    """The deterministic M-step system of TestLstsqRcond (f64)."""
    import importlib

    from trackdlo_tpu.config import live_params
    from trackdlo_tpu.io.sequence import SyntheticRope

    # the package __init__ re-exports the cpd_lle FUNCTION under the module
    # name — import the module explicitly
    OC = importlib.import_module("trackdlo_tpu.oracle.cpd_lle")

    params = live_params()
    rope = SyntheticRope()
    y = np.asarray(rope.nodes(0.0, params.M))
    rng = np.random.default_rng(0)
    t = rng.uniform(0, 1, 600)
    idx = (t * (params.M - 1)).astype(int)
    fr = (t * (params.M - 1)) - idx
    pts = (
        y[idx] * (1 - fr[:, None])
        + y[np.minimum(idx + 1, params.M - 1)] * fr[:, None]
    )
    pts = pts + 0.003 * rng.standard_normal(pts.shape)

    m = len(y)
    seg = np.linalg.norm(np.diff(y, axis=0), axis=1)
    node_coord = np.concatenate([[0.0], np.cumsum(seg)])
    nd = np.abs(node_coord[:, None] - node_coord[None, :])
    beta = params.beta_pre_proc if lam < 100 else params.beta
    g = OC.mct_kernel(nd, beta)
    diff = ((y[:, None] - pts[None]) ** 2).sum(-1)
    p = np.exp(-0.5 * diff / s2)
    c = (2 * np.pi * s2) ** 1.5 * params.mu / (1 - params.mu) * m / len(pts)
    p = p / (p.sum(0) + c)
    p1 = p.sum(1)
    a64 = np.diag(p1) @ g + lam * s2 * np.eye(m)
    b64 = p @ pts - np.diag(p1) @ y
    return y, g, a64, b64


def solve_errors(tag, y, g, a64, b64, out):
    import jax
    import jax.numpy as jnp

    from trackdlo_tpu.ops.pallas_kernels import gauss_jordan_solve_batched

    t64 = y + g @ np.linalg.lstsq(a64, b64, rcond=None)[0]
    a32 = jnp.asarray(a64, jnp.float32)
    b32 = jnp.asarray(b64, jnp.float32)
    cpu = jax.devices("cpu")[0]

    def dev_mm(w):
        return float(np.abs((y + g @ np.asarray(w, np.float64)) - t64).max() * 1000)

    with jax.default_matmul_precision("highest"):
        # TPU QDWH-SVD lstsq (the shipped lstsq lowering)
        w_tpu = jax.jit(lambda a, b: jnp.linalg.lstsq(a, b, rcond=1e-12)[0])(
            a32, b32
        )
        # CPU LAPACK lstsq on the identical f32 system
        with jax.default_device(cpu):
            w_cpu = jax.jit(
                lambda a, b: jnp.linalg.lstsq(a, b, rcond=1e-12)[0]
            )(jax.device_put(a32, cpu), jax.device_put(b32, cpu))
        # TPU LU and the shipped GJ kernel
        w_lu = jax.jit(jnp.linalg.solve)(a32, b32)
        w_gj = gauss_jordan_solve_batched(a32[None], b32[None])[0]
        # Householder-QR solve (the candidate COD realization: at rcond~0
        # the SVD min-norm solve equals a direct solve for every
        # numerically-nonsingular system, and TPU QR is backward stable
        # where QDWH-SVD's tail sigmas are ~14% off)
        from trackdlo_tpu.ops.cpd_lle import _solve_qr

        w_qr = jax.jit(_solve_qr)(a32, b32)

        # The SVD's own accuracy: TPU-vs-f64 singular values.
        s_tpu = np.asarray(jax.jit(lambda a: jnp.linalg.svd(a)[1])(a32), np.float64)
        s64 = np.linalg.svd(a64, compute_uv=False)
        with jax.default_device(cpu):
            s_cpu = np.asarray(
                jax.jit(lambda a: jnp.linalg.svd(a)[1])(
                    jax.device_put(a32, cpu)
                ),
                np.float64,
            )

    out[tag] = {
        "cond_a": float(np.linalg.cond(a64)),
        "tpu_lstsq_mm": dev_mm(w_tpu),
        "cpu_lstsq_mm": dev_mm(w_cpu),
        "tpu_lu_mm": dev_mm(w_lu),
        "tpu_gj_mm": dev_mm(w_gj),
        "tpu_qr_mm": dev_mm(w_qr),
        # relative sigma error, and on the small tail (where truncation and
        # QDWH noise live): sigma below 1e-3*sigma_max
        "tpu_svd_sigma_relerr_max": float(np.abs(s_tpu - s64).max() / s64[0]),
        "cpu_svd_sigma_relerr_max": float(np.abs(s_cpu - s64).max() / s64[0]),
        "tpu_svd_sigma_tail_relerr": float(
            np.abs((s_tpu - s64) / np.maximum(s64, 1e-30))[
                s64 < 1e-3 * s64[0]
            ].max()
            if (s64 < 1e-3 * s64[0]).any()
            else 0.0
        ),
    }
    print(tag, json.dumps(out[tag], indent=1))


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
    from trackdlo_tpu.ops.visibility_kernel import fused_visibility

    assert jax.default_backend() == "tpu", "run on the TPU"
    out = {}

    params = live_params()

    # --- 1+2: per-solve isolation ------------------------------------------
    y, g, a64, b64 = build_system(params.lambda_pre_proc, 2e-5)
    solve_errors("preproc_lam1", y, g, a64, b64, out)
    y, g, a64, b64 = build_system(params.lam, 2e-5)
    solve_errors("main_lam50000", y, g, a64, b64, out)
    # mid regime: the main pass early in tracking (sigma^2 not collapsed)
    y, g, a64, b64 = build_system(params.lam, 1e-3)
    solve_errors("main_warm_s2", y, g, a64, b64, out)

    # --- 3: ungated EM deltas with solver=lstsq ------------------------------
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
        use_pallas=use_pallas, solver="lstsq",
    )

    @jax.jit
    def step_capture(state, rgb, depth):
        pc = preprocess_for_step(
            rgb, depth, occ, params=params, intr=intr, cell_px=cell,
            use_pallas=use_pallas,
        )
        vis = fused_visibility(
            state.y, pc.points, pc.mask, proj, state.geodesic_coord,
            intr.height, intr.width, params.visibility_threshold,
            params.dlo_pixel_width, params.d_vis, interpret=False,
        )
        iota = jnp.arange(m)
        guide0 = state.y[vis.vis_ext_idx]
        gmask = iota < vis.vis_ext_count
        guide0 = jnp.where(gmask[:, None], guide0, 0.0)
        pre = cpd_lle(
            pc.points, pc.mask, guide0, gmask, state.sigma2, pre_cp,
            point_min_sq=vis.point_min_sq_ext,
        )
        new_y = jnp.where(gmask[:, None], pre.y, state.y)
        new_state = state._replace(y=new_y, sigma2=pre.sigma2)
        cap = (pc.points, pc.mask, guide0, gmask, state.sigma2,
               vis.point_min_sq_ext)
        return new_state, pre.iterations, cap

    state = init_state(rope.nodes(0.0, params.M), params)
    for t in range(12):
        rgb, depth = render_frame(rope, (t + 1) / 15.0, intr)
        state, pre_it, cap = step_capture(
            state, jnp.asarray(rgb), jnp.asarray(depth)
        )
    captured = jax.tree.map(np.asarray, cap)
    x, x_mask, guide0, gmask, sigma2, pmin_ext = captured

    deltas = {}
    cpu = jax.devices("cpu")[0]
    for name, dev, slv in (
        ("tpu_lstsq", None, "lstsq"),            # QR realization (r5 fix)
        ("tpu_svd_lstsq", None, "svd_lstsq"),    # QDWH-SVD (pre-fix path)
        ("cpu_lstsq", cpu, "lstsq"),
    ):
        cp = dataclasses.replace(
            pre_cp, use_pallas=(dev is None and use_pallas), solver=slv
        )

        def run(x, x_mask, guide0, gmask, sigma2, pmin_ext, cp=cp):
            return cpd_lle(
                x, x_mask, guide0, gmask, sigma2, cp,
                point_min_sq=pmin_ext, return_deltas=True,
            )

        args = [jnp.asarray(v) for v in captured]
        if dev is None:
            _, d = jax.jit(run)(*args)
        else:
            with jax.default_device(cpu):
                _, d = jax.jit(run)(*[jax.device_put(a, cpu) for a in args])
        d = np.asarray(d)
        deltas[name] = d.tolist()
        tail = d[-10:]
        print(f"{name:10s} delta[0]={d[0]:.2e} tail med {np.median(tail):.2e}"
              f" (tol {params.tol:.1e})")

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
    deltas["oracle_f64"] = [
        float(pt2pt_dis(a, b) / mg) for a, b in zip([gv] + ys[:-1], ys)
    ]
    out["em_deltas"] = deltas
    out["tol"] = params.tol

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "lstsq_tpu_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

"""The CPD/MCT EM solver as a single jitted graph.

TPU-native redesign of trackdlo::cpd_lle (trackdlo.cpp:161-441):

- the reference's per-point scalar loops (E-step distances, geodesic
  re-distancing trackdlo.cpp:279-351) become dense masked (M, N) array ops;
- the per-frame variable-size structures (pruned points, guide-node subsets,
  prior lists) are fixed-capacity arrays with validity masks, so one compiled
  executable serves every frame;
- the EM iteration is a `lax.while_loop` with the reference's tolerance-based
  early exit (trackdlo.cpp:424-437);
- the M×M system solve runs as a batched dense solve (D=3 right-hand sides),
  sized for the MXU when vmapped across streams.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from trackdlo_tpu.ops.kernels import (
    gaussian_kernel,
    lle_regularizer,
    masked_geodesic_coords,
    mct_kernel,
    pairwise_sq_dists,
)

_BIG = 1e5
_TWO_PI = 6.283185307179586


@jax.custom_batching.custom_vmap
def _solve_lu(a_mat: jnp.ndarray, b_mat: jnp.ndarray) -> jnp.ndarray:
    """M-step solve with a TPU-aware fast path.

    On TPU both the unbatched and the vmapped solve route to the Pallas
    Gauss-Jordan kernel with exact permutation extraction + one iterative-
    refinement step (ops/pallas_kernels.gauss_jordan_solve_batched):
    9.4 us per 48x48 system vs LU's ~22 (perf/solve_b1_bench.py), ~6e-9
    vs-f64 error (below LU's ~2e-8), and — decisive for the tolerance-based
    EM loops — trip counts matching LU/f64 dynamics (an earlier bf16-rounded
    extraction left ~1e-4 solve noise that stalled the weakly-regularized
    pre-registration EM at max_iter). In-context full-step A/B after the
    E-step tile-skip: GJ-refined 0.57 vs LU 0.64 ms/frame. Under jax.vmap
    jnp.linalg.solve would be batch-SEQUENTIAL LU, so the vmap rule uses the
    same batched kernel (all systems in one 48-step elimination).
    Non-TPU backends keep plain LU.

    NOTE: the route is chosen from ``jax.default_backend()`` at TRACE time,
    not the actual lowering platform. Tracing for a non-default device (an
    explicit CPU-device jit inside a TPU-default process) would stage the
    TPU kernel with interpret=False and fail to lower. The repo switches
    platforms globally (tests set jax_platforms=cpu), so this never bites
    in-tree; revisit with jax.lax.platform_dependent if mixed-device jits
    ever appear.
    """
    if jax.default_backend() == "tpu":
        from trackdlo_tpu.ops.pallas_kernels import gauss_jordan_solve_batched

        return gauss_jordan_solve_batched(a_mat[None], b_mat[None])[0]
    return jnp.linalg.solve(a_mat, b_mat)


@_solve_lu.def_vmap
def _solve_lu_vmap_rule(axis_size, in_batched, a_mat, b_mat):
    a_b, b_b = in_batched
    if not a_b:
        a_mat = jnp.broadcast_to(a_mat, (axis_size,) + a_mat.shape)
    if not b_b:
        b_mat = jnp.broadcast_to(b_mat, (axis_size,) + b_mat.shape)
    if jax.default_backend() == "tpu":
        from trackdlo_tpu.ops.pallas_kernels import gauss_jordan_solve_batched

        # Flatten any extra leading batch dims (nested vmap).
        lead = a_mat.shape[:-2]
        m = a_mat.shape[-1]
        k = b_mat.shape[-1]
        a2 = a_mat.reshape((-1, m, m))
        b2 = b_mat.reshape((-1, m, k))
        out = gauss_jordan_solve_batched(a2, b2).reshape(lead + (m, k))
    else:
        out = jnp.linalg.solve(a_mat, b_mat)
    return out, True


def _solve_qr(a_mat: jnp.ndarray, b_mat: jnp.ndarray) -> jnp.ndarray:
    """Householder-QR solve: the f32 realization of the reference's COD.

    The reference solves the M-step with Eigen's
    completeOrthogonalDecomposition (trackdlo.cpp:415) in f64, whose rank
    cutoff (eps_f64-scale) never bites on the MCT system — so its semantics
    on every system the tracker actually produces are a plain direct solve
    reached through orthogonal factors. QR is exactly that: backward-stable
    on every backend, including TPU, where the SVD realization
    (jnp.linalg.lstsq -> QDWH) carries ~14% relative error on small
    singular values and loses 3.6 mm per solve in the ill-conditioned
    pre-registration regime (cond(A)~4e6, perf/lstsq_tpu_probe.json:
    tpu_lstsq 3.59 mm vs tpu_qr/tpu_lu ~0.03 mm). The SVD path survives as
    solver="svd_lstsq" for diagnosis.
    """
    q_mat, r_mat = jnp.linalg.qr(a_mat)
    # Exact-zero diagonal guard: an EXACTLY rank-deficient A (coincident
    # nodes with lam=0, tests/test_robustness.TestSingularSystem) can leave
    # a true 0 on R's diagonal -> inf. In f32 practice Householder round-off
    # leaves ~eps*scale there instead, whose inverted noise lands in G's
    # small singular directions and is filtered by G — the same mechanism
    # the rcond~0 SVD path relies on (r4 finding). Only the literal zero
    # needs replacing; anything larger must pass through untouched (any
    # f32-scale cutoff truncates real spectrum at cond(A)~4e6).
    diag = jnp.diagonal(r_mat, axis1=-2, axis2=-1)
    tiny = jnp.asarray(1.1754944e-38, r_mat.dtype)  # f32 smallest normal
    safe = jnp.where(diag == 0, tiny, diag)
    r_mat = r_mat + jnp.zeros_like(r_mat).at[
        ..., jnp.arange(r_mat.shape[-1]), jnp.arange(r_mat.shape[-1])
    ].set(safe - diag)
    hp = jax.lax.Precision.HIGHEST
    return jax.scipy.linalg.solve_triangular(
        r_mat, jnp.matmul(q_mat.T, b_mat, precision=hp), lower=False
    )


def _em_while_xla(params, interpret, dyn, y0p, coordp, nmp, gp, hgp, hy0p,
                  jgp, pdp, xt, xmp):
    """The per-iteration EM while-loop on pre-padded staging (the twin the
    whole-EM loop kernel is dispatched against): one fused E-step kernel +
    one batched-GJ solve per iteration, XLA glue between. This IS the
    multi-stream product path — under jax.vmap the E-step routes to the
    row-packed batch kernel and the solve to the batched GJ, so batching
    costs rows, not kernel replays.

    ``dyn`` (8, 128) broadcast rows: [0]=sigma2, [1]=v_count, [2]=n_safe,
    [3]=vis_gate. Everything in ``params`` is a trace-time constant.
    Returns (y (m_pad, 3), sigma2, iterations, converged)."""
    from trackdlo_tpu.ops.pallas_kernels import (
        estep_scalars,
        fused_estep_packed,
    )

    dtype = y0p.dtype
    m_pad = y0p.shape[0]
    sigma2 = dyn[0, 0]
    v_count = dyn[1, 0]
    n_safe = dyn[2, 0]
    gate_f = dyn[3, 0]
    node_mask_p = nmp[:, 0] > 0
    pair_mask_p = node_mask_p[:, None] & node_mask_p[None, :]
    eye_p = jnp.eye(m_pad, dtype=dtype)
    ones_pv_p = jnp.ones((m_pad, 1), dtype)
    d = 3

    def iteration(y_cur_p, s2):
        c_base = (_TWO_PI * s2) ** (d / 2) * params.mu / (1 - params.mu)
        c = c_base * v_count / n_safe
        c_vis = c_base / n_safe
        scalars = estep_scalars(
            s2, c, c_vis, gate_f, v_count,
            params.k_vis, params.visibility_threshold, True,
        )
        p1p, pxp, scal, _short = fused_estep_packed(
            scalars, y_cur_p, coordp, nmp, ones_pv_p, xt, xmp,
            two_phase=True, interpret=interpret,
        )
        np_total = scal[0, 0]
        tr_xtdpt1x = scal[0, 1]

        a_mat = p1p * gp + params.lam * s2 * eye_p
        b_mat = pxp - p1p * y0p
        if params.include_lle:
            a_mat = a_mat + s2 * params.lle_weight * hgp
            b_mat = b_mat - s2 * params.lle_weight * hy0p
        if params.use_priors:
            a_mat = a_mat + params.alpha * jgp
            b_mat = b_mat + params.alpha * pdp
        a_mat = jnp.where(pair_mask_p, a_mat, eye_p)
        b_mat = jnp.where(node_mask_p[:, None], b_mat, 0.0)
        w = _solve_lu(a_mat, b_mat)
        t_p = y0p + gp @ w

        tr_pxtt = jnp.sum(pxp * t_p)
        tr_ttdp1t = jnp.sum(p1p * t_p * t_p)
        s2_new = (tr_xtdpt1x - 2 * tr_pxtt + tr_ttdp1t) / (np_total * d)
        s2_new = jnp.maximum(s2_new, 1e-10)

        move = jnp.sum(
            jnp.where(
                node_mask_p, jnp.linalg.norm(y_cur_p - t_p, axis=1), 0.0
            )
        )
        delta = move / jnp.maximum(v_count, 1.0)
        return t_p, s2_new, delta

    def cond(carry):
        _, _, it, done, _ = carry
        return (~done) & (it < params.max_iter)

    def body(carry):
        y_cur_p, s2, it, _, _ = carry
        t_p, s2_new, delta = iteration(y_cur_p, s2)
        done = delta < params.tol
        converged = done | (it + 1 < params.max_iter)
        return t_p, s2_new, it + 1, done, converged

    init = (
        y0p, sigma2, jnp.asarray(0, jnp.int32), jnp.asarray(False),
        jnp.asarray(True),
    )
    y_p, s2_out, iters, _, converged = jax.lax.while_loop(cond, body, init)
    return y_p, s2_out, iters, converged


@dataclasses.dataclass(frozen=True)
class CpdParams:
    """Static hyperparameters of one EM pass (trace-time constants)."""

    beta: float
    lam: float
    lle_weight: float
    mu: float
    max_iter: int
    tol: float
    include_lle: bool
    alpha: float = 0.0
    k_vis: float = 0.0
    visibility_threshold: float = 0.01
    prune_radius: float = 0.1
    use_priors: bool = False
    use_visibility: bool = False
    # Use the fused Pallas E-step (ops/pallas_kernels.py): streams the point
    # axis through VMEM, never materializing the (M, N) affinity in HBM.
    # The bandwidth win appears for dense clouds (N >~ 10k); numerics match
    # the XLA path. TPU only (other backends fall back automatically).
    use_pallas: bool = False
    # Also fuse the M-step (in-kernel one-hot Gauss-Jordan solve) into the
    # same kernel. Measured SLOWER than the XLA solve on v5e (the 48-step
    # one-hot elimination loop lowers poorly) — kept as an option for future
    # Mosaic versions / other chips.
    use_fused_mstep: bool = False
    # M-step solver:
    # - "lu" (jnp.linalg.solve; the default — fastest, fine while A is
    #   well-conditioned);
    # - "lstsq" (the reference's completeOrthogonalDecomposition().solve
    #   semantics, trackdlo.cpp:415, realized with Householder QR — see
    #   _solve_qr; "svd_lstsq" keeps the SVD min-norm realization, which
    #   diverges on TPU via QDWH tail-sigma error);
    # - "normal_cholesky" (AtA w = At b via Cholesky; looked ~4x faster in a
    #   standalone solver microbench but is indistinguishable from LU inside
    #   the compiled EM loop on v5e, and squares the condition number — kept
    #   as an option only).
    solver: str = "lu"
    # Kernel family: "mct_geodesic" (the reference C++, trackdlo.cpp:233) or
    # the prototype's "gaussian_geodesic" / "gaussian_euclidean"
    # (tracking_test.py:288-305).
    kernel: str = "mct_geodesic"
    # The prototype's pure-Euclidean mode skips the geodesic membership
    # rewrite and keeps a single normalization (tracking_test.py:344-383).
    use_geodesic_redistance: bool = True


@functools.lru_cache(maxsize=None)
def _em_loop_dispatch(params, interpret: bool):
    """Batch-aware EM-loop dispatch (r4).

    Unbatched (the single-stream hot path) runs the ENTIRE tolerance loop in
    one pallas_call (ops/pallas_kernels.fused_em_loop): zero per-iteration
    kernel launches or XLA glue — the per-iteration path paid ~21.5 us/EM
    iteration in-context, ~11 iterations/frame across the two EM passes.
    Under ``jax.vmap`` (multi-stream batching) an in-kernel while_loop would
    run every stream to the slowest stream's trip count INSIDE one kernel
    with no cross-stream amortization win, so the vmap rule keeps the
    per-iteration path, whose E-step row-packs all streams per kernel and
    whose GJ solve batches all systems in one elimination (the shipped b8
    behavior, unchanged).

    EXCEPT at axis_size == 1 (r5): a vmap of one stream has nothing to
    row-pack — the per-iteration path there is pure overhead (measured
    22.3 us/EM-trip vs the fused loop's 12.3, perf/preem_trip_slope.json;
    the round-4 "in-context per-trip exceeds the synthetic estimate"
    mystery was exactly this — the ablation harness vmaps at b1, bench.py's
    production b1 scan does not). The rule squeezes the batch axis and
    takes the fused whole-loop kernel. Consequence for convergence cohorts
    (parallel/sharding.build_batched_step_fn): cohort_size=1 is per-stream
    early-exit on the fused kernel and is NOT bitwise-identical to the
    lockstep batch (different f32 realization, parity within the audited
    kernel bounds); cohorts >= 2 keep the bitwise-identity guarantee."""

    def _run_fused(dyn, y0p, coordp, nmp, gp, hgp, hy0p, jgp, pdp, xt, xmp):
        from trackdlo_tpu.ops.pallas_kernels import fused_em_loop

        sigma2 = dyn[0, 0]
        v_count = dyn[1, 0]
        n_safe = dyn[2, 0]
        gate_f = dyn[3, 0]
        muf = params.mu / (1.0 - params.mu)
        scal = jnp.broadcast_to(
            jnp.stack(
                [
                    sigma2,
                    muf * v_count / n_safe,  # kc_v
                    muf / n_safe,  # kc_n
                    gate_f,
                    v_count,
                    jnp.zeros_like(sigma2),
                    jnp.zeros_like(sigma2),
                    jnp.zeros_like(sigma2),
                ]
            )[:, None],
            (8, 128),
        )
        y_p, stats = fused_em_loop(
            scal, y0p, coordp, nmp, gp, hgp, hy0p, jgp, pdp, xt, xmp,
            k_vis=params.k_vis,
            tau_vis=params.visibility_threshold,
            lam=params.lam,
            coef_lle=params.lle_weight if params.include_lle else 0.0,
            alpha=params.alpha if params.use_priors else 0.0,
            tol=params.tol,
            max_iter=params.max_iter,
            interpret=interpret,
        )
        return (
            y_p,
            stats[0, 0],
            stats[0, 1].astype(jnp.int32),
            stats[0, 2] > 0,
        )

    @jax.custom_batching.custom_vmap
    def run(dyn, y0p, coordp, nmp, gp, hgp, hy0p, jgp, pdp, xt, xmp):
        return _run_fused(dyn, y0p, coordp, nmp, gp, hgp, hy0p, jgp, pdp,
                          xt, xmp)

    @run.def_vmap
    def _rule(axis_size, in_batched, *args):
        if axis_size == 1:
            squeezed = tuple(
                a[0] if b else a for a, b in zip(args, in_batched)
            )
            outs = _run_fused(*squeezed)
            return (
                tuple(jnp.expand_dims(o, 0) for o in outs),
                (True, True, True, True),
            )
        args = tuple(
            a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        )
        outs = jax.vmap(
            lambda *a: _em_while_xla(params, interpret, *a)
        )(*args)
        return outs, (True, True, True, True)

    return run


class CpdResult(NamedTuple):
    y: jnp.ndarray
    sigma2: jnp.ndarray
    converged: jnp.ndarray
    iterations: jnp.ndarray


def _geodesic_redistance(
    p: jnp.ndarray,
    sq_d: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    node_coord: jnp.ndarray,
    node_mask: jnp.ndarray,
    v_count: jnp.ndarray,
) -> jnp.ndarray:
    """Vectorized geodesic re-distancing (trackdlo.cpp:303-351).

    Per point: anchor pair (argmax-membership node, nearer chain neighbour
    with the reference's boundary fallback to index 2 / V−3); then
    dist²(j) = (|c_j − c_lo| + d_lo)² for j < lo,
               (|c_j − c_hi| + d_hi)² for j ≥ hi,
               d_lo²                  for j = lo,
               0                      for lo < j < hi  (reference quirk:
    entries strictly between a non-adjacent anchor pair stay zero).
    """
    m = p.shape[0]
    p_masked = jnp.where(node_mask[:, None], p, -jnp.inf)
    mp = jnp.argmax(p_masked, axis=0)  # (N,)

    cand1 = jnp.where(mp - 1 == -1, 2, mp - 1)
    cand2 = jnp.where(mp + 1 == v_count, v_count - 3, mp + 1)
    d_sq_cand1 = jnp.take_along_axis(sq_d, cand1[None, :], axis=0)[0]
    d_sq_cand2 = jnp.take_along_axis(sq_d, cand2[None, :], axis=0)[0]
    nxt = jnp.where(d_sq_cand1 < d_sq_cand2, cand1, cand2)

    lo = jnp.minimum(mp, nxt)
    hi = jnp.maximum(mp, nxt)
    d_lo = jnp.sqrt(jnp.take_along_axis(sq_d, lo[None, :], axis=0)[0])
    d_hi = jnp.sqrt(jnp.take_along_axis(sq_d, hi[None, :], axis=0)[0])
    c_lo = node_coord[lo]
    c_hi = node_coord[hi]

    j = jnp.arange(m)[:, None]  # (M, 1)
    below = (jnp.abs(node_coord[:, None] - c_lo[None, :]) + d_lo[None, :]) ** 2
    above = (jnp.abs(node_coord[:, None] - c_hi[None, :]) + d_hi[None, :]) ** 2
    out = jnp.where(
        j < lo[None, :],
        below,
        jnp.where(
            j >= hi[None, :],
            above,
            jnp.where(j == lo[None, :], d_lo[None, :] ** 2, 0.0),
        ),
    )
    return out


def cpd_lle(
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    y: jnp.ndarray,
    node_mask: jnp.ndarray,
    sigma2: jnp.ndarray,
    params: CpdParams,
    prior_pos: jnp.ndarray | None = None,
    prior_mask: jnp.ndarray | None = None,
    visible_count: jnp.ndarray | None = None,
    axis_name: str | None = None,
    point_min_sq: jnp.ndarray | None = None,
    return_deltas: bool = False,
) -> CpdResult:
    """EM registration of the (masked) node chain to the (masked) point set.

    Arguments mirror trackdlo::cpd_lle (trackdlo.cpp:161-175) with the
    variable-size pieces as masks:

    - ``x``: (N, 3) fixed-capacity point cloud, ``x_mask`` marks valid rows;
    - ``y``: (M, 3) prefix-packed node chain, ``node_mask`` marks the prefix;
    - ``prior_pos``/``prior_mask``: (M, 3)/(M,) correspondence priors by node
      index (the reference's J selector and Y_extended, trackdlo.cpp:240-260);
    - ``visible_count``: number of extended-visible nodes; drives the
      visibility-prior gate (trackdlo.cpp:358).

    ``axis_name``: when run under shard_map with the point axis sharded
    across a mesh axis of this name, every over-points reduction (point
    counts, P1, PX, σ² traces, nearest-point distances) becomes a psum/pmin
    collective over that axis; node-space state stays replicated. This is the
    sequence-parallel scaling path for large clouds (SURVEY.md §5).

    ``point_min_sq``: optional (N,) per-point min squared distance to the
    valid nodes of ``y``, as already computed by the visibility pass
    (VisibilityOut.point_min_sq_all/_ext). When given, the pre-EM prune
    (trackdlo.cpp:177-195) consumes it instead of re-materializing the
    (M, N) sweep — the frame then runs ONE pre-EM sweep total. PRECONDITION:
    ``sigma2 > 0`` (the from-distances init of trackdlo.cpp:271-273 needs
    the full sweep; the tracker always passes sigma2 >= sigma2_init > 0).
    """
    # On TPU, f32 matmuls default to bf16 MXU passes; the EM's solves and
    # trace updates need full f32 (the compute here is negligible — the tensors
    # are tiny — so there is no speed to win from bf16).
    with jax.default_matmul_precision("highest"):
        return _cpd_lle_impl(
            x, x_mask, y, node_mask, sigma2, params, prior_pos, prior_mask,
            visible_count, axis_name, point_min_sq,
            return_deltas=return_deltas,
        )


def _cpd_lle_impl(
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    y: jnp.ndarray,
    node_mask: jnp.ndarray,
    sigma2: jnp.ndarray,
    params: CpdParams,
    prior_pos: jnp.ndarray | None = None,
    prior_mask: jnp.ndarray | None = None,
    visible_count: jnp.ndarray | None = None,
    axis_name: str | None = None,
    point_min_sq: jnp.ndarray | None = None,
    return_deltas: bool = False,
) -> CpdResult:
    dtype = y.dtype
    m = y.shape[0]
    d = 3

    if axis_name is None:
        psum = lambda v: v
        pmin = lambda v: v
    else:
        psum = lambda v: jax.lax.psum(v, axis_name)
        pmin = lambda v: jax.lax.pmin(v, axis_name)

    v_count = jnp.sum(node_mask.astype(jnp.int32))
    y0 = y

    # Prune points farther than prune_radius from every node
    # (trackdlo.cpp:177-195): fold into the validity mask. With a
    # precomputed per-point min (the visibility pass's sweep) the (M, N)
    # distances are not materialized here at all.
    if point_min_sq is None:
        sq_d0 = pairwise_sq_dists(y0, x)  # (M, N)
        sq_d0_nodesafe = jnp.where(node_mask[:, None], sq_d0, _BIG)
        point_min_sq = jnp.min(sq_d0_nodesafe, axis=0)
    else:
        sq_d0 = None
    x_mask = x_mask & (point_min_sq < params.prune_radius**2)
    n_count = psum(jnp.sum(x_mask.astype(dtype)))
    n_safe = jnp.maximum(n_count, 1.0)

    # Geodesic coordinates + MCT kernel over the valid prefix
    # (trackdlo.cpp:216-233).
    node_coord = masked_geodesic_coords(y0, node_mask)
    node_dis = jnp.abs(node_coord[:, None] - node_coord[None, :])
    pair_mask = node_mask[:, None] & node_mask[None, :]
    if params.kernel == "mct_geodesic":
        g_raw = mct_kernel(node_dis, params.beta)
    elif params.kernel == "gaussian_geodesic":
        g_raw = gaussian_kernel(node_dis, params.beta)
    elif params.kernel == "gaussian_euclidean":
        g_raw = gaussian_kernel(jnp.sqrt(pairwise_sq_dists(y0, y0)), params.beta)
    else:
        raise ValueError(f"unknown kernel {params.kernel!r}")
    g = jnp.where(pair_mask, g_raw, 0.0)

    if params.include_lle:
        h = lle_regularizer(y0, node_mask)
        hg = h @ g
        hy0 = h @ y0
    else:
        hg = None
        hy0 = None

    if params.use_priors:
        assert prior_pos is not None and prior_mask is not None
        prior_active = prior_mask & node_mask
        # J @ G selects prior rows of G (trackdlo.cpp:396); Y_extended − Y_0
        # is the prior displacement (trackdlo.cpp:397).
        jg = jnp.where(prior_active[:, None], g, 0.0)
        prior_disp = jnp.where(prior_active[:, None], prior_pos - y0, 0.0)
    else:
        jg = None
        prior_disp = None

    # Visibility gate: active only when some-but-not-all nodes are visible and
    # k_vis != 0 (trackdlo.cpp:358).
    if params.use_visibility and params.k_vis != 0 and visible_count is not None:
        vis_gate = (visible_count != v_count) & (visible_count > 0)
    else:
        vis_gate = jnp.asarray(False)

    # sigma2 == 0 → initialize from mean squared distance (trackdlo.cpp:271-273).
    # Unavailable without the materialized sweep; point_min_sq callers
    # guarantee sigma2 > 0 (see cpd_lle docstring).
    if sq_d0 is not None:
        masked_sq_d0 = jnp.where(x_mask[None, :] & node_mask[:, None], sq_d0, 0.0)
        sigma2_init = psum(jnp.sum(masked_sq_d0)) / (
            d * jnp.maximum(v_count, 1) * n_safe
        )
        sigma2 = jnp.where(sigma2 == 0, sigma2_init, sigma2)

    pair_valid = node_mask[:, None] & x_mask[None, :]
    eye = jnp.eye(m, dtype=dtype)
    inactive_rows = ~node_mask

    # The fused kernels hardcode the reference's MCT-geodesic E-step; the
    # prototype variants (gaussian kernels / no geodesic re-distance) must
    # take the XLA iteration even when use_pallas is set, or they would
    # silently compute a different algorithm.
    pallas_supports_variant = (
        params.kernel == "mct_geodesic" and params.use_geodesic_redistance
    )
    use_pallas_path = params.use_pallas and pallas_supports_variant

    if use_pallas_path:
        # Iteration-INVARIANT staging, hoisted out of the while_loop: the
        # pad/transpose XLA ops cost more per EM iteration than the fused
        # kernel itself when left inside the loop body.
        from trackdlo_tpu.ops.pallas_kernels import (
            estep_scalars,
            fused_estep_packed,
            pack_points,
        )

        m_pad = (m + 7) // 8 * 8
        pad_m3 = lambda v: jnp.zeros((m_pad, 3), dtype).at[:m].set(v)
        pad_mm = lambda v: jnp.zeros((m_pad, m_pad), dtype).at[:m, :m].set(v)
        pad_col = lambda v: jnp.zeros((m_pad, 1), dtype).at[:m, 0].set(v)
        g_p = pad_mm(g)
        eye_p = jnp.eye(m_pad, dtype=dtype)
        y0_p = pad_m3(y0)
        hg_p = pad_mm(hg) if params.include_lle else None
        hy0_p = pad_m3(hy0) if params.include_lle else None
        jg_p = pad_mm(jg) if params.use_priors else None
        pd_p = pad_m3(prior_disp) if params.use_priors else None
        coord_p = pad_col(node_coord)
        nm_p = pad_col(node_mask.astype(dtype))
        node_mask_p = jnp.zeros((m_pad,), bool).at[:m].set(node_mask)
        pair_mask_p = node_mask_p[:, None] & node_mask_p[None, :]
        ones_pv_p = jnp.ones((m_pad, 1), dtype)
        xt_p, xm_p = pack_points(x, x_mask)

        # Whole-EM loop kernel dispatch (r4): the entire tolerance loop in
        # one pallas_call unbatched; the per-iteration row-packed path under
        # vmap (see _em_loop_dispatch). Covers the product configurations
        # (solver "lu", fused_mstep off); diagnostic solvers and the
        # return_deltas scan keep the per-iteration loop below.
        if (
            axis_name is None
            and params.solver == "lu"
            and not params.use_fused_mstep
            and not return_deltas
        ):
            interpret = jax.default_backend() != "tpu"
            zeros_mm_p = jnp.zeros((m_pad, m_pad), dtype)
            zeros_m3_p = jnp.zeros((m_pad, 3), dtype)
            gate_f = jnp.where(vis_gate, 1.0, 0.0).astype(dtype)
            dyn = jnp.broadcast_to(
                jnp.stack(
                    [
                        jnp.asarray(sigma2, dtype),
                        v_count.astype(dtype),
                        n_safe,
                        gate_f,
                        jnp.zeros((), dtype),
                        jnp.zeros((), dtype),
                        jnp.zeros((), dtype),
                        jnp.zeros((), dtype),
                    ]
                )[:, None],
                (8, 128),
            )
            y_p_out, s2_out, iters, converged = _em_loop_dispatch(
                params, interpret
            )(
                dyn, y0_p, coord_p, nm_p, g_p,
                hg_p if params.include_lle else zeros_mm_p,
                hy0_p if params.include_lle else zeros_m3_p,
                jg_p if params.use_priors else zeros_mm_p,
                pd_p if params.use_priors else zeros_m3_p,
                xt_p, xm_p,
            )
            any_points = n_count > 0
            y_out = jnp.where(any_points, y_p_out[:m], y)
            s2_out = jnp.where(any_points, s2_out, sigma2)
            return CpdResult(
                y=y_out, sigma2=s2_out, converged=converged, iterations=iters
            )

    def _solve(a_mat, b_mat):
        if params.solver == "normal_cholesky":
            hp = jax.lax.Precision.HIGHEST
            ata = jnp.matmul(a_mat.T, a_mat, precision=hp)
            atb = jnp.matmul(a_mat.T, b_mat, precision=hp)
            l_chol = jnp.linalg.cholesky(ata)
            return jax.scipy.linalg.cho_solve((l_chol, True), atb)
        if params.solver == "lstsq":
            # COD-semantics solve (trackdlo.cpp:415), realized with
            # Householder QR (r5). The rank story (r4 finding, VERDICT r3
            # weak #4): any f32-scale rank cutoff TRUNCATES genuinely-
            # significant spectrum of the smooth MCT-kernel system —
            # cond(A)~4e6 in the weakly-regularized pre-proc pass — deleting
            # O(mm) of real signal (2.1 mm per solve). The f64 reference
            # COD's cutoff is at eps_f64 and never bites, so the faithful
            # f32 realization is a DIRECT solve through orthogonal factors —
            # which QR is, on every backend. The earlier SVD realization
            # (jnp.linalg.lstsq, rcond=1e-12) is equivalent in exact
            # arithmetic but lowers to QDWH on TPU, whose ~14% tail-sigma
            # error cost 3.6 mm per solve and stalled the tolerance loop at
            # max_iter (perf/lstsq_tpu_probe.json, docs/ALGORITHM.md round-5
            # lstsq entry); it survives as solver="svd_lstsq" below. The
            # shipped default solver is "lu" (the Gauss-Jordan kernel).
            return _solve_qr(a_mat, b_mat)
        if params.solver == "svd_lstsq":
            # Diagnostic: the SVD min-norm realization. rcond MUST be ~0
            # (see above); fine on CPU (LAPACK), diverges on TPU (QDWH).
            return jnp.linalg.lstsq(a_mat, b_mat, rcond=1e-12)[0]
        if params.solver == "xla_lu":
            # Diagnostic solver: force XLA's LU even where _solve_lu would
            # route to the Pallas Gauss-Jordan kernel (isolates M-step-solver
            # noise from E-step-kernel noise in trip-count studies,
            # perf/preem_noise_probe.py).
            return jnp.linalg.solve(a_mat, b_mat)
        if params.solver != "lu":
            raise ValueError(f"unknown solver {params.solver!r}")
        return _solve_lu(a_mat, b_mat)

    def em_iteration(y_cur, s2):
        sq_d = pairwise_sq_dists(y_cur, x)  # (M, N)

        # Nearest-point distance per node, zeroed within the visibility
        # threshold (trackdlo.cpp:279-296).
        sq_d_pts = jnp.where(x_mask[None, :], sq_d, _BIG)
        shortest = jnp.sqrt(pmin(jnp.min(sq_d_pts, axis=1)))
        shortest = jnp.where(shortest <= params.visibility_threshold, 0.0, shortest)

        # E-step (trackdlo.cpp:298-301).
        p = jnp.where(pair_valid, jnp.exp(-0.5 * sq_d / s2), 0.0)
        c_base = (_TWO_PI * s2) ** (d / 2) * params.mu / (1 - params.mu)
        c = c_base * v_count.astype(dtype) / n_safe
        p = p / (jnp.sum(p, axis=0, keepdims=True) + c)

        if params.use_geodesic_redistance:
            # Geodesic re-distancing (trackdlo.cpp:303-354).
            sq_geo = _geodesic_redistance(
                p, sq_d, y_cur, x, node_coord, node_mask, v_count
            )
            p = jnp.where(pair_valid, jnp.exp(-0.5 * sq_geo / s2), 0.0)

            # Visibility-aware membership prior (trackdlo.cpp:357-383).
            p_vis = jnp.where(node_mask, jnp.exp(-params.k_vis * shortest), 0.0)
            p_vis = p_vis / jnp.maximum(jnp.sum(p_vis), 1e-30)
            p_with_vis = p * p_vis[:, None]
            c_vis = c_base / n_safe
            p = jnp.where(vis_gate, p_with_vis, p)
            c_eff = jnp.where(vis_gate, c_vis, c)
            p = p / (jnp.sum(p, axis=0, keepdims=True) + c_eff)
            p = jnp.where(pair_valid, p, 0.0)

        pt1 = jnp.sum(p, axis=0)  # (N,) — per point, stays local
        p1 = psum(jnp.sum(p, axis=1))  # (M,) — over points
        np_total = jnp.sum(p1)
        px = psum(p @ x)  # (M, 3) — over points

        # M-step (trackdlo.cpp:392-415).
        a_mat = p1[:, None] * g + params.lam * s2 * eye
        b_mat = px - p1[:, None] * y0
        if params.include_lle:
            a_mat = a_mat + s2 * params.lle_weight * hg
            b_mat = b_mat - s2 * params.lle_weight * hy0
        if params.use_priors:
            a_mat = a_mat + params.alpha * jg
            b_mat = b_mat + params.alpha * prior_disp

        # Identity rows/zero rhs for padded nodes keep the solve well-posed
        # and their displacement exactly zero.
        a_mat = jnp.where(pair_mask, a_mat, eye)
        b_mat = jnp.where(node_mask[:, None], b_mat, 0.0)
        w = _solve(a_mat, b_mat)

        t = y0 + g @ w

        # σ² from traces (trackdlo.cpp:417-422).
        tr_xtdpt1x = psum(jnp.sum(pt1[:, None] * x * x))
        tr_pxtt = jnp.sum(px * t)  # px already global, t replicated
        tr_ttdp1t = jnp.sum(p1[:, None] * t * t)
        s2_new = (tr_xtdpt1x - 2 * tr_pxtt + tr_ttdp1t) / (np_total * d)
        # Robustness guard shared with the oracle (sigma2 <= 0 on noise-free
        # clouds would NaN the next E-step).
        s2_new = jnp.maximum(s2_new, 1e-10)

        # Convergence metric: sum of per-node displacement norms / M
        # (pt2pt_dis semantics, trackdlo.cpp:424).
        move = jnp.sum(jnp.where(node_mask, jnp.linalg.norm(y_cur - t, axis=1), 0.0))
        delta = move / jnp.maximum(v_count, 1)
        return t, s2_new, delta

    def em_iteration_pallas(y_cur, s2):
        """Single-kernel EM iteration: E-step tiles + in-register M-step
        (one-hot Gauss-Jordan solve) in one pallas_call; the (M, N) affinity
        never leaves VMEM (ops/pallas_kernels.py)."""
        from trackdlo_tpu.ops.pallas_kernels import fused_em_iteration

        interpret = jax.default_backend() != "tpu"
        c_base = (_TWO_PI * s2) ** (d / 2) * params.mu / (1 - params.mu)
        c = c_base * v_count.astype(dtype) / n_safe
        c_vis = c_base / n_safe
        gate_f = jnp.where(vis_gate, 1.0, 0.0).astype(dtype)

        zeros_mm = jnp.zeros((m, m), dtype)
        zeros_m3 = jnp.zeros((m, 3), dtype)
        t, s2_new, delta = fused_em_iteration(
            y_cur, y0, node_mask, node_coord,
            g,
            hg if params.include_lle else zeros_mm,
            hy0 if params.include_lle else zeros_m3,
            jg if params.use_priors else zeros_mm,
            prior_disp if params.use_priors else zeros_m3,
            x, x_mask,
            s2, c, c_vis, gate_f, v_count,
            k_vis=params.k_vis,
            tau_vis=params.visibility_threshold,
            lam=params.lam,
            coef_lle=params.lle_weight if params.include_lle else 0.0,
            alpha=params.alpha if params.use_priors else 0.0,
            interpret=interpret,
        )
        return t, s2_new, delta

    def em_iteration_pallas_sharded(y_cur, s2):
        """Fused-kernel iteration on the pre-staged (hoisted) padded arrays;
        under sharding the nearest-point distances cross shards via pmin."""
        from trackdlo_tpu.ops.pallas_kernels import nearest_point_sq

        interpret = jax.default_backend() != "tpu"
        c_base = (_TWO_PI * s2) ** (d / 2) * params.mu / (1 - params.mu)
        c = c_base * v_count.astype(dtype) / n_safe
        c_vis = c_base / n_safe

        needs_vis = params.use_visibility and params.k_vis != 0
        if needs_vis and axis_name is not None:
            # Sharded path: nearest distances need a cross-shard pmin, so the
            # visibility weights are derived outside the kernel.
            shortest = jnp.sqrt(
                pmin(nearest_point_sq(y_cur, node_mask, x, x_mask, interpret=interpret))
            )
            shortest = jnp.where(
                shortest <= params.visibility_threshold, 0.0, shortest
            )
            p_vis = jnp.where(node_mask, jnp.exp(-params.k_vis * shortest), 0.0)
            p_vis = p_vis / jnp.maximum(jnp.sum(p_vis), 1e-30)
            pvp = jnp.ones((m_pad, 1), dtype).at[:m, 0].set(p_vis)
            two_phase = False
        else:
            # Single-device path: the kernel derives the visibility prior
            # in-register from its own phase-0 min sweep — one kernel per
            # EM iteration.
            pvp = ones_pv_p
            two_phase = True

        from trackdlo_tpu.ops.pallas_kernels import estep_scalars, fused_estep_packed

        gate_f = jnp.where(vis_gate, 1.0, 0.0).astype(dtype)
        yp = jnp.zeros((m_pad, 3), dtype).at[:m].set(y_cur)
        scalars = estep_scalars(
            s2, c, c_vis, gate_f, v_count,
            params.k_vis, params.visibility_threshold, two_phase,
        )
        p1p, pxp, scal, _short = fused_estep_packed(
            scalars, yp, coord_p, nm_p, pvp, xt_p, xm_p,
            two_phase=two_phase, interpret=interpret,
        )
        p1p = psum(p1p)
        pxp = psum(pxp)
        np_total = psum(scal[0, 0])
        tr_xtdpt1x = psum(scal[0, 1])

        # M-step entirely in padded node space (zeros/identity pad rows keep
        # the solve well-posed; padded displacement stays zero).
        a_mat = p1p * g_p + params.lam * s2 * eye_p
        b_mat = pxp - p1p * y0_p
        if params.include_lle:
            a_mat = a_mat + s2 * params.lle_weight * hg_p
            b_mat = b_mat - s2 * params.lle_weight * hy0_p
        if params.use_priors:
            a_mat = a_mat + params.alpha * jg_p
            b_mat = b_mat + params.alpha * pd_p
        a_mat = jnp.where(pair_mask_p, a_mat, eye_p)
        b_mat = jnp.where(node_mask_p[:, None], b_mat, 0.0)
        w = _solve(a_mat, b_mat)
        t_p = y0_p + g_p @ w
        t = t_p[:m]

        tr_pxtt = jnp.sum(pxp * t_p)
        tr_ttdp1t = jnp.sum(p1p * t_p * t_p)
        s2_new = (tr_xtdpt1x - 2 * tr_pxtt + tr_ttdp1t) / (np_total * d)
        s2_new = jnp.maximum(s2_new, 1e-10)

        move = jnp.sum(jnp.where(node_mask, jnp.linalg.norm(y_cur - t, axis=1), 0.0))
        delta = move / jnp.maximum(v_count, 1)
        return t, s2_new, delta

    if use_pallas_path:
        if params.use_fused_mstep and axis_name is None:
            iteration = em_iteration_pallas
        else:
            iteration = em_iteration_pallas_sharded
    else:
        iteration = em_iteration

    def cond(carry):
        _, _, it, done, _ = carry
        return (~done) & (it < params.max_iter)

    def body(carry):
        y_cur, s2, it, _, _ = carry
        t, s2_new, delta = iteration(y_cur, s2)
        done = delta < params.tol
        converged = done | (it + 1 < params.max_iter)
        return t, s2_new, it + 1, done, converged

    if return_deltas:
        # Debug mode: run ALL max_iter iterations unconditionally (no early
        # stop) and record each iteration's convergence metric — exposes the
        # noise floor the tolerance loop stalls on. Output y differs from the
        # while-loop result by construction; diagnosis only.
        def scan_body(carry, _):
            y_cur, s2 = carry
            t, s2_new, delta = iteration(y_cur, s2)
            return (t, s2_new), delta

        (y_fin, s2_fin), deltas = jax.lax.scan(
            scan_body, (y, sigma2), None, length=params.max_iter
        )
        any_points = n_count > 0
        res = CpdResult(
            y=jnp.where(any_points, y_fin, y),
            sigma2=jnp.where(any_points, s2_fin, sigma2),
            converged=jnp.asarray(True),
            iterations=jnp.asarray(params.max_iter, jnp.int32),
        )
        return res, deltas

    init = (y, sigma2, jnp.asarray(0, jnp.int32), jnp.asarray(False), jnp.asarray(True))
    y_out, s2_out, iters, _, converged = jax.lax.while_loop(cond, body, init)

    # Degenerate input: no valid points at all → state unchanged.
    any_points = n_count > 0
    y_out = jnp.where(any_points, y_out, y)
    s2_out = jnp.where(any_points, s2_out, sigma2)

    return CpdResult(y=y_out, sigma2=s2_out, converged=converged, iterations=iters)

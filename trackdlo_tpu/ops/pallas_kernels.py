"""Pallas TPU kernels: the fused EM E-step.

The EM's per-iteration hot path materializes several (M, N) intermediates
(squared distances, two exponentiated affinity matrices, the geodesic
re-distance matrix — trackdlo.cpp:279-383). For dense clouds that is the
bandwidth bottleneck: each intermediate is an HBM round trip.

This kernel streams the point axis through VMEM in tiles and fuses the whole
E-step — distances → normalize → geodesic re-distance → visibility prior →
normalize → M-step reductions — emitting only the O(M) outputs:

    P1 (M,), PX (M, 3), Np, tr(Xᵀ diag(Pt1) X), and per-node nearest-point
    squared distance (populated only when the visibility gate is on in
    two-phase mode; otherwise the sweep is skipped and it stays at the 1e5
    sentinel).

P itself never exists in HBM. The column-wise normalizer makes the tiling
exact (each point's denominator is a within-tile column sum — the reason
blockwise accumulation works, SURVEY.md §5).

Layout: points are passed transposed (3, N) so the long axis sits on lanes;
M sits on sublanes padded to the f32 tile (8, 128) granularity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_BIG = 1e5
_TWO_PI = 6.283185307179586


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _first_argmax_rows(p: jnp.ndarray, m_pad: int) -> jnp.ndarray:
    """First row index attaining the column max (Eigen maxCoeff semantics,
    trackdlo.cpp:310), without gather ops: max + compare + min-index."""
    mx = jnp.max(p, axis=0, keepdims=True)
    rows = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
    return jnp.min(jnp.where(p == mx, rows, m_pad), axis=0)


def _select_row(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """values[(idx[j], j)] per column j via one-hot reduction (gathers along
    sublanes are not TPU-friendly)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, values.shape, 0)
    return jnp.sum(jnp.where(rows == idx[None, :], values, 0.0), axis=0)


def _estep_kernel(
    scalars_ref,  # VMEM (8, 128) broadcast rows: sigma2, c, c_vis, vis_gate,
    #              v_count, k_vis, tau_vis, two_phase. VMEM (not SMEM) so the
    #              kernel stays vmappable (batched SMEM blocks don't lower).
    y_ref,  # (m_pad, 3)
    coord_ref,  # (m_pad, 1) geodesic coords (masked-frozen)
    node_mask_ref,  # (m_pad, 1) f32 0/1
    p_vis_ref,  # (m_pad, 1) normalized visibility weights (1-phase mode)
    xt_ref,  # (3, T) tile of transposed points
    x_mask_ref,  # (1, T) f32 0/1
    flag_ref,  # (8, 128) broadcast: 1.0 iff this tile has any valid point
    p1_ref,  # out (m_pad, 1)
    px_ref,  # out (m_pad, 3)
    scal_out_ref,  # out (1, 2): np_total, tr_xtdpt1x
    short_ref,  # out (m_pad, 1): min squared node-point distance
):
    """Fused E-step tile. Grid is (phases, n_tiles):

    - two_phase=1: phase 0 streams the tiles once accumulating the per-node
      nearest-point distance into short_ref; phase 1 derives the visibility
      prior in-register from short_ref (exp(-k_vis d), trackdlo.cpp:357-372)
      and runs the full E-step. One kernel per EM iteration, nothing in HBM.
    - two_phase=0 (single phase in grid): p_vis comes in via p_vis_ref
      (the sharded path, where nearest distances need a cross-shard pmin).
    """
    phase = pl.program_id(0)
    t = pl.program_id(1)
    m_pad = y_ref.shape[0]

    sigma2 = scalars_ref[0, 0]
    c_plain = scalars_ref[1, 0]
    c_vis = scalars_ref[2, 0]
    vis_gate = scalars_ref[3, 0]
    v_count = scalars_ref[4, 0].astype(jnp.int32)
    k_vis = scalars_ref[5, 0]
    tau_vis = scalars_ref[6, 0]
    two_phase = scalars_ref[7, 0] > 0

    node_mask = node_mask_ref[:, 0]  # (m_pad,)
    x_mask = x_mask_ref[0, :]  # (T,)
    pair = node_mask[:, None] * x_mask[None, :]

    def tile_sq():
        # Squared distances (m_pad, T), VPU-exact.
        sq = jnp.zeros((m_pad, xt_ref.shape[1]), jnp.float32)
        for d in range(3):
            diff = y_ref[:, d][:, None] - xt_ref[d, :][None, :]
            sq += diff * diff
        return sq

    @pl.when((phase == 0) & (t == 0))
    def _init():
        p1_ref[:] = jnp.zeros_like(p1_ref)
        px_ref[:] = jnp.zeros_like(px_ref)
        scal_out_ref[:] = jnp.zeros_like(scal_out_ref)
        short_ref[:] = jnp.full_like(short_ref, _BIG)

    # Point sets are capacity-padded (max_points is a static bound; real
    # clouds fill a prefix) and the pre-EM prune empties further tiles — a
    # tile with no valid point contributes exactly zero to every output
    # (pair == 0 -> p == 0), so it is skipped at runtime.
    tile_live = flag_ref[0, 0] > 0

    # The phase-0 distance sweep only feeds the visibility prior
    # exp(-k_vis * shortest), which is inert when the gate is off (all or no
    # nodes visible, trackdlo.cpp:358 — the common fully-visible case), so
    # it is predicated on the gate and skipped at runtime otherwise.
    @pl.when((phase == 0) & (vis_gate > 0) & tile_live)
    def _accumulate_min():
        sq_masked = jnp.where(pair > 0, tile_sq(), _BIG)
        short_ref[:] = jnp.minimum(
            short_ref[:], jnp.min(sq_masked, axis=1, keepdims=True)
        )

    is_estep = jnp.logical_or(jnp.logical_not(two_phase), phase == 1)

    @pl.when(is_estep & tile_live)
    def _estep():
        _estep_tile(
            tile_sq(), pair, node_mask_ref[:], sigma2, c_plain, c_vis,
            vis_gate, v_count, k_vis, tau_vis, two_phase,
            y_ref, coord_ref, p_vis_ref, xt_ref,
            p1_ref, px_ref, scal_out_ref, short_ref,
            m_pad,
        )


def _estep_probabilities(
    sq, pair, coord, p_vis, sigma2, c_plain, c_vis, vis_gate, v_count, m_pad,
):
    """The pure E-step math on an in-register (m_pad, T) distance block:
    first normalization → geodesic re-distance → visibility prior → second
    normalization (trackdlo.cpp:298-383). Returns the final masked P.

    ``coord`` (m_pad,) geodesic coords; ``p_vis`` (m_pad,) normalized
    visibility weights. Shared by the per-tile streaming kernel
    (_estep_tile) and the whole-EM loop kernel (_em_loop_kernel)."""
    # First normalization (trackdlo.cpp:298-301).
    p = jnp.exp(-0.5 * sq / sigma2) * pair
    p = p / (jnp.sum(p, axis=0, keepdims=True) + c_plain)

    # Geodesic re-distance (trackdlo.cpp:303-351), fully in-register.
    mp = _first_argmax_rows(jnp.where(pair > 0, p, -1.0), m_pad)
    cand1 = jnp.where(mp - 1 == -1, 2, mp - 1)
    cand2 = jnp.where(mp + 1 == v_count, v_count - 3, mp + 1)
    sq_c1 = _select_row(sq, cand1)
    sq_c2 = _select_row(sq, cand2)
    nxt = jnp.where(sq_c1 < sq_c2, cand1, cand2)
    lo = jnp.minimum(mp, nxt)
    hi = jnp.maximum(mp, nxt)
    d_lo = jnp.sqrt(_select_row(sq, lo))
    d_hi = jnp.sqrt(_select_row(sq, hi))
    c_lo = _select_row(
        jnp.broadcast_to(coord[:, None], sq.shape), lo
    )
    c_hi = _select_row(
        jnp.broadcast_to(coord[:, None], sq.shape), hi
    )
    rows = jax.lax.broadcasted_iota(jnp.int32, sq.shape, 0)
    below = (jnp.abs(coord[:, None] - c_lo[None, :]) + d_lo[None, :]) ** 2
    above = (jnp.abs(coord[:, None] - c_hi[None, :]) + d_hi[None, :]) ** 2
    sq_geo = jnp.where(
        rows < lo[None, :],
        below,
        jnp.where(
            rows >= hi[None, :],
            above,
            jnp.where(rows == lo[None, :], (d_lo**2)[None, :], 0.0),
        ),
    )

    # Second pass + optional visibility prior (trackdlo.cpp:354-383).
    p = jnp.exp(-0.5 * sq_geo / sigma2) * pair
    p = p * (1.0 + vis_gate * (p_vis[:, None] - 1.0))
    c_eff = c_plain + vis_gate * (c_vis - c_plain)
    pt1_den = jnp.sum(p, axis=0, keepdims=True) + c_eff
    p = p / pt1_den
    return p * pair


def _estep_tile(
    sq, pair, node_mask_col, sigma2, c_plain, c_vis, vis_gate, v_count,
    k_vis, tau_vis, two_phase,
    y_ref, coord_ref, p_vis_ref, xt_ref,
    p1_ref, px_ref, scal_out_ref, short_ref,
    m_pad,
):
    # Visibility prior: derived in-register from the phase-0 minima
    # (two-phase), or taken from the host-provided p_vis_ref. All math stays
    # (m_pad, 1)-shaped: Mosaic only lowers sublane-axis reductions here.
    shortest2 = jnp.sqrt(short_ref[:])  # (m_pad, 1)
    shortest2 = jnp.where(shortest2 <= tau_vis, 0.0, shortest2)
    pv2 = jnp.where(node_mask_col > 0, jnp.exp(-k_vis * shortest2), 0.0)
    total = jnp.sum(pv2, axis=0, keepdims=True)  # (1, 1)
    pv2 = pv2 / jnp.maximum(total, 1e-30)
    p_vis = jnp.where(two_phase, pv2[:, 0], p_vis_ref[:, 0])

    p = _estep_probabilities(
        sq, pair, coord_ref[:, 0], p_vis, sigma2, c_plain, c_vis, vis_gate,
        v_count, m_pad,
    )

    # M-step reductions (trackdlo.cpp:386-390, 417-421).
    p1_ref[:] += jnp.sum(p, axis=1, keepdims=True)
    px_ref[:] += jax.lax.dot_general(
        p, xt_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pt1 = jnp.sum(p, axis=0)
    xsq = jnp.sum(xt_ref[:] * xt_ref[:], axis=0)
    # Full-block accumulate (scalar stores to VMEM are not supported).
    scal_out_ref[:] = scal_out_ref[:] + jnp.stack(
        [jnp.sum(pt1), jnp.sum(pt1 * xsq)]
    ).reshape(1, 2)


def _onehot_gauss_jordan(a, b, valid_col, m_pad):
    """Solve a @ w = b via Gauss-Jordan with one-hot row selection.

    Column pivoting by row selection (numerically equivalent to partial
    pivoting) expressed entirely in broadcast/compare/reduce ops — no
    sublane gathers or row swaps, which Mosaic cannot lower. ``valid_col``
    masks the active columns (padded rows of ``a`` must be identity).
    """
    lanes = jax.lax.broadcasted_iota(jnp.int32, (m_pad, m_pad), 1)
    subl = jax.lax.broadcasted_iota(jnp.int32, (m_pad, m_pad), 0)

    def step(k, carry):
        a_c, b_c, used, perm, diag = carry
        onehot_k = (lanes[0:1, :] == k).astype(jnp.float32)  # (1, m_pad)
        col = jnp.sum(a_c * onehot_k, axis=1)  # (m_pad,) column k
        cand = jnp.where(used > 0, -1.0, jnp.abs(col))
        r = jnp.argmax(cand)
        r_onehot = (jax.lax.broadcasted_iota(jnp.int32, (m_pad,), 0) == r).astype(
            jnp.float32
        )
        pivot_row_a = jnp.sum(r_onehot[:, None] * a_c, axis=0)  # (m_pad,)
        pivot_row_b = jnp.sum(r_onehot[:, None] * b_c, axis=0)  # (3,)
        pv = jnp.sum(r_onehot * col)
        pv_safe = jnp.where(pv == 0, 1.0, pv)
        factor = col / pv_safe * (1.0 - r_onehot)
        a_c = a_c - factor[:, None] * pivot_row_a[None, :]
        b_c = b_c - factor[:, None] * pivot_row_b[None, :]
        used = used + r_onehot
        # perm[k, r] = 1; diag[k] = pivot value (stable after this step).
        perm = perm + (subl == k).astype(jnp.float32) * r_onehot[None, :]
        diag = diag + pv * (jax.lax.broadcasted_iota(jnp.int32, (m_pad,), 0) == k)
        return a_c, b_c, used, perm, diag

    used0 = jnp.zeros((m_pad,), jnp.float32)
    perm0 = jnp.zeros((m_pad, m_pad), jnp.float32)
    diag0 = jnp.zeros((m_pad,), jnp.float32)
    a_f, b_f, _, perm, diag = jax.lax.fori_loop(
        0, m_pad, step, (a, b, used0, perm0, diag0)
    )
    # Exact extraction: perm is 0/1 (bf16-exact); split b_f into three bf16
    # pieces (exact f32) so Mosaic's bf16 MXU operand rounding cannot touch
    # the solution. Pieces ride as f32 (bf16-exact values) — see
    # _batched_gj_kernel for why not bf16 dtype.
    hi = b_f.astype(jnp.bfloat16)
    r1 = b_f - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    w = None
    for piece in (hi, mid, lo):
        term = jax.lax.dot_general(
            perm, piece.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        w = term if w is None else w + term
    diag_safe = jnp.where(jnp.abs(diag) < 1e-30, 1.0, diag)
    return w / diag_safe[:, None]


def _em_iteration_kernel(
    scalars_ref,  # VMEM (16, 128): rows as in fused_estep + lam, coef_lle, alpha
    y_ref,  # (m_pad, 3) current iterate (distances)
    y0_ref,  # (m_pad, 3) EM origin (M-step expands around it)
    coord_ref,
    node_mask_ref,
    g_ref,  # (m_pad, m_pad) kernel matrix
    hg_ref,  # (m_pad, m_pad) H @ G (zeros when include_lle off)
    hy0_ref,  # (m_pad, 3) H @ Y0
    jg_ref,  # (m_pad, m_pad) prior-selected rows of G (zeros when unused)
    prior_disp_ref,  # (m_pad, 3) alpha-term displacement
    xt_ref,
    x_mask_ref,
    t_ref,  # out (m_pad, 3) updated nodes
    stats_ref,  # out (1, 2): sigma2_new, delta
    p1_scr,  # scratch (m_pad, 1)
    px_scr,  # scratch (m_pad, 3)
    scal_scr,  # scratch (1, 2)
    short_scr,  # scratch (m_pad, 1)
):
    """One FULL EM iteration as a single kernel: grid (3, n_tiles).

    Phase 0 accumulates nearest-point distances; phase 1 runs the fused
    E-step over tiles; phase 2 (first tile only) assembles the M-step system
    (trackdlo.cpp:392-415), solves it in-register, updates the nodes, and
    computes the sigma2 trace update + convergence delta (417-424).
    """
    phase = pl.program_id(0)
    t = pl.program_id(1)
    m_pad = y_ref.shape[0]

    sigma2 = scalars_ref[0, 0]
    c_plain = scalars_ref[1, 0]
    c_vis = scalars_ref[2, 0]
    vis_gate = scalars_ref[3, 0]
    v_count = scalars_ref[4, 0].astype(jnp.int32)
    k_vis = scalars_ref[5, 0]
    tau_vis = scalars_ref[6, 0]
    lam = scalars_ref[8, 0]
    coef_lle = scalars_ref[9, 0]
    alpha = scalars_ref[10, 0]

    node_mask = node_mask_ref[:, 0]
    x_mask = x_mask_ref[0, :]
    pair = node_mask[:, None] * x_mask[None, :]

    @pl.when(phase < 2)
    def _stream_phases():
        sq = jnp.zeros((m_pad, xt_ref.shape[1]), jnp.float32)
        for d in range(3):
            diff = y_ref[:, d][:, None] - xt_ref[d, :][None, :]
            sq += diff * diff
        sq_masked = jnp.where(pair > 0, sq, _BIG)
        tile_min = jnp.min(sq_masked, axis=1, keepdims=True)

        @pl.when((phase == 0) & (t == 0))
        def _init():
            p1_scr[:] = jnp.zeros_like(p1_scr)
            px_scr[:] = jnp.zeros_like(px_scr)
            scal_scr[:] = jnp.zeros_like(scal_scr)
            short_scr[:] = jnp.full_like(short_scr, _BIG)

        @pl.when(phase == 0)
        def _accumulate_min():
            short_scr[:] = jnp.minimum(short_scr[:], tile_min)

        @pl.when(phase == 1)
        def _estep():
            _estep_tile(
                sq, pair, node_mask_ref[:], sigma2, c_plain, c_vis, vis_gate,
                v_count, k_vis, tau_vis, jnp.asarray(True),
                y_ref, coord_ref, p1_scr, xt_ref,  # p_vis_ref unused (two-phase)
                p1_scr, px_scr, scal_scr, short_scr,
                m_pad,
            )

    @pl.when((phase == 2) & (t == 0))
    def _mstep():
        p1 = p1_scr[:, 0]
        px = px_scr[:]
        g = g_ref[:]
        y0 = y0_ref[:]
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (m_pad, m_pad), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (m_pad, m_pad), 1)
        ).astype(jnp.float32)

        a = p1[:, None] * g + lam * sigma2 * eye
        a = a + sigma2 * coef_lle * hg_ref[:] + alpha * jg_ref[:]
        b = px - p1[:, None] * y0
        b = b - sigma2 * coef_lle * hy0_ref[:] + alpha * prior_disp_ref[:]
        # Padded nodes: identity rows / zero rhs (displacement stays zero).
        pair_nodes = node_mask[:, None] * node_mask[None, :]
        a = jnp.where(pair_nodes > 0, a, eye)
        b = b * node_mask[:, None]

        w = _onehot_gauss_jordan(a, b, node_mask, m_pad)
        t_new = y0 + jax.lax.dot_general(
            g, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t_new = jnp.where(node_mask[:, None] > 0, t_new, y0)
        t_ref[:] = t_new

        # sigma2 trace update (trackdlo.cpp:417-422).
        np_total = scal_scr[0, 0]
        tr_x = scal_scr[0, 1]
        tr_pxt = jnp.sum(px * t_new)
        tr_tt = jnp.sum(p1[:, None] * t_new * t_new)
        s2_new = (tr_x - 2.0 * tr_pxt + tr_tt) / jnp.maximum(np_total * 3.0, 1e-30)
        s2_new = jnp.maximum(s2_new, 1e-10)

        # Convergence delta (trackdlo.cpp:424).
        dm = t_new - y_ref[:]
        move2 = jnp.sum(dm * dm, axis=1, keepdims=True)
        move = jnp.sum(jnp.sqrt(move2) * node_mask_ref[:])
        delta = move / jnp.maximum(v_count.astype(jnp.float32), 1.0)
        stats_ref[:] = jnp.stack([s2_new, delta]).reshape(1, 2)


@functools.partial(
    jax.jit,
    static_argnames=("k_vis", "tau_vis", "lam", "coef_lle", "alpha", "tile_n", "interpret"),
)
def fused_em_iteration(
    y: jnp.ndarray,
    y0: jnp.ndarray,
    node_mask: jnp.ndarray,
    node_coord: jnp.ndarray,
    g: jnp.ndarray,  # (M, M)
    hg: jnp.ndarray,  # (M, M) or zeros
    hy0: jnp.ndarray,  # (M, 3) or zeros
    jg: jnp.ndarray,  # (M, M) or zeros
    prior_disp: jnp.ndarray,  # (M, 3) or zeros
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    sigma2: jnp.ndarray,
    c_plain: jnp.ndarray,
    c_vis: jnp.ndarray,
    vis_gate: jnp.ndarray,
    v_count: jnp.ndarray,
    k_vis: float = 0.0,
    tau_vis: float = 0.0,
    lam: float = 1.0,
    coef_lle: float = 0.0,
    alpha: float = 0.0,
    tile_n: int = 512,
    interpret: bool = False,
):
    """One full EM iteration in a single pallas_call.

    Returns (t (M, 3), sigma2_new, delta)."""
    m = y.shape[0]
    n = x.shape[0]
    m_pad = _round_up(m, 8)
    n_pad = _round_up(n, tile_n)

    def pad_mat(v, cols):
        return jnp.zeros((m_pad, cols), jnp.float32).at[:m, : v.shape[1]].set(v)

    yp = pad_mat(y, 3)
    y0p = pad_mat(y0, 3)
    coordp = jnp.zeros((m_pad, 1), jnp.float32).at[:m, 0].set(node_coord)
    nmp = jnp.zeros((m_pad, 1), jnp.float32).at[:m, 0].set(node_mask.astype(jnp.float32))
    gp = jnp.zeros((m_pad, m_pad), jnp.float32).at[:m, :m].set(g)
    hgp = jnp.zeros((m_pad, m_pad), jnp.float32).at[:m, :m].set(hg)
    hy0p = pad_mat(hy0, 3)
    jgp = jnp.zeros((m_pad, m_pad), jnp.float32).at[:m, :m].set(jg)
    pdp = pad_mat(prior_disp, 3)
    xt = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(x.T)
    xmp = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(x_mask.astype(jnp.float32))

    scalars = jnp.zeros((16,), jnp.float32)
    scalars = scalars.at[0].set(sigma2.astype(jnp.float32))
    scalars = scalars.at[1].set(c_plain.astype(jnp.float32))
    scalars = scalars.at[2].set(c_vis.astype(jnp.float32))
    scalars = scalars.at[3].set(vis_gate.astype(jnp.float32))
    scalars = scalars.at[4].set(v_count.astype(jnp.float32))
    scalars = scalars.at[5].set(k_vis)
    scalars = scalars.at[6].set(tau_vis)
    scalars = scalars.at[7].set(1.0)  # two_phase
    scalars = scalars.at[8].set(lam)
    scalars = scalars.at[9].set(coef_lle)
    scalars = scalars.at[10].set(alpha)
    scalars_b = jnp.broadcast_to(scalars[:, None], (16, 128))

    full = lambda p, i: (0, 0)
    tiled = lambda p, i: (0, i)
    t_out, stats = pl.pallas_call(
        _em_iteration_kernel,
        grid=(3, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((16, 128), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, m_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, m_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, m_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_n), tiled, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), tiled, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m_pad, 3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m_pad, 1), jnp.float32),
            pltpu.VMEM((m_pad, 3), jnp.float32),
            pltpu.VMEM((1, 2), jnp.float32),
            pltpu.VMEM((m_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(scalars_b, yp, y0p, coordp, nmp, gp, hgp, hy0p, jgp, pdp, xt, xmp)

    return t_out[:m], stats[0, 0], stats[0, 1]


def _nearest_kernel(y_ref, node_mask_ref, xt_ref, x_mask_ref, out_ref):
    t = pl.program_id(0)
    m_pad = y_ref.shape[0]
    node_mask = node_mask_ref[:, 0]
    x_mask = x_mask_ref[0, :]
    sq = jnp.zeros((m_pad, xt_ref.shape[1]), jnp.float32)
    for d in range(3):
        diff = y_ref[:, d][:, None] - xt_ref[d, :][None, :]
        sq += diff * diff
    sq = jnp.where((node_mask[:, None] * x_mask[None, :]) > 0, sq, _BIG)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, _BIG)

    out_ref[:] = jnp.minimum(out_ref[:], jnp.min(sq, axis=1, keepdims=True))


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def nearest_point_sq(
    y: jnp.ndarray,
    node_mask: jnp.ndarray,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    tile_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """(M,) min squared distance from each node to the masked point set —
    one streaming pass, nothing materialized (trackdlo.cpp:279-296)."""
    m = y.shape[0]
    n = x.shape[0]
    m_pad = _round_up(m, 8)
    n_pad = _round_up(n, tile_n)
    yp = jnp.zeros((m_pad, 3), jnp.float32).at[:m].set(y)
    nmp = jnp.zeros((m_pad, 1), jnp.float32).at[:m, 0].set(node_mask.astype(jnp.float32))
    xt = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(x.T)
    xmp = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(x_mask.astype(jnp.float32))
    out = pl.pallas_call(
        _nearest_kernel,
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((m_pad, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        interpret=interpret,
    )(yp, nmp, xt, xmp)
    return out[:m, 0]


@functools.partial(
    jax.jit,
    static_argnames=("k_vis", "tau_vis", "two_phase", "tile_n", "interpret"),
)
def fused_estep(
    y: jnp.ndarray,  # (M, 3)
    node_mask: jnp.ndarray,  # (M,) bool
    node_coord: jnp.ndarray,  # (M,)
    x: jnp.ndarray,  # (N, 3)
    x_mask: jnp.ndarray,  # (N,) bool
    sigma2: jnp.ndarray,
    c_plain: jnp.ndarray,
    c_vis: jnp.ndarray,
    vis_gate: jnp.ndarray,
    p_vis: jnp.ndarray | None,  # (M,) normalized weights (one-phase mode)
    v_count: jnp.ndarray,
    k_vis: float = 0.0,
    tau_vis: float = 0.0,
    two_phase: bool = False,
    tile_n: int = 512,
    interpret: bool = False,
):
    """Fused E-step: returns (p1 (M,), px (M,3), np_total, tr_xtdpt1x,
    shortest_sq (M,)).

    With ``two_phase`` the visibility prior is derived inside the kernel from
    a first min-distance sweep over the tiles (no separate nearest-point
    kernel, no host round of the weights); otherwise ``p_vis`` supplies the
    weights (required for the cross-shard pmin path).

    NOTE: ``shortest_sq`` is only populated when the visibility gate is on
    in two-phase mode; with the gate off the phase-0 sweep is skipped at
    runtime and the output stays at the 1e5 sentinel — do not consume it
    gate-off.
    """
    m = y.shape[0]
    m_pad = _round_up(m, 8)

    yp = jnp.zeros((m_pad, 3), jnp.float32).at[:m].set(y)
    coordp = jnp.zeros((m_pad, 1), jnp.float32).at[:m, 0].set(node_coord)
    nmp = jnp.zeros((m_pad, 1), jnp.float32).at[:m, 0].set(node_mask.astype(jnp.float32))
    if p_vis is None:
        p_vis = jnp.ones((m,), jnp.float32)
    pvp = jnp.ones((m_pad, 1), jnp.float32).at[:m, 0].set(p_vis)
    xt, xmp = pack_points(x, x_mask, tile_n)

    scalars = estep_scalars(
        sigma2, c_plain, c_vis, vis_gate, v_count, k_vis, tau_vis, two_phase
    )
    p1, px, scal, short = fused_estep_packed(
        scalars, yp, coordp, nmp, pvp, xt, xmp,
        two_phase=two_phase, tile_n=tile_n, interpret=interpret,
    )
    return (
        p1[:m, 0],
        px[:m],
        scal[0, 0],
        scal[0, 1],
        short[:m, 0],
    )


def pack_points(x, x_mask, tile_n: int = 512):
    """Transpose+pad the point set once (iteration-invariant; hoist out of
    EM loops — re-staging these per iteration costs more XLA ops than the
    kernel itself)."""
    n = x.shape[0]
    n_pad = _round_up(n, tile_n)
    xt = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(x.T)
    xmp = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(x_mask.astype(jnp.float32))
    return xt, xmp


def estep_scalars(sigma2, c_plain, c_vis, vis_gate, v_count, k_vis, tau_vis,
                  two_phase):
    return jnp.broadcast_to(
        jnp.stack(
            [
                sigma2.astype(jnp.float32),
                c_plain.astype(jnp.float32),
                c_vis.astype(jnp.float32),
                vis_gate.astype(jnp.float32),
                v_count.astype(jnp.float32),
                jnp.asarray(k_vis, jnp.float32),
                jnp.asarray(tau_vis, jnp.float32),
                jnp.asarray(1.0 if two_phase else 0.0, jnp.float32),
            ]
        )[:, None],
        (8, 128),
    )


def fused_estep_packed(
    scalars, yp, coordp, nmp, pvp, xt, xmp,
    two_phase: bool = False,
    tile_n: int = 512,
    interpret: bool = False,
):
    """fused_estep on pre-padded inputs; returns padded outputs
    (p1 (m_pad,1), px (m_pad,3), scal (1,2), short (m_pad,1)).

    NOTE: ``short`` is only populated when the visibility gate is on in
    two-phase mode; with the gate off the phase-0 sweep is skipped at
    runtime and ``short`` stays at the 1e5 sentinel.

    Under ``jax.vmap`` this routes to a row-packed batched kernel
    (``fused_estep_packed_batch``) that processes all B streams per grid
    step as (B, m_pad, T) slabs — instead of vmap's serialized grid — so
    batched EM cost amortizes the per-tile fixed cost across streams
    (VERDICT r2: b8 bought only +16% with the serialized grid)."""
    return _estep_cv(bool(two_phase), int(tile_n), bool(interpret))(
        scalars, yp, coordp, nmp, pvp, xt, xmp
    )


@functools.lru_cache(maxsize=None)
def _estep_cv(two_phase: bool, tile_n: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def f(scalars, yp, coordp, nmp, pvp, xt, xmp):
        return _fused_estep_packed_impl(
            scalars, yp, coordp, nmp, pvp, xt, xmp,
            two_phase=two_phase, tile_n=tile_n, interpret=interpret,
        )

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = tuple(
            a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        )
        outs = fused_estep_packed_batch(
            *args, two_phase=two_phase, tile_n=tile_n, interpret=interpret
        )
        return outs, (True, True, True, True)

    return f


@functools.partial(jax.jit, static_argnames=("two_phase", "tile_n", "interpret"))
def _fused_estep_packed_impl(
    scalars, yp, coordp, nmp, pvp, xt, xmp,
    two_phase: bool = False,
    tile_n: int = 512,
    interpret: bool = False,
):
    m_pad = yp.shape[0]
    n_pad = xt.shape[1]
    n_tiles = n_pad // tile_n
    grid = (2 if two_phase else 1, n_tiles)
    # Per-tile liveness: a tile with no valid point is skipped in-kernel.
    # (8, 128) broadcast blocks per tile — Mosaic requires the sublane block
    # dimension divisible by 8.
    tile_live = jnp.broadcast_to(
        jnp.max(xmp.reshape(n_tiles, tile_n), axis=1)[:, None, None],
        (n_tiles, 8, 128),
    ).reshape(n_tiles * 8, 128)
    p1, px, scal, short = pl.pallas_call(
        _estep_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 128), lambda p, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 3), lambda p, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda p, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda p, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda p, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_n), lambda p, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda p, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda p, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m_pad, 1), lambda p, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 3), lambda p, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda p, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda p, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, yp, coordp, nmp, pvp, xt, xmp, tile_live)
    return p1, px, scal, short


# ---------------------------------------------------------------------------
# Row-packed batched E-step.
#
# jax.vmap of a pallas_call serializes the batch over an extra grid dim, so
# at M=45 / tile 512 the per-grid-step fixed cost (staging, loop overhead)
# replays B times and batching buys almost nothing (BENCH_r02: b8 = +16%).
# This kernel instead processes all B streams per grid step as (B, m_pad, T)
# slabs: the VPU work vectorizes across the B*m_pad sublane rows exactly like
# gauss_jordan_solve_batched does for the solve. fused_estep_packed routes
# here under vmap via jax.custom_batching.custom_vmap.
# ---------------------------------------------------------------------------


def _estep_kernel_batch(two_phase: bool, scalars_ref, y_ref, coord_ref,
                        node_mask_ref, p_vis_ref, xt_ref, x_mask_ref,
                        flag_ref, gate_any_ref, inv_s2_ref,
                        p1_ref, px_ref, scal_out_ref, short_ref):
    """Batched fused E-step tile; shapes as in fused_estep_packed_batch.

    All math stays 3-D (B, m_pad, T) with per-stream scalars as (B, 1, 1)
    broadcasts; reductions run along sublanes (axis 1) or lanes (axis 2)
    within each slab, never across streams.
    """
    phase = pl.program_id(0)
    t = pl.program_id(1)
    bsz, m_pad, _ = y_ref.shape
    tile_t = xt_ref.shape[2]

    scal = scalars_ref[:]
    # Mosaic cannot broadcast (B,1,1) across sublanes AND lanes in one op
    # (and it elides an in-kernel broadcast_to), so the exp scale -0.5/sigma2
    # arrives pre-expanded to (B, m_pad, 1): the slab multiplies below then
    # only broadcast along lanes.
    neg_half_inv_s2 = inv_s2_ref[:]
    c_plain = scal[:, 1:2, 0:1]
    c_vis = scal[:, 2:3, 0:1]
    vis_gate = scal[:, 3:4, 0:1]
    v_count = scal[:, 4:5, 0:1].astype(jnp.int32)
    k_vis = scal[:, 5:6, 0:1]
    tau_vis = scal[:, 6:7, 0:1]

    node_mask = node_mask_ref[:]  # (B, m_pad, 1)
    x_mask = x_mask_ref[:]  # (B, 1, T)
    pair = node_mask * x_mask  # (B, m_pad, T)

    def tile_sq():
        sq = jnp.zeros((bsz, m_pad, tile_t), jnp.float32)
        for d in range(3):
            diff = y_ref[:, :, d : d + 1] - xt_ref[:, d : d + 1, :]
            sq += diff * diff
        return sq

    @pl.when((phase == 0) & (t == 0))
    def _init():
        p1_ref[:] = jnp.zeros_like(p1_ref)
        px_ref[:] = jnp.zeros_like(px_ref)
        scal_out_ref[:] = jnp.zeros_like(scal_out_ref)
        short_ref[:] = jnp.full_like(short_ref, _BIG)

    tile_live = flag_ref[0, 0] > 0  # any stream has a valid point in tile t
    gate_any = gate_any_ref[0, 0] > 0  # any stream's visibility gate is on

    if two_phase:

        @pl.when((phase == 0) & gate_any & tile_live)
        def _accumulate_min():
            sq_masked = jnp.where(pair > 0, tile_sq(), _BIG)
            short_ref[:] = jnp.minimum(
                short_ref[:], jnp.min(sq_masked, axis=2, keepdims=True)
            )

    is_estep = (phase == 1) if two_phase else (phase == 0)

    @pl.when(is_estep & tile_live)
    def _estep():
        sq = tile_sq()

        def first_argmax_rows(p):  # (B, m_pad, T) -> (B, 1, T)
            mx = jnp.max(p, axis=1, keepdims=True)
            rows = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
            return jnp.min(jnp.where(p == mx, rows, m_pad), axis=1, keepdims=True)

        def select_row(values, idx):  # (B,m_pad,T), (B,1,T) -> (B,1,T)
            rows = jax.lax.broadcasted_iota(jnp.int32, values.shape, 1)
            return jnp.sum(
                jnp.where(rows == idx, values, 0.0), axis=1, keepdims=True
            )

        # Visibility prior per stream (gate-off streams get an inert prior:
        # vis_gate multiplies it away below).
        if two_phase:
            shortest = jnp.sqrt(short_ref[:])  # (B, m_pad, 1)
            shortest = jnp.where(shortest <= tau_vis, 0.0, shortest)
            pv = jnp.where(node_mask > 0, jnp.exp(-k_vis * shortest), 0.0)
            pv = pv / jnp.maximum(jnp.sum(pv, axis=1, keepdims=True), 1e-30)
        else:
            pv = p_vis_ref[:]  # (B, m_pad, 1)

        # First normalization (trackdlo.cpp:298-301).
        p = jnp.exp(sq * neg_half_inv_s2) * pair
        p = p / (jnp.sum(p, axis=1, keepdims=True) + c_plain)

        # Geodesic re-distance (trackdlo.cpp:303-351).
        mp = first_argmax_rows(jnp.where(pair > 0, p, -1.0))
        cand1 = jnp.where(mp - 1 == -1, 2, mp - 1)
        cand2 = jnp.where(mp + 1 == v_count, v_count - 3, mp + 1)
        sq_c1 = select_row(sq, cand1)
        sq_c2 = select_row(sq, cand2)
        nxt = jnp.where(sq_c1 < sq_c2, cand1, cand2)
        lo = jnp.minimum(mp, nxt)
        hi = jnp.maximum(mp, nxt)
        d_lo = jnp.sqrt(select_row(sq, lo))
        d_hi = jnp.sqrt(select_row(sq, hi))
        coord = coord_ref[:]  # (B, m_pad, 1)
        coord_b = jnp.broadcast_to(coord, sq.shape)
        c_lo = select_row(coord_b, lo)
        c_hi = select_row(coord_b, hi)
        rows = jax.lax.broadcasted_iota(jnp.int32, sq.shape, 1)
        below = (jnp.abs(coord - c_lo) + d_lo) ** 2
        above = (jnp.abs(coord - c_hi) + d_hi) ** 2
        sq_geo = jnp.where(
            rows < lo,
            below,
            jnp.where(rows >= hi, above, jnp.where(rows == lo, d_lo**2, 0.0)),
        )

        # Second pass + visibility prior (trackdlo.cpp:354-383).
        p = jnp.exp(sq_geo * neg_half_inv_s2) * pair
        p = p * (1.0 + vis_gate * (pv - 1.0))
        c_eff = c_plain + vis_gate * (c_vis - c_plain)
        p = p / (jnp.sum(p, axis=1, keepdims=True) + c_eff)
        p = p * pair

        # M-step reductions — pure VPU (a batched Mosaic f32 dot would round
        # operands through bf16; three lane reductions are exact and cheap).
        p1_ref[:] += jnp.sum(p, axis=2, keepdims=True)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (bsz, m_pad, 3), 2)
        px_acc = jnp.zeros((bsz, m_pad, 3), jnp.float32)
        for d in range(3):
            s = jnp.sum(p * xt_ref[:, d : d + 1, :], axis=2, keepdims=True)
            px_acc += jnp.where(lane3 == d, s, 0.0)
        px_ref[:] += px_acc

        pt1 = jnp.sum(p, axis=1, keepdims=True)  # (B, 1, T)
        xsq = jnp.sum(xt_ref[:] * xt_ref[:], axis=1, keepdims=True)
        np_t = jnp.sum(pt1, axis=2, keepdims=True)  # (B, 1, 1)
        trx = jnp.sum(pt1 * xsq, axis=2, keepdims=True)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (bsz, 1, 2), 2)
        scal_out_ref[:] += jnp.where(lane2 == 0, np_t, trx)


@functools.partial(jax.jit, static_argnames=("two_phase", "tile_n", "interpret"))
def fused_estep_packed_batch(
    scalars,  # (B, 8, 128)
    yp,  # (B, m_pad, 3)
    coordp,  # (B, m_pad, 1)
    nmp,  # (B, m_pad, 1)
    pvp,  # (B, m_pad, 1)
    xt,  # (B, 3, n_pad)
    xmp,  # (B, 1, n_pad)
    two_phase: bool = False,
    tile_n: int = 512,
    interpret: bool = False,
):
    """Batched fused_estep_packed: all B streams per grid step.

    Returns (p1 (B,m_pad,1), px (B,m_pad,3), scal (B,1,2), short (B,m_pad,1));
    ``short`` carries the 1e5 sentinel when every stream's gate is off."""
    bsz, m_pad, _ = yp.shape
    n_pad = xt.shape[2]
    n_tiles = n_pad // tile_n
    grid = (2 if two_phase else 1, n_tiles)
    # Tile liveness across streams: skip a tile only when NO stream has a
    # valid point there (capacity padding is shared, so dead tails align).
    tile_live = jnp.broadcast_to(
        jnp.max(xmp.reshape(bsz, n_tiles, tile_n), axis=(0, 2))[:, None, None],
        (n_tiles, 8, 128),
    ).reshape(n_tiles * 8, 128)
    gate_any = jnp.broadcast_to(jnp.max(scalars[:, 3, 0]), (8, 128))
    inv_s2 = jnp.broadcast_to(
        -0.5 / scalars[:, 0:1, 0:1], (bsz, m_pad, 1)
    )

    full3 = lambda shape: pl.BlockSpec(shape, lambda p, i: (0, 0, 0), memory_space=pltpu.VMEM)
    p1, px, scal, short = pl.pallas_call(
        functools.partial(_estep_kernel_batch, two_phase),
        grid=grid,
        in_specs=[
            full3((bsz, 8, 128)),
            full3((bsz, m_pad, 3)),
            full3((bsz, m_pad, 1)),
            full3((bsz, m_pad, 1)),
            full3((bsz, m_pad, 1)),
            pl.BlockSpec((bsz, 3, tile_n), lambda p, i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, 1, tile_n), lambda p, i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda p, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda p, i: (0, 0), memory_space=pltpu.VMEM),
            full3((bsz, m_pad, 1)),
        ],
        out_specs=[
            full3((bsz, m_pad, 1)),
            full3((bsz, m_pad, 3)),
            full3((bsz, 1, 2)),
            full3((bsz, m_pad, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, m_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, 2), jnp.float32),
            jax.ShapeDtypeStruct((bsz, m_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, yp, coordp, nmp, pvp, xt, xmp, tile_live, gate_any, inv_s2)
    return p1, px, scal, short


# ---------------------------------------------------------------------------
# Batched M-step solve.
#
# jnp.linalg.solve on (B, 48, 48) lowers to batch-SEQUENTIAL LU on TPU
# (~17 us per matrix — ~80% of per-iteration EM cost at batch 8,
# perf notes r2). This kernel runs ALL B Gauss-Jordan eliminations in one
# 48-step loop: the one-hot row ops vectorize across the batch, so 8 solves
# cost barely more than one. Exposed through jax.custom_batching.custom_vmap
# (solve_mstep) so the EM under jax.vmap routes here instead of serializing.
# ---------------------------------------------------------------------------


def _batched_gj_kernel(ab_ref, w_ref, inv_ref):
    """ab (B, m_pad, 2*m_pad + k_pad) = [A | I | B] -> w (B, m_pad, k_pad)
    and inv (B, m_pad, m_pad); Gauss-Jordan with one-hot partial pivoting,
    batch on the leading (untiled) axis.

    The identity block and the rhs ride as extra lanes of A so one row
    update eliminates all three; the I block becomes A^-1 (up to the row
    permutation / pivot scaling), returned for the caller's iterative
    refinement. The elimination is pure VPU (exact f32). The solution rows
    are extracted with the 0/1 permutation matrix accumulated during
    pivoting — NOT the earlier a_f^T b_f trick, whose Mosaic dot rounded
    both operands through bf16 (~1e-4 relative solve error, enough to stall
    the EM's tolerance exit). perm is 0/1 (bf16-exact) and b_f splits into
    three bf16 pieces (exact f32), so the extraction dot is exact."""
    ab = ab_ref[:]
    bsz, m_pad, mk = ab.shape
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bsz, m_pad, mk), 2)
    lane_row = lanes[:, 0:1, :]  # (B, 1, mk)
    subl_col = jax.lax.broadcasted_iota(jnp.int32, (bsz, m_pad, 1), 1)

    def step(k, carry):
        ab_c, used, perm, diag = carry
        onehot_k = (lanes == k).astype(jnp.float32)  # (B, m_pad, mk)
        col = jnp.sum(ab_c * onehot_k, axis=2, keepdims=True)  # (B, m_pad, 1)
        cand = jnp.where(used > 0, -1.0, jnp.abs(col))  # (B, m_pad, 1)
        cmax = jnp.max(cand, axis=1, keepdims=True)  # (B, 1, 1)
        # First max (stable tie-break): smallest sublane index among maxima.
        ridx = jnp.min(
            jnp.where(cand == cmax, subl_col, m_pad), axis=1, keepdims=True
        )  # (B, 1, 1)
        r_onehot = (subl_col == ridx).astype(jnp.float32)  # (B, m_pad, 1)
        pivot_row = jnp.sum(r_onehot * ab_c, axis=1, keepdims=True)
        pv = jnp.sum(r_onehot * col, axis=1, keepdims=True)  # (B, 1, 1)
        pv_safe = jnp.where(pv == 0, 1.0, pv)
        factor = col / pv_safe * (1.0 - r_onehot)  # (B, m_pad, 1)
        ab_c = ab_c - factor * pivot_row
        used = used + r_onehot
        # perm[b, k, r_k] = 1 (k on sublanes, pivot row on lanes).
        perm = perm + (subl_col == k).astype(jnp.float32) * (
            lane_row == ridx
        ).astype(jnp.float32)
        diag = diag + pv * (subl_col == k).astype(jnp.float32)  # k-indexed
        return ab_c, used, perm, diag

    used0 = jnp.zeros((bsz, m_pad, 1), jnp.float32)
    perm0 = jnp.zeros((bsz, m_pad, mk), jnp.float32)
    diag0 = jnp.zeros((bsz, m_pad, 1), jnp.float32)
    ab_f, _, perm, diag = jax.lax.fori_loop(
        0, m_pad, step, (ab, used0, perm0, diag0)
    )
    diag_safe = jnp.where(jnp.abs(diag) < 1e-30, 1.0, diag)
    dims = (((2,), (1,)), ((0,), (0,)))
    perm_m = perm[:, :, :m_pad]

    # Exact w extraction: w[b, k, :] = b_f[b, r_k, :] / pv_k. Mosaic rejects
    # BATCHED bf16 dots ("Bad lhs type"), so the three split pieces are cast
    # back to f32: the values stay bf16-exact, making the f32 lowering's
    # internal bf16 operand rounding lossless.
    b_f = ab_f[:, :, 2 * m_pad:]
    hi = b_f.astype(jnp.bfloat16)
    r1 = b_f - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    w = None
    for piece in (hi, mid, lo):
        term = jax.lax.dot_general(
            perm_m, piece.astype(jnp.float32), dims,
            preferred_element_type=jnp.float32,
        )
        w = term if w is None else w + term
    w_ref[:] = w / diag_safe

    # A^-1 extraction (refinement-grade: bf16 operand rounding of the plain
    # f32 dot is fine here — the inverse only multiplies a small residual).
    i_f = ab_f[:, :, m_pad:2 * m_pad]
    inv = jax.lax.dot_general(
        perm_m, i_f, dims, preferred_element_type=jnp.float32
    )
    inv_ref[:] = inv / diag_safe


@functools.partial(jax.jit, static_argnames=("interpret", "refine"))
def gauss_jordan_solve_batched(a, b, interpret: bool = False, refine: int = 3):
    """(B, m, m) @ w = (B, m, k) for all B systems in one kernel.

    ``refine``: number of iterative-refinement steps (w += A^-1 (b - A w)
    with the in-kernel inverse, residual at f32-faithful precision; False/0
    disables). Each step contracts the forward error by ~cond(A)·u_f32 —
    ~3× on the worst EM M-step systems (cond ~4e6 in the collapsed-σ²
    pre-registration pass) — so THREE steps are needed to push the
    per-iteration Y noise below the reference's tolerance (measured on a
    stalling frame: tail delta 3.8e-4 / 1.3e-4 / 0.9e-4 for 1/2/3 steps vs
    tol 2e-4, perf/preem_noise_probe.py); on benign systems one step
    already reaches ~1e-7 absolute. Tolerance-based EM loops then converge
    by the true dynamics instead of stalling on solver noise (the f64 COD
    of trackdlo.cpp:415 never had this problem; f32 solvers do). Cost: two
    (m,m)@(m,k) HIGHEST-precision matmuls per step — O(µs) against the
    ~20 µs EM iterations each stalled trip would burn.

    Rows are equilibrated by powers of two before elimination (r4): the
    pre-registration M-step's row scales span ~7 decades once sigma2
    collapses (A = diag(p1)·G + sigma2(...) with p1 ~ 1e-5..1e2), and
    partial pivoting alone then loses ~3 digits — enough per-iteration Y
    noise (~1e-3) to stall the tolerance loop at max_iter where f64 needs
    ~6 trips (perf/preem_noise_probe.py: ship tail delta 9.7e-4 vs XLA
    LU's 1.0e-4 vs tol 2e-4). Power-of-two scaling is EXACT (exponent-only;
    solution algebraically identical), and the refinement residual uses the
    unscaled system. The kernel's inverse is then (E^-1 A)^-1 = A^-1 E, so
    the refinement correction is inv @ (r / e)."""
    bsz, m, k = b.shape
    m_pad = _round_up(m, 8)
    k_pad = 4 if k <= 4 else _round_up(k, 4)
    d = jnp.max(jnp.abs(a), axis=2, keepdims=True)  # (B, m, 1)
    e = jnp.exp2(jnp.ceil(jnp.log2(jnp.where(d > 0, d, 1.0))))
    a_s = a / e
    b_s = b / e
    ab = jnp.zeros((bsz, m_pad, 2 * m_pad + k_pad), jnp.float32)
    ab = ab.at[:, :m, :m].set(a_s)
    # Identity rows for padded equations keep the elimination well-posed.
    pad_iota = jnp.arange(m_pad)
    eye_pad = (pad_iota[:, None] == pad_iota[None, :]).astype(jnp.float32)
    ab = ab.at[:, :, :m_pad].add(
        jnp.where(pad_iota[:, None] >= m, eye_pad, 0.0)
    )
    ab = ab.at[:, :, m_pad:2 * m_pad].set(eye_pad)
    ab = ab.at[:, :m, 2 * m_pad:2 * m_pad + k].set(b_s)
    w1, inv = pl.pallas_call(
        _batched_gj_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, m_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((bsz, m_pad, m_pad), jnp.float32),
        ],
        interpret=interpret,
    )(ab)
    w = w1[:, :m, :k]
    hp = jax.lax.Precision.HIGHEST
    for _ in range(int(refine)):
        r = (b - jnp.matmul(a, w, precision=hp)) / e
        w = w + jnp.matmul(inv[:, :m, :m], r, precision=hp)
    return w


# ---------------------------------------------------------------------------
# Whole-EM loop kernel (r4).
#
# The per-iteration path costs ~21.5 us/EM-iteration in-context: two kernel
# launches (fused E-step + batched GJ solve) plus the XLA M-step assembly /
# trace-update glue between them, replayed by a lax.while_loop ~11 times per
# frame across the two EM passes. This kernel runs the ENTIRE tolerance loop
# — E-step, M-step assembly, equilibrated Gauss-Jordan solve with iterative
# refinement, sigma2 trace update, convergence test — inside ONE pallas_call
# with a jax.lax.while_loop in-kernel: zero per-iteration launches, zero
# HBM round trips (everything lives in VMEM; at the shipped sizes the full
# (m_pad, n_pad) affinity block is only ~400 KB).
#
# Unbatched single-stream only: under jax.vmap the row-packed per-iteration
# path already amortizes launches across streams, so the cpd_lle dispatch
# (custom_vmap) routes batched streams there and single streams here.
# ---------------------------------------------------------------------------


def _exact_dot(a, b):
    """a @ b with BOTH operands 3-way bf16-split: 9 exact-piece passes with
    f32 accumulation — immune to Mosaic's bf16 operand rounding regardless
    of the traced matmul precision. Used where cancellation matters (the
    refinement residual) and for the node update g @ w."""

    def split3(v):
        hi = v.astype(jnp.bfloat16)
        r1 = v - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, mid, lo

    out = None
    for pa in split3(a):
        for pb in split3(b):
            term = jax.lax.dot_general(
                pa, pb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            out = term if out is None else out + term
    return out


def _gj2d_with_inv(a, b, m_pad, k_pad):
    """Gauss-Jordan solve of a @ w = b (2-D, single system) returning
    (w (m_pad, k_pad), inv (m_pad, m_pad)). The _batched_gj_kernel loop with
    the batch axis dropped: [A | I | B] augmented lanes, one-hot partial
    pivoting, exact split-piece solution extraction, refinement-grade
    inverse extraction. ``a`` rows for padded nodes must be identity."""
    mk = 2 * m_pad + k_pad
    ab = jnp.concatenate(
        [a, jnp.eye(m_pad, dtype=jnp.float32), b], axis=1
    )  # (m_pad, mk)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (m_pad, mk), 1)
    lane_row = lanes[0:1, :]
    subl_col = jax.lax.broadcasted_iota(jnp.int32, (m_pad, 1), 0)

    def step(k, carry):
        ab_c, used, perm, diag = carry
        onehot_k = (lanes == k).astype(jnp.float32)
        col = jnp.sum(ab_c * onehot_k, axis=1, keepdims=True)  # (m_pad, 1)
        cand = jnp.where(used > 0, -1.0, jnp.abs(col))
        cmax = jnp.max(cand, axis=0, keepdims=True)
        ridx = jnp.min(
            jnp.where(cand == cmax, subl_col, m_pad), axis=0, keepdims=True
        )
        r_onehot = (subl_col == ridx).astype(jnp.float32)  # (m_pad, 1)
        pivot_row = jnp.sum(r_onehot * ab_c, axis=0, keepdims=True)
        pv = jnp.sum(r_onehot * col, axis=0, keepdims=True)
        pv_safe = jnp.where(pv == 0, 1.0, pv)
        factor = col / pv_safe * (1.0 - r_onehot)
        ab_c = ab_c - factor * pivot_row
        used = used + r_onehot
        perm = perm + (subl_col == k).astype(jnp.float32) * (
            lane_row == ridx
        ).astype(jnp.float32)
        diag = diag + pv * (subl_col == k).astype(jnp.float32)
        return ab_c, used, perm, diag

    used0 = jnp.zeros((m_pad, 1), jnp.float32)
    perm0 = jnp.zeros((m_pad, mk), jnp.float32)
    diag0 = jnp.zeros((m_pad, 1), jnp.float32)
    ab_f, _, perm, diag = jax.lax.fori_loop(
        0, m_pad, step, (ab, used0, perm0, diag0)
    )
    diag_safe = jnp.where(jnp.abs(diag) < 1e-30, 1.0, diag)
    perm_m = perm[:, :m_pad]

    # Exact solution extraction: perm is 0/1 (bf16-exact), b_f splits into
    # three exact bf16 pieces (see _batched_gj_kernel).
    b_f = ab_f[:, 2 * m_pad:]
    hi = b_f.astype(jnp.bfloat16)
    r1 = b_f - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    w = None
    for piece in (hi, mid, lo):
        term = jax.lax.dot_general(
            perm_m, piece.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        w = term if w is None else w + term
    w = w / diag_safe

    i_f = ab_f[:, m_pad:2 * m_pad]
    inv = jax.lax.dot_general(
        perm_m, i_f, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return w, inv / diag_safe


def _em_loop_kernel(
    refine,
    k_vis,
    tau_vis,
    lam,
    coef_lle,
    alpha,
    tol,
    max_iter,
    scalars_ref,  # (8, 128) broadcast rows, see fused_em_loop
    y0_ref,  # (m_pad, 3) EM origin (= initial iterate, trackdlo.cpp:925)
    coord_ref,  # (m_pad, 1)
    nm_ref,  # (m_pad, 1) f32 0/1
    g_ref,  # (m_pad, m_pad)
    hg_ref,  # (m_pad, m_pad) H @ G (zeros when include_lle off)
    hy0_ref,  # (m_pad, 3)
    jg_ref,  # (m_pad, m_pad) prior rows of G (zeros when unused)
    pd_ref,  # (m_pad, 3) prior displacement
    xt_ref,  # (3, n_pad)
    xm_ref,  # (1, n_pad) f32 0/1
    y_out_ref,  # out (m_pad, 3)
    stats_ref,  # out (1, 8): sigma2, iterations, converged, delta
):
    m_pad = y0_ref.shape[0]
    k_pad = 4

    s2_init = scalars_ref[0, 0]
    kc_v = scalars_ref[1, 0]  # c_plain = kc_v * (2*pi*s2)^(3/2)
    kc_n = scalars_ref[2, 0]  # c_vis  = kc_n * (2*pi*s2)^(3/2)
    vis_gate = scalars_ref[3, 0]
    v_count = scalars_ref[4, 0].astype(jnp.int32)

    node_mask = nm_ref[:, 0]
    nm_col = nm_ref[:]
    x_mask = xm_ref[0, :]
    pair = node_mask[:, None] * x_mask[None, :]
    pair_nodes = node_mask[:, None] * node_mask[None, :]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (m_pad, m_pad), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (m_pad, m_pad), 1)
    ).astype(jnp.float32)
    coord = coord_ref[:, 0]
    y0 = y0_ref[:]
    g = g_ref[:]
    xt = xt_ref[:]
    xsq = jnp.sum(xt * xt, axis=0)  # (n_pad,)
    vcf = jnp.maximum(v_count.astype(jnp.float32), 1.0)

    def cond(carry):
        _, _, it, done, _, _ = carry
        return jnp.logical_and(jnp.logical_not(done), it < max_iter)

    def body(carry):
        y_cur, s2, it, _, _, _ = carry

        # Per-iteration normalizer constants (trackdlo.cpp:298: the XLA twin
        # computes (2*pi*s2)^{3/2} via pow; x*sqrt(x) matches to ~1 ulp).
        tps = _TWO_PI * s2
        c_core = tps * jnp.sqrt(tps)
        c_plain = kc_v * c_core
        c_vis = kc_n * c_core

        sq = jnp.zeros((m_pad, xt.shape[1]), jnp.float32)
        for d in range(3):
            diff = y_cur[:, d][:, None] - xt[d, :][None, :]
            sq += diff * diff

        # Visibility prior from the same in-register distances
        # (trackdlo.cpp:279-296; the streaming kernel needs a separate
        # phase-0 sweep for this — here sq is already whole).
        short = jnp.min(
            jnp.where(pair > 0, sq, _BIG), axis=1, keepdims=True
        )  # (m_pad, 1)
        shortest = jnp.sqrt(short)
        shortest = jnp.where(shortest <= tau_vis, 0.0, shortest)
        pv = jnp.where(nm_col > 0, jnp.exp(-k_vis * shortest), 0.0)
        pv = pv / jnp.maximum(jnp.sum(pv, axis=0, keepdims=True), 1e-30)

        p = _estep_probabilities(
            sq, pair, coord, pv[:, 0], s2, c_plain, c_vis, vis_gate,
            v_count, m_pad,
        )

        p1 = jnp.sum(p, axis=1, keepdims=True)  # (m_pad, 1)
        px = jax.lax.dot_general(
            p, xt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (m_pad, 3)
        pt1 = jnp.sum(p, axis=0)  # (n_pad,)
        np_total = jnp.sum(pt1)
        tr_x = jnp.sum(pt1 * xsq)

        # M-step system (trackdlo.cpp:392-415).
        a = p1 * g + lam * s2 * eye
        a = a + s2 * coef_lle * hg_ref[:] + alpha * jg_ref[:]
        b = px - p1 * y0
        b = b - s2 * coef_lle * hy0_ref[:] + alpha * pd_ref[:]
        a = jnp.where(pair_nodes > 0, a, eye)
        b = b * nm_col
        bp = jnp.concatenate(
            [b, jnp.zeros((m_pad, k_pad - 3), jnp.float32)], axis=1
        )

        # Power-of-two row equilibration via exponent bits (exact — see
        # gauss_jordan_solve_batched; exp2(ceil(log2 d)) up to one factor
        # of 2, which equilibration does not care about).
        d_row = jnp.max(jnp.abs(a), axis=1, keepdims=True)
        d_safe = jnp.where(d_row > 0, d_row, 1.0)
        ebits = (
            jax.lax.bitcast_convert_type(d_safe, jnp.int32) >> 23
        ) & 255
        e = jax.lax.bitcast_convert_type((ebits + 1) << 23, jnp.float32)
        w, inv = _gj2d_with_inv(a / e, bp / e, m_pad, k_pad)

        # Iterative refinement at exact-split precision (the residual is a
        # catastrophic cancellation — Mosaic's bf16 operand rounding in a
        # plain f32 dot would swamp it; see gauss_jordan_solve_batched).
        for _ in range(refine):
            r = (bp - _exact_dot(a, w)) / e
            w = w + jax.lax.dot_general(
                inv, r, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        t_new = y0 + _exact_dot(g, w[:, :3])
        t_new = jnp.where(nm_col > 0, t_new, y0)

        # sigma2 trace update (trackdlo.cpp:417-422).
        tr_pxt = jnp.sum(px * t_new)
        tr_tt = jnp.sum(p1 * t_new * t_new)
        s2_new = (tr_x - 2.0 * tr_pxt + tr_tt) / jnp.maximum(
            np_total * 3.0, 1e-30
        )
        s2_new = jnp.maximum(s2_new, 1e-10)

        # Convergence metric (trackdlo.cpp:424).
        dm = t_new - y_cur
        move = jnp.sum(
            jnp.sqrt(jnp.sum(dm * dm, axis=1, keepdims=True)) * nm_col
        )
        delta = move / vcf
        done = delta < tol
        converged = jnp.logical_or(done, it + 1 < max_iter)
        return t_new, s2_new, it + 1, done, converged, delta

    init = (
        y0, s2_init, jnp.int32(0), False, True, jnp.float32(0.0),
    )
    y_fin, s2_fin, iters, _, conv, delta = jax.lax.while_loop(
        cond, body, init
    )
    y_out_ref[:] = y_fin
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    stats = jnp.where(lane8 == 0, s2_fin, 0.0)
    stats = jnp.where(lane8 == 1, iters.astype(jnp.float32), stats)
    stats = jnp.where(
        lane8 == 2, jnp.where(conv, 1.0, 0.0), stats
    )
    stats = jnp.where(lane8 == 3, delta, stats)
    stats_ref[:] = stats


def fused_em_loop(
    scalars,  # (8, 128) broadcast block (see below)
    y0p,  # (m_pad, 3)
    coordp,  # (m_pad, 1)
    nmp,  # (m_pad, 1) f32
    gp,  # (m_pad, m_pad)
    hgp,
    hy0p,
    jgp,
    pdp,
    xt,  # (3, n_pad)
    xmp,  # (1, n_pad)
    k_vis: float = 0.0,
    tau_vis: float = 0.0,
    lam: float = 1.0,
    coef_lle: float = 0.0,
    alpha: float = 0.0,
    tol: float = 1e-4,
    max_iter: int = 50,
    refine: int = 3,
    interpret: bool = False,
):
    """Whole tolerance-EM loop in one pallas_call on pre-padded staging.

    scalars rows (the traced per-frame values; everything else is a
    trace-time constant baked into the kernel): [0]=sigma2_init, [1]=kc_v,
    [2]=kc_n ( c_plain/c_vis = kc * (2*pi*s2)^{3/2} ), [3]=vis_gate,
    [4]=v_count.

    Returns (y (m_pad, 3), stats (1, 8) = [sigma2, iterations, converged,
    delta, 0...])."""
    m_pad = y0p.shape[0]
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    y_out, stats = pl.pallas_call(
        functools.partial(
            _em_loop_kernel, int(refine), float(k_vis), float(tau_vis),
            float(lam), float(coef_lle), float(alpha), float(tol),
            int(max_iter),
        ),
        in_specs=[full()] * 11,
        out_specs=[full(), full()],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, y0p, coordp, nmp, gp, hgp, hy0p, jgp, pdp, xt, xmp)
    return y_out, stats


# ---------------------------------------------------------------------------
# Fused correspondence-prior walks.
#
# The four pure-pursuit walks (ops/priors.pursuit_walk) are sequential scans
# of M-1 steps whose XLA loop body costs ~3.4 us/step on TPU (multiple
# fusions per iteration) — ~150 us/frame. This kernel runs all four walks'
# full loops in-register: walks on sublane rows 0-3, segments/nodes on
# lanes, one fori_loop — no per-step kernel boundaries.
# ---------------------------------------------------------------------------


def _walks_kernel(m_int, eps,
                  ax_ref, ay_ref, az_ref, bx_ref, by_ref, bz_ref, seglen_ref,
                  anchor_ref,  # (8, 128): lanes 0-2 = anchor xyz per walk row
                  scal_ref,  # (8, 128): lanes 0..4 = start_guide, seg_hi,
                  #            outer_hi, start_node, count (per walk row)
                  ox_ref, oy_ref, oz_ref, ov_ref):
    m = float(m_int)
    rows, width = ax_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    lane_f = lane.astype(jnp.float32)

    def lanesel(arr, idx):
        """arr[(w, idx[w])] -> (rows, 1) via one-hot reduce (idx (rows,1))."""
        return jnp.sum(
            jnp.where(lane_f == idx, arr, 0.0), axis=1, keepdims=True
        )

    # Segment s endpoints (host-shifted: a = guide[:-1], b = guide[1:]).
    ax, ay, az = ax_ref[:], ay_ref[:], az_ref[:]
    bx, by, bz = bx_ref[:], by_ref[:], bz_ref[:]

    abx, aby, abz = bx - ax, by - ay, bz - az
    qa = abx * abx + aby * aby + abz * abz
    qb0 = 2.0 * (abx * ax + aby * ay + abz * az)
    aa0 = ax * ax + ay * ay + az * az
    lox, hix = jnp.minimum(ax, bx) - eps, jnp.maximum(ax, bx) + eps
    loy, hiy = jnp.minimum(ay, by) - eps, jnp.maximum(ay, by) + eps
    loz, hiz = jnp.minimum(az, bz) - eps, jnp.maximum(az, bz) + eps

    startg = scal_ref[:, 0:1]
    seghi = scal_ref[:, 1:2]
    outerhi = scal_ref[:, 2:3]
    startnode = scal_ref[:, 3:4]
    count = scal_ref[:, 4:5]
    seg_exists = (lane_f < count - 1.0).astype(jnp.float32)

    cx0 = anchor_ref[:, 0:1]
    cy0 = anchor_ref[:, 1:2]
    cz0 = anchor_ref[:, 2:3]

    anchor_oh = (lane_f == startnode).astype(jnp.float32)
    ox = anchor_oh * cx0
    oy = anchor_oh * cy0
    oz = anchor_oh * cz0
    ov = anchor_oh

    def step(_, carry):
        last_found, node_pos, cx, cy, cz, alive, ox, oy, oz, ov = carry
        alive_t = alive * (last_found <= outerhi).astype(jnp.float32) * (
            node_pos + 1.0 <= m - 1.0
        ).astype(jnp.float32)
        look = lanesel(seglen_ref[:], jnp.clip(node_pos, 0.0, m - 2.0))

        qb = qb0 - 2.0 * (abx * cx + aby * cy + abz * cz)
        qc = aa0 - 2.0 * (ax * cx + ay * cy + az * cz) + (
            cx * cx + cy * cy + cz * cz
        ) - look * look
        delta = qb * qb - 4.0 * qa * qc
        sq = jnp.sqrt(jnp.maximum(delta, 0.0))
        qa_s = jnp.where(qa == 0.0, 1.0, qa)
        d1 = (-qb + sq) / (2.0 * qa_s)
        d2 = (-qb - sq) / (2.0 * qa_s)
        p1x, p1y, p1z = ax + d1 * abx, ay + d1 * aby, az + d1 * abz
        p2x, p2y, p2z = ax + d2 * abx, ay + d2 * aby, az + d2 * abz
        btw1 = ((p1x >= lox) & (p1x <= hix) & (p1y >= loy) & (p1y <= hiy)
                & (p1z >= loz) & (p1z <= hiz))
        btw2 = ((p2x >= lox) & (p2x <= hix) & (p2y >= loy) & (p2y <= hiy)
                & (p2z >= loz) & (p2z <= hiz))
        v1 = (delta >= 0.0) & btw1 & (qa > 0.0)
        v2 = (delta > 0.0) & btw2 & (qa > 0.0)
        cnt = v1.astype(jnp.float32) + v2.astype(jnp.float32)
        d1b = jnp.sqrt((p1x - bx) ** 2 + (p1y - by) ** 2 + (p1z - bz) ** 2)
        d2b = jnp.sqrt((p2x - bx) ** 2 + (p2y - by) ** 2 + (p2z - bz) ** 2)
        dcb = jnp.sqrt((cx - bx) ** 2 + (cy - by) ** 2 + (cz - bz) ** 2)
        psx = jnp.where(v1, p1x, p2x)
        psy = jnp.where(v1, p1y, p2y)
        psz = jnp.where(v1, p1z, p2z)
        dsb = jnp.where(v1, d1b, d2b)
        acceptable = (cnt == 2.0) | ((cnt == 1.0) & (dsb <= dcb))
        two = (cnt == 2.0)
        near1 = d1b <= d2b
        chx = jnp.where(two, jnp.where(near1, p1x, p2x), psx)
        chy = jnp.where(two, jnp.where(near1, p1y, p2y), psy)
        chz = jnp.where(two, jnp.where(near1, p1z, p2z), psz)
        in_range = (lane_f >= last_found) & (lane_f <= seghi)
        ok = acceptable & in_range & (seg_exists > 0.0)
        first = jnp.min(jnp.where(ok, lane_f, 1e9), axis=1, keepdims=True)
        found = (first < 1e9).astype(jnp.float32)
        eff = alive_t * found
        foh = (lane_f == first).astype(jnp.float32)
        ncx = jnp.sum(foh * chx, axis=1, keepdims=True)
        ncy = jnp.sum(foh * chy, axis=1, keepdims=True)
        ncz = jnp.sum(foh * chz, axis=1, keepdims=True)
        cx = jnp.where(eff > 0.0, ncx, cx)
        cy = jnp.where(eff > 0.0, ncy, cy)
        cz = jnp.where(eff > 0.0, ncz, cz)
        last_found = jnp.where(eff > 0.0, first, last_found)
        node_pos = node_pos + eff
        noh = (lane_f == node_pos).astype(jnp.float32) * eff
        ox = ox + noh * cx
        oy = oy + noh * cy
        oz = oz + noh * cz
        ov = ov + noh
        alive = alive * found
        return (last_found, node_pos, cx, cy, cz, alive, ox, oy, oz, ov)

    init = (startg, startnode, cx0, cy0, cz0,
            jnp.ones((rows, 1), jnp.float32), ox, oy, oz, ov)
    (_, _, _, _, _, _, ox, oy, oz, ov) = jax.lax.fori_loop(
        0, m_int - 1, step, init
    )
    ox_ref[:] = ox
    oy_ref[:] = oy
    oz_ref[:] = oz
    ov_ref[:] = ov


def pursuit_walks_fused(
    walk_guides,  # (4, M, 3) walk-space guide polylines (prefix-packed)
    walk_seglens,  # (4, M-1) per-node-position lookahead
    start_guides,  # (4,) int anchor guide rows
    seg_his,  # (4,) highest usable segment index
    outer_his,  # (4,) walk continues while last_found <= outer_hi
    start_nodes,  # (4,) walk-space node position of the anchor
    counts,  # (4,) valid guide prefix length
    eps: float = 1e-4,
    interpret: bool = False,
):
    """All four prior walks in one kernel; same outputs as
    jax.vmap(ops.priors.pursuit_walk). Returns (pos (4, M, 3), valid (4, M)).

    Under ``jax.vmap`` (multi-stream batch) the walks of all B streams pack
    into the row axis of ONE kernel call (4·B sublane rows) — the per-row
    math is stream-independent, so batching costs rows, not kernel replays
    (vmap of a pallas_call would serialize the grid instead)."""
    return _walks_cv(float(eps), bool(interpret))(
        walk_guides, walk_seglens, start_guides, seg_his, outer_his,
        start_nodes, counts,
    )


@functools.lru_cache(maxsize=None)
def _walks_cv(eps: float, interpret: bool):
    @jax.custom_batching.custom_vmap
    def f(walk_guides, walk_seglens, start_guides, seg_his, outer_his,
          start_nodes, counts):
        return _walks_impl(
            walk_guides, walk_seglens, start_guides, seg_his, outer_his,
            start_nodes, counts, eps=eps, interpret=interpret,
        )

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = tuple(
            a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        )
        wg, ws, sg, sh, oh, sn, cn = args
        n_walks = wg.shape[1]
        m = wg.shape[2]
        flat = lambda a: a.reshape((axis_size * n_walks,) + a.shape[2:])
        pos, valid = _walks_impl(
            flat(wg), flat(ws), flat(sg), flat(sh), flat(oh), flat(sn),
            flat(cn), eps=eps, interpret=interpret,
        )
        return (
            pos.reshape(axis_size, n_walks, m, 3),
            valid.reshape(axis_size, n_walks, m),
        ), (True, True)

    return f


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _walks_impl(
    walk_guides,  # (W, M, 3) — W walks: 4, or 4·B for a packed batch
    walk_seglens,  # (W, M-1)
    start_guides,  # (W,)
    seg_his,
    outer_his,
    start_nodes,
    counts,
    eps: float = 1e-4,
    interpret: bool = False,
):
    n_walks, m, _ = walk_guides.shape
    rows = _round_up(n_walks, 8)
    width = _round_up(max(m, 2), 128)

    def pack(a, cols=None):
        out = jnp.zeros((rows, width), jnp.float32)
        if a.ndim == 1:
            return out.at[:n_walks, : a.shape[0]].set(a)
        return out.at[:n_walks, : a.shape[1]].set(a)

    ax = pack(walk_guides[:, :-1, 0])
    ay = pack(walk_guides[:, :-1, 1])
    az = pack(walk_guides[:, :-1, 2])
    bxp = pack(walk_guides[:, 1:, 0])
    byp = pack(walk_guides[:, 1:, 1])
    bzp = pack(walk_guides[:, 1:, 2])
    seglen = pack(walk_seglens)

    idx = jnp.arange(n_walks)
    anchors = walk_guides[idx, start_guides]  # (n_walks, 3)
    anchor = jnp.zeros((rows, width), jnp.float32).at[:n_walks, :3].set(anchors)

    scal = jnp.zeros((rows, width), jnp.float32)
    scal = scal.at[:n_walks, 0].set(start_guides.astype(jnp.float32))
    scal = scal.at[:n_walks, 1].set(seg_his.astype(jnp.float32))
    scal = scal.at[:n_walks, 2].set(outer_his.astype(jnp.float32))
    scal = scal.at[:n_walks, 3].set(start_nodes.astype(jnp.float32))
    scal = scal.at[:n_walks, 4].set(counts.astype(jnp.float32))

    kern = functools.partial(_walks_kernel, int(m), eps)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    ox, oy, oz, ov = pl.pallas_call(
        kern,
        in_specs=[full] * 9,
        out_specs=[full] * 4,
        out_shape=[jax.ShapeDtypeStruct((rows, width), jnp.float32)] * 4,
        interpret=interpret,
    )(ax, ay, az, bxp, byp, bzp, seglen, anchor, scal)

    pos = jnp.stack([ox[:n_walks, :m], oy[:n_walks, :m], oz[:n_walks, :m]],
                    axis=-1)
    valid = ov[:n_walks, :m] > 0.0
    return pos, valid

"""Correspondence priors: pure-pursuit walks + occlusion-case dispatch.

TPU-native redesign of trackdlo::traverse_euclidean (trackdlo.cpp:584-898)
and the occlusion-case dispatch in tracking_step (trackdlo.cpp:929-995):

- each walk is a `lax.scan` over node slots whose inner segment scan is a
  vectorized closed-form segment/sphere intersection over all guide segments
  (the reference's loop-in-loop, trackdlo.cpp:618-670);
- the four needed walks (head, tail, and the two both-ends-anchored walks)
  run unconditionally in one trace and the 5-way dispatch reduces to masked
  merges — cheaper and more fusion-friendly than lax.switch branches;
- all four walks share one generic "walk space" formulation: reversed walks
  operate on index-flipped arrays so the scan always advances positively.

Variable-size structures (visible-index lists, prior lists) are fixed-capacity
arrays with validity masks throughout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Occlusion states (trackdlo.cpp:931-981); shared codes with the oracle.
ALL_VISIBLE = 0
MID_SECTION_OCCLUDED = 1
TAIL_OCCLUDED = 2
HEAD_OCCLUDED = 3
BOTH_ENDS_OCCLUDED = 4
# Zero extended-visible nodes (fast-motion / full-occlusion frame). The
# reference crashes here (indexes an empty vector at trackdlo.cpp:933); we
# define the behavior instead: a distinct state with NO priors, so the main
# EM runs unconstrained rather than being pulled toward a bogus origin prior.
NO_VISIBLE_NODES = 5

_EPS_BETWEEN = 1e-4  # isBetween slack (utils.cpp:176)


class WalkResult(NamedTuple):
    pos: jnp.ndarray  # (M, 3) prior positions, indexed by walk-space node pos
    valid: jnp.ndarray  # (M,)


def _segment_sphere_candidates(a, b, center, radius):
    """All-segments closed-form segment/sphere intersection
    (utils.cpp:185-241), vectorized over segments.

    a, b: (S, 3) segment endpoints; center: (3,); radius: scalar.
    Returns (p1, p2, valid1, valid2) with the reference's branch semantics:
    a negative discriminant yields nothing, a positive one yields both roots
    (bbox-filtered), an exactly-zero one yields only the first root.
    """
    ab = b - a
    ca = a - center
    qa = jnp.sum(ab * ab, axis=1)
    qb = 2.0 * jnp.sum(ab * ca, axis=1)
    qc = jnp.sum(ca * ca, axis=1) - radius**2
    delta = qb * qb - 4.0 * qa * qc
    sqrt_delta = jnp.sqrt(jnp.maximum(delta, 0.0))
    qa_safe = jnp.where(qa == 0, 1.0, qa)
    d1 = (-qb + sqrt_delta) / (2 * qa_safe)
    d2 = (-qb - sqrt_delta) / (2 * qa_safe)
    p1 = a + d1[:, None] * ab
    p2 = a + d2[:, None] * ab

    lo = jnp.minimum(a, b) - _EPS_BETWEEN
    hi = jnp.maximum(a, b) + _EPS_BETWEEN

    def between(p):
        return jnp.all((p >= lo) & (p <= hi), axis=1)

    valid1 = (delta >= 0) & between(p1) & (qa > 0)
    valid2 = (delta > 0) & between(p2) & (qa > 0)
    return p1, p2, valid1, valid2


def pursuit_walk(
    guide_w: jnp.ndarray,
    seg_len_w: jnp.ndarray,
    start_guide: jnp.ndarray,
    seg_hi: jnp.ndarray,
    outer_hi: jnp.ndarray,
    start_node_pos: jnp.ndarray,
    guide_count: jnp.ndarray,
) -> WalkResult:
    """Generic pure-pursuit walk in walk space (trackdlo.cpp:597-670).

    - ``guide_w``: (M, 3) guide polyline in walk order (prefix-packed,
      ``guide_count`` valid rows);
    - ``seg_len_w``: (M-1,) geodesic look-ahead per walk-space node position;
    - ``start_guide``: guide row of the anchor;
    - ``seg_hi``: highest guide segment index the inner scan may use;
    - ``outer_hi``: walk continues while last_found <= outer_hi;
    - ``start_node_pos``: walk-space node position of the anchor.

    Returns positions/validity indexed by walk-space node position (callers
    flip reversed walks back to chain space).
    """
    m = guide_w.shape[0]
    seg_idx = jnp.arange(m - 1)
    seg_a = guide_w[:-1]
    seg_b = guide_w[1:]
    # Segments must lie within the valid guide prefix regardless of bounds.
    seg_exists = seg_idx < guide_count - 1

    anchor = guide_w[start_guide]

    def step(carry, _):
        last_found, node_pos, center, alive = carry
        alive_t = alive & (last_found <= outer_hi) & (node_pos + 1 <= m - 1)
        look = seg_len_w[jnp.clip(node_pos, 0, m - 2)]

        p1, p2, v1, v2 = _segment_sphere_candidates(seg_a, seg_b, center, look)
        cnt = v1.astype(jnp.int32) + v2.astype(jnp.int32)

        d_p1_b = jnp.linalg.norm(p1 - seg_b, axis=1)
        d_p2_b = jnp.linalg.norm(p2 - seg_b, axis=1)
        d_c_b = jnp.linalg.norm(center[None, :] - seg_b, axis=1)

        p_single = jnp.where(v1[:, None], p1, p2)
        d_single = jnp.where(v1, d_p1_b, d_p2_b)
        # A single forward-only intersection is accepted; a single backwards
        # one is skipped (trackdlo.cpp:630-632).
        acceptable = (cnt == 2) | ((cnt == 1) & (d_single <= d_c_b))
        chosen = jnp.where(
            (cnt == 2)[:, None],
            jnp.where((d_p1_b <= d_p2_b)[:, None], p1, p2),
            p_single,
        )

        in_range = (seg_idx >= last_found) & (seg_idx <= seg_hi) & seg_exists
        ok = acceptable & in_range
        first = jnp.argmax(ok)  # first True (argmax on bool picks index 0 of max)
        found = jnp.any(ok)
        eff = alive_t & found

        new_center = jnp.where(eff, chosen[first], center)
        new_last = jnp.where(eff, first, last_found)
        new_pos = node_pos + jnp.where(eff, 1, 0)
        out = (new_pos, new_center, eff)
        return (new_last, new_pos, new_center, alive & found), out

    init = (start_guide, start_node_pos, anchor, jnp.asarray(True))
    _, (idxs, pts, valids) = jax.lax.scan(step, init, None, length=m - 1)

    pos = jnp.zeros((m, 3), guide_w.dtype)
    valid = jnp.zeros((m,), bool)
    # Anchor pair first (trackdlo.cpp:599-601).
    pos = pos.at[start_node_pos].set(anchor)
    valid = valid.at[start_node_pos].set(True)
    idx_safe = jnp.where(valids, idxs, m)
    pos = pos.at[idx_safe].set(pts, mode="drop")
    valid = valid.at[idx_safe].set(True, mode="drop")
    return WalkResult(pos=pos, valid=valid)


def _prefix_run(flags: jnp.ndarray) -> jnp.ndarray:
    """Length of the True-prefix of ``flags``."""
    return jnp.sum(jnp.cumprod(flags.astype(jnp.int32)))


class PriorResult(NamedTuple):
    prior_pos: jnp.ndarray  # (M, 3)
    prior_mask: jnp.ndarray  # (M,)
    state: jnp.ndarray  # occlusion-state code
    alignment_idx: jnp.ndarray


def correspondence_priors(
    y: jnp.ndarray,
    geodesic_coord: jnp.ndarray,
    guide_nodes: jnp.ndarray,
    vis_ext_idx: jnp.ndarray,
    vis_ext_count: jnp.ndarray,
    vis_idx: jnp.ndarray,
    vis_count: jnp.ndarray,
    use_pallas: bool = False,
    interpret: bool = False,
) -> PriorResult:
    """Occlusion-case dispatch + prior walks (trackdlo.cpp:929-995).

    - ``guide_nodes``: (M, 3) pre-registered guide nodes, prefix-packed in
      extended-visible order;
    - ``vis_ext_idx``/``vis_ext_count``: packed extended-visible node indices;
    - ``vis_idx``/``vis_count``: packed raw visible node indices (used only by
      the least-moved-node anchor selection, trackdlo.cpp:984-991).
    """
    m = y.shape[0]
    iota = jnp.arange(m)
    v = vis_ext_count

    first_ext = vis_ext_idx[0]
    last_ext = vis_ext_idx[jnp.clip(v - 1, 0, m - 1)]
    all_visible = v == m
    head_vis = first_ext == 0
    tail_vis = last_ext == m - 1
    state = jnp.where(
        all_visible,
        ALL_VISIBLE,
        jnp.where(
            head_vis & tail_vis,
            MID_SECTION_OCCLUDED,
            jnp.where(
                head_vis,
                TAIL_OCCLUDED,
                jnp.where(tail_vis, HEAD_OCCLUDED, BOTH_ENDS_OCCLUDED),
            ),
        ),
    )
    # v == 0: the packed index lists are all sentinels, so the branches above
    # would misclassify (first_ext == last_ext == sentinel) and the walks
    # would anchor at garbage. Route to the dedicated no-priors state.
    state = jnp.where(v == 0, NO_VISIBLE_NODES, state)

    # Consecutive runs in the extended-visible list.
    in_prefix = iota < v
    consec_head = _prefix_run((vis_ext_idx == iota) & in_prefix)
    rev_pos = jnp.clip(v - 1 - iota, 0, m - 1)
    consec_tail = _prefix_run((vis_ext_idx[rev_pos] == m - 1 - iota) & in_prefix)

    # Least-moved visible node (both-ends-occluded anchor,
    # trackdlo.cpp:984-991). NOTE the reference indexes guide rows (built from
    # the extended list) with raw-visible positions — replicated as-is.
    moved = jnp.linalg.norm(y[vis_idx] - guide_nodes, axis=1)
    moved = jnp.where(iota < vis_count, moved, jnp.inf)
    align_idx = jnp.argmin(moved)

    ext_diff_ok = jnp.diff(vis_ext_idx) == 1
    # Forward run from align_idx (trackdlo.cpp:755-763): 1 + prefix run of
    # consecutive diffs starting at align_idx.
    fwd_flags = ext_diff_ok[jnp.clip(align_idx + iota[:-1], 0, m - 2)] & (
        align_idx + iota[:-1] < v - 1
    )
    consec_fwd = 1 + _prefix_run(fwd_flags)
    # Backward run ending at align_idx (intended semantics of the reference's
    # out-of-bounds loop at trackdlo.cpp:826-835).
    bwd_flags = ext_diff_ok[jnp.clip(align_idx - 1 - iota[:-1], 0, m - 2)] & (
        align_idx - 1 - iota[:-1] >= 0
    )
    consec_bwd = 1 + _prefix_run(bwd_flags)

    # Walk-space arrays.
    seg_len_fwd = jnp.abs(jnp.diff(geodesic_coord))  # (M-1,)
    seg_len_rev = seg_len_fwd[::-1]
    guide_rev = guide_nodes[jnp.clip(v - 1 - iota, 0, m - 1)]

    zero = jnp.asarray(0, align_idx.dtype)
    start_node = vis_ext_idx[jnp.clip(align_idx, 0, m - 1)]
    start_guide_rev = jnp.clip(v - 1 - align_idx, 0, m - 1)

    # The four walks — head (alignment 0, trackdlo.cpp:597-671), tail
    # (alignment 1, 672-748, reversed space), both-ends forward (765-823),
    # both-ends backward (826-894, reversed space; its inner scan may use ALL
    # segments down to guide row 0, the reference's i-1 >= 0 bound at 847) —
    # are independent, so they run as ONE vmapped scan instead of four
    # sequential ones (4x fewer scan-step launches).
    walk_guides = jnp.stack([guide_nodes, guide_rev, guide_nodes, guide_rev])
    walk_seglens = jnp.stack([seg_len_fwd, seg_len_rev, seg_len_fwd, seg_len_rev])
    start_guides = jnp.stack([zero, zero, align_idx, start_guide_rev])
    seg_his = jnp.stack(
        [
            consec_head - 2,
            consec_tail - 2,
            align_idx + consec_fwd - 2,
            jnp.asarray(m - 2, align_idx.dtype),
        ]
    )
    outer_his = jnp.stack(
        [
            consec_head - 2,
            consec_tail - 2,
            align_idx + consec_fwd - 2,
            start_guide_rev + consec_bwd - 1,
        ]
    )
    start_nodes = jnp.stack([zero, zero, start_node, m - 1 - start_node])
    counts = jnp.broadcast_to(v, (4,))

    if use_pallas:
        # One kernel runs all four walks' loops in-register
        # (~3x the XLA scan, whose loop body costs ~3.4 us/step on TPU).
        from trackdlo_tpu.ops.pallas_kernels import pursuit_walks_fused

        pos4, valid4 = pursuit_walks_fused(
            walk_guides, walk_seglens, start_guides, seg_his, outer_his,
            start_nodes, counts, eps=_EPS_BETWEEN, interpret=interpret,
        )
        walks = WalkResult(pos=pos4, valid=valid4)
    else:
        walks = jax.vmap(pursuit_walk)(
            walk_guides, walk_seglens, start_guides, seg_his, outer_his,
            start_nodes, counts,
        )
    head = WalkResult(pos=walks.pos[0], valid=walks.valid[0])
    tail = WalkResult(pos=walks.pos[1][::-1], valid=walks.valid[1][::-1])
    fwd = WalkResult(pos=walks.pos[2], valid=walks.valid[2])
    bwd = WalkResult(pos=walks.pos[3][::-1], valid=walks.valid[3][::-1])

    # --- dispatch (masked merges instead of lax.switch) -------------------
    both_hv = head.valid & tail.valid
    avg_pos = jnp.where(
        both_hv[:, None],
        (head.pos + tail.pos) / 2.0,
        jnp.where(head.valid[:, None], head.pos, tail.pos),
    )
    avg_valid = head.valid | tail.valid

    mid_pos = jnp.where(tail.valid[:, None], tail.pos, head.pos)
    mid_valid = head.valid | tail.valid

    both_ends_pos = jnp.where(bwd.valid[:, None], bwd.pos, fwd.pos)
    both_ends_valid = fwd.valid | bwd.valid

    is_all = state == ALL_VISIBLE
    is_mid = state == MID_SECTION_OCCLUDED
    is_tail_occ = state == TAIL_OCCLUDED
    is_head_occ = state == HEAD_OCCLUDED

    prior_pos = jnp.where(
        is_all,
        avg_pos,
        jnp.where(
            is_mid,
            mid_pos,
            jnp.where(
                is_tail_occ,
                head.pos,
                jnp.where(is_head_occ, tail.pos, both_ends_pos),
            ),
        ),
    )
    prior_mask = jnp.where(
        is_all,
        avg_valid,
        jnp.where(
            is_mid,
            mid_valid,
            jnp.where(
                is_tail_occ,
                head.valid,
                jnp.where(is_head_occ, tail.valid, both_ends_valid),
            ),
        ),
    )
    # No extended-visible nodes -> no priors at all (the walks' outputs are
    # meaningless); without this gate the dispatch emitted a spurious valid
    # prior at the origin for node M-1, silently corrupting the EM.
    prior_mask = prior_mask & (v > 0)

    return PriorResult(
        prior_pos=prior_pos,
        prior_mask=prior_mask,
        state=state,
        alignment_idx=align_idx,
    )

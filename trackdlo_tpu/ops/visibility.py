"""Node visibility as dense masked array ops.

TPU-native redesign of the reference's visibility pass
(trackdlo_node.cpp:254-360). The reference rasterizes depth-sorted thick edges
into a framebuffer and reads it back at node pixels; here that collapses to a
closed form with no framebuffer at all:

A node's pixel is checked exactly once — when its first-drawn adjacent edge is
about to be drawn (the second check always finds the pixel covered by the
first adjacent edge). So:

    occluded(k) ⇔ ∃ edge e: rank(e) < min-rank-of-adjacent-edges(k)
                   ∧ pixel-distance(pix_k, seg_e) ≤ dlo_pixel_width / 2

which is one (M, M−1) point-to-segment distance matrix + a rank comparison.
The capsule-distance test matches cv::line's round-cap thick lines up to
boundary-pixel rasterization details (the oracle's no-cv2 fallback uses the
same capsule predicate for exact cross-checks).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class VisibilityOut(NamedTuple):
    visible_mask: jnp.ndarray  # (M,) proximity ∧ not-self-occluded
    extended_mask: jnp.ndarray  # (M,) after geodesic gap fill
    not_self_occluded: jnp.ndarray  # (M,)
    shortest_node_pt_dists: jnp.ndarray  # (M,)
    vis_idx: jnp.ndarray  # (M,) prefix-packed visible indices
    vis_count: jnp.ndarray
    vis_ext_idx: jnp.ndarray  # (M,) prefix-packed extended indices
    vis_ext_count: jnp.ndarray
    # Per-POINT min squared node distance, over all nodes / over the
    # extended-visible subset: the other reduction of the same (M, N) sweep.
    # cpd_lle's prune (trackdlo.cpp:177-195) consumes these so the per-frame
    # step computes the M×N sweep ONCE (SURVEY.md §3.1 notes the reference
    # computes it twice; round 2 of this repo computed it three times).
    point_min_sq_all: jnp.ndarray | None = None  # (N,)
    point_min_sq_ext: jnp.ndarray | None = None  # (N,)


def pack_indices(mask: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Prefix-pack the indices where ``mask`` is True (ascending)."""
    m = mask.shape[0]
    iota = jnp.arange(m)
    keys = jnp.where(mask, iota, m)
    packed = jnp.sort(keys)
    count = jnp.sum(mask.astype(jnp.int32))
    return jnp.clip(packed, 0, m - 1), count


def project_pixels(y: jnp.ndarray, proj: jnp.ndarray) -> jnp.ndarray:
    """Integer pixel coordinates of nodes (trackdlo_node.cpp:295-311)."""
    img = y @ proj[:, :3].T + proj[:, 3]
    us = (img[:, 0] / img[:, 2]).astype(jnp.int32)
    vs = (img[:, 1] / img[:, 2]).astype(jnp.int32)
    return jnp.stack([us, vs], axis=1)


def compute_visibility(
    y: jnp.ndarray,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    proj: jnp.ndarray,
    geodesic_coord: jnp.ndarray,
    img_rows: int,
    img_cols: int,
    visibility_threshold: float,
    dlo_pixel_width: int,
    d_vis: float,
) -> VisibilityOut:
    m = y.shape[0]
    iota = jnp.arange(m)

    # Nearest point-cloud distance per node (trackdlo_node.cpp:257-277).
    d = y[:, None, :] - x[None, :, :]
    sq = jnp.sum(d * d, axis=-1)
    sq = jnp.where(x_mask[None, :], sq, 1e10)
    shortest = jnp.sqrt(jnp.min(sq, axis=1))

    # Edge draw order: ascending averaged endpoint camera distance
    # (trackdlo_node.cpp:280-291). rank[e] = draw position of edge e.
    edge_mid = (y[:-1] + y[1:]) / 2.0
    edge_dist = jnp.linalg.norm(edge_mid, axis=1)
    order = jnp.argsort(edge_dist, stable=True)
    rank = jnp.zeros(m - 1, jnp.int32).at[order].set(jnp.arange(m - 1, dtype=jnp.int32))

    # Node pixels; reads are clamped to the image like the oracle.
    pix = project_pixels(y, proj)
    pix_read = jnp.stack(
        [
            jnp.clip(pix[:, 0], 0, img_cols - 1),
            jnp.clip(pix[:, 1], 0, img_rows - 1),
        ],
        axis=1,
    ).astype(jnp.float32)

    # Pixel-space point-to-segment distances (M nodes × M-1 edges).
    a = pix[:-1].astype(jnp.float32)  # (M-1, 2)
    b = pix[1:].astype(jnp.float32)
    ab = b - a
    ap = pix_read[:, None, :] - a[None, :, :]  # (M, M-1, 2)
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-12)
    t = jnp.clip(jnp.sum(ap * ab[None, :, :], axis=-1) / denom[None, :], 0.0, 1.0)
    closest = a[None, :, :] + t[..., None] * ab[None, :, :]
    pix_seg_dist = jnp.linalg.norm(pix_read[:, None, :] - closest, axis=-1)
    covers = pix_seg_dist <= dlo_pixel_width / 2.0  # (M, M-1)

    # First check time of node k = min rank over its adjacent edges
    # (interior nodes: edges k-1 and k; ends: single edge).
    rank_prev = jnp.concatenate([jnp.asarray([2**30], jnp.int32), rank])[:m]
    rank_next = jnp.concatenate([rank, jnp.asarray([2**30], jnp.int32)])[:m]
    check_rank = jnp.minimum(rank_prev, rank_next)

    covered_before = jnp.any(covers & (rank[None, :] < check_rank[:, None]), axis=1)
    not_self_occluded = ~covered_before
    visible = not_self_occluded & (shortest <= visibility_threshold)

    # Geodesic gap fill (trackdlo_node.cpp:349-360): an invisible node j is
    # filled when its nearest visible neighbours (prev below, next above)
    # exist and their geodesic gap is <= d_vis.
    big = jnp.asarray(2 * m, jnp.int32)
    prev_vis = jax.lax.associative_scan(
        jnp.maximum, jnp.where(visible, iota, -1)
    )
    next_vis = jax.lax.associative_scan(
        jnp.minimum, jnp.where(visible, iota, big), reverse=True
    )
    has_both = (prev_vis >= 0) & (next_vis < m)
    prev_c = jnp.clip(prev_vis, 0, m - 1)
    next_c = jnp.clip(next_vis, 0, m - 1)
    gap = jnp.abs(geodesic_coord[next_c] - geodesic_coord[prev_c])
    extended = visible | (has_both & (gap <= d_vis))

    vis_idx, vis_count = pack_indices(visible)
    ext_idx, ext_count = pack_indices(extended)

    point_min_sq_all = jnp.min(sq, axis=0)
    point_min_sq_ext = jnp.min(jnp.where(extended[:, None], sq, 1e10), axis=0)

    return VisibilityOut(
        visible_mask=visible,
        extended_mask=extended,
        not_self_occluded=not_self_occluded,
        shortest_node_pt_dists=shortest,
        vis_idx=vis_idx,
        vis_count=vis_count,
        vis_ext_idx=ext_idx,
        vis_ext_count=ext_count,
        point_min_sq_all=point_min_sq_all,
        point_min_sq_ext=point_min_sq_ext,
    )

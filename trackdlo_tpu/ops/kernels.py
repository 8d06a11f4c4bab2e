"""Shared jittable numerics: distances, MCT kernel, LLE weights.

TPU-first forms of the reference's per-node loops: everything is expressed as
dense masked (M, M) / (M, N) array ops so XLA can fuse them and feed the
VPU/MXU, instead of the reference's O(M·N) scalar loops
(trackdlo.cpp:207-230, 263-268).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(len(a), len(b)) squared Euclidean distances.

    Uses the explicit difference form (not the |a|²+|b|²−2ab matmul trick):
    with D=3 the contraction cannot tile the MXU anyway, and the difference
    form avoids catastrophic cancellation for near-coincident points in f32.
    """
    d = a[:, None, :] - b[None, :, :]
    return jnp.sum(d * d, axis=-1)


def geodesic_coords(y: jnp.ndarray) -> jnp.ndarray:
    """Cumulative arc length along the chain (trackdlo.cpp:219-223)."""
    seg = jnp.linalg.norm(jnp.diff(y, axis=0), axis=1)
    return jnp.concatenate([jnp.zeros((1,), y.dtype), jnp.cumsum(seg)])


def masked_geodesic_coords(y: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Arc length over a prefix-packed chain: rows beyond the valid prefix
    contribute zero-length segments (coordinate freezes at the last valid
    node's value)."""
    seg = jnp.linalg.norm(jnp.diff(y, axis=0), axis=1)
    seg = jnp.where(node_mask[1:], seg, 0.0)
    return jnp.concatenate([jnp.zeros((1,), y.dtype), jnp.cumsum(seg)])


def mct_kernel(node_dis: jnp.ndarray, beta: float) -> jnp.ndarray:
    """2nd-order motion-coherence kernel over geodesic distances.

    G = 1/(4β²)·exp(−√2·d/β)·(2d + √2·β)   (trackdlo.cpp:233)
    """
    s2 = jnp.sqrt(jnp.asarray(2.0, node_dis.dtype))
    return (
        1.0 / (2 * beta * 2 * beta) * jnp.exp(-s2 * node_dis / beta) * (2.0 * node_dis + s2 * beta)
    )


def gaussian_kernel(node_dis: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Gaussian kernel G = exp(−d²/2β²) (tracking_test.py:290, 305)."""
    return jnp.exp(-(node_dis * node_dis) / (2 * beta * beta))


def chain_lle_weights(y: jnp.ndarray, node_mask: jnp.ndarray, k: int = 6) -> jnp.ndarray:
    """LLE reconstruction weights over the chain, batched over nodes.

    TPU-native form of calc_LLE_weights (trackdlo.cpp:119-158): every node
    solves its (2k'+1)-slot regularized Gram system, with chain-truncated
    neighbourhoods expressed as slot masks (the reference's
    get_nearest_indices truncation, trackdlo.cpp:92-117). The eps-diagonal
    regularization is applied unconditionally (see oracle.lle.calc_lle_weights
    for why).

    The (M, width, width) systems are solved by an UNROLLED vectorized
    Gauss-Jordan (``width`` static elimination steps, parallel over the M
    batch) — ``jnp.linalg.solve`` on a small-matrix batch is batch-SEQUENTIAL
    LU on TPU and cost ~110 us/frame here, ~3x this formulation
    (perf/preem_fixed_probe.py; max |dW| vs LU 2.6e-6). Diagonal pivoting is
    stable: the Gram is PSD + 1e-5·I, and deactivated slots are identity
    rows. Neighbour rows come from `jnp.roll` (static slices; wrapped slots
    are masked) and W is assembled from constant k-diagonal eyes — TPU
    gathers/scatters are far slower than either (CLAUDE.md).

    ``node_mask`` marks the valid prefix for subset (guide-node) chains;
    invalid rows produce zero weights.
    """
    with jax.default_matmul_precision("highest"):
        return _chain_lle_weights_impl(y, node_mask, k)


def _chain_lle_weights_impl(y: jnp.ndarray, node_mask: jnp.ndarray, k: int) -> jnp.ndarray:
    m = y.shape[0]
    half = k // 2
    width = 2 * half + 1  # neighbourhood window including self

    valid_count = jnp.sum(node_mask.astype(jnp.int32))

    idx = jnp.arange(m)
    off_vals = list(range(-half, half + 1))
    offsets = jnp.arange(width) - half  # [-half .. half]
    neigh_idx_raw = idx[:, None] + offsets[None, :]  # (M, width)
    # The reference's three truncation cases (trackdlo.cpp:94-114) unify to
    # "within ±k/2 of idx AND inside [0, V), excluding idx itself".
    slot_mask = (
        (neigh_idx_raw >= 0)
        & (neigh_idx_raw < valid_count)
        & (neigh_idx_raw != idx[:, None])
    )

    # neigh[i, oi] = y[i + o]; rolled wrap-around lands only in masked slots.
    neigh = jnp.stack([jnp.roll(y, -o, axis=0) for o in off_vals], axis=1)
    offsets_vec = y[:, None, :] - neigh  # xi - neighbours
    offsets_vec = jnp.where(slot_mask[:, :, None], offsets_vec, 0.0)

    gram = jnp.einsum("mwd,mvd->mwv", offsets_vec, offsets_vec)
    # Deactivate unusable slots: identity row/col keeps the system solvable
    # and forces their weights through the masked ones-vector to zero.
    eye_w = jnp.eye(width, dtype=y.dtype)
    pair_mask = slot_mask[:, :, None] & slot_mask[:, None, :]
    gram = jnp.where(pair_mask, gram, eye_w[None, :, :])
    gram = gram + 1e-5 * eye_w[None, :, :]

    # sol = Gi^{-1} @ 1 via unrolled Gauss-Jordan on the augmented system.
    b = slot_mask.astype(y.dtype)[:, :, None]
    a = jnp.concatenate([gram, b], axis=2)  # (M, width, width+1)
    for j in range(width):
        piv = a[:, j : j + 1, j : j + 1]
        row = a[:, j : j + 1, :] / piv
        col = a[:, :, j : j + 1]
        a = a - col * row
        a = a.at[:, j, :].set(row[:, 0, :])
    sol = a[:, :, width]
    denom = jnp.sum(sol * slot_mask, axis=1, keepdims=True)
    wi = jnp.where(slot_mask, sol / jnp.where(denom == 0, 1.0, denom), 0.0)

    # W[i, i+o] = wi[i, oi]: place each window column on its k-diagonal
    # (compile-time eye constants; no scatter).
    w = jnp.zeros((m, m), y.dtype)
    for oi, o in enumerate(off_vals):
        w = w + wi[:, oi, None] * jnp.eye(m, k=o, dtype=y.dtype)
    w = jnp.where(node_mask[:, None], w, 0.0)
    return w


def lle_regularizer(y: jnp.ndarray, node_mask: jnp.ndarray, k: int = 6) -> jnp.ndarray:
    """H = (I − L)ᵀ(I − L) over the valid prefix (trackdlo.cpp:236-237)."""
    m = y.shape[0]
    l_mat = chain_lle_weights(y, node_mask, k)
    eye = jnp.eye(m, dtype=y.dtype) * node_mask[:, None].astype(y.dtype)
    i_l = eye - l_mat
    return jnp.matmul(i_l.T, i_l, precision=jax.lax.Precision.HIGHEST)

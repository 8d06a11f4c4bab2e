"""Per-frame preprocessing as fused dense image ops.

TPU-native redesign of the reference's mask → deproject → downsample chain
(trackdlo_node.cpp:155-243):

- HSV conversion + inRange happen as elementwise f32 math over the whole
  frame (fusable into one HBM pass; the frame never leaves the device);
- depth deprojection is elementwise with the pinhole intrinsics
  (trackdlo_node.cpp:211-229);
- the PCL voxel-grid downsample (trackdlo_node.cpp:236-241) becomes
  image-cell pooling: the image is tiled into c×c pixel cells and each cell
  emits the centroid of its masked pixels. At the operating depth a cell of
  c ≈ leaf·fx/z covers the same footprint as a voxel leaf, and the rope is a
  camera-facing surface, so cells ≈ voxels without any scatter/sort over a
  million pixels (gathers/scatters are the one thing this chain must avoid on
  TPU). Centroids then compact into a fixed-capacity point set by a single
  small argsort over cells.

Zero-depth pixels are excluded from pooling: the reference deprojects them to
the camera origin and later drops that cluster via the EM's 0.1 m prune
(trackdlo.cpp:177-195); excluding them up front is equivalent and keeps cell
centroids unpolluted.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PointCloud(NamedTuple):
    points: jnp.ndarray  # (N_cap, 3)
    mask: jnp.ndarray  # (N_cap,)
    count: jnp.ndarray  # ()


def exact_leaf_mm(voxel_leaf: float) -> int | None:
    """The leaf size in integer millimetres, or None if not integral."""
    leaf_mm = voxel_leaf * 1000.0
    leaf_mm_i = int(round(leaf_mm))
    if leaf_mm_i > 0 and abs(leaf_mm - leaf_mm_i) < 1e-6:
        return leaf_mm_i
    return None


def voxel_parity_bits(
    us: jnp.ndarray,
    vs: jnp.ndarray,
    depth_f32: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    voxel_leaf: float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-pixel voxel parity bits, BIT-PINNED across XLA and Mosaic.

    The parity channel assignment is the one preprocessing computation whose
    floor must agree EXACTLY between the Pallas kernel and its XLA twin (a
    one-ulp difference flips a pixel's channel and changes the candidate
    count — the kernel-vs-XLA count_delta the r3 audit tolerated at ±1).
    Two pinning rules (round 4):

    - z: computed in the integer-mm domain. Depth is u16 millimetres, so
      floor(depth_mm / leaf_mm) is exact mathematics; the f32 realization
      floor(depth_f32 * (1/leaf_mm)) is proven exact for ALL u16 depths and
      every integral-mm leaf in 1..20 (exhaustive test,
      tests/test_pallas.py::TestVoxelParityBits). This also matches the f64
      oracle's mm-domain keys exactly — no f32-vs-f64 knife edges on z, the
      dominant flip source (mm-quantized depth on 8 mm boundaries).
    - x/y: a multiply-only chain — (u - cx) · (depth·0.001f) · (1/(fx·leaf))
      — identical elementwise f32 ops in both compilers. Divisions are
      excluded because a compiler may rewrite division-by-constant into a
      differently-rounded reciprocal multiply (the suspected source of the
      residual r3 flip); plain multiplies are IEEE-identical everywhere.

    Reference semantics: PCL VoxelGrid's own f32 floor(coord·inv_leaf)
    (voxel_grid.h), whose result at exact-boundary depths depends on its
    f32 chain; the integer-mm spec is the chain-independent true floor.
    """
    fkx, fky, fkz = voxel_floor_keys(
        us, vs, depth_f32, fx, fy, cx, cy, voxel_leaf
    )
    return (
        fkx.astype(jnp.int32) & 1,
        fky.astype(jnp.int32) & 1,
        fkz.astype(jnp.int32) & 1,
    )


def voxel_floor_keys(
    us: jnp.ndarray,
    vs: jnp.ndarray,
    depth_f32: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    voxel_leaf: float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-pixel voxel floor indices as integer-valued f32, bit-pinned
    across XLA and Mosaic (the full-key sibling of
    :func:`voxel_parity_bits` — see its docstring for the pinning rules).

    Returned as f32 (not int) so they can ride the pooling matmuls; every
    value is an exact small integer."""
    kx = np.float32(1.0 / (fx * voxel_leaf))
    ky = np.float32(1.0 / (fy * voxel_leaf))
    zq = depth_f32 * np.float32(0.001)
    fkx = jnp.floor(((us - np.float32(cx)) * zq) * kx)
    fky = jnp.floor(((vs - np.float32(cy)) * zq) * ky)
    leaf_mm = exact_leaf_mm(voxel_leaf)
    if leaf_mm is not None:
        fkz = jnp.floor(depth_f32 * np.float32(1.0 / leaf_mm))
    else:
        fkz = jnp.floor(zq * np.float32(1.0 / voxel_leaf))
    return fkx, fky, fkz


def rgb_to_hsv_cv(rgb: jnp.ndarray) -> jnp.ndarray:
    """OpenCV-convention HSV (H in [0,180), S/V in [0,255]) from uint8 RGB.

    Float re-derivation of cv2.cvtColor(..., COLOR_RGB2HSV); agrees with
    OpenCV away from rounding boundaries (the oracle uses cv2 itself).
    """
    rgbf = rgb.astype(jnp.float32)
    r, g, b = rgbf[..., 0], rgbf[..., 1], rgbf[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = v - mn
    delta_safe = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(v > 0, delta * 255.0 / jnp.where(v == 0, 1.0, v), 0.0)
    h = jnp.where(
        v == r,
        60.0 * (g - b) / delta_safe,
        jnp.where(
            v == g,
            120.0 + 60.0 * (b - r) / delta_safe,
            240.0 + 60.0 * (r - g) / delta_safe,
        ),
    )
    h = jnp.where(delta == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h) / 2.0
    return jnp.stack([h, s, v], axis=-1)


def hsv_in_range(r, g, b, lower, upper):
    """Exact HSV in-range test via cross-multiplication — no divisions.

    The mathematical predicate lo_s <= 255·Δ/V <= hi_s (and the H analog
    with its branch structure) multiplies through by the positive
    denominator instead of dividing: every product of the u8-valued inputs
    stays below 2^24, so f32 multiplies evaluate the EXACT rational
    predicate — equal to the divide-based test away from its f32 rounding
    boundaries and correct ON them, at full VPU rate with zero divides
    (two divides per pixel were the bulk of the old per-pixel mask cost).
    Shared by the XLA path and the Pallas kernel (r, g, b are f32-valued
    u8 channels). Matches cv2 inRange(cv2 HSV) up to cv2's own fixed-point
    H/S rounding at band boundaries (same class as before)."""
    lo_h, lo_s, lo_v = (float(x) for x in lower)
    hi_h, hi_s, hi_v = (float(x) for x in upper)
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = v - mn
    # Degenerate-denominator cases (v==0, d==0) fold into the boolean
    # expression instead of a jnp.where over booleans: Mosaic cannot lower a
    # boolean select_n (trunci i8->i1 "Unsupported target bitwidth"), and the
    # logical form is exactly equivalent since the Python-level constant
    # (lo <= 0) is known at trace time.
    s_test = (255.0 * d >= lo_s * v) & (255.0 * d <= hi_s * v)
    s_ok = (s_test | (v <= 0)) if lo_s <= 0.0 else (s_test & (v > 0))
    # h·2Δ in degree units: 60(g−b) | 120Δ+60(b−r) | 240Δ+60(r−g), wrapped
    # by +360Δ when negative; stored h = that / (2Δ).
    hn = jnp.where(
        v == r,
        60.0 * (g - b),
        jnp.where(v == g, 120.0 * d + 60.0 * (b - r), 240.0 * d + 60.0 * (r - g)),
    )
    hn = jnp.where(hn < 0, hn + 360.0 * d, hn)
    h_test = (hn >= 2.0 * lo_h * d) & (hn <= 2.0 * hi_h * d)
    h_ok = (h_test | (d <= 0)) if lo_h <= 0.0 else (h_test & (d > 0))
    return h_ok & s_ok & (v >= lo_v) & (v <= hi_v)


def segment_mask(
    rgb: jnp.ndarray,
    hsv_lower,
    hsv_upper,
    multi_color_dlo: bool,
) -> jnp.ndarray:
    """DLO segmentation (trackdlo_node.cpp:161-167; multi-colour bands from
    color_thresholding, trackdlo_node.cpp:88-119)."""
    rgbf = rgb.astype(jnp.float32)
    r, g, b = rgbf[..., 0], rgbf[..., 1], rgbf[..., 2]
    if not multi_color_dlo:
        return hsv_in_range(r, g, b, hsv_lower, hsv_upper)
    return (
        hsv_in_range(r, g, b, (90, 90, 60), (130, 255, 255))
        | hsv_in_range(r, g, b, (130, 60, 50), (255, 255, 255))
        | hsv_in_range(r, g, b, (0, 60, 50), (10, 255, 255))
        | hsv_in_range(r, g, b, (15, 100, 80), (40, 255, 255))
    )


def voxel_snap(
    points: jnp.ndarray,
    weights: jnp.ndarray,
    leaf: float,
    vote_keys: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted centroid per voxel over a fixed-capacity candidate set.

    Second stage of the two-stage downsample: candidates (fine-cell
    centroids with pixel counts as weights) snap to floor(p/leaf) voxel bins,
    recovering PCL VoxelGrid semantics (trackdlo_node.cpp:236-241) up to
    cells that straddle voxel boundaries. Cost: one argsort + segment sums
    over the candidate capacity (small), never over pixels.

    ``vote_keys``: optional per-candidate packed voxel keys (from
    :func:`pack_vote_keys` — the cells' own per-pixel floor votes). When
    given, candidates merge by that key instead of flooring the f32
    centroid, making the merge DETERMINISTIC and bit-identical between the
    Pallas-kernel and XLA pooling paths (a one-ulp centroid difference can
    no longer flip a knife-edge voxel key — the r3 audit's coarse-path
    count_delta ±1).
    """
    c = points.shape[0]
    valid = weights > 0
    if vote_keys is not None:
        key = jnp.where(valid, vote_keys, jnp.iinfo(jnp.int32).max)
    else:
        inv = 1.0 / leaf
        ijk = jnp.floor(points * inv).astype(jnp.int32)
        # Re-base to the frame's occupied extent so the key fits 30 bits
        # under JAX's default int32 (scenes beyond 1024 leaves/axis clamp —
        # irrelevant at tracking scale).
        ijk_min = jnp.min(
            jnp.where(valid[:, None], ijk, jnp.iinfo(jnp.int32).max), axis=0
        )
        rel = jnp.clip(ijk - ijk_min, 0, (1 << 10) - 1)
        key = rel[:, 0] * (1 << 20) + rel[:, 1] * (1 << 10) + rel[:, 2]
        key = jnp.where(valid, key, jnp.iinfo(jnp.int32).max)
    # Multi-operand sort carries the weighted coordinates along with the key:
    # no post-sort row gathers (batched gathers dominate this stage on TPU,
    # ~0.3 ms per gather at batch 8; the sort itself is ~free).
    w_eff = jnp.where(valid, weights, 0.0)
    key_s, w_s, wx_s, wy_s, wz_s = jax.lax.sort(
        (key, w_eff, points[:, 0] * w_eff, points[:, 1] * w_eff,
         points[:, 2] * w_eff),
        num_keys=1,
    )

    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]]
    )
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    wsum = jax.ops.segment_sum(w_s, seg_id, num_segments=c)
    psum = jax.ops.segment_sum(
        jnp.stack([wx_s, wy_s, wz_s], axis=1), seg_id, num_segments=c
    )
    centroids = psum / jnp.maximum(wsum, 1.0)[:, None]
    out_valid = wsum > 0
    return jnp.where(out_valid[:, None], centroids, 0.0), out_valid


def pack_vote_keys(
    key_sums: jnp.ndarray,
    counts: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Per-cell packed voxel key from pooled per-pixel floor votes.

    ``key_sums`` (C, 3) are pooled sums of per-pixel voxel floor indices
    (ops/preprocess.voxel_floor_keys) — integer-valued f32, EXACT in any
    summation order, hence bit-identical between the Pallas kernel and the
    XLA pooling. The cell's voxel = rounded mean vote per axis (for a cell
    whose pixels share one voxel this IS that voxel; a straddling cell goes
    to the majority side). All arithmetic here is shared XLA code operating
    on exactly-equal inputs, so both pipelines produce identical keys by
    construction. Packs to rel-x<<20 | rel-y<<10 | rel-z (same 30-bit
    rebased layout as voxel_snap's floor path)."""
    cnt = jnp.maximum(counts, 1.0)
    kv = jnp.floor(key_sums / cnt[:, None] + 0.5).astype(jnp.int32)
    kv_min = jnp.min(
        jnp.where(valid[:, None], kv, jnp.iinfo(jnp.int32).max), axis=0
    )
    rel = jnp.clip(kv - kv_min, 0, (1 << 10) - 1)
    return rel[:, 0] * (1 << 20) + rel[:, 1] * (1 << 10) + rel[:, 2]


def _voxel_snap_channels(
    points: jnp.ndarray,
    weights: jnp.ndarray,
    leaf: float,
    parities: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel batched voxel snap: (C, P, 3) candidates → (C*P, 3).

    With the voxel-parity split, two candidates in DIFFERENT channels can
    never share a voxel (same voxel ⇒ same floor(coord/leaf) parities ⇒ same
    channel), so the duplicate-merging sort is channel-local and can ride the
    TPU sort's batch dimension (sublanes) exactly like the compaction sort —
    a batched (C, P) sort costs about one channel's worth, vs the flat
    (C*P,) sort it replaces (~2.5x cheaper at 8x256, perf/parity_stage_bench
    snap rows).

    ``parities`` ((C, 3) int 0/1, the per-channel voxel parities): enforces
    the channel-locality invariant at knife edges. A candidate whose pixels
    sit exactly on a voxel boundary (mm-quantized depth on an 8 mm leaf) can
    have floor(centroid/leaf) land one voxel off its pixels' parity channel —
    the centroid drifts a f32 ulp across the boundary — which would create a
    cross-channel duplicate this snap cannot merge. Pinning the voxel index
    to the channel's parity (the pixels' own floor vote, nearest boundary)
    restores the invariant, and is closer to per-point PCL VoxelGrid
    semantics than merging by the drifted centroid key was."""
    c_ch, p = points.shape[:2]
    inv = 1.0 / leaf
    f = points * inv
    ijk = jnp.floor(f).astype(jnp.int32)
    if parities is not None:
        mismatch = (ijk & 1) != parities[:, None, :]
        adj = jnp.where(f - ijk.astype(jnp.float32) >= 0.5, 1, -1)
        ijk = jnp.where(mismatch, ijk + adj, ijk)
    valid = weights > 0
    # Re-base each channel to its occupied extent so keys fit 30 bits
    # (see voxel_snap).
    ijk_min = jnp.min(
        jnp.where(valid[..., None], ijk, jnp.iinfo(jnp.int32).max), axis=1,
        keepdims=True,
    )
    rel = jnp.clip(ijk - ijk_min, 0, (1 << 10) - 1)
    key = rel[..., 0] * (1 << 20) + rel[..., 1] * (1 << 10) + rel[..., 2]
    key = jnp.where(valid, key, jnp.iinfo(jnp.int32).max)
    w_eff = jnp.where(valid, weights, 0.0)
    key_s, w_s, wx_s, wy_s, wz_s = jax.lax.sort(
        (key, w_eff, points[..., 0] * w_eff, points[..., 1] * w_eff,
         points[..., 2] * w_eff),
        num_keys=1,
    )
    new_seg = jnp.concatenate(
        [jnp.ones((c_ch, 1), bool), key_s[:, 1:] != key_s[:, :-1]], axis=1
    )
    seg_id = (
        jnp.cumsum(new_seg.astype(jnp.int32), axis=1) - 1
        + jnp.arange(c_ch, dtype=jnp.int32)[:, None] * p
    ).reshape(-1)
    wsum = jax.ops.segment_sum(w_s.reshape(-1), seg_id, num_segments=c_ch * p)
    psum = jax.ops.segment_sum(
        jnp.stack([wx_s, wy_s, wz_s], axis=-1).reshape(-1, 3),
        seg_id,
        num_segments=c_ch * p,
    )
    centroids = psum / jnp.maximum(wsum, 1.0)[:, None]
    out_valid = wsum > 0
    return jnp.where(out_valid[:, None], centroids, 0.0), out_valid


def preprocess_frame(
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    occlusion_mask: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    hsv_lower,
    hsv_upper,
    multi_color_dlo: bool,
    cell_px: int,
    max_points: int,
    voxel_leaf: float | None = None,
    candidate_cap: int = 4096,
    parity_split: bool = False,
) -> PointCloud:
    """mask → deproject → cell-pool → [voxel-snap] → compact, fully fused.

    ``occlusion_mask`` is (H, W) boolean (True = keep), the device-side twin
    of /mask_with_occlusion (trackdlo_node.cpp:172-180). With ``voxel_leaf``
    set, cell centroids additionally snap to voxel bins (two-stage
    downsample; pass a fine ``cell_px`` ≈ half the voxel footprint).

    ``parity_split``: pool each cell into 8 voxel-parity channels
    (floor(coord/leaf) mod 2 per axis) so pixels of one cell that straddle a
    voxel boundary become separate candidates. When the cell footprint is
    under two leaves per axis (any cell_px ≲ 2·leaf·fx/z), every candidate's
    pixels then share ONE voxel and the snap reproduces PCL VoxelGrid
    centroids exactly — closed-loop oracle parity without fine cells.
    """
    h, w = depth.shape
    # Per-cell pixel counts (<= cell_px^2) must fit the packed sort key's
    # count field in compact_cells — jnp.minimum there would otherwise
    # silently alter voxel-snap centroid weights (advisor r3 finding).
    assert cell_px * cell_px <= (1 << 14) - 1, (
        f"cell_px={cell_px}: counts up to {cell_px * cell_px} overflow the "
        "14-bit packed sort-key count field (max 16383)"
    )
    mask = segment_mask(rgb, hsv_lower, hsv_upper, multi_color_dlo)
    mask = mask & occlusion_mask
    z = depth.astype(jnp.float32) / 1000.0
    mask = mask & (z > 0)

    us = jnp.arange(w, dtype=jnp.float32)[None, :]
    vs = jnp.arange(h, dtype=jnp.float32)[:, None]
    px = (us - cx) * z / fx
    py = (vs - cy) * z / fy

    maskf = mask.astype(jnp.float32)
    # Pad to a multiple of the cell size (padded pixels carry zero mask).
    ph = (-h) % cell_px
    pw = (-w) % cell_px
    ch, cw = (h + ph) // cell_px, (w + pw) // cell_px

    def pool(img, weight):
        img = img * weight
        if ph or pw:
            img = jnp.pad(img, ((0, ph), (0, pw)))
        tiles = img.reshape(ch, cell_px, cw, cell_px)
        return tiles.sum(axis=(1, 3)).reshape(-1)

    key_sums = None
    if parity_split and voxel_leaf is not None:
        # Bit-pinned parity bits (shared spec with the Pallas kernel —
        # kernel-vs-XLA channel assignment must match exactly; see
        # voxel_parity_bits).
        par_x, par_y, par_z = voxel_parity_bits(
            us, vs, depth.astype(jnp.float32), fx, fy, cx, cy, voxel_leaf
        )
        all_cells, all_counts = [], []
        for bx in (0, 1):
            for by in (0, 1):
                for bz in (0, 1):
                    wgt = maskf * (
                        (par_x == bx) & (par_y == by) & (par_z == bz)
                    ).astype(jnp.float32)
                    cnt = pool(jnp.ones_like(z), wgt)
                    den = jnp.maximum(cnt, 1.0)
                    all_cells.append(
                        jnp.stack(
                            [pool(px, wgt) / den, pool(py, wgt) / den,
                             pool(z, wgt) / den],
                            axis=1,
                        )
                    )
                    all_counts.append(cnt)
        cells = jnp.concatenate(all_cells, axis=0)
        counts = jnp.concatenate(all_counts, axis=0)
    else:
        counts = pool(jnp.ones_like(z), maskf)
        denom = jnp.maximum(counts, 1.0)
        cells = jnp.stack(
            [pool(px, maskf) / denom, pool(py, maskf) / denom,
             pool(z, maskf) / denom],
            axis=1,
        )
        if voxel_leaf is not None:
            # Coarse two-stage mode: also pool the per-pixel voxel floor
            # VOTES (integer-valued f32 — exact in any summation order) so
            # the snap merges deterministically and bit-identically to the
            # Pallas kernel path (voxel_floor_keys / pack_vote_keys).
            fkx, fky, fkz = voxel_floor_keys(
                us, vs, depth.astype(jnp.float32), fx, fy, cx, cy, voxel_leaf
            )
            key_sums = jnp.stack(
                [pool(fkx, maskf), pool(fky, maskf), pool(fkz, maskf)],
                axis=1,
            )
    return compact_cells(
        cells, counts, max_points, voxel_leaf, candidate_cap,
        n_channels=8 if (parity_split and voxel_leaf is not None) else 1,
        key_sums=key_sums,
    )


def compact_cells_segsum(
    cells: jnp.ndarray,
    counts: jnp.ndarray,
    max_points: int,
    voxel_leaf: float | None,
    candidate_cap: int = 4096,
    n_channels: int = 1,
) -> PointCloud:
    """compact_cells via cumsum-rank + one segment-sum instead of a sort.

    Each valid cell's destination slot is its prefix rank within its channel
    (ranks are unique, so the segment-sum is a pure permutation-compaction);
    overflow and invalid cells land in a dump segment. Replaces the
    5-operand (n_channels, n_cells) sort with one cumsum plus one
    segment-sum.

    Measured SLOWER than the sort path on v5e (0.65 vs 0.14 ms at 8ch/2048,
    perf/parity_stage_bench.py): XLA lowers the 115k-update scatter-add far
    worse than the batched bitonic sort. Kept as a reference alternative;
    the product path stays on compact_cells."""
    n_cells = cells.shape[0]
    cap = candidate_cap if voxel_leaf is not None else max_points
    n_per = n_cells // n_channels
    cap_per = cap // n_channels
    cap = cap_per * n_channels
    validr = (counts > 0).reshape(n_channels, n_per)
    rank = jnp.cumsum(validr.astype(jnp.int32), axis=1) - 1
    ch_ids = jnp.arange(n_channels, dtype=jnp.int32)[:, None]
    seg = jnp.where(
        validr & (rank < cap_per), ch_ids * cap_per + rank, cap
    ).reshape(-1)
    vals = jnp.concatenate([cells, counts[:, None]], axis=1)
    out = jax.ops.segment_sum(vals, seg, num_segments=cap + 1)[:cap]
    points, cnt_s = out[:, :3], out[:, 3]
    valid = cnt_s > 0

    if voxel_leaf is not None:
        snapped, snap_valid = voxel_snap(points, cnt_s, voxel_leaf)
        points = snapped[:max_points]
        valid = snap_valid[:max_points]
        points = jnp.where(valid[:, None], points, 0.0)

    return PointCloud(points=points, mask=valid, count=jnp.sum(valid.astype(jnp.int32)))


def _compact_channels_sort(xs, ys, zs, counts, kept, cap_per):
    """Packed-key batched compaction sort (the pre-r4 parity back end).

    ``xs``/``ys``/``zs``/``counts``/``kept`` (C, n_per) → each channel's
    kept cells packed into its first ``cap_per`` slots in ascending cell
    order. The count rides the key's low 14 bits (counts <= cell_px^2 are
    guarded exact by preprocess_frame's assert), so the sort carries 4
    operands; kept-cell keys stay uniquely ordered by cell index, making the
    output bit-identical to the 5-operand sort (perf/compact_ab.py).
    Coordinates arrive as separate (C, n_per) arrays — never a (.., 3)
    stack, whose 3-wide lane dim tile-pads 42x on TPU (r5 glue fix).
    Channels (and any folded-in stream batch) ride the TPU sort's batch
    dimension on sublanes. Returns (points (C, cap_per, 3), cnt, valid)."""
    c_ch, n_per = counts.shape
    cnt_bits = 14
    assert n_per < (1 << (31 - cnt_bits)), "cell grid too large for packed keys"
    idx = jnp.arange(n_per, dtype=jnp.int32)[None, :]
    keys = (jnp.where(kept, idx, n_per) << cnt_bits) | jnp.minimum(
        counts, float((1 << cnt_bits) - 1)
    ).astype(jnp.int32)
    key_s, x_s, y_s, z_s = jax.lax.sort((keys, xs, ys, zs), num_keys=1)
    kk = key_s[:, :cap_per]
    valid = (kk >> cnt_bits) < n_per
    cnt = (kk & ((1 << cnt_bits) - 1)).astype(jnp.float32)
    pts = jnp.stack(
        [x_s[:, :cap_per], y_s[:, :cap_per], z_s[:, :cap_per]], axis=-1
    )
    return pts, cnt, valid


@functools.lru_cache(maxsize=None)
def _parity_compact_dispatch(
    cap_per: int, on_tpu: bool, trim_spec: tuple | None = None
):
    """Batch-aware parity-compaction dispatch (r4).

    Unbatched (the single-stream hot path) routes to the one-hot MXU pack —
    ~64 us vs the sort's ~86 on v5e. Under ``jax.vmap`` (multi-stream
    batching) the one-hot kernel's grid gains a batch dimension whose
    per-grid-step fixed cost swamps the work (measured 1333 us/frame at b8
    vs the sort's 248 — perf/onehot_b8_probe.json), while the sort folds the
    stream axis into its sublane batch almost for free; so the vmap rule
    routes to the sort. Both back ends are bit-identical on valid slots
    (TestOnehotCompaction); invalid slots are masked by every consumer
    (the voxel snap weights them 0), as shipped throughout round 3.

    ``trim_spec`` = (rows_pad, cols_pad, n_rows, n_cols), set when the
    inputs cover the PADDED cell grid (the r5 channel-grid interface): the
    sort back end is LENGTH-dominated, so every sort-routed branch slices
    the pad columns off first (9216 → 7722 cells at 720p: ~48 us/frame at
    b8, perf/batched_iface_ab.json) — bitwise-neutral because pad cells
    carry count 0 and raster order of real cells is preserved. The one-hot
    back end keeps the padded grid: its dead-tile liveness flag skips empty
    tiles for free, and the trim relayout would be pure cost there."""

    def _trim(a):
        rp, cp, nr, nc = trim_spec
        lead = a.shape[:-1]
        return a.reshape(lead + (rp, cp))[..., :nr, :nc].reshape(
            lead + (nr * nc,)
        )

    def _sort_trimmed(xs, ys, zs, counts, kept):
        if trim_spec is not None:
            xs, ys, zs, counts, kept = map(_trim, (xs, ys, zs, counts, kept))
        return _compact_channels_sort(xs, ys, zs, counts, kept, cap_per)

    @jax.custom_batching.custom_vmap
    def compact(xs, ys, zs, counts, kept):
        if on_tpu:
            from trackdlo_tpu.ops.preprocess_kernel import compact_onehot_pallas

            return compact_onehot_pallas(xs, ys, zs, counts, kept, cap_per)
        return _sort_trimmed(xs, ys, zs, counts, kept)

    @compact.def_vmap
    def _rule(axis_size, in_batched, xs, ys, zs, counts, kept):
        xs, ys, zs, counts, kept = (
            a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, b in zip((xs, ys, zs, counts, kept), in_batched)
        )
        lead = counts.shape[:-2]
        c_ch = counts.shape[-2]
        pts, cnt, valid = _sort_trimmed(
            *(a.reshape(-1, a.shape[-1]) for a in (xs, ys, zs, counts, kept))
        )
        return (
            pts.reshape(lead + (c_ch, cap_per, 3)),
            cnt.reshape(lead + (c_ch, cap_per)),
            valid.reshape(lead + (c_ch, cap_per)),
        ), (True, True, True)

    return compact


def compact_parity_channels(
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    zs: jnp.ndarray,
    counts: jnp.ndarray,
    max_points: int,
    voxel_leaf: float | None,
    candidate_cap: int,
    use_onehot_compact: bool | None = None,
    inputs_are_sums: bool = False,
    grid_shape: tuple | None = None,
) -> PointCloud:
    """Parity-channel compaction from channel-shaped coordinates (r5).

    ``grid_shape`` = (rows_pad, cols_pad, n_rows, n_cols), set when the
    inputs cover the PADDED cell grid (preprocess_kernel.parity_grid_shape):
    sort-routed branches slice the pad columns off first — the sort is
    length-dominated and the pad tax is ~48 us/frame at b8
    (perf/batched_iface_ab.json) — while the one-hot pack keeps the padded
    grid (its dead-tile flag skips empty tiles for free). Bitwise-neutral
    either way: pad cells carry count 0 and raster order is preserved.

    ``inputs_are_sums``: xs/ys/zs are raw per-cell coordinate SUMS (the
    Pallas kernel's channel_grids output); the centroid division
    s/max(cnt,1) runs on the ~2k PACKED slots after compaction instead of
    the ~74k grid cells — bit-identical because every packed slot is an
    exact copy of one cell (one-hot rows are single products; the sort
    carries operands verbatim), so the quotient commutes with the pack.

    ``xs``/``ys``/``zs``/``counts`` are (n_channels, n_per) — the natural
    layout of the Pallas binning kernel's channel grids (reshaped padded
    grids; pad cells carry count 0). Keeping the coordinates as three dense
    2-D arrays end-to-end removes the r4 composed-path glue: a (C, 3)
    centroid array tile-pads its 3-wide lane dimension to 128 on TPU (42x
    traffic), and the trim/stack/re-split chain between the kernel and the
    compaction forced several such relayouts (~80 us of the 298 us composed
    preprocess, perf/preprocess_glue_probe.json). Output is bit-identical
    to the old (C, 3) interface: raster order of real cells is preserved,
    pad cells are invalid, so ranks and kept sets match exactly.

    Logic is the pre-r5 compact_cells n_channels>1 branch unchanged:
    even-stride overflow thinning, batch-aware one-hot/sort dispatch,
    channel-batched voxel snap."""
    n_channels, n_per = counts.shape
    if grid_shape is not None:
        assert grid_shape[0] * grid_shape[1] == n_per, (
            f"grid_shape {grid_shape} does not cover n_per={n_per}"
        )
    cap = candidate_cap if voxel_leaf is not None else max_points
    cap_per = cap // n_channels
    vch = counts > 0
    if n_per > cap_per:
        # A channel can hold more valid cells than its cap slots (finer
        # voxel leaves roughly double candidates per halving of the
        # leaf: the eval 5 mm profile measured 749/channel worst-case
        # where the live 8 mm profile peaks at 190 — size the cap per
        # profile, this is the backstop). Prefix truncation would keep
        # a raster band of the image; instead pre-rank valid cells with
        # a cumsum and keep an even stride of them, so overflow thins
        # density and preserves extent. One cumsum + elementwise —
        # no extra sort — and below the cap it is exactly the identity.
        vi = vch.astype(jnp.int32)
        n_occ = jnp.sum(vi, axis=1, keepdims=True)
        n_eff = jnp.maximum(n_occ, cap_per)
        rank = jnp.cumsum(vi, axis=1) - vi  # exclusive rank among valid
        kept = vch & (
            (rank + 1) * cap_per // n_eff > rank * cap_per // n_eff
        )
    else:
        kept = vch
    if use_onehot_compact is None:
        # Batch-aware dispatch: one-hot MXU pack unbatched, sort under
        # vmap (see _parity_compact_dispatch).
        pts_ch, cnt_s, valid_ch = _parity_compact_dispatch(
            cap_per, jax.default_backend() == "tpu", trim_spec=grid_shape
        )(xs, ys, zs, counts, kept)
    elif use_onehot_compact:
        # Forced one-hot matmul pack (r4): compaction is a fixed
        # permutation once ranks are known; the Pallas kernel builds the
        # one-hot in-register and packs on the MXU — bit-identical to
        # the sort (each slot is an exact copy of one cell). Tests force
        # this path on CPU (interpret mode).
        from trackdlo_tpu.ops.preprocess_kernel import (
            compact_onehot_pallas,
        )

        pts_ch, cnt_s, valid_ch = compact_onehot_pallas(
            xs, ys, zs, counts, kept, cap_per,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        if grid_shape is not None:
            rp, cp, nr, nc = grid_shape
            tr = lambda a: a.reshape(n_channels, rp, cp)[
                :, :nr, :nc
            ].reshape(n_channels, nr * nc)
            xs, ys, zs, counts, kept = map(tr, (xs, ys, zs, counts, kept))
        pts_ch, cnt_s, valid_ch = _compact_channels_sort(
            xs, ys, zs, counts, kept, cap_per
        )
    if inputs_are_sums:
        # Packed slots are exact copies — divide the 2k slots, not the 74k
        # grid (invalid slots are 0/1 = 0).
        pts_ch = pts_ch / jnp.maximum(cnt_s, 1.0)[..., None]
    x_s = pts_ch[..., 0]
    y_s = pts_ch[..., 1]
    z_s = pts_ch[..., 2]
    valid = valid_ch.reshape(-1)
    cap = cap_per * n_channels
    if voxel_leaf is not None:
        # Channel-batched snap: voxel duplicates are channel-local under
        # the parity split, so the merge sort rides the batch dimension.
        w_ch = jnp.where(valid_ch, cnt_s, 0.0)
        # Channel-major parity convention shared by preprocess_frame's
        # pooling loop and the Pallas kernel: index = bx·4 + by·2 + bz.
        parities = (
            jnp.asarray(
                [[(c >> 2) & 1, (c >> 1) & 1, c & 1]
                 for c in range(n_channels)],
                jnp.int32,
            )
            if n_channels == 8
            else None
        )
        snapped, snap_valid = _voxel_snap_channels(
            pts_ch, w_ch, voxel_leaf, parities
        )
        points, valid = _cap_snapped(snapped, snap_valid, cap, max_points)
        return PointCloud(
            points=points, mask=valid,
            count=jnp.sum(valid.astype(jnp.int32)),
        )
    x_s, y_s, z_s = (a.reshape(-1) for a in (x_s, y_s, z_s))
    cnt_s = cnt_s.reshape(-1)
    points = jnp.stack([x_s, y_s, z_s], axis=1)
    points = jnp.where(valid[:, None], points, 0.0)
    return PointCloud(
        points=points, mask=valid, count=jnp.sum(valid.astype(jnp.int32))
    )


def compact_cells(
    cells: jnp.ndarray,
    counts: jnp.ndarray,
    max_points: int,
    voxel_leaf: float | None,
    candidate_cap: int = 4096,
    n_channels: int = 1,
    key_sums: jnp.ndarray | None = None,
    use_onehot_compact: bool | None = None,
) -> PointCloud:
    """Compact cell centroids into the fixed-capacity point set, optionally
    snapping to voxel bins (shared tail of the XLA and Pallas front ends).

    ``key_sums`` (C, 3, single-channel mode only): pooled per-pixel voxel
    floor votes (voxel_floor_keys) — when given, the voxel snap merges by
    each cell's rounded mean vote instead of flooring its f32 centroid,
    which makes the coarse path's output count bit-identical between the
    kernel and XLA poolings (see pack_vote_keys / voxel_snap).

    ``n_channels``: with the voxel-parity split the grid is 8 channel-major
    copies of the cell grid; sorting all 8*n_cells entries in one flat sort
    costs ~10x the single-channel compaction. Instead each channel compacts
    independently to ``candidate_cap // n_channels`` slots via ONE batched
    sort (channels ride the TPU sort's batch dimension on sublanes, so the
    batched sort costs about one channel's worth). EM results are point-order
    invariant and the voxel snap re-sorts by voxel key, so the different
    selection order is immaterial; the per-channel cap only binds when one
    parity channel alone exceeds it (~1k occupied cells of one parity — far
    beyond any rope frame)."""
    cell_valid = counts > 0

    # Ascending cell index among valid cells; EM results are point-order
    # invariant. Keeping this narrow-key sort before the voxel snap is faster
    # than sorting all cells by wide voxel keys directly (measured on v5e).
    # Multi-operand sort instead of argsort+gather (see voxel_snap).
    n_cells = cells.shape[0]
    cap = candidate_cap if voxel_leaf is not None else max_points
    if n_channels > 1:
        n_per = n_cells // n_channels
        resh = lambda a: a.reshape(n_channels, n_per)
        return compact_parity_channels(
            resh(cells[:, 0]), resh(cells[:, 1]), resh(cells[:, 2]),
            resh(counts), max_points, voxel_leaf, candidate_cap,
            use_onehot_compact=use_onehot_compact,
        )
    else:
        keys = jnp.where(cell_valid, jnp.arange(n_cells, dtype=jnp.int32), n_cells)
        use_votes = key_sums is not None and voxel_leaf is not None
        ops = [keys, cells[:, 0], cells[:, 1], cells[:, 2], counts]
        if use_votes:
            # Vote keys ride the compaction sort as one extra int32 operand
            # (packed 30-bit keys don't round-trip f32; lax.sort carries
            # mixed dtypes).
            ops.append(pack_vote_keys(key_sums, counts, cell_valid))
        sorted_ops = jax.lax.sort(tuple(ops), num_keys=1)
        if voxel_leaf is None and n_cells > cap:
            # Occupied cells can exceed the capacity (exact_voxels=False
            # configs with small max_points). The keys are raster-order cell
            # indices, so a plain prefix keep would drop the BOTTOM band of
            # the image — decimate the packed valid prefix with an even
            # stride instead so spatial extent survives at thinner density
            # (same rationale as the voxel-overflow branch below).
            # int32 is safe: n_cells * cap stays far below 2^31 for any
            # realistic cell grid (720p/8px = 14400 cells x 4096 cap = 59M).
            key_s = sorted_ops[0]
            n_occ = jnp.sum(cell_valid.astype(jnp.int32))
            n_eff = jnp.maximum(n_occ, cap)
            i = jnp.arange(n_cells, dtype=jnp.int32)
            kept = ((i + 1) * cap // n_eff > i * cap // n_eff) & (key_s < n_cells)
            rank = jnp.where(kept, i, n_cells)
            sorted_ops = jax.lax.sort(
                (rank, *sorted_ops[1:]), num_keys=1
            )
        key_s, x_s, y_s, z_s, cnt_s = sorted_ops[:5]
        valid = key_s[:cap] < n_cells
        points = jnp.stack([x_s[:cap], y_s[:cap], z_s[:cap]], axis=1)
        points = jnp.where(valid[:, None], points, 0.0)
        if n_cells < cap:
            # Fewer grid cells than candidate slots (coarse cells / large
            # caps): pad to the static cap so the downstream snap +
            # _cap_snapped see their expected length (latent shape bug,
            # found by perf/cell_parity_sweep.py at cell_px>=16).
            pad = cap - n_cells
            points = jnp.pad(points, ((0, pad), (0, 0)))
            valid = jnp.pad(valid, (0, pad))
            cnt_s = jnp.pad(cnt_s, (0, pad))
            sorted_ops = (
                *(jnp.pad(a, (0, pad)) for a in sorted_ops[:5]),
                *(
                    (jnp.pad(sorted_ops[5], (0, pad)),)
                    if len(sorted_ops) > 5
                    else ()
                ),
            )

    if voxel_leaf is not None:
        w = jnp.where(valid, cnt_s[:cap], 0.0)
        vote_keys = sorted_ops[5][:cap] if use_votes else None
        snapped, snap_valid = voxel_snap(
            points, w, voxel_leaf, vote_keys=vote_keys
        )
        points, valid = _cap_snapped(snapped, snap_valid, cap, max_points)

    return PointCloud(points=points, mask=valid, count=jnp.sum(valid.astype(jnp.int32)))


def _cap_snapped(
    snapped: jnp.ndarray,
    snap_valid: jnp.ndarray,
    cap: int,
    max_points: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fit ``cap`` snapped voxel centroids into ``max_points`` output slots.

    Occupied voxels can exceed max_points (small-cap configs / cluttered
    scenes). snapped is voxel-key sorted (x-major), so a plain prefix keep
    would drop a contiguous spatial band of the scene — observed chopping
    half the rope and blinding the tracker. Decimate with an even stride
    over the packed valid prefix instead: coverage degrades in density, not
    in extent. (The reference's VoxelGrid has no capacity cap at all,
    trackdlo_node.cpp:236-241 — the cap is our static-shape artifact, so
    overflow must degrade gracefully.) Statically free whenever
    cap <= max_points (the shipped default: candidate_cap 2048 vs
    max_points 4096)."""
    if cap > max_points:
        vi = snap_valid.astype(jnp.int32)
        n_vox = jnp.sum(vi)
        n_eff = jnp.maximum(n_vox, max_points)
        # Stride over the rank AMONG VALID entries (exclusive cumsum), not
        # the slot index: the channel-batched snap emits validity in C
        # packed blocks, not one packed prefix, and a slot-index stride
        # would under-fill and thin unevenly there. For a packed prefix
        # rank == index on valid slots, so this is the same selection.
        rank_v = jnp.cumsum(vi) - vi
        kept = snap_valid & (
            (rank_v + 1) * max_points // n_eff > rank_v * max_points // n_eff
        )
        i = jnp.arange(cap, dtype=jnp.int32)
        rank = jnp.where(kept, i, cap)
        key_k, x_k, y_k, z_k = jax.lax.sort(
            (rank, snapped[:, 0], snapped[:, 1], snapped[:, 2]),
            num_keys=1,
        )
        valid = key_k[:max_points] < cap
        points = jnp.stack(
            [x_k[:max_points], y_k[:max_points], z_k[:max_points]], axis=1
        )
    else:
        points = snapped[:max_points]
        valid = snap_valid[:max_points]
    return jnp.where(valid[:, None], points, 0.0), valid


def default_cell_px(leaf_size: float, fx: float, z_ref: float = 0.65) -> int:
    """Cell size whose footprint at z_ref matches the voxel leaf."""
    return max(2, int(round(leaf_size * fx / z_ref)))

"""Fused Pallas preprocessing kernel: frame → cell sums in one pass.

Replaces the XLA chain HSV-convert → inRange → occlusion AND → deproject →
cell-pool (ops/preprocess.py) for the on-device path: one kernel streams the
720p frame through VMEM in 64x256 tiles; each tile computes the segmentation
mask and the deprojected coordinates in-register and bins them into image
cells with two matmuls per quantity on the MXU (a column-binning constant
matrix and a per-block row-binning matrix built from iota) — no reshapes, no
scatters. Tiles with no rope pixel (most of the frame for a thin DLO) skip
the binning entirely at runtime.

Downstream (centroid division, compaction, voxel snap) stays in XLA; see
ops/preprocess.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 64
COL_BLOCK = 256


def parity_grid_shape(h: int, w: int, cell_px: int) -> tuple:
    """(rows_pad, cols_pad, n_rows, n_cols) of the parity cell grid that
    ``cell_sums_pallas(channel_grids=True)`` flattens into its (8, n_cells)
    outputs — callers pass it to compact_parity_channels(grid_shape=...) so
    sort-routed compaction can slice the pad columns off (the sort is
    length-dominated; pads are ~19% at 720p, perf/batched_iface_ab.json)."""
    n_rows = -(-h // cell_px)
    n_cols = -(-w // cell_px)
    return (_round_up(n_rows, 8), _round_up(n_cols, 128), n_rows, n_cols)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _hsv_mask_block(r, g, b, lower, upper, multi_color):
    """OpenCV-convention HSV in-range test, elementwise on a block.

    Shares ops.preprocess.hsv_in_range — the division-free cross-multiplied
    predicate whose f32 products are all exact (inputs are u8-valued), so
    the Mosaic lowering is bit-identical to the XLA path's mask by
    construction (no divides or non-exact rounding for the two compilers to
    disagree on)."""
    from trackdlo_tpu.ops.preprocess import hsv_in_range

    if not multi_color:
        return hsv_in_range(r, g, b, lower, upper)
    return (
        hsv_in_range(r, g, b, (90, 90, 60), (130, 255, 255))
        | hsv_in_range(r, g, b, (130, 60, 50), (255, 255, 255))
        | hsv_in_range(r, g, b, (0, 60, 50), (10, 255, 255))
        | hsv_in_range(r, g, b, (15, 100, 80), (40, 255, 255))
    )


def _make_kernel(
    lower, upper, multi_color, fx, fy, cx, cy, cell_px, n_cell_rows_pad,
    parity_split=False, voxel_leaf_static=0.0, with_votes=False,
    n_cell_cols_pad=128, img_width=1280, stacked_channels=False,
):
    from trackdlo_tpu.ops.preprocess import (
        voxel_floor_keys, voxel_parity_bits,
    )

    def kernel(
        r_ref, g_ref, b_ref, depth_ref, occ_ref,
        sx_ref, sy_ref, sz_ref, cnt_ref, *vote_refs,
    ):
        i = pl.program_id(0)
        j = pl.program_id(1)
        rows, width = r_ref.shape

        # Mosaic has no direct u8/u16 -> f32 cast; hop through int32.
        r = r_ref[:].astype(jnp.int32).astype(jnp.float32)
        g = g_ref[:].astype(jnp.int32).astype(jnp.float32)
        b = b_ref[:].astype(jnp.int32).astype(jnp.float32)
        mask = _hsv_mask_block(r, g, b, lower, upper, multi_color)
        mask = mask & (occ_ref[:].astype(jnp.int32) > 0)
        z = depth_ref[:].astype(jnp.int32).astype(jnp.float32) / 1000.0
        mask = mask & (z > 0)
        maskf = mask.astype(jnp.float32)

        us = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
            + j * COL_BLOCK
        ).astype(jnp.float32)
        vs = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0)
            + i * ROW_BLOCK
        ).astype(jnp.float32)

        # Per-block row-binning matrix: A[c, r] = 1 iff absolute row
        # i*ROW_BLOCK + r falls in cell row c.
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (n_cell_rows_pad, rows), 0)
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (n_cell_rows_pad, rows), 1)
        abs_row = r_ids + i * ROW_BLOCK
        rowbin = (abs_row // cell_px == c_ids).astype(jnp.float32)

        # Per-block column-binning matrix, built in-kernel from iota exactly
        # like rowbin (r4): the host-side (w_pad, n_cols) f32 constant was
        # re-fetched from HBM for EVERY tile (block index (j, 0) changes each
        # grid step) — ~7.9 MB/frame of traffic, more than the frame itself.
        # colbin[col, c] = 1 iff absolute column j*COL_BLOCK + col is in cell
        # column c (zero for image-padding columns).
        cc_ids = jax.lax.broadcasted_iota(
            jnp.int32, (width, n_cell_cols_pad), 1
        )
        col_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (width, n_cell_cols_pad), 0)
            + j * COL_BLOCK
        )
        colbin_blk = (col_ids // cell_px == cc_ids) & (col_ids < img_width)

        # Mosaic's f32 dot_general rounds operands through bf16 MXU passes —
        # measured 0.4 mm mean / 2.9 mm max centroid error on v5e with plain
        # f32 dots here (perf/parity_kernel_bench.py; interpret mode was
        # exact, the classic Mosaic trap). The binning matrices are 0/1
        # (bf16-exact), and any f32 data operand decomposes EXACTLY into
        # three bf16 pieces (3 x 8 = 24 mantissa bits), so three explicit
        # bf16 passes with f32 accumulation reproduce exact-f32 binning —
        # and run ~6x faster than the f32 dots they replace (24 us vs 156 us
        # for the whole non-parity kernel).
        #
        # Moment formulation: x3 = (us-cx)·z/fx and y3 = (vs-cy)·z/fy are
        # affine in the moments Σz, Σus·z, Σvs·z, so only TWO data
        # quantities go through the (10x bigger) column matmul — z and us·z
        # (3 pieces each) plus the count (1 piece): 7 column passes per
        # channel instead of 10. The vs moment needs no column pass at all:
        # it rides the row matmul with within-block row weights (< 64,
        # bf16-exact) plus i·ROW_BLOCK times the plain row sum.
        dims = (((1,), (0,)), ((), ()))

        def _split3(a):
            hi = a.astype(jnp.bfloat16)
            r1 = a - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, mid, lo

        def _passes(pieces, mat_bf, left):
            out = None
            for piece in pieces:
                lhs, rhs_op = (mat_bf, piece) if left else (piece, mat_bf)
                # precision is pinned to DEFAULT: exactness comes from the
                # 3-way bf16 decomposition, not the contraction precision,
                # and a global jax_default_matmul_precision="highest" would
                # otherwise make Mosaic lower these bf16 dots with fp32
                # contract precision, which it rejects ("Bad lhs type").
                term = jax.lax.dot_general(
                    lhs, rhs_op, dims, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                out = term if out is None else out + term
            return out

        colbin_bf = colbin_blk.astype(jnp.bfloat16)
        rowbin_bf = rowbin.astype(jnp.bfloat16)
        # Row-binning weighted by the WITHIN-BLOCK row index (integer < 64:
        # bf16-exact); the absolute-row offset is added via the plain sum.
        rowv_bf = (rowbin * r_ids.astype(jnp.float32)).astype(jnp.bfloat16)
        uz = us * z  # one f32 rounding (≤1 ulp ≈ 0.1 µm at 0.65 m)

        def channel_sums(ch):
            """(Σx3, Σy3, Σz, count) per cell for pixel weights ``ch``."""
            a_col = _passes(_split3(z * ch), colbin_bf, left=False)
            b_col = _passes(_split3(uz * ch), colbin_bf, left=False)
            c_col = _passes((ch.astype(jnp.bfloat16),), colbin_bf, left=False)
            s_z = _passes(_split3(a_col), rowbin_bf, left=True)
            s_vz = (
                _passes(_split3(a_col), rowv_bf, left=True)
                + (i * ROW_BLOCK) * s_z
            )
            s_uz = _passes(_split3(b_col), rowbin_bf, left=True)
            cnt = _passes((c_col.astype(jnp.bfloat16),), rowbin_bf, left=True)
            sx = (s_uz - cx * s_z) * (1.0 / fx)
            sy = (s_vz - cy * s_z) * (1.0 / fy)
            return sx, sy, s_z, cnt

        @pl.when((i == 0) & (j == 0))
        def _init():
            sx_ref[:] = jnp.zeros_like(sx_ref)
            sy_ref[:] = jnp.zeros_like(sy_ref)
            sz_ref[:] = jnp.zeros_like(sz_ref)
            cnt_ref[:] = jnp.zeros_like(cnt_ref)
            for vr in vote_refs:
                vr[:] = jnp.zeros_like(vr)

        # Runtime tile skip: a 64x256 tile with no masked pixel contributes
        # exactly zero to every cell sum, and a thin rope leaves most of the
        # 2-D tile grid empty — the binning matmuls (the bulk of the kernel,
        # especially 8-channel parity mode) are predicated out per tile.
        block_live = jnp.max(maskf) > 0

        if not parity_split:

            @pl.when(block_live)
            def _bin_plain():
                sx, sy, sz, cnt = channel_sums(maskf)
                sx_ref[:] += sx
                sy_ref[:] += sy
                sz_ref[:] += sz
                cnt_ref[:] += cnt
                if with_votes:
                    # Pool per-pixel voxel floor VOTES (integer-valued f32;
                    # the bf16-split binning sums integers < 2^24 exactly in
                    # any order, so these match the XLA pooling bit-for-bit
                    # — the determinism the coarse snap keys need).
                    fkx, fky, fkz = voxel_floor_keys(
                        us, vs,
                        depth_ref[:].astype(jnp.int32).astype(jnp.float32),
                        fx, fy, cx, cy, voxel_leaf_static,
                    )
                    for vr, fk in zip(vote_refs, (fkx, fky, fkz)):
                        col = _passes(
                            _split3(fk * maskf), colbin_bf, left=False
                        )
                        vr[:] += _passes(_split3(col), rowbin_bf, left=True)

        elif not stacked_channels:

            @pl.when(block_live)
            def _bin_parity():
                # 8 voxel-parity channels (floor(coord/leaf) mod 2 per axis):
                # a cell straddling a voxel boundary splits into per-voxel
                # candidates, making the downstream snap exactly PCL VoxelGrid
                # (see ops/preprocess.preprocess_frame parity_split).
                # Shared BIT-PINNED spec with the XLA twin (integer-mm z,
                # multiply-only x/y) — see preprocess.voxel_parity_bits.
                par_x, par_y, par_z = voxel_parity_bits(
                    us, vs, depth_ref[:].astype(jnp.int32).astype(jnp.float32),
                    fx, fy, cx, cy, voxel_leaf_static,
                )
                # One packed channel index, then one compare per channel —
                # halves the per-pixel indicator work vs three compares +
                # three multiplies per channel (r4).
                ch_idx = par_x * 4 + par_y * 2 + par_z
                for ci in range(8):
                    ch = maskf * (ch_idx == ci).astype(jnp.float32)

                    # Runtime channel skip: a live block's rope pixels span
                    # only the parity channels its local voxel neighbourhood
                    # touches (z parity especially is near-constant within
                    # 64 rows) — empty channels contribute exactly zero.
                    @pl.when(jnp.max(ch) > 0)
                    def _acc(ci=ci, ch=ch):
                        sx, sy, sz, cnt = channel_sums(ch)
                        sx_ref[ci] = sx_ref[ci] + sx
                        sy_ref[ci] = sy_ref[ci] + sy
                        sz_ref[ci] = sz_ref[ci] + sz
                        cnt_ref[ci] = cnt_ref[ci] + cnt

        else:

            @pl.when(block_live)
            def _bin_parity_stacked():
                # Channel-STACKED parity binning — MEASURED NEGATIVE RESULT
                # (r4, perf/stacked_binning_ab.py): the per-channel loop
                # above issues ~17 small MXU dots per LIVE CHANNEL (~129
                # per live tile at the measured 7.6 live channels), so
                # stacking the channels on a leading batch axis — 17
                # channel-BATCHED dots per tile — looked like an
                # instruction-overhead win. It is NOT: 119.3 vs 118.7 µs
                # compiled (Mosaic lowers the batched dots no better than
                # the unrolled per-channel dots). Kept in-tree, OFF by
                # default, as the documented A/B. Outputs are BIT-IDENTICAL
                # to the per-channel path: ch is 0/1, so split3(q)·ch ==
                # split3(q·ch) piece by piece, and each batched sub-dot
                # contracts the same K elements in the same order as its
                # unbatched twin. Dead channels contribute exact zeros
                # instead of being skipped.
                par_x, par_y, par_z = voxel_parity_bits(
                    us, vs, depth_ref[:].astype(jnp.int32).astype(jnp.float32),
                    fx, fy, cx, cy, voxel_leaf_static,
                )
                ch_idx = par_x * 4 + par_y * 2 + par_z

                # (8, rows, width) stacked channel indicator weights.
                chm3 = jnp.stack(
                    [
                        maskf * (ch_idx == ci).astype(jnp.float32)
                        for ci in range(8)
                    ]
                )

                # Batched binning matrices rebuilt from 3-D iota (same
                # predicates as colbin_blk/rowbin above; broadcasting the
                # 2-D ones across a new leading dim is the one Mosaic
                # broadcast form we avoid on principle).
                cc3 = jax.lax.broadcasted_iota(
                    jnp.int32, (8, width, n_cell_cols_pad), 2
                )
                col3 = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (8, width, n_cell_cols_pad), 1
                    )
                    + j * COL_BLOCK
                )
                colbin3 = (
                    (col3 // cell_px == cc3) & (col3 < img_width)
                ).astype(jnp.bfloat16)
                c3 = jax.lax.broadcasted_iota(
                    jnp.int32, (8, n_cell_rows_pad, rows), 1
                )
                r3 = jax.lax.broadcasted_iota(
                    jnp.int32, (8, n_cell_rows_pad, rows), 2
                )
                rowbin3 = ((r3 + i * ROW_BLOCK) // cell_px == c3).astype(
                    jnp.float32
                )
                rowbin3_bf = rowbin3.astype(jnp.bfloat16)
                rowv3_bf = (rowbin3 * r3.astype(jnp.float32)).astype(
                    jnp.bfloat16
                )

                dims_col = (((2,), (1,)), ((0,), (0,)))
                dims_row = (((2,), (1,)), ((0,), (0,)))

                def _bdot(lhs, rhs, dims):
                    return jax.lax.dot_general(
                        lhs, rhs, dims,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT,
                    )

                def _col_pass(pieces):
                    out = None
                    for piece in pieces:
                        # piece values are bf16-exact; ·chm3 (0/1) keeps
                        # them bf16-exact, so the cast is lossless.
                        p3 = (piece.astype(jnp.float32)[None] * chm3).astype(
                            jnp.bfloat16
                        )
                        term = _bdot(p3, colbin3, dims_col)
                        out = term if out is None else out + term
                    return out  # (8, rows, n_cell_cols_pad) f32

                def _row_pass(col3_f32, mat_bf):
                    out = None
                    for piece in _split3(col3_f32):
                        term = _bdot(mat_bf, piece, dims_row)
                        out = term if out is None else out + term
                    return out  # (8, n_cell_rows_pad, n_cell_cols_pad)

                a_col3 = _col_pass(_split3(z))
                b_col3 = _col_pass(_split3(uz))
                # Count data operand is the channel weight itself (cf. the
                # per-channel path's c_col).
                c_col3 = _bdot(chm3.astype(jnp.bfloat16), colbin3, dims_col)

                s_z3 = _row_pass(a_col3, rowbin3_bf)
                s_vz3 = _row_pass(a_col3, rowv3_bf) + (i * ROW_BLOCK) * s_z3
                s_uz3 = _row_pass(b_col3, rowbin3_bf)
                cnt3 = _bdot(
                    rowbin3_bf, c_col3.astype(jnp.bfloat16), dims_row
                )

                sx_ref[:] += (s_uz3 - cx * s_z3) * (1.0 / fx)
                sy_ref[:] += (s_vz3 - cy * s_z3) * (1.0 / fy)
                sz_ref[:] += s_z3
                cnt_ref[:] += cnt3

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "fx", "fy", "cx", "cy", "hsv_lower", "hsv_upper", "multi_color_dlo",
        "cell_px", "interpret", "parity_split", "voxel_leaf", "with_votes",
        "stacked_channels", "channel_grids",
    ),
)
def cell_sums_pallas(
    rgb: jnp.ndarray,  # (H, W, 3) uint8
    depth: jnp.ndarray,  # (H, W) uint16
    occlusion_mask: jnp.ndarray,  # (H, W) bool
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    hsv_lower,
    hsv_upper,
    multi_color_dlo: bool,
    cell_px: int,
    interpret: bool = False,
    parity_split: bool = False,
    voxel_leaf: float | None = None,
    with_votes: bool = False,
    stacked_channels: bool = False,
    channel_grids: bool = False,
):
    """Returns (cells (C, 3) float32 centroids, counts (C,)) matching
    ops.preprocess cell pooling, C = cell grid (x8 channels when
    ``parity_split``; see ops/preprocess.preprocess_frame).

    ``with_votes`` (single-channel mode with ``voxel_leaf``): additionally
    pools per-pixel voxel floor votes and returns a third value — key_sums
    (C, 3) — for the deterministic coarse snap
    (ops/preprocess.pack_vote_keys).

    ``channel_grids`` (parity mode only): return ``(sx, sy, sz, cnt)`` as
    four (8, n_cell_rows_pad * n_cell_cols_pad) arrays over the PADDED cell
    grid instead of trimmed/stacked (C, 3) centroids — RAW coordinate SUMS,
    not divided: compact_parity_channels(inputs_are_sums=True) divides the
    ~2k PACKED slots instead of the ~74k grid cells, bit-identically (each
    packed slot is an exact copy, so s/max(cnt,1) commutes with the pack).
    Padding cells carry cnt=0 (padded pixels are masked in-kernel), raster
    order of real cells is preserved, so downstream compaction produces
    bit-identical output — while skipping the trim relayout AND never
    materializing a (C, 3) array, whose 3-wide lane dimension tile-pads 42x
    on TPU (the composed r4 glue, perf/preprocess_glue_probe.py)."""
    h, w = depth.shape
    # Same packed-count bound as preprocess_frame: downstream compact_cells
    # packs per-cell counts into 14 key bits (advisor r3 finding).
    assert cell_px * cell_px <= (1 << 14) - 1, (
        f"cell_px={cell_px}: counts up to {cell_px * cell_px} overflow the "
        "14-bit packed sort-key count field (max 16383)"
    )
    h_pad = _round_up(h, ROW_BLOCK)
    w_pad = _round_up(w, COL_BLOCK)
    n_cell_rows = -(-h // cell_px)
    n_cell_cols = -(-w // cell_px)
    n_cell_rows_pad = _round_up(n_cell_rows, 8)
    n_cell_cols_pad = _round_up(n_cell_cols, 128)
    n_ch = 8 if parity_split else 1
    if parity_split:
        assert voxel_leaf is not None and voxel_leaf > 0

    r = jnp.zeros((h_pad, w_pad), jnp.uint8).at[:h, :w].set(rgb[..., 0])
    g = jnp.zeros((h_pad, w_pad), jnp.uint8).at[:h, :w].set(rgb[..., 1])
    b = jnp.zeros((h_pad, w_pad), jnp.uint8).at[:h, :w].set(rgb[..., 2])
    d = jnp.zeros((h_pad, w_pad), jnp.uint16).at[:h, :w].set(depth)
    occ = jnp.zeros((h_pad, w_pad), jnp.uint8).at[:h, :w].set(
        occlusion_mask.astype(jnp.uint8)
    )

    if with_votes:
        assert not parity_split and voxel_leaf is not None, (
            "votes are for the single-channel two-stage mode"
        )
    kernel = _make_kernel(
        tuple(hsv_lower), tuple(hsv_upper), multi_color_dlo,
        fx, fy, cx, cy, cell_px, n_cell_rows_pad,
        parity_split=parity_split,
        voxel_leaf_static=voxel_leaf if (parity_split or with_votes) else 0.0,
        with_votes=with_votes,
        n_cell_cols_pad=n_cell_cols_pad,
        img_width=w,
        stacked_channels=stacked_channels,
    )
    grid = (h_pad // ROW_BLOCK, w_pad // COL_BLOCK)
    block = lambda: pl.BlockSpec(
        (ROW_BLOCK, COL_BLOCK), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    if parity_split:
        out_block = (n_ch, n_cell_rows_pad, n_cell_cols_pad)
        out_index = lambda i, j: (0, 0, 0)
    else:
        out_block = (n_cell_rows_pad, n_cell_cols_pad)
        out_index = lambda i, j: (0, 0)
    n_out = 7 if with_votes else 4
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block(), block(), block(), block(), block()],
        out_specs=[
            pl.BlockSpec(out_block, out_index, memory_space=pltpu.VMEM)
        ] * n_out,
        out_shape=[jax.ShapeDtypeStruct(out_block, jnp.float32)] * n_out,
        interpret=interpret,
    )(r, g, b, d, occ)

    sx, sy, sz, cnt = outs[:4]
    if channel_grids:
        assert parity_split, "channel_grids is the parity-split fast path"
        flat = lambda a: a.reshape(n_ch, -1)
        return flat(sx), flat(sy), flat(sz), flat(cnt)
    if parity_split:
        # Channel-major flattening matching the XLA path's concatenation
        # order (ops/preprocess.preprocess_frame parity loop).
        trim = lambda a: a[:, :n_cell_rows, :n_cell_cols].reshape(-1)
    else:
        trim = lambda a: a[:n_cell_rows, :n_cell_cols].reshape(-1)
    sx, sy, sz, cnt = trim(sx), trim(sy), trim(sz), trim(cnt)
    denom = jnp.maximum(cnt, 1.0)
    cells = jnp.stack([sx / denom, sy / denom, sz / denom], axis=1)
    if with_votes:
        key_sums = jnp.stack([trim(a) for a in outs[4:]], axis=1)
        return cells, cnt, key_sums
    return cells, cnt


# ---------------------------------------------------------------------------
# One-hot matmul compaction (r4).
#
# The parity path's (8, n_per) compaction sort is LENGTH-dominated (~85 us
# at n_per=7722; operand count barely matters — perf/compact_experiments).
# But compaction is a fixed PERMUTATION once each kept cell's rank is known,
# and a permutation is a one-hot matmul: out[r, :] = sum_i [rank_i == r] *
# data[i, :]. Ranks come from one exact int cumsum in XLA; the kernel builds
# the one-hot tile from iota compares in-register (never materialized to
# HBM) and accumulates on the MXU. The one-hot operand is 0/1 (bf16-exact)
# and each output element is a sum of exactly ONE product, so the pack is
# BIT-EXACT in f32 despite the bf16 lowering — data rides as 3-way-split
# bf16 pieces (the established exact decomposition, see _split3 above).
# Dead tiles (no kept cell — most of the grid for a rope) skip at runtime.
# ---------------------------------------------------------------------------


def _compact_onehot_kernel(cap_per, n_lanes, c_ch, rank_ref, data_ref,
                           flag_ref, out_ref):
    t = pl.program_id(0)
    tile = rank_ref.shape[2]

    @pl.when(t == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # One grid step per TILE, all channels via ONE batched dot: a (C, T)
    # grid paid a fixed per-step cost x128 that swamped the actual work
    # (measured as slow as the sort it replaced), and a per-channel Python
    # loop blew scoped VMEM (8 live one-hot temporaries).
    @pl.when(flag_ref[0, 0] > 0)
    def _pack():
        # rank block is (C, 8, tile) (sublane-broadcast on the host so the
        # block shape is Mosaic-legal); row 0 carries the ranks.
        ranks = rank_ref[:, 0:1, :]  # (C, 1, tile); >= cap_per for dropped
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (ranks.shape[0], cap_per, tile), 1
        )
        onehot = (rows == ranks).astype(jnp.bfloat16)  # (C, cap_per, tile)
        contrib = jax.lax.dot_general(
            onehot, data_ref[:],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (C, cap_per, n_lanes)
        # Full-block accumulate (Mosaic rejects partial-index stores to
        # VMEM — the "no scalar stores" pitfall class, CLAUDE.md).
        out_ref[:] += contrib


def compact_onehot_pallas(
    xs: jnp.ndarray,  # (C, n_per) f32, channel-major
    ys: jnp.ndarray,  # (C, n_per) f32
    zs: jnp.ndarray,  # (C, n_per) f32
    counts: jnp.ndarray,  # (C, n_per) f32
    kept: jnp.ndarray,  # (C, n_per) bool — valid AND under-cap (pre-thinned)
    cap_per: int,
    tile: int = 1024,
    interpret: bool = False,
):
    """Pack each channel's kept cells into its first ``cap_per`` output
    slots, in ascending cell order — bit-identical to the compaction sort's
    (key, x, y, z, cnt) output, at MXU speed.

    tile=1024 measured best on v5e (fixed per-grid-step cost dominates at
    512; scoped VMEM blows past 2048 with the batched one-hot).

    Coordinates arrive as separate dense (C, n_per) arrays (r5): a
    (C, n_per, 3) operand tile-pads its lane dim 3→128 and was the composed
    preprocess's hidden relayout cost (perf/preprocess_glue_probe.py).

    Returns (points (C, cap_per, 3), cnt (C, cap_per), valid (C, cap_per)).
    """
    c_ch, n_per = counts.shape
    n_pad = _round_up(n_per, tile)
    n_tiles = n_pad // tile

    ki = kept.astype(jnp.int32)
    rank = jnp.cumsum(ki, axis=1) - ki  # exclusive rank among kept
    rank = jnp.where(kept & (rank < cap_per), rank, jnp.int32(2**30))
    n_kept = jnp.minimum(jnp.sum(ki, axis=1), cap_per)  # (C,)

    # Data lanes: [x y z cnt] x [hi mid lo] = 12 bf16 lanes (3-way exact
    # split; see _split3 — sums of one product each reassemble exactly).
    def split3(a):
        hi = a.astype(jnp.bfloat16)
        r1 = a - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, mid, lo

    quantities = [xs, ys, zs, counts]
    pieces = []
    for q in quantities:
        pieces.extend(split3(q))
    data = jnp.stack(pieces, axis=-1)  # (C, n_per, 12) bf16
    n_lanes = 16  # 12 used lanes, padded for layout
    rank_p = jnp.full((c_ch, n_pad), 2**30, jnp.int32).at[:, :n_per].set(rank)
    # Sublane-broadcast so the rank block is (1, 8, tile) — Mosaic requires
    # the last two block dims divisible by (8, 128) or equal to the array's.
    rank_b = jnp.broadcast_to(rank_p[:, None, :], (c_ch, 8, n_pad))
    data_p = jnp.zeros((c_ch, n_pad, n_lanes), jnp.bfloat16).at[
        :, :n_per, : data.shape[-1]
    ].set(data)
    # Per-TILE liveness flags (any channel, any kept cell), laid out
    # (T, 8, 128) so each grid step reads its own (8, 128) block (the estep
    # flag pattern). Rope cells cluster spatially, so most tiles are dead
    # across ALL channels at once.
    live = jnp.max(
        (rank_p < cap_per).astype(jnp.float32).reshape(c_ch, n_tiles, tile),
        axis=(0, 2),
    )  # (T,)
    flags = jnp.broadcast_to(
        live.reshape(n_tiles, 1, 1), (n_tiles, 8, 128)
    ).reshape(n_tiles * 8, 128)

    out = pl.pallas_call(
        functools.partial(_compact_onehot_kernel, cap_per, n_lanes, c_ch),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((c_ch, 8, tile), lambda t: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_ch, tile, n_lanes), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (c_ch, cap_per, n_lanes), lambda t: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c_ch, cap_per, n_lanes), jnp.float32),
        interpret=interpret,
    )(rank_b, data_p, flags)

    # Reassemble each quantity from its hi+mid+lo piece lanes (each output
    # element is a sum of one product per piece — exact f32).
    x = out[..., 0] + out[..., 1] + out[..., 2]
    y = out[..., 3] + out[..., 4] + out[..., 5]
    z = out[..., 6] + out[..., 7] + out[..., 8]
    cnt = out[..., 9] + out[..., 10] + out[..., 11]
    points = jnp.stack([x, y, z], axis=-1)  # (C, cap_per, 3)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (c_ch, cap_per), 1)
        < n_kept[:, None]
    )
    points = jnp.where(valid[..., None], points, 0.0)
    cnt = jnp.where(valid, cnt, 0.0)
    return points, cnt, valid

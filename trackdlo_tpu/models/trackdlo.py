"""The flagship TrackDLO tracker: one jitted per-frame graph.

The reference's whole per-frame path — HSV mask → occlusion AND → depth
deprojection → downsample → visibility → pre-registration GLTP → occlusion
dispatch + prior walks → main EM (trackdlo_node.cpp:121-532 +
trackdlo.cpp:900-999) — compiles here into a single XLA executable of
``(state, rgb, depth, occlusion_mask) → (state, outputs)`` with static
shapes, vmappable over a leading stream axis and shardable over a device
mesh (see trackdlo_tpu.parallel).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from trackdlo_tpu.config import CameraIntrinsics, TrackerParams
from trackdlo_tpu.ops.cpd_lle import CpdParams, cpd_lle
from trackdlo_tpu.ops.preprocess import default_cell_px, preprocess_frame
from trackdlo_tpu.ops.priors import correspondence_priors
from trackdlo_tpu.ops.visibility import compute_visibility


class TrackerState(NamedTuple):
    """Tracker state pytree (the reference's Y_, sigma2_, geodesic_coord_,
    trackdlo.h:105-117). Being an explicit pytree makes checkpoint/resume
    trivial (the reference has none, SURVEY.md §5)."""

    y: jnp.ndarray  # (M, 3) node positions
    sigma2: jnp.ndarray  # () GMM variance
    geodesic_coord: jnp.ndarray  # (M,) rest arc-length coordinates


class StepOutputs(NamedTuple):
    y: jnp.ndarray
    sigma2: jnp.ndarray
    guide_nodes: jnp.ndarray  # (M, 3) prefix-packed pre-registered guides
    guide_count: jnp.ndarray
    prior_pos: jnp.ndarray  # (M, 3)
    prior_mask: jnp.ndarray  # (M,)
    occlusion_state: jnp.ndarray  # code, see ops.priors
    visible_mask: jnp.ndarray  # (M,)
    extended_mask: jnp.ndarray  # (M,)
    not_self_occluded: jnp.ndarray  # (M,)
    points: jnp.ndarray  # (N_cap, 3) downsampled cloud (diagnostics/eval)
    points_mask: jnp.ndarray
    n_points: jnp.ndarray
    converged: jnp.ndarray
    iterations: jnp.ndarray


def init_state(init_nodes, params: TrackerParams) -> TrackerState:
    """Tracker construction from initial nodes (trackdlo_node.cpp:129-148)."""
    y = jnp.asarray(init_nodes, jnp.float32)
    seg = jnp.linalg.norm(jnp.diff(y, axis=0), axis=1)
    coord = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(seg)])
    return TrackerState(
        y=y,
        sigma2=jnp.asarray(params.sigma2_init, jnp.float32),
        geodesic_coord=coord,
    )


def _resolve_use_pallas(params: TrackerParams) -> bool:
    if params.use_pallas_estep is not None:
        return params.use_pallas_estep
    # Auto: the fused kernel wins on TPU at every size (one kernel per EM
    # iteration vs ~15 launches, perf/stage_scan_bench.py); interpret
    # mode on CPU is far slower than the XLA path, so stay off there.
    return jax.default_backend() != "cpu"


def preprocess_for_step(
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    occlusion_mask: jnp.ndarray,
    *,
    params: TrackerParams,
    intr: CameraIntrinsics,
    cell_px: int,
    use_pallas: bool,
):
    """L2 preprocessing (trackdlo_node.cpp:155-243), shared by every model
    family so algorithms are scored on identical point clouds — the
    reference evaluates gltp/cdcpd on the same input stream
    (run_evaluation.cpp:457).

    With exact_voxels, cell centroids additionally snap to 3-D voxel bins
    (two-stage). Cells stay at the leaf footprint: halving them costs ~10x
    in the cell argsort on TPU for <0.1 mm of parity (perf/microbench.py).
    On TPU the mask→deproject→cell-pool front end is one Pallas kernel
    (ops/preprocess_kernel.py)."""
    voxel_leaf = params.downsample_leaf_size if params.exact_voxels else None
    # One cap for both modes, leaf-derived (occupancy ~(1/leaf)^2 — a cap
    # tuned on the live 8 mm leaf truncates 5 mm eval clouds; see
    # TrackerParams.candidate_cap).
    candidate_cap = params.candidate_cap()
    if use_pallas:
        from trackdlo_tpu.ops.preprocess import (
            compact_cells, compact_parity_channels,
        )
        from trackdlo_tpu.ops.preprocess_kernel import (
            cell_sums_pallas, parity_grid_shape,
        )

        parity = params.parity_split and voxel_leaf is not None
        coarse_votes = (not parity) and voxel_leaf is not None
        if parity:
            # Channel-grid fast path (r5): coordinates stay as dense
            # (8, n_cells) arrays end-to-end — no (C, 3) intermediate whose
            # 3-wide lane dim tile-pads 42x (the r4 composed-preprocess
            # glue, perf/preprocess_glue_probe.py). Bit-identical output.
            sx, sy, sz, cnt = cell_sums_pallas(
                rgb, depth, occlusion_mask,
                intr.fx, intr.fy, intr.cx, intr.cy,
                params.hsv_lower, params.hsv_upper, params.multi_color_dlo,
                cell_px,
                interpret=jax.default_backend() != "tpu",
                parity_split=True,
                voxel_leaf=voxel_leaf,
                channel_grids=True,
            )
            return compact_parity_channels(
                sx, sy, sz, cnt, params.max_points, voxel_leaf,
                candidate_cap, inputs_are_sums=True,
                grid_shape=parity_grid_shape(
                    depth.shape[0], depth.shape[1], cell_px
                ),
            )
        out = cell_sums_pallas(
            rgb, depth, occlusion_mask,
            intr.fx, intr.fy, intr.cx, intr.cy,
            params.hsv_lower, params.hsv_upper, params.multi_color_dlo,
            cell_px,
            interpret=jax.default_backend() != "tpu",
            parity_split=False,
            voxel_leaf=voxel_leaf,
            with_votes=coarse_votes,
        )
        cells, counts = out[:2]
        return compact_cells(
            cells, counts, params.max_points, voxel_leaf,
            candidate_cap=candidate_cap,
            n_channels=1,
            key_sums=out[2] if coarse_votes else None,
        )
    return preprocess_frame(
        rgb,
        depth,
        occlusion_mask,
        intr.fx,
        intr.fy,
        intr.cx,
        intr.cy,
        params.hsv_lower,
        params.hsv_upper,
        params.multi_color_dlo,
        cell_px,
        params.max_points,
        voxel_leaf=voxel_leaf,
        candidate_cap=candidate_cap,
        parity_split=params.parity_split,
    )


def _step_impl(
    state: TrackerState,
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    occlusion_mask: jnp.ndarray,
    *,
    params: TrackerParams,
    intr: CameraIntrinsics,
    cell_px: int,
    model_axis: str | None = None,
):
    proj = jnp.asarray(np.array(intr.proj_matrix(), np.float32))
    use_pallas = _resolve_use_pallas(params)

    pc = preprocess_for_step(
        rgb, depth, occlusion_mask,
        params=params, intr=intr, cell_px=cell_px, use_pallas=use_pallas,
    )

    return _track_from_points(
        state, pc, proj,
        params=params, intr=intr, use_pallas=use_pallas, model_axis=model_axis,
    )


def _track_from_points(
    state: TrackerState,
    pc,
    proj: jnp.ndarray,
    *,
    params: TrackerParams,
    intr: CameraIntrinsics,
    use_pallas: bool,
    model_axis: str | None = None,
):
    """Visibility → pre-registration → priors → main EM on a prepared point
    cloud (the post-preprocess tail of the per-frame step; also the public
    entry for callers with their own point source, see Tracker.step_from_points)."""
    m = params.num_of_nodes

    # L3: visibility (trackdlo_node.cpp:254-360). On TPU the whole pass runs
    # as one Pallas kernel (ops/visibility_kernel.py).
    if use_pallas:
        from trackdlo_tpu.ops.visibility_kernel import fused_visibility

        vis = fused_visibility(
            state.y,
            pc.points,
            pc.mask,
            proj,
            state.geodesic_coord,
            intr.height,
            intr.width,
            params.visibility_threshold,
            params.dlo_pixel_width,
            params.d_vis,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        vis = compute_visibility(
            state.y,
            pc.points,
            pc.mask,
            proj,
            state.geodesic_coord,
            intr.height,
            intr.width,
            params.visibility_threshold,
            params.dlo_pixel_width,
            params.d_vis,
        )

    # Points-axis sharding (sequence-parallel EM): under shard_map, each
    # model-axis rank keeps its slice of the point set; preprocessing and
    # visibility above are replicated (cheap), the EM loops below reduce over
    # points with psum/pmin collectives riding ICI.
    if model_axis is not None:
        n_shards = jax.lax.axis_size(model_axis)
        rank = jax.lax.axis_index(model_axis)
        chunk = params.max_points // n_shards
        start = rank * chunk
        em_points = jax.lax.dynamic_slice(pc.points, (start, 0), (chunk, 3))
        em_mask = jax.lax.dynamic_slice(pc.mask, (start,), (chunk,))
        em_pmin_ext = jax.lax.dynamic_slice(
            vis.point_min_sq_ext, (start,), (chunk,)
        )
        em_pmin_all = jax.lax.dynamic_slice(
            vis.point_min_sq_all, (start,), (chunk,)
        )
    else:
        em_points = pc.points
        em_mask = pc.mask
        em_pmin_ext = vis.point_min_sq_ext
        em_pmin_all = vis.point_min_sq_all

    # L4a: guide nodes = Y at extended-visible indices (trackdlo.cpp:913-921),
    # pre-registered by the GLTP pass (trackdlo.cpp:925-927).
    iota = jnp.arange(m)
    guide0 = state.y[vis.vis_ext_idx]
    guide_node_mask = iota < vis.vis_ext_count
    guide0 = jnp.where(guide_node_mask[:, None], guide0, 0.0)
    pre = cpd_lle(
        em_points,
        em_mask,
        guide0,
        guide_node_mask,
        state.sigma2,  # copied, not persisted (trackdlo.cpp:925)
        CpdParams(
            beta=params.beta_pre_proc,
            lam=params.lambda_pre_proc,
            lle_weight=params.lle_weight,
            mu=params.mu,
            max_iter=params.max_iter,
            tol=params.tol,
            include_lle=True,
            prune_radius=params.prune_radius,
            visibility_threshold=params.visibility_threshold,
            use_pallas=use_pallas,
            solver=params.solver,
        ),
        axis_name=model_axis,
        # Guide nodes are Y[extended], so the prune-vs-guides sweep is the
        # visibility kernel's extended-subset point min (computed once).
        point_min_sq=em_pmin_ext,
    )
    guide_nodes = pre.y

    # L4b: occlusion dispatch + prior walks (trackdlo.cpp:929-995).
    priors = correspondence_priors(
        state.y,
        state.geodesic_coord,
        guide_nodes,
        vis.vis_ext_idx,
        vis.vis_ext_count,
        vis.vis_idx,
        vis.vis_count,
        use_pallas=use_pallas,
        interpret=jax.default_backend() != "tpu",
    )

    # L4c: main EM (trackdlo.cpp:997-998).
    main = cpd_lle(
        em_points,
        em_mask,
        state.y,
        jnp.ones((m,), bool),
        state.sigma2,
        CpdParams(
            beta=params.beta,
            lam=params.lam,
            lle_weight=params.lle_weight,
            mu=params.mu,
            max_iter=params.max_iter,
            tol=params.tol,
            include_lle=False,
            alpha=params.alpha,
            k_vis=params.k_vis,
            visibility_threshold=params.visibility_threshold,
            prune_radius=params.prune_radius,
            use_priors=True,
            use_visibility=True,
            use_pallas=use_pallas,
            solver=params.solver,
        ),
        prior_pos=priors.prior_pos,
        prior_mask=priors.prior_mask,
        visible_count=vis.vis_ext_count,
        axis_name=model_axis,
        point_min_sq=em_pmin_all,
    )

    new_state = TrackerState(
        y=main.y, sigma2=main.sigma2, geodesic_coord=state.geodesic_coord
    )
    outputs = StepOutputs(
        y=main.y,
        sigma2=main.sigma2,
        guide_nodes=guide_nodes,
        guide_count=vis.vis_ext_count,
        prior_pos=priors.prior_pos,
        prior_mask=priors.prior_mask,
        occlusion_state=priors.state,
        visible_mask=vis.visible_mask,
        extended_mask=vis.extended_mask,
        not_self_occluded=vis.not_self_occluded,
        points=pc.points,
        points_mask=pc.mask,
        n_points=pc.count,
        converged=main.converged,
        iterations=main.iterations,
    )
    return new_state, outputs


def build_step_fn(params: TrackerParams, intr: CameraIntrinsics, jit: bool = True):
    """Build the per-frame step callable
    ``(state, rgb u8[H,W,3], depth u16[H,W], occ bool[H,W]) → (state, outputs)``.

    Hyperparameters are baked in as compile-time constants (the reference
    reads them from the rosparam server once at startup,
    trackdlo_node.cpp:539-562)."""
    cell_px = params.downsample_cell_px or default_cell_px(
        params.downsample_leaf_size, intr.fx
    )
    fn = functools.partial(_step_impl, params=params, intr=intr, cell_px=cell_px)
    if jit:
        fn = jax.jit(fn, donate_argnums=(0,))
    return fn


class Tracker:
    """Framework-agnostic tracking API (replaces the ROS node surface).

    Usage::

        tracker = Tracker(live_params(), CameraIntrinsics())
        state = tracker.init_from_frame(rgb, depth)     # or init_from_nodes
        for rgb, depth in frames:
            state, out = tracker.step(state, rgb, depth)
    """

    def __init__(self, params: TrackerParams, intrinsics: CameraIntrinsics):
        self.params = params
        self.intrinsics = intrinsics
        self._step = build_step_fn(params, intrinsics)
        self._step_points = None
        self._full_occ = None

    def init_from_nodes(self, nodes) -> TrackerState:
        nodes = np.asarray(nodes, np.float32)
        if nodes.shape != (self.params.num_of_nodes, 3):
            raise ValueError(
                f"expected ({self.params.num_of_nodes}, 3) nodes, got {nodes.shape}"
            )
        return init_state(nodes, self.params)

    def init_from_frame(self, rgb, depth) -> TrackerState:
        """First-frame initialization: skeleton extraction + spline fit
        (initialize.py path), falling back to GMM cold-start registration
        (utils.cpp:21-82) when the skeleton is degenerate."""
        from trackdlo_tpu.dlo_init import initialize_nodes

        nodes = initialize_nodes(
            np.asarray(rgb),
            np.asarray(depth),
            self.params,
            self.intrinsics,
        )
        return self.init_from_nodes(nodes)

    def step(self, state: TrackerState, rgb, depth, occlusion_mask=None):
        """One tracking update. NOTE: ``state``'s device buffers are DONATED
        to the step (zero-copy state threading); do not reuse the passed-in
        state object afterwards — thread the returned state instead."""
        h, w = self.intrinsics.height, self.intrinsics.width
        rgb_shape = tuple(np.shape(rgb))
        depth_shape = tuple(np.shape(depth))
        if rgb_shape != (h, w, 3):
            raise ValueError(
                f"rgb must be ({h}, {w}, 3) u8 for these intrinsics, got {rgb_shape}"
            )
        if depth_shape != (h, w):
            raise ValueError(
                f"depth must be ({h}, {w}) u16 millimetres, got {depth_shape}"
            )
        y_shape = tuple(np.shape(state.y))
        if y_shape != (self.params.num_of_nodes, 3):
            raise ValueError(
                f"state.y must be ({self.params.num_of_nodes}, 3), got {y_shape}"
            )
        if occlusion_mask is None:
            if self._full_occ is None:
                self._full_occ = jnp.ones(
                    (self.intrinsics.height, self.intrinsics.width), bool
                )
            occ = self._full_occ
        else:
            occ = jnp.asarray(np.asarray(occlusion_mask) != 0)
            if occ.ndim == 3:
                occ = occ.any(axis=-1)
        return self._step(state, jnp.asarray(rgb), jnp.asarray(depth), occ)

    def step_from_points(self, state: TrackerState, points):
        """One tracking update from a caller-supplied (N, 3) point cloud,
        skipping the RGB-D preprocessing (for sensors that already produce a
        segmented cloud, or for parity experiments). Points beyond
        ``params.max_points`` are dropped."""
        if self._step_points is None:
            from trackdlo_tpu.ops.preprocess import PointCloud

            proj = jnp.asarray(np.array(self.intrinsics.proj_matrix(), np.float32))
            use_pallas = _resolve_use_pallas(self.params)

            def fn(st, pts, msk):
                pc = PointCloud(
                    points=pts, mask=msk, count=jnp.sum(msk.astype(jnp.int32))
                )
                return _track_from_points(
                    st, pc, proj,
                    params=self.params, intr=self.intrinsics,
                    use_pallas=use_pallas,
                )

            self._step_points = jax.jit(fn, donate_argnums=(0,))

        cap = self.params.max_points
        pts = np.zeros((cap, 3), np.float32)
        msk = np.zeros((cap,), bool)
        arr = np.asarray(points, np.float32)[:cap]
        pts[: len(arr)] = arr
        msk[: len(arr)] = True
        return self._step_points(state, jnp.asarray(pts), jnp.asarray(msk))

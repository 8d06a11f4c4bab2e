"""Multi-stream / multi-chip scale-out.

The reference is a single-machine ROS graph; its only "distribution" is
TCPROS pub/sub between 2-4 processes (SURVEY.md §2.4). The TPU-native scaling
model replaces that entirely:

- **data parallelism** over camera streams / candidate DLOs: the per-frame
  step is vmapped over a leading batch axis and the batch is sharded over the
  mesh's ``data`` axis (each chip tracks its own streams; zero cross-chip
  traffic on this axis);
- **sequence parallelism** over the point cloud: within a stream, the point
  axis is sharded over the ``model`` axis and every over-points reduction in
  the EM becomes a psum/pmin collective riding ICI
  (ops/cpd_lle.py ``axis_name``). This is the "long axis" scaling story for
  dense clouds (SURVEY.md §5: the E-step normalizer is a per-column sum, so
  blockwise accumulation is exact).

Recipe (scaling-book style): pick a mesh, annotate shardings / shard_map the
step, let XLA insert the collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from trackdlo_tpu.config import CameraIntrinsics, TrackerParams
from trackdlo_tpu.models.trackdlo import TrackerState, _step_impl
from trackdlo_tpu.ops.preprocess import default_cell_px

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_tracking_mesh(
    n_devices: int | None = None, model_parallel: int = 1, devices=None
) -> Mesh:
    """A (data × model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicate_state(state: TrackerState, batch: int) -> TrackerState:
    """Tile a single-stream state along a new leading batch axis."""
    return jax.tree.map(lambda v: jnp.broadcast_to(v, (batch,) + v.shape), state)


def build_batched_step_fn(
    params: TrackerParams,
    intr: CameraIntrinsics,
    mesh: Mesh | None = None,
    cohort_size: int | None = None,
):
    """vmap the per-frame step over a leading stream axis; with a mesh, the
    batch axis is sharded over the mesh's ``data`` axis (pure DP).

    ``cohort_size``: split the stream batch into independent CONVERGENCE
    COHORTS of this size, each running its own vmapped step (its own EM
    while_loops) inside the same jit. A single vmapped while_loop runs
    every stream to the batch's SLOWEST stream (lax.while_loop batching:
    converged streams keep executing masked body iterations), and
    E[max trips over B] grows with B — measured 3.9 single / 6.4 at b8 /
    7.1 at b16 (perf/batch_predication_study.json), so large lockstep
    batches pay a growing per-frame EM tax. Cohorts bound that tax at
    E[max over cohort_size]: per-stream results are BITWISE identical to
    the lockstep batch (the batching rule freezes converged elements by
    select, so grouping never changes any stream's math — pinned by
    tests/test_parallel.py), only the loop scheduling changes. Measured
    round 5 at b16: see perf/ + docs/ALGORITHM.md. Must divide the batch.

    EXCEPTION — cohort_size=1 (per-stream early-exit): a vmap of one
    stream routes the EM to the fused whole-loop kernel
    (ops/cpd_lle._em_loop_dispatch, r5), a faster but DIFFERENT f32
    realization than the lockstep row-packed path — parity within the
    audited kernel bounds, not bitwise. Cohorts >= 2 keep the bitwise
    guarantee."""
    cell_px = params.downsample_cell_px or default_cell_px(
        params.downsample_leaf_size, intr.fx
    )
    step = functools.partial(_step_impl, params=params, intr=intr, cell_px=cell_px)
    vstep = jax.vmap(step)
    if cohort_size is None:
        batched = vstep
    else:

        def batched(state, rgb, depth, occ):
            b = rgb.shape[0]
            if b % cohort_size:
                raise ValueError(
                    f"batch {b} not divisible by cohort_size={cohort_size}"
                )
            if b == cohort_size:
                return vstep(state, rgb, depth, occ)
            outs = []
            for i in range(0, b, cohort_size):
                sl = slice(i, i + cohort_size)
                outs.append(
                    vstep(
                        jax.tree.map(lambda v: v[sl], state),
                        rgb[sl], depth[sl], occ[sl],
                    )
                )
            return jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *outs
            )

    if mesh is None:
        return jax.jit(batched, donate_argnums=(0,))

    dp = NamedSharding(mesh, P(DATA_AXIS))
    state_sh = TrackerState(y=dp, sigma2=dp, geodesic_coord=dp)
    return jax.jit(
        batched,
        in_shardings=(state_sh, dp, dp, dp),
        donate_argnums=(0,),
    )


def build_parallel_step_fn(
    params: TrackerParams,
    intr: CameraIntrinsics,
    mesh: Mesh,
):
    """DP × SP step: streams sharded over ``data``, each stream's point set
    sharded over ``model`` with EM collectives (the full training-step
    sharding used by the multi-chip dry run).

    Expects the global batch divisible by the data-axis size and
    ``params.max_points`` divisible by the model-axis size.
    """
    from jax import shard_map

    cell_px = params.downsample_cell_px or default_cell_px(
        params.downsample_leaf_size, intr.fx
    )
    step = functools.partial(
        _step_impl, params=params, intr=intr, cell_px=cell_px, model_axis=MODEL_AXIS
    )

    def local_fn(state, rgb, depth, occ):
        # Local shapes: (B_local, ...); frames are replicated over the model
        # axis, point slices are selected inside the step by axis_index.
        return jax.vmap(step)(state, rgb, depth, occ)

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            TrackerState(y=P(DATA_AXIS), sigma2=P(DATA_AXIS), geodesic_coord=P(DATA_AXIS)),
            P(DATA_AXIS),
            P(DATA_AXIS),
            P(DATA_AXIS),
        ),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))

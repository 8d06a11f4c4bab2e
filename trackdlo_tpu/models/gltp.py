"""GLTP tracker: CPD registration with LLE shape regularization.

The reference uses GLTP as its pre-processing registration pass
(trackdlo.cpp:925-927) and scores plain `gltp` as a comparison algorithm in
its evaluation (run_evaluation.cpp alg switch). This model family exposes it
standalone: the same jitted preprocessing front-end, but the tracker update
is a single GLTP EM over all nodes — no visibility machinery, no
correspondence priors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from trackdlo_tpu.config import CameraIntrinsics, TrackerParams
from trackdlo_tpu.models.trackdlo import (
    TrackerState,
    _resolve_use_pallas,
    init_state,
    preprocess_for_step,
)
from trackdlo_tpu.ops.cpd_lle import CpdParams, cpd_lle
from trackdlo_tpu.ops.preprocess import default_cell_px


def _gltp_step(state, rgb, depth, occlusion_mask, *, params, intr, cell_px):
    use_pallas = _resolve_use_pallas(params)
    # Same front end as the flagship (incl. Pallas kernel and exact-voxel /
    # parity options): the reference scores algorithms on identical input
    # (run_evaluation.cpp:457).
    pc = preprocess_for_step(
        rgb, depth, occlusion_mask,
        params=params, intr=intr, cell_px=cell_px, use_pallas=use_pallas,
    )
    m = params.num_of_nodes
    res = cpd_lle(
        pc.points,
        pc.mask,
        state.y,
        jnp.ones((m,), bool),
        state.sigma2,
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
        ),
    )
    new_state = TrackerState(
        y=res.y, sigma2=res.sigma2, geodesic_coord=state.geodesic_coord
    )
    return new_state, res


class GltpTracker:
    """Same API shape as models.trackdlo.Tracker."""

    def __init__(self, params: TrackerParams, intrinsics: CameraIntrinsics):
        self.params = params
        self.intrinsics = intrinsics
        cell_px = params.downsample_cell_px or default_cell_px(
            params.downsample_leaf_size, intrinsics.fx
        )
        self._step = jax.jit(
            functools.partial(_gltp_step, params=params, intr=intrinsics, cell_px=cell_px),
            donate_argnums=(0,),
        )
        self._full_occ = None

    def init_from_nodes(self, nodes) -> TrackerState:
        return init_state(np.asarray(nodes, np.float32), self.params)

    def step(self, state, rgb, depth, occlusion_mask=None):
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

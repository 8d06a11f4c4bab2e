"""Batched occlusion sweeps: many (trial × pct_occlusion) runs at once.

The reference scores one (alg, trial, pct, scenario) per rosbag replay
(run_evaluation.cpp); here a whole sweep over occlusion percentages runs as
ONE vmapped multi-stream tracker on device — each stream sees the same
frames with a different occlusion mask — and errors come from the jitted
batched metric. This is the batching-axis scaling story (SURVEY.md §2.4)
applied to evaluation.
"""

from __future__ import annotations

import numpy as np

from trackdlo_tpu.evaluation.evaluator import piecewise_error_batch
from trackdlo_tpu.evaluation.occlusion import gt_bbox_rect, rect_mask
from trackdlo_tpu.parallel.sharding import build_batched_step_fn, replicate_state


def occlusion_sweep(
    params,
    intrinsics,
    frames,
    gt_nodes,
    init_nodes,
    pct_values=(0, 25, 50, 75),
    occlude_from_frame: int = 2,
):
    """Track the same sequence under each occlusion percentage in parallel.

    Returns (pct_values, errors (P, F)) — per-trial, per-frame (E1+E2)/2.
    """
    import jax.numpy as jnp

    from trackdlo_tpu.models.trackdlo import init_state

    batch = len(pct_values)
    step = build_batched_step_fn(params, intrinsics)
    state = replicate_state(init_state(np.asarray(init_nodes, np.float32), params), batch)

    proj = intrinsics.proj_matrix()
    h, w = intrinsics.height, intrinsics.width

    errors = np.zeros((batch, len(frames)))
    for f_idx, (rgb, depth) in enumerate(frames):
        masks = []
        for pct in pct_values:
            if f_idx >= occlude_from_frame and pct > 0:
                rect = gt_bbox_rect(np.asarray(gt_nodes[f_idx]), pct, proj, h, w)
                masks.append(
                    rect_mask(h, w, rect) if rect is not None else np.ones((h, w), bool)
                )
            else:
                masks.append(np.ones((h, w), bool))
        rgb_b = jnp.asarray(np.broadcast_to(rgb, (batch,) + rgb.shape))
        depth_b = jnp.asarray(np.broadcast_to(depth, (batch,) + depth.shape))
        occ_b = jnp.asarray(np.stack(masks))
        state, outs = step(state, rgb_b, depth_b, occ_b)
        gt_b = np.broadcast_to(gt_nodes[f_idx], (batch,) + np.asarray(gt_nodes[f_idx]).shape)
        errors[:, f_idx] = piecewise_error_batch(np.asarray(state.y), np.asarray(gt_b))

    return np.asarray(pct_values), errors

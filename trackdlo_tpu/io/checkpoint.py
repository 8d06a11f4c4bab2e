"""Tracker-state checkpoint / resume.

The reference has no checkpointing (SURVEY.md §5: "a crash loses state").
Here state is an explicit pytree, so persistence is trivial — npz for a
single tracker, and the same API works on batched (multi-stream) states.
"""

from __future__ import annotations

import numpy as np

from trackdlo_tpu.models.trackdlo import TrackerState


def save_state(path: str, state: TrackerState) -> str:
    np.savez(
        path,
        y=np.asarray(state.y),
        sigma2=np.asarray(state.sigma2),
        geodesic_coord=np.asarray(state.geodesic_coord),
    )
    return path


def load_state(path: str) -> TrackerState:
    import jax.numpy as jnp

    data = np.load(path)
    return TrackerState(
        y=jnp.asarray(data["y"]),
        sigma2=jnp.asarray(data["sigma2"]),
        geodesic_coord=jnp.asarray(data["geodesic_coord"]),
    )

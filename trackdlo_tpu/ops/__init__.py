"""Jitted TPU compute kernels (JAX/XLA, with Pallas for selected hot ops).

This is the compute path replacing the reference's Eigen/PCL/OpenCV C++ core
(trackdlo/src/trackdlo.cpp, trackdlo_node.cpp). Everything is static-shape,
mask-based, and traceable: variable-size structures from the reference
(pruned point sets, visible-node subsets, correspondence-prior lists) become
fixed-capacity arrays with validity masks so a single compiled graph serves
every frame.
"""

from trackdlo_tpu.ops.kernels import (
    chain_lle_weights,
    geodesic_coords,
    masked_geodesic_coords,
    mct_kernel,
    pairwise_sq_dists,
)
from trackdlo_tpu.ops.cpd_lle import CpdParams, cpd_lle

__all__ = [
    "mct_kernel",
    "chain_lle_weights",
    "geodesic_coords",
    "masked_geodesic_coords",
    "pairwise_sq_dists",
    "CpdParams",
    "cpd_lle",
]

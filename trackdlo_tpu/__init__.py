"""trackdlo_tpu: a TPU-native (JAX/XLA/Pallas) deformable-linear-object
tracking framework with the capabilities of RMDLO/trackdlo.

Layers (tpu-first redesign of the reference's ROS/C++ stack, SURVEY.md §1):

- :mod:`trackdlo_tpu.ops` — jitted compute kernels (EM solver, priors,
  preprocessing, visibility) replacing the reference's Eigen/PCL/OpenCV core.
- :mod:`trackdlo_tpu.models` — tracker model families (TrackDLO, GLTP, CPD).
- :mod:`trackdlo_tpu.parallel` — vmap/mesh batching across streams & objects.
- :mod:`trackdlo_tpu.dlo_init` — first-frame initialization (skeleton+spline).
- :mod:`trackdlo_tpu.evaluation` — occlusion-injection evaluation harness.
- :mod:`trackdlo_tpu.oracle` — float64 NumPy parity oracle for the C++ math.
- :mod:`trackdlo_tpu.io` — sequences (synthetic renderer, npz store).
"""

__version__ = "0.1.0"

from trackdlo_tpu.config import CameraIntrinsics, TrackerParams, eval_params, live_params

__all__ = [
    "TrackerParams",
    "CameraIntrinsics",
    "live_params",
    "eval_params",
]

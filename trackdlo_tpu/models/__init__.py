"""Tracker model families.

- :mod:`trackdlo_tpu.models.trackdlo` — the flagship full TrackDLO tracker
  (pre-registration + correspondence priors + visibility-aware EM).
- :mod:`trackdlo_tpu.models.gltp` — GLTP registration (CPD + LLE
  regularization, the reference's pre-processing pass as a standalone model).
- :mod:`trackdlo_tpu.models.cpd` — plain CPD/GMM registration (cold-start
  `reg`, utils.cpp:21-82).
"""

from trackdlo_tpu.models.trackdlo import Tracker, TrackerState, build_step_fn

__all__ = ["Tracker", "TrackerState", "build_step_fn"]

"""Sequence recorder (reference: utils/collect_pointcloud.py, which pickled
point clouds / images / results per keypress). Here: an appending recorder
that snapshots frames + tracker outputs into one compressed npz."""

from __future__ import annotations

import numpy as np


class SequenceRecorder:
    def __init__(self):
        self.rgbs = []
        self.depths = []
        self.results = []
        self.points = []

    def record(self, rgb, depth, step_outputs=None):
        self.rgbs.append(np.asarray(rgb))
        self.depths.append(np.asarray(depth))
        if step_outputs is not None:
            self.results.append(np.asarray(step_outputs.y))
            pts = np.asarray(step_outputs.points)
            msk = np.asarray(step_outputs.points_mask)
            self.points.append(pts[msk])

    def save(self, path: str):
        arrays = {
            "rgbs": np.stack(self.rgbs),
            "depths": np.stack(self.depths),
        }
        if self.results:
            arrays["results"] = np.stack(self.results)
        np.savez_compressed(path, **arrays)
        return path

    def __len__(self):
        return len(self.rgbs)

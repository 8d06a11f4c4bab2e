"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count per the scaling-book recipe.
"""

import os

# The environment force-sets JAX_PLATFORMS=axon (the tunneled TPU); a plain
# env override is ignored, so pin the platform through jax.config before any
# other jax-importing module loads.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

import numpy as np
import pytest

from trackdlo_tpu.config import CameraIntrinsics, live_params
from trackdlo_tpu.io.sequence import SyntheticRope, render_frame


@pytest.fixture(scope="session")
def params():
    return live_params()


@pytest.fixture(scope="session")
def intrinsics():
    return CameraIntrinsics()


@pytest.fixture(scope="session")
def rope():
    return SyntheticRope()


@pytest.fixture(scope="session")
def frame0(rope, intrinsics):
    return render_frame(rope, 0.0, intrinsics)


@pytest.fixture(scope="session")
def rope_cloud(rope, params):
    """A downsampled point cloud of the rope at t=1/15, via the oracle."""
    from trackdlo_tpu.oracle.preprocess import preprocess_frame
    from trackdlo_tpu.config import CameraIntrinsics

    intr = CameraIntrinsics()
    rgb, depth = render_frame(rope, 1.0 / 15.0, intr)
    return preprocess_frame(rgb, depth, params, intr)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)

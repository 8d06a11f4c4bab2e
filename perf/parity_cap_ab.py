"""A/B the parity-split candidate cap on the full on-device scan step.

Occupancy across the six scenarios peaks at 192 candidates/channel
(perf/parity_stage_bench.py), so caps 1024/2048 keep 5x/10x headroom.
Measures _measure_scan(parity_split=True) at several caps plus the
non-parity default for reference.
"""

import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_step(params, n_frames=64, k_pair=(16, 64)):
    import jax
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.models.trackdlo import _step_impl, init_state
    from trackdlo_tpu.ops.preprocess import default_cell_px

    intr = CameraIntrinsics()
    rope = SyntheticRope()
    cell = default_cell_px(params.downsample_leaf_size, intr.fx)
    step = functools.partial(_step_impl, params=params, intr=intr, cell_px=cell)

    rgbs, depths = [], []
    for t in range(n_frames):
        rgb, depth = render_frame(rope, (t + 1) / 15.0, intr)
        rgbs.append(rgb)
        depths.append(depth)
    rgbs = jnp.asarray(np.stack(rgbs))
    depths = jnp.asarray(np.stack(depths))
    occ = jnp.ones((intr.height, intr.width), bool)
    state0 = init_state(rope.nodes(0.0, params.M), params)

    def run_k(k):
        @jax.jit
        def run(s0, rgbs_a, depths_a):
            def body(s, i):
                ns, _ = step(s, rgbs_a[i % n_frames], depths_a[i % n_frames], occ)
                return ns, ns.sigma2

            s, _ = jax.lax.scan(body, s0, jnp.arange(k))
            return s

        s = run(state0, rgbs, depths)
        _ = np.asarray(s.y)
        t0 = time.perf_counter()
        s = run(state0, rgbs, depths)
        y = np.asarray(s.y)
        assert np.isfinite(y).all()
        return time.perf_counter() - t0

    slopes = []
    for _ in range(3):
        ts = run_k(k_pair[0])
        tl = run_k(k_pair[1])
        slopes.append(max((tl - ts) / (k_pair[1] - k_pair[0]), 1e-6))
    return sorted(slopes)[1] * 1000


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from trackdlo_tpu.config import live_params

    print("backend:", jax.default_backend())
    base = live_params()
    for name, params in (
        ("default_noparity", base),
        ("parity_cap4096", dataclasses.replace(base, parity_split=True)),
        ("parity_cap2048", dataclasses.replace(
            base, parity_split=True, parity_candidate_cap=2048)),
        ("parity_cap1024", dataclasses.replace(
            base, parity_split=True, parity_candidate_cap=1024)),
    ):
        ms = scan_step(params)
        print(f"{name:20s} {ms:.3f} ms/frame ({1000.0/ms:.0f} fps)")


if __name__ == "__main__":
    main()

"""Masked-iteration EM accounting under vmap (VERDICT r1 #6).

Under `jax.vmap`, the EM `lax.while_loop` runs until the SLOWEST stream
converges: every already-converged stream pays full-trip work. This script
quantifies that waste on an 8-stream batch with deliberately different
convergence ages (staggered frame offsets + one cold stream), reporting

- per-stream iteration counts when run individually,
- the batch trip count (= max),
- the waste fraction sum(max - it_i) / (B * max).

Why the waste is NOT recoverable by masking on one chip: vmapped lanes run
in SIMD lockstep — a per-stream freeze (lax.cond / where) still executes the
full tile work for every lane, so masked iterations cost the same as live
ones on the VPU/MXU. The waste IS recovered when streams are sharded over
the mesh's `data` axis (parallel/sharding.py): each device runs its own
while_loop trip count (independent programs), which is the production
multi-chip layout. On one chip the fix is bounding the spread (warm-started
streams converge within a few trips of each other, see the histogram).

Usage: python perf/em_iteration_histogram.py [--cpu]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.models.trackdlo import Tracker, init_state
    from trackdlo_tpu.parallel.sharding import build_batched_step_fn, replicate_state

    params = live_params(max_points=512, downsample_cell_px=4)
    intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=80.0, cy=60.0, width=160, height=120)
    rope = SyntheticRope()
    tracker = Tracker(params, intr)

    # 8 streams with different convergence ages: streams 0-6 warm (staggered
    # small motion), stream 7 cold (state from t=0 sees the frame at t=0.6 —
    # a large jump needing many EM iterations).
    b = 8
    offsets = [0.01 * i for i in range(b - 1)] + [0.6]
    frames = [render_frame(rope, 1 / 15.0 + off, intr, rope_pixel_radius=3)
              for off in offsets]

    # Individual runs: per-stream iteration counts.
    per_stream = []
    for rgb, depth in frames:
        st = init_state(rope.nodes(0.0, params.M), params)
        _, out = tracker.step(st, rgb, depth)
        per_stream.append(int(out.iterations))
    mx = max(per_stream)

    # Batched run: one shared while_loop.
    fn = build_batched_step_fn(params, intr)
    rgbs = jnp.asarray(np.stack([f[0] for f in frames]))
    depths = jnp.asarray(np.stack([f[1] for f in frames]))
    occ = jnp.ones((b, intr.height, intr.width), bool)
    bstate = replicate_state(init_state(rope.nodes(0.0, params.M), params), b)
    _, bout = fn(bstate, rgbs, depths, occ)
    batch_iters = np.asarray(bout.iterations)

    waste = sum(mx - it for it in per_stream) / (b * mx)
    print("per-stream main-EM iterations (individual):", per_stream)
    print("batched run iteration counts:", batch_iters.tolist())
    print(f"batch trip count = max = {batch_iters.max()}")
    print(f"lockstep waste fraction: {waste:.1%} of batch EM trip-work")
    print("(recovered when streams shard over the mesh data axis — each")
    print(" device runs its own while_loop; see docs/ALGORITHM.md)")


if __name__ == "__main__":
    main()

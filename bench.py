"""Benchmark: tracked frames/sec/chip on the full per-frame pipeline.

Measures the complete mask → deproject → downsample → visibility →
pre-registration → priors → main-EM chain (the reference's whole per-frame
callback) as one jitted graph on synthetic 720p RGB-D frames of a 45-node
rope, batched across streams to fill the chip. Frames are staged on-device
(double-buffered feed assumption; there are no host round-trips inside the
per-frame graph).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

Baseline target: >= 500 tracked frames/sec/chip (BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def build_inputs(batch, n_frames, params, intr):
    import jax.numpy as jnp

    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame

    rope = SyntheticRope()
    frames = []
    for t in range(n_frames):
        rgbs, depths = [], []
        for b in range(batch):
            rgb, depth = render_frame(rope, (t + 1) / 15.0 + 0.003 * b, intr)
            rgbs.append(rgb)
            depths.append(depth)
        frames.append(
            (jnp.asarray(np.stack(rgbs)), jnp.asarray(np.stack(depths)))
        )
    occ = jnp.ones((batch, intr.height, intr.width), bool)
    return rope, frames, occ


def bench(batch=8, n_frames=4, iters=30, warmup=3):
    import jax

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.models.trackdlo import init_state
    from trackdlo_tpu.parallel.sharding import build_batched_step_fn, replicate_state

    params = live_params()
    intr = CameraIntrinsics()
    fn = build_batched_step_fn(params, intr)

    rope, frames, occ = build_inputs(batch, n_frames, params, intr)
    state0 = replicate_state(
        init_state(rope.nodes(0.0, params.M), params), batch
    )

    # Warmup / compile.
    state = state0
    for i in range(warmup):
        rgb, depth = frames[i % n_frames]
        state, _ = fn(state, rgb, depth, occ)
    jax.block_until_ready(state)

    state = jax.tree.map(lambda v: v.copy(), state)
    t0 = time.perf_counter()
    for i in range(iters):
        rgb, depth = frames[i % n_frames]
        state, out = fn(state, rgb, depth, occ)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    return fps, dt / iters


def main():
    best_fps = 0.0
    detail = {}
    for batch in (1, 8):
        try:
            fps, step_ms = bench(batch=batch)
        except Exception as e:  # keep the bench robust on small hosts
            print(f"batch={batch} failed: {e}", file=sys.stderr)
            continue
        detail[f"batch{batch}_fps"] = round(fps, 1)
        best_fps = max(best_fps, fps)

    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_sec_per_chip",
                "value": round(best_fps, 1),
                "unit": "frames/s/chip",
                "vs_baseline": round(best_fps / 500.0, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()

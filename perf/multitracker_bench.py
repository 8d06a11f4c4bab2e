"""MultiTracker (time-multiplexed streams) vs the vmapped batch, measured.

VERDICT r2 weak #6: models/multi.py's production guidance rested on
inference. This measures both on the real TPU with the same host-dispatch
methodology (chained async dispatches, device->host fetch at the end, slope
between short and long runs, median of 3):

- multi8:  8 streams stepped sequentially through ONE compiled single-stream
           step (MultiTracker.step_all semantics);
- vmap8:   8 streams stepped as one vmapped batch (build_batched_step_fn);
- single:  1 stream, the per-stream latency floor.

Writes perf/multitracker_bench.json and prints the table.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(run, k_pair=(8, 32)):
    ts = []
    for k in k_pair:
        ts.append(run(k))
    return (ts[1] - ts[0]) / (k_pair[1] - k_pair[0])


def med3(run, k_pair=(8, 32)):
    return float(np.median([slope(run, k_pair) for _ in range(3)]))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.models.multi import MultiTracker
    from trackdlo_tpu.models.trackdlo import init_state
    from trackdlo_tpu.parallel.sharding import (
        build_batched_step_fn,
        replicate_state,
    )

    print("backend:", jax.default_backend())
    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    n_frames, B = 32, 8

    frames = []
    for t in range(n_frames):
        rb, db = [], []
        for b in range(B):
            rgb, depth = render_frame(rope, (t + 1) / 15.0 + 0.003 * b, intr)
            rb.append(rgb)
            db.append(depth)
        frames.append((jnp.asarray(np.stack(rb)), jnp.asarray(np.stack(db))))
    occ1 = jnp.ones((intr.height, intr.width), bool)
    occB = jnp.ones((B, intr.height, intr.width), bool)
    nodes0 = rope.nodes(0.0, params.M)
    results = {}

    # --- multi8: sequential multiplexing through one compiled step --------
    mt = MultiTracker(params, intr)
    for b in range(B):
        mt.add_stream(f"cam{b}", init_nodes=nodes0)
    step1 = mt.tracker._step  # the shared compiled single-stream step

    def run_multi(k):
        states = {b: mt.tracker.init_from_nodes(nodes0) for b in range(B)}
        t0 = time.perf_counter()
        for i in range(k):
            rgbs, depths = frames[i % n_frames]
            for b in range(B):
                states[b], _ = step1(states[b], rgbs[b], depths[b], occ1)
        for b in range(B):
            assert np.isfinite(np.asarray(states[b].y)).all()
        return time.perf_counter() - t0

    run_multi(2)  # compile + warm
    s = med3(run_multi)
    results["multi8_ms_per_frameset"] = s * 1000
    results["multi8_fps"] = B / s

    # --- vmap8: one launch per frame set ----------------------------------
    fnB = build_batched_step_fn(params, intr)
    state0B = replicate_state(init_state(nodes0, params), B)

    def run_vmap(k):
        state = jax.tree.map(lambda v: v.copy(), state0B)
        t0 = time.perf_counter()
        for i in range(k):
            rgbs, depths = frames[i % n_frames]
            state, _ = fnB(state, rgbs, depths, occB)
        assert np.isfinite(np.asarray(state.y)).all()
        return time.perf_counter() - t0

    run_vmap(2)
    s = med3(run_vmap)
    results["vmap8_ms_per_frameset"] = s * 1000
    results["vmap8_fps"] = B / s

    # --- single-stream latency floor --------------------------------------
    def run_single(k):
        st = mt.tracker.init_from_nodes(nodes0)
        t0 = time.perf_counter()
        for i in range(k):
            rgbs, depths = frames[i % n_frames]
            st, _ = step1(st, rgbs[0], depths[0], occ1)
        assert np.isfinite(np.asarray(st.y)).all()
        return time.perf_counter() - t0

    run_single(2)
    s = med3(run_single)
    results["single_ms_per_frame"] = s * 1000
    results["single_fps"] = 1.0 / s

    for k, v in results.items():
        print(f"{k:28s} {v:.3f}")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multitracker_bench.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()

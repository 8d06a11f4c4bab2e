"""Benchmark: tracked frames/sec/chip on the full per-frame pipeline.

Measures the complete mask → deproject → downsample → visibility →
pre-registration → priors → main-EM chain (the reference's whole per-frame
callback) as one jitted graph on synthetic 720p RGB-D frames of a 45-node
rope, batched across streams to fill the chip.

Methodology (robust to async dispatch/remote-tunnel semantics):
- steps are CHAINED (each consumes the previous state), so K steps cannot
  overlap;
- each timed run ends with a device→host fetch of the (M, 3) result, forcing
  real completion;
- per-step time is the SLOPE between a short and a long run, cancelling the
  constant dispatch/fetch latency of tunnelled TPU backends.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

Baseline target: >= 500 tracked frames/sec/chip (BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def _measure(batch, k_short=8, k_long=40):
    import jax

    try:  # persistent cache: repeat runs skip the slow (remote) compiles
        jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.models.trackdlo import init_state
    from trackdlo_tpu.parallel.sharding import build_batched_step_fn, replicate_state

    params = live_params()
    intr = CameraIntrinsics()
    fn = build_batched_step_fn(params, intr)

    rope = SyntheticRope()
    n_frames = 40  # monotonic motion: no backward frame wraps (see _measure_scan)
    frames = []
    for t in range(n_frames):
        rgbs, depths = [], []
        for b in range(batch):
            rgb, depth = render_frame(rope, (t + 1) / 15.0 + 0.003 * b, intr)
            rgbs.append(rgb)
            depths.append(depth)
        frames.append((jnp.asarray(np.stack(rgbs)), jnp.asarray(np.stack(depths))))
    occ = jnp.ones((batch, intr.height, intr.width), bool)
    state0 = replicate_state(init_state(rope.nodes(0.0, params.M), params), batch)

    def run(k):
        # Fresh copy: the step donates its state argument.
        state = jax.tree.map(lambda v: v.copy(), state0)
        t0 = time.perf_counter()
        for i in range(k):
            rgb, depth = frames[i % n_frames]
            state, _ = fn(state, rgb, depth, occ)
        y_host = np.asarray(state.y)  # forces real completion
        assert np.isfinite(y_host).all()
        return time.perf_counter() - t0

    run(2)  # compile + warm
    # Median of three slopes (see _measure_scan: single-hiccup robustness).
    slopes = []
    for _ in range(3):
        t_short = run(k_short)
        t_long = run(k_long)
        slopes.append(max((t_long - t_short) / (k_long - k_short), 1e-6))
    per_step = sorted(slopes)[1]
    return batch / per_step, per_step * 1000.0


def _measure_scan(n_frames=64, k_short=16, k_long=64, parity_split=None):
    """Pure on-device throughput: frames pre-staged on device (the
    double-buffered-feed production shape), the step chained over them
    inside ONE jitted lax.scan — no per-step host dispatch at all.

    Frames advance MONOTONICALLY at the camera rate (1/15 s of rope motion
    apart; n_frames >= k_long so the sequence never wraps backward — a wrap
    is a 0.2+ s rope jump that inflates EM iteration counts far beyond
    steady-state tracking). This measures warm production tracking: the EM
    converges in a few iterations per frame, exactly as the reference's
    "Iteration until convergence" log shows."""
    import functools

    import jax
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.models.trackdlo import _step_impl, init_state
    from trackdlo_tpu.ops.preprocess import default_cell_px

    params = live_params()
    if parity_split is not None:
        # None = the live default (parity_split on since round 3: the one
        # default profile is the <=1 mm exact-PCL-VoxelGrid pipeline);
        # False = the coarse cell-pooling variant, kept as a detail row.
        import dataclasses

        params = dataclasses.replace(params, parity_split=parity_split)
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
        # Frames are jit ARGUMENTS, not closure constants: closed-over device
        # arrays get baked into the HLO, and 64 staged 720p frames exceed the
        # remote-compile request limit (HTTP 413) on tunnelled backends.
        @jax.jit
        def run(s0, rgbs_a, depths_a):
            def body(s, i):
                ns, _ = step(s, rgbs_a[i % n_frames], depths_a[i % n_frames], occ)
                return ns, ns.sigma2

            s, _ = jax.lax.scan(body, s0, jnp.arange(k))
            return s

        s = run(state0, rgbs, depths)
        _ = np.asarray(s.y)  # compile + warm, forced completion
        t0 = time.perf_counter()
        s = run(state0, rgbs, depths)
        y = np.asarray(s.y)
        assert np.isfinite(y).all()
        return time.perf_counter() - t0

    # Median of three slopes: a single tunnel latency hiccup landing in the
    # short (long) run under- (over-)states one slope by 2-3x — observed
    # 0.40 vs a reproducible 0.98 ms/frame. Repeat timings share the
    # compiled graphs, so the extra cost is a few hundred ms of device time.
    slopes = []
    for _ in range(3):
        t_short = run_k(k_short)
        t_long = run_k(k_long)
        slopes.append(max((t_long - t_short) / (k_long - k_short), 1e-6))
    per_frame = sorted(slopes)[1]
    return 1.0 / per_frame, per_frame * 1000.0


def _measure_scan_batched(batch=8, n_frames=32, k_short=8, k_long=32,
                          cohort_size=None):
    """On-device multi-stream throughput: the vmapped step chained inside ONE
    jitted lax.scan over pre-staged frame batches — the "fill the chip with
    streams" number, free of per-step host dispatch. Frames advance
    monotonically (no backward wraps, see _measure_scan).

    ``cohort_size``: split the batch into independent convergence cohorts
    (parallel/sharding.build_batched_step_fn): each cohort's EM while_loops
    run to their OWN slowest stream instead of the whole batch's —
    E[max trips] grows with lockstep width (6.4 at b8 vs 7.1 at b16,
    perf/batch_predication_study.json), and cohorts are bitwise-identical
    per stream."""
    import jax
    import jax.numpy as jnp

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.models.trackdlo import init_state
    from trackdlo_tpu.parallel.sharding import build_batched_step_fn, replicate_state
    import functools

    from trackdlo_tpu.models.trackdlo import _step_impl
    from trackdlo_tpu.ops.preprocess import default_cell_px

    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    cell = default_cell_px(params.downsample_leaf_size, intr.fx)
    step = functools.partial(_step_impl, params=params, intr=intr, cell_px=cell)
    vstep_one = jax.vmap(step)
    if cohort_size is None or cohort_size >= batch:
        vstep = vstep_one
    else:

        def vstep(state, rgb, depth, occ):
            outs = []
            for i in range(0, batch, cohort_size):
                sl = slice(i, i + cohort_size)
                outs.append(
                    vstep_one(
                        jax.tree.map(lambda v: v[sl], state),
                        rgb[sl], depth[sl], occ[sl],
                    )
                )
            return jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *outs)

    rgbs, depths = [], []
    for t in range(n_frames):
        rb, db = [], []
        for b in range(batch):
            rgb, depth = render_frame(rope, (t + 1) / 15.0 + 0.003 * b, intr)
            rb.append(rgb)
            db.append(depth)
        rgbs.append(np.stack(rb))
        depths.append(np.stack(db))
    rgbs = jnp.asarray(np.stack(rgbs))  # (F, B, H, W, 3)
    depths = jnp.asarray(np.stack(depths))
    occ = jnp.ones((batch, intr.height, intr.width), bool)
    state0 = replicate_state(init_state(rope.nodes(0.0, params.M), params), batch)

    def run_k(k):
        # Frames as jit arguments (see _measure_scan: constant-baking blows
        # the remote-compile size limit).
        @jax.jit
        def run(s0, rgbs_a, depths_a):
            def body(s, i):
                ns, _ = vstep(s, rgbs_a[i % n_frames], depths_a[i % n_frames], occ)
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

    # Median of three slopes (see _measure_scan: single-hiccup robustness).
    slopes = []
    for _ in range(3):
        t_short = run_k(k_short)
        t_long = run_k(k_long)
        slopes.append(max((t_long - t_short) / (k_long - k_short), 1e-6))
    per_step = sorted(slopes)[1]
    return batch / per_step, per_step * 1000.0


def _measure_all(batches=(1, 8)):
    results = {}
    # Un-skippable compiled-kernel numerics audit (VERDICT r2 weak #3): two
    # silent Mosaic mis-lowerings were caught by this audit in rounds 1-2;
    # run it before timing so a third can't ship inside a good-looking
    # throughput number. Failures zero the headline in main().
    try:
        import os
        import sys as _sys

        _sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "perf"))
        from tpu_kernel_numerics import audit, audit_failures

        audit_res = audit()
        results["kernel_audit"] = audit_res
        results["kernel_audit_failures"] = audit_failures(audit_res)
    except Exception as e:
        results["kernel_audit_error"] = type(e).__name__
    try:
        fps, ms = _measure_scan()
        results["ondevice_scan"] = [fps, ms]
    except Exception as e:
        results["ondevice_scan_error"] = type(e).__name__
    for b in (8,):
        try:
            fps, ms = _measure_scan_batched(batch=b)
            results[f"ondevice_scan_b{b}"] = [fps, ms]
        except Exception as e:
            results[f"ondevice_scan_b{b}_error"] = type(e).__name__
    # Large-batch rows (VERDICT r4 weak #6): b16 in two loop schedules —
    # independent convergence cohorts of 8 (the shipped large-batch mode,
    # parallel/sharding cohort_size) vs one lockstep while_loop — so the
    # E[max-trips] tax of wide lockstep batches is a recorded fact, not a
    # sampling-theory prediction. n_frames=16 keeps the staged-frame bytes
    # equal to the b8 row (16 streams x 16 frames); k_long=16 avoids
    # backward frame wraps (see _measure_scan).
    for tag, csize in (("ondevice_scan_b16", 8), ("ondevice_scan_b16_lockstep", None)):
        try:
            fps, ms = _measure_scan_batched(
                batch=16, n_frames=16, k_short=4, k_long=16, cohort_size=csize
            )
            results[tag] = [fps, ms]
        except Exception as e:
            results[f"{tag}_error"] = type(e).__name__
    # The coarse cell-pooling variant (parity_split=False; ~2.4 mm
    # closed-loop vs the default's 0.31 mm) as an informational row — the
    # headline default IS the exact-parity pipeline since round 3. b16 was
    # dropped to keep the compile budget flat — it measured consistently
    # worse than b8 (0.70 vs 0.61 ms/frame).
    try:
        fps, ms = _measure_scan(parity_split=False)
        results["ondevice_scan_noparity"] = [fps, ms]
    except Exception as e:
        results["ondevice_scan_noparity_error"] = type(e).__name__
    for batch in batches:
        try:
            fps, ms = _measure(batch)
            results[f"batch{batch}"] = [fps, ms]
        except Exception as e:  # keep going; one transient backend hiccup
            results[f"batch{batch}_error"] = type(e).__name__
    return results


def _measure_in_subprocess(timeout_s=2200):
    """Run all measurements in one child process (shared warm backend) so a
    hung TPU tunnel cannot wedge the whole benchmark."""
    import subprocess

    code = (
        "import json, bench\n"
        "print('BENCH_RESULT ' + json.dumps(bench._measure_all()))\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=timeout_s,
        cwd=__file__.rsplit("/", 1)[0] or ".",
    )
    for line in proc.stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            return json.loads(line[len("BENCH_RESULT "):])
    raise RuntimeError(proc.stderr[-2000:])


def main():
    best_fps = 0.0
    detail = {}
    results = {}
    for attempt in range(2):
        try:
            results = _measure_in_subprocess()
            if any(not k.endswith("_error") for k in results):
                break
        except Exception as e:
            print(f"attempt {attempt} failed: {type(e).__name__}: {e}", file=sys.stderr)
    audit_failures = results.pop("kernel_audit_failures", [])
    audit_res = results.pop("kernel_audit", {})
    for k, v in audit_res.items():
        detail[f"audit_{k}"] = round(v, 9) if isinstance(v, float) else v
    if audit_failures:
        detail["kernel_audit_failed"] = audit_failures
    for key, val in results.items():
        if key.endswith("_error"):
            detail[key] = val
            continue
        fps, step_ms = val
        detail[f"{key}_fps"] = round(fps, 1)
        detail[f"{key}_step_ms"] = round(step_ms, 3)
        # Headline only from the dispatch-free on-device scan modes OF THE
        # DEFAULT PROFILE: the host-dispatch-chained modes' short/long slope
        # can under-measure when a tunnel latency spike lands in the short
        # run (observed 0.27 ms/step vs a physically consistent 0.64), which
        # would overstate the result, and the coarse noparity variant is not
        # the shipped profile — both stay in detail as sanity checks.
        if key.startswith("ondevice_scan") and not key.startswith(
            "ondevice_scan_noparity"
        ):
            best_fps = max(best_fps, fps)
    if best_fps == 0.0:
        # All scan modes errored (tunnel outage): fall back to the
        # dispatch-chained modes rather than reporting zero.
        for key, val in results.items():
            if not key.endswith("_error"):
                best_fps = max(best_fps, val[0])

    if audit_failures:
        # A kernel computing wrong values makes the throughput number
        # meaningless — hard-fail rather than publish it.
        best_fps = 0.0

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

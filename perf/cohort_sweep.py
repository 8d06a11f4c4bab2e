"""Cohort-size sweep: the lockstep-trip tax vs the row-packing economy.

Round-5 close-out carried this open: bench records b16 cohorts-of-8 beating
b16 lockstep (2329 vs 2200 fps), but cohort sizes <8 — down to cohort=1,
which IS per-stream early-exit (every stream's EM while_loop runs to its
own convergence) — were never measured. The trade being priced:

  - smaller cohorts run FEWER trips (E[max over c] of the per-stream trip
    distribution: ~3.9 at c=1 -> 6.4 at c=8 -> 7.1 at c=16), but
  - smaller cohorts lose the row-packed E-step's batch economy (the b8
    row-packed kernel does 8 streams for ~2.9x one stream's cost), and the
    independent while_loops SERIALIZE on the single-program TPU.

This probe measures the full production scan throughput for each (batch,
cohort) config on the real TPU, and places each against the naive
trip-count prediction cost(c) ~ n_cohorts * E[max_c trips] * per_trip(c)
derived from the recorded per-stream trip samples (perf/trip_counts.json)
— so the next person knows whether the sweep's shape is trip physics or
something else. Usage (TPU): python perf/cohort_sweep.py
Writes perf/cohort_sweep.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emax_table(cohort_sizes, rng_draws=20000):
    """E[max over c] of the pre-EM per-stream trip distribution, bootstrapped
    from the 40 recorded production trip counts (perf/trip_counts.json,
    jit pre-EM column)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "trip_counts.json")
    with open(path) as f:
        rows = json.load(f)["rows"]
    samples = np.array([r[0] for r in rows], float)  # jit pre-EM trips
    rng = np.random.default_rng(0)
    out = {}
    for c in cohort_sizes:
        draw = rng.choice(samples, size=(rng_draws, c))
        out[c] = float(draw.max(axis=1).mean())
    return out


def main():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import jax

    try:  # persistent cache (bench._measure sets this; the batched scans
        # don't) — without it every (batch, cohort) config recompiles
        # remotely, ~1-3 min each over the tunnel.
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/trackdlo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import bench

    configs = [
        # (batch, cohort_size, n_frames, k_short, k_long)
        (8, None, 32, 8, 32),
        (8, 4, 32, 8, 32),
        (8, 2, 32, 8, 32),
        (8, 1, 32, 8, 32),
        (16, None, 16, 4, 16),
        (16, 8, 16, 4, 16),
        (16, 4, 16, 4, 16),
    ]
    emax = emax_table([1, 2, 4, 8, 16])

    results = {"E_max_trips": {str(k): round(v, 3) for k, v in emax.items()}}
    for batch, csize, nf, ks, kl in configs:
        tag = f"b{batch}_c{csize if csize else batch}"
        try:
            fps, ms = bench._measure_scan_batched(
                batch=batch, n_frames=nf, k_short=ks, k_long=kl,
                cohort_size=csize,
            )
            results[tag] = {"fps": round(fps, 1), "ms_per_step": round(ms, 4)}
            print(f"{tag:8s} {fps:8.1f} fps/chip   {ms:7.3f} ms/step", flush=True)
        except Exception as e:
            results[tag] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"{tag:8s} ERROR {type(e).__name__}: {e}", flush=True)

    # Naive trip-physics prediction, relative to the lockstep row: EM cost
    # scales with n_cohorts * E[max_c] * per_trip(c); per_trip(c) from the
    # row-packing economy measured at b8 (2.9x one stream for 8) assumed
    # ~linear in-between: per_trip(c) ~ (1 + (c-1)*(2.9-1)/7) * per_trip(1).
    def em_rel(batch, c):
        pt = 1.0 + (c - 1) * (2.9 - 1.0) / 7.0
        return (batch // c) * emax[c] * pt

    for batch in (8, 16):
        base = em_rel(batch, min(batch, 8) if batch == 16 else batch)
        preds = {
            f"c{c}": round(em_rel(batch, c) / base, 3)
            for c in (1, 2, 4, 8, 16)
            if c <= batch
        }
        results[f"b{batch}_em_cost_prediction_rel"] = preds
        print(f"b{batch} EM-cost prediction (rel to shipped): {preds}")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "cohort_sweep.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

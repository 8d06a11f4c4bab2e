"""Trajectory-level cross-check against the COMPILED reference C++
(VERDICT r4 missing #1 / next-round #2).

Drives tests/test_cpp_crosscheck.closed_loop_cpp_oracle — the compiled
unmodified reference (trackdlo.cpp:900-999) iterated in closed loop over
the synthetic production sequence (M=45, live config, clouds from the
repo's own f64 preprocessing) — and records the trajectory comparison for
docs/PARITY.md:

  oracle vs C++ : f64 NumPy oracle, per-frame mean node deviation
  jitted vs C++ : the shipped f32 jitted tracker (CPU backend)

Usage: python perf/cpp_trajectory_parity.py [--frames 30]
Writes perf/cpp_trajectory_parity.json.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tests.test_cpp_crosscheck import (
        _skip_reason, closed_loop_cpp_oracle,
    )

    reason = _skip_reason()
    if reason:
        print(f"cannot run: {reason}")
        sys.exit(1)

    out = {}
    for name, kw in {
        "unoccluded": dict(n_frames=args.frames, with_jit=True),
        "occluded_mid": dict(n_frames=18, occlude=(5, 12, 500, 800),
                             with_jit=True),
    }.items():
        r = closed_loop_cpp_oracle(**kw)
        dev = np.asarray(r["dev_cpp_oracle"])
        jd = np.asarray(r["dev_jit_cpp"])
        out[name] = {
            "frames": len(dev),
            "n_points_mean": float(np.mean(r["n_points"])),
            "states_seen": sorted(set(r["states"])),
            "oracle_vs_cpp_mean_m": float(dev.mean()),
            "oracle_vs_cpp_max_m": float(dev.max()),
            "jit_vs_cpp_mean_mm": float(jd.mean() * 1000),
            "jit_vs_cpp_max_mm": float(jd.max() * 1000),
            "jit_vs_cpp_final_mm": float(jd[-1] * 1000),
        }
        print(f"{name}: frames {len(dev)} states {sorted(set(r['states']))} "
              f"N~{np.mean(r['n_points']):.0f}")
        print(f"  oracle vs C++  mean {dev.mean():.3e} m  max {dev.max():.3e} m")
        print(f"  jitted vs C++  mean {jd.mean()*1000:.3f} mm  "
              f"max {jd.max()*1000:.3f} mm  final {jd[-1]*1000:.3f} mm")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "cpp_trajectory_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

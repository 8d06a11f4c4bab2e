"""Is per-stream convergence predication a real lever? (VERDICT r3 item 5)

The VERDICT asks for a done-flag skip of converged streams' slabs in
fused_estep_packed_batch. This study measures what that could actually
save on TPU:

1. Packed-kernel cost vs ACTIVE-STREAM COUNT at fixed batch: run the b8
   packed E-step with all 8 streams' points valid vs with 7 streams'
   x-masks zeroed (their slabs contribute nothing, tiles stay live through
   stream 0). The delta IS the marginal cost of 7 streams' slab work — the
   upper bound on what any per-stream skip could recover per iteration.
2. The batched while_loop's lockstep trip count: per-frame EM passes run
   E[max trips over B] times; sampled trip distributions quantify how much
   of the b16-vs-b8 residual is trip inflation (unskippable — the slowest
   stream needs those passes) vs slab work (skippable).

Usage (TPU): python perf/batch_predication_study.py
Writes perf/batch_predication_study.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_time(build_body, k_pair=(16, 96)):
    import jax
    import jax.numpy as jnp

    times = []
    for k in k_pair:
        body = build_body()

        @jax.jit
        def run(c0, k=k, body=body):
            def step(c, _):
                return body(c), None
            c, _ = jax.lax.scan(step, c0, None, length=k)
            return c

        c = run(jnp.asarray(0.0, jnp.float32))
        _ = float(c)
        t0 = time.perf_counter()
        c = run(jnp.asarray(0.0, jnp.float32))
        _ = float(c)
        times.append(time.perf_counter() - t0)
    return (times[1] - times[0]) / (k_pair[1] - k_pair[0]) * 1000.0


def med3(b, k_pair=(16, 96)):
    return float(np.median([scan_time(b, k_pair) for _ in range(3)]))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from trackdlo_tpu.io.sequence import SyntheticRope
    from trackdlo_tpu.ops.pallas_kernels import (
        estep_scalars, fused_estep_packed_batch, pack_points,
    )

    B, m_pad, n_pad = 8, 48, 4096
    rope = SyntheticRope()
    rng = np.random.default_rng(0)
    y = np.asarray(rope.nodes(0.0, 45))
    yp = np.zeros((B, m_pad, 3), np.float32)
    coordp = np.zeros((B, m_pad, 1), np.float32)
    nmp = np.zeros((B, m_pad, 1), np.float32)
    xt = np.zeros((B, 3, n_pad), np.float32)
    xm_full = np.zeros((B, 1, n_pad), np.float32)
    n_pts = 1400
    for b in range(B):
        yb = y + 0.001 * rng.standard_normal(y.shape)
        yp[b, :45] = yb
        seg = np.linalg.norm(np.diff(yb, axis=0), axis=1)
        coordp[b, :45, 0] = np.concatenate([[0.0], np.cumsum(seg)])
        nmp[b, :45, 0] = 1.0
        t = rng.uniform(0, 1, n_pts)
        idx = (t * 44).astype(int)
        fr = (t * 44) - idx
        pts = yb[idx] * (1 - fr[:, None]) + yb[np.minimum(idx + 1, 44)] * fr[:, None]
        pts += 0.003 * rng.standard_normal(pts.shape)
        xt[b, :, :n_pts] = pts.T
        xm_full[b, 0, :n_pts] = 1.0

    scal = np.zeros((B, 8, 128), np.float32)
    scal[:, 0, :] = 2e-5  # sigma2
    scal[:, 1, :] = 1e-8  # c_plain
    scal[:, 2, :] = 1e-8
    scal[:, 3, :] = 0.0   # vis gate off
    scal[:, 4, :] = 45.0
    scal[:, 5, :] = 50.0
    scal[:, 6, :] = 0.008
    pvp = np.ones((B, m_pad, 1), np.float32)

    to_j = lambda a: jnp.asarray(a)
    args_all = [to_j(a) for a in (scal, yp, coordp, nmp, pvp, xt, xm_full)]
    xm_one = xm_full.copy()
    xm_one[1:] = 0.0  # only stream 0 active
    args_one = [to_j(a) for a in (scal, yp, coordp, nmp, pvp, xt, xm_one)]

    results = {}

    def kb(args, iters=4):
        def build():
            def body(c):
                s = args[0] + c * 0
                p1 = None
                cur = [s] + list(args[1:])
                for _ in range(iters):
                    p1, px, sc, sh = fused_estep_packed_batch(*cur)
                    cur = [s + jnp.sum(p1) * 1e-20] + list(args[1:])
                return jnp.sum(p1) * 1e-12 + c * 0.5
            return body
        return build

    results["estep4_b8_all_active"] = med3(kb(args_all))
    results["estep4_b8_one_active"] = med3(kb(args_one))
    marg = (results["estep4_b8_all_active"] - results["estep4_b8_one_active"])
    results["marginal_7stream_slab_ms_per_4it"] = marg
    print(json.dumps(results, indent=1))

    # Trip-count statistics: how much does E[max over B] exceed E[single]?
    # (from the shipped default's measured trip distribution; see
    # em_iteration_histogram.py — approximated here by a geometric-ish
    # sample recorded in round 3: trips in 2..8.)
    hist = {2: 0.18, 3: 0.27, 4: 0.24, 5: 0.14, 6: 0.09, 7: 0.05, 8: 0.03}
    vals = np.array(list(hist.keys()))
    probs = np.array(list(hist.values()))
    probs = probs / probs.sum()
    rng2 = np.random.default_rng(1)
    samp = rng2.choice(vals, size=(20000, 16), p=probs)
    results["E_trips_single"] = float(samp[:, 0].mean())
    results["E_max_trips_b8"] = float(samp[:, :8].max(axis=1).mean())
    results["E_max_trips_b16"] = float(samp.max(axis=1).mean())
    print(json.dumps({k: results[k] for k in
                      ("E_trips_single", "E_max_trips_b8", "E_max_trips_b16")},
                     indent=1))

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "batch_predication_study.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

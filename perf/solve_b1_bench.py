"""Unbatched (B=1) M-step solve: XLA LU vs the batched Gauss-Jordan Pallas
kernel with a batch of one.

CLAUDE.md: single 48x48 jnp.linalg.solve costs ~17 us on v5e — most of the
~23 us EM iteration. If GJ@B=1 is much cheaper, the single-stream EM should
route through it too.

Usage: python perf/solve_b1_bench.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_time(build_body, k_pair=(256, 4096)):
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


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from trackdlo_tpu.ops.pallas_kernels import gauss_jordan_solve_batched

    interp = jax.default_backend() != "tpu"
    m = 48
    rng = np.random.default_rng(0)
    a_np = rng.standard_normal((m, m)).astype(np.float32)
    a_np = a_np @ a_np.T + m * np.eye(m, dtype=np.float32)
    b_np = rng.standard_normal((m, 3)).astype(np.float32)
    a = jnp.asarray(a_np)
    b = jnp.asarray(b_np)

    # Numerics check first.
    w_lu = jnp.linalg.solve(a, b)
    w_gj = gauss_jordan_solve_batched(a[None], b[None], interpret=interp)[0]
    err = float(jnp.max(jnp.abs(w_lu - w_gj)))
    print(f"backend={jax.default_backend()} max|LU-GJ| = {err:.3e}")

    def lu_body():
        def body(c):
            w = jnp.linalg.solve(a + c * 0, b)
            return jnp.sum(w) * 1e-12 + c * 0.5
        return body

    def gj_body():
        def body(c):
            w = gauss_jordan_solve_batched(
                (a + c * 0)[None], b[None], interpret=interp
            )[0]
            return jnp.sum(w) * 1e-12 + c * 0.5
        return body

    print(f"LU  48x48 B=1: {scan_time(lu_body) * 1000:8.2f} us")
    print(f"GJ  48x48 B=1: {scan_time(gj_body) * 1000:8.2f} us")


if __name__ == "__main__":
    main()

"""Localize the compiled-mode numerics gap in the batched E-step.

Compares fused_estep_packed_batch COMPILED on TPU against the single-stream
compiled kernel (validated exact in round 2), per output and per stream,
across gate configurations. (Interpret mode on the tunnelled TPU backend is
impractically slow — do NOT use it as the reference here.)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_inputs(B, gates, rng, two_phase=True):
    import jax.numpy as jnp

    from trackdlo_tpu.ops.pallas_kernels import estep_scalars, pack_points

    m, m_pad, n = 45, 48, 1024
    ins = []
    for b in range(B):
        y = rng.uniform(-0.3, 0.3, (m, 3)).astype(np.float32)
        coord = np.cumsum(
            np.r_[0.0, np.linalg.norm(np.diff(y, axis=0), axis=1)]
        ).astype(np.float32)
        x = (y[rng.integers(0, m, n)] + rng.normal(0, 0.01, (n, 3))).astype(
            np.float32
        )
        xm = np.ones(n, bool)
        xm[900:] = False
        scal = estep_scalars(
            jnp.asarray(np.float32(0.001 * (1 + b))),
            jnp.asarray(np.float32(0.01)),
            jnp.asarray(np.float32(0.005)),
            jnp.asarray(np.float32(gates[b])),
            jnp.asarray(np.int32(m - 2 * b)),
            50.0, 0.008, two_phase,
        )
        yp = jnp.zeros((m_pad, 3)).at[:m].set(y)
        coordp = jnp.zeros((m_pad, 1)).at[:m, 0].set(coord)
        nmp = jnp.zeros((m_pad, 1)).at[:m, 0].set(1.0)
        pvp = jnp.ones((m_pad, 1))
        xt, xmp = pack_points(jnp.asarray(x), jnp.asarray(xm))
        ins.append((scal, yp, coordp, nmp, pvp, xt, xmp))
    return tuple(jnp.stack([ins[b][i] for b in range(B)]) for i in range(7))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from trackdlo_tpu.ops.pallas_kernels import (
        _fused_estep_packed_impl,
        fused_estep_packed_batch,
    )

    print("backend:", jax.default_backend())

    for name, B, gates, two_phase in (
        ("b1_gate_off", 1, [0], True),
        ("b1_gate_on", 1, [1], True),
        ("b2_gates_01", 2, [0, 1], True),
        ("b8_mixed", 8, [b % 2 for b in range(8)], True),
        ("b8_onephase", 8, [0] * 8, False),
    ):
        batched = build_inputs(B, gates, np.random.default_rng(0), two_phase)
        outs_c = fused_estep_packed_batch(*batched, two_phase=two_phase)
        # The production context: cpd_lle traces the single kernel under
        # highest matmul precision (its px dot_general otherwise rounds
        # operands through bf16 — the round-2 Mosaic trap).
        with jax.default_matmul_precision("highest"):
            refs = [
                _fused_estep_packed_impl(
                    *(a[b] for a in batched), two_phase=two_phase
                )
                for b in range(B)
            ]
        errs = []
        for k, lbl in enumerate(("p1", "px", "scal", "short")):
            if lbl == "short":
                continue
            per_stream = [
                float(jnp.abs(outs_c[k][b] - refs[b][k]).max())
                for b in range(B)
            ]
            errs.append((lbl, per_stream))
        print(name, {lbl: [f"{v:.2e}" for v in per] for lbl, per in errs})


if __name__ == "__main__":
    main()

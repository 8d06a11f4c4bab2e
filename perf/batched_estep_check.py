"""TPU validation + timing of the row-packed batched E-step and the
preprocess row-block skip (round 3).

1. Compiled batched E-step kernel vs per-stream compiled kernel (numerics).
2. Compiled preprocess kernel (both parity modes, post-row-skip) vs XLA path.
3. Scan-slope timing: vmapped 10-iteration EM at b=1/4/8 (the row-packed
   kernel should make b8 cost much less than 8x b1).
"""

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


def med3(build_body, k_pair=(16, 96)):
    return float(np.median([scan_time(build_body, k_pair) for _ in range(3)]))


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
    from trackdlo_tpu.ops.cpd_lle import CpdParams, cpd_lle
    from trackdlo_tpu.ops.pallas_kernels import (
        _fused_estep_packed_impl,
        estep_scalars,
        fused_estep_packed_batch,
        pack_points,
    )
    from trackdlo_tpu.ops.preprocess import compact_cells, preprocess_frame
    from trackdlo_tpu.ops.preprocess_kernel import cell_sums_pallas

    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend())

    # --- 1. batched kernel numerics (compiled) -----------------------------
    rng = np.random.default_rng(0)
    B, m, m_pad, n = 8, 45, 48, 1024
    ins, outs_ref = [], []
    # Reference under the production matmul-precision context (cpd_lle wraps
    # the whole EM in it): calling the single kernel raw lets its px
    # dot_general round operands through bf16 and shows a fake ~1.6e-2 gap.
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
            jnp.asarray(np.float32(0.001 * (1 + b))), jnp.asarray(np.float32(0.01)),
            jnp.asarray(np.float32(0.005)), jnp.asarray(np.float32(b % 2)),
            jnp.asarray(np.int32(m - 2 * b)), 50.0, 0.008, True,
        )
        yp = jnp.zeros((m_pad, 3)).at[:m].set(y)
        coordp = jnp.zeros((m_pad, 1)).at[:m, 0].set(coord)
        nmp = jnp.zeros((m_pad, 1)).at[:m, 0].set(1.0)
        pvp = jnp.ones((m_pad, 1))
        xt, xmp = pack_points(jnp.asarray(x), jnp.asarray(xm))
        ins.append((scal, yp, coordp, nmp, pvp, xt, xmp))
        with jax.default_matmul_precision("highest"):
            outs_ref.append(
                _fused_estep_packed_impl(
                    *ins[-1], two_phase=True, interpret=not on_tpu
                )
            )
    batched = tuple(jnp.stack([ins[b][i] for b in range(B)]) for i in range(7))
    p1b, pxb, scb, shb = fused_estep_packed_batch(
        *batched, two_phase=True, interpret=not on_tpu
    )
    errs = []
    for b in range(B):
        p1, px, sc, sh = outs_ref[b]
        errs.append(
            max(
                float(jnp.abs(p1b[b] - p1).max()),
                float(jnp.abs(pxb[b] - px).max()),
                float(jnp.abs(scb[b] - sc).max() / jnp.maximum(jnp.abs(sc).max(), 1)),
            )
        )
    print(f"batched_estep_vs_single_max: {max(errs):.3e}")

    # --- 2. preprocess kernel numerics post-row-skip (compiled) ------------
    params = live_params()
    intr = CameraIntrinsics()
    from trackdlo_tpu.ops.preprocess import default_cell_px

    cell = default_cell_px(params.downsample_leaf_size, intr.fx)
    leaf = params.downsample_leaf_size
    rope = SyntheticRope()
    rgb, depth = render_frame(rope, 1 / 15.0, intr)
    rgbj, depthj = jnp.asarray(rgb), jnp.asarray(depth)
    occ = jnp.ones((intr.height, intr.width), bool)
    for parity in (False, True):
        pc_ref = preprocess_frame(
            rgbj, depthj, occ, intr.fx, intr.fy, intr.cx, intr.cy,
            params.hsv_lower, params.hsv_upper, False, cell, params.max_points,
            voxel_leaf=leaf, parity_split=parity,
            candidate_cap=params.candidate_cap() if parity else 4096,
        )
        cl, ct = cell_sums_pallas(
            rgbj, depthj, occ, intr.fx, intr.fy, intr.cx, intr.cy,
            params.hsv_lower, params.hsv_upper, False, cell,
            interpret=not on_tpu, parity_split=parity,
            voxel_leaf=leaf if parity else None,
        )
        pc_got = compact_cells(
            cl, ct, params.max_points, leaf,
            candidate_cap=params.candidate_cap() if parity else 4096,
            n_channels=8 if parity else 1,
        )
        rp = np.asarray(pc_ref.points)[np.asarray(pc_ref.mask)]
        gp = np.asarray(pc_got.points)[np.asarray(pc_got.mask)]
        d = np.linalg.norm(gp[:, None] - rp[None], axis=2).min(1)
        print(
            f"preprocess parity={parity}: kernel-vs-xla max {d.max()*1000:.4f} mm"
            f"  count {int(pc_got.count)} vs {int(pc_ref.count)}"
        )

    # --- 3. batched EM timing ----------------------------------------------
    cp = CpdParams(
        beta=params.beta, lam=params.lam, lle_weight=params.lle_weight,
        mu=params.mu, max_iter=10, tol=0.0, include_lle=False,
        k_vis=params.k_vis, visibility_threshold=params.visibility_threshold,
        use_visibility=True, use_pallas=True,
    )
    nm = jnp.ones(m, bool)

    pcs = preprocess_frame(
        rgbj, depthj, occ, intr.fx, intr.fy, intr.cx, intr.cy,
        params.hsv_lower, params.hsv_upper, False, cell, params.max_points,
        voxel_leaf=leaf,
    )
    nodes = jnp.asarray(rope.nodes(0.0, m), jnp.float32)

    for bsz in (1, 4, 8):
        xb = jnp.broadcast_to(pcs.points, (bsz,) + pcs.points.shape)
        xmb = jnp.broadcast_to(pcs.mask, (bsz,) + pcs.mask.shape)
        yb = jnp.broadcast_to(nodes, (bsz, m, 3))
        s2b = jnp.full((bsz,), 0.001, jnp.float32)
        vcb = jnp.full((bsz,), 30, jnp.int32)

        def em_body(bsz=bsz, xb=xb, xmb=xmb, yb=yb, s2b=s2b, vcb=vcb):
            f = jax.vmap(
                lambda x, xm, y, s2, vc: cpd_lle(
                    x, xm, y, nm, s2, cp, visible_count=vc
                ).y
            )

            def body(c):
                out = f(xb, xmb, yb + c * 1e-12, s2b, vcb)
                return jnp.sum(out) * 1e-12 + c * 0.5

            return body

        t = med3(em_body)
        print(f"em10_vmap_b{bsz}: {t:.3f} ms ({t/bsz:.3f} ms/stream)")

    # preprocess kernel timing post-skip
    def kern_body(parity):
        def body(c):
            cl, ct = cell_sums_pallas(
                rgbj, depthj + (c * 0).astype(depthj.dtype), occ,
                intr.fx, intr.fy, intr.cx, intr.cy,
                params.hsv_lower, params.hsv_upper, False, cell,
                interpret=not on_tpu, parity_split=parity,
                voxel_leaf=leaf if parity else None,
            )
            return jnp.sum(ct) * 1e-12 + c * 0.5

        return body

    print(f"preprocess_kernel_1ch: {med3(lambda: kern_body(False)):.3f} ms")
    print(f"preprocess_kernel_8ch: {med3(lambda: kern_body(True)):.3f} ms")


if __name__ == "__main__":
    main()

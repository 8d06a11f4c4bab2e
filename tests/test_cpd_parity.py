"""Parity: JAX EM solver vs the float64 NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from trackdlo_tpu.io.sequence import SyntheticRope
from trackdlo_tpu.oracle.cpd_lle import cpd_lle as oracle_cpd
from trackdlo_tpu.oracle.lle import calc_lle_weights as oracle_lle
from trackdlo_tpu.oracle.cpd_lle import mct_kernel as oracle_mct
from trackdlo_tpu.ops.cpd_lle import CpdParams, cpd_lle
from trackdlo_tpu.ops.kernels import chain_lle_weights, mct_kernel, masked_geodesic_coords

N_CAP = 512


def _pack(x, n_cap=N_CAP):
    n = len(x)
    out = np.zeros((n_cap, 3), np.float32)
    out[:n] = x
    mask = np.zeros(n_cap, bool)
    mask[:n] = True
    return jnp.asarray(out), jnp.asarray(mask)


@pytest.fixture(scope="module")
def nodes():
    return SyntheticRope().nodes(0.0, 45)


class TestKernelParity:
    def test_mct_kernel(self, nodes):
        coord = np.concatenate([[0], np.cumsum(np.linalg.norm(np.diff(nodes, axis=0), axis=1))])
        dis = np.abs(coord[:, None] - coord[None, :])
        ref = oracle_mct(dis, 0.35)
        got = mct_kernel(jnp.asarray(dis, jnp.float32), 0.35)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)

    # The LLE Gram systems are intrinsically ill-conditioned (rank<=3 offsets
    # + eps), so individual weights scatter ~1e-2 between f32/f64 evaluation
    # orders while every such minimizer reconstructs the chain equally well.
    # Parity therefore checks structure + reconstruction residual, and the
    # EM-level tests below confirm trajectories agree.

    def test_lle_weights_full(self, nodes):
        ref = oracle_lle(6, nodes)
        got = np.asarray(
            chain_lle_weights(jnp.asarray(nodes, jnp.float32), jnp.ones(45, bool), 6)
        )
        assert (got != 0).sum() == (ref != 0).sum()
        assert ((got != 0) == (ref != 0)).all()
        np.testing.assert_allclose(got.sum(axis=1), 1.0, atol=1e-4)
        res_got = np.abs(got @ nodes - nodes).max()
        res_ref = np.abs(ref @ nodes - nodes).max()
        assert res_got < max(2 * res_ref, 1e-4)

    def test_lle_weights_prefix(self, nodes):
        v = 17
        ref = oracle_lle(6, nodes[:v])
        y = np.zeros((45, 3), np.float32)
        y[:v] = nodes[:v]
        mask = np.arange(45) < v
        got = np.asarray(chain_lle_weights(jnp.asarray(y), jnp.asarray(mask), 6))
        assert ((got[:v, :v] != 0) == (ref != 0)).all()
        np.testing.assert_allclose(got[:v].sum(axis=1), 1.0, atol=1e-4)
        res_got = np.abs(got[:v, :v] @ nodes[:v] - nodes[:v]).max()
        res_ref = np.abs(ref @ nodes[:v] - nodes[:v]).max()
        assert res_got < max(2 * res_ref, 1e-4)
        assert np.all(got[v:, :] == 0)
        assert np.all(got[:, v:] == 0)

    def test_masked_geodesic_coords(self, nodes):
        v = 20
        y = np.zeros((45, 3), np.float32)
        y[:v] = nodes[:v]
        coord = np.asarray(masked_geodesic_coords(jnp.asarray(y), jnp.asarray(np.arange(45) < v)))
        ref = np.concatenate([[0], np.cumsum(np.linalg.norm(np.diff(nodes[:v], axis=0), axis=1))])
        np.testing.assert_allclose(coord[:v], ref, rtol=1e-5, atol=1e-6)
        assert np.allclose(coord[v:], coord[v - 1])


class TestEmParity:
    def _run_both(self, x, y0, sigma2, include_lle, priors=None, visible_count=None,
                  k_vis=0.0, max_iter=50):
        params_kw = dict(
            beta=0.35, lam=50000.0, lle_weight=10.0, mu=0.1,
            max_iter=max_iter, tol=0.0002,
        )
        ref = oracle_cpd(
            x, y0, sigma2, params_kw["beta"], params_kw["lam"],
            params_kw["lle_weight"], params_kw["mu"], max_iter, params_kw["tol"],
            include_lle=include_lle,
            correspondence_priors=priors,
            alpha=3.0 if priors is not None else 0.0,
            visible_nodes=list(range(int(visible_count))) if visible_count else None,
            k_vis=k_vis,
            visibility_threshold=0.008,
        )

        xj, xm = _pack(x)
        m = len(y0)
        prior_pos = np.zeros((m, 3), np.float32)
        prior_mask = np.zeros(m, bool)
        if priors is not None:
            for row in priors:
                prior_mask[int(row[0])] = True
                prior_pos[int(row[0])] = row[1:4]
        cp = CpdParams(
            beta=params_kw["beta"], lam=params_kw["lam"],
            lle_weight=params_kw["lle_weight"], mu=params_kw["mu"],
            max_iter=max_iter, tol=params_kw["tol"], include_lle=include_lle,
            alpha=3.0 if priors is not None else 0.0,
            k_vis=k_vis, visibility_threshold=0.008,
            use_priors=priors is not None,
            use_visibility=visible_count is not None,
        )
        got = cpd_lle(
            xj, xm, jnp.asarray(y0, jnp.float32), jnp.ones(m, bool),
            jnp.asarray(sigma2, jnp.float32), cp,
            prior_pos=jnp.asarray(prior_pos), prior_mask=jnp.asarray(prior_mask),
            visible_count=jnp.asarray(visible_count if visible_count else m, jnp.int32),
        )
        return ref, got

    def test_basic_em_fixed_iterations(self, rope_cloud, nodes):
        # tol ~ 0 forces both solvers through the same number of iterations,
        # isolating pure f32-vs-f64 numeric drift (no early-exit off-by-one).
        params_kw = dict(beta=0.35, lam=50000.0, lle_weight=10.0, mu=0.1)
        ref = oracle_cpd(rope_cloud, nodes, 0.001, params_kw["beta"],
                         params_kw["lam"], params_kw["lle_weight"],
                         params_kw["mu"], 30, 1e-12, include_lle=False)
        xj, xm = _pack(rope_cloud)
        cp = CpdParams(**params_kw, max_iter=30, tol=1e-12, include_lle=False)
        got = cpd_lle(xj, xm, jnp.asarray(nodes, jnp.float32), jnp.ones(45, bool),
                      jnp.asarray(0.001, jnp.float32), cp)
        assert int(got.iterations) == ref.iterations == 30
        err = np.linalg.norm(np.asarray(got.y) - ref.y, axis=1)
        assert err.max() < 2e-4

    def test_basic_em(self, rope_cloud, nodes):
        ref, got = self._run_both(rope_cloud, nodes, 0.001, include_lle=False)
        err = np.linalg.norm(np.asarray(got.y) - ref.y, axis=1)
        # Early exit can differ by one iteration near the tol boundary; each
        # such iteration moves nodes by < tol on average. The BASELINE parity
        # budget is 1e-3 m.
        assert err.max() < 1e-3
        assert err.mean() < 4e-4
        assert abs(float(got.sigma2) - ref.sigma2) < 1e-5
        assert bool(got.converged) == ref.converged

    def test_em_with_lle(self, rope_cloud, nodes):
        ref, got = self._run_both(rope_cloud, nodes, 0.001, include_lle=True)
        err = np.linalg.norm(np.asarray(got.y) - ref.y, axis=1)
        assert err.max() < 1e-3

    def test_em_with_priors(self, rope_cloud, nodes):
        priors = np.array(
            [[0.0, *(nodes[0] + [0, 0.01, 0])], [44.0, *(nodes[44] - [0, 0.01, 0])]]
        )
        ref, got = self._run_both(rope_cloud, nodes, 0.001, False, priors=priors)
        err = np.linalg.norm(np.asarray(got.y) - ref.y, axis=1)
        assert err.max() < 1e-3

    def test_em_with_visibility_prior(self, rope_cloud, nodes):
        # 30 of 45 visible triggers the modified-membership branch
        # (trackdlo.cpp:357-383).
        ref, got = self._run_both(
            rope_cloud, nodes, 0.001, False, visible_count=30, k_vis=50.0
        )
        err = np.linalg.norm(np.asarray(got.y) - ref.y, axis=1)
        assert err.max() < 1e-3

    def test_em_prefix_subset(self, rope_cloud, nodes):
        # Guide-node EM: only the first 20 nodes valid (pre-proc registration
        # semantics, trackdlo.cpp:913-927).
        v = 20
        ref = oracle_cpd(
            rope_cloud, nodes[:v], 0.001, 3.0, 1.0, 10.0, 0.1, 50, 0.0002,
            include_lle=True,
        )
        xj, xm = _pack(rope_cloud)
        y = np.zeros((45, 3), np.float32)
        y[:v] = nodes[:v]
        cp = CpdParams(
            beta=3.0, lam=1.0, lle_weight=10.0, mu=0.1, max_iter=50, tol=0.0002,
            include_lle=True,
        )
        got = cpd_lle(
            xj, xm, jnp.asarray(y), jnp.asarray(np.arange(45) < v),
            jnp.asarray(0.001, jnp.float32), cp,
        )
        err = np.linalg.norm(np.asarray(got.y)[:v] - ref.y, axis=1)
        assert err.max() < 1e-3
        # Padded rows untouched.
        assert np.all(np.asarray(got.y)[v:] == 0)

    def test_empty_cloud_is_identity(self, nodes):
        xj = jnp.zeros((N_CAP, 3), jnp.float32)
        xm = jnp.zeros(N_CAP, bool)
        cp = CpdParams(beta=0.35, lam=50000.0, lle_weight=10.0, mu=0.1,
                       max_iter=50, tol=0.0002, include_lle=False)
        got = cpd_lle(xj, xm, jnp.asarray(nodes, jnp.float32), jnp.ones(45, bool),
                      jnp.asarray(0.001, jnp.float32), cp)
        np.testing.assert_allclose(np.asarray(got.y), nodes.astype(np.float32))

"""Algorithm-surface variants: traverse_geodesic, kernel families,
pure-Euclidean prototype mode."""

import jax.numpy as jnp
import numpy as np
import pytest

from trackdlo_tpu.io.sequence import SyntheticRope
from trackdlo_tpu.oracle.cpd_lle import cpd_lle as oracle_cpd
from trackdlo_tpu.oracle.geometry import geodesic_coords
from trackdlo_tpu.oracle.traverse import traverse_euclidean, traverse_geodesic
from trackdlo_tpu.ops.cpd_lle import CpdParams, cpd_lle

N_CAP = 512


def _pack(x):
    out = np.zeros((N_CAP, 3), np.float32)
    out[: len(x)] = x
    mask = np.zeros(N_CAP, bool)
    mask[: len(x)] = True
    return jnp.asarray(out), jnp.asarray(mask)


@pytest.fixture(scope="module")
def chain():
    y = SyntheticRope().nodes(0.0, 45)
    return y, geodesic_coords(y)


class TestTraverseGeodesic:
    def test_head_walk_respects_arc_length(self, chain):
        y, coord = chain
        priors = traverse_geodesic(coord, y, list(range(45)), 0)
        idx = priors[:, 0].astype(int)
        assert idx[0] == 0
        assert (np.diff(idx) >= 1).all()
        # Placed positions lie on the guide polyline.
        for row in priors:
            d = np.linalg.norm(y - row[1:4], axis=1).min()
            assert d < np.linalg.norm(np.diff(y, axis=0), axis=1).max()

    def test_tail_walk_ascending_output(self, chain):
        y, coord = chain
        priors = traverse_geodesic(coord, y, list(range(45)), 1)
        idx = priors[:, 0].astype(int)
        # traverse_geodesic inserts tail-walk pairs at the front
        # (trackdlo.cpp:573), so output is ascending.
        assert (np.diff(idx) >= 1).all()
        assert idx[-1] == 44

    def test_agrees_with_euclidean_on_straight_chain(self):
        # On an evenly spaced straight chain both prior generators reproduce
        # the chain itself.
        y = np.zeros((20, 3))
        y[:, 0] = np.linspace(0, 0.5, 20)
        coord = geodesic_coords(y)
        pg = traverse_geodesic(coord, y, list(range(20)), 0)
        pe = traverse_euclidean(coord, y, list(range(20)), 0)
        for priors in (pg, pe):
            for row in priors:
                i = int(row[0])
                assert np.linalg.norm(row[1:4] - y[i]) < 1e-6

    def test_single_guide(self, chain):
        y, coord = chain
        out = traverse_geodesic(coord, y[:1], [7], 0)
        assert out.shape == (1, 4)
        assert out[0][0] == 7


class TestKernelVariants:
    @pytest.mark.parametrize(
        "kernel,use_geo",
        [
            ("gaussian_geodesic", True),
            ("gaussian_euclidean", True),
            ("gaussian_euclidean", False),
        ],
    )
    def test_jax_matches_oracle(self, rope_cloud, kernel, use_geo):
        y0 = SyntheticRope().nodes(0.0, 45)
        ref = oracle_cpd(
            rope_cloud, y0, 0.001, 0.7, 5.0, 1.0, 0.05, 30, 1e-4,
            include_lle=True, kernel=kernel, use_geodesic_redistance=use_geo,
        )
        xj, xm = _pack(rope_cloud)
        cp = CpdParams(
            beta=0.7, lam=5.0, lle_weight=1.0, mu=0.05, max_iter=30, tol=1e-4,
            include_lle=True, kernel=kernel, use_geodesic_redistance=use_geo,
        )
        got = cpd_lle(
            xj, xm, jnp.asarray(y0, jnp.float32), jnp.ones(45, bool),
            jnp.asarray(0.001, jnp.float32), cp,
        )
        err = np.linalg.norm(np.asarray(got.y) - ref.y, axis=1)
        assert err.max() < 1e-3, err.max()

    def test_prototype_mode_tracks(self, rope_cloud):
        # The prototype configuration (tracking_test.py:572: beta=0.7,
        # alpha(lam)=5, gamma(lle)=1, mu=0.05, gaussian euclidean kernel).
        y0 = SyntheticRope().nodes(0.0, 45)
        xj, xm = _pack(rope_cloud)
        cp = CpdParams(
            beta=0.7, lam=5.0, lle_weight=1.0, mu=0.05, max_iter=50, tol=1e-5,
            include_lle=True, kernel="gaussian_euclidean",
            use_geodesic_redistance=False,
        )
        got = cpd_lle(
            xj, xm, jnp.asarray(y0, jnp.float32), jnp.ones(45, bool),
            jnp.asarray(0.001, jnp.float32), cp,
        )
        gt = SyntheticRope().nodes(1.0 / 15.0, 45)
        err = np.linalg.norm(np.asarray(got.y) - gt, axis=1).mean()
        assert err < 0.01


class TestPallasVariantGuard:
    """ADVICE r1: use_pallas must not silently change the algorithm for
    prototype kernel variants — those must fall back to the XLA iteration."""

    @pytest.mark.parametrize(
        "kernel,use_geo",
        [("gaussian_euclidean", False), ("gaussian_geodesic", True)],
    )
    def test_pallas_flag_matches_xla_for_variants(self, rope_cloud, kernel, use_geo):
        y0 = SyntheticRope().nodes(0.0, 45)
        xj, xm = _pack(rope_cloud)
        base = dict(
            beta=0.7, lam=5.0, lle_weight=1.0, mu=0.05, max_iter=20, tol=1e-4,
            include_lle=True, kernel=kernel, use_geodesic_redistance=use_geo,
        )
        ref = cpd_lle(
            xj, xm, jnp.asarray(y0, jnp.float32), jnp.ones(45, bool),
            jnp.asarray(0.001, jnp.float32), CpdParams(**base, use_pallas=False),
        )
        got = cpd_lle(
            xj, xm, jnp.asarray(y0, jnp.float32), jnp.ones(45, bool),
            jnp.asarray(0.001, jnp.float32), CpdParams(**base, use_pallas=True),
        )
        np.testing.assert_array_equal(np.asarray(got.y), np.asarray(ref.y))

"""Plain CPD/GMM registration (the cold-start `reg`).

Reference: utils.cpp:21-82 (`reg`) / tracking_test.py:118-172 (`register`):
straight-line node init + fixed-iteration EM with the closed-form mean
update Y = PX ⊘ P1. Exposed both as the host-side initializer fallback
(oracle.register_cold_start) and as this jitted device kernel, vmappable for
batched cold starts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("m", "max_iter"))
def register_gmm(
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    m: int = 40,
    mu: float = 0.05,
    max_iter: int = 100,
):
    """Register ``m`` nodes to the masked point set; returns (Y, sigma2).

    The node chain is NOT ordered on output (the reference runs sort_pts
    afterwards, tracking_test.py:526).
    """
    with jax.default_matmul_precision("highest"):
        n_valid = jnp.maximum(jnp.sum(x_mask.astype(jnp.float32)), 1.0)
        d = 3
        y0 = jnp.zeros((m, 3), jnp.float32)
        # 0.1 m straight segment along +y (utils.cpp:24-29).
        y0 = y0.at[:, 1].set(0.1 / m * jnp.arange(m, dtype=jnp.float32))

        def sq_dists(y):
            diff = y[:, None, :] - x[None, :, :]
            return jnp.sum(diff * diff, axis=-1)

        sigma2 = jnp.sum(jnp.where(x_mask[None, :], sq_dists(y0), 0.0)) / (
            d * m * n_valid
        )

        def body(_, carry):
            y, s2 = carry
            sq = sq_dists(y)
            p = jnp.where(x_mask[None, :], jnp.exp(-0.5 * sq / s2), 0.0)
            c = (2 * jnp.pi * s2) ** (d / 2) * mu / (1 - mu) * m / n_valid
            p = p / (jnp.sum(p, axis=0, keepdims=True) + c)
            p = jnp.where(x_mask[None, :], p, 0.0)
            p1 = jnp.sum(p, axis=1)
            px = p @ x
            y_new = px / jnp.maximum(p1, 1e-20)[:, None]
            s2_new = jnp.sum(p * sq) / jnp.maximum(jnp.sum(p) * d, 1e-20)
            return y_new, jnp.maximum(s2_new, 1e-10)

        y, sigma2 = jax.lax.fori_loop(0, max_iter, body, (y0, sigma2))
        return y, sigma2

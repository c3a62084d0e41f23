"""Markov submodel solver tests vs analytic solutions."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from canopy_tpu.ops.markov import (markov_stationary, markov_transient,
                                   triangular_solve_levels)


def two_state_generator(lam, mu):
    """Up/down repairable component: up -> down rate lam, down -> up mu."""
    return jnp.asarray([[-lam, lam], [mu, -mu]])


class TestTransient:
    def test_matches_glm_closed_form(self):
        """P(down at t) equals the GLM unavailability formula."""
        lam, mu, t = 1e-2, 1e-1, 37.0
        Q = two_state_generator(lam, mu)
        p = markov_transient(Q, jnp.asarray([1.0, 0.0]), t)
        r = lam + mu
        expected_down = (lam - lam * math.exp(-r * t)) / r
        assert abs(float(p[1]) - expected_down) < 1e-12
        assert abs(float(p.sum()) - 1.0) < 1e-12

    def test_three_state_chain_vs_expm(self):
        rng = np.random.default_rng(0)
        A = rng.uniform(0.0, 0.5, (4, 4))
        np.fill_diagonal(A, 0.0)
        Q = A - np.diag(A.sum(axis=1))
        t = 2.5
        p0 = np.array([1.0, 0.0, 0.0, 0.0])
        from scipy.linalg import expm
        expected = p0 @ expm(Q * t)
        got = markov_transient(jnp.asarray(Q), jnp.asarray(p0), t)
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-10)

    def test_batched_initial_states(self):
        Q = two_state_generator(1e-3, 1e-2)
        p0 = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]])
        out = markov_transient(Q, p0, 100.0)
        assert out.shape == (3, 2)
        np.testing.assert_allclose(np.asarray(out.sum(axis=-1)), 1.0,
                                   atol=1e-12)

    def test_zero_generator(self):
        Q = jnp.zeros((2, 2))
        p0 = jnp.asarray([0.3, 0.7])
        np.testing.assert_allclose(
            np.asarray(markov_transient(Q, p0, 10.0)), np.asarray(p0))


class TestStationary:
    def test_two_state(self):
        lam, mu = 1e-2, 1e-1
        pi = markov_stationary(two_state_generator(lam, mu))
        r = lam + mu
        np.testing.assert_allclose(np.asarray(pi), [mu / r, lam / r],
                                   atol=1e-12)


class TestTriangularSolve:
    def test_matches_scipy(self):
        from scipy.sparse import csr_matrix, tril
        from scipy.sparse.linalg import spsolve_triangular
        rng = np.random.default_rng(1)
        n = 30
        dense = np.tril(rng.uniform(0.1, 1.0, (n, n)) *
                        (rng.random((n, n)) < 0.3), k=-1)
        diag = rng.uniform(0.5, 2.0, n)
        L = dense + np.diag(diag)
        b = rng.uniform(-1, 1, n)
        expected = spsolve_triangular(csr_matrix(L), b, lower=True)
        strict = csr_matrix(dense)
        got = triangular_solve_levels(
            strict.indptr, strict.indices, jnp.asarray(strict.data),
            jnp.asarray(diag), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-10)

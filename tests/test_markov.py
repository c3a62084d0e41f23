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


def _random_lower(n, density, seed, chain=False):
    """Strictly-lower CSR + diag; optionally a full bidiagonal chain
    (every level schedule's worst case: n sequential levels)."""
    from scipy.sparse import csr_matrix
    rng = np.random.default_rng(seed)
    mask = rng.random((n, n)) < density
    dense = np.tril(rng.uniform(0.1, 1.0, (n, n)) * mask, k=-1)
    if chain:
        for i in range(1, n):
            dense[i, i - 1] = rng.uniform(0.5, 1.0)
    diag = rng.uniform(0.5, 2.0, n)
    return csr_matrix(dense), diag, dense


class TestBlockedTriangular:
    def test_lower_10k_vs_scipy(self):
        from canopy_tpu.ops.markov import compile_blocked_triangular
        from scipy.sparse import csr_matrix
        from scipy.sparse.linalg import spsolve_triangular
        n = 10_000
        strict, diag, dense = _random_lower(n, 3.0 / n, seed=0, chain=True)
        bt = compile_blocked_triangular(strict.indptr, strict.indices,
                                        strict.data, diag, lower=True)
        rng = np.random.default_rng(3)
        b = rng.uniform(-1, 1, n)
        full = csr_matrix(dense + np.diag(diag))
        expected = spsolve_triangular(full, b, lower=True)
        got = np.asarray(bt.solve(jnp.asarray(b)))
        np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9)

    def test_upper_and_batched(self):
        from canopy_tpu.ops.markov import compile_blocked_triangular
        from scipy.sparse import csr_matrix
        from scipy.sparse.linalg import spsolve_triangular
        n = 700
        strict, diag, dense = _random_lower(n, 0.01, seed=5)
        upper = dense.T
        bt = compile_blocked_triangular(
            csr_matrix(upper).indptr, csr_matrix(upper).indices,
            csr_matrix(upper).data, diag, lower=False, block=64)
        rng = np.random.default_rng(7)
        b = rng.uniform(-1, 1, (4, n))
        full = csr_matrix(upper + np.diag(diag))
        expected = np.stack([
            spsolve_triangular(full, row, lower=False) for row in b])
        got = np.asarray(bt.solve(jnp.asarray(b)))
        assert got.shape == (4, n)
        np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9)

    def test_rejects_nontriangular_and_zero_diag(self):
        from canopy_tpu.errors import LogicError
        from canopy_tpu.ops.markov import compile_blocked_triangular
        from scipy.sparse import csr_matrix
        bad = csr_matrix(np.triu(np.ones((4, 4)), k=1))
        with pytest.raises(LogicError):
            compile_blocked_triangular(bad.indptr, bad.indices, bad.data,
                                       np.ones(4), lower=True)
        empty = csr_matrix(np.zeros((4, 4)))
        with pytest.raises(LogicError):
            compile_blocked_triangular(empty.indptr, empty.indices,
                                       empty.data, np.zeros(4))


class TestSparseLU:
    def _dd_matrix(self, n, density, seed):
        """Sparse strictly diagonally dominant matrix (CSR)."""
        from scipy.sparse import csr_matrix
        rng = np.random.default_rng(seed)
        mask = (rng.random((n, n)) < density) & ~np.eye(n, dtype=bool)
        A = rng.uniform(-1.0, 1.0, (n, n)) * mask
        np.fill_diagonal(A, np.abs(A).sum(axis=1) + 1.0)
        return csr_matrix(A), A

    def test_solve_vs_scipy_splu(self):
        from canopy_tpu.ops.markov import sparse_lu
        from scipy.sparse.linalg import splu
        n = 2_000
        sp, _A = self._dd_matrix(n, 4.0 / n, seed=2)
        lu = sparse_lu(sp.indptr, sp.indices, sp.data, n)
        rng = np.random.default_rng(4)
        b = rng.uniform(-1, 1, n)
        expected = splu(sp.tocsc(), permc_spec="NATURAL",
                        options={"SymmetricMode": False}).solve(b)
        got = np.asarray(lu.solve(jnp.asarray(b)))
        np.testing.assert_allclose(got, expected, rtol=1e-8, atol=1e-10)

    def test_batched_rhs(self):
        from canopy_tpu.ops.markov import sparse_lu
        n = 300
        sp, A = self._dd_matrix(n, 0.02, seed=9)
        lu = sparse_lu(sp.indptr, sp.indices, sp.data, n)
        rng = np.random.default_rng(1)
        b = rng.uniform(-1, 1, (3, n))
        got = np.asarray(lu.solve(jnp.asarray(b)))
        expected = np.linalg.solve(A, b.T).T
        np.testing.assert_allclose(got, expected, rtol=1e-8, atol=1e-10)

    def test_singular_raises(self):
        from canopy_tpu.errors import LogicError
        from canopy_tpu.ops.markov import sparse_lu
        from scipy.sparse import csr_matrix
        A = csr_matrix(np.array([[1.0, 2.0], [2.0, 4.0]]))
        with pytest.raises(LogicError):
            sparse_lu(A.indptr, A.indices, A.data, 2)


class TestStationarySparse:
    def _birth_death(self, n, seed=0):
        """Birth-death CTMC with a few random long-range jumps — the
        bidiagonal structure is the level scheduler's worst case."""
        rng = np.random.default_rng(seed)
        Q = np.zeros((n, n))
        for i in range(n - 1):
            Q[i, i + 1] = rng.uniform(0.5, 1.5)
        for i in range(1, n):
            Q[i, i - 1] = rng.uniform(0.5, 1.5)
        for _ in range(n // 50):
            i, j = rng.integers(0, n, 2)
            if i != j:
                Q[i, j] += rng.uniform(0.1, 0.5)
        np.fill_diagonal(Q, 0.0)
        np.fill_diagonal(Q, -Q.sum(axis=1))
        return Q

    def test_sparse_matches_dense_path(self):
        Q = self._birth_death(300)
        pi_dense = np.asarray(markov_stationary(Q, method="dense"))
        pi_sparse = np.asarray(markov_stationary(Q, method="sparse"))
        np.testing.assert_allclose(pi_sparse, pi_dense, rtol=1e-8,
                                   atol=1e-12)
        assert abs(pi_sparse.sum() - 1.0) < 1e-9

    def test_csr_input_10k_states(self):
        from scipy.sparse import coo_matrix
        n = 10_000
        rng = np.random.default_rng(3)
        rows = np.concatenate([np.arange(n - 1), np.arange(1, n)])
        cols = np.concatenate([np.arange(1, n), np.arange(n - 1)])
        vals = rng.uniform(0.5, 1.5, 2 * (n - 1))
        ji = rng.integers(0, n, (n // 50, 2))
        ji = ji[ji[:, 0] != ji[:, 1]]
        rows = np.concatenate([rows, ji[:, 0]])
        cols = np.concatenate([cols, ji[:, 1]])
        vals = np.concatenate([vals, rng.uniform(0.1, 0.5, len(ji))])
        off = coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
        diag = -np.asarray(off.sum(axis=1)).ravel()
        sp = (off + coo_matrix((diag, (np.arange(n), np.arange(n))),
                               shape=(n, n))).tocsr()
        pi = np.asarray(markov_stationary(
            (sp.indptr, sp.indices, sp.data), method="sparse"))
        assert abs(pi.sum() - 1.0) < 1e-8
        resid = np.abs(pi @ sp).max()    # Stationarity: pi @ Q == 0.
        assert resid < 1e-10
        assert (pi > 0).all()

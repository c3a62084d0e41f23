"""Markov (dependency) submodel solvers.

The north star names "sparse factorization for Markov/dependency
submodels" (BASELINE.json; reference capability implied by the GLM /
periodic-test repairable-component semantics). PRA dependency submodels
are continuous-time Markov chains over component-group states whose state
probabilities feed basic events of the surrounding fault tree.

TPU-native choice: **uniformization** (Jensen's method) instead of matrix
factorization — the transient solution

    p(t) = sum_k  Poisson(L*t; k) * M^k p0,   M = I + Q/L,  L >= max|q_ii|

is a stable, strictly matmul/matvec computation (MXU-shaped), with an a
priori truncation bound. Batched over time points and over epistemic
trials with `vmap`. A level-scheduled sparse triangular solve
(:func:`triangular_solve_levels`) covers the factor-solve pattern for
acyclic dependency systems; full sparse LU on device is a later round.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["markov_transient", "markov_stationary",
           "triangular_solve_levels"]


def _poisson_terms(rate: float, tol: float) -> int:
    """Truncation point: smallest K with tail mass below tol."""
    # Mean + a safety band of sqrt growth; exact tail scan on host.
    k = max(int(rate), 1)
    # Walk out until the cumulative mass reaches 1 - tol.
    total = 0.0
    log_term = -rate  # log Poisson(rate; 0)
    kk = 0
    while total < 1.0 - tol and kk < 100000:
        total += math.exp(log_term)
        kk += 1
        log_term += math.log(rate) - math.log(kk)
    return max(kk, 2)


def markov_transient(Q: jnp.ndarray, p0: jnp.ndarray, t: float,
                     tol: float = 1e-12) -> jnp.ndarray:
    """Transient state distribution p(t) of a CTMC with generator Q.

    ``Q``: (S, S) generator (rows sum to 0, off-diagonals >= 0; the
    convention is p' = p @ Q for a row-vector distribution). ``p0``: (S,)
    or batched (..., S). Uniformization with host-computed truncation.
    """
    Q = jnp.asarray(Q, dtype=jnp.float64)
    diag = jnp.diagonal(Q)
    rate_bound = float(np.max(-np.asarray(diag))) * float(t)
    if rate_bound == 0.0:
        return jnp.broadcast_to(p0, p0.shape)
    lam = rate_bound * 1.0000001
    M = jnp.eye(Q.shape[0], dtype=Q.dtype) + Q * (float(t) / lam)
    K = _poisson_terms(lam, tol)

    # Poisson weights, computed stably in log space on host.
    log_w = np.empty(K)
    log_w[0] = -lam
    for k in range(1, K):
        log_w[k] = log_w[k - 1] + math.log(lam) - math.log(k)
    weights = jnp.asarray(np.exp(log_w))

    def step(carry, w):
        pk, acc = carry
        acc = acc + w * pk
        pk = pk @ M
        return (pk, acc), None

    acc0 = jnp.zeros_like(p0, dtype=Q.dtype)
    (final_p, acc), _ = jax.lax.scan(step, (p0.astype(Q.dtype), acc0),
                                     weights)
    return acc


def markov_stationary(Q: jnp.ndarray) -> jnp.ndarray:
    """Stationary distribution: solve pi @ Q = 0, sum(pi) = 1."""
    Q = jnp.asarray(Q, dtype=jnp.float64)
    S = Q.shape[0]
    # Replace one balance equation with the normalization constraint.
    A = jnp.concatenate([Q[:, :-1], jnp.ones((S, 1), dtype=Q.dtype)],
                        axis=1)
    b = jnp.zeros(S, dtype=Q.dtype).at[-1].set(1.0)
    return jnp.linalg.solve(A.T, b)


def triangular_solve_levels(indptr: np.ndarray, indices: np.ndarray,
                            data: jnp.ndarray, diag: jnp.ndarray,
                            b: jnp.ndarray) -> jnp.ndarray:
    """Sparse lower-triangular solve, level-scheduled for the device.

    Solves ``L x = b`` where L is unit-pattern CSR (strictly-lower
    entries in indptr/indices/data plus a diagonal vector). Rows are
    grouped into dependency levels on the host (same no-cycle guarantee
    as the gate compiler); each level resolves as one batched
    gather/multiply — the SpMV access pattern again, so the engine shares
    the propagation layout. ``b`` may carry leading batch axes.
    """
    n = len(diag)
    # Host: level of row i = 1 + max level of its column dependencies.
    level = np.zeros(n, dtype=np.int64)
    for i in range(n):
        cols = indices[indptr[i]:indptr[i + 1]]
        level[i] = 1 + max((level[c] for c in cols), default=0)
    order = np.argsort(level, kind="stable")
    x = jnp.zeros_like(b)
    max_level = int(level.max()) if n else 0
    for lv in range(1, max_level + 1):
        rows = order[level[order] == lv]
        # Per level: x[rows] = (b[rows] - sum_j L[row, j] x[j]) / diag.
        contrib = []
        for row in rows:
            cols = indices[indptr[row]:indptr[row + 1]]
            vals = data[indptr[row]:indptr[row + 1]]
            if len(cols):
                dot = jnp.tensordot(jnp.asarray(vals),
                                    x[..., jnp.asarray(cols)],
                                    axes=[[0], [-1]])
            else:
                dot = jnp.zeros(b.shape[:-1], dtype=b.dtype)
            contrib.append((b[..., row] - dot) / diag[row])
        x = x.at[..., jnp.asarray(rows)].set(
            jnp.stack(contrib, axis=-1))
    return x

"""Small fixed-size SPD solves, unrolled for TPU.

XLA's generic Cholesky HLO is built for large matrices; for the nv x nv
(12 x 12) systems this engine solves ~10x per physics step, a statically
unrolled column-by-column factorization compiles to straight-line VPU code
that vmaps cleanly over thousands of envs (measured ~10x faster than
jax.scipy.linalg.cho_factor/cho_solve at B=4096 on TPU v5e).
"""
from __future__ import annotations

import jax.numpy as jnp


def cholesky_small(A):
    """Lower-triangular Cholesky factor of a small SPD matrix (n x n).

    Statically unrolled over columns; n must be a Python int (A.shape[-1]).
    Batched over leading dims.
    """
    n = A.shape[-1]
    cols = []
    for j in range(n):
        a_j = A[..., :, j]                       # (..., n)
        # subtract sum_k<j L[:,k]*L[j,k]
        s = a_j
        for k in range(j):
            s = s - cols[k] * cols[k][..., j:j + 1]
        diag = jnp.sqrt(jnp.maximum(s[..., j], 1e-30))
        col = s / diag[..., None]
        # zero out entries above the diagonal
        mask = jnp.arange(n) >= j
        cols.append(jnp.where(mask, col, 0.0))
    return jnp.stack(cols, axis=-1)


def cho_solve_small(L, b):
    """Solve A x = b given L = cholesky_small(A). Batched over leading dims."""
    n = L.shape[-1]
    # forward substitution: L y = b
    y = []
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * y[k]
        y.append(s / L[..., i, i])
    # back substitution: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i] * x[k]
        x[i] = s / L[..., i, i]
    return jnp.stack(x, axis=-1)


def solve_spd_small(A, b):
    """Solve small SPD system A x = b (unrolled Cholesky)."""
    return cho_solve_small(cholesky_small(A), b)


# --- batch-last variants ----------------------------------------------------
# For the batched solver the env axis lives in the *last* dimension so it
# fills TPU lanes; matrices are (n, n, B) and vectors (n, B).

def cholesky_bl(A):
    """Cholesky of (n, n, B) SPD stack -> lower-triangular (n, n, B)."""
    n = A.shape[0]
    cols = []
    for j in range(n):
        s = A[:, j, :]                            # (n, B)
        for k in range(j):
            s = s - cols[k] * cols[k][j][None, :]
        diag = jnp.sqrt(jnp.maximum(s[j], 1e-30))
        col = s / diag[None, :]
        mask = (jnp.arange(n) >= j)[:, None]
        cols.append(jnp.where(mask, col, 0.0))
    return jnp.stack(cols, axis=1)


def cho_solve_bl(L, b):
    """Solve A x = b for (n, n, B) factor L and (n, B) rhs."""
    n = L.shape[0]
    y = []
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i, k] * y[k]
        y.append(s / L[i, i])
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k, i] * x[k]
        x[i] = s / L[i, i]
    return jnp.stack(x, axis=0)

"""deterministic on-device eigen iterations for banded operators.

The reference's phosphorus preconditioner reaches for ARPACK (host scipy
`eigs`, including shift-invert at zero) to find the extreme eigenvalues and
the null vector of the implicit-Euler operator
(/root/reference/nk_ooc/py_driver_2d/phosphorus.py:197-274).  ARPACK is
host-only, nondeterministic across runs (random start vectors), and its
sparse LU has no accelerator analog.  Here the same quantities come from
fixed-iteration subspace (orthogonal) iteration:

  * largest eigenvalues: iterate Q <- orth(A Q) with banded matvecs,
  * smallest eigenvalues / null vector: inverse iteration Q <- orth(
    (A - sigma I)^{-1} Q) through the pivot-free banded LU (plain
    arithmetic under lax.scan -- float64-capable on TPU, unlike XLA's
    LuDecomposition),
  * Ritz values from the k x k projection Q^T A Q, eigendecomposed on host
    (k is tiny; the O(n) work stays on device).

Everything is jittable with static iteration counts -- deterministic by
construction (SURVEY.md section 7 "hard parts": eigen/null-space
preconditioners must become deterministic on-device iterations).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .banded import banded_lu_factor, banded_lu_solve, bands_add_diag


@jax.jit
def band_matvec(bands, x):
    """y = A x for row-band storage bands[i, d] = A[i, i + d - bw]"""
    m, width = bands.shape
    bw = (width - 1) // 2
    pad = jnp.zeros(bw, x.dtype)
    x_ext = jnp.concatenate([pad, x, pad])
    idx = jnp.arange(m)[:, None] + jnp.arange(width)[None, :]
    return jnp.sum(bands * x_ext[idx], axis=1)


@partial(jax.jit, static_argnums=(1, 2))
def _subspace_fwd(bands, k, iters, q0):
    """orthogonal iteration with A matvecs; returns (q, h = q^T A q)"""

    def body(_i, q):
        z = jax.vmap(band_matvec, in_axes=(None, 1), out_axes=1)(bands, q)
        q_new, _ = jnp.linalg.qr(z)
        return q_new

    q = jax.lax.fori_loop(0, iters, body, q0)
    aq = jax.vmap(band_matvec, in_axes=(None, 1), out_axes=1)(bands, q)
    return q, q.T @ aq


@partial(jax.jit, static_argnums=(2, 3))
def _subspace_inv(bands, sigma, k, iters, q0):
    """inverse orthogonal iteration through (A - sigma I)^{-1} with locking
    of the dominant (near-null) mode; returns (q, h = q^T A q).

    With sigma far below the rest of the spectrum, the near-null eigenvector
    dominates every solve by ~1/sigma and would contaminate the remaining
    Ritz directions at each QR in floating point.  So the dominant vector is
    converged first (a few power steps -- its convergence ratio is
    ~sigma/|lambda_1|) and LOCKED: the rest of the block iterates with the
    locked direction projected out after every solve, which removes the
    amplified component before it can swamp the others."""
    lu = banded_lu_factor(bands_add_diag(bands, -sigma))

    def solve_cols(q):
        return jax.vmap(banded_lu_solve, in_axes=(None, 1), out_axes=1)(lu, q)

    # stage 1: the dominant inverse mode (the near-null vector of A)
    def power_body(_i, v):
        z = banded_lu_solve(lu, v)
        return z / jnp.linalg.norm(z)

    v = jax.lax.fori_loop(0, 8, power_body, q0[:, 0])

    # stage 2: deflated block iteration for the remaining columns
    def body(_i, q):
        z = solve_cols(q)
        z = z - jnp.outer(v, v @ z)
        q_new, _ = jnp.linalg.qr(z)
        return q_new

    q_rest = q0[:, 1:] - jnp.outer(v, v @ q0[:, 1:])
    q_rest = jax.lax.fori_loop(0, iters, body, q_rest)
    q = jnp.concatenate([v[:, None], q_rest], axis=1)
    aq = jax.vmap(band_matvec, in_axes=(None, 1), out_axes=1)(bands, q)
    return q, q.T @ aq


def _start_basis(n, k, dtype):
    """deterministic orthonormal start: seeded Gaussian + QR (host, tiny)"""
    rng = np.random.default_rng(20260817)
    q0, _ = np.linalg.qr(rng.standard_normal((n, k)))
    return jnp.asarray(q0, dtype)


def banded_extreme_eigs(bands, k=5, iters=100, pad=3):
    """largest-|lambda| Ritz values of the banded operator (descending)"""
    n = bands.shape[0]
    kk = min(k + pad, n)
    q0 = _start_basis(n, kk, bands.dtype)
    _q, h = _subspace_fwd(bands, kk, int(iters), q0)
    vals = np.linalg.eigvals(np.asarray(h, np.float64))
    return vals[np.argsort(-np.abs(vals))][:k]


def banded_smallest_eigs(bands, sigma, k=5, iters=100, pad=3):
    """smallest-|lambda| eigen pairs of A via shift-inverted iteration.

    sigma regularizes the factorization of a (near-)singular A -- keep it
    well below the eigenvalues of interest (the ARPACK-oracle semantics are
    shift-invert at exactly zero; roundoff keeps the pivot-free LU viable
    even for an exactly singular A, so sigma ~ 1e-8 * diag scale works).
    Returns (vals, vecs): vals (k,) complex ascending |lambda|, vecs (n, k)
    the corresponding real Ritz vectors (columns; complex pairs contribute
    their real part, as the downstream null-vector use requires).
    """
    n = bands.shape[0]
    kk = min(k + pad, n)
    q0 = _start_basis(n, kk, bands.dtype)
    q, h = _subspace_inv(bands, sigma, kk, int(iters), q0)
    vals, small_vecs = np.linalg.eig(np.asarray(h, np.float64))
    order = np.argsort(np.abs(vals))[:k]
    vals = vals[order]
    vecs = np.asarray(q, np.float64) @ small_vecs[:, order].real
    return vals, vecs


def banded_shift_solve(bands, shift, rhs):
    """solve (A - shift I) x = rhs through the banded LU (device)"""
    lu = banded_lu_factor(bands_add_diag(bands, -shift))
    return banded_lu_solve(lu, rhs)


__all__ = [
    "band_matvec",
    "banded_extreme_eigs",
    "banded_smallest_eigs",
    "banded_shift_solve",
]

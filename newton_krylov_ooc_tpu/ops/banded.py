"""banded LU factorization and solves (no pivoting), jittable.

The Radau stage systems of the 2D transport models are banded (stencil
neighbors at offsets +-1 and +-ny) and block-diagonal over tracers; dense LU
costs O(m^3) per factorization while banded LU is O(m*bw^2) -- ~100x fewer
flops at CI sizes, and, unlike XLA's LuDecomposition, runs in float64 (and
complex128) on TPU because it is plain arithmetic under lax.scan.

No pivoting: the shifted stage matrices (mu/h I - J) of diffusion-dominated
implicit systems are strongly diagonally dominant, the textbook case where
pivot-free LU is stable.

Row-band storage: bands[i, d] = A[i, i + d - bw] for d in [0, 2*bw]; entries
outside the matrix are zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def dense_to_bands(mat, bw):
    """(m, m) dense -> (m, 2bw+1) row-band storage (numpy, for tests/setup)"""
    mat = np.asarray(mat)
    m = mat.shape[0]
    bands = np.zeros((m, 2 * bw + 1), mat.dtype)
    for d in range(2 * bw + 1):
        off = d - bw
        idx = np.arange(max(0, -off), min(m, m - off))
        bands[idx, d] = mat[idx, idx + off]
    return bands


def bands_add_diag(bands, val):
    """add val to the main diagonal of a row-band matrix"""
    bw = (bands.shape[-1] - 1) // 2
    return bands.at[..., bw].add(val)


def banded_lu_factor(bands):
    """in-place-style LU of a row-band matrix; returns the factored bands

    L's multipliers overwrite the lower band, U the diagonal + upper band.
    """
    m, width = bands.shape
    bw = (width - 1) // 2
    dtype = bands.dtype

    # pad so the elimination window below the last pivot stays in bounds
    padded = jnp.vstack([bands, jnp.zeros((bw, width), dtype)])
    k_idx = jnp.arange(bw)
    col_idx = jnp.arange(width)

    def step(mat, i):
        # pivot row i, eliminate rows i+1 .. i+bw
        pivot_row = jax.lax.dynamic_slice(mat, (i, 0), (1, width))[0]
        pivot = pivot_row[bw]
        window = jax.lax.dynamic_slice(mat, (i + 1, 0), (bw, width))
        # l[k] = A[i+1+k, i] / A[i, i]  at band position bw - (k+1)
        l_vec = window[k_idx, bw - 1 - k_idx] / pivot
        # row i+1+k aligns with the pivot row shifted by k+1:
        # A[i+1+k, c] -= l[k] * A[i, c]  ->  band[d] -= l[k] * pivot[d + k + 1]
        # (only the pivot row's U part participates; its lower band holds
        # already-stored multipliers, not matrix entries)
        pivot_u = jnp.where(col_idx >= bw, pivot_row, jnp.zeros((), dtype))
        pivot_pad = jnp.concatenate([pivot_u, jnp.zeros(bw + 1, dtype)])
        shift_mat = pivot_pad[k_idx[:, None] + 1 + col_idx[None, :]]
        window = window - l_vec[:, None] * shift_mat
        # store the multipliers where the eliminated entries lived
        window = window.at[k_idx, bw - 1 - k_idx].set(l_vec)
        mat = jax.lax.dynamic_update_slice(mat, window, (i + 1, 0))
        return mat, None

    factored, _ = jax.lax.scan(step, padded, jnp.arange(m - 1))
    return factored[:m]


def banded_lu_solve(factored, rhs):
    """solve A x = rhs given banded_lu_factor output"""
    m, width = factored.shape
    bw = (width - 1) // 2
    dtype = factored.dtype
    rhs = rhs.astype(dtype)

    # forward substitution: y[i] = b[i] - sum_k L[i, i-k] y[i-k], k = 1..bw
    def fwd(carry, inp):
        hist = carry  # (bw,) latest y values, hist[-1] most recent
        b_i, row = inp
        lcoef = row[:bw]  # band positions 0..bw-1 = offsets -bw..-1
        y_i = b_i - jnp.sum(lcoef * hist)
        hist = jnp.concatenate([hist[1:], y_i[None]])
        return hist, y_i

    _, y = jax.lax.scan(
        fwd, jnp.zeros(bw, dtype), (rhs, factored)
    )

    # back substitution: x[i] = (y[i] - sum_k U[i, i+k] x[i+k]) / U[i, i]
    def back(carry, inp):
        hist = carry  # (bw,) next x values, hist[0] nearest
        y_i, row = inp
        ucoef = row[bw + 1 :]  # offsets +1..+bw
        x_i = (y_i - jnp.sum(ucoef * hist)) / row[bw]
        hist = jnp.concatenate([x_i[None], hist[:-1]])
        return hist, x_i

    _, x_rev = jax.lax.scan(
        back, jnp.zeros(bw, dtype), (y, factored), reverse=True
    )
    return x_rev


banded_lu_factor_blocks = jax.vmap(banded_lu_factor)
banded_lu_solve_blocks = jax.vmap(banded_lu_solve)


def complex_shift_bands(neg_bands, alpha, beta):
    """
    real-interleaved band matrix of (alpha + i beta) I + N, N real banded

    Complex arithmetic is unsupported for f64 on TPU, so the complex Radau
    stage system is solved as an equivalent real system on interleaved
    (re, im) unknowns: bandwidth doubles (+1 for the re/im coupling), cost
    ~4x a real factorization -- the same as native complex LU.

    neg_bands: (m, 2bw+1) row-band storage of N (typically -J)
    returns (2m, 4bw+3) row-band storage
    """
    m, width = neg_bands.shape
    bw = (width - 1) // 2
    w2 = 4 * bw + 3
    c2 = 2 * bw + 1
    dtype = neg_bands.dtype

    base = jnp.zeros((m, w2), dtype)
    base = base.at[:, 1::2].set(neg_bands)
    base = base.at[:, c2].add(alpha)
    re_rows = base.at[:, c2 + 1].set(-beta)
    im_rows = base.at[:, c2 - 1].set(beta)
    return jnp.stack([re_rows, im_rows], axis=1).reshape(2 * m, w2)


def complex_banded_solve(factored, rhs_re, rhs_im):
    """solve the interleaved real system; returns (x_re, x_im)"""
    rhs = jnp.stack([rhs_re, rhs_im], axis=-1).reshape(-1)
    sol = banded_lu_solve(factored, rhs).reshape(-1, 2)
    return sol[:, 0], sol[:, 1]


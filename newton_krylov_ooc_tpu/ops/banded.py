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



# -- block-banded kernels -----------------------------------------------------
#
# For coupled-tracer stage systems (b tracers per grid cell, cell-level stencil
# bandwidth BW) scalar banded LU moves O(m * (b*BW)^2) elements; block-band
# storage moves O((m/b) * BW^2 * b^2) = b x less, with b x fewer (fatter)
# scan steps.  Block row-band storage:
#   bands[i, d] = A_block[i, i + d - BW]   (shape (M, 2*BW+1, b, b))
# The factored form stores L multiplier blocks in the lower band, U blocks in
# the upper band, and the INVERSE of each pivot block on the diagonal (so
# solves never re-invert).  No pivoting: stage matrices (mu/h I - J) are
# block-diagonally dominant.


def _small_inv(mat):
    """inverse of a small (b, b) block by unrolled Gauss-Jordan (no pivoting;
    avoids XLA LuDecomposition so it runs float64/complex on TPU)"""
    b = mat.shape[-1]
    aug = jnp.concatenate([mat, jnp.eye(b, dtype=mat.dtype)], axis=-1)
    for j in range(b):
        row_j = aug[j] / aug[j, j]
        aug = aug - aug[:, j:j + 1] * row_j[None, :]
        aug = aug.at[j].set(row_j)
    return aug[:, b:]


def block_bands_add_diag(bands, val):
    """add val to the scalar diagonal of every diagonal block"""
    b = bands.shape[-1]
    bw = (bands.shape[1] - 1) // 2
    diag_idx = jnp.arange(b)
    return bands.at[:, bw, diag_idx, diag_idx].add(val)


def block_banded_lu_factor(bands):
    """block LU of block-row-band storage; see module comment for the layout

    returns the factored bands with pivot-block inverses on the diagonal.
    """
    m, width, b, _ = bands.shape
    bw = (width - 1) // 2
    dtype = bands.dtype

    padded = jnp.concatenate(
        [bands, jnp.zeros((bw, width, b, b), dtype)], axis=0
    )
    k_idx = jnp.arange(bw)
    col_idx = jnp.arange(width)

    def step(mat, i):
        pivot_row = jax.lax.dynamic_slice(mat, (i, 0, 0, 0), (1, width, b, b))[0]
        pinv = _small_inv(pivot_row[bw])
        window = jax.lax.dynamic_slice(mat, (i + 1, 0, 0, 0), (bw, width, b, b))
        # L_k = A[i+1+k, i] @ pinv, stored at band position bw - (k+1)
        sub = window[k_idx, bw - 1 - k_idx]  # (bw, b, b)
        l_blk = jnp.einsum("kab,bc->kac", sub, pinv)
        # pivot row's U part only (lower band holds stored multipliers)
        pivot_u = jnp.where(
            (col_idx >= bw)[:, None, None], pivot_row, jnp.zeros((), dtype)
        )
        pivot_pad = jnp.concatenate(
            [pivot_u, jnp.zeros((bw + 1, b, b), dtype)], axis=0
        )
        shift = pivot_pad[k_idx[:, None] + 1 + col_idx[None, :]]  # (bw, W, b, b)
        window = window - jnp.einsum("kab,kdbc->kdac", l_blk, shift)
        window = window.at[k_idx, bw - 1 - k_idx].set(l_blk)
        mat = jax.lax.dynamic_update_slice(mat, window, (i + 1, 0, 0, 0))
        # store the pivot inverse in place of the processed diagonal block
        mat = jax.lax.dynamic_update_slice(
            mat, pinv[None, None], (i, bw, 0, 0)
        )
        return mat, None

    factored, _ = jax.lax.scan(step, padded, jnp.arange(m - 1))
    factored = factored[:m]
    # invert the last pivot block too
    last_inv = _small_inv(factored[m - 1, bw])
    return factored.at[m - 1, bw].set(last_inv)


def block_banded_lu_solve(factored, rhs):
    """solve A x = rhs given block_banded_lu_factor output; rhs: (M, b)"""
    m, width, b, _ = factored.shape
    bw = (width - 1) // 2
    dtype = factored.dtype
    rhs = rhs.astype(dtype)

    # forward: y[i] = b[i] - sum_d L[i, d] y[i + d - bw], d < bw
    def fwd(hist, inp):
        b_i, row = inp
        l_blk = row[:bw]  # (bw, b, b), offsets -bw..-1 (oldest..newest)
        y_i = b_i - jnp.einsum("dab,db->a", l_blk, hist)
        hist = jnp.concatenate([hist[1:], y_i[None]], axis=0)
        return hist, y_i

    _, y = jax.lax.scan(fwd, jnp.zeros((bw, b), dtype), (rhs, factored))

    # back: x[i] = Pinv_i (y[i] - sum_d U[i, bw+1+d] x[i+1+d])
    def back(hist, inp):
        y_i, row = inp
        u_blk = row[bw + 1:]  # offsets +1..+bw (nearest..farthest)
        x_i = row[bw] @ (y_i - jnp.einsum("dab,db->a", u_blk, hist))
        hist = jnp.concatenate([x_i[None], hist[:-1]], axis=0)
        return hist, x_i

    _, x = jax.lax.scan(
        back, jnp.zeros((bw, b), dtype), (y, factored), reverse=True
    )
    return x


def complex_shift_block_bands(neg_bands, alpha, beta):
    """(alpha + i*beta) I + real block bands -> interleaved real block bands

    neg_bands: (M, W, b, b) blocks of -J; returns (M, W, 2b, 2b) blocks of the
    real form [[alpha I - J, -beta I], [beta I, alpha I - J]] (per cell; the
    alpha/beta terms touch only diagonal blocks).  For TPU, where complex
    dtypes are unavailable.
    """
    m, width, b, _ = neg_bands.shape
    bw = (width - 1) // 2
    dtype = neg_bands.dtype
    out = jnp.zeros((m, width, 2 * b, 2 * b), dtype)
    out = out.at[:, :, :b, :b].set(neg_bands)
    out = out.at[:, :, b:, b:].set(neg_bands)
    diag_idx = jnp.arange(b)
    out = out.at[:, bw, diag_idx, diag_idx].add(alpha)
    out = out.at[:, bw, b + diag_idx, b + diag_idx].add(alpha)
    out = out.at[:, bw, diag_idx, b + diag_idx].add(-beta)
    out = out.at[:, bw, b + diag_idx, diag_idx].add(beta)
    return out


def complex_block_banded_solve(factored, rhs_re, rhs_im):
    """solve the interleaved real block system; rhs_re/rhs_im: (M, b)"""
    rhs = jnp.concatenate([rhs_re, rhs_im], axis=-1)  # (M, 2b)
    sol = block_banded_lu_solve(factored, rhs)
    b = rhs_re.shape[-1]
    return sol[:, :b], sol[:, b:]

"""on-device sparse solves: ELL-packed matvec + Jacobi-BiCGSTAB, jittable.

The TPU-native counterpart of the distributed sparse preconditioner solve the
reference delegates to MPI/SuperLU_DIST (`solve_ABdist`,
nk_ooc/cime_pop/model_state.py:317-337).  CSR matrices (as produced by the
gen_A-compatible native tool) are padded host-side to ELL format -- a static
(rows, max_nnz_per_row) layout whose matvec is one gather + one contraction,
XLA-friendly on every backend -- and the systems solve with preconditioned
BiCGSTAB under `lax.while_loop` (no data-dependent Python control flow;
`vmap` batches independent right-hand sides).  The preconditioner is
pointwise Jacobi, or -- when the caller supplies the gen_A grid decomposition
-- exact vertical-line solves (column_tridiag_from_csr + PCR), which cuts
iteration counts by ~60x on vmix-stiff implicit transport matrices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .tridiag import pcr_solve

# iterative-refinement tuning shared by the unsharded
# (_solve_ell_batch_line_mixed) and sharded
# (parallel.sharded_sparse._local_mixed_refine_loop) mixed-precision solves;
# keep the two paths' convergence behavior identical
MIXED_REFINE_MAX_ROUNDS = 12
MIXED_REFINE_STALL_FACTOR = 0.5
MIXED_INNER_RTOL = 1.0e-6


def warn_if_x64_off(caller):
    """warn when a float64 solve would silently truncate to float32

    without x64 every float64 array request truncates to float32; the
    BiCGSTAB recurrence residual then under-reports the true error (~1e-6
    actual at a 1e-12 "converged" tolerance), and the mixed-precision
    refinement loop stalls at the f32 floor.
    """
    if jax.dtypes.canonicalize_dtype(np.float64) != np.float64:
        import warnings

        warnings.warn(
            f"{caller}: jax_enable_x64 is off, so this float64 solve will "
            "actually run in float32 and converge only to ~1e-6 true "
            "relative error; enable x64 for full accuracy",
            stacklevel=3,
        )


def csr_to_ell(row_ptr, col_ind, data, n_cols=None):
    """pad CSR to ELL: (vals, cols) of shape (rows, max_nnz_per_row)

    padding entries have value 0 and point at column 0, so the matvec needs
    no mask.  host-side (numpy); returns numpy arrays.
    """
    row_ptr = np.asarray(row_ptr, np.int64)
    col_ind = np.asarray(col_ind, np.int64)
    data = np.asarray(data, np.float64)
    rows = row_ptr.size - 1
    per_row = np.diff(row_ptr)
    width = int(per_row.max()) if rows else 0
    vals = np.zeros((rows, width), np.float64)
    cols = np.zeros((rows, width), np.int64)
    # vectorized scatter: position (r, j) holds the j-th entry of row r; the
    # boolean mask enumerates exactly the CSR entries in storage order
    in_row = np.arange(width)[None, :] < per_row[:, None]
    vals[in_row] = data
    cols[in_row] = col_ind
    return vals, cols


def ell_matvec(vals, cols, x):
    """y = A x for an ELL-packed matrix"""
    return jnp.einsum("rk,rk->r", vals, x[cols])


def ell_diagonal(vals, cols):
    """main diagonal of an ELL-packed matrix"""
    rows = jnp.arange(vals.shape[0])
    return jnp.sum(jnp.where(cols == rows[:, None], vals, 0.0), axis=1)


def jacobi_inverse_diagonal(vals, cols):
    """1/diag(A) for Jacobi preconditioning, with 1.0 substituted on zero
    diagonal entries (the single source of the singular-diagonal convention)
    """
    diag = ell_diagonal(vals, cols)
    return jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 1.0)


def column_tridiag_from_csr(row_ptr, col_ind, data, row_to_cell, nhoriz,
                            nz=None):
    """extract the vertical-line part of a gen_A-style CSR matrix

    gen_A numbers matrix rows over masked cells of an (nz, nlat, nlon) grid in
    C order, so cell = k * nhoriz + h with h the horizontal (water-column)
    index.  This regroups the rows into vertical lines and pulls out, per
    line, the tridiagonal coupling along depth: the full matrix diagonal
    (including horizontal-transport and sink contributions) plus the
    adjacent-level entries.  On the implicitly stepped transport matrices the
    vertical mixing term dominates the off-diagonal mass (dt*kv/dz^2 >> the
    lateral CFL numbers), so solving these lines exactly is the classic line
    relaxation upgrade over pointwise Jacobi.

    host-side (numpy).  returns (dl, d, du, slot_of_row):
      dl/d/du: (n_lines, nz) float64 padded with identity rows where a line
               has no active cell at that level
      slot_of_row: (nrows,) int64 position of each matrix row in the packed
               (n_lines * nz) layout
    """
    row_ptr = np.asarray(row_ptr, np.int64)
    col_ind = np.asarray(col_ind, np.int64)
    data = np.asarray(data, np.float64)
    row_to_cell = np.asarray(row_to_cell, np.int64)
    nrows = row_ptr.size - 1
    if nz is None:
        nz = int(row_to_cell.max()) // int(nhoriz) + 1 if nrows else 1
    h_of_row = row_to_cell % nhoriz
    k_of_row = row_to_cell // nhoriz
    _, line_of_row = np.unique(h_of_row, return_inverse=True)
    n_lines = int(line_of_row.max()) + 1 if nrows else 0
    slot_of_row = line_of_row * nz + k_of_row

    dl = np.zeros(n_lines * nz)
    du = np.zeros(n_lines * nz)
    d = np.ones(n_lines * nz)
    d[slot_of_row] = 0.0

    # per-nonzero classification directly on flat cell indices: the
    # diagonal is cell_col == cell_row and a same-column vertical neighbor
    # is exactly cell_col - cell_row == +-nhoriz, so no per-entry (h, k)
    # decomposition is needed.  bincount instead of np.add.at (~10x faster
    # at production nnz counts; the gx1 grid has >1e8 nonzeros).
    per_row = np.diff(row_ptr)
    cell_diff = row_to_cell[col_ind] - np.repeat(row_to_cell, per_row)
    slot_rep = np.repeat(slot_of_row, per_row)
    for target, band in ((0, d), (nhoriz, du), (-nhoriz, dl)):
        sel = cell_diff == target
        band += np.bincount(
            slot_rep[sel], weights=data[sel], minlength=band.size
        )
    # a zero diagonal would poison the line solve; fall back to identity on
    # such rows (same convention as jacobi_inverse_diagonal)
    bad = d == 0.0
    d[bad] = 1.0
    dl[bad] = 0.0
    du[bad] = 0.0
    shape = (n_lines, nz)
    return dl.reshape(shape), d.reshape(shape), du.reshape(shape), slot_of_row


def line_precond_apply(dl, d, du, slot_of_row, v):
    """apply the column-line preconditioner: scatter v into the packed
    (n_lines, nz) layout, PCR-solve every line at once, gather back"""
    packed = (
        jnp.zeros(dl.shape[0] * dl.shape[1], v.dtype)
        .at[slot_of_row]
        .set(v)
        .reshape(dl.shape)
    )
    return pcr_solve(dl, d, du, packed).reshape(-1)[slot_of_row]


def bicgstab_ell(vals, cols, b, rtol=1.0e-12, atol=0.0, max_iter=10000):
    """Jacobi-preconditioned BiCGSTAB solve of A x = b, A in ELL form

    returns (x, converged, n_iter); fully jittable, vmap over b for multiple
    right-hand sides.
    """
    d_inv = jacobi_inverse_diagonal(vals, cols)

    def precond(v):
        return d_inv * v

    def matvec(v):
        return ell_matvec(vals, cols, v)

    return bicgstab(matvec, b, precond=precond, rtol=rtol, atol=atol,
                    max_iter=max_iter)


def bicgstab(matvec, b, precond=None, rtol=1.0e-12, atol=0.0,
             max_iter=10000):
    """matrix-free right-preconditioned BiCGSTAB solve of A x = b

    matvec/precond are callables on flat vectors (precond None = identity);
    any linear operator works -- in particular the 3D transport stencils
    (ops/transport3d.py), the TPU-native replacement for assembling the
    operator into a sparse matrix first.  returns (x, converged, n_iter);
    fully jittable.
    """
    if precond is None:
        precond = lambda v: v  # noqa: E731

    bnorm = jnp.sqrt(b @ b)
    tol = jnp.maximum(rtol * bnorm, atol)

    x0 = jnp.zeros_like(b)
    r0 = b
    state0 = (x0, r0, r0, jnp.zeros_like(b), jnp.zeros_like(b),
              jnp.asarray(1.0, b.dtype), jnp.asarray(1.0, b.dtype),
              jnp.asarray(1.0, b.dtype), jnp.asarray(0, jnp.int32),
              jnp.asarray(False))

    def cond(state):
        (_x, r, _rh, _p, _v, _rho, _alpha, _omega, k, broke) = state
        return (jnp.sqrt(r @ r) > tol) & (k < max_iter) & ~broke

    def body(state):
        x, r, r_hat, p, v, rho, alpha, omega, k, _ = state
        rho_new = r_hat @ r
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        p_hat = precond(p)
        v = matvec(p_hat)
        denom = r_hat @ v
        alpha = rho_new / denom
        s = r - alpha * v
        s_hat = precond(s)
        t = matvec(s_hat)
        tt = t @ t
        omega_new = jnp.where(tt > 0, (t @ s) / jnp.where(tt > 0, tt, 1.0), 0.0)
        x = x + alpha * p_hat + omega_new * s_hat
        r = s - omega_new * t
        broke = (omega_new == 0.0) | (denom == 0.0) | (rho_new == 0.0)
        return (x, r, r_hat, p, v, rho_new, alpha, omega_new, k + 1, broke)

    x, r, *_rest, k, broke = jax.lax.while_loop(cond, body, state0)
    converged = jnp.sqrt(r @ r) <= tol
    return x, converged, k


def solve_csr_systems(row_ptr, col_ind, data, rhs_batch, rtol=1.0e-12,
                      max_iter=10000, row_to_cell=None, nhoriz=None,
                      return_iters=False, mixed_precision=False):
    """solve A x_i = b_i for a batch of right-hand sides (host entry)

    rhs_batch: (n_rhs, n) numpy/array; returns (x_batch, converged_flags).
    The CSR matrix pads to ELL once; the batched solve runs jitted on the
    default device.

    With row_to_cell + nhoriz (gen_A writes both: the row map variable and
    the grid_nhoriz dimension), BiCGSTAB preconditions with exact
    vertical-line solves (column_tridiag_from_csr) instead of pointwise
    Jacobi -- far fewer iterations on implicit transport matrices, whose
    stiffness lives in the vertical mixing term.  With return_iters=True a
    third array of per-rhs (inner-)iteration counts is appended.

    mixed_precision=True (requires the line-precond arguments) runs the
    BiCGSTAB iterations in float32 -- the fast arithmetic on TPU, where
    float64 is software-emulated -- inside a float64 iterative-refinement
    loop: residuals against the float64 matrix, normalized corrections
    solved in float32, repeated until the float64 residual meets rtol.
    Classic mixed-precision IR; reaches the same 1e-12 accuracy as the pure
    float64 solve.
    """
    warn_if_x64_off("solve_csr_systems")
    vals_np, cols_np = csr_to_ell(row_ptr, col_ind, data)
    vals = jnp.asarray(vals_np)
    cols = jnp.asarray(cols_np)
    rhs = jnp.asarray(np.asarray(rhs_batch, np.float64))

    # matrix passed as operands (not closure constants): closure-captured
    # arrays become program literals that remote-device backends re-upload
    # per call, and a fresh closure would also retrace on every invocation
    if row_to_cell is not None and nhoriz is not None:
        dl, d, du, slot = column_tridiag_from_csr(
            row_ptr, col_ind, data, row_to_cell, nhoriz
        )
        slot = jnp.asarray(slot)
        if mixed_precision:
            x, ok, iters = _solve_ell_batch_line_mixed(
                vals, cols, rhs,
                jnp.asarray(vals_np, jnp.float32),
                jnp.asarray(dl, jnp.float32), jnp.asarray(d, jnp.float32),
                jnp.asarray(du, jnp.float32), slot, rtol, max_iter,
            )
        else:
            x, ok, iters = _solve_ell_batch_line(
                vals, cols, rhs, jnp.asarray(dl), jnp.asarray(d),
                jnp.asarray(du), slot, rtol, max_iter
            )
    elif mixed_precision:
        raise ValueError(
            "mixed_precision needs the line-precond arguments "
            "(row_to_cell + nhoriz)"
        )
    else:
        x, ok, iters = _solve_ell_batch(vals, cols, rhs, rtol, max_iter)
    if return_iters:
        return np.asarray(x), np.asarray(ok), np.asarray(iters)
    return np.asarray(x), np.asarray(ok)


@partial(jax.jit, static_argnums=(3, 4))
def _solve_ell_batch(vals, cols, rhs, rtol, max_iter):
    def one(b):
        return bicgstab_ell(vals, cols, b, rtol=rtol, max_iter=max_iter)

    return jax.vmap(one)(rhs)


@partial(jax.jit, static_argnums=(7, 8))
def _solve_ell_batch_line(vals, cols, rhs, dl, d, du, slot, rtol, max_iter):
    def one(b):
        return bicgstab(
            lambda v: ell_matvec(vals, cols, v),
            b,
            precond=lambda v: line_precond_apply(dl, d, du, slot, v),
            rtol=rtol,
            max_iter=max_iter,
        )

    return jax.vmap(one)(rhs)


@partial(jax.jit, static_argnums=(8, 9))
def _solve_ell_batch_line_mixed(vals64, cols, rhs, vals32, dl, d, du, slot,
                                rtol, max_iter):
    """float32 line-preconditioned BiCGSTAB inside float64 iterative
    refinement (see solve_csr_systems(mixed_precision=True))"""

    def one(b):
        bnorm = jnp.sqrt(b @ b)
        tol = rtol * bnorm

        def matvec32(v):
            return ell_matvec(vals32, cols, v)

        def precond32(v):
            return line_precond_apply(dl, d, du, slot, v)

        def cond(state):
            _x, _r, rnorm, rounds, _inner, stalled = state
            return (
                (rnorm > tol)
                & (rounds < MIXED_REFINE_MAX_ROUNDS)
                & ~stalled
            )

        def body(state):
            x, r, rnorm, rounds, inner, stalled = state
            # under vmap the body also runs for lanes whose own cond is
            # already false (while any lane is active); zero those lanes'
            # correction rhs so their inner solve exits immediately instead
            # of burning max_iter discarded iterations
            active = (rnorm > tol) & ~stalled
            # normalize the correction system so the f32 inner solve works
            # at unit scale (no under/overflow as the residual shrinks)
            scale = jnp.where(rnorm > 0, rnorm, 1.0)
            dx32, _ok, k = bicgstab(
                matvec32,
                jnp.where(active, r / scale, 0.0).astype(jnp.float32),
                precond=precond32,
                rtol=MIXED_INNER_RTOL,
                max_iter=max_iter,
            )
            x_new = x + scale * dx32.astype(jnp.float64)
            # the carried residual costs ONE f64 matvec per round -- the
            # software-emulated-on-TPU operation this mode exists to avoid
            r_new = b - ell_matvec(vals64, cols, x_new)
            rn = jnp.sqrt(r_new @ r_new)
            # a round that fails to contract the f64 residual means the f32
            # solve has hit its floor -- bail instead of looping, and only
            # commit the correction when it actually reduced the residual
            # (a diverging round must not make the returned x worse)
            stalled = rn >= MIXED_REFINE_STALL_FACTOR * rnorm
            accept = rn < rnorm
            x = jnp.where(accept, x_new, x)
            r = jnp.where(accept, r_new, r)
            rnorm = jnp.where(accept, rn, rnorm)
            return (x, r, rnorm, rounds + 1, inner + k, stalled)

        state0 = (
            jnp.zeros_like(b),
            b,
            bnorm,
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
        )
        x, _r, rnorm, _rounds, inner, _stalled = jax.lax.while_loop(
            cond, body, state0
        )
        return x, rnorm <= tol, inner

    return jax.vmap(one)(rhs)

"""on-device sparse solves: stencil-diagonal (DIA) matvec + BiCGSTAB.

The TPU-native counterpart of the distributed sparse preconditioner solve the
reference delegates to MPI/SuperLU_DIST (`solve_ABdist`,
nk_ooc/cime_pop/model_state.py:317-337).  gen_A-style matrices live on a
structured (nz, nhoriz) grid, so `cell[col] - cell[row]` takes only a few
dozen distinct values: regrouped by that offset (DIA format over the flat
cell index) the matvec is a short static loop of dense shift+multiply-add
passes -- no gathers at all.  That matters enormously on TPU, where the
generic gather SpMV runs ~60 ms per matvec at gx3 scale (3.5M random
accesses) and a thousand-iteration `lax.while_loop` around it becomes a
multi-minute single dispatch; the DIA matvec is bandwidth-bound dense work.
CSR-to-ELL (gather) packing is kept as the fallback for matrices without
grid structure.  The systems solve with preconditioned BiCGSTAB under
`lax.while_loop` (no data-dependent Python control flow; `vmap` batches
independent right-hand sides).  The preconditioner is pointwise Jacobi, or
-- when the caller supplies the gen_A grid decomposition -- exact
vertical-line solves, which cut iteration counts by ~60x on vmix-stiff
implicit transport matrices; on the grid layout the line solve is a
reshape + PCR with zero gathers (column_tridiag_grid).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .tridiag import pcr_solve

# iterative-refinement tuning shared by the unsharded
# (_solve_dia_batch_line_mixed) and sharded
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


# DIA beyond this many diagonals would start to lose to the gather matvec
# (and signals the matrix isn't the structured-stencil kind DIA targets)
_DIA_MAX_OFFSETS = 96


def grid_dia_from_csr(row_ptr, col_ind, data, row_to_cell, n_cells):
    """regroup a structured-grid CSR matrix into flat-cell diagonals

    gen_A numbers matrix rows over the wet cells of an (nz, nlat, nlon)
    grid; its stencil (upwind3 + mixing + sink + surface terms) makes
    `cell[col] - cell[row]` take only a few dozen distinct values (the
    zonal wrap rows contribute their own +-(nlon-1)-style offsets).  Host
    side (numpy).  Returns (offsets, coefs): a sorted int tuple and a
    (n_offsets, n_cells) float64 array with coefs[i][cell_of_row] =
    A[row, row_of(cell + offsets[i])], zero where no entry exists --
    exactly the DIA storage of the same matrix on the full grid, so
    dia_matvec needs no index arithmetic at run time.
    """
    row_ptr = np.asarray(row_ptr, np.int64)
    per_row = np.diff(row_ptr)
    cell_r = np.repeat(np.asarray(row_to_cell, np.int64), per_row)
    cell_c = np.asarray(row_to_cell, np.int64)[np.asarray(col_ind, np.int64)]
    d_all = cell_c - cell_r
    offsets = np.unique(d_all)
    coefs = np.zeros((offsets.size, n_cells))
    for ind, off in enumerate(offsets):
        sel = d_all == off
        # one entry per (row, col) pair, so plain assignment is exact
        coefs[ind][cell_r[sel]] = np.asarray(data, np.float64)[sel]
    return tuple(int(off) for off in offsets), coefs


def dia_matvec(offsets, coefs, x):
    """y = A x for grid-diagonal storage; offsets is a STATIC tuple

    x is the flat-cell vector (dry cells zero).  One padded copy of x and
    len(offsets) dense multiply-adds -- no gathers.
    """
    n = x.shape[0]
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    x_pad = jnp.pad(x, (lo, hi))
    out = None
    for ind, off in enumerate(offsets):
        term = coefs[ind] * jax.lax.slice(x_pad, (lo + off,), (lo + off + n,))
        out = term if out is None else out + term
    return out


def column_tridiag_grid(row_ptr, col_ind, data, row_to_cell, nhoriz, nz):
    """vertical-line bands of a gen_A-style matrix on the FULL grid layout

    Like column_tridiag_from_csr, but the bands come back as (nhoriz, nz)
    float64 arrays over every grid cell (identity rows where a cell has no
    matrix row or a zero diagonal), so the line preconditioner applies to a
    flat-cell vector as reshape + pcr_solve + reshape -- no gather/scatter.
    Host side (numpy).
    """
    row_ptr = np.asarray(row_ptr, np.int64)
    per_row = np.diff(row_ptr)
    cell_r = np.repeat(np.asarray(row_to_cell, np.int64), per_row)
    cell_diff = (
        np.asarray(row_to_cell, np.int64)[np.asarray(col_ind, np.int64)]
        - cell_r
    )
    n_cells = nz * nhoriz
    data = np.asarray(data, np.float64)
    dl = np.zeros(n_cells)
    d = np.zeros(n_cells)
    du = np.zeros(n_cells)
    for target, band in ((0, d), (nhoriz, du), (-nhoriz, dl)):
        sel = cell_diff == target
        band[cell_r[sel]] = data[sel]
    bad = d == 0.0
    d[bad] = 1.0
    dl[bad] = 0.0
    du[bad] = 0.0
    # (nz, nhoriz) C-order matches the flat cell index; lines want depth
    # on the (pcr_solve) last axis
    return tuple(
        np.ascontiguousarray(band.reshape(nz, nhoriz).T)
        for band in (dl, d, du)
    )


def grid_line_precond_apply(dl, d, du, v):
    """line preconditioner on a flat-cell vector: reshape + PCR, no gathers"""
    nhoriz, nz = d.shape
    v2 = v.reshape(nz, nhoriz).T
    return pcr_solve(dl, d, du, v2).T.reshape(-1)


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
                      return_iters=False, mixed_precision=False,
                      precond="line", refine_rounds=None):
    """solve A x_i = b_i for a batch of right-hand sides (host entry)

    rhs_batch: (n_rhs, n) numpy/array; returns (x_batch, converged_flags).
    With return_iters=True a third array of per-rhs (inner-)iteration
    counts is appended.

    With row_to_cell + nhoriz (gen_A writes both: the row map variable and
    the grid_nhoriz dimension) the matrix regroups into flat-cell
    diagonals (grid_dia_from_csr) -- the solve then runs gather-free, with
    every BiCGSTAB vector living on the full grid (dry cells identically
    zero).  BiCGSTAB preconditions with exact vertical-line solves
    (precond="line", the default: far fewer iterations on implicit
    transport matrices, whose stiffness lives in the vertical mixing term)
    or pointwise Jacobi (precond="jacobi", the comparison baseline).
    Without the grid arguments the matrix pads to ELL and the matvec is a
    gather (slow on TPU -- supply the grid map whenever it exists).

    mixed_precision=True (requires the grid arguments) runs the BiCGSTAB
    iterations in float32 -- the fast arithmetic on TPU, where float64 is
    software-emulated -- inside a float64 iterative-refinement loop:
    residuals against the float64 matrix, normalized corrections solved in
    float32, repeated until the float64 residual meets rtol.  When
    refinement stalls at the f32 floor before reaching rtol (extreme
    conditioning), a final float64 BiCGSTAB polishes the remaining
    residual, so the mode converges whenever the pure float64 solve would.
    refine_rounds overrides the refinement-round cap (mainly for tests).
    """
    warn_if_x64_off("solve_csr_systems")
    if precond not in ("line", "jacobi"):
        raise ValueError(f"precond {precond!r} not supported")
    rhs_np = np.asarray(rhs_batch, np.float64)

    # matrix passed as operands (not closure constants): closure-captured
    # arrays become program literals that remote-device backends re-upload
    # per call, and a fresh closure would also retrace on every invocation
    if row_to_cell is not None and nhoriz is not None:
        row_to_cell = np.asarray(row_to_cell, np.int64)
        nz = int(row_to_cell.max()) // int(nhoriz) + 1 if row_to_cell.size else 1
        n_cells = nz * int(nhoriz)
        offsets, coefs_np = grid_dia_from_csr(
            row_ptr, col_ind, data, row_to_cell, n_cells
        )
        if len(offsets) > _DIA_MAX_OFFSETS:
            raise ValueError(
                f"{len(offsets)} distinct cell offsets: this matrix is not "
                "the structured-stencil kind the grid arguments promise"
            )
        # BiCGSTAB state lives on the full grid: scatter the right-hand
        # sides once host-side, gather the solutions once at the end
        rhs_grid = np.zeros((rhs_np.shape[0], n_cells))
        rhs_grid[:, row_to_cell] = rhs_np
        coefs = jnp.asarray(coefs_np)
        rhs = jnp.asarray(rhs_grid)
        if precond == "jacobi":
            diag = (
                coefs_np[offsets.index(0)]
                if 0 in offsets
                else np.zeros(n_cells)
            )
            d_inv = np.where(diag != 0.0, 1.0 / np.where(diag != 0.0, diag, 1.0), 1.0)
            x, ok, iters = _solve_dia_batch_jacobi(
                coefs, rhs, jnp.asarray(d_inv), offsets, rtol, max_iter
            )
        else:
            dl, d, du = column_tridiag_grid(
                row_ptr, col_ind, data, row_to_cell, nhoriz, nz
            )
            if mixed_precision:
                rounds = (
                    MIXED_REFINE_MAX_ROUNDS
                    if refine_rounds is None
                    else refine_rounds
                )
                x, ok, iters = _solve_dia_batch_line_mixed(
                    coefs, jnp.asarray(coefs_np, jnp.float32), rhs,
                    jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du),
                    jnp.asarray(dl, jnp.float32), jnp.asarray(d, jnp.float32),
                    jnp.asarray(du, jnp.float32),
                    offsets, rtol, max_iter, rounds,
                )
            else:
                x, ok, iters = _solve_dia_batch_line(
                    coefs, rhs, jnp.asarray(dl), jnp.asarray(d),
                    jnp.asarray(du), offsets, rtol, max_iter
                )
        x = np.asarray(x)[:, row_to_cell]
    elif mixed_precision:
        raise ValueError(
            "mixed_precision needs the grid arguments (row_to_cell + nhoriz)"
        )
    else:
        vals_np, cols_np = csr_to_ell(row_ptr, col_ind, data)
        x, ok, iters = _solve_ell_batch(
            jnp.asarray(vals_np), jnp.asarray(cols_np), jnp.asarray(rhs_np),
            rtol, max_iter
        )
    if return_iters:
        return np.asarray(x), np.asarray(ok), np.asarray(iters)
    return np.asarray(x), np.asarray(ok)


@partial(jax.jit, static_argnums=(3, 4))
def _solve_ell_batch(vals, cols, rhs, rtol, max_iter):
    def one(b):
        return bicgstab_ell(vals, cols, b, rtol=rtol, max_iter=max_iter)

    return jax.vmap(one)(rhs)


@partial(jax.jit, static_argnums=(3, 4, 5))
def _solve_dia_batch_jacobi(coefs, rhs, d_inv, offsets, rtol, max_iter):
    def one(b):
        return bicgstab(
            lambda v: dia_matvec(offsets, coefs, v),
            b,
            precond=lambda v: d_inv * v,
            rtol=rtol,
            max_iter=max_iter,
        )

    return jax.vmap(one)(rhs)


@partial(jax.jit, static_argnums=(5, 6, 7))
def _solve_dia_batch_line(coefs, rhs, dl, d, du, offsets, rtol, max_iter):
    def one(b):
        return bicgstab(
            lambda v: dia_matvec(offsets, coefs, v),
            b,
            precond=lambda v: grid_line_precond_apply(dl, d, du, v),
            rtol=rtol,
            max_iter=max_iter,
        )

    return jax.vmap(one)(rhs)


def _mixed_refine_one(matvec64, matvec32, precond32, precond64, b, rtol,
                      max_iter, refine_rounds):
    """float32 BiCGSTAB inside float64 iterative refinement for ONE rhs,
    with a float64 polish when refinement stalls before reaching rtol

    The refinement loop contracts the float64 residual by roughly
    cond(M^-1 A) * eps_f32 per round; on well-conditioned systems that is
    orders of magnitude, on extreme ones it stalls at the f32 floor.  The
    polish solves the REMAINING residual in float64 (zero rhs -- an
    immediate exit -- when refinement already converged), so the mode's
    contract is unconditional: it converges whenever the float64 solve
    would, and the f32 rounds only ever save float64 work.
    """
    bnorm = jnp.sqrt(b @ b)
    tol = rtol * bnorm

    def cond(state):
        _x, _r, rnorm, rounds, _inner, stalled = state
        return (rnorm > tol) & (rounds < refine_rounds) & ~stalled

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
        r_new = b - matvec64(x_new)
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
    x, r, rnorm, _rounds, inner, _stalled = jax.lax.while_loop(
        cond, body, state0
    )
    # float64 polish on the remaining residual (absolute target: the
    # original tol); already-converged lanes pass a zero rhs and exit the
    # while_loop without a single iteration
    need = rnorm > tol
    dx, ok_polish, k_polish = bicgstab(
        matvec64,
        jnp.where(need, r, 0.0),
        precond=precond64,
        rtol=0.0,
        atol=tol,
        max_iter=max_iter,
    )
    x = jnp.where(need, x + dx, x)
    converged = jnp.where(need, ok_polish, rnorm <= tol)
    return x, converged, inner + k_polish


@partial(jax.jit, static_argnums=(9, 10, 11, 12))
def _solve_dia_batch_line_mixed(coefs64, coefs32, rhs, dl, d, du, dl32, d32,
                                du32, offsets, rtol, max_iter,
                                refine_rounds):
    """gather-free mixed-precision solve
    (see solve_csr_systems(mixed_precision=True))"""

    def one(b):
        return _mixed_refine_one(
            lambda v: dia_matvec(offsets, coefs64, v),
            lambda v: dia_matvec(offsets, coefs32, v),
            lambda v: grid_line_precond_apply(dl32, d32, du32, v),
            lambda v: grid_line_precond_apply(dl, d, du, v),
            b, rtol, max_iter, refine_rounds,
        )

    return jax.vmap(one)(rhs)

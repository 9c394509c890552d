"""grid-diagonal (DIA) sparse path: gather-free matvec + solves.

The DIA regrouping exists because the generic gather SpMV is pathologically
slow on TPU (~60 ms per matvec at gx3 scale), which turned long
Jacobi-preconditioned solves into multi-minute single dispatches.  These
tests pin the DIA matvec against the dense matrix, the jacobi/line precond
options, and the mixed-precision float64 polish fallback (forced by
refine_rounds=0, the path taken when iterative refinement stalls at the
float32 floor before reaching rtol).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from newton_krylov_ooc_tpu.ops.sparse import (
    dia_matvec,
    grid_dia_from_csr,
    grid_line_precond_apply,
    column_tridiag_grid,
    solve_csr_systems,
)

from sparse_fixtures import grid_csr


@pytest.fixture(scope="module")
def system():
    return grid_csr(4, 3, 5, n_rhs=2, seed=3)


def test_dia_matvec_matches_dense(system):
    row_ptr, col_ind, data, dense, rhs, row_to_cell, nhoriz = system
    nz = int(row_to_cell.max()) // nhoriz + 1
    n_cells = nz * nhoriz
    offsets, coefs = grid_dia_from_csr(
        row_ptr, col_ind, data, row_to_cell, n_cells
    )
    # the fixture's periodic horizontal coupling must show up as distinct
    # wrap diagonals, not get folded into +-1
    assert max(offsets) >= nhoriz - 1
    x = np.random.default_rng(0).normal(size=dense.shape[0])
    x_grid = np.zeros(n_cells)
    x_grid[row_to_cell] = x
    got = np.asarray(dia_matvec(offsets, jnp.asarray(coefs), jnp.asarray(x_grid)))
    np.testing.assert_allclose(got[row_to_cell], dense @ x, rtol=1e-13)
    # dry cells take no part: nothing flows into them
    dry = np.ones(n_cells, bool)
    dry[row_to_cell] = False
    assert np.abs(got[dry]).max() == 0.0


def test_grid_line_precond_matches_line_system(system):
    row_ptr, col_ind, data, dense, _rhs, row_to_cell, nhoriz = system
    nz = int(row_to_cell.max()) // nhoriz + 1
    dl, d, du = column_tridiag_grid(
        row_ptr, col_ind, data, row_to_cell, nhoriz, nz
    )
    # the tridiagonal line system, applied then solved, round-trips
    rng = np.random.default_rng(1)
    v = np.zeros(nz * nhoriz)
    v[row_to_cell] = rng.normal(size=len(row_to_cell))
    lines = v.reshape(nz, nhoriz).T
    applied = d * lines
    applied[:, 1:] += dl[:, 1:] * lines[:, :-1]
    applied[:, :-1] += du[:, :-1] * lines[:, 1:]
    got = np.asarray(
        grid_line_precond_apply(
            jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du),
            jnp.asarray(applied.T.reshape(-1)),
        )
    )
    np.testing.assert_allclose(got, v, rtol=1e-11, atol=1e-13)


@pytest.mark.parametrize("precond", ["line", "jacobi"])
def test_solve_matches_dense(system, precond):
    row_ptr, col_ind, data, dense, rhs, row_to_cell, nhoriz = system
    x, ok, iters = solve_csr_systems(
        row_ptr, col_ind, data, rhs, row_to_cell=row_to_cell, nhoriz=nhoriz,
        precond=precond, return_iters=True,
    )
    assert ok.all()
    expected = np.linalg.solve(dense, rhs.T).T
    np.testing.assert_allclose(x, expected, rtol=1e-8, atol=1e-11)
    if precond == "line":
        # the stiff coupling is vertical: line preconditioning must win big
        _xj, okj, itj = solve_csr_systems(
            row_ptr, col_ind, data, rhs, row_to_cell=row_to_cell,
            nhoriz=nhoriz, precond="jacobi", return_iters=True,
        )
        assert okj.all() and iters.max() * 4 <= itj.max()


def test_mixed_polish_fallback(system):
    """refine_rounds=0 skips refinement entirely, so convergence comes
    from the float64 polish -- the stalled-refinement rescue path"""
    row_ptr, col_ind, data, dense, rhs, row_to_cell, nhoriz = system
    x, ok, _iters = solve_csr_systems(
        row_ptr, col_ind, data, rhs, row_to_cell=row_to_cell, nhoriz=nhoriz,
        mixed_precision=True, refine_rounds=0, return_iters=True,
    )
    assert ok.all()
    expected = np.linalg.solve(dense, rhs.T).T
    np.testing.assert_allclose(x, expected, rtol=1e-8, atol=1e-11)


def test_unstructured_matrix_rejected():
    """a matrix whose entries scatter over too many cell offsets is not
    stencil-structured: the grid path refuses instead of building an
    enormous DIA form"""
    rng = np.random.default_rng(5)
    n = 200
    row_ptr = [0]
    col_ind = []
    data = []
    for r in range(n):
        cols = rng.choice(n, size=4, replace=False)
        col_ind.extend(sorted(cols.tolist()))
        data.extend(rng.normal(size=4).tolist())
        row_ptr.append(len(col_ind))
    with pytest.raises(ValueError, match="offsets"):
        solve_csr_systems(
            np.asarray(row_ptr), np.asarray(col_ind), np.asarray(data),
            np.zeros((1, n)), row_to_cell=np.arange(n), nhoriz=n,
        )

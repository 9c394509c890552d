"""shared synthetic gen_A-like system builder

Used by tests/test_sharded_sparse.py and by the multi-process worker
(tests/mp_worker.py), which must build the exact same system in a separate
interpreter -- keep this module import-light (numpy only, no jax)."""

import numpy as np


def grid_csr(nz, nlat, nlon, n_rhs, seed=0):
    """synthetic gen_A-like system over a masked (nz, nlat, nlon) grid:
    stiff vertical tridiagonal coupling + random same-level horizontal
    couplings, rows over active cells in C (k-major) order"""
    rng = np.random.default_rng(seed)
    nhoriz = nlat * nlon
    mask = np.ones(nz * nhoriz, bool)
    mask[2 * nhoriz + 3 :: nhoriz] = False  # a seamount column
    row_to_cell = np.nonzero(mask)[0]
    cell_to_row = -np.ones(nz * nhoriz, np.int64)
    cell_to_row[row_to_cell] = np.arange(len(row_to_cell))
    n = len(row_to_cell)
    dense = np.zeros((n, n))
    for r, cell in enumerate(row_to_cell):
        k, h = divmod(int(cell), nhoriz)
        for dk in (-1, 1):  # stiff vertical mixing
            c = cell_to_row[cell + dk * nhoriz] if 0 <= k + dk < nz else -1
            if c >= 0:
                coef = 50.0 * (1.0 + rng.random())
                dense[r, c] += coef
                dense[r, r] -= coef
        for dh in (-1, 1):  # weak horizontal transport at the same level
            h2 = (h + dh) % nhoriz
            c = cell_to_row[k * nhoriz + h2]
            if c >= 0:
                coef = rng.random()
                dense[r, c] += coef
                dense[r, r] -= coef
        dense[r, r] -= 1.0  # the -I of A = dt*J - I
    row_ptr = [0]
    col_ind = []
    data = []
    for r in range(n):
        cols = np.nonzero(dense[r])[0]
        col_ind.extend(cols.tolist())
        data.extend(dense[r, cols].tolist())
        row_ptr.append(len(col_ind))
    rhs = rng.normal(size=(n_rhs, n))
    return (
        np.asarray(row_ptr, np.int64),
        np.asarray(col_ind, np.int64),
        np.asarray(data, np.float64),
        dense,
        rhs,
        row_to_cell,
        nhoriz,
    )

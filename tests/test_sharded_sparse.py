"""parallel.sharded_sparse: mesh-sharded gen_A system solves
(row-sharded BiCGSTAB on the 8-virtual-CPU-device mesh from conftest)"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from newton_krylov_ooc_tpu.ops.sparse import solve_csr_systems
from sparse_fixtures import grid_csr as _grid_csr
from newton_krylov_ooc_tpu.parallel.sharded_sparse import (
    pad_ell_rows,
    solve_csr_systems_sharded,
)


def _random_csr(n, n_rhs, seed=0, band=3):
    """diagonally-dominant banded CSR system + dense twin + random rhs"""
    rng = np.random.default_rng(seed)
    dense = np.zeros((n, n))
    for r in range(n):
        for c in range(max(0, r - band), min(n, r + band + 1)):
            if c != r and rng.random() < 0.7:
                dense[r, c] = rng.normal()
    dense[np.arange(n), np.arange(n)] = (
        np.abs(dense).sum(axis=1) + 1.0 + rng.random(n)
    )
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
    )


def test_pad_ell_rows_identity_padding():
    vals = np.array([[2.0, 1.0], [0.5, 3.0], [4.0, 0.0]])
    cols = np.array([[0, 1], [0, 1], [2, 0]])
    vals_p, cols_p, n_rows = pad_ell_rows(vals, cols, 4)
    assert n_rows == 3
    assert vals_p.shape == (4, 2)
    # padded row: 1 on its own diagonal, nothing else
    assert vals_p[3, 0] == 1.0
    assert cols_p[3, 0] == 3
    assert (vals_p[3, 1:] == 0.0).all()
    # original rows untouched
    np.testing.assert_array_equal(vals_p[:3], vals)
    np.testing.assert_array_equal(cols_p[:3], cols)


def test_pad_ell_rows_already_divisible():
    vals = np.ones((8, 2))
    cols = np.zeros((8, 2), np.int64)
    vals_p, cols_p, n_rows = pad_ell_rows(vals, cols, 4)
    assert n_rows == 8
    assert vals_p.shape == (8, 2)


def test_sharded_solve_matches_dense():
    # 37 rows: not divisible by 8, so the identity-row padding is exercised
    row_ptr, col_ind, data, dense, rhs = _random_csr(37, 3, seed=1)
    x, ok = solve_csr_systems_sharded(row_ptr, col_ind, data, rhs)
    assert ok.all()
    expected = np.linalg.solve(dense, rhs.T).T
    np.testing.assert_allclose(x, expected, rtol=1e-9, atol=1e-9)


def test_sharded_solve_matches_single_device():
    row_ptr, col_ind, data, _dense, rhs = _random_csr(64, 2, seed=2)
    x_sh, ok_sh = solve_csr_systems_sharded(row_ptr, col_ind, data, rhs)
    x_1d, ok_1d = solve_csr_systems(row_ptr, col_ind, data, rhs)
    assert ok_sh.all() and ok_1d.all()
    np.testing.assert_allclose(x_sh, x_1d, rtol=1e-8, atol=1e-10)


def test_sharded_solve_explicit_mesh_shapes():
    row_ptr, col_ind, data, dense, rhs = _random_csr(48, 2, seed=3)
    expected = np.linalg.solve(dense, rhs.T).T
    devices = np.asarray(jax.devices())
    for n_dev in (2, 4):
        mesh = Mesh(devices[:n_dev], ("rows",))
        x, ok = solve_csr_systems_sharded(
            row_ptr, col_ind, data, rhs, mesh=mesh
        )
        assert ok.all()
        np.testing.assert_allclose(x, expected, rtol=1e-9, atol=1e-9)


def test_sharded_line_precond_matches_dense():
    """the line-packed sharded solve (whole vertical lines per shard,
    shard-local PCR preconditioner) matches the dense solve and the
    unsharded line-precond path; 7 active lines over 8 devices exercises
    the identity-line padding"""
    row_ptr, col_ind, data, dense, rhs, row_to_cell, nhoriz = _grid_csr(
        6, 2, 4, 3, seed=7
    )
    expected = np.linalg.solve(dense, rhs.T).T
    x, ok = solve_csr_systems_sharded(
        row_ptr, col_ind, data, rhs, row_to_cell=row_to_cell, nhoriz=nhoriz
    )
    assert ok.all()
    np.testing.assert_allclose(x, expected, rtol=1e-9, atol=1e-9)
    x_1d, ok_1d = solve_csr_systems(
        row_ptr, col_ind, data, rhs, row_to_cell=row_to_cell, nhoriz=nhoriz
    )
    assert ok_1d.all()
    np.testing.assert_allclose(x, x_1d, rtol=1e-8, atol=1e-10)


def test_sharded_line_precond_mesh_shapes():
    row_ptr, col_ind, data, dense, rhs, row_to_cell, nhoriz = _grid_csr(
        5, 3, 4, 2, seed=8
    )
    expected = np.linalg.solve(dense, rhs.T).T
    devices = np.asarray(jax.devices())
    for n_dev in (2, 4, 8):
        mesh = Mesh(devices[:n_dev], ("rows",))
        x, ok = solve_csr_systems_sharded(
            row_ptr, col_ind, data, rhs, mesh=mesh,
            row_to_cell=row_to_cell, nhoriz=nhoriz,
        )
        assert ok.all()
        np.testing.assert_allclose(x, expected, rtol=1e-9, atol=1e-9)


def test_mixed_precision_refinement_matches_dense():
    """float32 inner solves + float64 iterative refinement reach the same
    1e-12-residual answer as the pure float64 path"""
    row_ptr, col_ind, data, dense, rhs, row_to_cell, nhoriz = _grid_csr(
        6, 3, 4, 2, seed=11
    )
    expected = np.linalg.solve(dense, rhs.T).T
    x, ok, iters = solve_csr_systems(
        row_ptr, col_ind, data, rhs, row_to_cell=row_to_cell, nhoriz=nhoriz,
        mixed_precision=True, return_iters=True,
    )
    assert ok.all()
    np.testing.assert_allclose(x, expected, rtol=1e-8, atol=1e-10)
    # an f32-only solve cannot reach 1e-12: reaching it must cost strictly
    # more inner iterations than a loose single-round (rtol 1e-5) solve --
    # i.e. the refinement loop genuinely ran extra rounds
    _x1, ok1, iters1 = solve_csr_systems(
        row_ptr, col_ind, data, rhs, row_to_cell=row_to_cell, nhoriz=nhoriz,
        mixed_precision=True, rtol=1e-5, return_iters=True,
    )
    assert ok1.all()
    assert (iters > iters1).all()
    x64, ok64 = solve_csr_systems(
        row_ptr, col_ind, data, rhs, row_to_cell=row_to_cell, nhoriz=nhoriz
    )
    assert ok64.all()
    np.testing.assert_allclose(x, x64, rtol=1e-8, atol=1e-10)
    with pytest.raises(ValueError, match="mixed_precision"):
        solve_csr_systems(row_ptr, col_ind, data, rhs, mixed_precision=True)


def test_sharded_mixed_precision_matches_dense():
    """the sharded f32-inner/f64-refinement solve reaches the same
    1e-12-residual answer as the sharded f64 path and the dense solve"""
    row_ptr, col_ind, data, dense, rhs, row_to_cell, nhoriz = _grid_csr(
        6, 3, 4, 2, seed=13
    )
    expected = np.linalg.solve(dense, rhs.T).T
    x, ok = solve_csr_systems_sharded(
        row_ptr, col_ind, data, rhs, row_to_cell=row_to_cell, nhoriz=nhoriz,
        mixed_precision=True,
    )
    assert ok.all()
    np.testing.assert_allclose(x, expected, rtol=1e-8, atol=1e-10)
    x64, ok64 = solve_csr_systems_sharded(
        row_ptr, col_ind, data, rhs, row_to_cell=row_to_cell, nhoriz=nhoriz
    )
    assert ok64.all()
    np.testing.assert_allclose(x, x64, rtol=1e-8, atol=1e-10)


def test_sharded_mixed_precision_mesh_shapes():
    row_ptr, col_ind, data, dense, rhs, row_to_cell, nhoriz = _grid_csr(
        5, 3, 4, 2, seed=14
    )
    expected = np.linalg.solve(dense, rhs.T).T
    devices = np.asarray(jax.devices())
    for n_dev in (2, 8):
        mesh = Mesh(devices[:n_dev], ("rows",))
        x, ok = solve_csr_systems_sharded(
            row_ptr, col_ind, data, rhs, mesh=mesh,
            row_to_cell=row_to_cell, nhoriz=nhoriz, mixed_precision=True,
        )
        assert ok.all()
        np.testing.assert_allclose(x, expected, rtol=1e-8, atol=1e-10)


def test_sharded_mixed_precision_needs_line_args():
    row_ptr, col_ind, data, _dense, rhs = _random_csr(16, 1, seed=15)
    with pytest.raises(ValueError, match="mixed_precision"):
        solve_csr_systems_sharded(
            row_ptr, col_ind, data, rhs, mixed_precision=True
        )


def test_sharded_solve_rhs_shape_error():
    row_ptr, col_ind, data, _dense, rhs = _random_csr(16, 2, seed=4)
    with pytest.raises(ValueError, match="rhs_batch"):
        solve_csr_systems_sharded(row_ptr, col_ind, data, rhs[:, :-1])


def test_sharded_solve_rejects_2d_mesh():
    row_ptr, col_ind, data, _dense, rhs = _random_csr(16, 1, seed=5)
    devices = np.asarray(jax.devices())[:4].reshape(2, 2)
    mesh = Mesh(devices, ("a", "b"))
    with pytest.raises(ValueError, match="1-D mesh"):
        solve_csr_systems_sharded(row_ptr, col_ind, data, rhs, mesh=mesh)

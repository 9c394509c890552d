"""on-device banded eigen iterations (ops/eigen.py) and the phosphorus
device preconditioner's parity with the host ARPACK algorithm it replaces"""

import numpy as np
import pytest

import jax.numpy as jnp

from newton_krylov_ooc_tpu.ops.banded import dense_to_bands
from newton_krylov_ooc_tpu.ops.eigen import (
    band_matvec,
    banded_extreme_eigs,
    banded_shift_solve,
    banded_smallest_eigs,
)


def _path_laplacian(n):
    """tridiagonal graph Laplacian of a path: singular, real spectrum
    lambda_k = -4 sin^2(k pi / 2n), null vector = constant"""
    lap = np.zeros((n, n))
    for i in range(n):
        for j in (i - 1, i + 1):
            if 0 <= j < n:
                lap[i, j] = 1.0
                lap[i, i] -= 1.0
    return lap


def test_band_matvec_matches_dense():
    rng = np.random.default_rng(5)
    n, bw = 20, 3
    dense = np.zeros((n, n))
    for off in range(-bw, bw + 1):
        idx = np.arange(max(0, -off), min(n, n - off))
        dense[idx, idx + off] = rng.standard_normal(len(idx))
    x = rng.standard_normal(n)
    bands = jnp.asarray(dense_to_bands(dense, bw))
    assert np.allclose(np.asarray(band_matvec(bands, jnp.asarray(x))), dense @ x)


def test_eigen_iterations_on_singular_laplacian():
    n = 24
    lap = _path_laplacian(n)
    exact = -4.0 * np.sin(np.arange(n) * np.pi / (2 * n)) ** 2
    bands = jnp.asarray(dense_to_bands(lap, 1))

    large = banded_extreme_eigs(bands, k=3, iters=300)
    assert np.allclose(
        np.sort(np.abs(large))[::-1], np.sort(np.abs(exact))[::-1][:3],
        rtol=1e-6,
    )

    sigma = 1.0e-3 * np.abs(np.diag(lap)).max()
    vals, vecs = banded_smallest_eigs(bands, sigma, k=3, iters=200)
    small_exact = np.sort(np.abs(exact))[:3]
    assert np.allclose(np.sort(np.abs(vals.real)), small_exact, atol=1e-8)
    # the null vector (lambda = 0) is the constant vector
    null = vecs[:, np.argmin(np.abs(vals))]
    null /= np.linalg.norm(null)
    assert np.abs(np.abs(null @ np.full(n, n**-0.5)) - 1.0) < 1e-8

    # shifted solve == dense solve
    rng = np.random.default_rng(2)
    rhs = rng.standard_normal(n)
    shift = -0.37
    x = np.asarray(banded_shift_solve(bands, shift, jnp.asarray(rhs)))
    assert np.allclose(x, np.linalg.solve(lap - shift * np.eye(n), rhs))


@pytest.mark.slow
def test_phosphorus_device_precond_matches_dense_oracle():
    """the banded device eigen/solve path reproduces the replaced host
    eigen-regularization algorithm (null vector, shift, extrapolated
    solution), checked against a dense numpy eigendecomposition oracle.

    (ARPACK shift-invert at sigma=0 -- the reference's implementation --
    returns visibly less accurate small eigenvalues on this operator than
    the dense oracle; the locked inverse iteration agrees with the dense
    values, so the device path is pinned to those.)"""
    from tests.test_phosphorus_bands import _setup
    from newton_krylov_ooc_tpu.models.py_driver_2d.phosphorus import phosphorus

    nz, ny = 8, 5
    grid, static_args = _setup(nz, ny)
    n = nz * ny
    year = 365.0 * 86400.0

    dm = np.asarray(grid.depth_mid)
    po4 = np.broadcast_to(
        np.interp(dm, [130.0, 260.0], [5.5e-3, 4.1])[:, None], (nz, ny)
    )
    lin_state = np.zeros(3 * n)
    lin_state[:n] = po4.reshape(-1)

    jac = np.asarray(
        phosphorus.build_jac(grid, static_args, jnp.zeros(0))(
            0.5 * year, jnp.asarray(lin_state)
        )
    )
    eye = np.eye(3 * n)
    mat = eye - (eye - year * jac)  # time_n = 1 implicit-Euler operator

    rng = np.random.default_rng(4)
    rhs = rng.standard_normal(3 * n)

    # dense oracle: the same algorithm with exact dense linear algebra
    w, v = np.linalg.eig(mat)
    order = np.argsort(np.abs(w))
    null_ref = v[:, order[0]].real
    null_ref /= np.linalg.norm(null_ref)
    shift_ref = 0.5 * w[order[1]].real
    sol_ref = 2.0 * np.linalg.solve(
        mat - 0.5 * shift_ref * eye, rhs
    ) - np.linalg.solve(mat - shift_ref * eye, rhs)

    # device path (as apply_precond_jacobian now runs it)
    bw, perm = phosphorus._band_layout(nz, ny)
    bands = jnp.asarray(dense_to_bands(mat[np.ix_(perm, perm)], bw))
    sigma = 1.0e-8 * np.abs(np.diag(mat)).max()
    vals, vecs = banded_smallest_eigs(bands, sigma, k=5)
    null_dev = np.empty(3 * n)
    null_dev[perm] = vecs[:, 0]
    null_dev /= np.linalg.norm(null_dev)
    shift_dev = 0.5 * vals[1].real
    rhs_p = jnp.asarray(rhs[perm])
    sol_dev = np.empty(3 * n)
    sol_dev[perm] = 2.0 * np.asarray(
        banded_shift_solve(bands, 0.5 * shift_dev, rhs_p)
    ) - np.asarray(banded_shift_solve(bands, shift_dev, rhs_p))

    assert abs(shift_dev - shift_ref) < 1e-6 * abs(shift_ref)
    assert np.abs(np.abs(null_dev @ null_ref) - 1.0) < 1e-8
    assert np.abs(sol_dev - sol_ref).max() < 1e-6 * np.abs(sol_ref).max()


@pytest.mark.slow
def test_phosphorus_full_solve_with_device_precond(tmp_workdir):
    """end-to-end py_driver_2d phosphorus Newton solve through the
    file-backed solver: the on-device eigen/null-space preconditioner
    (replacing host ARPACK) converges the nonlinear 3-tracer problem and
    writes the null-space diagnostic file"""
    import os

    from newton_krylov_ooc_tpu.core.newton import NewtonSolver
    from newton_krylov_ooc_tpu.models.py_driver_2d.model_state import (
        ModelState,
    )
    from newton_krylov_ooc_tpu.utils.ncio import mkdir_exist_okay
    from tests.test_forced_module import _setup

    config = _setup(tmp_workdir, {}, "phosphorus")
    config["solverinfo"]["newton_rel_tol"] = "1.0e-3"
    config["solverinfo"]["newton_max_iter"] = "4"
    solverinfo = config["solverinfo"]

    init = ModelState("gen_init_iterate")
    mkdir_exist_okay(os.path.dirname(solverinfo["init_iterate_fname"]))
    init.dump(solverinfo["init_iterate_fname"], caller="tests.eigen")

    solver = NewtonSolver(
        ModelState, solverinfo=solverinfo, resume=False, rewind=False
    )
    while not solver.converged().all():
        solver.step()
    assert solver.get_iteration() <= 4

    # the null-space diagnostic was produced by the device eigen path
    krylov_dirs = [
        d for d in os.listdir(tmp_workdir) if d.startswith("krylov_")
    ]
    assert krylov_dirs
    null_fname = os.path.join(
        tmp_workdir, sorted(krylov_dirs)[0], "precond_null_space.nc"
    )
    assert os.path.exists(null_fname)

    # po4 stays positive at the solution
    po4 = solver._iterate.tracer_modules[0].get_tracer_vals("po4")
    assert po4.min() > 0.0

"""dense year-operator probing: exactness for the linear iage module.

The probe runs basis columns through the batched year kernel
(ops/year_operator.py); for a linear model the affine operator it yields
must reproduce the time-stepped year map to rounding, its JVP must match
the kernel's exact JVP, and the direct cyclo-stationary solve must land on
a root of F.  (Reference analog: IRF-coloring Jacobian probing, SURVEY.md
P6, made full-rank.)
"""

import numpy as np

import jax.numpy as jnp

from newton_krylov_ooc_tpu.core.spatial_axis import (
    spatial_axis_defn_dict,
    spatial_axis_from_defn_dict,
)
from newton_krylov_ooc_tpu.models.py_driver_2d.incore import IageKernel


def test_year_operator_with_source_parameter_study():
    """with_source reuses the probed B: a doubled-source configuration's
    operator must match a kernel built with the doubled source, without
    re-probing"""
    kernel = _kernel(nz=4, ny=3, n_steps=4)
    op = kernel.build_year_operator(col_chunk=12)

    # a second configuration: the aging source doubled; B is unchanged
    import jax

    from newton_krylov_ooc_tpu.models.py_driver_2d import physics
    from newton_krylov_ooc_tpu.ops.imex import imex_year

    grid, year = kernel.grid, kernel.year

    def year2(y):
        def explicit_tend(t, yy):
            def one(v):
                return physics.advection_tend(grid, v) + physics.horiz_mix_tend(
                    grid, v
                )

            return jax.vmap(one)(yy) + 2.0 / year

        return imex_year(
            explicit_tend,
            lambda t: physics.vert_mixing_coeff(grid, t),
            kernel._vert_diag,
            grid.dz_r,
            y,
            (0.0, year),
            kernel.n_steps,
        )

    op2 = op.with_source(jax.jit(year2))
    assert op2.b_mats is op.b_mats  # shared, not re-probed

    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.standard_normal((2, kernel.nz, kernel.ny)), jnp.float32
    )
    fcn_op = np.asarray(op2.fcn(x))
    fcn_ts = np.asarray(year2(x) - x)
    scale = np.abs(fcn_ts).max()
    assert np.abs(fcn_op - fcn_ts).max() / scale < 1e-5


def test_year_operator_respects_float64_kernels():
    """a float64 scan-path kernel must probe a float64 operator (no silent
    demotion to float32)"""
    kernel = _kernel(nz=4, ny=3, n_steps=4, dtype=jnp.float64)
    op = kernel.build_year_operator(col_chunk=12)
    assert op.b_mats.dtype == jnp.float64

    rng = np.random.default_rng(2)
    x = jnp.asarray(
        rng.standard_normal((2, kernel.nz, kernel.ny)), jnp.float64
    )
    fcn_op = np.asarray(op.fcn(x))
    fcn_ts = np.asarray(kernel.comp_fcn(x))
    scale = np.abs(fcn_ts).max()
    assert np.abs(fcn_op - fcn_ts).max() / scale < 1e-12


def _kernel(nz=5, ny=4, n_steps=6, dtype=jnp.float32):
    depth = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            nlevs=nz, edge_end=4000.0, delta_ratio_max=19.0
        )
    )
    ypos = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            axisname="ypos",
            nlevs=ny,
            edge_start=0.0,
            edge_end=50.0e5,
            delta_ratio_max=1.0,
            units="m",
        )
    )
    modelinfo = {"max_abs_vvel": "0.1", "horiz_mix_coeff": "1000.0"}
    return IageKernel(
        depth, ypos, modelinfo, dtype=dtype, n_steps=n_steps,
        use_pallas=False,
    )


def test_year_operator_probe_and_direct_spinup():
    kernel = _kernel()
    op = kernel.build_year_operator(col_chunk=7)  # force ragged last chunk

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((2, kernel.nz, kernel.ny)), jnp.float32
    )
    fcn_op = np.asarray(op.fcn(x))
    fcn_ts = np.asarray(kernel.comp_fcn(x))
    scale = np.abs(fcn_ts).max()
    assert np.abs(fcn_op - fcn_ts).max() / scale < 1e-5

    v = jnp.asarray(
        rng.standard_normal((2, kernel.nz, kernel.ny)), jnp.float32
    )
    jvp_op = np.asarray(op.jvp(v))
    jvp_ts = np.asarray(kernel.jvp(x, None, v))
    scale = np.abs(jvp_ts).max()
    assert np.abs(jvp_op - jvp_ts).max() / scale < 1e-5

    # direct spin-up: a root of the exact time-stepped F, not merely of
    # the operator model
    x_star = op.solve_cyclostationary()
    resid = np.asarray(kernel.comp_fcn(x_star))
    scale = max(np.abs(np.asarray(x_star)).max(), 1.0)
    assert np.abs(resid).max() / scale < 1e-5

    # spectrum: subspace iteration must recover the dominant eigenvalues
    # of B (cross-checked against a dense host eigendecomposition)
    k = 4
    eigvals, timescales = op.spectrum(k=k, iters=300)
    for t in range(2):
        exact = np.linalg.eigvals(np.asarray(op.b_mats[t], np.float64))
        exact = exact[np.argsort(-np.abs(exact))][:k]
        assert np.allclose(
            np.abs(eigvals[t]), np.abs(exact), rtol=1e-3, atol=1e-5
        )
    # all probed modes decay (|lambda| < 1): timescales are positive finite
    assert (np.abs(eigvals) < 1.0).all()
    assert np.isfinite(timescales).all()
    assert (timescales > 0).all()

    # nonlinear kernels must refuse the probe up front
    import pytest

    from newton_krylov_ooc_tpu.models.py_driver_2d.incore import (
        PhosphorusKernel,
    )

    phos = PhosphorusKernel(
        kernel.depth, kernel.ypos,
        {"max_abs_vvel": "0.1", "horiz_mix_coeff": "1000.0"},
        dtype=jnp.float32, n_steps=4, use_pallas=False,
    )
    with pytest.raises(NotImplementedError, match="nonlinear"):
        phos.build_year_operator()

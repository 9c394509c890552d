"""tests for the IMEX fast-path kernel and the in-core Newton-Krylov solver"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore
from newton_krylov_ooc_tpu.core.spatial_axis import (
    spatial_axis_defn_dict,
    spatial_axis_from_defn_dict,
)
from newton_krylov_ooc_tpu.models.py_driver_2d import physics
from newton_krylov_ooc_tpu.models.py_driver_2d.iage import (
    SURF_SLOW_FACTOR,
    iage,
    surf_restore_rate,
)
from newton_krylov_ooc_tpu.models.py_driver_2d.incore import IageKernel
from newton_krylov_ooc_tpu.ops.imex import imex_year
from newton_krylov_ooc_tpu.ops.radau import radau5_integrate

MODELINFO = {"max_abs_vvel": "0.1", "horiz_mix_coeff": "1000.0"}


def _axes(nz, ny):
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
    return depth, ypos


def test_analytic_jacobians_match_jacfwd():
    """analytic module Jacobians equal jacfwd of the tendencies"""
    depth, ypos = _axes(8, 6)
    grid = physics.make_grid(depth, ypos, MODELINFO)
    t = 0.43 * physics.SEC_PER_YEAR
    params = jnp.zeros(0)

    sa = (surf_restore_rate(depth),)
    fun = iage.build_tend(grid, sa, params)
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(size=2 * 48))
    jac_a = np.asarray(iage.build_jac(grid, sa, params)(t, y))
    jac_n = np.asarray(jax.jacfwd(lambda yy: fun(t, yy))(y))
    assert np.abs(jac_a - jac_n).max() < 1e-15


@pytest.mark.slow
def test_imex_converges_to_radau():
    """the IMEX fast path converges O(dt^2) to the Radau reference"""
    depth, ypos = _axes(12, 8)
    grid = physics.make_grid(depth, ypos, MODELINFO)
    year = physics.SEC_PER_YEAR
    rate = surf_restore_rate(depth)
    nz, ny = 12, 8

    rng = np.random.default_rng(1)
    y0 = jnp.asarray(np.maximum(rng.normal(1.0, 0.3, (2, nz, ny)), 0.0))

    sa = (rate,)
    fun = iage.build_tend(grid, sa, jnp.zeros(0))
    jac = iage.build_jac(grid, sa, jnp.zeros(0))
    ys, info = jax.jit(
        lambda y: radau5_integrate(
            fun, (0.0, year), y, jnp.array([0.0, year]), jac=jac,
            rtol=1e-9, atol=1e-9, max_step=0.01 * year,
        )
    )(y0.reshape(-1))
    assert bool(info["success"])
    y_rad = np.asarray(ys[-1]).reshape(2, nz, ny)

    diag = np.zeros((2, nz, ny))
    diag[0, 0, :] = -rate
    diag[1, 0, :] = -SURF_SLOW_FACTOR * rate
    diag = jnp.asarray(diag)

    def explicit_tend(t, y):
        def one(v):
            return physics.advection_tend(grid, v) + physics.horiz_mix_tend(grid, v)

        return jax.vmap(one)(y) + 1.0 / year

    errs = []
    for n_steps in [2190, 4380]:
        y_imex = np.asarray(
            jax.jit(
                lambda y, n=n_steps: imex_year(
                    explicit_tend,
                    lambda t: physics.vert_mixing_coeff(grid, t),
                    diag,
                    grid.dz_r,
                    y,
                    (0.0, year),
                    n,
                )
            )(y0)
        )
        errs.append(np.abs(y_imex - y_rad).max() / np.abs(y_rad).max())
    assert errs[0] < 1e-4
    # second order: halving dt cuts the error ~4x (allow slack)
    assert errs[1] < 0.4 * errs[0]


@pytest.mark.slow
def test_incore_newton_krylov_converges():
    """device-resident Newton-Krylov reaches the cyclo-stationary state"""
    depth, ypos = _axes(16, 12)
    kernel = IageKernel(
        depth, ypos, MODELINFO, dtype=jnp.float64, n_steps=2920
    )
    solver = NewtonKrylovInCore(
        kernel, newton_rel_tol=1e-5, krylov_rel_tol=1e-2, newton_max_iter=6
    )
    x, fcn, info = solver.solve(kernel.init_iterate())
    assert info["iterations"] <= 3  # exact JVPs: at least as fast as the reference
    rel = info["fcn_norm"] / info["x_norm"]
    assert (rel < 1e-5).all()
    # F(x) at the solution really is small in the max norm too
    assert float(jnp.abs(fcn).max()) < 1e-3 * float(jnp.abs(x).max())


@pytest.mark.slow
def test_incore_checkpoint_resume(tmp_path):
    """in-core checkpointing: a restarted solve resumes from the snapshot"""
    depth, ypos = _axes(12, 8)
    kernel = IageKernel(depth, ypos, MODELINFO, dtype=jnp.float64, n_steps=1460)
    ckpt = str(tmp_path / "ckpt")

    # run to convergence, checkpointing each iteration
    solver = NewtonKrylovInCore(kernel, newton_rel_tol=1e-5, newton_max_iter=6)
    x_ref, _, info = solver.solve(kernel.init_iterate(), checkpoint_dir=ckpt)
    assert info["iterations"] >= 1

    # a "preempted" restart loads the snapshot and is already converged
    solver2 = NewtonKrylovInCore(kernel, newton_rel_tol=1e-5, newton_max_iter=6)
    x2, _, info2 = solver2.solve(kernel.init_iterate(), checkpoint_dir=ckpt)
    assert info2["iterations"] == info["iterations"]
    assert np.allclose(np.asarray(x2), np.asarray(x_ref))


def test_incore_phosphorus_spinup():
    """coupled 3-tracer phosphorus spin-up through the IMEX fast path:
    quadratic Newton convergence with the dense implicit-Euler precond"""
    from newton_krylov_ooc_tpu.models.py_driver_2d.incore import PhosphorusKernel

    depth, ypos = _axes(10, 6)
    kernel = PhosphorusKernel(
        depth, ypos, MODELINFO, dtype=jnp.float64, n_steps=730
    )
    solver = NewtonKrylovInCore(kernel, newton_rel_tol=1e-4, newton_max_iter=8)
    x, fcn, info = solver.solve(kernel.init_iterate())

    rel = [
        float((st["fcn_norm"] / np.maximum(st["x_norm"], 1e-300)).max())
        for st in solver.stats
    ]
    assert rel[-1] < 1e-4
    assert len(rel) <= 4  # quadratic-ish convergence, not a crawl
    assert np.isfinite(np.asarray(x)).all()
    assert float(np.asarray(x)[0].min()) > 0.0  # po4 stays positive


def test_incore_column_regions():
    """per-column regions (lateral transport off): the in-core solver's
    per-(module, region) reductions, scaling, and convergence masks"""
    depth, ypos = _axes(10, 4)
    region_mask = np.broadcast_to(
        np.arange(1, 5, dtype=np.int32), (10, 4)
    ).copy()
    kernel = IageKernel(
        depth,
        ypos,
        {"max_abs_vvel": "0.0", "horiz_mix_coeff": "0.0"},
        dtype=jnp.float64,
        n_steps=730,
        region_mask=region_mask,
        grid_weight=np.outer(depth.delta, ypos.delta),
    )
    assert kernel.region_cnt == 4

    x0 = kernel.init_iterate()
    norms = np.asarray(kernel.norm(kernel.comp_fcn(x0)))
    assert norms.shape == (1, 4)

    solver = NewtonKrylovInCore(kernel, newton_rel_tol=1e-4, newton_max_iter=8)
    x, fcn, info = solver.solve(x0)
    final = np.asarray(kernel.norm(fcn)) / np.asarray(kernel.norm(x))
    assert (final < 1e-4).all()

    # columns are decoupled: perturbing one region's scale must not leak --
    # per-region scaling touches exactly that region's cells
    factors = np.ones((1, 4))
    factors[0, 2] = 3.0
    scaled = np.asarray(kernel.scale(x, factors))
    base = np.asarray(x)
    assert np.allclose(scaled[:, :, 2], 3.0 * base[:, :, 2])
    others = [0, 1, 3]
    assert np.allclose(scaled[:, :, others], base[:, :, others])


def test_explicit_dt_bound_uniform_grid():
    """uniform grid: the bound reduces to min(dy^2/(2K), dy/v)"""
    depth, ypos = _axes(8, 10)
    grid = physics.make_grid(depth, ypos, MODELINFO, jnp.float64)
    dy = float(np.diff(np.asarray(ypos.edges)).min())
    expected = min(dy * dy / (2.0 * 1000.0), dy / 0.1)
    bound = physics.explicit_dt_bound(grid)
    assert abs(bound - expected) < 1e-6 * expected


def test_unstable_step_count_warns(caplog):
    """configuring a year kernel past the explicit stability bound warns
    (a silent configuration diverges the whole year to NaN)"""
    import logging

    depth, ypos = _axes(8, 10)
    grid = physics.make_grid(depth, ypos, MODELINFO, jnp.float64)
    bound = physics.explicit_dt_bound(grid)
    bad_steps = max(1, int(physics.SEC_PER_YEAR / bound / 2))  # dt ~ 2x bound
    with caplog.at_level(logging.WARNING):
        IageKernel(
            depth, ypos, MODELINFO, dtype=jnp.float64, n_steps=bad_steps
        )
    assert any("stability bound" in rec.message for rec in caplog.records)

    caplog.clear()
    with caplog.at_level(logging.WARNING):
        IageKernel(depth, ypos, MODELINFO, dtype=jnp.float64, n_steps=8760)
    assert not any("stability bound" in rec.message for rec in caplog.records)

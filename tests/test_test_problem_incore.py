"""in-core batched test_problem kernels: the IMEX column year vs the Radau
reference, and whole-family Newton spin-ups in one batched solve"""

import jax
import jax.numpy as jnp
import numpy as np

from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore
from newton_krylov_ooc_tpu.core.spatial_axis import (
    spatial_axis_defn_dict,
    spatial_axis_from_defn_dict,
)
from newton_krylov_ooc_tpu.models.test_problem import constants, physics  # noqa: F401
from newton_krylov_ooc_tpu.models.test_problem.incore import (
    DyeDecayFamilyKernel,
    IageColumnKernel,
)
from newton_krylov_ooc_tpu.ops.radau import radau5_integrate


def _depth(nlev=20):
    return spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            nlevs=nlev, edge_end=900.0, delta_ratio_max=5.0
        )
    )


def test_dye_decay_imex_year_matches_radau():
    """the batched IMEX column year converges to the Radau reference"""
    depth = _depth(16)
    grid = physics.column_grid(depth)
    year = constants.sec_per_year
    rate = 0.25

    fun = physics.make_dye_decay_tend(grid, rate)
    rng = np.random.default_rng(2)
    y0 = jnp.asarray(np.abs(rng.normal(0.5, 0.2, 16)))
    ys, info = jax.jit(
        lambda y: radau5_integrate(
            fun, (0.0, year), y, jnp.array([0.0, year]), rtol=1e-10,
            atol=1e-10, max_step=0.01 * year,
        )
    )(y0)
    assert bool(info["success"])
    y_ref = np.asarray(ys[-1])

    errs = []
    for n_steps in (2920, 5840):
        kernel = DyeDecayFamilyKernel(depth, [rate], n_steps=n_steps)
        y_imex = np.asarray(kernel._year_fn(y0[None]))[0]
        errs.append(np.abs(y_imex - y_ref).max() / np.abs(y_ref).max())
    assert errs[0] < 2e-4
    assert errs[1] < 0.4 * errs[0]  # second order


def test_iage_column_year_matches_radau():
    """iage with the stiff piston restoring folded into the implicit half"""
    depth = _depth(16)
    grid = physics.column_grid(depth)
    year = constants.sec_per_year

    fun = physics.make_iage_tend(grid)
    column = np.interp(depth.mid, [55.0, 200.0], [0.0, 2.0])
    y0 = jnp.asarray(column)
    ys, info = jax.jit(
        lambda y: radau5_integrate(
            fun, (0.0, year), y, jnp.array([0.0, year]), rtol=1e-10,
            atol=1e-10, max_step=0.01 * year,
        )
    )(y0)
    assert bool(info["success"])
    y_ref = np.asarray(ys[-1])

    kernel = IageColumnKernel(depth, n_steps=8760)
    y_imex = np.asarray(kernel._year_fn(y0[None]))[0]
    assert np.abs(y_imex - y_ref).max() / np.abs(y_ref).max() < 2e-4


def test_dye_decay_family_batched_spinup():
    """a 10-module dye_decay family (the ci_long_dye_decay configuration's
    suffixes 001..010) spins up in ONE batched Newton solve; more decay
    means less equilibrium dye, and the fixed point satisfies F(X) ~ 0"""
    depth = _depth(20)
    rates = np.arange(1, 11) * 0.001  # dye_decay_001 .. dye_decay_010
    kernel = DyeDecayFamilyKernel(depth, rates, n_steps=2920)
    solver = NewtonKrylovInCore(
        kernel,
        newton_rel_tol=1e-6,
        krylov_rel_tol=1e-3,
        newton_max_iter=6,
        krylov_max_dim=25,
        jit_gmres=True,
    )
    x, fcn, info = solver.solve(kernel.init_iterate())
    assert info["iterations"] <= 3
    rel = np.asarray(info["fcn_norm"]) / np.maximum(
        np.asarray(info["x_norm"]), 1e-300
    )
    assert (rel < 1e-6).all()

    # column inventory decreases monotonically with the decay rate
    inv = (np.asarray(x) * np.asarray(depth.delta)).sum(axis=1)
    assert (np.diff(inv) < 0).all()
    assert (np.asarray(x) > -1e-10).all()


def test_iage_column_spinup_against_file_backed_equilibrium():
    """the in-core iage column solve lands on the known equilibrium
    structure: age ~ 0 in the mixed surface, increasing downward"""
    depth = _depth(20)
    kernel = IageColumnKernel(depth, n_steps=2920)
    solver = NewtonKrylovInCore(
        kernel,
        newton_rel_tol=1e-6,
        krylov_rel_tol=1e-3,
        newton_max_iter=6,
        jit_gmres=True,
    )
    x, fcn, info = solver.solve(kernel.init_iterate())
    assert info["iterations"] <= 3
    age_years = np.asarray(x)[0]
    assert abs(age_years[0]) < 0.05          # surface restored toward 0
    assert age_years[-1] > age_years[0]      # deep water is older
    assert (np.diff(age_years) > -1e-6).all()  # monotone with depth


def test_dye_decay_family_shards_over_module_axis():
    """P1 over devices: the batched family solve runs with the module axis
    sharded across the 8-device mesh (plain jit propagates the sharding --
    columns are independent, no collectives needed) and matches the
    unsharded solve exactly"""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from newton_krylov_ooc_tpu.parallel.mesh import make_mesh

    depth = _depth(16)
    rates = np.arange(1, 9) * 0.002
    kernel = DyeDecayFamilyKernel(depth, rates, n_steps=730)

    x0 = kernel.init_iterate()
    ref = np.asarray(kernel.comp_fcn(x0))

    mesh = make_mesh(n_module=8, n_space=1)
    sharding = NamedSharding(mesh, P("module", None))
    x0_sh = jax.device_put(x0, sharding)
    out = kernel.comp_fcn(x0_sh)
    assert np.array_equal(np.asarray(out), ref)

    solver = NewtonKrylovInCore(
        kernel, newton_rel_tol=1e-6, krylov_rel_tol=1e-3,
        newton_max_iter=6, krylov_max_dim=25, jit_gmres=True,
    )
    x, fcn, info = solver.solve(x0_sh)
    rel = np.asarray(info["fcn_norm"]) / np.maximum(
        np.asarray(info["x_norm"]), 1e-300
    )
    assert (rel < 1e-6).all()

"""jitted lax.while_loop GMRES vs the host-driven Krylov loop.

The two paths solve the identical per-(module, region) Hessenberg least
squares (numpy lstsq vs on-device Givens QR), so their increments must agree
to roundoff and full Newton solves must produce the same iterates.
"""

import jax.numpy as jnp
import numpy as np

from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore
from newton_krylov_ooc_tpu.core.spatial_axis import (
    spatial_axis_defn_dict,
    spatial_axis_from_defn_dict,
)
from newton_krylov_ooc_tpu.models.py_driver_2d.incore import IageKernel

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


def _kernel(nz=10, ny=6, n_steps=365, **kwargs):
    depth, ypos = _axes(nz, ny)
    return IageKernel(
        depth, ypos, MODELINFO, dtype=jnp.float64, n_steps=n_steps, **kwargs
    )


def test_jitted_gmres_matches_host_loop():
    """one GMRES solve: jitted Givens path == host lstsq path to roundoff"""
    kernel = _kernel()
    solver_host = NewtonKrylovInCore(kernel, krylov_rel_tol=1e-3)
    solver_jit = NewtonKrylovInCore(kernel, krylov_rel_tol=1e-3, jit_gmres=True)

    x = kernel.init_iterate()
    fcn = kernel.comp_fcn(x)
    inc_host, its_host = solver_host._gmres(x, fcn)
    inc_jit, its_jit = solver_jit._gmres(x, fcn)

    assert its_jit == its_host
    a, b = np.asarray(inc_host), np.asarray(inc_jit)
    assert np.abs(a - b).max() < 1e-9 * max(np.abs(a).max(), 1e-300)


def test_jitted_gmres_multi_region():
    """per-(module, region) batching: column regions, decoupled solves"""
    region_mask = np.broadcast_to(np.arange(1, 5, dtype=np.int32), (10, 4)).copy()
    depth, ypos = _axes(10, 4)
    kernel = IageKernel(
        depth,
        ypos,
        {"max_abs_vvel": "0.0", "horiz_mix_coeff": "0.0"},
        dtype=jnp.float64,
        n_steps=365,
        region_mask=region_mask,
        grid_weight=np.outer(depth.delta, ypos.delta),
    )
    assert kernel.region_cnt == 4

    solver_host = NewtonKrylovInCore(kernel, krylov_rel_tol=1e-3)
    solver_jit = NewtonKrylovInCore(kernel, krylov_rel_tol=1e-3, jit_gmres=True)
    x = kernel.init_iterate()
    fcn = kernel.comp_fcn(x)
    inc_host, _ = solver_host._gmres(x, fcn)
    inc_jit, _ = solver_jit._gmres(x, fcn)
    a, b = np.asarray(inc_host), np.asarray(inc_jit)
    assert np.abs(a - b).max() < 1e-9 * max(np.abs(a).max(), 1e-300)


def test_full_solve_with_jitted_gmres():
    """end-to-end Newton with the jitted inner loop reaches the same state"""
    kernel = _kernel(n_steps=730)
    x_ref, _, info_ref = NewtonKrylovInCore(
        kernel, newton_rel_tol=1e-5, newton_max_iter=6
    ).solve(kernel.init_iterate())
    x_jit, _, info_jit = NewtonKrylovInCore(
        kernel, newton_rel_tol=1e-5, newton_max_iter=6, jit_gmres=True
    ).solve(kernel.init_iterate())

    assert info_jit["iterations"] == info_ref["iterations"]
    a, b = np.asarray(x_ref), np.asarray(x_jit)
    assert np.abs(a - b).max() < 1e-8 * np.abs(a).max()

"""fused one-dispatch Newton-Krylov (ops/newton_jit.py) vs the host path.

The fused solve runs the identical mathematics (same GMRES Givens QR, same
Armijo halving, same limiter) inside one lax.while_loop program, so its
iterates must match the host-driven solver to roundoff, its iteration
counts exactly, and its failure modes must surface as the same errors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore
from newton_krylov_ooc_tpu.core.spatial_axis import (
    spatial_axis_defn_dict,
    spatial_axis_from_defn_dict,
)
from newton_krylov_ooc_tpu.models.py_driver_2d.incore import IageKernel
from newton_krylov_ooc_tpu.models.test_problem.incore import (
    DyeDecayFamilyKernel,
)
from newton_krylov_ooc_tpu.parallel.mesh import make_mesh

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


def _column_depth(nlev=12):
    return spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            nlevs=nlev, edge_end=4000.0, delta_ratio_max=19.0
        )
    )


def _solve_pair(kernel, **kwargs):
    host = NewtonKrylovInCore(kernel, jit_gmres=True, **kwargs)
    fused = NewtonKrylovInCore(kernel, jit_newton=True, **kwargs)
    x_h, fcn_h, info_h = host.solve(kernel.init_iterate())
    x_f, fcn_f, info_f = fused.solve(kernel.init_iterate())
    return (x_h, fcn_h, info_h), (x_f, fcn_f, info_f)


def _assert_match(res_h, res_f, rel=1e-10):
    (x_h, fcn_h, info_h), (x_f, fcn_f, info_f) = res_h, res_f
    assert info_f["iterations"] == info_h["iterations"]
    a, b = np.asarray(x_h), np.asarray(x_f)
    assert np.abs(a - b).max() <= rel * max(np.abs(a).max(), 1e-300)
    assert len(info_f["stats"]) == len(info_h["stats"])
    for s_h, s_f in zip(info_h["stats"], info_f["stats"]):
        assert s_f["iteration"] == s_h["iteration"]
        assert np.allclose(s_f["fcn_norm"], s_h["fcn_norm"], rtol=1e-6)
        assert np.allclose(s_f["x_norm"], s_h["x_norm"], rtol=1e-6)


def test_fused_matches_host_dye_decay_family():
    """linear batched column family: iterates, iteration count, and the
    stats trajectory match the host-driven solver"""
    depth = _column_depth()
    year = 365.0 * 86400.0
    rates = np.array([1.0, 2.0, 4.0]) / year
    kernel = DyeDecayFamilyKernel(depth, rates, n_steps=365)
    res_h, res_f = _solve_pair(
        kernel, newton_rel_tol=1e-6, krylov_rel_tol=1e-3,
        newton_max_iter=6, krylov_max_dim=15,
    )
    _assert_match(res_h, res_f)
    assert res_f[2]["iterations"] >= 1


def test_fused_matches_host_multi_region():
    """per-(module, region) convergence masks inside the fused loop:
    column regions decouple and every block converges independently"""
    nz, ny = 10, 4
    region_mask = np.broadcast_to(
        np.arange(1, ny + 1, dtype=np.int32), (nz, ny)
    ).copy()
    depth, ypos = _axes(nz, ny)
    kernel = IageKernel(
        depth,
        ypos,
        {"max_abs_vvel": "0.0", "horiz_mix_coeff": "0.0"},
        dtype=jnp.float64,
        n_steps=365,
        region_mask=region_mask,
        grid_weight=np.outer(depth.delta, ypos.delta),
    )
    assert kernel.region_cnt == ny
    res_h, res_f = _solve_pair(
        kernel, newton_rel_tol=1e-5, krylov_rel_tol=1e-3,
        newton_max_iter=8, krylov_max_dim=20,
    )
    _assert_match(res_h, res_f)


@pytest.mark.slow
def test_fused_matches_host_nonlinear_phosphorus():
    """the nonlinear sharded phosphorus solve (Armijo active, lob-0
    limiter) through the fused path: the traced limiter twin and the
    device Armijo produce the host path's iterates on the mesh"""
    from newton_krylov_ooc_tpu.parallel.sharded_year import (
        ShardedPhosphorusKernel,
    )

    nz, ny, n_steps = 8, 8, 96
    depth, ypos = _axes(nz, ny)
    mesh = make_mesh(n_module=1, n_space=2, devices=jax.devices()[:2])
    kernel = ShardedPhosphorusKernel(
        mesh, depth, ypos, MODELINFO, n_steps=n_steps
    )
    res_h, res_f = _solve_pair(
        kernel, newton_rel_tol=1e-4, krylov_rel_tol=1e-2,
        newton_max_iter=8, krylov_max_dim=25,
    )
    _assert_match(res_h, res_f, rel=1e-7)
    xv = np.asarray(res_f[0])
    assert xv[0, 0].min() > 0.0


def test_limiter_scalef_jit_matches_host():
    """the traced lob-0 limiter twin reproduces the host comp_scalef_lob
    per-(module, region) factors on states that violate the bound"""
    from newton_krylov_ooc_tpu.parallel.sharded_year import (
        ShardedPhosphorusKernel,
    )

    nz, ny = 8, 8
    depth, ypos = _axes(nz, ny)
    mesh = make_mesh(n_module=1, n_space=1, devices=jax.devices()[:1])
    kernel = ShardedPhosphorusKernel(mesh, depth, ypos, MODELINFO, n_steps=8)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.1, 1.0, (1, 3, nz, ny)))
    inc = jnp.asarray(rng.uniform(-0.5, 0.2, (1, 3, nz, ny)))
    host = np.asarray(kernel.apply_limiter(x, inc))
    jitted = np.asarray(jax.jit(kernel.limiter_scalef_jit)(x, inc))
    assert host.min() < 1.0  # the draw actually violates the bound
    assert np.allclose(jitted, host, rtol=1e-12, atol=0.0)

    # no violation -> exactly ones on both paths
    inc_pos = jnp.abs(inc)
    host1 = np.asarray(kernel.apply_limiter(x, inc_pos))
    jit1 = np.asarray(jax.jit(kernel.limiter_scalef_jit)(x, inc_pos))
    assert (host1 == 1.0).all() and (jit1 == 1.0).all()


def test_fused_max_iter_error_parity():
    """the fused path re-raises the host path's Newton overrun error"""
    depth = _column_depth()
    year = 365.0 * 86400.0
    kernel = DyeDecayFamilyKernel(depth, np.array([1.0]) / year, n_steps=96)
    for jit_newton in (False, True):
        solver = NewtonKrylovInCore(
            kernel, newton_rel_tol=1e-14, newton_max_iter=0,
            jit_gmres=not jit_newton, jit_newton=jit_newton,
        )
        with pytest.raises(RuntimeError, match="maximum Newton iterations"):
            solver.solve(kernel.init_iterate())


def test_fused_rejects_checkpoint_dir(tmp_path):
    depth = _column_depth()
    kernel = DyeDecayFamilyKernel(depth, np.array([1.0e-8]), n_steps=8)
    solver = NewtonKrylovInCore(kernel, jit_newton=True)
    with pytest.raises(ValueError, match="host-driven"):
        solver.solve(kernel.init_iterate(), checkpoint_dir=str(tmp_path))

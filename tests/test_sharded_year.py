"""sharded (shard_map) IMEX year + sharded Newton solve vs single-device.

The decomposed year performs the same arithmetic as the unsharded scan
(halo columns replace in-array neighbors; boundary faces are zeroed), so the
results must agree to float64 roundoff, and full solver runs on different
mesh shapes must produce the same iterates.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore
from newton_krylov_ooc_tpu.core.spatial_axis import (
    spatial_axis_defn_dict,
    spatial_axis_from_defn_dict,
)
from newton_krylov_ooc_tpu.models.py_driver_2d import physics
from newton_krylov_ooc_tpu.models.py_driver_2d.iage import (
    SURF_SLOW_FACTOR,
    surf_restore_rate,
)
from newton_krylov_ooc_tpu.ops.imex import imex_year
from newton_krylov_ooc_tpu.parallel.mesh import make_mesh
from newton_krylov_ooc_tpu.parallel.sharded_year import (
    ShardedIageKernel,
    ShardedYearData,
    build_sharded_year,
)

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


def _global_year(depth, ypos, diag, aging, t_span, n_steps):
    """unsharded reference: the same model year through plain imex_year"""
    grid = physics.make_grid(depth, ypos, MODELINFO, jnp.float64)

    def explicit_tend(t, y):
        def one(v):
            return physics.advection_tend(grid, v) + physics.horiz_mix_tend(
                grid, v
            )

        flat = y.reshape((-1,) + y.shape[-2:])
        out = jax.vmap(one)(flat).reshape(y.shape)
        return out + jnp.asarray(aging)

    return jax.jit(
        lambda y: imex_year(
            explicit_tend,
            lambda t: physics.vert_mixing_coeff(grid, t),
            jnp.asarray(diag),
            grid.dz_r,
            y,
            t_span,
            n_steps,
        )
    )


def test_sharded_year_matches_unsharded():
    """8-device (2 module x 4 space) year == single-device year, f64"""
    nz, ny, batch, n_steps = 10, 8, 4, 48
    depth, ypos = _axes(nz, ny)
    year = physics.SEC_PER_YEAR

    rate = surf_restore_rate(depth)
    diag = np.zeros((batch, 2, nz, ny))
    diag[:, 0, 0, :] = -rate
    diag[:, 1, 0, :] = -SURF_SLOW_FACTOR * rate
    aging = np.broadcast_to(
        ((1.0 + 0.2 * np.arange(batch)) / year)[:, None, None, None],
        (batch, 2, 1, 1),
    )

    mesh = make_mesh(n_module=2, n_space=4)
    data = ShardedYearData(depth, ypos, MODELINFO, n_space=4)
    sharded = build_sharded_year(
        mesh, data, diag, aging, (0.0, year), n_steps
    )

    rng = np.random.default_rng(7)
    y0 = np.maximum(rng.normal(1.0, 0.5, (batch, 2, nz, ny)), 0.0)

    from jax.sharding import NamedSharding, PartitionSpec as P

    y0_dev = jax.device_put(
        jnp.asarray(y0),
        NamedSharding(mesh, P("module", None, None, "space")),
    )
    out_sharded = np.asarray(sharded(y0_dev))
    out_ref = np.asarray(
        _global_year(depth, ypos, diag, aging, (0.0, year), n_steps)(
            jnp.asarray(y0)
        )
    )
    denom = np.abs(out_ref).max()
    assert np.abs(out_sharded - out_ref).max() < 1e-12 * denom


def test_sharded_solve_matches_single_device():
    """full Newton-Krylov (jitted GMRES) on a 2x4 mesh == 1-device mesh"""
    nz, ny, n_steps = 8, 8, 36
    depth, ypos = _axes(nz, ny)
    year = physics.SEC_PER_YEAR
    rates = (1.0 + 0.25 * np.arange(4)) / year

    mesh8 = make_mesh(n_module=2, n_space=4)
    mesh1 = make_mesh(n_module=1, n_space=1, devices=jax.devices()[:1])

    results = []
    for mesh in (mesh8, mesh1):
        kernel = ShardedIageKernel(
            mesh, depth, ypos, MODELINFO, rates, n_steps=n_steps
        )
        solver = NewtonKrylovInCore(
            kernel,
            newton_rel_tol=1e-5,
            krylov_rel_tol=1e-2,
            newton_max_iter=8,
            krylov_max_dim=20,
            jit_gmres=True,
        )
        x, fcn, info = solver.solve(kernel.init_iterate())
        rel = np.asarray(info["fcn_norm"]) / np.asarray(info["x_norm"])
        assert (rel < 1e-5).all()
        results.append((np.asarray(x), info["iterations"]))

    (x8, it8), (x1, it1) = results
    assert it8 == it1
    assert np.abs(x8 - x1).max() < 1e-9 * np.abs(x1).max()


def test_sharded_kernel_gmres_matches_host_loop():
    """the sharded kernel through jitted GMRES == host-loop GMRES"""
    nz, ny, n_steps = 8, 8, 36
    depth, ypos = _axes(nz, ny)
    year = physics.SEC_PER_YEAR
    rates = (1.0 + 0.25 * np.arange(4)) / year
    mesh = make_mesh(n_module=2, n_space=4)
    kernel = ShardedIageKernel(
        mesh, depth, ypos, MODELINFO, rates, n_steps=n_steps
    )

    x = kernel.init_iterate()
    fcn = kernel.comp_fcn(x)
    host = NewtonKrylovInCore(kernel, krylov_rel_tol=1e-2, krylov_max_dim=20)
    jit = NewtonKrylovInCore(
        kernel, krylov_rel_tol=1e-2, krylov_max_dim=20, jit_gmres=True
    )
    inc_host, its_host = host._gmres(x, fcn)
    inc_jit, its_jit = jit._gmres(x, fcn)
    assert its_host == its_jit
    a, b = np.asarray(inc_host), np.asarray(inc_jit)
    assert np.abs(a - b).max() < 1e-9 * max(np.abs(a).max(), 1e-300)


def test_sharded_pallas_year_blocked():
    """the VMEM-resident blocked pallas year (interpret mode on the CPU
    mesh): 8-shard vs 1-shard agreement at float32 roundoff, and agreement
    with the single-device megakernel within the expected quantization"""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from newton_krylov_ooc_tpu.models.py_driver_2d.iage import (
        surf_restore_rate as srr,
    )
    from newton_krylov_ooc_tpu.ops.imex_pallas import (
        build_iage_year_pallas_v2,
    )
    from newton_krylov_ooc_tpu.parallel.sharded_year import (
        build_sharded_year_pallas,
    )

    nz, ny, batch, n_steps, k = 10, 16, 4, 25, 2
    depth, ypos = _axes(nz, ny)
    grid = physics.make_grid(depth, ypos, MODELINFO, jnp.float32)
    year = physics.SEC_PER_YEAR
    rate = srr(depth)
    diag = np.zeros((batch, 2, nz, ny), np.float32)
    diag[:, 0, 0, :] = -rate
    diag[:, 1, 0, :] = -SURF_SLOW_FACTOR * rate
    aging = np.broadcast_to(
        ((1.0 + 0.2 * np.arange(batch)) / year)[:, None], (batch, 2)
    ).astype(np.float32)
    column = np.interp(depth.mid, [55.0, 200.0], [0.0, 2.0]).astype(np.float32)
    rng = np.random.default_rng(3)
    y0 = (
        np.broadcast_to(column[None, None, :, None], (batch, 2, nz, ny))
        + rng.uniform(0, 0.3, (batch, 2, nz, ny))
    ).astype(np.float32)

    mesh8 = make_mesh(n_module=2, n_space=4)
    fn8 = build_sharded_year_pallas(
        mesh8, depth, ypos, MODELINFO, diag, aging, (0.0, year), n_steps,
        block_steps=k, interpret=True,
    )
    y8 = jax.device_put(
        jnp.asarray(y0),
        NamedSharding(mesh8, P("module", None, None, "space")),
    )
    out8 = np.asarray(fn8(y8))

    mesh1 = make_mesh(n_module=1, n_space=1, devices=jax.devices()[:1])
    fn1 = build_sharded_year_pallas(
        mesh1, depth, ypos, MODELINFO, diag, aging, (0.0, year), n_steps,
        block_steps=k, interpret=True,
    )
    out1 = np.asarray(fn1(jnp.asarray(y0)))

    scale = np.abs(out1).max()
    # float32-roundoff agreement across mesh shapes (ulp differences in the
    # mixing profile are amplified ~1e3 by its exponential; see docstring)
    assert np.abs(out8 - out1).max() < 5e-5 * scale

    # agreement with the single-device megakernel (same arithmetic, edge
    # half-steps computed in plain jax)
    mega_out = np.empty_like(y0)
    for b in range(batch):
        mega = build_iage_year_pallas_v2(
            grid, diag[b], np.full((2, 1, 1), aging[b, 0], np.float32),
            (0.0, year), n_steps,
        )
        mega_out[b] = np.asarray(mega(jnp.asarray(y0[b]), interpret=True))
    assert np.abs(out1 - mega_out).max() < 1e-4 * scale


def test_sharded_pallas_rejects_oversized_halo():
    from newton_krylov_ooc_tpu.parallel.sharded_year import (
        build_sharded_year_pallas,
    )

    depth, ypos = _axes(8, 16)
    mesh = make_mesh(n_module=2, n_space=4)
    diag = np.zeros((4, 2, 8, 16), np.float32)
    aging = np.zeros((4, 2), np.float32)
    with pytest.raises(ValueError, match="halo depth"):
        build_sharded_year_pallas(
            mesh, depth, ypos, MODELINFO, diag, aging,
            (0.0, physics.SEC_PER_YEAR), 25, block_steps=8, interpret=True,
        )


@pytest.mark.slow
def test_sharded_solve_with_pallas_kernels():
    """the full sharded Newton solve through the blocked-pallas year
    (interpret mode on the CPU mesh) reaches the same state as the XLA-scan
    sharded kernel at float32 tolerance"""
    nz, ny, n_steps = 8, 8, 36
    depth, ypos = _axes(nz, ny)
    year = physics.SEC_PER_YEAR
    rates = (1.0 + 0.25 * np.arange(4)) / year
    mesh = make_mesh(n_module=2, n_space=2, devices=jax.devices()[:4])

    kern_pl = ShardedIageKernel(
        mesh, depth, ypos, MODELINFO, rates, n_steps=n_steps,
        use_pallas=True, block_steps=2, pallas_interpret=True,
    )
    solver = NewtonKrylovInCore(
        kern_pl,
        newton_rel_tol=1e-4,
        krylov_rel_tol=1e-2,
        newton_max_iter=8,
        krylov_max_dim=20,
        jit_gmres=True,
    )
    x_pl, fcn_pl, info_pl = solver.solve(kern_pl.init_iterate())
    rel = np.asarray(info_pl["fcn_norm"]) / np.asarray(info_pl["x_norm"])
    assert (rel < 1e-4).all()

    kern_xla = ShardedIageKernel(
        mesh, depth, ypos, MODELINFO, rates, dtype=jnp.float64,
        n_steps=n_steps,
    )
    x_ref, _, _ = NewtonKrylovInCore(
        kern_xla,
        newton_rel_tol=1e-4,
        krylov_rel_tol=1e-2,
        newton_max_iter=8,
        krylov_max_dim=20,
        jit_gmres=True,
    ).solve(kern_xla.init_iterate())

    a, b = np.asarray(x_pl, np.float64), np.asarray(x_ref)
    assert np.abs(a - b).max() < 1e-3 * np.abs(b).max()


def test_sharded_nonlinear_phosphorus_year_and_jvp():
    """the column-local extra-tendency hook: the sharded NONLINEAR
    phosphorus year (Michaelis-Menten uptake, remineralization, sinking)
    matches the unsharded scan at f64 roundoff, and exact jax.jvp through
    the sharded year (collectives included) matches the unsharded JVP"""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from newton_krylov_ooc_tpu.models.py_driver_2d.phosphorus import (
        DEFAULT_PARAMS,
        light_lim_2d,
    )

    nz, ny, n_steps, n_space = 8, 8, 24, 4
    depth, ypos = _axes(nz, ny)
    year = physics.SEC_PER_YEAR
    p = DEFAULT_PARAMS
    light = light_lim_2d(depth, ypos)  # (nz, ny)
    grid = physics.make_grid(depth, ypos, MODELINFO, jnp.float64)
    dz_r = np.asarray(grid.dz_r)

    def phos_terms(y, light_arr, dz_r_arr):
        """biogeochemistry + sinking for y (..., 3, nz, ncol)"""
        po4, dop, pop = y[..., 0, :, :], y[..., 1, :, :], y[..., 2, :, :]
        uptake = (
            p["max_uptake_rate"] * light_arr * po4 / (po4 + p["po4_halfsat"])
        )
        dop_remin = p["dop_remin_rate"] * dop
        pop_remin = p["pop_remin_rate"] * pop
        d_po4 = -uptake + dop_remin + pop_remin
        d_dop = p["sigma"] * uptake - dop_remin
        d_pop = (1.0 - p["sigma"]) * uptake - pop_remin
        sink_int = p["pop_sink_vel"] * pop[..., :-1, :]
        zero = jnp.zeros(pop.shape[:-2] + (1,) + pop.shape[-1:], y.dtype)
        sink = jnp.concatenate([zero, sink_int, zero], axis=-2)
        d_pop = d_pop + dz_r_arr[:, None] * (
            sink[..., :-1, :] - sink[..., 1:, :]
        )
        return jnp.stack([d_po4, d_dop, d_pop], axis=-3)

    mesh = make_mesh(n_module=1, n_space=n_space,
                     devices=jax.devices()[:n_space])
    data = ShardedYearData(depth, ypos, MODELINFO, n_space=n_space)
    diag = np.zeros((1, 3, nz, ny))
    aging = np.zeros((1, 3, 1, 1))
    nyl = ny // n_space
    light_stack = np.stack(
        [light[:, s * nyl : (s + 1) * nyl] for s in range(n_space)]
    )
    dz_r_j = jnp.asarray(dz_r)

    def local_tend(t, y, dl):
        return phos_terms(y, dl["light"], dz_r_j)

    sharded = build_sharded_year(
        mesh, data, diag, aging, (0.0, year), n_steps,
        local_tend=local_tend, local_data={"light": light_stack},
    )

    # unsharded reference through plain imex_year
    light_j = jnp.asarray(light)

    def explicit_tend(t, y):
        def transport(v):
            return physics.advection_tend(grid, v) + physics.horiz_mix_tend(
                grid, v
            )

        flat = y.reshape((-1, nz, ny))
        d = jax.vmap(transport)(flat).reshape(y.shape)
        return d + phos_terms(y, light_j, jnp.asarray(grid.dz_r))

    ref_year = jax.jit(
        lambda y: imex_year(
            explicit_tend,
            lambda t: physics.vert_mixing_coeff(grid, t),
            jnp.asarray(diag),
            grid.dz_r,
            y,
            (0.0, year),
            n_steps,
        )
    )

    dm = np.asarray(grid.depth_mid)
    profiles = (
        ([130.0, 260.0], [5.5e-3, 4.1]),
        ([95.0, 140.0], [7.1e-2, 1.5e-4]),
        ([170.0, 250.0], [1.8e-2, 7.9e-4]),
    )
    cols = [np.interp(dm, d, v) for d, v in profiles]
    y0 = np.stack(
        [np.broadcast_to(c[:, None], (nz, ny)) for c in cols]
    )[None]

    y0_dev = jax.device_put(
        jnp.asarray(y0),
        NamedSharding(mesh, P("module", None, None, "space")),
    )
    out_sh = np.asarray(sharded(y0_dev))
    out_ref = np.asarray(ref_year(jnp.asarray(y0)))
    scale = np.abs(out_ref).max()
    assert np.abs(out_sh - out_ref).max() < 1e-12 * scale

    # exact forward-mode JVP through the sharded nonlinear year
    rng = np.random.default_rng(5)
    v = rng.normal(0, 1e-3, y0.shape)
    v_dev = jax.device_put(
        jnp.asarray(v), NamedSharding(mesh, P("module", None, None, "space"))
    )
    _, jv_sh = jax.jvp(sharded, (y0_dev,), (v_dev,))
    _, jv_ref = jax.jvp(ref_year, (jnp.asarray(y0),), (jnp.asarray(v),))
    jv_sh, jv_ref = np.asarray(jv_sh), np.asarray(jv_ref)
    assert np.abs(jv_sh - jv_ref).max() < 1e-12 * np.abs(jv_ref).max()


def test_sharded_kernel_column_regions():
    """decoupled-region reductions (P2) on the sharded kernel: per-column
    regions spanning shard boundaries; per-(module, region) convergence and
    region-scoped scaling, equal across mesh shapes"""
    nz, ny, n_steps = 8, 8, 36
    depth, ypos = _axes(nz, ny)
    year = physics.SEC_PER_YEAR
    rates = (1.0 + 0.25 * np.arange(4)) / year
    # 4 regions of 2 columns each; with n_space=2 each shard holds 2 regions
    region_mask = np.broadcast_to(
        np.repeat(np.arange(1, 5, dtype=np.int32), 2), (nz, ny)
    ).copy()
    modelinfo_off = {"max_abs_vvel": "0.0", "horiz_mix_coeff": "0.0"}

    results = []
    for n_module, n_space in ((2, 2), (1, 1)):
        mesh = make_mesh(
            n_module=n_module, n_space=n_space,
            devices=jax.devices()[: n_module * n_space],
        )
        kernel = ShardedIageKernel(
            mesh, depth, ypos, modelinfo_off, rates, n_steps=n_steps,
            region_mask=region_mask,
        )
        assert kernel.region_cnt == 4
        x0 = kernel.init_iterate()
        norms = np.asarray(kernel.norm(kernel.comp_fcn(x0)))
        assert norms.shape == (4, 4)  # (module, region)

        solver = NewtonKrylovInCore(
            kernel,
            newton_rel_tol=1e-5,
            krylov_rel_tol=1e-2,
            newton_max_iter=8,
            krylov_max_dim=20,
            jit_gmres=True,
        )
        x, fcn, info = solver.solve(x0)
        rel = np.asarray(info["fcn_norm"]) / np.asarray(info["x_norm"])
        assert (rel < 1e-5).all()
        results.append(np.asarray(x))

        # region-scoped scaling touches exactly that region's columns
        factors = np.ones((4, 4))
        factors[1, 2] = 3.0
        scaled = np.asarray(kernel.scale(x, factors))
        base = np.asarray(x)
        cols = slice(4, 6)  # region 3's columns
        assert np.allclose(scaled[1, :, :, cols], 3.0 * base[1, :, :, cols])
        assert np.allclose(scaled[0], base[0])
        others = [0, 1, 2, 3, 6, 7]
        assert np.allclose(scaled[1][:, :, others], base[1][:, :, others])

    assert np.abs(results[0] - results[1]).max() < 1e-9 * np.abs(
        results[1]
    ).max()


@pytest.mark.slow
def test_sharded_nonlinear_phosphorus_solve():
    """the NONLINEAR sharded solver: phosphorus Newton-Krylov with exact
    jvp-through-collectives and the shift-regularized column-banded
    preconditioner converges, conserves sign, and is mesh-shape independent"""
    from newton_krylov_ooc_tpu.parallel.sharded_year import (
        ShardedPhosphorusKernel,
    )

    nz, ny, n_steps = 8, 8, 96
    depth, ypos = _axes(nz, ny)

    results = []
    for n_space in (2, 1):
        mesh = make_mesh(
            n_module=1, n_space=n_space, devices=jax.devices()[:n_space]
        )
        kernel = ShardedPhosphorusKernel(
            mesh, depth, ypos, MODELINFO, n_steps=n_steps
        )
        solver = NewtonKrylovInCore(
            kernel,
            newton_rel_tol=1e-4,
            krylov_rel_tol=1e-2,
            newton_max_iter=8,
            krylov_max_dim=25,
            jit_gmres=True,
        )
        x, fcn, info = solver.solve(kernel.init_iterate())
        rel = np.asarray(info["fcn_norm"]) / np.asarray(info["x_norm"])
        assert (rel < 1e-4).all()
        assert info["iterations"] <= 5
        xv = np.asarray(x)
        assert np.isfinite(xv).all()
        assert xv[0, 0].min() > 0.0  # po4 stays positive
        results.append(xv)

    assert np.abs(results[0] - results[1]).max() < 1e-8 * np.abs(
        results[1]
    ).max()


def test_sharded_checkpoint_resume_preserves_sharding(tmp_path):
    """a checkpointed sharded solve resumes with the mesh sharding restored
    (a host-loaded snapshot fed back unsharded would run replicated)"""
    nz, ny, n_steps = 8, 8, 36
    depth, ypos = _axes(nz, ny)
    year = physics.SEC_PER_YEAR
    rates = (1.0 + 0.25 * np.arange(4)) / year
    mesh = make_mesh(n_module=2, n_space=4)
    kernel = ShardedIageKernel(
        mesh, depth, ypos, MODELINFO, rates, n_steps=n_steps
    )
    ckpt = str(tmp_path / "ckpt")

    solver = NewtonKrylovInCore(
        kernel, newton_rel_tol=1e-5, newton_max_iter=8, krylov_max_dim=20,
        jit_gmres=True,
    )
    x_ref, _, info = solver.solve(kernel.init_iterate(), checkpoint_dir=ckpt)
    assert info["iterations"] >= 1

    solver2 = NewtonKrylovInCore(
        kernel, newton_rel_tol=1e-5, newton_max_iter=8, krylov_max_dim=20,
        jit_gmres=True,
    )
    x2, _, info2 = solver2.solve(kernel.init_iterate(), checkpoint_dir=ckpt)
    assert info2["iterations"] == info["iterations"]
    assert x2.sharding.is_equivalent_to(kernel.state_sharding, x2.ndim)
    assert np.allclose(np.asarray(x2), np.asarray(x_ref))


def test_sharded_forced_family_solve():
    """the forced_{suff}-style family (surface restoring to per-module
    constants + per-module decay) spins up in one sharded batched solve;
    equilibria are bounded by the restoring target, decrease with the decay
    rate, and are mesh-shape independent"""
    from newton_krylov_ooc_tpu.parallel.sharded_year import (
        ShardedForcedFamilyKernel,
    )

    nz, ny, n_steps = 8, 8, 36
    depth, ypos = _axes(nz, ny)
    restore_rate = 1.0 / (10.0 * 86400.0)
    targets = np.full(4, 1.0)
    decays = np.arange(1, 5) / (200.0 * 86400.0)

    results = []
    for n_module, n_space in ((2, 4), (1, 1)):
        mesh = make_mesh(
            n_module=n_module, n_space=n_space,
            devices=jax.devices()[: n_module * n_space],
        )
        kernel = ShardedForcedFamilyKernel(
            mesh, depth, ypos, MODELINFO, restore_rate, targets, decays,
            n_steps=n_steps,
        )
        solver = NewtonKrylovInCore(
            kernel,
            newton_rel_tol=1e-5,
            krylov_rel_tol=1e-2,
            newton_max_iter=8,
            krylov_max_dim=25,
            jit_gmres=True,
        )
        x, fcn, info = solver.solve(kernel.init_iterate())
        rel = np.asarray(info["fcn_norm"]) / np.maximum(
            np.asarray(info["x_norm"]), 1e-300
        )
        assert (rel < 1e-5).all()
        xv = np.asarray(x)
        # the bound holds to solver tolerance (post-Newton fixed-point
        # updates are unlimited, as in the reference)
        assert xv.min() > -1e-5
        assert xv.max() <= 1.0 + 1e-6                 # bounded by the target
        inv = (xv[:, 0] * np.asarray(depth.delta)[:, None]).sum(axis=(1, 2))
        assert (np.diff(inv) < 0).all()               # more decay, less tracer
        results.append(xv)

    assert np.abs(results[0] - results[1]).max() < 1e-9 * np.abs(
        results[1]
    ).max()


@pytest.mark.slow
def test_sharded_forced_family_pallas_matches_xla():
    """the forced family's surface-only source profile rides the blocked
    pallas path: one year matches the XLA-scan sharded year at f32 level"""
    from newton_krylov_ooc_tpu.parallel.sharded_year import (
        ShardedForcedFamilyKernel,
    )

    nz, ny, n_steps = 8, 8, 25
    depth, ypos = _axes(nz, ny)
    restore_rate = 1.0 / (10.0 * 86400.0)
    targets = np.array([1.0, 0.5])
    decays = np.array([1.0, 2.0]) / (200.0 * 86400.0)
    mesh = make_mesh(n_module=2, n_space=2, devices=jax.devices()[:4])

    kern_pl = ShardedForcedFamilyKernel(
        mesh, depth, ypos, MODELINFO, restore_rate, targets, decays,
        n_steps=n_steps, use_pallas=True, block_steps=2,
        pallas_interpret=True,
    )
    kern_xla = ShardedForcedFamilyKernel(
        mesh, depth, ypos, MODELINFO, restore_rate, targets, decays,
        dtype=jnp.float32, n_steps=n_steps,
    )
    x0 = kern_xla.init_iterate()
    x0_pl = jax.device_put(x0, kern_pl.state_sharding)
    out_pl = np.asarray(kern_pl._year(x0_pl))
    out_xla = np.asarray(kern_xla._year(x0))
    scale = np.abs(out_xla).max()
    assert np.abs(out_pl - out_xla).max() < 1e-4 * scale

"""sharded 3D IRF-transport year vs the single-device integration.

The latitude-decomposed year (depth-2 ppermute halos for the upwind3
stencil, extended zero-padded coefficient slices) must reproduce the
unsharded ops.imex + ops.transport3d integration to float64 roundoff,
across mesh shapes -- the same equality contract as the 2D sharded year
(tests/test_sharded_year.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from newton_krylov_ooc_tpu.models.irf_offline import synthetic
from newton_krylov_ooc_tpu.ops.imex import imex_year
from newton_krylov_ooc_tpu.ops.transport3d import (
    build_transport3d,
    mask_vmix_coeff,
    transport_tend,
    vmix_vertical_coeff,
)
from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
    build_sharded_transport3d_year,
)

NZ, NLAT, NLON = 4, 8, 6
T_DIM = 2
YEAR = 365.0 * 86400.0
# inside the explicit stability bound of the synthetic circulation (an
# unstable run amplifies roundoff exponentially and "equality" is noise)
N_STEPS = 480


def _setup():
    mask = np.ones((NZ, NLAT, NLON), np.int32)
    mask[:, 3, 2] = 0
    mask[2:, 5, 4] = 0
    circ = synthetic.gen_circulation(NZ, NLAT, NLON, mask=mask)
    assert synthetic.stable_steps_per_year(circ) <= N_STEPS
    coef = build_transport3d(
        circ["mask"], circ["dz"], circ["TAREA"], uet=circ["UET"],
        vnt=circ["VNT"], wtt=circ["WTT"], hdiff_e=circ["HDIFF_E"],
        hdiff_n=circ["HDIFF_N"],
    )
    kv, dz_r = vmix_vertical_coeff(circ["VDC"], circ["dz"])
    kv = mask_vmix_coeff(kv, circ["mask"])

    rng = np.random.default_rng(9)
    wet = (mask > 0).astype(np.float64)
    diag = -rng.uniform(0.0, 1.0e-7, (T_DIM, NZ, NLAT, NLON)) * wet
    src = rng.uniform(0.0, 1.0e-8, (T_DIM, NZ, NLAT, NLON)) * wet
    y0 = rng.uniform(0.0, 1.0, (T_DIM, NZ, NLAT, NLON)) * wet
    return circ, coef, kv, dz_r, diag, src, y0


def _reference_year(coef, kv, dz_r, diag, src, y0):
    src2 = jnp.asarray(src.reshape(T_DIM, NZ, NLAT * NLON))

    def tend(t, y):
        y3 = y.reshape(y.shape[:-1] + (NLAT, NLON))
        return transport_tend(coef, y3).reshape(y.shape) + src2

    out = imex_year(
        tend,
        lambda t: kv,
        jnp.asarray(diag.reshape(T_DIM, NZ, NLAT * NLON)),
        dz_r,
        jnp.asarray(y0.reshape(T_DIM, NZ, NLAT * NLON)),
        (0.0, YEAR),
        N_STEPS,
    )
    return np.asarray(out).reshape(T_DIM, NZ, NLAT, NLON)


MODULE_SPECS = [
    [{"sink_rate_per_year": 0.5, "source_per_year": 1.0}],
    [
        {
            "surf_restore_pv_cm_s": 5.0,
            "surf_restore_target": 2.0,
            "sink_rate_per_year": 0.1,
        }
    ],
]


def _mesh_and_spec(n_y, n_x=None):
    """a latitude-only mesh (n_x None) or a 2D lat x lon process grid,
    with the matching state PartitionSpec"""
    if n_x is None:
        mesh = Mesh(np.asarray(jax.devices("cpu")[:n_y]), ("space",))
        return mesh, P(None, None, "space", None)
    mesh = Mesh(
        np.asarray(jax.devices("cpu")[: n_y * n_x]).reshape(n_y, n_x),
        ("space", "space_x"),
    )
    return mesh, P(None, None, "space", "space_x")


def _two_basin_regions(mask):
    """northern half of the wet cells as region 2 (P2 block independence)"""
    region = mask.copy()
    north = region[:, NLAT // 2 :, :]
    north[north > 0] = 2
    return region


def _solve_family(n_space, jit_gmres, circ, n_steps, region_mask, n_x=None):
    from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore
    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        ShardedTransport3dKernel,
    )

    if n_x is None:
        mesh = Mesh(np.asarray(jax.devices("cpu")[:n_space]), ("space",))
    else:
        mesh = Mesh(
            np.asarray(jax.devices("cpu")[: n_space * n_x]).reshape(
                n_space, n_x
            ),
            ("space", "space_x"),
        )
    kernel = ShardedTransport3dKernel(
        mesh, circ, MODULE_SPECS, n_steps=n_steps, region_mask=region_mask
    )
    assert kernel.region_cnt == 2
    solver = NewtonKrylovInCore(
        kernel,
        newton_rel_tol=1e-6,
        krylov_rel_tol=1e-4,
        newton_max_iter=6,
        krylov_max_dim=60,
        jit_gmres=jit_gmres,
    )
    x, fcn, info = solver.solve(kernel.init_iterate())
    # per-(module, region) convergence of the cyclostationary residual
    rel = info["fcn_norm"] / info["x_norm"]
    assert rel.shape == (len(MODULE_SPECS), 2)
    assert (rel < 1e-6).all()
    return np.asarray(x)


@pytest.fixture(scope="module")
def solve_setup():
    circ = _setup()[0]
    n_steps = max(N_STEPS, synthetic.stable_steps_per_year(circ))
    region_mask = _two_basin_regions(np.asarray(circ["mask"]))
    x_ref = _solve_family(1, False, circ, n_steps, region_mask)
    return circ, n_steps, region_mask, x_ref


@pytest.mark.parametrize("n_space,jit_gmres", [(4, False), (2, True)])
def test_sharded_solve_matches_single_device(n_space, jit_gmres, solve_setup):
    """full Newton-Krylov solves of the 3D transport family agree across
    mesh shapes and across the host-loop/jitted GMRES paths -- the sharded
    counterpart of the reference's distributed preconditioner solve
    (nk_ooc/cime_pop/model_state.py:317-337), with the whole solver on the
    mesh rather than just the linear solve"""
    circ, n_steps, region_mask, x_ref = solve_setup
    got = _solve_family(n_space, jit_gmres, circ, n_steps, region_mask)
    scale = np.abs(x_ref).max()
    np.testing.assert_allclose(got, x_ref, rtol=0.0, atol=1e-11 * scale)


@pytest.mark.parametrize("n_y,n_x", [(2, 2), (1, 3), (4, 2), (2, 1)])
def test_sharded_year_2d_mesh_matches_single_device(n_y, n_x):
    """the 2D (lat x lon) process-grid decomposition -- the reference's
    nprow x npcol MPI grid (nk_ooc/cime_pop/model_state.py:439-450) on the
    device mesh -- reproduces the single-device year to roundoff; the
    zonal halos wrap periodically (cyclic ppermute)"""
    circ, coef, kv, dz_r, diag, src, y0 = _setup()
    expected = _reference_year(coef, kv, dz_r, diag, src, y0)

    mesh = Mesh(
        np.asarray(jax.devices("cpu")[: n_y * n_x]).reshape(n_y, n_x),
        ("space", "space_x"),
    )
    fn = build_sharded_transport3d_year(
        mesh, coef, kv, dz_r,
        diag.reshape(T_DIM, NZ, NLAT * NLON),
        src.reshape(T_DIM, NZ, NLAT * NLON),
        (0.0, YEAR), N_STEPS,
    )
    y_dev = jax.device_put(
        jnp.asarray(y0),
        NamedSharding(mesh, P(None, None, "space", "space_x")),
    )
    got = np.asarray(fn(y_dev))
    scale = np.abs(expected).max()
    np.testing.assert_allclose(got, expected, rtol=0.0, atol=1e-13 * scale)


def test_sharded_solve_2d_mesh_matches_single_device(solve_setup):
    """full Newton-Krylov family solve on the 2D (lat x lon) process grid
    agrees with the single-device solve -- regions, jitted GMRES, and the
    column-local preconditioner all compose with the 2D decomposition"""
    circ, n_steps, region_mask, x_ref = solve_setup
    got = _solve_family(2, True, circ, n_steps, region_mask, n_x=2)
    scale = np.abs(x_ref).max()
    np.testing.assert_allclose(got, x_ref, rtol=0.0, atol=1e-11 * scale)


@pytest.mark.parametrize("n_space,n_x", [(2, None), (4, None), (2, 2)])
def test_sharded_coupled_gas_exchange_year(n_space, n_x):
    """the cross-tracer surface gas-exchange coupling (d_SF_X_d_Y) is
    shard-local: the coupled sharded year equals an independent unsharded
    IMEX integration carrying the same coupling term, and differs from the
    uncoupled year (guarding against the term being silently dropped);
    also on the 2D process grid, where the surface mask slices both ways"""
    circ, coef, kv, dz_r, diag, src, y0 = _setup()
    couple = np.zeros((T_DIM, T_DIM))
    couple[1, 0] = 4.25e-3 / circ["dz"][0]

    # independent single-device reference with the coupling in the tendency
    wet_surf = (np.asarray(circ["mask"])[0] > 0).reshape(-1).astype(np.float64)
    src2 = jnp.asarray(src.reshape(T_DIM, NZ, NLAT * NLON))
    couple_j = jnp.asarray(couple)

    def tend(t, y):
        y3 = y.reshape(y.shape[:-1] + (NLAT, NLON))
        out = transport_tend(coef, y3).reshape(y.shape) + src2
        sflux = wet_surf * jnp.einsum("xy,yh->xh", couple_j, y[:, 0, :])
        return out.at[:, 0, :].add(sflux)

    expected = np.asarray(
        imex_year(
            tend,
            lambda t: kv,
            jnp.asarray(diag.reshape(T_DIM, NZ, NLAT * NLON)),
            dz_r,
            jnp.asarray(y0.reshape(T_DIM, NZ, NLAT * NLON)),
            (0.0, YEAR),
            N_STEPS,
        )
    ).reshape(T_DIM, NZ, NLAT, NLON)
    uncoupled = _reference_year(coef, kv, dz_r, diag, src, y0)
    assert np.abs(expected[1] - uncoupled[1]).max() > 1e-6 * np.abs(
        expected[1]
    ).max()

    mesh, spec = _mesh_and_spec(n_space, n_x)
    fn = build_sharded_transport3d_year(
        mesh, coef, kv, dz_r,
        diag.reshape(T_DIM, NZ, NLAT * NLON),
        src.reshape(T_DIM, NZ, NLAT * NLON),
        (0.0, YEAR), N_STEPS, couple=couple,
    )
    y_dev = jax.device_put(jnp.asarray(y0), NamedSharding(mesh, spec))
    got = np.asarray(fn(y_dev))
    scale = np.abs(expected).max()
    np.testing.assert_allclose(got, expected, rtol=0.0, atol=1e-13 * scale)


def test_sharded_coupled_kernel_solve():
    """whole-family sharded Newton-Krylov solve of a gas-exchange-coupled
    module (the abio_dic_dic14 pattern) matches the single-device solve"""
    circ = _setup()[0]
    n_steps = max(N_STEPS, synthetic.stable_steps_per_year(circ))
    specs = [
        [
            {
                "name": "DIC",
                "surf_flux_const_cm_s": 1.05e-2,
                "surf_flux_d": {"DIC": -5.0e-3},
            },
            {
                "name": "DIC14",
                "surf_flux_d": {"DIC": 4.25e-3, "DIC14": -5.0e-3},
                "sink_rate_per_year": 1.2097e-4,
            },
        ]
    ]
    from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore
    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        ShardedTransport3dKernel,
    )

    results = []
    for n_space in (1, 2):
        mesh = Mesh(np.asarray(jax.devices("cpu")[:n_space]), ("space",))
        kernel = ShardedTransport3dKernel(mesh, circ, specs, n_steps=n_steps)
        solver = NewtonKrylovInCore(
            kernel,
            newton_rel_tol=1e-6,
            krylov_rel_tol=1e-4,
            newton_max_iter=8,
            krylov_max_dim=60,
        )
        x, fcn, info = solver.solve(kernel.init_iterate())
        rel = info["fcn_norm"] / info["x_norm"]
        assert (rel < 1e-6).all()
        results.append(np.asarray(x))
    scale = np.abs(results[0]).max()
    np.testing.assert_allclose(
        results[1], results[0], rtol=0.0, atol=1e-11 * scale
    )
    # the DIC14/DIC surface ratio scatters around the exchange balance
    # d_in/d_out = 0.85 (transport redistributes; decay is tiny)
    surf = results[0][0, :, 0][:, np.asarray(circ["mask"])[0] > 0]
    ratio = surf[1] / surf[0]
    assert 0.80 < ratio.mean() < 0.90
    assert (ratio > 0.5).all() and (ratio < 1.0).all()


@pytest.mark.parametrize("n_space,n_x", [(2, None), (4, None), (2, 3)])
def test_sharded_seasonal_year_matches_single_device(n_space, n_x):
    """a SEASONAL circulation (monthly face transports + vertical mixing,
    interpolated periodically inside the integration) shards identically:
    the time interpolation is shard-local, so only the same two halo
    ppermutes per stage communicate; on the 2D process grid the seasonal
    leading time axis rides through the wrap-padded longitude slices"""
    from newton_krylov_ooc_tpu.ops.transport3d import (
        interp_month,
        interp_transport_coef,
    )

    mask = np.ones((NZ, NLAT, NLON), np.int32)
    mask[:, 3, 2] = 0
    mask[2:, 5, 4] = 0
    circ = synthetic.gen_circulation(NZ, NLAT, NLON, mask=mask, n_seasons=4)
    assert circ["UET"].ndim == 4
    n_steps = max(N_STEPS, synthetic.stable_steps_per_year(circ))
    coef = build_transport3d(
        circ["mask"], circ["dz"], circ["TAREA"], uet=circ["UET"],
        vnt=circ["VNT"], wtt=circ["WTT"], hdiff_e=circ["HDIFF_E"],
        hdiff_n=circ["HDIFF_N"],
    )
    kv, dz_r = vmix_vertical_coeff(circ["VDC"], circ["dz"])
    kv = mask_vmix_coeff(kv, circ["mask"])
    assert kv.ndim == 3

    rng = np.random.default_rng(11)
    wet = (mask > 0).astype(np.float64)
    diag = -rng.uniform(0.0, 1.0e-7, (T_DIM, NZ, NLAT, NLON)) * wet
    src = rng.uniform(0.0, 1.0e-8, (T_DIM, NZ, NLAT, NLON)) * wet
    y0 = rng.uniform(0.0, 1.0, (T_DIM, NZ, NLAT, NLON)) * wet

    src2 = jnp.asarray(src.reshape(T_DIM, NZ, NLAT * NLON))

    def tend(t, y):
        c = interp_transport_coef(coef, jnp.mod(t / YEAR, 1.0))
        y3 = y.reshape(y.shape[:-1] + (NLAT, NLON))
        return transport_tend(c, y3).reshape(y.shape) + src2

    expected = np.asarray(
        imex_year(
            tend,
            lambda t: interp_month(kv, jnp.mod(t / YEAR, 1.0)),
            jnp.asarray(diag.reshape(T_DIM, NZ, NLAT * NLON)),
            dz_r,
            jnp.asarray(y0.reshape(T_DIM, NZ, NLAT * NLON)),
            (0.0, YEAR),
            n_steps,
        )
    ).reshape(T_DIM, NZ, NLAT, NLON)

    mesh, spec = _mesh_and_spec(n_space, n_x)
    fn = build_sharded_transport3d_year(
        mesh, coef, kv, dz_r,
        diag.reshape(T_DIM, NZ, NLAT * NLON),
        src.reshape(T_DIM, NZ, NLAT * NLON),
        (0.0, YEAR), n_steps,
    )
    y_dev = jax.device_put(jnp.asarray(y0), NamedSharding(mesh, spec))
    got = np.asarray(fn(y_dev))
    scale = np.abs(expected).max()
    np.testing.assert_allclose(got, expected, rtol=0.0, atol=1e-13 * scale)


def test_sharded_seasonal_kernel_solve():
    """whole-family sharded solve under a seasonal circulation matches the
    single-device solve (annual-mean vertical preconditioner, seasonal
    forward operator)"""
    mask = np.ones((NZ, NLAT, NLON), np.int32)
    mask[:, 3, 2] = 0
    circ = synthetic.gen_circulation(NZ, NLAT, NLON, mask=mask, n_seasons=4)
    n_steps = max(N_STEPS, synthetic.stable_steps_per_year(circ))
    from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore
    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        ShardedTransport3dKernel,
    )

    specs = [
        [{"name": "IAGE", "source_per_year": 1.0,
          "surf_restore_pv_cm_s": 5.0e-3}]
    ]
    results = []
    for n_space in (1, 2):
        mesh = Mesh(np.asarray(jax.devices("cpu")[:n_space]), ("space",))
        kernel = ShardedTransport3dKernel(mesh, circ, specs, n_steps=n_steps)
        solver = NewtonKrylovInCore(
            kernel,
            newton_rel_tol=1e-6,
            krylov_rel_tol=1e-4,
            newton_max_iter=8,
            krylov_max_dim=60,
        )
        x, _fcn, info = solver.solve(kernel.init_iterate())
        rel = info["fcn_norm"] / info["x_norm"]
        assert (rel < 1e-6).all()
        results.append(np.asarray(x))
    scale = np.abs(results[0]).max()
    np.testing.assert_allclose(
        results[1], results[0], rtol=0.0, atol=1e-11 * scale
    )


@pytest.mark.parametrize("n_space", [2, 4])
def test_sharded_year_matches_single_device(n_space):
    circ, coef, kv, dz_r, diag, src, y0 = _setup()
    expected = _reference_year(coef, kv, dz_r, diag, src, y0)

    mesh = Mesh(
        np.asarray(jax.devices("cpu")[:n_space]).reshape(n_space),
        ("space",),
    )
    fn = build_sharded_transport3d_year(
        mesh, coef, kv, dz_r,
        diag.reshape(T_DIM, NZ, NLAT * NLON),
        src.reshape(T_DIM, NZ, NLAT * NLON),
        (0.0, YEAR), N_STEPS,
    )
    y_dev = jax.device_put(
        jnp.asarray(y0),
        NamedSharding(mesh, P(None, None, "space", None)),
    )
    got = np.asarray(fn(y_dev))

    scale = np.abs(expected).max()
    np.testing.assert_allclose(got, expected, rtol=0.0, atol=1e-13 * scale)
    assert np.isfinite(got).all()


def test_phosphorus3d_nonlinear_solve():
    """NONLINEAR 3D biogeochemistry (po4/dop/pop Michaelis-Menten uptake,
    remineralization, seafloor-blocked particulate sinking) riding the 3D
    IRF circulation -- a problem class the reference cannot express (its
    3D tendencies live inside batch-submitted POP).  The sharded Newton
    solve (exact jax.jvp through the halo collectives, column-local
    banded preconditioner) must: conserve total phosphorus exactly,
    converge, and agree across mesh shapes to roundoff."""
    from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore
    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        ShardedPhosphorus3dKernel,
    )

    mask = np.ones((NZ, NLAT, NLON), np.int32)
    mask[:, 3, 2] = 0
    mask[2:, 5, 4] = 0
    circ = synthetic.gen_circulation(NZ, NLAT, NLON, mask=mask)
    n_steps = max(N_STEPS, synthetic.stable_steps_per_year(circ))
    results = []
    for n_y, n_x in ((1, None), (2, 2)):
        mesh, _spec = _mesh_and_spec(n_y, n_x)
        kernel = ShardedPhosphorus3dKernel(mesh, circ, n_steps=n_steps)
        x0 = kernel.init_iterate()
        ones = jnp.ones_like(x0)
        # the tendency conserves total P exactly (sinking telescopes,
        # uptake/remin shuffle between the three pools)
        fcn0 = kernel.comp_fcn(x0)
        assert np.abs(np.asarray(kernel._dot(fcn0, ones))).max() < 1e-12

        solver = NewtonKrylovInCore(
            kernel,
            newton_rel_tol=1e-6,
            krylov_rel_tol=1e-3,
            newton_max_iter=10,
            krylov_max_dim=40,
            jit_gmres=True,
        )
        x, _fcn, info = solver.solve(x0)
        rel = np.asarray(info["fcn_norm"]) / np.asarray(info["x_norm"])
        assert (rel < 1e-6).all()
        # the solve walks along the conservation null space: total P of
        # the cyclostationary state equals the initial iterate's
        np.testing.assert_allclose(
            np.asarray(kernel._dot(x, ones)),
            np.asarray(kernel._dot(x0, ones)),
            rtol=1e-9,
        )
        assert np.asarray(x).min() >= 0.0  # lower bound held
        results.append(np.asarray(x))
    scale = np.abs(results[0]).max()
    np.testing.assert_allclose(
        results[1], results[0], rtol=0.0, atol=1e-11 * scale
    )


# -- VMEM-resident pallas block year (k steps per halo exchange) -----------


def test_sharded_year_pallas_matches_single_device():
    """the pallas k-step block year (ops/transport3d_block_pallas between
    ppermute halo exchanges) reproduces the scan year at toy extents,
    across shard counts, block depths, and the remainder-block path"""
    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        build_sharded_transport3d_year_pallas,
    )

    circ, coef, kv, dz_r, diag, src, y0 = _setup()
    expected = _reference_year(coef, kv, dz_r, diag, src, y0)
    scale = np.abs(expected).max()
    wet = (np.asarray(circ["mask"]) > 0).astype(np.float64)

    for n_space, k in ((2, 1), (1, 2), (4, 0)):
        if k == 0:
            continue  # nl_loc=2 < halo 4: guarded below
        mesh = Mesh(np.asarray(jax.devices("cpu")[:n_space]), ("space",))
        fn = build_sharded_transport3d_year_pallas(
            mesh, coef, kv, dz_r,
            diag.reshape(T_DIM, NZ, -1), src.reshape(T_DIM, NZ, -1),
            (0.0, YEAR), N_STEPS, block_steps=k, interpret=True,
        )
        y_dev = jax.device_put(
            jnp.asarray(y0),
            NamedSharding(mesh, P(None, None, "space", None)),
        )
        got = np.asarray(fn(y_dev))
        # float32 pallas path vs the float64 scan: discretization level
        np.testing.assert_allclose(
            got, expected, rtol=0.0, atol=2e-5 * scale
        )
        assert np.abs(got * (1.0 - wet)).max() == 0.0

    mesh4 = Mesh(np.asarray(jax.devices("cpu")[:4]), ("space",))
    with pytest.raises(ValueError, match="halo depth"):
        build_sharded_transport3d_year_pallas(
            mesh4, coef, kv, dz_r,
            diag.reshape(T_DIM, NZ, -1), src.reshape(T_DIM, NZ, -1),
            (0.0, YEAR), N_STEPS, block_steps=1, interpret=True,
        )


@pytest.mark.slow
def test_sharded_year_pallas_gx1_extent_family():
    """gx1-HORIZONTAL-extent (384 x 320, depth-reduced) coupled family
    through the pallas block year on the virtual 8-device mesh: per-shard
    coefficient windows fit one core's VMEM exactly where the whole-grid
    megakernel is ~6x oversized (the sharding-composes-with-the-gx1-regime
    requirement; reference anchor: the 256-rank distributed solve,
    nk_ooc/cime_pop/model_state.py:317-337).  Rates take the
    assemble_rate_fields form (dense residency shed), dic/dic14-style
    surface coupling included; 8-device equals 1-device bitwise"""
    from newton_krylov_ooc_tpu.ops.transport3d import assemble_rate_fields
    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        build_sharded_transport3d_year_pallas,
    )

    nz, nlat, nlon, t_dim = 3, 384, 320, 2
    n_steps = 368  # >= the synthetic circulation's stability bound (365)
    mask = np.ones((nz, nlat, nlon), np.int32)
    mask[:, 100, 37] = 0
    mask[1:, 251, 200] = 0
    circ = synthetic.gen_circulation(nz, nlat, nlon, mask=mask)
    assert synthetic.stable_steps_per_year(circ) <= n_steps
    coef = build_transport3d(
        circ["mask"], circ["dz"], circ["TAREA"], uet=circ["UET"],
        vnt=circ["VNT"], wtt=circ["WTT"], hdiff_e=circ["HDIFF_E"],
        hdiff_n=circ["HDIFF_N"],
    )
    kv, dz_r = vmix_vertical_coeff(circ["VDC"], circ["dz"])
    kv = mask_vmix_coeff(kv, circ["mask"])
    wet = (mask > 0).astype(np.float64)
    specs = [
        {"name": "dic", "sink_rate_per_year": 0.02,
         "surf_restore_pv_cm_s": 2.0e-4, "surf_restore_target": 1.0,
         "surf_flux_d": {"dic14": 1.5e-4}},
        {"name": "dic14", "source_per_year": 1.0e-3},
    ]
    diag, src, couple = assemble_rate_fields(
        specs, wet.reshape(nz, -1), float(circ["dz"][0]), YEAR
    )
    assert couple is not None
    rng = np.random.default_rng(31)
    y0 = rng.uniform(0.0, 1.0, (t_dim, nz, nlat, nlon)) * wet

    src2 = jnp.asarray(src)
    wet_surf = jnp.asarray(wet[0].reshape(-1))
    couple_j = jnp.asarray(couple)

    def tend(t, y):
        y3 = y.reshape(y.shape[:-1] + (nlat, nlon))
        out = transport_tend(coef, y3).reshape(y.shape) + src2
        sflux = wet_surf * jnp.einsum("xy,yh->xh", couple_j, y[:, 0, :])
        return out.at[:, 0, :].add(sflux)

    expected = np.asarray(
        imex_year(
            tend, lambda t: kv, jnp.asarray(diag), dz_r,
            jnp.asarray(y0.reshape(t_dim, nz, -1)), (0.0, YEAR), n_steps,
        )
    ).reshape(t_dim, nz, nlat, nlon)
    scale = np.abs(expected).max()

    outs = {}
    for n_space in (8, 1):
        mesh = Mesh(np.asarray(jax.devices("cpu")[:n_space]), ("space",))
        fn = build_sharded_transport3d_year_pallas(
            mesh, coef, kv, dz_r, diag, src, (0.0, YEAR), n_steps,
            block_steps=4, couple=couple, interpret=True,
        )
        assert fn.vmem_bytes > 0
        y_dev = jax.device_put(
            jnp.asarray(y0),
            NamedSharding(mesh, P(None, None, "space", None)),
        )
        outs[n_space] = np.asarray(fn(y_dev))
        np.testing.assert_allclose(
            outs[n_space], expected, rtol=0.0, atol=2e-5 * scale
        )
        assert np.abs(outs[n_space] * (1.0 - wet)).max() == 0.0
    # every owned row sees the identical arithmetic regardless of the
    # shard count (measured exact here; the contract is roundoff-level)
    np.testing.assert_allclose(
        outs[8], outs[1], rtol=0.0, atol=1e-6 * scale
    )


def test_sharded_year_pallas_guards():
    """seasonal coefficients/kv and 2D meshes are explicit errors, not
    silent fallbacks"""
    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        build_sharded_transport3d_year_pallas,
    )

    circ, coef, kv, dz_r, diag, src, _y0 = _setup()
    args = (
        diag.reshape(T_DIM, NZ, -1), src.reshape(T_DIM, NZ, -1),
        (0.0, YEAR), N_STEPS,
    )
    mesh2d = Mesh(
        np.asarray(jax.devices("cpu")[:4]).reshape(2, 2),
        ("space", "space_x"),
    )
    with pytest.raises(ValueError, match="latitude only"):
        build_sharded_transport3d_year_pallas(
            mesh2d, coef, kv, dz_r, *args
        )
    mesh = Mesh(np.asarray(jax.devices("cpu")[:2]), ("space",))
    circ_s = synthetic.gen_circulation(NZ, NLAT, NLON, n_seasons=4)
    coef_s = build_transport3d(
        circ_s["mask"], circ_s["dz"], circ_s["TAREA"], uet=circ_s["UET"],
        vnt=circ_s["VNT"], wtt=circ_s["WTT"], hdiff_e=circ_s["HDIFF_E"],
        hdiff_n=circ_s["HDIFF_N"],
    )
    with pytest.raises(ValueError, match="steady-only"):
        build_sharded_transport3d_year_pallas(
            mesh, coef_s, kv, dz_r, *args
        )
    kv_s, _dz_r_s = vmix_vertical_coeff(circ_s["VDC"], circ_s["dz"])
    with pytest.raises(ValueError, match="seasonal kv"):
        build_sharded_transport3d_year_pallas(
            mesh, coef, mask_vmix_coeff(kv_s, circ_s["mask"]), dz_r, *args
        )


def test_sharded_year_stream_matches_single_device():
    """the sharded HBM-STREAMING year (per-sweep block-window streaming
    kernels between ppermute halo exchanges,
    build_sharded_transport3d_year_stream) reproduces the unsharded scan
    year, across shard counts and steps_per_sweep -- the decomposition
    for grids whose PER-SHARD slab exceeds one core's VMEM"""
    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        build_sharded_transport3d_year_stream,
    )

    nz, nlat, nlon = 4, 16, 6
    n_steps = 480
    mask = np.ones((nz, nlat, nlon), np.int32)
    mask[:, 3, 2] = 0
    mask[2:, 11, 4] = 0
    circ = synthetic.gen_circulation(nz, nlat, nlon, mask=mask)
    assert synthetic.stable_steps_per_year(circ) <= n_steps
    coef = build_transport3d(
        circ["mask"], circ["dz"], circ["TAREA"], uet=circ["UET"],
        vnt=circ["VNT"], wtt=circ["WTT"], hdiff_e=circ["HDIFF_E"],
        hdiff_n=circ["HDIFF_N"],
    )
    kv, dz_r = vmix_vertical_coeff(circ["VDC"], circ["dz"])
    kv = mask_vmix_coeff(kv, circ["mask"])
    rng = np.random.default_rng(11)
    wet = (mask > 0).astype(np.float64)
    t_dim = 2
    # one rate-factorable tracer (uniform sink + surface term), one dense
    diag = np.zeros((t_dim, nz, nlat, nlon))
    diag[0] = -1.0e-8 * wet
    diag[0, 0] -= 2.0e-8 * wet[0]
    diag[1] = -rng.uniform(0.0, 1.0e-7, (nz, nlat, nlon)) * wet
    src = np.zeros((t_dim, nz, nlat, nlon))
    src[0] = 1.0e-8 * wet
    src[1] = rng.uniform(0.0, 1.0e-8, (nz, nlat, nlon)) * wet
    y0 = rng.uniform(0.0, 1.0, (t_dim, nz, nlat, nlon)) * wet

    src2 = jnp.asarray(src.reshape(t_dim, nz, nlat * nlon))

    def tend(t, y):
        y3 = y.reshape(y.shape[:-1] + (nlat, nlon))
        return transport_tend(coef, y3).reshape(y.shape) + src2

    expected = np.asarray(
        imex_year(
            tend, lambda t: kv,
            jnp.asarray(diag.reshape(t_dim, nz, nlat * nlon)), dz_r,
            jnp.asarray(y0.reshape(t_dim, nz, nlat * nlon)),
            (0.0, YEAR), n_steps,
        )
    ).reshape(t_dim, nz, nlat, nlon)
    scale = np.abs(expected).max()

    for n_space, b_rows, k in ((2, 8, 1), (1, 8, 2), (2, 8, 2)):
        mesh = Mesh(np.asarray(jax.devices("cpu")[:n_space]), ("space",))
        fn = build_sharded_transport3d_year_stream(
            mesh, coef, kv, dz_r,
            diag.reshape(t_dim, nz, -1), src.reshape(t_dim, nz, -1),
            (0.0, YEAR), n_steps, block_rows=b_rows, steps_per_sweep=k,
            recip_area=1.0 / np.asarray(circ["TAREA"]),
            recip_dz=1.0 / np.asarray(circ["dz"]),
            interpret=True,
        )
        y_dev = jax.device_put(
            jnp.asarray(y0),
            NamedSharding(mesh, P(None, None, "space", None)),
        )
        got = np.asarray(fn(y_dev))
        np.testing.assert_allclose(
            got, expected, rtol=0.0, atol=2e-5 * scale,
            err_msg=f"n_space={n_space} block_rows={b_rows} k={k}",
        )
        assert np.abs(got * (1.0 - wet)).max() == 0.0

    mesh4 = Mesh(np.asarray(jax.devices("cpu")[:4]), ("space",))
    with pytest.raises(ValueError, match="not a multiple of block_rows"):
        build_sharded_transport3d_year_stream(
            mesh4, coef, kv, dz_r,
            diag.reshape(t_dim, nz, -1), src.reshape(t_dim, nz, -1),
            (0.0, YEAR), n_steps, block_rows=8, interpret=True,
        )


def test_sharded_year_stream_factored_rates_and_chunks():
    """stream-year branches the base test misses: a family whose rate
    fields ALL factor through the wet mask (stream_diag/stream_src shed,
    rebuilt in-kernel from 2 scalars/tracer), tracer chunking of the
    stencil evaluation, an explicit-t_dim rate-free family, and the
    collapsed stencil-operator mode"""
    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        build_sharded_transport3d_year_stream,
    )

    nz, nlat, nlon = 4, 16, 6
    n_steps = 480
    circ = synthetic.gen_circulation(nz, nlat, nlon)
    assert synthetic.stable_steps_per_year(circ) <= n_steps
    coef = build_transport3d(
        circ["mask"], circ["dz"], circ["TAREA"], uet=circ["UET"],
        vnt=circ["VNT"], wtt=circ["WTT"], hdiff_e=circ["HDIFF_E"],
        hdiff_n=circ["HDIFF_N"],
    )
    kv, dz_r = vmix_vertical_coeff(circ["VDC"], circ["dz"])
    kv = mask_vmix_coeff(kv, circ["mask"])
    wet = (np.asarray(circ["mask"]) > 0).astype(np.float64)
    rng = np.random.default_rng(13)
    t_dim = 3
    diag = np.stack([
        -1.0e-8 * wet,
        -2.0e-8 * wet - 1.0e-8 * np.concatenate(
            [wet[:1], np.zeros_like(wet[1:])]),
        np.zeros_like(wet),
    ])
    src = np.stack([
        1.0e-8 * wet, np.zeros_like(wet), 2.0e-8 * wet,
    ])
    y0 = rng.uniform(0.0, 1.0, (t_dim, nz, nlat, nlon)) * wet

    src2 = jnp.asarray(src.reshape(t_dim, nz, nlat * nlon))

    def tend(t, y):
        y3 = y.reshape(y.shape[:-1] + (nlat, nlon))
        return transport_tend(coef, y3).reshape(y.shape) + src2

    expected = np.asarray(
        imex_year(
            tend, lambda t: kv,
            jnp.asarray(diag.reshape(t_dim, nz, nlat * nlon)), dz_r,
            jnp.asarray(y0.reshape(t_dim, nz, nlat * nlon)),
            (0.0, YEAR), n_steps,
        )
    ).reshape(t_dim, nz, nlat, nlon)
    scale = np.abs(expected).max()

    mesh = Mesh(np.asarray(jax.devices("cpu")[:2]), ("space",))
    y_dev = jax.device_put(
        jnp.asarray(y0), NamedSharding(mesh, P(None, None, "space", None))
    )
    for chunk, use_stencil in ((None, False), (2, False), (None, True)):
        fn = build_sharded_transport3d_year_stream(
            mesh, coef, kv, dz_r,
            diag.reshape(t_dim, nz, -1), src.reshape(t_dim, nz, -1),
            (0.0, YEAR), n_steps, block_rows=8, steps_per_sweep=2,
            interpret=True, tend_chunk=chunk, stencil=use_stencil,
        )
        # every rate field factors -> no dense windows stream
        assert not fn.stream_diag and not fn.stream_src
        assert fn.stencil == use_stencil
        got = np.asarray(fn(y_dev))
        np.testing.assert_allclose(
            got, expected, rtol=0.0,
            atol=(2e-4 if use_stencil else 2e-5) * scale,
            err_msg=f"tend_chunk={chunk} stencil={use_stencil}",
        )

    # rate-free family: t_dim cannot be inferred -> explicit kwarg
    with pytest.raises(ValueError, match="t_dim"):
        build_sharded_transport3d_year_stream(
            mesh, coef, kv, dz_r, None, None, (0.0, YEAR), n_steps,
            block_rows=8, interpret=True,
        )
    fn0 = build_sharded_transport3d_year_stream(
        mesh, coef, kv, dz_r, None, None, (0.0, YEAR), n_steps,
        block_rows=8, steps_per_sweep=2, interpret=True, t_dim=1,
    )
    def tend0(t, y):
        y3 = y.reshape(y.shape[:-1] + (nlat, nlon))
        return transport_tend(coef, y3).reshape(y.shape)

    exp0 = np.asarray(
        imex_year(
            tend0, lambda t: kv, jnp.zeros((), jnp.float64), dz_r,
            jnp.asarray(y0[:1].reshape(1, nz, nlat * nlon)),
            (0.0, YEAR), n_steps,
        )
    ).reshape(1, nz, nlat, nlon)
    y1_dev = jax.device_put(
        jnp.asarray(y0[:1]),
        NamedSharding(mesh, P(None, None, "space", None)),
    )
    got0 = np.asarray(fn0(y1_dev))
    np.testing.assert_allclose(
        got0, exp0, rtol=0.0, atol=2e-5 * np.abs(exp0).max()
    )


def test_sharded_year_stream_seasonal_coupled():
    """the sharded HBM-streaming year on the PRODUCTION-shaped workload:
    seasonal (monthly) circulation + seasonal vertical mixing + the
    gas-exchange surface coupling matrix, pinned against the unsharded
    seasonal scan -- the regime the reference's setup can only
    ncra-collapse to an annual mean
    (/root/reference/nk_ooc/cime_pop/setup_solver.py:100-166)"""
    from newton_krylov_ooc_tpu.ops.transport3d import (
        interp_month,
        interp_transport_coef,
    )
    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        build_sharded_transport3d_year_stream,
    )

    nz, nlat, nlon = 4, 16, 6
    mask = np.ones((nz, nlat, nlon), np.int32)
    mask[:, 3, 2] = 0
    mask[2:, 11, 4] = 0
    circ = synthetic.gen_circulation(nz, nlat, nlon, mask=mask, n_seasons=4)
    assert circ["UET"].ndim == 4
    n_steps = max(480, synthetic.stable_steps_per_year(circ))
    coef = build_transport3d(
        circ["mask"], circ["dz"], circ["TAREA"], uet=circ["UET"],
        vnt=circ["VNT"], wtt=circ["WTT"], hdiff_e=circ["HDIFF_E"],
        hdiff_n=circ["HDIFF_N"],
    )
    kv, dz_r = vmix_vertical_coeff(circ["VDC"], circ["dz"])
    kv = mask_vmix_coeff(kv, circ["mask"])
    assert np.asarray(kv).ndim == 3  # seasonal vertical mixing too

    rng = np.random.default_rng(17)
    wet = (mask > 0).astype(np.float64)
    t_dim = 2
    diag = np.zeros((t_dim, nz, nlat, nlon))
    diag[0] = -1.0e-8 * wet
    src = np.zeros((t_dim, nz, nlat, nlon))
    src[0] = 1.0e-8 * wet
    y0 = rng.uniform(0.0, 1.0, (t_dim, nz, nlat, nlon)) * wet
    couple = np.zeros((t_dim, t_dim))
    couple[1, 0] = 4.25e-3 / circ["dz"][0]
    couple[1, 1] = -2.0e-3 / circ["dz"][0]

    wet_surf = (wet[0] > 0).reshape(-1).astype(np.float64)
    src2 = jnp.asarray(src.reshape(t_dim, nz, nlat * nlon))
    couple_j = jnp.asarray(couple)

    def tend(t, y):
        c = interp_transport_coef(coef, jnp.mod(t / YEAR, 1.0))
        y3 = y.reshape(y.shape[:-1] + (nlat, nlon))
        out = transport_tend(c, y3).reshape(y.shape) + src2
        sflux = wet_surf * jnp.einsum("xy,yh->xh", couple_j, y[:, 0, :])
        return out.at[:, 0, :].add(sflux)

    expected = np.asarray(
        imex_year(
            tend,
            lambda t: interp_month(kv, jnp.mod(t / YEAR, 1.0)),
            jnp.asarray(diag.reshape(t_dim, nz, nlat * nlon)), dz_r,
            jnp.asarray(y0.reshape(t_dim, nz, nlat * nlon)),
            (0.0, YEAR), n_steps,
        )
    ).reshape(t_dim, nz, nlat, nlon)
    scale = np.abs(expected).max()

    for n_space in (1, 2):
        mesh = Mesh(np.asarray(jax.devices("cpu")[:n_space]), ("space",))
        fn = build_sharded_transport3d_year_stream(
            mesh, coef, kv, dz_r,
            diag.reshape(t_dim, nz, -1), src.reshape(t_dim, nz, -1),
            (0.0, YEAR), n_steps, block_rows=8, couple=couple,
            interpret=True,
        )
        assert fn.seasonal
        y_dev = jax.device_put(
            jnp.asarray(y0),
            NamedSharding(mesh, P(None, None, "space", None)),
        )
        got = np.asarray(fn(y_dev))
        np.testing.assert_allclose(
            got, expected, rtol=0.0, atol=5e-5 * scale,
            err_msg=f"n_space={n_space}",
        )
        assert np.abs(got * (1.0 - wet)).max() == 0.0
    # the coupling term must actually matter at this tolerance
    fn_nc = build_sharded_transport3d_year_stream(
        Mesh(np.asarray(jax.devices("cpu")[:2]), ("space",)),
        coef, kv, dz_r,
        diag.reshape(t_dim, nz, -1), src.reshape(t_dim, nz, -1),
        (0.0, YEAR), n_steps, block_rows=8, interpret=True,
    )
    y_dev = jax.device_put(
        jnp.asarray(y0),
        NamedSharding(
            Mesh(np.asarray(jax.devices("cpu")[:2]), ("space",)),
            P(None, None, "space", None),
        ),
    )
    got_nc = np.asarray(fn_nc(y_dev))
    assert np.abs(got_nc[1] - expected[1]).max() > 1e-3 * scale


def test_sharded_year_stream_guards():
    """loud refusals of the streaming-year builder: halo deeper than the
    shard slab, seasonal with multi-step sweeps, seasonal with too-coarse
    steps, the space_x mesh axis, and stencil+seasonal"""
    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        build_sharded_transport3d_year_stream,
    )

    nz, nlat, nlon = 4, 16, 6
    circ = synthetic.gen_circulation(nz, nlat, nlon)
    coef = build_transport3d(
        circ["mask"], circ["dz"], circ["TAREA"], uet=circ["UET"],
        vnt=circ["VNT"], wtt=circ["WTT"],
    )
    kv, dz_r = vmix_vertical_coeff(circ["VDC"], circ["dz"])
    kv = mask_vmix_coeff(kv, circ["mask"])
    mesh2 = Mesh(np.asarray(jax.devices("cpu")[:2]), ("space",))

    # k=3 needs a 16-row halo; the 8-row per-shard slab cannot host it
    with pytest.raises(ValueError, match="halo depth"):
        build_sharded_transport3d_year_stream(
            mesh2, coef, kv, dz_r, None, None, (0.0, YEAR), 480,
            block_rows=8, steps_per_sweep=3, t_dim=1, interpret=True,
        )

    circ_s = synthetic.gen_circulation(nz, nlat, nlon, n_seasons=4)
    coef_s = build_transport3d(
        circ_s["mask"], circ_s["dz"], circ_s["TAREA"], uet=circ_s["UET"],
        vnt=circ_s["VNT"], wtt=circ_s["WTT"],
    )
    kv_s, _dz = vmix_vertical_coeff(circ_s["VDC"], circ_s["dz"])
    kv_s = mask_vmix_coeff(kv_s, circ_s["mask"])
    with pytest.raises(ValueError, match="steps_per_sweep=1"):
        build_sharded_transport3d_year_stream(
            mesh2, coef_s, kv_s, dz_r, None, None, (0.0, YEAR), 480,
            block_rows=8, steps_per_sweep=2, t_dim=1, interpret=True,
        )
    with pytest.raises(ValueError, match="period/n_time"):
        build_sharded_transport3d_year_stream(
            mesh2, coef_s, kv_s, dz_r, None, None, (0.0, YEAR), 3,
            block_rows=8, t_dim=1, interpret=True,
        )
    with pytest.raises(ValueError, match="STEADY"):
        build_sharded_transport3d_year_stream(
            mesh2, coef_s, kv_s, dz_r, None, None, (0.0, YEAR), 480,
            block_rows=8, t_dim=1, stencil=True, interpret=True,
        )

    devices = np.asarray(jax.devices("cpu")[:4]).reshape(1, 2, 2)
    mesh_x = Mesh(devices, ("module", "space", "space_x"))
    with pytest.raises(ValueError, match="space_x"):
        build_sharded_transport3d_year_stream(
            mesh_x, coef, kv, dz_r, None, None, (0.0, YEAR), 480,
            block_rows=8, t_dim=1, interpret=True,
        )

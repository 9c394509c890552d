"""whole-year 3D-transport pallas megakernel vs the XLA-scan reference.

Interpret-mode (CPU) equality: the kernel must reproduce the float64
imex_year + transport_tend integration to the float32 discretization
level (~1e-5 of the state; Kahan accumulation keeps the year-end error
near the single-step level) -- for steady AND seasonal (monthly-mean)
circulation, where the megakernel streams month slabs from HBM through
a 3-slab VMEM residency ring.  Guards: VMEM-oversized grids and
seasonal steps coarser than one coefficient interval raise instead of
silently falling over.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newton_krylov_ooc_tpu.models.irf_offline import synthetic
from newton_krylov_ooc_tpu.ops.imex import imex_year
from newton_krylov_ooc_tpu.ops.transport3d import (
    build_transport3d,
    mask_vmix_coeff,
    transport_tend,
    vmix_vertical_coeff,
)
from newton_krylov_ooc_tpu.ops.transport3d_pallas import (
    build_transport3d_year_pallas,
)

NZ, NLAT, NLON, T_DIM = 4, 8, 6, 2
YEAR = 365.0 * 86400.0
N_STEPS = 480  # inside the synthetic circulation's explicit bound


@pytest.fixture(scope="module")
def problem():
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
    return circ, coef, kv, dz_r, diag, src, y0, wet


def _scan_reference(coef, kv, dz_r, diag, src, y0, couple=None, wet=None):
    """float64 imex_year ground truth, optionally with the gas-exchange
    coupling in the explicit tendency"""
    src2 = jnp.asarray(src.reshape(T_DIM, NZ, NLAT * NLON))
    if couple is not None:
        wet_surf = wet[0].reshape(-1)
        couple_j = jnp.asarray(couple)

    def tend(t, y):
        y3 = y.reshape(y.shape[:-1] + (NLAT, NLON))
        out = transport_tend(coef, y3).reshape(y.shape) + src2
        if couple is not None:
            sflux = wet_surf * jnp.einsum("xy,yh->xh", couple_j, y[:, 0, :])
            out = out.at[:, 0, :].add(sflux)
        return out

    return np.asarray(
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


def test_megakernel_matches_scan(problem):
    _circ, coef, kv, dz_r, diag, src, y0, wet = problem
    expected = _scan_reference(coef, kv, dz_r, diag, src, y0)
    fn = build_transport3d_year_pallas(
        coef, kv, dz_r, diag.reshape(T_DIM, NZ, -1),
        src.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS,
    )
    got = np.asarray(fn(jnp.asarray(y0), interpret=True))
    scale = np.abs(expected).max()
    # float32 single-step CN error is ~3e-6 of the state; the dynamics
    # damp rather than accumulate it (measured year-end ~1.5e-6)
    np.testing.assert_allclose(got, expected, rtol=0.0, atol=1e-5 * scale)
    assert np.abs(got * (1.0 - wet)).max() == 0.0  # land stays exactly dry


def test_megakernel_coupled_gas_exchange(problem):
    circ, coef, kv, dz_r, diag, src, y0, wet = problem
    couple = np.zeros((T_DIM, T_DIM))
    couple[1, 0] = 4.25e-3 / circ["dz"][0]
    couple[1, 1] = -2.0e-3 / circ["dz"][0]
    expected = _scan_reference(
        coef, kv, dz_r, diag, src, y0, couple=couple, wet=wet
    )
    uncoupled = _scan_reference(coef, kv, dz_r, diag, src, y0)
    scale = np.abs(expected).max()
    assert np.abs(expected[1] - uncoupled[1]).max() > 1e-6 * scale

    fn = build_transport3d_year_pallas(
        coef, kv, dz_r, diag.reshape(T_DIM, NZ, -1),
        src.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS, couple=couple,
    )
    got = np.asarray(fn(jnp.asarray(y0), interpret=True))
    np.testing.assert_allclose(got, expected, rtol=0.0, atol=1e-5 * scale)


def test_kernel_pallas_solve_matches_xla(problem):
    """a full Newton-Krylov spin-up through
    ShardedTransport3dKernel(use_pallas=True) lands on the same
    cyclostationary state as the XLA-scan kernel (float32 path)"""
    from jax.sharding import Mesh

    from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore
    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        ShardedTransport3dKernel,
    )

    circ = problem[0]
    specs = [[{"name": "DYE", "source_per_year": 0.1,
               "sink_rate_per_year": 0.5,
               "surf_restore_pv_cm_s": 5.0e-3}]]
    mesh = Mesh(np.asarray(jax.devices("cpu")[:1]), ("space",))
    results = []
    for use_pallas in (False, True):
        kernel = ShardedTransport3dKernel(
            mesh, circ, specs, n_steps=N_STEPS, dtype=jnp.float32,
            use_pallas=use_pallas, pallas_interpret=use_pallas,
        )
        solver = NewtonKrylovInCore(
            kernel,
            newton_rel_tol=1e-5,
            krylov_rel_tol=1e-2,
            newton_max_iter=4,
            krylov_max_dim=12,
            jit_gmres=True,
        )
        x, _fcn, info = solver.solve(kernel.init_iterate())
        rel = np.asarray(info["fcn_norm"]) / np.asarray(info["x_norm"])
        assert (rel < 1e-5).all()
        results.append(np.asarray(x))
    scale = np.abs(results[0]).max()
    # both solvers drive the residual under 1e-5; the iterates agree to
    # that same level (different f32 rounding paths, same math)
    np.testing.assert_allclose(
        results[1], results[0], rtol=0.0, atol=3e-5 * scale
    )


def test_kernel_pallas_seasonal_fcn_matches_xla(seasonal_problem):
    """through the kernel interface: comp_fcn with a SEASONAL circulation
    agrees between the pallas megakernel and the shard_map scan year"""
    from jax.sharding import Mesh

    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        ShardedTransport3dKernel,
    )

    circ = seasonal_problem[0]
    specs = [[{"name": "DYE", "source_per_year": 0.1,
               "sink_rate_per_year": 0.5,
               "surf_restore_pv_cm_s": 5.0e-3}]]
    mesh = Mesh(np.asarray(jax.devices("cpu")[:1]), ("space",))
    outs = []
    for use_pallas in (False, True):
        kernel = ShardedTransport3dKernel(
            mesh, circ, specs, n_steps=N_STEPS, dtype=jnp.float32,
            use_pallas=use_pallas, pallas_interpret=use_pallas,
        )
        x0 = kernel.init_iterate()
        outs.append(np.asarray(kernel.comp_fcn(x0)))
    scale = max(np.abs(outs[0]).max(), 1e-30)
    np.testing.assert_allclose(outs[1], outs[0], rtol=0.0, atol=2e-5 * scale)


def test_kernel_pallas_per_module_split(problem, monkeypatch):
    """when the FAMILY tracer batch overflows the megakernel's VMEM
    budget but one module fits, the kernel splits into per-module
    megakernels (couple is block-diagonal) and matches the scan year"""
    from jax.sharding import Mesh

    from newton_krylov_ooc_tpu.ops import transport3d_pallas as t3p
    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        ShardedTransport3dKernel,
    )

    circ = problem[0]
    specs = [
        [{"name": "DYE_A", "source_per_year": 0.1,
          "sink_rate_per_year": 0.5, "surf_restore_pv_cm_s": 5.0e-3}],
        [{"name": "DYE_B", "sink_rate_per_year": 0.2,
          "surf_restore_pv_cm_s": 2.0e-3}],
    ]
    # pin the cap between the one-module and two-module footprints so the
    # family build raises and the per-module split engages
    from newton_krylov_ooc_tpu.ops.transport3d import UPWIND3_SELECTOR_KEYS

    coef = problem[1]
    n_coef = sum(
        1
        for k, arr in coef.items()
        if arr is not None and k not in UPWIND3_SELECTOR_KEYS
    )
    est1 = t3p._estimate_vmem(NZ, NLAT, NLON, 1, n_coef)
    est2 = t3p._estimate_vmem(NZ, NLAT, NLON, 2, n_coef)
    assert est1 < est2
    monkeypatch.setattr(t3p, "_VMEM_CAP", (est1 + est2) // 2)

    mesh = Mesh(np.asarray(jax.devices("cpu")[:1]), ("space",))
    outs = []
    for use_pallas in (False, True):
        kernel = ShardedTransport3dKernel(
            mesh, circ, specs, n_steps=N_STEPS, dtype=jnp.float32,
            use_pallas=use_pallas, pallas_interpret=use_pallas,
        )
        x0 = kernel.init_iterate()
        outs.append(np.asarray(kernel.comp_fcn(x0)))
    scale = max(np.abs(outs[0]).max(), 1e-30)
    np.testing.assert_allclose(outs[1], outs[0], rtol=0.0, atol=2e-5 * scale)

    # and a batch that overflows even per-module still raises
    monkeypatch.setattr(t3p, "_VMEM_CAP", est1 - 1)
    with pytest.raises(ValueError, match="VMEM"):
        ShardedTransport3dKernel(
            mesh, circ, specs, n_steps=N_STEPS, dtype=jnp.float32,
            use_pallas=True,
        )


def test_kernel_pallas_rejects_multi_device(problem):
    from jax.sharding import Mesh

    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        ShardedTransport3dKernel,
    )

    circ = problem[0]
    specs = [[{"name": "DYE", "sink_rate_per_year": 0.5}]]
    mesh = Mesh(np.asarray(jax.devices("cpu")[:2]), ("space",))
    with pytest.raises(ValueError, match="single-device"):
        ShardedTransport3dKernel(
            mesh, circ, specs, n_steps=N_STEPS, dtype=jnp.float32,
            use_pallas=True,
        )


@pytest.fixture(scope="module")
def seasonal_problem():
    mask = np.ones((NZ, NLAT, NLON), np.int32)
    mask[:, 3, 2] = 0
    circ = synthetic.gen_circulation(NZ, NLAT, NLON, mask=mask, n_seasons=4)
    assert synthetic.stable_steps_per_year(circ) <= N_STEPS
    coef = build_transport3d(
        circ["mask"], circ["dz"], circ["TAREA"], uet=circ["UET"],
        vnt=circ["VNT"], wtt=circ["WTT"], hdiff_e=circ["HDIFF_E"],
        hdiff_n=circ["HDIFF_N"],
    )
    kv, dz_r = vmix_vertical_coeff(circ["VDC"], circ["dz"])
    kv = mask_vmix_coeff(kv, circ["mask"])
    rng = np.random.default_rng(11)
    wet = (mask > 0).astype(np.float64)
    diag = -rng.uniform(0.0, 1.0e-7, (T_DIM, NZ, NLAT, NLON)) * wet
    src = rng.uniform(0.0, 1.0e-8, (T_DIM, NZ, NLAT, NLON)) * wet
    y0 = rng.uniform(0.0, 1.0, (T_DIM, NZ, NLAT, NLON)) * wet
    return circ, coef, kv, dz_r, diag, src, y0, wet


def _scan_reference_seasonal(coef, kv, dz_r, diag, src, y0):
    """float64 imex_year ground truth with seasonal circulation/mixing:
    coefficients sampled by periodic midpoint interpolation at the exact
    times the integrator passes (the megakernel must reproduce this)"""
    from newton_krylov_ooc_tpu.ops.transport3d import (
        interp_month,
        interp_transport_coef,
    )

    src2 = jnp.asarray(src.reshape(T_DIM, NZ, NLAT * NLON))

    def tend(t, y):
        c_t = interp_transport_coef(coef, jnp.mod(t / YEAR, 1.0))
        y3 = y.reshape(y.shape[:-1] + (NLAT, NLON))
        return transport_tend(c_t, y3).reshape(y.shape) + src2

    kv_j = jnp.asarray(kv)
    if kv_j.ndim == 3:
        vert_coeff = lambda t: interp_month(kv_j, jnp.mod(t / YEAR, 1.0))
    else:
        vert_coeff = lambda t: kv_j
    return np.asarray(
        imex_year(
            tend,
            vert_coeff,
            jnp.asarray(diag.reshape(T_DIM, NZ, NLAT * NLON)),
            dz_r,
            jnp.asarray(y0.reshape(T_DIM, NZ, NLAT * NLON)),
            (0.0, YEAR),
            N_STEPS,
        )
    ).reshape(T_DIM, NZ, NLAT, NLON)


def test_megakernel_seasonal_matches_scan(seasonal_problem):
    """monthly circulation AND monthly vertical mixing: the HBM-resident
    month stacks + 3-slab VMEM ring reproduce the scan's interpolated
    year to the float32 discretization level"""
    _circ, coef, kv, dz_r, diag, src, y0, wet = seasonal_problem
    expected = _scan_reference_seasonal(coef, kv, dz_r, diag, src, y0)
    fn = build_transport3d_year_pallas(
        coef, kv, dz_r, diag.reshape(T_DIM, NZ, -1),
        src.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS,
    )
    got = np.asarray(fn(jnp.asarray(y0), interpret=True))
    scale = np.abs(expected).max()
    np.testing.assert_allclose(got, expected, rtol=0.0, atol=1e-5 * scale)
    assert np.abs(got * (1.0 - wet)).max() == 0.0

    # the seasonal cycle must actually matter: the annual-mean-coefficient
    # year differs from the seasonal year well above the comparison tol
    from newton_krylov_ooc_tpu.ops.transport3d import mean_transport_coef

    steady = _scan_reference(
        mean_transport_coef(coef), jnp.asarray(kv).mean(axis=0), dz_r,
        diag, src, y0,
    )
    assert np.abs(steady - expected).max() > 1e-4 * scale


def test_megakernel_seasonal_steady_kv(seasonal_problem):
    """seasonal faces with STEADY vertical mixing (mixed case): only the
    face fields ride the DMA ring, the CN bands stay VMEM-resident"""
    _circ, coef, kv, dz_r, diag, src, y0, _wet = seasonal_problem
    kv0 = np.asarray(kv)[0]
    expected = _scan_reference_seasonal(coef, kv0, dz_r, diag, src, y0)
    fn = build_transport3d_year_pallas(
        coef, kv0, dz_r, diag.reshape(T_DIM, NZ, -1),
        src.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS,
    )
    got = np.asarray(fn(jnp.asarray(y0), interpret=True))
    scale = np.abs(expected).max()
    np.testing.assert_allclose(got, expected, rtol=0.0, atol=1e-5 * scale)


def test_megakernel_seasonal_rejects_coarse_steps(seasonal_problem):
    """steps longer than one coefficient interval would outrun the
    3-slab residency ring: refuse instead of interpolating stale months"""
    _circ, coef, kv, dz_r, diag, _src, _y0, _wet = seasonal_problem
    with pytest.raises(ValueError, match="seasonal"):
        build_transport3d_year_pallas(
            coef, kv, dz_r, diag.reshape(T_DIM, NZ, -1),
            diag.reshape(T_DIM, NZ, -1), (0.0, YEAR), 3,
        )


def test_megakernel_rejects_oversized_grid(problem):
    """a grid past the VMEM budget raises with a pointer at the sharded
    path instead of failing inside the compiler"""
    circ, coef, kv, dz_r, diag, src, _y0, _wet = problem
    # the tiny test grid tiles to a tracer batch far past the VMEM budget
    big = np.tile(diag.reshape(T_DIM, NZ, -1), (512, 1, 1))
    with pytest.raises(ValueError, match="VMEM"):
        build_transport3d_year_pallas(
            coef, kv, dz_r, big, big, (0.0, YEAR), 16
        )


# -- HBM-streaming year kernel (transport3d_stream_pallas) ----------------


def test_stream_kernel_matches_scan(problem):
    """the streaming (HBM ping-pong + latitude-block window) year must
    reproduce the float64 scan year to the float32 discretization level,
    across a block size that tiles nlat unevenly (forcing dry padding)"""
    from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
        build_transport3d_year_stream,
    )

    _circ, coef, kv, dz_r, diag, src, y0, wet = problem
    expected = _scan_reference(coef, kv, dz_r, diag, src, y0)
    scale = np.abs(expected).max()
    by_k = {}
    for block_rows, prefetch, k in (
        (8, False, 1), (16, False, 1), (8, True, 1), (8, False, 2),
        (16, True, 2), (8, False, 4),
    ):
        fn = build_transport3d_year_stream(
            coef, kv, dz_r, diag.reshape(T_DIM, NZ, -1),
            src.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS,
            block_rows=block_rows, prefetch=prefetch, steps_per_sweep=k,
        )
        got = np.asarray(fn(jnp.asarray(y0), interpret=True))
        np.testing.assert_allclose(
            got, expected, rtol=0.0, atol=1e-5 * scale
        )
        assert np.abs(got * (1.0 - wet)).max() == 0.0
        # the documented invariant is BITWISE block-size independence:
        # every window row's update is the identical arithmetic its
        # owning block applies (this is what caught the k=2 comp-buffer
        # same-sweep overwrite hazard the loose scan tolerance missed)
        if k in by_k:
            np.testing.assert_array_equal(got, by_k[k])
        by_k[k] = got


def test_stream_kernel_coupled(problem):
    """surface gas-exchange coupling rides the streaming kernel too"""
    from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
        build_transport3d_year_stream,
    )

    circ, coef, kv, dz_r, diag, src, y0, wet = problem
    couple = np.zeros((T_DIM, T_DIM))
    couple[1, 0] = 4.25e-3 / circ["dz"][0]
    couple[1, 1] = -2.0e-3 / circ["dz"][0]
    expected = _scan_reference(
        coef, kv, dz_r, diag, src, y0, couple=couple, wet=wet
    )
    fn = build_transport3d_year_stream(
        coef, kv, dz_r, diag.reshape(T_DIM, NZ, -1),
        src.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS, couple=couple,
    )
    got = np.asarray(fn(jnp.asarray(y0), interpret=True))
    scale = np.abs(expected).max()
    np.testing.assert_allclose(got, expected, rtol=0.0, atol=1e-5 * scale)


def test_stream_kernel_shed_fields(problem):
    """the bandwidth sheds -- factored recip_vol, dropped diag/src
    streams, interior-only CN bands -- reproduce the scan year"""
    from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
        build_transport3d_year_stream,
    )

    circ, coef, kv, dz_r, diag, src, y0, wet = problem
    zeros = np.zeros_like(diag)
    expected = _scan_reference(coef, kv, dz_r, zeros, zeros, y0)
    scale = np.abs(expected).max()
    recip_area = 1.0 / np.asarray(circ["TAREA"])
    recip_dz = 1.0 / np.asarray(circ["dz"])
    for k in (1, 2):
        fn = build_transport3d_year_stream(
            coef, kv, dz_r, None, None, (0.0, YEAR), N_STEPS,
            steps_per_sweep=k, recip_area=recip_area, recip_dz=recip_dz,
            t_dim=T_DIM,
        )
        got = np.asarray(fn(jnp.asarray(y0), interpret=True))
        np.testing.assert_allclose(
            got, expected, rtol=0.0, atol=1e-5 * scale
        )
    # all-zero diag/src arrays shed the same streams as None
    fn = build_transport3d_year_stream(
        coef, kv, dz_r, zeros.reshape(T_DIM, NZ, -1),
        zeros.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS,
        recip_area=recip_area, recip_dz=recip_dz,
    )
    got = np.asarray(fn(jnp.asarray(y0), interpret=True))
    np.testing.assert_allclose(got, expected, rtol=0.0, atol=1e-5 * scale)
    # factor consistency is checked, not trusted
    with pytest.raises(ValueError, match="factor"):
        build_transport3d_year_stream(
            coef, kv, dz_r, None, None, (0.0, YEAR), N_STEPS,
            recip_area=1.1 * recip_area, recip_dz=recip_dz, t_dim=T_DIM,
        )
    with pytest.raises(ValueError, match="t_dim"):
        build_transport3d_year_stream(
            coef, kv, dz_r, None, None, (0.0, YEAR), N_STEPS
        )


def test_stream_kernel_seasonal_matches_scan(seasonal_problem):
    """monthly circulation AND monthly vertical mixing stream through
    per-block 3-month windows; the blend must reproduce the scan's
    periodic midpoint interpolation (the gx1-class seasonal year the
    reference's annual-mean-only setup cannot express)"""
    from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
        build_transport3d_year_stream,
    )

    circ, coef, kv, dz_r, diag, src, y0, wet = seasonal_problem
    expected = _scan_reference_seasonal(coef, kv, dz_r, diag, src, y0)
    scale = np.abs(expected).max()
    recip_area = 1.0 / np.asarray(circ["TAREA"])
    recip_dz = 1.0 / np.asarray(circ["dz"])
    for block_rows, sheds in ((8, False), (16, True)):
        fn = build_transport3d_year_stream(
            coef, kv, dz_r, diag.reshape(T_DIM, NZ, -1),
            src.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS,
            block_rows=block_rows,
            recip_area=recip_area if sheds else None,
            recip_dz=recip_dz if sheds else None,
        )
        got = np.asarray(fn(jnp.asarray(y0), interpret=True))
        np.testing.assert_allclose(
            got, expected, rtol=0.0, atol=1e-5 * scale
        )
        assert np.abs(got * (1.0 - wet)).max() == 0.0


def test_stream_kernel_seasonal_steady_kv(seasonal_problem):
    """seasonal faces with STEADY vertical mixing through the STREAM
    kernel (the bench's gx1 seasonal workload): the month windows ride
    the per-block 3-month DMA while the CN bands are rebuilt in-kernel
    from the single streamed kv window and the resident dz_r column"""
    from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
        build_transport3d_year_stream,
    )

    circ, coef, kv, dz_r, diag, src, y0, wet = seasonal_problem
    kv0 = np.asarray(kv)[0]
    expected = _scan_reference_seasonal(coef, kv0, dz_r, diag, src, y0)
    scale = np.abs(expected).max()
    fn = build_transport3d_year_stream(
        coef, kv0, dz_r, diag.reshape(T_DIM, NZ, -1),
        src.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS,
        recip_area=1.0 / np.asarray(circ["TAREA"]),
        recip_dz=1.0 / np.asarray(circ["dz"]),
    )
    got = np.asarray(fn(jnp.asarray(y0), interpret=True))
    np.testing.assert_allclose(got, expected, rtol=0.0, atol=1e-5 * scale)
    assert np.abs(got * (1.0 - wet)).max() == 0.0


def test_stream_kernel_seasonal_guards(seasonal_problem):
    from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
        build_transport3d_year_stream,
    )

    _circ, coef, kv, dz_r, diag, _src, _y0, _wet = seasonal_problem
    with pytest.raises(ValueError, match="steps_per_sweep"):
        build_transport3d_year_stream(
            coef, kv, dz_r, diag.reshape(T_DIM, NZ, -1),
            diag.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS,
            steps_per_sweep=2,
        )
    with pytest.raises(ValueError, match="dt <= period/n_time"):
        build_transport3d_year_stream(
            coef, kv, dz_r, diag.reshape(T_DIM, NZ, -1),
            diag.reshape(T_DIM, NZ, -1), (0.0, YEAR), 2,
        )


def test_stream_kernel_deep_sweeps_multiblock():
    """steps_per_sweep=4 (16-row halo) on a grid tall enough for several
    latitude blocks: matches the scan AND is bitwise block-size
    independent (the multi-step halo updates must be the identical
    arithmetic the owning block applies to the same rows)"""
    from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
        build_transport3d_year_stream,
    )

    nz, nlat, nlon = 3, 24, 6
    mask = np.ones((nz, nlat, nlon), np.int32)
    mask[:, 7, 2] = 0
    mask[1:, 15, 4] = 0
    circ = synthetic.gen_circulation(nz, nlat, nlon, mask=mask)
    n_steps = max(32, synthetic.stable_steps_per_year(circ))
    n_steps += (-n_steps) % 4
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
    diag = -rng.uniform(0.0, 1.0e-7, (t_dim, nz, nlat, nlon)) * wet
    src = rng.uniform(0.0, 1.0e-8, (t_dim, nz, nlat, nlon)) * wet
    y0 = rng.uniform(0.0, 1.0, (t_dim, nz, nlat, nlon)) * wet

    src2 = jnp.asarray(src.reshape(t_dim, nz, nlat * nlon))
    diag2 = jnp.asarray(diag.reshape(t_dim, nz, nlat * nlon))
    kv_j = jnp.asarray(kv)
    coef64 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float64), coef
    )

    def tend(t, y):
        flat = transport_tend(
            coef64, y.reshape(t_dim, nz, nlat, nlon)
        ).reshape(t_dim, nz, nlat * nlon)
        return flat + src2

    expected = np.asarray(
        imex_year(
            tend, lambda t: kv_j, diag2,
            jnp.asarray(np.asarray(dz_r)),
            jnp.asarray(y0.reshape(t_dim, nz, nlat * nlon)),
            (0.0, YEAR), n_steps,
        )
    ).reshape(t_dim, nz, nlat, nlon)
    scale = np.abs(expected).max()

    outs = []
    for block_rows in (8, 24):
        fn = build_transport3d_year_stream(
            coef, kv, dz_r, diag.reshape(t_dim, nz, -1),
            src.reshape(t_dim, nz, -1), (0.0, YEAR), n_steps,
            block_rows=block_rows, steps_per_sweep=4,
        )
        got = np.asarray(fn(jnp.asarray(y0), interpret=True))
        np.testing.assert_allclose(
            got, expected, rtol=0.0, atol=1e-5 * scale
        )
        assert np.abs(got * (1.0 - wet)).max() == 0.0
        outs.append(got)
    np.testing.assert_array_equal(outs[0], outs[1])


def test_stream_kernel_pipelined_schedule():
    """the double-buffered pipelined DMA schedule (prefetch=True on a
    grid with n_blocks >= ceil(halo/block_rows) + 2) must actually
    ENGAGE (fn.pipelined) and produce bitwise-identical results to the
    serial schedule -- the two orderings run the same arithmetic on the
    same rows, only the DMA overlap differs"""
    from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
        build_transport3d_year_stream,
    )

    nz, nlat, nlon = 3, 32, 6
    mask = np.ones((nz, nlat, nlon), np.int32)
    mask[:, 9, 1] = 0
    mask[1:, 21, 3] = 0
    circ = synthetic.gen_circulation(nz, nlat, nlon, mask=mask)
    n_steps = max(32, synthetic.stable_steps_per_year(circ))
    n_steps += (-n_steps) % 2
    coef = build_transport3d(
        circ["mask"], circ["dz"], circ["TAREA"], uet=circ["UET"],
        vnt=circ["VNT"], wtt=circ["WTT"], hdiff_e=circ["HDIFF_E"],
        hdiff_n=circ["HDIFF_N"],
    )
    kv, dz_r = vmix_vertical_coeff(circ["VDC"], circ["dz"])
    kv = mask_vmix_coeff(kv, circ["mask"])
    rng = np.random.default_rng(13)
    wet = (mask > 0).astype(np.float64)
    t_dim = 2
    diag = -rng.uniform(0.0, 1.0e-7, (t_dim, nz, nlat, nlon)) * wet
    src = rng.uniform(0.0, 1.0e-8, (t_dim, nz, nlat, nlon)) * wet
    y0 = rng.uniform(0.0, 1.0, (t_dim, nz, nlat, nlon)) * wet

    src2 = jnp.asarray(src.reshape(t_dim, nz, nlat * nlon))
    diag2 = jnp.asarray(diag.reshape(t_dim, nz, nlat * nlon))
    kv_j = jnp.asarray(kv)
    coef64 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float64), coef
    )

    def tend(t, y):
        flat = transport_tend(
            coef64, y.reshape(t_dim, nz, nlat, nlon)
        ).reshape(t_dim, nz, nlat * nlon)
        return flat + src2

    expected = np.asarray(
        imex_year(
            tend, lambda t: kv_j, diag2,
            jnp.asarray(np.asarray(dz_r)),
            jnp.asarray(y0.reshape(t_dim, nz, nlat * nlon)),
            (0.0, YEAR), n_steps,
        )
    ).reshape(t_dim, nz, nlat, nlon)
    scale = np.abs(expected).max()

    # k=1: halo 4, 4 blocks of 8 -> pipelined; k=2: halo 8, still >= 3
    for k in (1, 2):
        serial = build_transport3d_year_stream(
            coef, kv, dz_r, diag.reshape(t_dim, nz, -1),
            src.reshape(t_dim, nz, -1), (0.0, YEAR), n_steps,
            block_rows=8, prefetch=False, steps_per_sweep=k,
        )
        piped = build_transport3d_year_stream(
            coef, kv, dz_r, diag.reshape(t_dim, nz, -1),
            src.reshape(t_dim, nz, -1), (0.0, YEAR), n_steps,
            block_rows=8, prefetch=True, steps_per_sweep=k,
        )
        assert not serial.pipelined
        assert piped.pipelined
        got_s = np.asarray(serial(jnp.asarray(y0), interpret=True))
        got_p = np.asarray(piped(jnp.asarray(y0), interpret=True))
        np.testing.assert_allclose(
            got_s, expected, rtol=0.0, atol=1e-5 * scale
        )
        np.testing.assert_array_equal(got_p, got_s)
        assert np.abs(got_p * (1.0 - wet)).max() == 0.0

    # below the safe block count the build falls back to serial
    small = build_transport3d_year_stream(
        coef, kv, dz_r, diag.reshape(t_dim, nz, -1),
        src.reshape(t_dim, nz, -1), (0.0, YEAR), n_steps,
        block_rows=16, prefetch=True, steps_per_sweep=2,
    )
    assert not small.pipelined


def test_stream_kernel_factored_rates(problem):
    """assemble_rate_fields-form diag/src (a_t*wet + b_t*wet_surf, the
    form every family solve produces) shed their dense streams: the
    kernel rebuilds them from the resident wet window -- the scalars
    ride the instruction stream, not HBM"""
    from newton_krylov_ooc_tpu.ops.transport3d import assemble_rate_fields
    from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
        build_transport3d_year_stream,
    )

    circ, coef, kv, dz_r, _diag, _src, y0, wet = problem
    specs = [
        {"name": "a", "sink_rate_per_year": 0.02,
         "surf_restore_pv_cm_s": 2.0e-4, "surf_restore_target": 1.0},
        {"name": "b", "source_per_year": 1.0e-3},
    ]
    diag, src, couple = assemble_rate_fields(
        specs, wet.reshape(NZ, -1), float(circ["dz"][0]), YEAR
    )
    assert couple is None
    diag4 = diag.reshape(T_DIM, NZ, NLAT, NLON)
    src4 = src.reshape(T_DIM, NZ, NLAT, NLON)
    expected = _scan_reference(coef, kv, dz_r, diag4, src4, y0)
    scale = np.abs(expected).max()
    fac = build_transport3d_year_stream(
        coef, kv, dz_r, diag, src, (0.0, YEAR), N_STEPS
    )
    dense = build_transport3d_year_stream(
        coef, kv, dz_r, diag, src, (0.0, YEAR), N_STEPS,
        factor_rates=False,
    )
    assert not fac.stream_diag and not fac.stream_src
    assert dense.stream_diag and dense.stream_src
    got = np.asarray(fac(jnp.asarray(y0), interpret=True))
    got_dense = np.asarray(dense(jnp.asarray(y0), interpret=True))
    np.testing.assert_allclose(got, expected, rtol=0.0, atol=1e-5 * scale)
    # the rebuild reproduces the dense stream to the last float32 ulp of
    # the surface restore row; interior rows are the identical product
    np.testing.assert_allclose(
        got, got_dense, rtol=0.0, atol=1e-6 * scale
    )
    assert np.abs(got * (1.0 - wet)).max() == 0.0
    # a field NOT of the factored form keeps its dense stream
    rng = np.random.default_rng(3)
    messy = -rng.uniform(0.0, 1e-7, diag4.shape) * wet
    fn = build_transport3d_year_stream(
        coef, kv, dz_r, messy.reshape(T_DIM, NZ, -1), src,
        (0.0, YEAR), N_STEPS,
    )
    assert fn.stream_diag and not fn.stream_src


def test_stream_kernel_family_chunked(problem):
    """a wide tracer family (the multi-module gx1 stream) rides one
    coefficient-window residency; per-tracer stencil arithmetic is
    elementwise-independent and the cross-tracer surface coupling is
    applied family-wide in the same order for every tend_chunk, so
    chunkings agree to compiler instruction-fusion roundoff (bitwise
    when no coupling forces cross-chunk fusion differences)"""
    from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
        build_transport3d_year_stream,
    )

    circ, coef, kv, dz_r, _diag, _src, _y0, wet = problem
    t_dim = 5
    rng = np.random.default_rng(21)
    diag = -rng.uniform(0.0, 1.0e-7, (t_dim, NZ, NLAT, NLON)) * wet
    src = rng.uniform(0.0, 1.0e-8, (t_dim, NZ, NLAT, NLON)) * wet
    y0 = rng.uniform(0.0, 1.0, (t_dim, NZ, NLAT, NLON)) * wet
    couple = np.zeros((t_dim, t_dim))
    couple[1, 0] = 4.25e-3 / circ["dz"][0]
    couple[1, 1] = -2.0e-3 / circ["dz"][0]
    couple[3, 4] = 1.5e-3 / circ["dz"][0]

    src2 = jnp.asarray(src.reshape(t_dim, NZ, NLAT * NLON))
    wet_surf = jnp.asarray(wet[0].reshape(-1))
    couple_j = jnp.asarray(couple)

    def tend(t, y):
        y3 = y.reshape(y.shape[:-1] + (NLAT, NLON))
        out = transport_tend(coef, y3).reshape(y.shape) + src2
        sflux = wet_surf * jnp.einsum("xy,yh->xh", couple_j, y[:, 0, :])
        return out.at[:, 0, :].add(sflux)

    expected = np.asarray(
        imex_year(
            tend, lambda t: kv,
            jnp.asarray(diag.reshape(t_dim, NZ, NLAT * NLON)),
            dz_r, jnp.asarray(y0.reshape(t_dim, NZ, NLAT * NLON)),
            (0.0, YEAR), N_STEPS,
        )
    ).reshape(t_dim, NZ, NLAT, NLON)
    scale = np.abs(expected).max()

    outs = {}
    for chunk in (1, 2, 5):
        fn = build_transport3d_year_stream(
            coef, kv, dz_r, diag.reshape(t_dim, NZ, -1),
            src.reshape(t_dim, NZ, -1), (0.0, YEAR), N_STEPS,
            couple=couple, tend_chunk=chunk,
        )
        assert fn.tend_chunk == chunk
        outs[chunk] = np.asarray(fn(jnp.asarray(y0), interpret=True))
        np.testing.assert_allclose(
            outs[chunk], expected, rtol=0.0, atol=1e-5 * scale
        )
        assert np.abs(outs[chunk] * (1.0 - wet)).max() == 0.0
    # ulp-level across chunkings (measured ~2e-6 relative after a year:
    # XLA contracts multiply-adds differently for different chunk
    # shapes, here and in the coupling path; the arithmetic itself is
    # chunking-invariant)
    np.testing.assert_allclose(
        outs[1], outs[2], rtol=0.0, atol=3e-6 * scale
    )
    np.testing.assert_allclose(
        outs[1], outs[5], rtol=0.0, atol=3e-6 * scale
    )
    # default chunking for a wide family is per-tracer
    fn = build_transport3d_year_stream(
        coef, kv, dz_r, diag.reshape(t_dim, NZ, -1),
        src.reshape(t_dim, NZ, -1), (0.0, YEAR), N_STEPS,
    )
    assert fn.tend_chunk == 1
    with pytest.raises(ValueError, match="tend_chunk"):
        build_transport3d_year_stream(
            coef, kv, dz_r, diag.reshape(t_dim, NZ, -1),
            src.reshape(t_dim, NZ, -1), (0.0, YEAR), N_STEPS,
            tend_chunk=7,
        )


def test_plan_stream():
    """the planner picks a VMEM-feasible config; its estimate matches
    what the builder charges; infeasible budgets raise the typed error"""
    from newton_krylov_ooc_tpu.ops.transport3d_pallas import VmemBudgetError
    from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
        plan_stream, stream_vmem_bytes,
    )

    # gx1-shaped single module: must fit the default (compile-service)
    # cap -- 64 MiB until the remote-compile envelope lifts
    cfg = plan_stream(60, 384, 320, 1, 5840)
    assert set(cfg) == {"block_rows", "steps_per_sweep", "prefetch"}
    assert stream_vmem_bytes(60, 384, 320, 1, **cfg) <= 64 << 20
    assert 5840 % cfg["steps_per_sweep"] == 0
    # a 4-module family still plans (narrower blocks / chunked tend)
    cfg4 = plan_stream(60, 384, 320, 4, 5840)
    assert stream_vmem_bytes(60, 384, 320, 4, **cfg4) <= 64 << 20
    # a 6-module family no longer fits the compile envelope (callers
    # split the family); the generous physical cap still plans it
    with pytest.raises(VmemBudgetError, match="VMEM"):
        plan_stream(60, 384, 320, 6, 5840)
    cfg6 = plan_stream(60, 384, 320, 6, 5840, vmem_cap=110 << 20)
    assert stream_vmem_bytes(60, 384, 320, 6, **cfg6) <= 110 << 20
    # seasonal: steps_per_sweep pinned to 1, 3-month windows charged
    cfg_s = plan_stream(
        60, 384, 320, 1, 5840, n_seasonal=3, vmem_cap=110 << 20
    )
    assert cfg_s["steps_per_sweep"] == 1
    # nothing fits an absurd budget
    with pytest.raises(VmemBudgetError, match="VMEM"):
        plan_stream(60, 384, 320, 1, 5840, vmem_cap=1 << 20)


def test_stream_hbm_bytes_per_step():
    """the exact-traffic helper matches a hand count and the builder
    attaches the same figure for its own shed decisions"""
    from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
        stream_hbm_bytes_per_step,
    )

    # gx1 single module, k=2, b=16: halo 8, w_rows 32, rows_cn 32,
    # lanes 384, 24 blocks; per block per sweep: 6 coef windows (32) +
    # kv band window (32) + state (32) + compensation (32) in, state +
    # compensation interiors (16 each) out = 320 rows of nz*lanes*4
    # bytes, over 2 steps
    want = 24 * 320 * 60 * 384 * 4 / 2
    got = stream_hbm_bytes_per_step(
        60, 384, 320, 1, block_rows=16, steps_per_sweep=2
    )
    assert got == want

    # k=1: bands and compensation cover only the block interior
    want1 = 24 * (6 * 32 + 16 + 32 + 16 + 2 * 16) * 60 * 384 * 4
    got1 = stream_hbm_bytes_per_step(
        60, 384, 320, 1, block_rows=16, steps_per_sweep=1
    )
    assert got1 == want1


def test_stencil_coef_matches_transport_tend(problem):
    """the collapsed 13-offset operator (transport_stencil_coef /
    stencil_tend) reproduces transport_tend at float32 reassociation
    roundoff, batched and unbatched"""
    from newton_krylov_ooc_tpu.ops.transport3d import (
        STENCIL_OFFSETS,
        stencil_tend,
        transport_stencil_coef,
        transport_tend,
    )

    _circ, coef, _kv, _dz_r, _diag, _src, y0, _wet = problem
    st = transport_stencil_coef(coef)
    assert st.shape == (len(STENCIL_OFFSETS), NZ, NLAT, NLON)
    rng = np.random.default_rng(29)
    y = jnp.asarray(rng.uniform(-1.0, 1.0, (NZ, NLAT, NLON)), jnp.float32)
    t_ref = transport_tend(
        jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), coef
        ),
        y,
    )
    t_st = stencil_tend(jnp.asarray(st, jnp.float32), y)
    scale = float(jnp.abs(t_ref).max())
    assert float(jnp.abs(t_st - t_ref).max()) <= 1e-5 * scale
    yb = jnp.asarray(y0, jnp.float32)
    tb_ref = transport_tend(
        jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), coef
        ),
        yb,
    )
    tb_st = stencil_tend(jnp.asarray(st, jnp.float32), yb)
    assert float(jnp.abs(tb_st - tb_ref).max()) <= 1e-5 * scale


def test_stream_kernel_stencil_matches_scan(problem):
    """the stencil-form streaming mode (13 collapsed coefficient windows,
    13 fused multiply-adds per cell) reproduces the scan year at the
    float32 discretization level; block-size independent; coef_bf16
    degrades gracefully to the documented ~1e-3 operator-rounding level
    and refuses dense src windows"""
    from newton_krylov_ooc_tpu.ops.transport3d_pallas import (
        VmemBudgetError,
    )
    from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
        build_transport3d_year_stream,
    )

    _circ, coef, kv, dz_r, diag, src, y0, wet = problem
    expected = _scan_reference(coef, kv, dz_r, diag, src, y0)
    scale = np.abs(expected).max()
    by_k = {}
    for block_rows, k in ((8, 1), (8, 2), (16, 2)):
        fn = build_transport3d_year_stream(
            coef, kv, dz_r, diag.reshape(T_DIM, NZ, -1),
            src.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS,
            block_rows=block_rows, steps_per_sweep=k, stencil=True,
        )
        assert fn.stencil and not fn.coef_bf16
        got = np.asarray(fn(jnp.asarray(y0), interpret=True))
        # the collapsed operator reassociates the flux sums, so the
        # tolerance is wider than the upwind3 stream's 1e-5 but still
        # at the f32 discretization level
        np.testing.assert_allclose(
            got, expected, rtol=0.0, atol=5e-4 * scale
        )
        assert np.abs(got * (1.0 - wet)).max() == 0.0
        if k in by_k:
            np.testing.assert_array_equal(got, by_k[k])
        by_k[k] = got

    # bf16 coefficient streams: operator rounded to 8-bit mantissas.
    # dense src fields would ride the rounded window stack, so bf16
    # requires factorable rates
    wet64 = wet.astype(np.float64)
    diag_f = np.stack([-1.0e-8 * wet64] * T_DIM)
    src_f = np.stack([1.0e-8 * wet64] * T_DIM)
    exp_f = _scan_reference(coef, kv, dz_r, diag_f, src_f, y0)
    scale_f = np.abs(exp_f).max()
    fn16 = build_transport3d_year_stream(
        coef, kv, dz_r, diag_f.reshape(T_DIM, NZ, -1),
        src_f.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS,
        block_rows=8, steps_per_sweep=2, stencil=True, coef_bf16=True,
    )
    assert fn16.coef_bf16
    got16 = np.asarray(fn16(jnp.asarray(y0), interpret=True))
    err16 = np.abs(got16 - exp_f).max()
    assert err16 <= 2e-2 * scale_f
    assert np.abs(got16 * (1.0 - wet)).max() == 0.0

    # guards: dense src + bf16, and non-stencil bf16, refuse loudly
    with pytest.raises(ValueError, match="dense src"):
        build_transport3d_year_stream(
            coef, kv, dz_r, diag.reshape(T_DIM, NZ, -1),
            src.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS,
            block_rows=8, steps_per_sweep=2, stencil=True, coef_bf16=True,
        )
    with pytest.raises(ValueError, match="bf16"):
        build_transport3d_year_stream(
            coef, kv, dz_r, diag.reshape(T_DIM, NZ, -1),
            src.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS,
            coef_bf16=True,
        )


def test_stream_kernel_stencil_seasonal_refused(seasonal_problem):
    """stencil mode collapses a STEADY operator; seasonal circulations
    keep the upwind3 streaming path"""
    from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
        build_transport3d_year_stream,
    )

    _circ, coef, kv, dz_r, diag, src, _y0, _wet = seasonal_problem
    with pytest.raises(ValueError, match="STEADY"):
        build_transport3d_year_stream(
            coef, kv, dz_r, diag.reshape(T_DIM, NZ, -1),
            src.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS,
            stencil=True,
        )


def test_stream_hbm_bytes_builder_wiring(problem):
    """year.hbm_bytes_per_step must reflect the BUILDER's actual shed
    decisions, not just the helper formula: force dense diag/src streams
    (unfactorable fields) and check the attached figure carries their
    windows; the factored family sheds them"""
    from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
        build_transport3d_year_stream,
        stream_hbm_bytes_per_step,
    )

    _circ, coef, kv, dz_r, diag, src, y0, wet = problem
    # the fixture's diag/src are random fields -> dense streams
    fn = build_transport3d_year_stream(
        coef, kv, dz_r, diag.reshape(T_DIM, NZ, -1),
        src.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS,
        block_rows=8, steps_per_sweep=2,
    )
    assert fn.stream_diag and fn.stream_src
    assert fn.hbm_bytes_per_step == stream_hbm_bytes_per_step(
        NZ, NLAT, NLON, T_DIM, block_rows=8, steps_per_sweep=2,
        n_coef=7, stream_diag=True, stream_src=True,
    )
    # factored rates shed both dense streams -> strictly less traffic
    wet64 = wet.astype(np.float64)
    diag_f = np.stack([-1.0e-8 * wet64] * T_DIM)
    src_f = np.stack([1.0e-8 * wet64] * T_DIM)
    fn_f = build_transport3d_year_stream(
        coef, kv, dz_r, diag_f.reshape(T_DIM, NZ, -1),
        src_f.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS,
        block_rows=8, steps_per_sweep=2,
    )
    assert not fn_f.stream_diag and not fn_f.stream_src
    assert fn_f.hbm_bytes_per_step == stream_hbm_bytes_per_step(
        NZ, NLAT, NLON, T_DIM, block_rows=8, steps_per_sweep=2,
        n_coef=7, stream_diag=False, stream_src=False,
    )
    assert fn_f.hbm_bytes_per_step < fn.hbm_bytes_per_step
    # the stencil + bf16 build halves its 14 coefficient windows
    fn_sb = build_transport3d_year_stream(
        coef, kv, dz_r, diag_f.reshape(T_DIM, NZ, -1),
        src_f.reshape(T_DIM, NZ, -1), (0.0, YEAR), N_STEPS,
        block_rows=8, steps_per_sweep=2, stencil=True, coef_bf16=True,
    )
    assert fn_sb.hbm_bytes_per_step == stream_hbm_bytes_per_step(
        NZ, NLAT, NLON, T_DIM, block_rows=8, steps_per_sweep=2,
        n_coef=14, coef_bf16=True,
    )

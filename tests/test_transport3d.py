"""device 3D IRF-transport stencils vs the independent assembly spec.

The same synthetic circulation used to pin the native gen_A tool
(tests/test_native.py::_assemble_transport_reference, the line-by-line
numpy implementation of the documented spec) here pins the on-device
stencil operator: applying the stencil to a random state must equal the
assembled sparse matrix acting on the wet-cell vector, exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from newton_krylov_ooc_tpu.ops.imex import cn_vertical_increment
from newton_krylov_ooc_tpu.ops.transport3d import (
    build_transport3d,
    mask_vmix_coeff,
    transport_tend,
    vmix_vertical_coeff,
)
from tests.test_native import _assemble_transport_reference

NZ, NLAT, NLON = 4, 5, 6
DELTA_T = 365.0 * 86400.0


@pytest.fixture()
def circulation():
    rng = np.random.default_rng(11)
    mask = np.ones((NZ, NLAT, NLON), np.int32)
    mask[2:, 1, 2] = 0  # a seamount of masked cells
    mask[:, 3, 4] = 0   # a full masked column
    return {
        "mask": mask,
        "dz": rng.uniform(50.0e2, 200.0e2, NZ),
        "tarea": rng.uniform(0.8e14, 1.2e14, (NLAT, NLON)),
        "uet": rng.normal(0.0, 1.0e12, (NZ, NLAT, NLON)),
        "vnt": rng.normal(0.0, 1.0e12, (NZ, NLAT, NLON)),
        "wtt": rng.normal(0.0, 1.0e11, (NZ, NLAT, NLON)),
        "hde": rng.uniform(0.0, 1.0e12, (NZ, NLAT, NLON)),
        "hdn": rng.uniform(0.0, 1.0e12, (NZ, NLAT, NLON)),
    }


@pytest.mark.parametrize("adv_type", ["upwind3", "centered"])
def test_stencil_matches_assembly_spec(circulation, adv_type):
    c = circulation
    jac_ref, row_to_cell = _assemble_transport_reference(
        c["mask"], c["dz"], c["tarea"], c["uet"], c["vnt"], c["wtt"],
        c["hde"], c["hdn"], DELTA_T, upwind3=(adv_type == "upwind3"),
    )
    coef = build_transport3d(
        c["mask"], c["dz"], c["tarea"], c["uet"], c["vnt"], c["wtt"],
        c["hde"], c["hdn"], adv_type=adv_type,
    )

    rng = np.random.default_rng(3)
    y = rng.normal(size=(NZ, NLAT, NLON))
    tend = np.asarray(transport_tend(coef, jnp.asarray(y)))

    wet_y = y.reshape(-1)[row_to_cell]
    expected = jac_ref @ wet_y / DELTA_T
    got = tend.reshape(-1)[row_to_cell]
    scale = np.abs(expected).max()
    np.testing.assert_allclose(got, expected, rtol=0.0, atol=1e-13 * scale)

    # the stencil is exactly zero on land, even for nonzero land values
    land = (c["mask"] <= 0).reshape(-1)
    assert (tend.reshape(-1)[land] == 0.0).all()

    # flux form conserves volume-weighted tracer identically
    vol = c["dz"][:, None, None] * c["tarea"][None, :, :]
    total = float((vol * tend).sum())
    flux_scale = float(np.abs(vol * tend).sum())
    assert abs(total) < 1e-12 * flux_scale


@pytest.mark.parametrize("adv_type", ["upwind3", "centered"])
def test_tridiag_bands_match_assembly_spec(circulation, adv_type):
    """transport_tridiag_bands extracts exactly the diagonal and
    vertical-neighbor entries of the assembled transport matrix"""
    from newton_krylov_ooc_tpu.ops.transport3d import transport_tridiag_bands

    c = circulation
    jac_ref, row_to_cell = _assemble_transport_reference(
        c["mask"], c["dz"], c["tarea"], c["uet"], c["vnt"], c["wtt"],
        c["hde"], c["hdn"], DELTA_T, upwind3=(adv_type == "upwind3"),
    )
    coef = build_transport3d(
        c["mask"], c["dz"], c["tarea"], c["uet"], c["vnt"], c["wtt"],
        c["hde"], c["hdn"], adv_type=adv_type,
    )
    lo, diag, up = (np.asarray(b).reshape(-1)
                    for b in transport_tridiag_bands(coef))

    nhoriz = NLAT * NLON
    cell_to_row = -np.ones(NZ * nhoriz, np.int64)
    cell_to_row[row_to_cell] = np.arange(len(row_to_cell))
    scale = np.abs(jac_ref).max() / DELTA_T
    for r, cell in enumerate(row_to_cell):
        np.testing.assert_allclose(
            diag[cell], jac_ref[r, r] / DELTA_T, rtol=0.0,
            atol=1e-13 * scale,
        )
        for band, off in ((lo, -nhoriz), (up, nhoriz)):
            cell2 = cell + off
            r2 = cell_to_row[cell2] if 0 <= cell2 < NZ * nhoriz else -1
            expected = jac_ref[r, r2] / DELTA_T if r2 >= 0 else 0.0
            np.testing.assert_allclose(
                band[cell], expected, rtol=0.0, atol=1e-13 * scale
            )
    # land rows carry no bands
    land = (c["mask"] <= 0).reshape(-1)
    assert (diag[land] == 0.0).all()
    assert (lo[land] == 0.0).all()
    assert (up[land] == 0.0).all()


def test_stencil_batches_over_leading_axes(circulation):
    c = circulation
    coef = build_transport3d(
        c["mask"], c["dz"], c["tarea"], c["uet"], c["vnt"], c["wtt"],
        c["hde"], c["hdn"],
    )
    rng = np.random.default_rng(5)
    y = rng.normal(size=(2, 3, NZ, NLAT, NLON))
    batched = np.asarray(transport_tend(coef, jnp.asarray(y)))
    for i in range(2):
        for j in range(3):
            single = np.asarray(transport_tend(coef, jnp.asarray(y[i, j])))
            np.testing.assert_array_equal(batched[i, j], single)


def test_vmix_coeff_matches_gen_a_rates(circulation):
    """the implicit-solve coupling reproduces gen_A's vertical-mixing
    operator (gen_A.cpp:174-199): rates via cm->m conversions, VDC as the
    interface diffusivity below each level, dry faces carrying no flux"""
    c = circulation
    rng = np.random.default_rng(7)
    vdc = rng.uniform(0.1e4, 10.0e4, (NZ, NLAT, NLON))  # cm^2/s

    kv, dz_r = vmix_vertical_coeff(vdc, c["dz"])
    kv = mask_vmix_coeff(kv, c["mask"])

    # operator application via the flux form cn_vertical_increment uses
    v = rng.normal(size=(NZ, NLAT * NLON))
    flux = np.asarray(kv) * (v[1:, :] - v[:-1, :])
    zero = np.zeros((1, NLAT * NLON))
    l_v = np.asarray(dz_r)[:, None] * (
        np.concatenate([flux, zero], axis=0)
        - np.concatenate([zero, flux], axis=0)
    )

    # independent triplet assembly following gen_A.cpp exactly
    dz_m = 1.0e-2 * c["dz"]
    wet = c["mask"].reshape(NZ, -1) > 0
    expected = np.zeros((NZ, NLAT * NLON))
    for k in range(NZ - 1):
        dz_mid = 0.5 * (dz_m[k] + dz_m[k + 1])
        for h in range(NLAT * NLON):
            if not (wet[k, h] and wet[k + 1, h]):
                continue
            kappa = 1.0e-4 * vdc.reshape(NZ, -1)[k, h]
            coup = kappa / dz_mid
            expected[k, h] += coup * (v[k + 1, h] - v[k, h]) / dz_m[k]
            expected[k + 1, h] += coup * (v[k, h] - v[k + 1, h]) / dz_m[k + 1]

    np.testing.assert_allclose(l_v * wet, expected, rtol=1e-12, atol=0.0)

    # and the Crank-Nicolson increment solve is consistent with that
    # operator: (I - dt/2 L) dv = dt L v
    dt = 3600.0
    dv = np.asarray(
        cn_vertical_increment(kv, jnp.zeros((NZ, NLAT * NLON)), dz_r,
                              jnp.asarray(v), dt)
    )
    lhs = dv - 0.5 * dt * _apply_vmix(kv, dz_r, dv)
    np.testing.assert_allclose(
        lhs, dt * _apply_vmix(kv, dz_r, v), rtol=0.0, atol=1e-9
    )


def _apply_vmix(kv, dz_r, v):
    flux = np.asarray(kv) * (v[1:, :] - v[:-1, :])
    zero = np.zeros((1, v.shape[1]))
    return np.asarray(dz_r)[:, None] * (
        np.concatenate([flux, zero], axis=0)
        - np.concatenate([zero, flux], axis=0)
    )

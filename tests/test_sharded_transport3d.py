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

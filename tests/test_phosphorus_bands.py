"""py_driver_2d phosphorus banded-Jacobian path: the tracer-innermost banded
assembly must match the permuted dense Jacobian, and banded integration must
agree with the dense path"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from newton_krylov_ooc_tpu.core.spatial_axis import (
    spatial_axis_defn_dict,
    spatial_axis_from_defn_dict,
)
from newton_krylov_ooc_tpu.models.py_driver_2d import physics
from newton_krylov_ooc_tpu.models.py_driver_2d.phosphorus import (
    DEFAULT_PARAMS,
    light_lim_2d,
    phosphorus,
)
from newton_krylov_ooc_tpu.ops.radau import radau5_integrate

SPY = 365.0 * 86400.0


def _setup(nz, ny):
    depth = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            axisname="depth",
            units="m",
            nlevs=nz,
            edge_start=0.0,
            edge_end=4000.0,
            delta_ratio_max=19.0,
        )
    )
    ypos = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            axisname="ypos",
            units="m",
            nlevs=ny,
            edge_start=0.0,
            edge_end=50.0e5,
            delta_ratio_max=1.0,
        )
    )
    grid = physics.make_grid(
        depth,
        ypos,
        {"max_abs_vvel": "0.1", "horiz_mix_coeff": "1000.0"},
        dtype=jnp.float64,
    )
    physics.lateral_jac_const(grid)
    physics.lateral_bands_const(grid)
    p = DEFAULT_PARAMS
    static_args = (
        p["po4_halfsat"],
        p["max_uptake_rate"],
        p["sigma"],
        p["dop_remin_rate"],
        p["pop_remin_rate"],
        p["pop_sink_vel"],
        tuple(light_lim_2d(depth, ypos).reshape(-1)),
    )
    return grid, static_args


def _bands_to_dense(bands, bw):
    m = bands.shape[0]
    dense = np.zeros((m, m))
    for d in range(bands.shape[1]):
        off = d - bw
        lo, hi = max(0, -off), min(m, m - off)
        dense[np.arange(lo, hi), np.arange(lo, hi) + off] = bands[lo:hi, d]
    return dense


@pytest.mark.parametrize("nz,ny", [(9, 5), (5, 9)])  # z-major and y-major
def test_banded_matches_permuted_dense(nz, ny):
    grid, static_args = _setup(nz, ny)
    params = jnp.zeros(0)
    n = nz * ny
    rng = np.random.default_rng(11)
    y = np.abs(rng.standard_normal(3 * n)) + 0.1

    bw, perm = phosphorus.band_info(grid)
    assert bw == 3 * min(nz, ny)
    yb = y[perm]

    t = 0.37 * SPY
    jac_dense = np.asarray(
        phosphorus.build_jac(grid, static_args, params)(t, jnp.asarray(y))
    )
    jd_perm = jac_dense[np.ix_(perm, perm)]
    pb = np.asarray(
        phosphorus.build_jac_bands(grid, static_args, params)(t, jnp.asarray(yb))[0]
    )
    assert np.allclose(_bands_to_dense(pb, bw), jd_perm, atol=1e-14)


@pytest.mark.parametrize("nz,ny", [(8, 4), (4, 8)])
def test_banded_integration_matches_dense(nz, ny):
    grid, static_args = _setup(nz, ny)
    params = jnp.zeros(0)
    dm = np.asarray(grid.depth_mid)
    po4 = np.interp(dm, [130.0, 260.0], [5.5e-3, 4.1])
    dop = np.interp(dm, [95.0, 140.0], [7.1e-2, 1.5e-4])
    pop = np.interp(dm, [170.0, 250.0], [1.8e-2, 7.9e-4])
    y0 = np.stack(
        [np.broadcast_to(v[:, None], (nz, ny)) for v in (po4, dop, pop)]
    ).reshape(-1)

    t1 = SPY / 12  # one model month keeps the test quick
    t_eval = jnp.linspace(0.0, t1, 2)
    fun = phosphorus.build_tend(grid, static_args, params)

    jd = phosphorus.build_jac(grid, static_args, params)
    ys_d, info_d = jax.jit(
        lambda y: radau5_integrate(
            fun, (0.0, t1), y, t_eval, rtol=1e-8, atol=1e-8, jac=jd
        )
    )(jnp.asarray(y0))
    assert bool(info_d["success"])

    bw, perm = phosphorus.band_info(grid)
    inv = np.argsort(perm)
    jb = phosphorus.build_jac_bands(grid, static_args, params)
    perm_j, inv_j = jnp.asarray(perm), jnp.asarray(inv)

    def fun_banded(t, yb):
        return fun(t, yb[inv_j])[perm_j]

    ys_b, info_b = jax.jit(
        lambda y: radau5_integrate(
            fun_banded,
            (0.0, t1),
            y,
            t_eval,
            rtol=1e-8,
            atol=1e-8,
            jac_bands=jb,
            bandwidth=bw,
        )
    )(jnp.asarray(y0[perm]))
    assert bool(info_b["success"])

    yd = np.asarray(ys_d[-1])
    yb_final = np.asarray(ys_b[-1])[inv]
    assert np.abs(yb_final - yd).max() / np.abs(yd).max() < 1e-7

"""seasonal (monthly) circulation in the 3D offline IRF-transport stack.

The reference can only consume an ANNUAL-MEAN circulation: its setup
ncra-averages the monthly POP IRF history into one mean file
(nk_ooc/cime_pop/setup_solver.py:100-166) and gen_A assembles a single
steady operator.  Here the monthly fields drive the year directly: the
stencil coefficients carry a leading time axis and interpolate
periodically (midpoint convention) inside the integration.
"""

import configparser
import os

import jax.numpy as jnp
import numpy as np
import pytest

from newton_krylov_ooc_tpu.models.irf_offline import synthetic
from newton_krylov_ooc_tpu.ops.imex import imex_year
from newton_krylov_ooc_tpu.ops.transport3d import (
    build_transport3d,
    interp_month,
    interp_transport_coef,
    mask_vmix_coeff,
    mean_transport_coef,
    transport_coef_n_time,
    transport_tend,
    vmix_vertical_coeff,
)

NZ, NLAT, NLON = 3, 4, 6
YEAR = 365.0 * 86400.0


def test_interp_month_midpoints_and_wrap():
    rng = np.random.default_rng(3)
    arr = jnp.asarray(rng.normal(size=(4, 3)))
    # midpoint samples return the month exactly
    for month in range(4):
        got = np.asarray(interp_month(arr, (month + 0.5) / 4.0))
        np.testing.assert_allclose(got, np.asarray(arr)[month], rtol=0, atol=0)
    # the year boundary blends December/January equally, from both sides
    expected = 0.5 * (np.asarray(arr)[-1] + np.asarray(arr)[0])
    np.testing.assert_allclose(
        np.asarray(interp_month(arr, 0.0)), expected, atol=1e-15
    )
    eps = 1e-9
    np.testing.assert_allclose(
        np.asarray(interp_month(arr, 1.0 - eps)), expected, atol=1e-7
    )


def _year(coef, kv, dz_r, y0, n_steps):
    def tend(t, y):
        c = interp_transport_coef(coef, jnp.mod(t / YEAR, 1.0))
        y3 = y.reshape(y.shape[:-1] + (NLAT, NLON))
        return transport_tend(c, y3).reshape(y.shape)

    if kv.ndim == 3:
        vert = lambda t: interp_month(kv, jnp.mod(t / YEAR, 1.0))
    else:
        vert = lambda t: kv
    return np.asarray(
        imex_year(
            tend,
            vert,
            jnp.zeros((), jnp.float64),
            dz_r,
            jnp.asarray(y0.reshape(1, NZ, NLAT * NLON)),
            (0.0, YEAR),
            n_steps,
        )
    ).reshape(NZ, NLAT, NLON)


def _setup(n_seasons):
    mask = np.ones((NZ, NLAT, NLON), np.int32)
    mask[1:, 2, 3] = 0
    circ = synthetic.gen_circulation(
        NZ, NLAT, NLON, mask=mask, n_seasons=n_seasons
    )
    coef = build_transport3d(
        circ["mask"], circ["dz"], circ["TAREA"], uet=circ["UET"],
        vnt=circ["VNT"], wtt=circ["WTT"], hdiff_e=circ["HDIFF_E"],
        hdiff_n=circ["HDIFF_N"],
    )
    kv, dz_r = vmix_vertical_coeff(circ["VDC"], circ["dz"])
    kv = mask_vmix_coeff(kv, circ["mask"])
    return circ, coef, kv, dz_r


def test_constant_seasons_match_steady_year():
    """a seasonal circulation whose months are all identical integrates to
    the steady-circulation result (to interpolation roundoff)"""
    circ_s, coef_s, kv_s, dz_r = _setup(None)
    circ = dict(circ_s)
    for name in ("UET", "VNT", "VDC"):
        circ[name] = np.broadcast_to(
            circ[name], (4,) + circ[name].shape
        ).copy()
    coef = build_transport3d(
        circ["mask"], circ["dz"], circ["TAREA"], uet=circ["UET"],
        vnt=circ["VNT"], wtt=circ["WTT"], hdiff_e=circ["HDIFF_E"],
        hdiff_n=circ["HDIFF_N"],
    )
    assert transport_coef_n_time(coef) == 4
    kv, _ = vmix_vertical_coeff(circ["VDC"], circ["dz"])
    kv = mask_vmix_coeff(kv, circ["mask"])

    n_steps = synthetic.stable_steps_per_year(circ)
    rng = np.random.default_rng(5)
    y0 = rng.uniform(0.0, 1.0, (NZ, NLAT, NLON)) * (circ["mask"] > 0)
    got = _year(coef, kv, dz_r, y0, n_steps)
    expected = _year(coef_s, kv_s, dz_r, y0, n_steps)
    scale = np.abs(expected).max()
    np.testing.assert_allclose(got, expected, rtol=0.0, atol=1e-12 * scale)


def test_seasonal_conservation_and_variation():
    """each interpolated monthly transport stays non-divergent (linear
    interpolation preserves it), so the flux-form year conserves the
    volume integral exactly -- and the seasonal result genuinely differs
    from the annual-mean-operator year"""
    circ, coef, kv, dz_r = _setup(4)
    assert transport_coef_n_time(coef) == 4
    n_steps = synthetic.stable_steps_per_year(circ)
    rng = np.random.default_rng(6)
    mask = circ["mask"] > 0
    y0 = rng.uniform(0.5, 1.5, (NZ, NLAT, NLON)) * mask

    got = _year(coef, kv, dz_r, y0, n_steps)
    vol = circ["dz"][:, None, None] * circ["TAREA"][None, :, :] * mask
    np.testing.assert_allclose(
        float((vol * got).sum()),
        float((vol * y0).sum()),
        rtol=1e-12,
    )

    kv_mean = kv.mean(axis=0) if kv.ndim == 3 else kv
    steady = _year(mean_transport_coef(coef), kv_mean, dz_r, y0, n_steps)
    assert np.abs(got - steady).max() > 1e-5 * np.abs(got).max()


@pytest.mark.slow
def test_seasonal_solve_matches_dense_oracle(tmp_path):
    """full Newton-Krylov solve of an iage tracer under a SEASONAL
    circulation converges to the exact fixed point of the probed (linear,
    time-dependent) year propagator; the preconditioner uses the
    annual-mean operator and remains effective"""
    from newton_krylov_ooc_tpu.config.model_config import ModelConfig
    from newton_krylov_ooc_tpu.core.newton import NewtonSolver
    from newton_krylov_ooc_tpu.models.irf_offline.model_state import ModelState

    workdir = tmp_path / "workdir"
    workdir.mkdir(exist_ok=True)
    mask = np.ones((NZ, NLAT, NLON), np.int32)
    mask[1:, 2, 3] = 0
    # a weaker gyre keeps the stability-bound step count (and so the probe
    # cost) low without changing what the test pins
    circ = synthetic.gen_circulation(
        NZ, NLAT, NLON, mask=mask, n_seasons=4,
        psi_max=2.5e11, hmix_cond=5.0e10,
    )
    irf_fname = str(workdir / "irf_monthly.nc")
    grid_vars_fname = str(workdir / "grid_vars.nc")
    synthetic.write_circulation(irf_fname, circ)
    synthetic.write_grid_vars(grid_vars_fname, circ)

    defs_fname = os.path.join(
        os.path.dirname(os.path.dirname(os.path.realpath(__file__))),
        "input",
        "irf_offline",
        "tracer_module_defs.yaml",
    )
    config = configparser.ConfigParser(
        {
            "HOME": str(tmp_path),
            "USER": "tester",
            "logging_reproducible": "False",
        },
        allow_no_value=True,
    )
    config["DEFAULT"].update(
        {"model_name": "irf_offline", "workdir": str(workdir)}
    )
    config["solverinfo"] = {
        "cfg_out_fname": str(workdir / "cfg.out"),
        "logging_fname": str(workdir / "nk.log"),
        "logging_level": "INFO",
        "logging_reproducible": "False",
        "init_iterate_fname": str(workdir / "init_iterate.nc"),
        "newton_rel_tol": "1.0e-7",
        "newton_max_iter": "8",
        "post_newton_fp_iter": "1",
        "krylov_rel_tol": "1.0e-6",
    }
    config["modelinfo"] = {
        "reinvoke": "False",
        "invoker_script_fname": str(workdir / "nk_driver.sh"),
        "irf_fname": irf_fname,
        "grid_vars_fname": grid_vars_fname,
        "circ_adv_type": "upwind3",
        "steps_per_year": str(synthetic.stable_steps_per_year(circ)),
        "comp_fcn_dtype": "float64",
        "tracer_module_names": "iage",
        "tracer_module_defs_fname": defs_fname,
    }
    ModelState.model_config_obj = None
    ModelState._circ_key = None
    ModelState.model_config_obj = ModelConfig(config["modelinfo"])

    wet_idx = np.nonzero((mask > 0).reshape(-1))[0]
    n = len(wet_idx)

    def year_map(x_wet):
        state = ModelState("zeros")
        full = np.zeros(mask.size)
        full[wet_idx] = x_wet
        state.tracer_modules[0].set_tracer_vals_all(
            full.reshape((1, NZ, NLAT, NLON)), reseat_vals=True
        )
        fcn = state.comp_fcn(res_fname=None, solver_state=None, hist_fname=None)
        res = fcn.tracer_modules[0].get_tracer_vals_all().reshape(-1)[wet_idx]
        return res + x_wet

    c_vec = year_map(np.zeros(n))
    b_mat = np.empty((n, n))
    for col in range(n):
        e = np.zeros(n)
        e[col] = 1.0
        b_mat[:, col] = year_map(e) - c_vec
    x_oracle = np.linalg.solve(np.eye(n) - b_mat, c_vec)

    init = ModelState("gen_init_iterate")
    init.dump(
        config["solverinfo"]["init_iterate_fname"], caller="tests.seasonal"
    )
    solver = NewtonSolver(
        ModelState,
        solverinfo=config["solverinfo"],
        resume=False,
        rewind=False,
    )
    while not solver.converged().all():
        solver.step()

    x_solved = (
        solver._iterate.tracer_modules[0].get_tracer_vals_all().reshape(-1)[
            wet_idx
        ]
    )
    scale = np.abs(x_oracle).max()
    f_solved = b_mat @ x_solved + c_vec - x_solved
    amplified = np.linalg.solve(np.eye(n) - b_mat, f_solved)
    np.testing.assert_allclose(
        x_solved + amplified, x_oracle, rtol=0.0, atol=1e-9 * scale
    )
    np.testing.assert_allclose(
        x_solved,
        x_oracle,
        rtol=0.0,
        atol=2.0 * np.abs(amplified).max() + 1e-9 * scale,
    )

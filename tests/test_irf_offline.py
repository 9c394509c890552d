"""end-to-end tests of the irf_offline model family: 3D offline
IRF-transport tracers integrated on device, solved to a cyclo-stationary
state with the full Newton-Krylov stack, and cross-checked against a dense
linear-algebra oracle (the model is linear, so the exact fixed point is the
solution of (B - I) x = -c with B the probed year propagator)."""

import configparser
import os
import pathlib

import numpy as np
import pytest

from newton_krylov_ooc_tpu.config.model_config import ModelConfig
from newton_krylov_ooc_tpu.core.newton import NewtonSolver
from newton_krylov_ooc_tpu.models.irf_offline import synthetic

NZ, NLAT, NLON = 4, 6, 8


def _build_config(tmp_path, tracer_module_names="iage", with_land=True,
                  workdir=None, n_seasons=None):
    from newton_krylov_ooc_tpu.models.irf_offline.model_state import ModelState

    if workdir is None:
        workdir = tmp_path / "workdir"
        workdir.mkdir(exist_ok=True)
    else:
        workdir = pathlib.Path(workdir)

    mask = np.ones((NZ, NLAT, NLON), np.int32)
    if with_land:
        mask[:, 2, 3] = 0       # an island column
        mask[2:, 4, 5] = 0      # a seamount
    circ = synthetic.gen_circulation(
        NZ, NLAT, NLON, mask=mask, n_seasons=n_seasons
    )
    irf_fname = str(workdir / "irf_mean.nc")
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
        "tracer_module_names": tracer_module_names,
        "tracer_module_defs_fname": defs_fname,
    }

    ModelState.model_config_obj = None
    ModelState._circ_key = None
    ModelState.model_config_obj = ModelConfig(config["modelinfo"])
    return config, circ


def _direct_fcn(state):
    """one function evaluation outside the solver (solver_state=None)"""
    return state.comp_fcn(res_fname=None, solver_state=None, hist_fname=None)


@pytest.mark.slow
def test_conservation_without_sources(tmp_path):
    """with no sources/sinks, the year integration conserves the
    volume-weighted tracer integral (flux-form transport + vmix)"""
    from newton_krylov_ooc_tpu.models.irf_offline.model_state import ModelState

    config, circ = _build_config(tmp_path, tracer_module_names="dye_{suff}:001")
    # strip the dye's source/sink for a pure-transport run
    defs = ModelState.model_config_obj.tracer_module_defs["dye_001"]
    md = defs["tracers"]["DYE_001"]
    md["source_per_year"] = 0.0
    md["sink_rate_per_year"] = 0.0

    state = ModelState("gen_init_iterate")
    rng = np.random.default_rng(2)
    mask = circ["mask"] > 0
    vals = rng.uniform(0.5, 1.5, (1, NZ, NLAT, NLON)) * mask
    state.tracer_modules[0].set_tracer_vals_all(vals, reseat_vals=True)

    fcn = _direct_fcn(state)
    vol = circ["dz"][:, None, None] * circ["TAREA"][None, :, :] * mask
    delta = fcn.tracer_modules[0].get_tracer_vals_all()[0]
    total = float((vol * delta).sum())
    scale = float((vol * np.abs(vals[0])).sum())
    assert abs(total) < 1.0e-12 * scale


@pytest.mark.slow
def test_solve_matches_dense_oracle(tmp_path):
    """full Newton-Krylov solve of the iage module converges to the exact
    fixed point of the (linear) year map, computed independently by probing
    the dense propagator and solving (B - I) x = -c"""
    from newton_krylov_ooc_tpu.models.irf_offline.model_state import ModelState

    config, circ = _build_config(tmp_path)
    solverinfo = config["solverinfo"]

    # -- dense oracle ------------------------------------------------------
    mask = circ["mask"] > 0
    wet_idx = np.nonzero(mask.reshape(-1))[0]
    n = len(wet_idx)

    def year_map(x_wet):
        state = ModelState("zeros")
        full = np.zeros(mask.size)
        full[wet_idx] = x_wet
        state.tracer_modules[0].set_tracer_vals_all(
            full.reshape((1, NZ, NLAT, NLON)), reseat_vals=True
        )
        fcn = _direct_fcn(state)
        res = fcn.tracer_modules[0].get_tracer_vals_all().reshape(-1)[wet_idx]
        return res + x_wet  # comp_fcn returns F = B x + c - x

    c_vec = year_map(np.zeros(n))
    b_mat = np.empty((n, n))
    for col in range(n):
        e = np.zeros(n)
        e[col] = 1.0
        b_mat[:, col] = year_map(e) - c_vec
    x_oracle = np.linalg.solve(np.eye(n) - b_mat, c_vec)

    # -- Newton-Krylov solve ----------------------------------------------
    init = ModelState("gen_init_iterate")
    os.makedirs(os.path.dirname(solverinfo["init_iterate_fname"]), exist_ok=True)
    init.dump(solverinfo["init_iterate_fname"], caller="tests.irf_offline")

    solver = NewtonSolver(
        ModelState, solverinfo=solverinfo, resume=False, rewind=False
    )
    while not solver.converged().all():
        solver.step()

    x_solved = (
        solver._iterate.tracer_modules[0].get_tracer_vals_all().reshape(-1)[
            wet_idx
        ]
    )
    scale = np.abs(x_oracle).max()
    # the exact identity x_solved + (I-B)^-1 F(x_solved) == x_oracle pins
    # that the model's year map IS the probed dense map and the solver found
    # a genuine approximate root; the raw gap is that residual amplified
    # through (I-B)'s slow modes
    f_solved = b_mat @ x_solved + c_vec - x_solved
    amplified = np.linalg.solve(np.eye(n) - b_mat, f_solved)
    corrected = x_solved + amplified
    np.testing.assert_allclose(corrected, x_oracle, rtol=0.0, atol=1e-9 * scale)
    # the raw gap is exactly that amplified residual (plus margin)
    np.testing.assert_allclose(
        x_solved,
        x_oracle,
        rtol=0.0,
        atol=2.0 * np.abs(amplified).max() + 1e-9 * scale,
    )
    assert solver.get_iteration() <= 6  # linear model: fast convergence

    # stats and hist artifacts exist
    workdir = config["modelinfo"]["invoker_script_fname"]
    workdir = os.path.dirname(workdir)
    assert os.path.exists(os.path.join(workdir, "Newton_stats.nc"))
    from newton_krylov_ooc_tpu.utils.ncio import NCFile

    hist_files = [f for f in os.listdir(workdir) if f.startswith("hist")]
    assert hist_files
    with NCFile(os.path.join(workdir, hist_files[0])) as fptr:
        assert fptr.has_var("IAGE")
        assert fptr.has_var("IAGE_horiz_mean")
        assert fptr.has_var("dz")


def test_module_rates_gas_exchange_coupling(tmp_path):
    """the abio_dic_dic14 spec (d_SF_X_d_Y linearized gas exchange,
    reference input/cime_pop/tracer_module_defs.yaml:43-57) becomes surface
    rates: self-derivatives fold into the implicit diagonal, the cross term
    into the coupling matrix"""
    from newton_krylov_ooc_tpu.models.irf_offline.model_state import (
        ModelState,
        SEC_PER_YEAR,
    )

    config, circ = _build_config(tmp_path, tracer_module_names="abio_dic_dic14")
    state = ModelState("gen_init_iterate")
    diag, src, couple = state._module_rates(state.tracer_modules[0])

    dz_surf = circ["dz"][0]
    wet_surf = (circ["mask"][0] > 0).reshape(-1)
    # ABIO_DIC: diag surface = d_SF self term; src surface = const/dz
    np.testing.assert_allclose(
        diag[0, 0, :], -5.0e-3 / dz_surf * wet_surf, rtol=1e-12
    )
    np.testing.assert_allclose(
        src[0, 0, :], 1.05e-2 / dz_surf * wet_surf, rtol=1e-12
    )
    assert (diag[0, 1:, :] == 0.0).all()
    # ABIO_DIC14: decay everywhere + self gas-exchange damping at surface
    decay = 1.2097e-4 / SEC_PER_YEAR
    np.testing.assert_allclose(
        diag[1, 0, :], (-decay - 5.0e-3 / dz_surf) * wet_surf, rtol=1e-12
    )
    wet1 = (circ["mask"][1] > 0).reshape(-1)
    np.testing.assert_allclose(diag[1, 1, :], -decay * wet1, rtol=1e-12)
    # the cross term is the only off-diagonal coupling
    expected_couple = np.zeros((2, 2))
    expected_couple[1, 0] = 4.25e-3 / dz_surf
    np.testing.assert_allclose(couple, expected_couple, rtol=1e-12)


@pytest.mark.slow
def test_coupled_solve_matches_dense_oracle(tmp_path):
    """full Newton-Krylov solve of the coupled abio_dic_dic14 module
    (cross-tracer surface gas exchange + radiocarbon decay) converges to
    the exact fixed point of the probed joint year propagator, and the
    hist/stats surface carries the gas-flux diagnostics and the derived
    Delta-14C variable (reference analog: nk_ooc/cime_pop/abio_dic_dic14.py)"""
    from newton_krylov_ooc_tpu.models.irf_offline.model_state import ModelState

    config, circ = _build_config(tmp_path, tracer_module_names="abio_dic_dic14")
    solverinfo = config["solverinfo"]

    mask = circ["mask"] > 0
    wet_idx = np.nonzero(mask.reshape(-1))[0]
    n_wet = len(wet_idx)
    n = 2 * n_wet

    def year_map(x_wet):
        state = ModelState("zeros")
        full = np.zeros((2, mask.size))
        full[:, wet_idx] = x_wet.reshape(2, n_wet)
        state.tracer_modules[0].set_tracer_vals_all(
            full.reshape((2, NZ, NLAT, NLON)), reseat_vals=True
        )
        fcn = _direct_fcn(state)
        res = fcn.tracer_modules[0].get_tracer_vals_all().reshape(2, -1)[
            :, wet_idx
        ]
        return res.reshape(-1) + x_wet

    c_vec = year_map(np.zeros(n))
    b_mat = np.empty((n, n))
    for col in range(n):
        e = np.zeros(n)
        e[col] = 1.0
        b_mat[:, col] = year_map(e) - c_vec
    # the cross coupling must show up in the propagator: DIC14 columns
    # respond to DIC impulses
    dic_block = b_mat[n_wet:, :n_wet]
    assert np.abs(dic_block).max() > 0.0
    x_oracle = np.linalg.solve(np.eye(n) - b_mat, c_vec)

    init = ModelState("gen_init_iterate")
    os.makedirs(os.path.dirname(solverinfo["init_iterate_fname"]), exist_ok=True)
    init.dump(solverinfo["init_iterate_fname"], caller="tests.irf_offline")

    solver = NewtonSolver(
        ModelState, solverinfo=solverinfo, resume=False, rewind=False
    )
    while not solver.converged().all():
        solver.step()

    x_solved = (
        solver._iterate.tracer_modules[0]
        .get_tracer_vals_all()
        .reshape(2, -1)[:, wet_idx]
        .reshape(-1)
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

    # hist + stats diagnostics
    from newton_krylov_ooc_tpu.utils.ncio import NCFile

    workdir = os.path.dirname(config["modelinfo"]["invoker_script_fname"])
    hist_files = [f for f in os.listdir(workdir) if f.startswith("hist")]
    assert hist_files
    with NCFile(os.path.join(workdir, hist_files[0])) as fptr:
        for name in [
            "ABIO_DIC",
            "ABIO_DIC14",
            "ABIO_D14C",
            "ABIO_D14C_horiz_mean",
            "SF_ABIO_DIC",
            "SF_ABIO_DIC_horiz_int",
            "SF_ABIO_DIC14",
        ]:
            assert fptr.has_var(name), name
        d14c = np.asarray(fptr.var("ABIO_D14C")[:])
        dic = np.asarray(fptr.var("ABIO_DIC")[:])
        dic14 = np.asarray(fptr.var("ABIO_DIC14")[:])
        sel = dic != 0.0
        np.testing.assert_allclose(
            d14c[sel], 1.0e3 * (dic14[sel] / dic[sel] - 1.0), atol=1e-9
        )
    with NCFile(os.path.join(workdir, "Newton_stats.nc")) as fptr:
        assert fptr.has_var("SF_ABIO_DIC_horiz_int")
        assert fptr.has_var("ABIO_D14C_horiz_mean")


@pytest.mark.slow
def test_kill_replay_irf_offline(tmp_path, monkeypatch):
    """write-ahead-log crash recovery for the irf_offline family under its
    hardest configuration -- SEASONAL circulation + the gas-exchange-coupled
    abio_dic_dic14 module: the solve killed after EVERY step-log append
    replays to the uninterrupted golden trajectory (same WAL contract the
    test_problem kill-replay tests pin)"""
    from test_solver_end_to_end import _kill_replay_check

    from newton_krylov_ooc_tpu.models.irf_offline.model_state import ModelState

    def setup_fn(workdir):
        config, _circ = _build_config(
            tmp_path,
            tracer_module_names="abio_dic_dic14",
            workdir=workdir,
            n_seasons=4,
        )
        init = ModelState("gen_init_iterate")
        init.dump(
            config["solverinfo"]["init_iterate_fname"], caller="tests.irf"
        )
        return config

    _kill_replay_check(
        tmp_path,
        monkeypatch,
        module_names="abio_dic_dic14",
        tracer_names=["ABIO_DIC", "ABIO_DIC14"],
        setup_fn=setup_fn,
        model_state_cls=ModelState,
    )


@pytest.mark.slow
def test_coupled_precond_solves_linearized_system(tmp_path):
    """apply_precond_jacobian on the coupled module solves the JOINT
    linearized system (delta_t * M - I) z = r, M including the cross-tracer
    surface gas-exchange term"""
    from newton_krylov_ooc_tpu.models.irf_offline.model_state import (
        ModelState,
        SEC_PER_YEAR,
        _rate_single,
    )
    import jax
    import jax.numpy as jnp

    config, circ = _build_config(tmp_path, tracer_module_names="abio_dic_dic14")
    state = ModelState("zeros")
    rng = np.random.default_rng(7)
    mask = circ["mask"] > 0
    r = rng.normal(size=(2, NZ, NLAT, NLON)) * mask
    state.tracer_modules[0].set_tracer_vals_all(r, reseat_vals=True)

    res_fname = str(tmp_path / "precond_out.nc")
    res = state.apply_precond_jacobian(None, res_fname, None)
    z = res.tracer_modules[0].get_tracer_vals_all() + r  # res = z - r

    circ_cls = ModelState._circ
    diag, _src, couple = state._module_rates(state.tracer_modules[0])
    assert couple is not None
    nh = NLAT * NLON
    z2 = jnp.asarray(z.reshape(2, NZ, nh))
    rate = np.array(
        jax.vmap(
            lambda vv, d: _rate_single(
                vv, circ_cls["coef"], jnp.asarray(circ_cls["kv"]),
                jnp.asarray(circ_cls["dz_r"]), d, (NZ, NLAT, NLON),
            )
        )(z2, jnp.asarray(diag))
    )
    wet_surf = (circ["mask"][0] > 0).reshape(-1)
    rate[:, 0, :] += wet_surf * (couple @ np.asarray(z2)[:, 0, :])
    applied = SEC_PER_YEAR * rate - z.reshape(2, NZ, nh)
    scale = np.abs(r).max()
    np.testing.assert_allclose(
        applied.reshape(2, NZ, NLAT, NLON) * mask,
        r * mask,
        rtol=0.0,
        atol=1.0e-8 * scale,
    )


@pytest.mark.slow
def test_precond_solves_linearized_system(tmp_path):
    """apply_precond_jacobian returns z - r with (delta_t*M - I) z = r:
    verify by applying the model's own rate operator to z"""
    from newton_krylov_ooc_tpu.models.irf_offline.model_state import (
        ModelState,
        SEC_PER_YEAR,
        _rate_single,
    )
    import jax.numpy as jnp

    config, circ = _build_config(tmp_path)
    state = ModelState("zeros")
    rng = np.random.default_rng(4)
    mask = circ["mask"] > 0
    r = rng.normal(size=(1, NZ, NLAT, NLON)) * mask
    state.tracer_modules[0].set_tracer_vals_all(r, reseat_vals=True)

    res_fname = str(tmp_path / "precond_out.nc")
    res = state.apply_precond_jacobian(None, res_fname, None)
    z = res.tracer_modules[0].get_tracer_vals_all() + r  # res = z - r

    circ_cls = ModelState._circ
    diag, _src, _couple = state._module_rates(state.tracer_modules[0])
    applied = SEC_PER_YEAR * np.asarray(
        _rate_single(
            jnp.asarray(z[0].reshape(NZ, NLAT * NLON)),
            circ_cls["coef"],
            jnp.asarray(circ_cls["kv"]),
            jnp.asarray(circ_cls["dz_r"]),
            jnp.asarray(diag[0]),
            (NZ, NLAT, NLON),
        )
    ) - z[0].reshape(NZ, NLAT * NLON)
    scale = np.abs(r).max()
    np.testing.assert_allclose(
        applied.reshape(NZ, NLAT, NLON) * mask,
        r[0] * mask,
        rtol=0.0,
        atol=1.0e-8 * scale,
    )

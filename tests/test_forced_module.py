"""end-to-end tests of the forced_{suff} py_driver_2d module family,
including file forcing read from the shipped input data and the bounds
limiter (lob: 0.0)"""

import os

import numpy as np
import pytest

from newton_krylov_ooc_tpu.config.model_config import ModelConfig
from newton_krylov_ooc_tpu.config.share import common_args, read_cfg_files
from newton_krylov_ooc_tpu.core.newton import NewtonSolver
from newton_krylov_ooc_tpu.models.py_driver_2d.model_state import ModelState
from newton_krylov_ooc_tpu.models.py_driver_2d.setup_solver import (
    gen_grid_vars_file,
)
from newton_krylov_ooc_tpu.utils.ncio import mkdir_exist_okay

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))


def _setup(workdir, extra_modelinfo, tracer_module_names):
    override = os.path.join(workdir, "override.cfg")
    lines = ["[modelinfo]", "depth_nlevs = 12", "ypos_nlevs = 10"]
    lines += [f"{key} = {val}" for key, val in extra_modelinfo.items()]
    with open(override, "w") as fptr:
        fptr.write("\n".join(lines) + "\n")

    input_dir = os.path.join(REPO_ROOT, "input", "py_driver_2d")
    cfg_fnames = ",".join(
        [
            os.path.join(input_dir, "newton_krylov.cfg"),
            os.path.join(input_dir, "model_params.cfg"),
            override,
        ]
    )
    parser, args_remaining = common_args(
        "test_forced",
        "py_driver_2d",
        [
            "--cfg_fnames", cfg_fnames,
            "--workdir", workdir,
            "--tracer_module_names", tracer_module_names,
            "--persist",
        ],
    )
    args = parser.parse_args(args_remaining)
    config = read_cfg_files(args)
    modelinfo = config["modelinfo"]

    gen_grid_vars_file(args, modelinfo)

    # reset model class state (other tests may have configured it)
    ModelState.model_config_obj = ModelConfig(modelinfo)
    ModelState.depth = None
    ModelState.ypos = None
    from newton_krylov_ooc_tpu.models.py_driver_2d.forced import forced

    forced._params_cache = {}
    return config


@pytest.mark.slow
def test_forced_decay_solve(tmp_workdir):
    """forced with sms_opt=decay: an analytically-known fixed point family"""
    config = _setup(
        tmp_workdir,
        {
            "forced_surf_restore_opt": "const",
            "forced_surf_restore_const": "1.0",
            "forced_sms_opt": "decay",
            "forced_sms_decay_rate": "1.0 / (100.0 * 86400.0)",
        },
        "forced_{suff}:alpha",
    )
    solverinfo = config["solverinfo"]

    init = ModelState("gen_init_iterate")
    mkdir_exist_okay(os.path.dirname(solverinfo["init_iterate_fname"]))
    init.dump(solverinfo["init_iterate_fname"], caller="tests.forced")

    solver = NewtonSolver(
        ModelState, solverinfo=solverinfo, resume=False, rewind=False
    )
    while not solver.converged().all():
        solver.step()
    assert solver.get_iteration() <= 4

    # fixed point: decaying tracer restored to 1 at the surface stays in [0, 1]
    vals = solver._iterate.tracer_modules[0].get_tracer_vals("alpha")
    assert vals.max() <= 1.0 + 1e-6
    assert vals.min() >= -1e-9  # bounds: lob 0.0


@pytest.mark.slow
def test_forced_file_forcing_comp_fcn(tmp_workdir):
    """forced with file-based surface restoring and sms (the shipped
    po4_surf.nc / po4_sms.nc forcing data), one function evaluation"""
    input_dir = os.path.join(REPO_ROOT, "input", "py_driver_2d")
    config = _setup(
        tmp_workdir,
        {
            "forced_surf_restore_opt": "file",
            "forced_surf_restore_fname": os.path.join(input_dir, "po4_surf.nc"),
            "forced_surf_restore_varname": "po4",
            "forced_sms_opt": "file",
            "forced_sms_fname": os.path.join(input_dir, "po4_sms.nc"),
            "forced_sms_varname": "po4_sms",
            "forced_sink_thres": "1.0e-3",
        },
        "forced_{suff}:preformed_po4",
    )
    del config

    ms = ModelState("gen_init_iterate")
    fcn = ms.comp_fcn(
        os.path.join(tmp_workdir, "fcn.nc"),
        None,
        os.path.join(tmp_workdir, "hist.nc"),
    )
    vals = fcn.tracer_modules[0].get_tracer_vals("preformed_po4")
    assert np.isfinite(vals).all()
    assert np.abs(vals).max() > 0.0

    # the preconditioner linearized at hist snapshots applies cleanly
    ms.gen_precond_jacobian(
        os.path.join(tmp_workdir, "hist.nc"),
        os.path.join(tmp_workdir, "precond.nc"),
        solver_state=None,
    )
    res = fcn.apply_precond_jacobian(
        os.path.join(tmp_workdir, "precond.nc"),
        os.path.join(tmp_workdir, "precond_res.nc"),
        solver_state=None,
    )
    assert np.isfinite(
        res.tracer_modules[0].get_tracer_vals("preformed_po4")
    ).all()


def test_comp_fcn_dtype_float32_smoke(tmp_path):
    """the comp_fcn_dtype=float32 accelerated OOC option produces function
    values within ~1e-2 of the float64 path (uncompensated f32 stepping at
    the reference tolerance)"""
    import numpy as np

    results = {}
    for dtype_name in ("float64", "float32"):
        workdir = tmp_path / dtype_name
        workdir.mkdir()
        _setup(str(workdir), {"comp_fcn_dtype": dtype_name}, "iage")
        state = ModelState("gen_init_iterate")
        fcn = state.comp_fcn(str(workdir / "fcn.nc"), None)
        results[dtype_name] = fcn.tracer_modules[0].get_tracer_vals("iage")
        ModelState.model_config_obj = None
        ModelState.depth = None
        ModelState.ypos = None

    a, b = results["float32"], results["float64"]
    assert np.abs(a - b).max() / np.abs(b).max() < 1e-2

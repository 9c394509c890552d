"""end-to-end Newton-Krylov solves on test_problem iage, including the
out-of-core exit-and-reinvoke contract (the framework's defining behavior)"""

import subprocess

import numpy as np
import pytest

from newton_krylov_ooc_tpu.config.model_config import ModelConfig
from newton_krylov_ooc_tpu.config.share import common_args, read_cfg_files
from newton_krylov_ooc_tpu.core.newton import NewtonSolver
from newton_krylov_ooc_tpu.core.spatial_axis import (
    spatial_axis_defn_dict,
    spatial_axis_from_defn_dict,
)
from newton_krylov_ooc_tpu.models.test_problem.model_state import ModelState
from newton_krylov_ooc_tpu.utils.ncio import NCFile


def _setup(workdir, reinvoke=False, module_names="iage", extra_args=()):
    args_list = ["--workdir", workdir, "--tracer_module_names", module_names]
    args_list.extend(extra_args)
    if not reinvoke:
        args_list.append("--persist")
    parser, args_remaining = common_args("e2e", "test_problem", args_list)
    args = parser.parse_args(args_remaining)
    config = read_cfg_files(args)
    modelinfo = config["modelinfo"]

    depth = spatial_axis_from_defn_dict(defn_dict=spatial_axis_defn_dict(nlevs=20))
    depth.dump(modelinfo["grid_vars_fname"], caller="tests.e2e")
    with NCFile(modelinfo["grid_vars_fname"], mode="a") as fptr:
        var = fptr.create_variable(
            "region_mask",
            "i4",
            ("depth",),
            attrs={
                "long_name": "Region Mask",
                "cell_measures": "thickness: depth_delta",
            },
        )
        var[:] = np.ones(20, dtype=np.int32)

    ModelState.model_config_obj = ModelConfig(modelinfo)
    ModelState.depth = None

    # initial iterate where the solver expects it
    init = ModelState("gen_init_iterate")
    import os

    os.makedirs(os.path.dirname(config["solverinfo"]["init_iterate_fname"]), exist_ok=True)
    init.dump(config["solverinfo"]["init_iterate_fname"], caller="tests.e2e")
    return config


def _drive_to_convergence(config, resume=False, cls=None):
    solverinfo = config["solverinfo"]
    solver = NewtonSolver(
        ModelState if cls is None else cls,
        solverinfo=solverinfo,
        resume=resume,
        rewind=False,
    )
    while not solver.converged().all():
        solver.step()
    return solver


@pytest.mark.slow
def test_full_solve_persist(tmp_workdir):
    """persistent (single-process) solve converges at the reference's iteration"""
    config = _setup(tmp_workdir)
    solver = _drive_to_convergence(config)
    # the committed reference trajectory converges at Newton iteration 3
    assert solver.get_iteration() == 3
    rel = solver._fcn.norm() / solver._iterate.norm()
    assert (rel < 1.0e-8).all()

    # stats files carry the solver diagnostics
    import os

    from newton_krylov_ooc_tpu.utils.ncio import NCFile

    with NCFile(os.path.join(tmp_workdir, "Newton_stats.nc")) as fptr:
        assert fptr.dim_len("iteration") == 4  # iterations 0..3
        fcn_norms = fptr.var("fcn_norm_iage")[:][:, 0]
        assert (np.diff(fcn_norms) < 0).all()  # monotone Newton convergence
        assert fptr.has_var("Armijo_factor_iage")
        assert fptr.has_var("Krylov_iterations")
        assert fptr.has_var("iage")  # model-specific reduced tracer field
    assert os.path.exists(os.path.join(tmp_workdir, "krylov_00", "Krylov_stats.nc"))


@pytest.mark.slow
def test_full_solve_reinvoke(tmp_workdir, monkeypatch):
    """
    out-of-core mode: every comp_fcn ends the 'process' (SystemExit); the
    solve is re-entered with --resume and fast-forwards through the step log.
    This exercises crash-recovery at every function-evaluation boundary.
    """
    config = _setup(tmp_workdir, reinvoke=True)
    # swallow the self-reinvocation (the test loop plays the invoker's role)
    monkeypatch.setattr(subprocess, "Popen", lambda *a, **k: None)

    solverinfo = config["solverinfo"]
    restarts = 0
    resume = False
    while True:
        try:
            solver = NewtonSolver(
                ModelState, solverinfo=solverinfo, resume=resume, rewind=False
            )
            while not solver.converged().all():
                solver.step()
            break
        except SystemExit:
            restarts += 1
            resume = True
            if restarts > 100:
                raise AssertionError("solve did not converge within 100 restarts")
    assert solver.get_iteration() == 3
    assert restarts >= solver.get_iteration()  # at least one restart per fcn eval

    # a fresh resume on the converged workdir fast-forwards without stepping
    solver2 = NewtonSolver(
        ModelState, solverinfo=solverinfo, resume=True, rewind=False
    )
    assert solver2.converged().all()
    assert solver2.get_iteration() == 3


@pytest.mark.slow
def test_rewind(tmp_workdir, monkeypatch):
    """--rewind pops the last logged step so a failed action is retried"""
    config = _setup(tmp_workdir)
    solver = _drive_to_convergence(config)
    assert solver.converged().all()
    # rewinding the last step and resuming re-does it and converges again
    solver3 = NewtonSolver(
        ModelState, solverinfo=config["solverinfo"], resume=True, rewind=True
    )
    while not solver3.converged().all():
        solver3.step()
    assert solver3.get_iteration() == 3


@pytest.mark.slow
def test_fresh_run_in_dirty_workdir(tmp_workdir):
    """a fresh (resume=False) solve in a previously-used workdir must reset
    the stale Krylov state of the earlier run, not adopt it (a stale
    converged Krylov state would short-circuit the first increment solve
    with the OLD run's result)"""
    import json
    import os

    config = _setup(tmp_workdir)
    _drive_to_convergence(config)
    krylov_state_fname = os.path.join(tmp_workdir, "krylov_00", "Krylov_state.json")
    with open(krylov_state_fname) as fptr:
        stale_beta = json.load(fptr)["beta"]["__ndarray__"]

    # a DIFFERENT problem in the same workdir: restart from a zero iterate
    ModelState("zeros").dump(
        config["solverinfo"]["init_iterate_fname"], caller="tests.e2e"
    )
    solver = _drive_to_convergence(config, resume=False)
    # matches the reference's ci_zero_iage trajectory: converged at iteration 3
    assert solver.get_iteration() == 3
    assert (solver._fcn.norm() < 1.0e-6).all()

    # the first Krylov solve really re-ran against the new rhs
    with open(krylov_state_fname) as fptr:
        new_beta = json.load(fptr)["beta"]["__ndarray__"]
    assert new_beta != stale_beta


def _kill_replay_check(
    tmp_path,
    monkeypatch,
    module_names,
    tracer_names,
    extra_args=(),
    setup_fn=None,
    model_state_cls=None,
):
    """golden-trace crash recovery at MAXIMUM fragmentation: the solve is
    killed immediately after EVERY step-log append (the write-ahead commit
    point) and resumed, so each process lifetime completes exactly one new
    step.  The final state and the full step logs (Newton and nested Krylov)
    must be identical to an uninterrupted run.

    This supersedes the reference's reinvoke-per-comp_fcn CI trick
    (/root/reference/nk_ooc/test_problem/model_state.py:110-115), which only
    exercises function-evaluation boundaries: here every logged action --
    increment solves, Armijo trials, shadow copies, fp iterations,
    inc_iteration -- is a kill point.
    """
    import json
    import os

    from newton_krylov_ooc_tpu.core.solver_state import SolverState

    if setup_fn is None:
        setup_fn = lambda workdir: _setup(  # noqa: E731
            workdir, module_names=module_names, extra_args=extra_args
        )
    cls = ModelState if model_state_cls is None else model_state_cls

    # -- uninterrupted golden run -----------------------------------------
    golden_dir = str(tmp_path / "golden")
    os.makedirs(golden_dir)
    config = setup_fn(golden_dir)
    golden = _drive_to_convergence(config, cls=cls)
    golden_iteration = golden.get_iteration()
    golden_iterate = {
        name: golden._iterate.get_tracer_vals(name) for name in tracer_names
    }

    def read_logs(workdir):
        """step logs with the workdir path canonicalized (ci_common.sh's
        log_rewrite analog)"""
        logs = {}
        for rel in ["Newton_state.json"] + [
            os.path.join(d, "Krylov_state.json")
            for d in sorted(os.listdir(workdir))
            if d.startswith("krylov_")
        ]:
            with open(os.path.join(workdir, rel)) as fptr:
                logs[rel] = [
                    step.replace(workdir, "WORKDIR")
                    for step in json.load(fptr)["step_log"]
                ]
        return logs

    golden_logs = read_logs(golden_dir)

    # -- killed run: die after each new step-log append -------------------
    killed_dir = str(tmp_path / "killed")
    os.makedirs(killed_dir)
    config = setup_fn(killed_dir)
    solverinfo = config["solverinfo"]

    orig_log_step = SolverState.log_step
    budget = {"appends": 0}

    def killing_log_step(self, stepval, per_iteration=True):
        is_new = not self.step_logged(stepval, per_iteration)
        orig_log_step(self, stepval, per_iteration)
        if is_new:
            budget["appends"] -= 1
            if budget["appends"] <= 0:
                raise SystemExit("killed at step boundary")

    monkeypatch.setattr(SolverState, "log_step", killing_log_step)

    segments = 0
    resume = False
    while True:
        budget["appends"] = 1  # one new step per process lifetime
        try:
            solver = NewtonSolver(
                cls, solverinfo=solverinfo, resume=resume, rewind=False
            )
            while not solver.converged().all():
                solver.step()
            break
        except SystemExit:
            segments += 1
            resume = True
            assert segments < 500, "kill-replay did not converge"

    total_steps = sum(len(log) for log in golden_logs.values())
    assert segments == total_steps  # every append was a kill point

    assert solver.get_iteration() == golden_iteration
    assert read_logs(killed_dir) == golden_logs
    for name in tracer_names:
        np.testing.assert_allclose(
            solver._iterate.get_tracer_vals(name),
            golden_iterate[name],
            rtol=1.0e-13,
            atol=0.0,
        )
    return golden_iteration


@pytest.mark.slow
def test_kill_replay_every_step_boundary(tmp_path, monkeypatch):
    """kill-replay on the single-module iage config; the golden run must
    match the reference trajectory (converged at Newton iteration 3)"""
    golden_iteration = _kill_replay_check(tmp_path, monkeypatch, "iage", ["iage"])
    assert golden_iteration == 3


@pytest.mark.slow
def test_kill_replay_multi_module(tmp_path, monkeypatch):
    """kill-replay on a parameterized two-module dye_decay family: per-module
    staged Hessenberg/residual state, per-module convergence masks, and
    module-suffix step strings must all replay to the golden trajectory"""
    _kill_replay_check(
        tmp_path,
        monkeypatch,
        "dye_decay_{suff}:004:005",
        ["dye_decay_004", "dye_decay_005"],
        extra_args=("--newton_rel_tol", "1.0e-6"),
    )


@pytest.mark.slow
def test_resume_with_stats_file_lacking_observability_var(tmp_workdir):
    """resuming a run whose stats file predates comp_fcn_seconds must not
    abort: observability writes are best-effort (the define step is
    step-logged, so the variable never appears in the old file)"""
    import os

    from newton_krylov_ooc_tpu.core.newton import NewtonSolver
    from newton_krylov_ooc_tpu.utils.ncio import NCFile

    config = _setup(tmp_workdir)
    solver = _drive_to_convergence(config)
    assert solver.get_iteration() == 3

    # rewrite Newton_stats.nc WITHOUT comp_fcn_seconds, simulating a workdir
    # created by a build that predates the variable
    stats_fname = os.path.join(tmp_workdir, "Newton_stats.nc")
    with NCFile(stats_fname) as fptr:
        dims = {
            name: (None if name == "iteration" else length)
            for name, length in fptr.dimensions.items()
        }
        keep = {
            name: (var.datatype, var.dimensions, dict(var.attrs), var[:])
            for name, var in fptr.variables.items()
            if name != "comp_fcn_seconds"
        }
    os.remove(stats_fname)
    with NCFile(stats_fname, mode="w") as fptr:
        fptr.create_dimensions_verify(dims)
        for name, (datatype, dimensions, attrs, vals) in keep.items():
            var = fptr.create_variable(name, datatype, dimensions, attrs=attrs)
            var[:] = vals

    # resume: __init__ replays the comp_fcn from the step log and then puts
    # observability vars -- which must skip, not raise, on the old file
    resumed = NewtonSolver(
        type(solver._iterate),
        solverinfo=config["solverinfo"],
        resume=True,
        rewind=False,
    )
    assert resumed.converged().all()

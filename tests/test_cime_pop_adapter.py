"""integration test of the external-model (cime_pop) adapter against a mock
CIME case: a trivial linear 'ocean model' run through the full
submit-and-exit / POSTRUN / resume contract, including native tavg averaging
and subprocess preconditioner tools.  (The reference only verified this path
manually on a supercomputer; here it is automated.)
"""

import configparser
import json
import os
import stat
import subprocess
import textwrap

import numpy as np
import pytest

from newton_krylov_ooc_tpu.config.model_config import ModelConfig
from newton_krylov_ooc_tpu.core.newton import NewtonSolver
from newton_krylov_ooc_tpu.utils.ncio import NCFile

NZ, NLAT, NLON = 3, 4, 5
DECAY = 0.5  # mock model: y_end = DECAY * y + FORCING
FORCING = 2.0


def _write_restart(fname, vals, history="mock restart"):
    with NCFile(fname, mode="w") as fptr:
        fptr.history = history
        fptr.create_dimensions_verify({"z_t": NZ, "nlat": NLAT, "nlon": NLON})
        for suffix in ["CUR", "OLD"]:
            var = fptr.create_variable(
                f"IAGE_{suffix}", "f8", ("z_t", "nlat", "nlon")
            )
            var[:] = vals


def _write_tavg(fname, vals):
    with NCFile(fname, mode="w") as fptr:
        fptr.history = "mock tavg"
        fptr.create_dimensions_verify(
            {"time": None, "z_t": NZ, "nlat": NLAT, "nlon": NLON}
        )
        fptr.create_variable("time", "f8", ("time",))[0] = 365.0
        var = fptr.create_variable(
            "IAGE",
            "f8",
            ("time", "z_t", "nlat", "nlon"),
            attrs={"units": "years", "long_name": "mock iage tavg"},
        )
        var[0, ...] = vals
        dz = fptr.create_variable("dz", "f8", ("z_t",))
        dz[:] = np.full(NZ, 100.0e2)  # cm


@pytest.fixture()
def mock_case(tmp_path):
    """a fake CIME caseroot: xml store + executable model scripts"""
    caseroot = tmp_path / "caseroot"
    rundir = tmp_path / "rundir"
    caseroot.mkdir()
    (caseroot / "CaseDocs").mkdir()
    rundir.mkdir()

    xml = {
        "RUNDIR": str(rundir),
        "CASE": "mockcase",
        "RUN_TYPE": "startup",
        "RUN_STARTDATE": "0001-01-01",
        "OCN_GRID": "gx3v7",
        "POP_PASSIVE_TRACER_RESTART_OVERRIDE": "none",
        "CONTINUE_RUN": "FALSE",
        "POSTRUN_SCRIPT": "",
        "STOP_OPTION": "nyears",
        "STOP_N": "1",
        "RESUBMIT": "0",
    }
    (caseroot / "xml.json").write_text(json.dumps(xml))

    def script(name, body):
        path = caseroot / name
        path.write_text("#!/usr/bin/env python3\n" + textwrap.dedent(body))
        path.chmod(path.stat().st_mode | stat.S_IXUSR)

    script(
        "xmlquery",
        f"""
        import json, sys
        xml = json.load(open({str(caseroot / 'xml.json')!r}))
        # CIME's xmlquery --value prints without a trailing newline
        print(xml[sys.argv[2]], end='')
        """,
    )
    script(
        "xmlchange",
        f"""
        import json, sys
        path = {str(caseroot / 'xml.json')!r}
        xml = json.load(open(path))
        key, val = sys.argv[1].split('=', 1)
        xml[key] = val
        json.dump(xml, open(path, 'w'))
        """,
    )
    # case.submit runs the mock model synchronously: read tracer_ic, apply the
    # linear update, write restart + rpointer + tavg (the POSTRUN hook is NOT
    # invoked here; the test loop plays the scheduler and resumes the solver)
    script(
        "case.submit",
        f"""
        import json, sys, os
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.realpath(__file__)))!r})
        import numpy as np
        from newton_krylov_ooc_tpu.utils.ncio import NCFile
        from tests.test_cime_pop_adapter import _write_restart, _write_tavg, DECAY, FORCING
        xml = json.load(open({str(caseroot / 'xml.json')!r}))
        rundir = xml['RUNDIR']
        with NCFile(os.path.join(rundir, 'tracer_ic.nc')) as f:
            ic = f.var('IAGE_CUR')[:]
        end = DECAY * ic + FORCING
        _write_restart(os.path.join(rundir, 'mockcase.pop.r.0002.nc'), end)
        with open(os.path.join(rundir, 'rpointer.ocn.restart'), 'w') as f:
            f.write('mockcase.pop.r.0002.nc\\n')
        _write_tavg(os.path.join(rundir, 'mockcase.pop.h.0001.nc'), 0.5 * (ic + end))
        """,
    )

    # POP namelist (annual tavg output)
    (caseroot / "CaseDocs" / "pop_in").write_text(
        "tavg_freq_opt = 'nyear'\ntavg_freq = 1\n"
    )

    # mock preconditioner tools: gen_A writes the scalar Jacobian; solve_ABdist
    # applies z = x / (DECAY - 1) + x in place (exact inverse Jacobian + I)
    tools = tmp_path / "tools" / "bin"
    tools.mkdir(parents=True)

    def tool(name, body):
        path = tools / name
        path.write_text("#!/usr/bin/env python3\n" + textwrap.dedent(body))
        path.chmod(path.stat().st_mode | stat.S_IXUSR)

    tool(
        "gen_A",
        f"""
        import sys, os
        import numpy as np
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.realpath(__file__)))!r})
        from newton_krylov_ooc_tpu.utils.ncio import NCFile
        from tests.test_cime_pop_adapter import DECAY, NZ, NLAT, NLON
        matrix_fname = sys.argv[-1]
        n = NZ * NLAT * NLON
        with NCFile(matrix_fname, mode='w') as f:
            f.history = 'mock gen_A'
            f.create_dimension('one', 1)
            f.create_variable('jac_scalar', 'f8', ('one',))[:] = DECAY - 1.0
            # CSR form of the same diagonal operator, for the on-device
            # precond_solver_mode=device path
            f.create_dimension('rows_p1', n + 1)
            f.create_dimension('nnz', n)
            # recorded grid decomposition (newer gen_A output); enables the
            # vertical-line precond and the device_mixed solver mode
            f.create_dimension('grid_nz', NZ)
            f.create_dimension('grid_nhoriz', NLAT * NLON)
            f.create_variable('row_ptr', 'f8', ('rows_p1',))[:] = np.arange(n + 1.0)
            f.create_variable('col_ind', 'f8', ('nnz',))[:] = np.arange(float(n))
            f.create_variable('data', 'f8', ('nnz',))[:] = np.full(n, DECAY - 1.0)
            f.create_variable('row_to_cell', 'f8', ('nnz',))[:] = np.arange(float(n))
        """,
    )
    tool(
        "solve_ABdist",
        f"""
        import sys, os
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.realpath(__file__)))!r})
        from newton_krylov_ooc_tpu.utils.ncio import NCFile
        args = sys.argv[1:]
        matrix_fname, res_fname = args[-2], args[-1]
        varnames = args[args.index('-v') + 1].split(',')
        with NCFile(matrix_fname) as f:
            jac = float(f.var('jac_scalar')[:][0])
        with NCFile(res_fname, mode='a') as f:
            for varname in varnames:
                vals = f.var(varname)[:]
                f.var(varname)[:] = vals / jac + vals
        """,
    )

    return {"caseroot": caseroot, "rundir": rundir, "tools": tmp_path / "tools"}


def _build_config(tmp_path, mock_case):
    workdir = tmp_path / "workdir"
    workdir.mkdir()
    rpointer_dir = tmp_path / "rpointers"
    rpointer_dir.mkdir()
    (rpointer_dir / "rpointer.ocn.restart").write_text("mockcase.pop.r.0001.nc\n")

    # grid vars: uniform-volume 3D grid, single region
    grid_vars_fname = workdir / "grid_vars.nc"
    with NCFile(str(grid_vars_fname), mode="w") as fptr:
        fptr.history = "mock grid"
        fptr.create_dimensions_verify({"z_t": NZ, "nlat": NLAT, "nlon": NLON})
        mask = fptr.create_variable(
            "region_mask",
            "i4",
            ("z_t", "nlat", "nlon"),
            attrs={
                "long_name": "Region Mask",
                "cell_measures": "volume: grid_weight",
            },
        )
        mask[:] = np.ones((NZ, NLAT, NLON), np.int32)
        weight = fptr.create_variable("grid_weight", "f8", ("z_t", "nlat", "nlon"))
        weight[:] = np.ones((NZ, NLAT, NLON))

    # tracer module defs
    defs_fname = tmp_path / "defs.yaml"
    defs_fname.write_text(
        textwrap.dedent(
            """
            tracer_module_defs:
                iage:
                    region_mask_varname: "region_mask"
                    tracers:
                        IAGE:
                            attrs: {units: "years"}
                            precond_matrix: iage_like
            precond_matrix_defs:
                base:
                    hist_to_precond_varnames: [dz]
                    precond_matrices_opts:
                        - day_cnt {day_cnt}
                    precond_matrices_solve_opts:
                        gx3v7:
                            task_cnt: 4
                            gigabyte_per_task: 0.1
                iage_like:
                    precond_matrices_opts:
                        - sink_type none
            """
        )
    )

    config = configparser.ConfigParser(
        {
            "HOME": str(tmp_path),
            "USER": "tester",
            "repo_root": str(tmp_path),
            "logging_reproducible": "False",
        },
        allow_no_value=True,
    )
    config["DEFAULT"].update({"model_name": "cime_pop", "workdir": str(workdir)})
    config["solverinfo"] = {
        "cfg_out_fname": str(workdir / "cfg.out"),
        "logging_fname": str(workdir / "nk.log"),
        "logging_level": "INFO",
        "logging_reproducible": "False",
        "init_iterate_fname": str(tmp_path / "init_restart.nc"),
        "newton_rel_tol": "1.0e-10",
        "newton_max_iter": "5",
        "post_newton_fp_iter": "1",
        "krylov_rel_tol": "1.0e-6",
    }
    config["modelinfo"] = {
        "caseroot": str(mock_case["caseroot"]),
        "rpointer_dir": str(tmp_path / "rpointers"),
        "STOP_OPTION": "nyears",
        "STOP_N": "1",
        "RESUBMIT": "0",
        "jacobian_precond_tools_dir": str(mock_case["tools"]),
        "batch_cmd_precond": "",
        "batch_cmd_script": None,
        "mpi_cmd": "",
        "invoker_script_fname": str(workdir / "nk_driver.sh"),
        "grid_vars_fname": str(grid_vars_fname),
        "irf_fname": str(workdir / "irf.nc"),
        "tracer_module_names": "iage",
        "tracer_module_defs_fname": str(defs_fname),
        "gigabyte_per_node": "4",
        "cpus_per_node_max": "8",
    }
    return config


@pytest.mark.slow
@pytest.mark.parametrize(
    "precond_mode",
    [
        "native",
        "device",
        "device_sharded",
        "device_mixed",
        "device_sharded_mixed",
    ],
)
def test_mock_cime_pop_solve(tmp_path, mock_case, monkeypatch, precond_mode):
    """full Newton solve of the mock external model through the adapter

    the fixed point of y -> DECAY*y + FORCING is FORCING/(1-DECAY) = 4.0;
    runs with the external (mock) solve_ABdist tool, with the on-device
    sparse solve (precond_solver_mode=device), with the row-sharded mesh
    solve (precond_solver_mode=device_sharded), and with the
    f32-inner/f64-refinement solves (device_mixed / device_sharded_mixed)
    """
    from newton_krylov_ooc_tpu.models.cime_pop.model_state import ModelState

    config = _build_config(tmp_path, mock_case)
    config["modelinfo"]["precond_solver_mode"] = precond_mode

    # initial restart file (the init iterate)
    _write_restart(
        config["solverinfo"]["init_iterate_fname"],
        np.zeros((NZ, NLAT, NLON)),
    )

    ModelState.model_config_obj = ModelConfig(config["modelinfo"])

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
            # the scheduler's role: the submitted "job" already ran inside
            # case.submit; re-enter the solver with --resume
            restarts += 1
            resume = True
            if restarts > 50:
                raise AssertionError("mock solve did not converge in 50 restarts")

    assert restarts >= 2  # at least one exit per comp_fcn
    # converged to the mock model's fixed point
    iterate = solver._iterate.tracer_modules[0].get_tracer_vals("IAGE")
    assert np.allclose(iterate, FORCING / (1.0 - DECAY), rtol=1e-8)

    # the hist file was produced by native tavg averaging
    hist_files = list((tmp_path / "workdir").glob("hist_*.nc"))
    assert hist_files
    with NCFile(str(hist_files[0])) as fptr:
        assert fptr.has_var("IAGE")

    # precond matrix file was generated through the gen_A-compatible tool
    assert list((tmp_path / "workdir").glob("krylov_00/matrix_iage_like.nc"))


@pytest.mark.slow
def test_mock_cime_pop_batch_precond(tmp_path, mock_case):
    """the batch-submitted preconditioner path: apply_precond_jacobian sizes
    the job from the per-matrix task_cnt/gigabyte tables, submits via
    batch_cmd_precond, and exits; the resumed process runs the solve

    sizing check (reference semantics, cime_pop/model_state.py:232-262):
    task_cnt=4 at 0.1 GB/task on 4 GB nodes with <=8 cpus/node gives
    cpus_per_node=8 (power of two), node_cnt=1
    """
    from newton_krylov_ooc_tpu.models.cime_pop.model_state import ModelState

    config = _build_config(tmp_path, mock_case)
    config["modelinfo"]["precond_solver_mode"] = "native"

    # mock scheduler: record the submission arguments, run nothing
    submit_log = tmp_path / "submit.txt"
    qsub = tmp_path / "qsub"
    qsub.write_text(f"#!/bin/sh\necho \"$@\" >> {submit_log}\n")
    qsub.chmod(qsub.stat().st_mode | stat.S_IXUSR)
    config["modelinfo"]["batch_cmd_precond"] = (
        f"{qsub} --nodes {{node_cnt}} --cpus {{cpus_per_node}}"
    )

    _write_restart(
        config["solverinfo"]["init_iterate_fname"],
        np.zeros((NZ, NLAT, NLON)),
    )
    ModelState.model_config_obj = ModelConfig(config["modelinfo"])

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
            if restarts > 80:
                raise AssertionError("mock solve did not converge in 80 restarts")

    iterate = solver._iterate.tracer_modules[0].get_tracer_vals("IAGE")
    assert np.allclose(iterate, FORCING / (1.0 - DECAY), rtol=1e-8)

    # every precond application went through the mock scheduler with the
    # sized resources and the invoker's --resume re-entry
    submissions = submit_log.read_text().strip().splitlines()
    assert submissions
    for line in submissions:
        assert line.startswith("--nodes 1 --cpus 8 ")
        assert line.endswith("--resume")

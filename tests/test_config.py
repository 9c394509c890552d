"""tests for the cfg-file system and ModelConfig"""

import os

import numpy as np
import pytest

from newton_krylov_ooc_tpu.config.model_config import (
    ModelConfig,
    propagate_base_matrix_defs_to_all,
)
from newton_krylov_ooc_tpu.config.share import common_args, read_cfg_files
from newton_krylov_ooc_tpu.core.spatial_axis import (
    spatial_axis_defn_dict,
    spatial_axis_from_defn_dict,
)
from newton_krylov_ooc_tpu.utils.ncio import NCFile


def config_test_problem(workdir, tracer_module_names=None):
    """build a real test_problem ModelConfig in workdir (no mocks)"""
    args_list = ["--workdir", str(workdir)]
    if tracer_module_names is not None:
        args_list.extend(["--tracer_module_names", tracer_module_names])
    parser, args_remaining = common_args("test_config", "test_problem", args_list)
    args = parser.parse_args(args_remaining)
    config = read_cfg_files(args)

    depth = spatial_axis_from_defn_dict(defn_dict=spatial_axis_defn_dict())
    grid_vars_fname = config["modelinfo"]["grid_vars_fname"]
    depth.dump(grid_vars_fname, caller="tests.test_config.config_test_problem")
    with NCFile(grid_vars_fname, mode="a") as fptr:
        var = fptr.create_variable(
            "region_mask",
            "i4",
            ("depth",),
            attrs={
                "long_name": "Region Mask",
                "cell_measures": "thickness: depth_delta",
            },
        )
        var[:] = np.ones(len(depth), dtype=np.int32)

    return ModelConfig(config["modelinfo"])


def test_parse_args():
    parser, args_remaining = common_args("test_config", "test_problem", [])
    args = parser.parse_args(args_remaining)
    assert args.model_name == "test_problem"


@pytest.mark.parametrize("persist", [False, True])
def test_read_cfg_files(tmp_workdir, persist):
    args_list = ["--workdir", tmp_workdir]
    if persist:
        args_list.append("--persist")
    parser, args_remaining = common_args("test_config", "test_problem", args_list)
    args = parser.parse_args(args_remaining)
    config = read_cfg_files(args)

    assert config["DEFAULT"]["model_name"] == "test_problem"
    assert config["solverinfo"]["newton_max_iter"] == "5"
    assert config["modelinfo"]["reinvoke"] == ("False" if persist else "True")
    # cfg echo written for provenance
    assert os.path.exists(config["solverinfo"]["cfg_out_fname"])


def test_model_config(tmp_workdir):
    model_config_obj = config_test_problem(tmp_workdir)
    assert hasattr(model_config_obj, "modelinfo")
    assert hasattr(model_config_obj, "tracer_module_defs")
    assert hasattr(model_config_obj, "precond_matrix_defs")
    assert hasattr(model_config_obj, "grid_vars")
    assert model_config_obj.region_cnt == 1
    grid_vars = model_config_obj.grid_vars["region_mask"]
    assert grid_vars["region_comp_mean_matrix"].shape == (1, 30)
    # region means are weight-normalized
    assert grid_vars["region_comp_mean_matrix"].sum() == pytest.approx(1.0)


def test_tracer_module_expansion(tmp_workdir):
    model_config_obj = config_test_problem(
        tmp_workdir, "iage,dye_decay_{suff}:001:010"
    )
    names = model_config_obj.modelinfo["tracer_module_names"].split(",")
    assert names == ["iage", "dye_decay_001", "dye_decay_010"]
    assert "dye_decay_001" in model_config_obj.tracer_module_defs
    tracers = model_config_obj.tracer_module_defs["dye_decay_001"]["tracers"]
    assert "dye_decay_001" in tracers
    assert tracers["dye_decay_001"]["attrs"]["long_name"] == "dye decay 001"


def test_unknown_tracer_module_rejected(tmp_workdir):
    with pytest.raises(ValueError):
        config_test_problem(tmp_workdir, "bogus_module")


def test_suffixless_parameterized_module_rejected(tmp_workdir):
    with pytest.raises(ValueError):
        config_test_problem(tmp_workdir, "dye_decay_{suff}")


def test_propagate_base_matrix_defs(tmp_workdir):
    model_config_obj = config_test_problem(tmp_workdir)
    defs = model_config_obj.precond_matrix_defs
    base_def = defs["base"]
    phosphorus = defs["phosphorus"]

    for varname in base_def["hist_to_precond_varnames"]:
        assert varname in phosphorus["hist_to_precond_varnames"]

    base_def["hist_to_precond_varnames"].append("new_hist_var")
    propagate_base_matrix_defs_to_all(defs)
    assert "new_hist_var" in phosphorus["hist_to_precond_varnames"]

    base_def["precond_matrices_opts"] = ["matrix_opt_A sub_opt"]
    propagate_base_matrix_defs_to_all(defs)
    assert "matrix_opt_A sub_opt" in phosphorus["precond_matrices_opts"]

    # first-word-keyed merge: existing opts win, nothing duplicates
    base_def["precond_matrices_opts"].append("matrix_opt_B sub_opt_base")
    phosphorus["precond_matrices_opts"].append("matrix_opt_B sub_opt_phosphorus")
    propagate_base_matrix_defs_to_all(defs)
    assert "matrix_opt_B sub_opt_phosphorus" in phosphorus["precond_matrices_opts"]
    assert "matrix_opt_B sub_opt_base" not in phosphorus["precond_matrices_opts"]
    assert phosphorus["precond_matrices_opts"].count("matrix_opt_A sub_opt") == 1


def test_repro_fname_masking(tmp_workdir):
    """logging_reproducible strips user-specific path components"""
    from newton_krylov_ooc_tpu.config.share import repro_fname

    parser, args_remaining = common_args(
        "test_config",
        "test_problem",
        ["--workdir", tmp_workdir, "--logging_reproducible"],
    )
    args = parser.parse_args(args_remaining)
    config = read_cfg_files(args)
    masked = repro_fname(config["solverinfo"], f"{tmp_workdir}/fcn_00.nc")
    assert masked == "$workdir/fcn_00.nc"
    # without the flag, paths pass through
    parser, args_remaining = common_args(
        "test_config", "test_problem", ["--workdir", tmp_workdir]
    )
    config = read_cfg_files(parser.parse_args(args_remaining))
    assert repro_fname(config["solverinfo"], f"{tmp_workdir}/x") == f"{tmp_workdir}/x"

#!/usr/bin/env python
"""set up files needed to run the NK solver for test_problem: depth axis +
grid-vars file, invoker script, initial iterate (with optional fixed-point
warm-up runs), and an optional comp_fcn profile.
Capability parity: nk_ooc/test_problem/setup_solver.py.
"""

import cProfile
import logging
import os
import pstats
import sys

import numpy as np

from ...cli import gen_invoker_script
from ...config.model_config import ModelConfig
from ...config.share import (
    args_replace,
    common_args,
    logging_config,
    read_cfg_files,
    repro_fname,
)
from ...core.spatial_axis import spatial_axis_defn_dict, spatial_axis_from_defn_dict
from ...ops.compute import ensure_x64
from ...utils.ncio import NCFile, mkdir_exist_okay
from .model_state import ModelState


def parse_args(args_list_in=None):
    args_list = [] if args_list_in is None else args_list_in
    parser, args_remaining = common_args(
        "setup solver for test_problem model", "test_problem", args_list
    )
    defn = spatial_axis_defn_dict(axisname="depth")["nlevs"]
    parser.add_argument(
        "--depth_nlevs", type=defn["type"], help=defn["help"], default=defn["value"]
    )
    parser.add_argument(
        "--init_iterate_opt",
        help="option for specifying initial iterate",
        default="gen_init_iterate",
    )
    parser.add_argument(
        "--fp_cnt",
        type=int,
        help="number of fixed point iterations to apply to init_iterate",
        default=2,
    )
    parser.add_argument(
        "--prof_comp_fcn_fname",
        help="profile comp_fcn call; write output to provided argument",
        default=None,
    )
    parser.add_argument(
        "--deprecation_warning_to_error",
        help="treat DeprecationWarning warnings as errors",
        action="store_true",
    )
    return args_replace(parser.parse_args(args_remaining))


def main(args):
    ensure_x64()

    config = read_cfg_files(args)
    solverinfo = config["solverinfo"]

    logging_config(solverinfo, filemode="w")
    logger = logging.getLogger(__name__)
    logger.info('args.cfg_fnames="%s"', repro_fname(solverinfo, args.cfg_fnames))

    mkdir_exist_okay(solverinfo["workdir"])

    args.model_name = "test_problem"
    gen_invoker_script.main(args)

    modelinfo = config["modelinfo"]
    depth_axisname = modelinfo["depth_axisname"]

    # depth axis from modelinfo + CLI overrides
    defn_dict = {}
    for key, defn in spatial_axis_defn_dict(axisname=depth_axisname).items():
        depth_key = f"{depth_axisname}_{key}"
        if depth_key in modelinfo:
            defn_dict[key] = (defn["type"])(modelinfo[depth_key])
        if hasattr(args, depth_key):
            defn_dict[key] = getattr(args, depth_key)
    depth = spatial_axis_from_defn_dict(defn_dict=spatial_axis_defn_dict(**defn_dict))

    caller = "newton_krylov_ooc_tpu.models.test_problem.setup_solver.main"

    # grid-vars file: the depth axis plus a trivial region mask
    grid_vars_fname = modelinfo["grid_vars_fname"]
    logger.info('grid_vars_fname="%s"', repro_fname(modelinfo, grid_vars_fname))
    mkdir_exist_okay(os.path.dirname(grid_vars_fname))
    depth.dump(grid_vars_fname, caller)

    with NCFile(grid_vars_fname, mode="a") as fptr:
        var = fptr.create_variable(
            "region_mask",
            "i4",
            (depth_axisname,),
            attrs={
                "long_name": "Region Mask",
                "cell_measures": f"thickness: {depth.dump_names['delta']}",
            },
        )
        var[:] = np.ones(len(depth), dtype=np.int32)

    ModelState.model_config_obj = ModelConfig(modelinfo)

    init_iterate = ModelState(args.init_iterate_opt)

    if args.prof_comp_fcn_fname is not None:
        cProfile.runctx(
            "init_iterate.comp_fcn(res_fname=None, solver_state=None, hist_fname=None)",
            globals=None,
            locals={"init_iterate": init_iterate},
            filename=args.prof_comp_fcn_fname,
        )
        stats_obj = pstats.Stats(args.prof_comp_fcn_fname)
        stats_obj.strip_dirs().sort_stats("time").print_stats(20)
        return

    # fixed-point warm-up iterations toward the cyclo-stationary solution
    if args.fp_cnt > 0:
        workdir = solverinfo["workdir"]
        gen_init_iterate_workdir = os.path.join(workdir, "gen_init_iterate")
        mkdir_exist_okay(gen_init_iterate_workdir)

        for fp_iter in range(args.fp_cnt):
            logger.info("fp_iter=%d", fp_iter)
            init_iterate.dump(
                os.path.join(
                    gen_init_iterate_workdir, f"init_iterate_{fp_iter:02}.nc"
                ),
                caller,
            )
            init_iterate_fcn = init_iterate.comp_fcn(
                os.path.join(gen_init_iterate_workdir, f"fcn_{fp_iter:02}.nc"),
                None,
                os.path.join(gen_init_iterate_workdir, f"hist_{fp_iter:02}.nc"),
            )
            init_iterate += init_iterate_fcn
            init_iterate.copy_shadow_tracers_to_real_tracers()

    init_iterate_fname = solverinfo["init_iterate_fname"]
    logger.info(
        'init_iterate_fname="%s"', repro_fname(solverinfo, init_iterate_fname)
    )
    mkdir_exist_okay(os.path.dirname(init_iterate_fname))
    init_iterate.dump(init_iterate_fname, caller)


if __name__ == "__main__":
    main(parse_args(sys.argv[1:]))

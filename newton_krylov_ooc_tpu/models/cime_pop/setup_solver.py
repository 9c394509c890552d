#!/usr/bin/env python
"""set up files needed to run the NK solver for cime_pop: rpointer snapshot,
IRF (impulse-response-function) mean file via native time-averaging, and 3D
grid vars (region mask from KMT/REGION_MASK, volume weights).
Capability parity: nk_ooc/cime_pop/setup_solver.py.
"""

import glob
import logging
import os
import shutil
import sys
from datetime import datetime

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
from ...utils.helpers import strtobool
from ...utils.ncio import NCFile, extract_dimensions, mkdir_exist_okay
from ...utils.ncmean import ann_files_to_mean_file, mon_files_to_mean_file
from ..external.cime import cime_xmlquery, cime_yr_cnt


def parse_args(args_list_in=None):
    args_list = [] if args_list_in is None else args_list_in
    parser, args_remaining = common_args(
        "setup solver for cime_pop model", "cime_pop", args_list
    )
    parser.add_argument(
        "--skip_irf_gen",
        help="skip generating irf file if it exists, default is to overwrite it",
        action="store_true",
    )
    return args_replace(parser.parse_args(args_remaining))


def main(args):
    config = read_cfg_files(args)
    solverinfo = config["solverinfo"]
    modelinfo = config["modelinfo"]

    logging_config(solverinfo, filemode="w")
    logger = logging.getLogger(__name__)
    logger.info('args.cfg_fnames="%s"', repro_fname(solverinfo, args.cfg_fnames))

    mkdir_exist_okay(solverinfo["workdir"])

    # snapshot rpointer files so failed runs can be replayed
    rundir = cime_xmlquery(modelinfo["caseroot"], "RUNDIR")
    rpointer_dir = modelinfo["rpointer_dir"]
    mkdir_exist_okay(rpointer_dir)
    for src in glob.glob(os.path.join(rundir, "rpointer.*")):
        shutil.copy(src, rpointer_dir)

    args.model_name = "cime_pop"
    gen_invoker_script.main(args)

    irf_fname = modelinfo["irf_fname"]
    if os.path.exists(irf_fname) and args.skip_irf_gen:
        logger.info(
            'irf_fname="%s" exists, skipping generation',
            repro_fname(modelinfo, irf_fname),
        )
    else:
        logger.info('generating irf_fname="%s"', repro_fname(modelinfo, irf_fname))
        mkdir_exist_okay(os.path.dirname(irf_fname))
        gen_irf_file(modelinfo)

    grid_vars_fname = modelinfo["grid_vars_fname"]
    logger.info('grid_vars_fname="%s"', repro_fname(modelinfo, grid_vars_fname))
    mkdir_exist_okay(os.path.dirname(grid_vars_fname))
    gen_grid_vars_file(modelinfo)

    # confirm that generated files can be read
    ModelConfig(modelinfo)


def gen_irf_file(modelinfo):
    """time-average IRF tracer output into the IRF mean file"""
    irf_hist_freq_opt = modelinfo["irf_hist_freq_opt"]
    if irf_hist_freq_opt not in ["nyear", "nmonth"]:
        raise NotImplementedError(
            f"irf_hist_freq_opt={irf_hist_freq_opt} not implemented"
        )

    if modelinfo["irf_hist_start_date"] is None:
        if cime_xmlquery(modelinfo["caseroot"], "RUN_TYPE") == "branch":
            varname = "RUN_REFDATE"
        else:
            varname = "RUN_STARTDATE"
        irf_hist_start_date = cime_xmlquery(modelinfo["caseroot"], varname)
    else:
        irf_hist_start_date = modelinfo["irf_hist_start_date"]

    (irf_hist_year0, irf_hist_month0, irf_hist_day0) = irf_hist_start_date.split("-")

    if irf_hist_day0 != "01":
        raise NotImplementedError(f"irf_hist_day0={irf_hist_day0} not implemented")
    if irf_hist_freq_opt == "nyear" and irf_hist_month0 != "01":
        raise NotImplementedError(
            f"irf_hist_month0={irf_hist_month0} not implemented for nyear tavg output"
        )

    if modelinfo["irf_hist_yr_cnt"] is None:
        irf_hist_yr_cnt = cime_yr_cnt(modelinfo)
    else:
        irf_hist_yr_cnt = modelinfo["irf_hist_yr_cnt"]

    caller = f"{__name__}.gen_irf_file"
    irf_case = modelinfo["irf_case"]

    if irf_hist_freq_opt == "nyear":
        fname_fmt = f"{irf_case}.pop.h.{{year:04}}.nc"
        ann_files_to_mean_file(
            modelinfo["irf_hist_dir"],
            fname_fmt,
            int(irf_hist_year0),
            int(irf_hist_yr_cnt),
            modelinfo["irf_fname"],
            caller,
        )
    if irf_hist_freq_opt == "nmonth":
        fname_fmt = f"{irf_case}.pop.h.{{year:04}}-{{month:02}}.nc"
        mon_files_to_mean_file(
            modelinfo["irf_hist_dir"],
            fname_fmt,
            int(irf_hist_year0),
            int(irf_hist_month0),
            12 * int(irf_hist_yr_cnt),
            modelinfo["irf_fname"],
            caller,
        )


def gen_grid_vars_file(modelinfo):
    """3D grid vars from the IRF file: region mask from KMT/REGION_MASK
    (Black Sea optionally region 2), volume weights"""
    irf_fname = modelinfo["irf_fname"]

    with NCFile(irf_fname) as fptr_in:
        history_in = fptr_in.history
        thickness = 1.0e-2 * fptr_in.var("dz")[:]  # cm -> m
        area = 1.0e-4 * fptr_in.var("TAREA")[:]  # cm^2 -> m^2
        kmt = fptr_in.var("KMT")[:]
        region_mask = fptr_in.var("REGION_MASK")[:]
        dimensions_3d = extract_dimensions(fptr_in, ["z_t", "KMT"])

    mask = np.empty(tuple(dimensions_3d.values()), dtype=np.int32)
    for k in range(mask.shape[0]):
        mask[k, :] = np.where((k < kmt) & (region_mask > 0), 1, 0)

    if strtobool(modelinfo["include_black_sea"]):
        for k in range(mask.shape[0]):
            mask[k, :] = np.where((k < kmt) & (region_mask == -13), 2, mask[k, :])

    weight = np.empty(tuple(dimensions_3d.values()))
    for k in range(weight.shape[0]):
        weight[k, :, :] = thickness[k] * np.where(mask[k, :, :] > 0, area, 0.0)

    with NCFile(modelinfo["grid_vars_fname"], mode="w") as fptr_out:
        datestamp = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        msg = (
            f"{datestamp}: created by {__name__}.gen_grid_vars_file "
            f"from {irf_fname}"
        )
        fptr_out.history = msg if history_in is None else "\n".join([msg, history_in])

        fptr_out.create_dimensions_verify(dimensions_3d)

        fptr_out.create_variable(
            "region_mask",
            "i4",
            tuple(dimensions_3d),
            attrs={
                "long_name": "Region Mask",
                "cell_measures": "volume: grid_weight",
            },
        )
        fptr_out.create_variable(
            "DYN_REGMASK",
            "i4",
            tuple(dimensions_3d)[1:],
            attrs={"long_name": "Surface Region Mask"},
        )
        fptr_out.create_variable(
            "grid_weight",
            "f8",
            tuple(dimensions_3d),
            attrs={"long_name": "Ocean Grid-Cell Volume", "units": "m^3"},
        )
        fptr_out.var("region_mask")[:] = mask
        fptr_out.var("DYN_REGMASK")[:] = mask[0, :]
        fptr_out.var("grid_weight")[:] = weight


if __name__ == "__main__":
    main(parse_args(sys.argv[1:]))

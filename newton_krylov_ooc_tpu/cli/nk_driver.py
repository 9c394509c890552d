#!/usr/bin/env python
"""driver for the Newton-Krylov solver.

Runs Newton iterations until the per-(module, region) convergence criterion is
met; honors --resume/--rewind (step-log replay) and a KILL sentinel file.
Capability parity: nk_ooc/nk_driver.py.
"""

import logging
import os
import sys

from ..config.model_config import ModelConfig
from ..config.share import args_replace, common_args, logging_config, read_cfg_files
from ..core.newton import NewtonSolver
from ..core.state import get_model_state_class
from ..ops.compute import ensure_x64


def parse_args(args_list_in=None):
    args_list = [] if args_list_in is None else args_list_in
    parser, args_remaining = common_args(
        "invoke Newton-Krylov solver", "test_problem", args_list
    )
    parser.add_argument(
        "--resume",
        help="resume Newton's method from solver's saved state",
        action="store_true",
        default=False,
    )
    parser.add_argument(
        "--rewind",
        help="rewind last step to recover from error",
        action="store_true",
        default=False,
    )
    return args_replace(parser.parse_args(args_remaining))


def main(args):
    ensure_x64()

    config = read_cfg_files(args)
    solverinfo = config["solverinfo"]

    logging_config(solverinfo, filemode="a")
    logger = logging.getLogger(__name__)

    if os.path.exists("KILL"):
        logger.warning("KILL file detected, exiting")
        raise SystemExit

    lvl = logging.DEBUG if args.resume else logging.INFO

    model_state_class = get_model_state_class(config["DEFAULT"]["model_name"], lvl)
    model_state_class.model_config_obj = ModelConfig(config["modelinfo"], lvl)

    newton_solver = NewtonSolver(
        model_state_class,
        solverinfo=solverinfo,
        resume=args.resume,
        rewind=args.rewind,
    )

    while True:
        if newton_solver.converged().all():
            logger.info("Newton convergence criterion satisfied")
            newton_solver.log()
            break
        newton_solver.step()


if __name__ == "__main__":
    main(parse_args(sys.argv[1:]))

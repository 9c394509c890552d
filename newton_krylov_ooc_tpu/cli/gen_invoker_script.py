#!/usr/bin/env python
"""generate the self-reinvocation script (nk_driver.sh).

The out-of-core mechanism: models that exit after submitting work re-enter the
solver by running this generated script with --resume; the step log then
fast-forwards through completed work.  Capability parity:
nk_ooc/gen_invoker_script.py.
"""

import logging
import os
import stat
import sys

from ..config.share import (
    args_replace,
    cfg_override_args,
    common_args,
    read_cfg_files,
    repro_fname,
)
from ..utils.ncio import mkdir_exist_okay


def gen_invoker_script(args, modelinfo, repo_root):
    """write the invoker script with the current cfg/args frozen in"""
    invoker_script_fname = modelinfo["invoker_script_fname"]
    mkdir_exist_okay(os.path.dirname(invoker_script_fname))

    logger = logging.getLogger(__name__)
    logger.info("generating %s", repro_fname(modelinfo, invoker_script_fname))

    with open(invoker_script_fname, mode="w") as fptr:
        fptr.write("#!/bin/bash\n")
        fptr.write(f"cd {repo_root}\n")
        fptr.write('if [ -f scripts/newton_krylov_env_cmds ]; then\n')
        fptr.write("    source scripts/newton_krylov_env_cmds\n")
        fptr.write("fi\n")
        if getattr(args, "deprecation_warning_to_error", False):
            fptr.write("export PYTHONWARNINGS=error::DeprecationWarning\n")
        mpi_cmd_env_cmds_fname = modelinfo.get("mpi_cmd_env_cmds_fname", None)
        if mpi_cmd_env_cmds_fname is not None:
            fptr.write(f"source {mpi_cmd_env_cmds_fname}\n")

        line = (
            "python -m newton_krylov_ooc_tpu.cli.nk_driver "
            f'--cfg_fnames "{args.cfg_fnames}" '
        )
        if "model_name" in args:
            line += f'--model_name "{args.model_name}" '
        for argname, metadata in cfg_override_args.items():
            if argname not in args:
                continue
            if "action" not in metadata:
                if getattr(args, argname) is not None:
                    line += f'--{argname} "{getattr(args, argname)}" '
            elif metadata["action"] == "store_true":
                if getattr(args, argname):
                    line += f"--{argname} "
            else:
                raise NotImplementedError(
                    f'action={metadata["action"]} not implemented'
                )
        fptr.write(f'{line}"$@"\n')

    fstat = os.stat(invoker_script_fname)
    os.chmod(invoker_script_fname, fstat.st_mode | stat.S_IXUSR)


def parse_args(args_list_in=None):
    args_list = [] if args_list_in is None else args_list_in
    parser, args_remaining = common_args(
        "generate script for invoking nk_driver", "test_problem", args_list
    )
    return args_replace(parser.parse_args(args_remaining))


def main(args):
    config = read_cfg_files(args)
    gen_invoker_script(args, config["modelinfo"], config["DEFAULT"]["repo_root"])


if __name__ == "__main__":
    main(parse_args(sys.argv[1:]))

"""shared infrastructure for the Newton and Krylov solvers: workdir/filename
conventions, tolerances, and stats-var plumbing.

Capability parity: nk_ooc/solver_base.py.
"""

from __future__ import annotations

import logging
import os

import numpy as np

from ..utils.helpers import fmt_vals
from ..utils.ncio import mkdir_exist_okay
from .solver_state import SolverState
from .stats import StatsFile


class SolverBase:
    """base class for iterative solvers with resumable state and stats files"""

    def __init__(self, solver_name, solverinfo, region_cnt, resume, rewind):
        logger = logging.getLogger(__name__)
        logger.debug(
            'solver_name="%s", resume="%r", rewind="%r"', solver_name, resume, rewind
        )

        self._solver_name = solver_name
        self._solverinfo = solverinfo

        workdir = self._get_workdir()
        logger.debug('%s solver workdir="%s"', solver_name, workdir)
        mkdir_exist_okay(workdir)

        self._solver_state = SolverState(solver_name, workdir, resume, rewind)
        self._stats_file = StatsFile(
            solver_name, workdir, region_cnt, self._solver_state
        )
        self._stats_vars_put_metadata = {}

    def get_iteration(self):
        return self._solver_state.get_iteration()

    def _get_workdir(self):
        key = f"{self._solver_name}_workdir"
        if key not in self._solverinfo:
            key = "workdir"
        return self._solverinfo[key]

    def _fname(self, quantity, iteration=None):
        """workdir filename for a quantity at an iteration"""
        if iteration is None:
            iteration = self.get_iteration()
        return os.path.join(self._get_workdir(), f"{quantity}_{iteration:02}.nc")

    def _get_rel_tol(self):
        return float(self._solverinfo[f"{self._solver_name}_rel_tol"])

    def _get_min_iter(self):
        key = f"{self._solver_name}_min_iter"
        return int(self._solverinfo[key]) if key in self._solverinfo else 0

    # -- stats-var plumbing ----------------------------------------------------
    #
    # stats vars come in three categories:
    #   model_state: per tracer module, reduced two ways (mean and norm)
    #   per_tracer_module: one scalar per (module, region)
    #   tracer_module_independent: one value per iteration

    def _def_solver_stats_vars(self, stats_vars_dict, tracer_modules):
        """define solver stats vars, caching put-time metadata"""
        vars_def_metadata = {}
        for key, metadata in stats_vars_dict.items():
            dimensions = metadata["dimensions"]
            if "iteration" in dimensions and dimensions[0] != "iteration":
                raise ValueError("iteration must be first dimension, if present")
            category = metadata["category"]
            put_metadata = {"category": category, "dimensions": dimensions}
            self._stats_vars_put_metadata[key] = put_metadata

            if category == "model_state":
                stats_varnames = {"mean": [], "norm": []}
                for method, varnames in stats_varnames.items():
                    for tracer_module in tracer_modules:
                        repl_dict = {
                            "method": method,
                            "tracer_module_name": tracer_module.name,
                            "tracer_module_units": tracer_module.units,
                        }
                        stats_varname = f"{key}_{method}_{tracer_module.name}"
                        vars_def_metadata[stats_varname] = _finalize_units(
                            fmt_vals(metadata, repl_dict)
                        )
                        varnames.append(stats_varname)
                put_metadata["stats_varnames"] = stats_varnames
            elif category == "per_tracer_module":
                stats_varnames = []
                for tracer_module in tracer_modules:
                    repl_dict = {
                        "tracer_module_name": tracer_module.name,
                        "tracer_module_units": tracer_module.units,
                    }
                    stats_varname = f"{key}_{tracer_module.name}"
                    vars_def_metadata[stats_varname] = _finalize_units(
                        fmt_vals(metadata, repl_dict)
                    )
                    stats_varnames.append(stats_varname)
                put_metadata["stats_varnames"] = stats_varnames
            elif category == "tracer_module_independent":
                vars_def_metadata[key] = metadata
            else:
                raise ValueError(f"unknown category {category}")

        # step-logged so vars are not redefined on resume
        step = f"define {self._solver_name} solver stats file vars"
        if not self._solver_state.step_logged(step, per_iteration=False):
            self._stats_file.def_vars(vars_def_metadata)
        self._solver_state.log_step(step, per_iteration=False)

    def _put_solver_stats_vars_iteration_independent(self, **kwargs):
        """write values of iteration-independent stats vars"""
        vals_dict = {}
        for key, vals in kwargs.items():
            put_metadata = self._stats_vars_put_metadata[key]
            if "iteration" in put_metadata["dimensions"]:
                raise ValueError(
                    "_put_solver_stats_vars should be used "
                    "for vars with the iteration dimension"
                )
            step = f"write {key} vals to stats file"
            if self._solver_state.step_logged(step, per_iteration=False):
                continue
            category = put_metadata["category"]
            if category == "per_tracer_module":
                for ind, stats_varname in enumerate(put_metadata["stats_varnames"]):
                    vals_dict[stats_varname] = vals[ind]
            elif category == "tracer_module_independent":
                vals_dict[key] = vals
            else:
                raise ValueError(f"unknown category {category}")
            self._solver_state.log_step(step, per_iteration=False)
        self._stats_file.put_vars_iteration_invariant(vals_dict)

    def _put_solver_stats_vars(self, **kwargs):
        """write values of per-iteration stats vars"""
        vals_dict = {}
        for key, vals in kwargs.items():
            put_metadata = self._stats_vars_put_metadata[key]
            if "iteration" not in put_metadata["dimensions"]:
                raise ValueError(
                    "_put_solver_stats_vars_iteration_independent should be used "
                    "for vars lacking the iteration dimension"
                )
            step = f"write {key} vals to stats file"
            if self._solver_state.step_logged(step):
                continue
            category = put_metadata["category"]
            if category == "model_state":
                for method in ["mean", "norm"]:
                    vals_reduced = vals.mean() if method == "mean" else vals.norm()
                    for ind, stats_varname in enumerate(
                        put_metadata["stats_varnames"][method]
                    ):
                        vals_dict[stats_varname] = vals_reduced[ind]
            elif category == "per_tracer_module":
                for ind, stats_varname in enumerate(put_metadata["stats_varnames"]):
                    vals_dict[stats_varname] = np.asarray(vals)[ind]
            elif category == "tracer_module_independent":
                vals_dict[key] = vals
            else:
                raise ValueError(f"unknown category {category}")
            self._solver_state.log_step(step)
        self._stats_file.put_vars(self.get_iteration(), vals_dict)


def _finalize_units(metadata):
    """map the literal units string 'None' to no units attribute"""
    attrs = metadata["attrs"]
    if attrs.get("units") == "None":
        attrs["units"] = None
    return metadata

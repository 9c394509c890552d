"""per-solver netCDF stats files (unlimited iteration dim + region dim).

Capability parity with nk_ooc/stats_file.py: Newton_stats.nc / Krylov_stats.nc
hold per-iteration per-(tracer module, region) diagnostics (iterate/fcn/increment
mean & norm, Armijo factors, Krylov iteration counts, preconditioned residual
norms, model-specific reduced tracer fields).  Growth of the iteration dimension
actively fills new records so partially-written files remain valid.
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np

from ..utils.ncio import DEFAULT_FILLVALS, NCFile, datatype_sname
from .solver_state import action_step_log_wrap


class StatsFile:
    """stats file for a solver"""

    def __init__(self, name, workdir, region_cnt, solver_state):
        self._fname = os.path.join(workdir, f"{name}_stats.nc")
        self._create_stats_file(
            name=name,
            fname=self._fname,
            region_cnt=region_cnt,
            solver_state=solver_state,
        )

    @action_step_log_wrap("_create_stats_file {fname}", per_iteration=False)
    def _create_stats_file(self, name, fname, region_cnt, solver_state):
        """create the stats file with its shared dimensions/coordinates"""
        with NCFile(fname, mode="w") as fptr:
            datestamp = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
            fcn_name = f"{type(self).__module__}.{type(self).__name__}._create_stats_file"
            fptr.history = f"{datestamp}: created by {fcn_name} for {name} solver"

            fptr.create_dimensions_verify({"iteration": None, "region": region_cnt})

            fptr.create_variable(
                "iteration",
                "i4",
                ("iteration",),
                attrs={"long_name": f"{name} solver iteration"},
            )
            region_var = fptr.create_variable(
                "region",
                "i4",
                ("region",),
                attrs={
                    "long_name": "region index (0-based)",
                    "comment": (
                        "axis attribute is a work-around to enable pyferret to "
                        "read stats files"
                    ),
                    "axis": "T",
                },
            )
            region_var[:] = np.arange(region_cnt, dtype=np.int32)

    @property
    def fname(self):
        return self._fname

    def def_dimensions(self, dimensions):
        with NCFile(self._fname, mode="a") as fptr:
            fptr.create_dimensions_verify(dimensions)

    def def_vars(self, vars_metadata, caller=None):
        """define stats vars; iteration-dimensioned vars get a _FillValue for
        active filling when the record dimension grows"""
        with NCFile(self._fname, mode="a") as fptr:
            for metadata in vars_metadata.values():
                metadata.setdefault("attrs", {})
                if (
                    "_FillValue" not in metadata["attrs"]
                    and "iteration" in metadata["dimensions"]
                ):
                    datatype = metadata.get("datatype", "f8")
                    if not isinstance(datatype, str):
                        datatype = datatype_sname(datatype)
                    metadata["attrs"]["_FillValue"] = DEFAULT_FILLVALS[datatype]
            for varname, metadata in vars_metadata.items():
                datatype = metadata.get("datatype", "f8")
                fptr.create_variable(
                    varname, datatype, metadata["dimensions"], metadata["attrs"]
                )
            if caller is not None:
                datestamp = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
                varnames = ",".join(vars_metadata)
                fptr.prepend_history(
                    f"{datestamp}: {varnames} appended by StatsFile.def_vars "
                    f"called by {caller}"
                )

    def put_vars_iteration_invariant(self, name_vals_dict):
        """write values of vars that lack the iteration dimension"""
        if not name_vals_dict:
            return
        with NCFile(self._fname, mode="a") as fptr:
            for name, vals in name_vals_dict.items():
                var = fptr.var(name)
                if "iteration" in var.dimensions:
                    raise RuntimeError(f"iteration is a dimension for {name}")
                var[:] = vals

    def put_vars(self, iteration, name_vals_dict):
        """write values for one iteration index, growing the record dim as needed"""
        if not name_vals_dict:
            return
        with NCFile(self._fname, mode="a") as fptr:
            if iteration == fptr.dim_len("iteration"):
                _grow_iteration(fptr)
            for name, vals in name_vals_dict.items():
                var = fptr.var(name)
                if "iteration" not in var.dimensions:
                    raise RuntimeError(f"iteration is not a dimension for {name}")
                var[iteration, ...] = vals


def _grow_iteration(fptr):
    """extend the iteration record dim by one, actively filling new records"""
    iteration = fptr.dim_len("iteration")
    for name, var in fptr.variables.items():
        if name == "iteration":
            var[iteration] = iteration
        elif var.dimensions and var.dimensions[0] == "iteration":
            var[iteration, ...] = var.attrs["_FillValue"]

"""irf_offline tracer-module state: 3D (z_t, nlat, nlon) tracers.

Tracer modules are generic and fully YAML-driven: what distinguishes iage
from a dye is its per-tracer source/sink/restoring spec, read here and
turned into rate fields by the model state.  This mirrors how the
reference's cime_pop modules differ only in their POP namelist + gen_A
options (/root/reference/nk_ooc/cime_pop/tracer_module_state.py), with the
transport always supplied by the circulation fields.
"""

from __future__ import annotations

import logging

import numpy as np

from ...core.state import TracerModuleState as TracerModuleStateBase
from ...utils.ncio import NCFile, datatype_sname, extract_dimensions

SEC_PER_YEAR = 365.0 * 86400.0


class TracerModuleState(TracerModuleStateBase):
    """3D offline-transport tracer module"""

    def __init__(self, tracer_module_name, fname, model_config_obj, grid_shape,
                 depth_mid_cm):
        self._grid_shape = tuple(grid_shape)
        self._depth_mid_cm = np.asarray(depth_mid_cm)
        self._grid_dimnames = ("z_t", "nlat", "nlon")
        super().__init__(tracer_module_name, fname, model_config_obj)

    def grid_dims(self):
        return self._grid_dimnames

    def _load_vals(self, fname):
        logger = logging.getLogger(__name__)
        logger.debug('tracer_module_name="%s", fname="%s"', self.name, fname)
        shape = self._grid_shape
        if fname == "zeros":
            return np.zeros((self.tracer_cnt, *shape))
        if fname == "gen_init_iterate":
            vals = np.empty((self.tracer_cnt, *shape))
            tracers_metadata = self._tracer_module_def["tracers"]
            for ind, (tracer_name, md) in enumerate(tracers_metadata.items()):
                if "init_iterate_vals" in md:
                    column = np.interp(
                        1.0e-2 * self._depth_mid_cm,  # cm -> m, as in the defs
                        md["init_iterate_val_depths"],
                        md["init_iterate_vals"],
                    )
                    vals[ind] = column[:, None, None]
                else:
                    vals[ind] = float(md.get("init_iterate_val", 0.0))
            return vals
        with NCFile(fname) as fptr:
            vals = np.empty((self.tracer_cnt, *shape))
            for ind, tracer_name in enumerate(self.tracer_names):
                dimensions = extract_dimensions(fptr, tracer_name)
                if tuple(dimensions.values()) != shape:
                    raise ValueError(
                        f"unexpected dimension lengths for {tracer_name} in {fname}"
                    )
                vals[ind] = fptr.var(tracer_name)[:]
            self._grid_dimnames = tuple(dimensions)
        return vals

    def dump(self, fptr, action):
        if action == "define":
            fptr.create_dimensions_verify(
                dict(zip(self._grid_dimnames, self._grid_shape))
            )
            fptr.create_vars(
                {
                    tracer_name: {"dimensions": self._grid_dimnames}
                    for tracer_name in self.tracer_names
                }
            )
        elif action == "write":
            for ind, tracer_name in enumerate(self.tracer_names):
                fptr.var(tracer_name)[:] = self._vals[ind]
        else:
            raise ValueError(f"unknown action={action}")
        return self

    # -- source/sink spec (consumed by the model state) -----------------------

    def rate_specs(self):
        """per-tracer (source_rate [tracer/s], sink_diag [1/s] 3D builders)

        YAML keys per tracer (all optional):
          source_per_year      constant volumetric source [tracer/yr]
          sink_rate_per_year   uniform first-order decay [1/yr]
          surf_restore_pv_cm_s piston velocity [cm/s]; surface-layer
                               restoring at rate pv/dz_surf (gen_A `pv`
                               convention, gen_A.cpp:19-21)
          surf_restore_target  restoring target (default 0)
        """
        specs = []
        for tracer_name, md in self._tracer_module_def["tracers"].items():
            specs.append(
                {
                    "name": tracer_name,
                    "source_per_year": float(md.get("source_per_year", 0.0)),
                    "sink_rate_per_year": float(
                        md.get("sink_rate_per_year", 0.0)
                    ),
                    "surf_restore_pv_cm_s": float(
                        md.get("surf_restore_pv_cm_s", 0.0)
                    ),
                    "surf_restore_target": float(
                        md.get("surf_restore_target", 0.0)
                    ),
                }
            )
        return specs

    # -- history variables -----------------------------------------------------

    def hist_vars_metadata_tracer_like(self):
        return {
            tracer_name: {"attrs": md["attrs"]}
            for tracer_name, md in self._tracer_module_def["tracers"].items()
        }

    def hist_vars_metadata(self):
        res = {}
        dims3 = self._grid_dimnames
        for name, md in self.hist_vars_metadata_tracer_like().items():
            attrs = md["attrs"]
            res[name] = {
                "dimensions": ("time",) + dims3,
                "attrs": attrs.copy(),
            }
            res[f"{name}_time_mean"] = {
                "dimensions": dims3,
                "attrs": {**attrs, "long_name": attrs["long_name"] + ", time mean"},
            }
            res[f"{name}_horiz_mean"] = {
                "dimensions": ("time", dims3[0]),
                "attrs": {
                    **attrs,
                    "long_name": attrs["long_name"]
                    + ", volume-weighted horizontal mean",
                },
            }
        return res

    @staticmethod
    def hist_time_mean_weights(fptr):
        """trapezoid weights over the hist time samples (endpoints halved)"""
        timelen = fptr.dim_len("time")
        weights = np.full(timelen, 1.0 / (timelen - 1))
        weights[0] *= 0.5
        weights[-1] *= 0.5
        return weights

    def write_hist_vars(self, fptr, tracer_vals_all, horiz_weights):
        """tracer_vals_all: (tracer_cnt, nt, nz, nlat, nlon);
        horiz_weights: (nlat, nlon) cell areas (masked cells zero)"""
        time_weights = self.hist_time_mean_weights(fptr)
        wsum = horiz_weights.sum()
        for ind, name in enumerate(self.hist_vars_metadata_tracer_like()):
            vals = tracer_vals_all[ind]
            fptr.var(name)[:] = vals
            fptr.var(f"{name}_time_mean")[:] = np.einsum(
                "i,i...", time_weights, vals
            )
            fptr.var(f"{name}_horiz_mean")[:] = (
                np.einsum("tkji,ji->tk", vals, horiz_weights) / wsum
            )

    # -- stats -----------------------------------------------------------------

    def stats_dimensions(self, fptr):
        return {"z_t": self._grid_shape[0]}

    def stats_vars_metadata(self, fptr_hist):
        res = {}
        for name in self.stats_vars_tracer_like():
            var = fptr_hist.var(name)
            attrs = {
                key: val for key, val in var.attrs.items() if key != "cell_methods"
            }
            res[f"{name}_horiz_mean"] = {
                "datatype": datatype_sname(var.datatype),
                "dimensions": ("iteration", "z_t"),
                "attrs": attrs,
            }
        return res

    def stats_vars_vals_iteration_invariant(self, fptr_hist):
        return {}

    def stats_vars_vals(self, fptr_hist):
        time_weights = self.hist_time_mean_weights(fptr_hist)
        res = {}
        for name in self.stats_vars_tracer_like():
            vals = fptr_hist.var(f"{name}_horiz_mean")[:]
            res[f"{name}_horiz_mean"] = np.einsum("i,i...", time_weights, vals)
        return res

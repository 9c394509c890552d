"""abio_dic_dic14 tracer module for cime_pop: abiotic DIC / DIC-14.

Adds an area-integrated surface gas-flux stat (FG_ABIO_DIC, converted to
Pg/year) and the derived ABIO_D14Cocn field to the stats file.
Behavioral spec: nk_ooc/cime_pop/abio_dic_dic14.py.
"""

from __future__ import annotations

import numpy as np

from .tracer_module_state import TracerModuleState


class abio_dic_dic14(TracerModuleState):  # noqa: N801
    """abio_dic_dic14 tracer module"""

    def stats_vars_metadata(self, fptr_hist):
        res = super().stats_vars_metadata(fptr_hist)

        var = fptr_hist.var("FG_ABIO_DIC")
        attrs = {
            key: val
            for key, val in var.attrs.items()
            if key not in ("cell_methods", "coordinates", "grid_loc")
        }
        attrs["long_name"] = "integrated surface gas flux of abiotic DIC"
        attrs["units"] = "Pg/year"
        res["FG_ABIO_DIC_int_nlat_nlon"] = {
            "datatype": "f8",
            "dimensions": ("iteration", "region"),
            "attrs": attrs,
        }
        return res

    def stats_vars_tracer_like(self):
        res = super().stats_vars_tracer_like()
        res.append("ABIO_D14Cocn")
        return res

    def stats_vars_vals(self, fptr_hist):
        res = super().stats_vars_vals(fptr_hist)

        tracer_name = self.tracer_names[0]
        region_mask_surf = self.get_grid_vars(tracer_name)["region_mask"][0, :, :]
        if region_mask_surf.max() != self.model_config_obj.region_cnt:
            raise RuntimeError("region_cnt_surf != region_cnt")

        tarea = fptr_hist.var("TAREA")[:]
        hist_var_vals = tarea * fptr_hist.var("FG_ABIO_DIC")[:][0, :]
        stats_var_vals = np.empty(self.model_config_obj.region_cnt)
        for region_ind in range(self.model_config_obj.region_cnt):
            stats_var_vals[region_ind] = np.where(
                region_mask_surf == region_ind + 1, hist_var_vals, 0.0
            ).sum()
        # nmol/cm^2/s * cm^2 -> Pg C / year
        stats_var_vals *= 1.0e-9 * 12.0 * 1.0e-15 * 86400.0 * 365.0
        res["FG_ABIO_DIC_int_nlat_nlon"] = stats_var_vals
        return res

"""native time-averaging utilities (the reference's NCO `ncra` subprocess
replacement, nk_ooc/utils.py:417-485) -- weighted multi-file means and the
monthly climatology that feeds the irf_offline seasonal circulation."""

import numpy as np

from newton_krylov_ooc_tpu.utils import ncmean
from newton_krylov_ooc_tpu.utils.ncio import NCFile

NZ, NLAT, NLON = 2, 3, 4


def _write_monthly(dir_in, year, month, uet_val):
    fname = f"hist.{year:04d}-{month:02d}.nc"
    with NCFile(str(dir_in / fname), mode="w") as fptr:
        fptr.create_dimension("time", None)
        fptr.create_dimensions_verify(
            {"z_t": NZ, "nlat": NLAT, "nlon": NLON}
        )
        fptr.create_variable("time", "f8", ("time",))[0:1] = [
            float(12 * year + month)
        ]
        var = fptr.create_variable(
            "UET", "f8", ("time", "z_t", "nlat", "nlon"),
            attrs={"units": "cm^3/s"},
        )
        var[0:1] = np.full((1, NZ, NLAT, NLON), uet_val)
        fptr.create_variable("TAREA", "f8", ("nlat", "nlon"))[:] = np.full(
            (NLAT, NLON), 7.0
        )
    return fname


def test_files_to_mean_file_weighted(tmp_path):
    fnames = [
        _write_monthly(tmp_path, 1, month, float(month))
        for month in (1, 2)
    ]
    out = ncmean.files_to_mean_file(
        str(tmp_path), fnames, [3.0, 1.0], "mean.nc", "tests.ncmean"
    )
    with NCFile(out) as fptr:
        got = np.asarray(fptr.var("UET")[:])
        np.testing.assert_allclose(got, (3.0 * 1.0 + 1.0 * 2.0) / 4.0)
        np.testing.assert_allclose(np.asarray(fptr.var("TAREA")[:]), 7.0)
        assert "mean of 2 files" in fptr.history


def test_mon_files_to_climatology_file(tmp_path):
    """per-calendar-month averages across years, stacked on a `month` dim
    -- and the result drops straight into the seasonal stencil builder"""
    for year in (1, 2):
        for month in range(1, 13):
            # month signal +/- a year-dependent offset that must average out
            _write_monthly(
                tmp_path, year, month, 10.0 * month + (1.0 if year == 1 else -1.0)
            )
    out = ncmean.mon_files_to_climatology_file(
        str(tmp_path), "hist.{year:04d}-{month:02d}.nc", 1, 2,
        "climatology.nc", "tests.ncmean",
    )
    with NCFile(out) as fptr:
        assert fptr.dim_len("month") == 12
        got = np.asarray(fptr.var("UET")[:])
        assert got.shape == (12, NZ, NLAT, NLON)
        np.testing.assert_allclose(
            got[:, 0, 0, 0], 10.0 * np.arange(1, 13)
        )
        # non-record vars copied; the time coordinate is replaced by month
        np.testing.assert_allclose(np.asarray(fptr.var("TAREA")[:]), 7.0)
        assert not fptr.has_var("time")
        assert "monthly climatology" in fptr.history

        # consumable as a seasonal circulation field
        from newton_krylov_ooc_tpu.ops.transport3d import (
            build_transport3d,
            transport_coef_n_time,
        )

        mask = np.ones((NZ, NLAT, NLON), np.int32)
        coef = build_transport3d(
            mask, np.full(NZ, 100.0), np.full((NLAT, NLON), 7.0), uet=got
        )
        assert transport_coef_n_time(coef) == 12

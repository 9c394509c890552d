"""cime_pop setup_solver config space: IRF mean-file generation across the
supported tavg configurations (nyear / nmonth, mid-year starts, branch-run
reference dates) and 3D grid-vars construction from the IRF file
(capability parity: nk_ooc/cime_pop/setup_solver.py:100-233)."""

import numpy as np
import pytest

from newton_krylov_ooc_tpu.models.cime_pop import setup_solver as ss
from newton_krylov_ooc_tpu.utils.ncio import NCFile

NZ, NLAT, NLON = 3, 4, 5

DAYS_IN_MONTH = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def _write_hist(path, val):
    with NCFile(str(path), mode="w") as fptr:
        fptr.create_dimension("time", None)
        fptr.create_dimensions_verify(
            {"z_t": NZ, "nlat": NLAT, "nlon": NLON}
        )
        fptr.create_variable("time", "f8", ("time",))[0:1] = [float(val)]
        var = fptr.create_variable(
            "UET", "f8", ("time", "z_t", "nlat", "nlon"),
            attrs={"units": "cm^3/s"},
        )
        var[0:1] = np.full((1, NZ, NLAT, NLON), float(val))


def _modelinfo(tmp_path, **kwargs):
    info = {
        "caseroot": str(tmp_path / "caseroot"),
        "irf_case": "irf_case",
        "irf_hist_dir": str(tmp_path),
        "irf_fname": str(tmp_path / "irf.nc"),
        "irf_hist_freq_opt": "nyear",
        "irf_hist_start_date": "0001-01-01",
        "irf_hist_yr_cnt": "2",
    }
    info.update(kwargs)
    return info


def test_gen_irf_file_nyear_mean(tmp_path):
    """annual tavg output: plain mean of yr_cnt files starting at year0"""
    for year, val in ((3, 10.0), (4, 20.0), (5, 99.0)):
        _write_hist(tmp_path / f"irf_case.pop.h.{year:04d}.nc", val)
    ss.gen_irf_file(
        _modelinfo(tmp_path, irf_hist_start_date="0003-01-01")
    )
    with NCFile(str(tmp_path / "irf.nc")) as fptr:
        np.testing.assert_allclose(np.asarray(fptr.var("UET")[:]), 15.0)


def test_gen_irf_file_nmonth_midyear_start(tmp_path):
    """monthly tavg output starting mid-year: 12*yr_cnt files spanning the
    year boundary, averaged with noleap month-length weights"""
    month0 = 7
    vals = {}
    for inc in range(12):
        year = 1 + (month0 - 1 + inc) // 12
        month = (month0 - 1 + inc) % 12 + 1
        val = float(10 * inc + 1)
        vals[inc] = val
        _write_hist(
            tmp_path / f"irf_case.pop.h.{year:04d}-{month:02d}.nc", val
        )
    ss.gen_irf_file(
        _modelinfo(
            tmp_path,
            irf_hist_freq_opt="nmonth",
            irf_hist_start_date="0001-07-01",
            irf_hist_yr_cnt="1",
        )
    )
    weights = [DAYS_IN_MONTH[(month0 - 1 + inc) % 12] for inc in range(12)]
    expected = sum(w * vals[i] for i, w in enumerate(weights)) / sum(weights)
    with NCFile(str(tmp_path / "irf.nc")) as fptr:
        np.testing.assert_allclose(np.asarray(fptr.var("UET")[:]), expected)


def test_irf_window_defaults_from_case(tmp_path, monkeypatch):
    """start date and year count default to the case's own settings:
    branch runs key off RUN_REFDATE, others off RUN_STARTDATE, and the
    duration comes through cime_yr_cnt"""
    queries = {"RUN_TYPE": "branch", "RUN_REFDATE": "0007-03-01"}
    monkeypatch.setattr(
        ss, "cime_xmlquery", lambda caseroot, var: queries[var]
    )
    monkeypatch.setattr(ss, "cime_yr_cnt", lambda modelinfo: 4)
    info = _modelinfo(
        tmp_path, irf_hist_start_date=None, irf_hist_yr_cnt=None
    )
    assert ss._irf_averaging_window(info) == (7, 3, 4)

    queries = {"RUN_TYPE": "startup", "RUN_STARTDATE": "0002-01-01"}
    assert ss._irf_averaging_window(info) == (2, 1, 4)


@pytest.mark.parametrize(
    "kwargs, detail",
    [
        ({"irf_hist_freq_opt": "nday"}, "irf_hist_freq_opt=nday"),
        ({"irf_hist_start_date": "0001-01-15"}, "irf_hist_day0=15"),
        (
            {"irf_hist_start_date": "0001-05-01"},
            "irf_hist_month0=05 not implemented for nyear",
        ),
    ],
)
def test_gen_irf_file_rejects_unsupported(tmp_path, kwargs, detail):
    """configurations outside the supported envelope fail loudly rather
    than average the wrong files (reference parity:
    nk_ooc/cime_pop/setup_solver.py:106-131)"""
    with pytest.raises(NotImplementedError, match=detail.split()[0]):
        ss.gen_irf_file(_modelinfo(tmp_path, **kwargs))


def _write_irf_grid_file(path):
    """IRF mean file carrying the POP grid fields gen_grid_vars_file reads"""
    kmt = np.zeros((NLAT, NLON), np.int32)
    kmt[1, :] = NZ          # full-depth ocean row
    kmt[2, :] = 1           # single-layer shelf row
    kmt[3, 0] = NZ          # Black Sea column (see REGION_MASK below)
    region = np.zeros((NLAT, NLON), np.int32)
    region[kmt > 0] = 1
    region[3, 0] = -13      # POP's Black Sea region code
    with NCFile(str(path), mode="w") as fptr:
        fptr.create_dimensions_verify(
            {"z_t": NZ, "nlat": NLAT, "nlon": NLON}
        )
        fptr.create_variable("dz", "f8", ("z_t",))[:] = np.full(NZ, 500.0)
        fptr.create_variable("TAREA", "f8", ("nlat", "nlon"))[:] = np.full(
            (NLAT, NLON), 2.0e4
        )
        fptr.create_variable("KMT", "i4", ("nlat", "nlon"))[:] = kmt
        fptr.create_variable(
            "REGION_MASK", "i4", ("nlat", "nlon")
        )[:] = region
        fptr.history = "irf file"
    return kmt, region


@pytest.mark.parametrize("include_black_sea", ["True", "False"])
def test_gen_grid_vars_file(tmp_path, include_black_sea):
    """3D region mask from KMT/REGION_MASK (ocean above the bottom cell is
    region 1; Black Sea optionally region 2), volume weights zero outside
    the mask, surface DYN_REGMASK, and provenance chaining"""
    irf_fname = tmp_path / "irf.nc"
    kmt, _region = _write_irf_grid_file(irf_fname)
    info = {
        "irf_fname": str(irf_fname),
        "grid_vars_fname": str(tmp_path / "grid_vars.nc"),
        "include_black_sea": include_black_sea,
    }
    ss.gen_grid_vars_file(info)

    with NCFile(info["grid_vars_fname"]) as fptr:
        mask = np.asarray(fptr.var("region_mask")[:])
        dyn = np.asarray(fptr.var("DYN_REGMASK")[:])
        weight = np.asarray(fptr.var("grid_weight")[:])
        history = fptr.history
        cell_measures = fptr.var("region_mask").attrs["cell_measures"]

    assert mask.shape == (NZ, NLAT, NLON)
    # ocean rows: region 1 above the bottom, 0 below it
    assert (mask[:, 1, :] == 1).all()
    assert (mask[0, 2, :] == 1).all() and (mask[1:, 2, :] == 0).all()
    assert (mask[:, 0, :] == 0).all()  # land row
    # Black Sea column is region 2 when included, excluded entirely if not
    expected_bs = 2 if include_black_sea == "True" else 0
    assert (mask[:, 3, 0] == expected_bs).all()

    np.testing.assert_array_equal(dyn, mask[0])
    # weights: dz [cm->m] * TAREA [cm^2->m^2] inside the mask, zero outside
    cell_vol = (500.0 * 1.0e-2) * (2.0e4 * 1.0e-4)
    np.testing.assert_allclose(weight[mask > 0], cell_vol)
    assert (weight[mask == 0] == 0.0).all()
    assert cell_measures == "volume: grid_weight"
    assert "gen_grid_vars_file" in history and "irf file" in history

"""cime_pop history generation (_gen_hist): the tavg-configuration
envelope beyond the mock solve's single nyear path -- the nmonth averaging
branch and the loud rejection of unsupported namelist/date configurations"""

import numpy as np
import pytest

from newton_krylov_ooc_tpu.models.cime_pop import model_state as ms_mod
from newton_krylov_ooc_tpu.utils.ncio import NCFile


def _patch_case(monkeypatch, tmp_path, *, freq_opt, freq, run_type="startup",
                startdate="0001-01-01", refdate="0001-01-01"):
    """route the namelist/xml queries _gen_hist makes to canned values"""
    xml = {
        "RUN_TYPE": run_type,
        "RUN_STARTDATE": startdate,
        "RUN_REFDATE": refdate,
        "RUNDIR": str(tmp_path),
        "CASE": "case0",
    }
    nl = {"tavg_freq_opt(1)": f"'{freq_opt}'", "tavg_freq": freq}
    monkeypatch.setattr(
        ms_mod, "cime_xmlquery", lambda caseroot, var: xml[var]
    )
    monkeypatch.setattr(
        ms_mod, "pop_nl_var_exists", lambda caseroot, var: var in nl
    )
    monkeypatch.setattr(
        ms_mod, "get_pop_nl_var", lambda caseroot, var: nl[var]
    )
    monkeypatch.setattr(ms_mod, "cime_yr_cnt", lambda modelinfo: 1)


def _write_tavg(path, value):
    with NCFile(str(path), mode="w") as fptr:
        fptr.create_dimensions_verify({"time": None, "z": 2})
        var = fptr.create_variable("TR", "f8", ("time", "z"))
        var[:] = np.full((1, 2), float(value))


def test_gen_hist_nmonth_weighted_mean(monkeypatch, tmp_path):
    """the nmonth branch averages 12 monthly files with noleap weights"""
    _patch_case(monkeypatch, tmp_path, freq_opt="nmonth", freq="1")
    month_days = np.array(
        [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31], np.float64
    )
    for month in range(1, 13):
        _write_tavg(tmp_path / f"case0.pop.h.0001-{month:02}.nc", month)

    hist_fname = str(tmp_path / "hist.nc")
    ms_mod._gen_hist({"caseroot": "unused"}, hist_fname)

    expected = (np.arange(1, 13) * month_days).sum() / month_days.sum()
    with NCFile(hist_fname) as fptr:
        vals = np.asarray(fptr.var("TR")[:])
    assert np.allclose(vals, expected)


def test_gen_hist_nyear_branch_refdate(monkeypatch, tmp_path):
    """branch runs average starting from RUN_REFDATE, not RUN_STARTDATE"""
    _patch_case(
        monkeypatch, tmp_path, freq_opt="nyear", freq="1",
        run_type="branch", startdate="0099-01-01", refdate="0003-01-01",
    )
    _write_tavg(tmp_path / "case0.pop.h.0003.nc", 7.0)
    hist_fname = str(tmp_path / "hist.nc")
    ms_mod._gen_hist({"caseroot": "unused"}, hist_fname)
    with NCFile(hist_fname) as fptr:
        assert np.allclose(np.asarray(fptr.var("TR")[:]), 7.0)


@pytest.mark.parametrize(
    "kwargs,detail",
    [
        (dict(freq_opt="ndays", freq="1"), "tavg_freq_opt_0"),
        (dict(freq_opt="nyear", freq="2"), "tavg_freq_0"),
        (dict(freq_opt="nyear", freq="1", startdate="0001-01-15"), "day"),
        (dict(freq_opt="nyear", freq="1", startdate="0001-07-01"), "month"),
    ],
)
def test_gen_hist_rejects_unsupported(monkeypatch, tmp_path, kwargs, detail):
    """configurations outside the supported envelope raise, naming the
    offending quantity, instead of averaging the wrong files"""
    _patch_case(monkeypatch, tmp_path, **kwargs)
    with pytest.raises(NotImplementedError, match=detail):
        ms_mod._gen_hist({"caseroot": "unused"}, str(tmp_path / "hist.nc"))


def test_gen_hist_no_hist_fname_is_noop(monkeypatch, tmp_path):
    """hist_fname=None skips generation entirely (no queries made)"""

    def boom(*args):
        raise AssertionError("should not query the case")

    monkeypatch.setattr(ms_mod, "cime_xmlquery", boom)
    ms_mod._gen_hist({"caseroot": "unused"}, None)


def test_matrix_block_decomp():
    """power-of-2 task counts factor into near-square 2D process grids"""
    assert ms_mod.matrix_block_decomp(64) == (8, 8)
    assert ms_mod.matrix_block_decomp(256) == (16, 16)
    assert ms_mod.matrix_block_decomp(128) == (8, 16)
    with pytest.raises(ValueError):
        ms_mod.matrix_block_decomp(96)

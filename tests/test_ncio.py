"""tests for the netCDF3 IO layer"""

import os

import numpy as np
import pytest

from newton_krylov_ooc_tpu.utils.ncio import (
    NCFile,
    extract_dimensions,
    isclose_all_vars,
    metadata_same,
)


def _write_sample(fname, scale=1.0, units="mol / m^3", extra_attr=None):
    with NCFile(fname, mode="w") as fptr:
        fptr.stamp_history("test._write_sample")
        fptr.create_dimensions_verify({"depth": 4, "time": None})
        var = fptr.create_variable(
            "conc", "f8", ("depth",), attrs={"units": units, "long_name": "conc"}
        )
        var[:] = scale * np.array([0.0, 1.0, 2.0, 4.0])
        if extra_attr:
            var.setncattr("note", extra_attr)
        ivar = fptr.create_variable("count", "i4", ("depth",))
        ivar[:] = np.arange(4, dtype=np.int32)
        rec = fptr.create_variable("series", "f8", ("time", "depth"))
        rec[0, :] = np.ones(4)
        rec[1, :] = 2.0 * np.ones(4)


def test_roundtrip(tmp_workdir):
    fname = os.path.join(tmp_workdir, "sample.nc")
    _write_sample(fname)
    with NCFile(fname) as fptr:
        assert fptr.dim_len("depth") == 4
        assert fptr.dim_len("time") == 2
        assert fptr.var("conc").attrs["units"] == "mol / m^3"
        assert np.array_equal(fptr.var("conc")[:], [0.0, 1.0, 2.0, 4.0])
        assert fptr.var("count").datatype == np.dtype("int32")
        assert np.array_equal(fptr.var("series")[1, :], 2.0 * np.ones(4))
        assert "created by test._write_sample" in fptr.history
        assert extract_dimensions(fptr, "series") == {"time": 2, "depth": 4}
        assert extract_dimensions(fptr, "depth") == {"depth": 4}
        with pytest.raises(ValueError):
            extract_dimensions(fptr, "bogus")


def test_append(tmp_workdir):
    fname = os.path.join(tmp_workdir, "sample.nc")
    _write_sample(fname)
    with NCFile(fname, mode="a") as fptr:
        fptr.var("series")[2, :] = 3.0 * np.ones(4)
        newvar = fptr.create_variable("extra", "f8", ("depth",))
        newvar[:] = np.full(4, 7.0)
    with NCFile(fname) as fptr:
        assert fptr.dim_len("time") == 3
        assert np.array_equal(fptr.var("extra")[:], np.full(4, 7.0))


def test_create_dimensions_verify_conflict(tmp_workdir):
    fname = os.path.join(tmp_workdir, "sample.nc")
    with NCFile(fname, mode="w") as fptr:
        fptr.create_dimensions_verify({"depth": 4})
        fptr.create_dimensions_verify({"depth": 4})  # re-create same len is fine
        with pytest.raises(RuntimeError):
            fptr.create_dimensions_verify({"depth": 5})


def test_metadata_same(tmp_workdir):
    f1 = os.path.join(tmp_workdir, "a.nc")
    f2 = os.path.join(tmp_workdir, "b.nc")
    f3 = os.path.join(tmp_workdir, "c.nc")
    _write_sample(f1)
    _write_sample(f2)
    _write_sample(f3, extra_attr="different")
    assert metadata_same(f1, f2)
    assert not metadata_same(f1, f3)


def test_isclose_all_vars(tmp_workdir):
    base = os.path.join(tmp_workdir, "base.nc")
    same = os.path.join(tmp_workdir, "same.nc")
    diff = os.path.join(tmp_workdir, "diff.nc")
    _write_sample(base, scale=1.0, units="mol / m^3")
    # same values expressed in mmol: exactly representable scaling
    _write_sample(same, scale=1000.0, units="mmol / m^3")
    _write_sample(diff, scale=1.0 + 1.0e-6, units="mol / m^3")

    assert isclose_all_vars(base, base, rtol=0.0, atol=0.0)
    assert isclose_all_vars(base, same, rtol=0.0, atol=0.0)
    assert not isclose_all_vars(base, diff, rtol=1.0e-8, atol=1.0e-8)
    assert isclose_all_vars(base, diff, rtol=1.0e-5, atol=1.0e-5)


def test_isclose_committed_fixtures():
    """the COMMITTED cross-implementation fixtures (input/tests/, written
    by scipy.io.netcdf_file -- an independent netCDF-3 implementation)
    read identically through this repo's codec and classify exactly as
    the reference's fixture suite does
    (/root/reference/tests/test_utils.py:53-76): base==base at zero
    tolerance, same==base once units are honored (m vs cm, exactly
    representable), diff!=base until tolerances reach 1e-5"""
    fixture_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.realpath(__file__))),
        "input",
        "tests",
    )
    base = os.path.join(fixture_dir, "isclose_base.nc")
    same = os.path.join(fixture_dir, "isclose_same.nc")
    diff = os.path.join(fixture_dir, "isclose_diff.nc")

    # codec cross-check: exact values and attributes from the foreign file
    with NCFile(base) as fptr:
        assert list(fptr.variables) == ["var1", "var2"]
        assert fptr.var("var1").attrs["units"] == "m"
        assert np.array_equal(fptr.var("var1")[:], [1.0, 2.0, 3.0, 4.0])

    assert isclose_all_vars(base, base, rtol=0.0, atol=0.0)
    assert isclose_all_vars(base, base, rtol=1.0e-5, atol=1.0e-5)
    assert isclose_all_vars(base, same, rtol=0.0, atol=0.0)
    assert isclose_all_vars(base, same, rtol=1.0e-5, atol=1.0e-5)
    assert not isclose_all_vars(base, diff, rtol=0.0, atol=0.0)
    assert not isclose_all_vars(base, diff, rtol=1.0e-8, atol=1.0e-8)
    assert isclose_all_vars(base, diff, rtol=1.0e-5, atol=1.0e-5)

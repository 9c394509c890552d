"""tests for SpatialAxis"""

import os

import numpy as np
import pytest

from newton_krylov_ooc_tpu.core.spatial_axis import (
    SpatialAxis,
    spatial_axis_defn_dict,
    spatial_axis_from_defn_dict,
    spatial_axis_from_file,
)


def gen_test_axis():
    """axis with layer thicknesses 1, 2, 3, 4"""
    return SpatialAxis("depth", np.array([0.0, 1.0, 3.0, 6.0, 10.0]))


def verify_test_axis(axis):
    assert axis.axisname == "depth"
    assert (axis.edges == np.array([0.0, 1.0, 3.0, 6.0, 10.0])).all()
    assert axis.units == "m"
    assert len(axis) == 4
    assert (axis.mid == np.array([0.5, 2.0, 4.5, 8.0])).all()
    assert (axis.delta == np.array([1.0, 2.0, 3.0, 4.0])).all()
    assert (axis.delta_mid == np.array([1.5, 2.5, 3.5])).all()


def test_roundtrip(tmp_workdir):
    axis = gen_test_axis()
    verify_test_axis(axis)
    fname = os.path.join(tmp_workdir, "test_axis.nc")
    axis.dump(fname, caller="test_spatial_axis.test_roundtrip")
    verify_test_axis(spatial_axis_from_file(fname, "depth", "depth_edges"))
    verify_test_axis(spatial_axis_from_file(fname, "depth"))


def test_int_vals_mid_1d():
    axis = gen_test_axis()
    vals_ones = np.ones(len(axis))
    with pytest.raises(ValueError):
        axis.int_vals_mid(vals_ones[1:], 0)
    expected = axis.edges[-1] - axis.edges[0]
    assert axis.int_vals_mid(vals_ones, 0) == expected
    assert axis.int_vals_mid(vals_ones, -1) == expected
    # midpoint rule is exact for linear integrands
    expected = 0.5 * (axis.edges[-1] ** 2 - axis.edges[0] ** 2)
    assert axis.int_vals_mid(axis.mid, 0) == expected
    assert axis.int_vals_mid(axis.mid, -1) == expected


def test_int_vals_mid_2d():
    axis1 = gen_test_axis()
    axis2 = SpatialAxis("ypos", np.arange(len(axis1)))
    assert len(axis2) == len(axis1) - 1
    vals_ones = np.ones((len(axis1), len(axis2)))
    with pytest.raises(ValueError):
        axis1.int_vals_mid(vals_ones[1:, :], 0)
    with pytest.raises(ValueError):
        axis1.int_vals_mid(vals_ones, 1)
    expected = axis1.edges[-1] - axis1.edges[0]
    assert (axis1.int_vals_mid(vals_ones, 0) == expected).all()
    assert (axis1.int_vals_mid(vals_ones, -2) == expected).all()
    expected = axis2.edges[-1] - axis2.edges[0]
    assert (axis2.int_vals_mid(vals_ones, 1) == expected).all()
    assert (axis2.int_vals_mid(vals_ones, -1) == expected).all()


def test_defn_dict():
    defn_dict = spatial_axis_defn_dict()
    assert defn_dict["axisname"]["value"] == "depth"
    depth = spatial_axis_from_defn_dict(defn_dict=defn_dict)
    assert depth.axisname == "depth"
    assert len(depth) == 30
    # stretching: max/min thickness ratio equals delta_ratio_max
    ratio = depth.delta.max() / depth.delta.min()
    assert ratio == pytest.approx(5.0, rel=1e-12)
    # edges span the requested range
    assert depth.edges[0] == 0.0
    assert depth.edges[-1] == pytest.approx(900.0, rel=1e-12)


def test_defn_dict_delta_start():
    defn_dict = spatial_axis_defn_dict(delta_ratio_max=None, delta_start=5.0)
    depth = spatial_axis_from_defn_dict(defn_dict=defn_dict)
    assert depth.delta[0] == pytest.approx(5.0, rel=1e-12)


def test_defn_dict_errors():
    with pytest.raises(ValueError):
        spatial_axis_defn_dict(bogus_key=1.0)
    defn_dict = spatial_axis_defn_dict(delta_start=5.0)  # both set
    with pytest.raises(ValueError):
        spatial_axis_from_defn_dict(defn_dict=defn_dict)


def _uniform_axis():
    defn_dict = spatial_axis_defn_dict(edge_end=50.0, nlevs=5, delta_ratio_max=1.0)
    return spatial_axis_from_defn_dict(defn_dict=defn_dict)


def test_remap_linear_interpolant_1pt():
    depth = _uniform_axis()
    for xval in [-5.0, 25.0, 55.0]:
        res = depth.remap_linear_interpolant(np.array([xval]), np.ones(1))
        assert (res == np.ones(5)).all()


@pytest.mark.parametrize(
    "xvals, yvals, expected",
    [
        ([-15.0, -5.0], [1.0, 2.0], [2.0, 2.0, 2.0, 2.0, 2.0]),
        ([-15.0, 25.0], [0.0, 8.0], [4.0, 6.0, 7.75, 8.0, 8.0]),
        ([5.0, 25.0], [0.0, 8.0], [0.5, 4.0, 7.5, 8.0, 8.0]),
        ([22.5, 27.5], [0.0, 8.0], [0.0, 0.0, 4.0, 8.0, 8.0]),
        ([42.5, 47.5], [0.0, 8.0], [0.0, 0.0, 0.0, 0.0, 4.0]),
        ([45.0, 55.0], [0.0, 8.0], [0.0, 0.0, 0.0, 0.0, 1.0]),
    ],
)
def test_remap_linear_interpolant_2pt(xvals, yvals, expected):
    depth = _uniform_axis()
    res = depth.remap_linear_interpolant(np.array(xvals), np.array(yvals))
    assert res == pytest.approx(expected, abs=1e-13)


def test_remap_conservation():
    """remap conserves the integral of the interpolant over the axis span"""
    depth = _uniform_axis()
    rng = np.random.default_rng(0)
    xvals = np.sort(rng.uniform(-10.0, 60.0, 9))
    yvals = rng.uniform(-1.0, 1.0, 9)
    res = depth.remap_linear_interpolant(xvals, yvals)
    # integral of the clamped interpolant, computed independently
    breaks = np.union1d(depth.edges, xvals[(xvals > 0.0) & (xvals < 50.0)])
    ybreaks = np.interp(breaks, xvals, yvals)
    expected = np.sum(0.5 * (ybreaks[:-1] + ybreaks[1:]) * np.diff(breaks))
    assert (res * depth.delta).sum() == pytest.approx(expected, rel=1e-12)

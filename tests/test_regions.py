"""tests for per-region reduction kernels (host path)"""

import numpy as np
import pytest

from newton_krylov_ooc_tpu.utils.regions import (
    broadcast_region_vals,
    comp_scalef_lob,
    comp_scalef_upb,
    min_by_region,
    region_mean_weights,
)


@pytest.mark.parametrize("layout", ["single", "rows", "row_pairs", "cols", "col_pairs"])
def test_min_by_region(layout):
    vals = np.arange(24.0).reshape((4, 6))
    region_mask = np.empty(vals.shape, dtype=np.int32)
    if layout == "single":
        region_mask[:] = 1
        expected = np.array([0.0])
    elif layout == "rows":
        region_mask[:] = (np.arange(4) + 1)[:, None]
        expected = vals[:, 0]
    elif layout == "row_pairs":
        region_mask[:] = (np.arange(4) // 2 + 1)[:, None]
        expected = vals[::2, 0]
    elif layout == "cols":
        region_mask[:] = np.arange(6) + 1
        expected = vals[0, :]
    else:
        region_mask[:] = np.arange(6) // 2 + 1
        expected = vals[0, ::2]
    region_cnt = region_mask.max()
    assert (min_by_region(region_cnt, region_mask, vals) == expected).all()


def test_comp_scalef_bounds():
    region_cnt = 7
    shape = (3, region_cnt)
    region_mask = np.zeros(shape, dtype=np.int32)
    base = np.ones(shape)
    increment = np.ones(shape)
    lob = 0.0
    expected = np.empty(region_cnt)

    # each column is one region probing a distinct limiter scenario
    scenarios = [
        ("all increments positive", lambda c: None, 1.0),
        ("one negative, stays above lob", lambda c: increment.__setitem__((0, c), -0.5), 1.0),
        (
            "hits lob exactly",
            lambda c: (
                increment.__setitem__((0, c), -0.5),
                increment.__setitem__((1, c), -1.0),
            ),
            1.0,
        ),
        (
            "crosses lob, scalef=0.5",
            lambda c: (
                increment.__setitem__((0, c), -0.5),
                increment.__setitem__((1, c), -1.0),
                increment.__setitem__((2, c), -2.0),
            ),
            0.5,
        ),
        ("base at lob, increments positive", lambda c: base.__setitem__((slice(None), c), lob), 1.0),
        (
            "base at lob, zero increment",
            lambda c: (
                base.__setitem__((slice(None), c), lob),
                increment.__setitem__((0, c), 0.0),
            ),
            1.0,
        ),
        (
            "base at lob, negative increment, scalef=0",
            lambda c: (
                base.__setitem__((slice(None), c), lob),
                increment.__setitem__((0, c), 0.0),
                increment.__setitem__((1, c), -1.0),
            ),
            0.0,
        ),
    ]
    for col, (_, setup, expect) in enumerate(scenarios):
        region_mask[:, col] = col + 1
        setup(col)
        expected[col] = expect

    out = comp_scalef_lob(region_cnt, region_mask, base, increment, lob)
    assert (out == expected).all()

    # mirrored upper-bound problem gives the same factors
    out = comp_scalef_upb(region_cnt, region_mask, -base, -increment, -lob)
    assert (out == expected).all()


def test_comp_scalef_none_bounds():
    mask = np.ones((4,), dtype=np.int32)
    base = np.zeros(4)
    increment = -np.ones(4)
    assert (comp_scalef_lob(1, mask, base, increment, None) == 1.0).all()
    assert (comp_scalef_upb(1, mask, base, increment, None) == 1.0).all()


def test_region_mean_weights():
    region_mask = np.array([[1, 1, 2], [0, 2, 2]], dtype=np.int32)
    grid_weight = np.array([[1.0, 3.0, 2.0], [5.0, 1.0, 1.0]])
    mat = region_mean_weights(region_mask, grid_weight)
    assert mat.shape == (2, 6)
    # rows are weight-normalized over their region
    vals = np.array([[10.0, 20.0, 5.0], [99.0, 7.0, 9.0]])
    means = mat @ vals.reshape(-1)
    assert means[0] == pytest.approx((1 * 10 + 3 * 20) / 4.0)
    assert means[1] == pytest.approx((2 * 5 + 1 * 7 + 1 * 9) / 4.0)


def test_broadcast_region_vals():
    region_mask = np.array([0, 1, 2, 1], dtype=np.int32)
    res = broadcast_region_vals(region_mask, np.array([10.0, 20.0]), fill_value=-1.0)
    assert (res == np.array([-1.0, 10.0, 20.0, 10.0])).all()

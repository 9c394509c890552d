"""tests for general-purpose helpers"""

import numpy as np
import pytest

from newton_krylov_ooc_tpu.utils.helpers import (
    attr_common,
    dict_sel,
    dict_update_verify,
    eval_expr,
    fmt_vals,
    strtobool,
)


@pytest.mark.parametrize(
    "expr, expected",
    [
        ("1.0 + 2.0", 3.0),
        ("1.0 + 2.0 * 3.0", 7.0),
        ("(1.0 + 2.0) * 3.0", 9.0),
        ("(1.0 + 2.0) / 3.0", 1.0),
        ("2.0 ** 3.0", 8.0),
        ("10.0 + -2.0", 8.0),
        ("10.0 - 2.0", 8.0),
        ("24.0 / 86400.0", 24.0 / 86400.0),
    ],
)
def test_eval_expr(expr, expected):
    assert eval_expr(expr) == expected


def test_eval_expr_rejects_names():
    with pytest.raises(Exception):
        eval_expr("__import__('os')")
    with pytest.raises(Exception):
        eval_expr("x + 1")


def test_fmt_vals():
    var = {
        "name_{suff}": ["a_{suff}", ("b_{suff}",), {"c": "d_{suff}"}],
        "plain": 1,
    }
    res = fmt_vals(var, {"suff": "007"})
    assert res == {"name_007": ["a_007", ("b_007",), {"c": "d_007"}], "plain": 1}


def test_attr_common():
    metadata = {
        "a": {"attrs": {"units": "m"}},
        "b": {"attrs": {"units": "m"}},
    }
    assert attr_common(metadata, "units") == "m"
    metadata["b"]["attrs"]["units"] = "s"
    assert attr_common(metadata, "units") is None
    del metadata["b"]["attrs"]["units"]
    assert attr_common(metadata, "units") is None


def test_dict_update_verify():
    d = {"x": 1, "arr": np.arange(3)}
    dict_update_verify(d, {"x": 1, "y": 2})
    assert d["y"] == 2
    dict_update_verify(d, {"arr": np.arange(3)})
    with pytest.raises(RuntimeError):
        dict_update_verify(d, {"x": 3})
    with pytest.raises(RuntimeError):
        dict_update_verify(d, {"arr": np.arange(1, 4)})


def test_dict_sel():
    d = {
        "a": {"kind": "x", "n": 1},
        "b": {"kind": "y", "n": 1},
        "c": {"kind": "x", "n": 2},
    }
    assert set(dict_sel(d, kind="x")) == {"a", "c"}
    assert set(dict_sel(d, kind="x", n=2)) == {"c"}


def test_strtobool():
    assert strtobool("True") == 1
    assert strtobool("off") == 0
    with pytest.raises(ValueError):
        strtobool("maybe")



def test_run_cmd_profile_dir(tmp_workdir):
    """run_cmd --profile_dir wraps the op in a jax profiler trace and leaves
    trace artifacts behind"""
    import os

    from newton_krylov_ooc_tpu.cli import run_cmd
    from tests.test_solver_end_to_end import _setup

    config = _setup(tmp_workdir)
    trace_dir = os.path.join(tmp_workdir, "trace")
    args = run_cmd.parse_args(
        [
            "--workdir", tmp_workdir,
            "--tracer_module_names", "iage",
            "--persist",
            "comp_fcn",
            "--fname_dir", tmp_workdir,
            "--in_fname", config["solverinfo"]["init_iterate_fname"],
            "--res_fname", os.path.join(tmp_workdir, "fcn.nc"),
            "--profile_dir", trace_dir,
        ]
    )
    run_cmd.main(args)
    assert os.path.exists(os.path.join(tmp_workdir, "fcn.nc"))
    found = [
        os.path.join(root, f)
        for root, _dirs, files in os.walk(trace_dir)
        for f in files
    ]
    assert found, "no profiler trace artifacts written"

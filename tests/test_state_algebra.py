"""tests for the ModelState/TracerModuleState vector space using a real
test_problem configuration (no mocks, mirroring the reference's test style)"""

import os

import numpy as np
import pytest

from newton_krylov_ooc_tpu.config.model_config import ModelConfig
from newton_krylov_ooc_tpu.config.share import common_args, read_cfg_files
from newton_krylov_ooc_tpu.core.spatial_axis import (
    spatial_axis_defn_dict,
    spatial_axis_from_defn_dict,
)
from newton_krylov_ooc_tpu.models.test_problem.model_state import ModelState
from newton_krylov_ooc_tpu.utils.ncio import NCFile


@pytest.fixture()
def model_state_class(tmp_workdir):
    """configure test_problem against a real workdir/grid"""
    parser, args_remaining = common_args(
        "test_state_algebra",
        "test_problem",
        ["--workdir", tmp_workdir, "--tracer_module_names", "iage,phosphorus"],
    )
    args = parser.parse_args(args_remaining)
    config = read_cfg_files(args)

    depth = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(nlevs=20)
    )
    grid_vars_fname = config["modelinfo"]["grid_vars_fname"]
    depth.dump(grid_vars_fname, caller="tests.test_state_algebra")
    with NCFile(grid_vars_fname, mode="a") as fptr:
        var = fptr.create_variable(
            "region_mask",
            "i4",
            ("depth",),
            attrs={
                "long_name": "Region Mask",
                "cell_measures": "thickness: depth_delta",
            },
        )
        var[:] = np.ones(20, dtype=np.int32)

    # isolate class-level config between tests
    ModelState.model_config_obj = ModelConfig(config["modelinfo"])
    ModelState.depth = None
    ModelState._integrate_cache = {}
    yield ModelState
    ModelState.depth = None


def test_depth_shared(model_state_class):
    """depth axis is shared across instances, including deep copies"""
    import copy

    ms_a = model_state_class("gen_init_iterate")
    assert ms_a.tracer_modules[0].depth is ms_a.depth
    ms_b = model_state_class("gen_init_iterate")
    assert ms_a.depth is ms_b.depth
    ms_c = copy.deepcopy(ms_b)
    assert ms_c.depth is ms_b.depth
    assert ms_c.tracer_modules is not ms_b.tracer_modules


def test_vector_algebra(model_state_class):
    ms = model_state_class("gen_init_iterate")
    two = ms + ms
    assert np.allclose(two.mean(), 2.0 * ms.mean())
    zero = ms - ms
    assert np.allclose(zero.norm(), 0.0)
    half = ms * 0.5
    assert np.allclose(half.norm(), 0.5 * ms.norm())
    div = ms / 2.0
    assert np.allclose(div.norm(), half.norm())
    neg = -ms
    assert np.allclose(neg.mean(), -ms.mean())

    # per-(module, region) factors broadcast onto the grid
    factor = np.array([[2.0], [3.0]])  # (module_cnt, region_cnt)
    scaled = factor * ms
    assert np.allclose(
        scaled.tracer_modules[0].get_tracer_vals("iage"),
        2.0 * ms.tracer_modules[0].get_tracer_vals("iage"),
    )
    assert np.allclose(
        scaled.tracer_modules[1].get_tracer_vals("po4"),
        3.0 * ms.tracer_modules[1].get_tracer_vals("po4"),
    )

    # in-place ops
    ms2 = model_state_class("gen_init_iterate")
    ms2 += ms
    assert np.allclose(ms2.mean(), two.mean())
    ms2 -= ms
    assert np.allclose(ms2.mean(), ms.mean())
    ms2 *= 4.0
    assert np.allclose(ms2.norm(), 4.0 * ms.norm())


def test_dot_prod_and_norm(model_state_class):
    ms = model_state_class("gen_init_iterate")
    dp = ms.dot_prod(ms)
    assert dp.shape == (2, 1)
    assert np.allclose(np.sqrt(dp), ms.norm())
    # weighted-RMS norm of a constant field c over k tracers is |c|*sqrt(k)
    ms_c = model_state_class("zeros")
    for tm in ms_c.tracer_modules:
        vals = tm.get_tracer_vals_all()
        tm.set_tracer_vals_all(np.full_like(vals, -3.0))
    expected = np.array(
        [[3.0 * np.sqrt(tm.tracer_cnt)] for tm in ms_c.tracer_modules]
    )
    assert np.allclose(ms_c.norm(), expected)


def test_shadow_tracers(model_state_class):
    ms = model_state_class("gen_init_iterate")
    assert ms.shadow_tracers_on()
    phos = ms.tracer_modules[1]
    phos.set_tracer_vals("po4", np.full(20, 7.0))
    ms.copy_real_tracers_to_shadow_tracers()
    assert np.allclose(phos.get_tracer_vals("po4_s"), 7.0)
    phos.set_tracer_vals("po4_s", np.full(20, 9.0))
    ms.copy_shadow_tracers_to_real_tracers()
    assert np.allclose(phos.get_tracer_vals("po4"), 9.0)
    # extra tracers (shadowed reals) zero out
    assert set(phos.extra_tracer_names()) == {"po4", "dop", "pop"}
    ms.zero_extra_tracers()
    assert np.allclose(phos.get_tracer_vals("po4"), 0.0)
    assert np.allclose(phos.get_tracer_vals("po4_s"), 9.0)


def test_dump_load_roundtrip(model_state_class, tmp_workdir):
    ms = model_state_class("gen_init_iterate")
    fname = os.path.join(tmp_workdir, "state.nc")
    ms.dump(fname, caller="tests.test_state_algebra")
    ms2 = model_state_class(fname)
    assert np.allclose(ms2.norm(), ms.norm())
    for tm, tm2 in zip(ms.tracer_modules, ms2.tracer_modules):
        assert np.array_equal(tm.get_tracer_vals_all(), tm2.get_tracer_vals_all())


def test_gram_schmidt(model_state_class, tmp_workdir):
    """mod_gram_schmidt orthogonalizes against file-stored bases"""
    rng = np.random.default_rng(42)

    def fname_fcn(quantity, ind):
        return os.path.join(tmp_workdir, f"{quantity}_{ind:02}.nc")

    # build 2 orthonormal basis states
    basis = []
    for ind in range(2):
        ms = model_state_class("zeros")
        for tm in ms.tracer_modules:
            tm.set_tracer_vals_all(rng.normal(size=tm.get_tracer_vals_all().shape))
        for prev in basis:
            coeff = ms.dot_prod(prev)
            ms -= coeff * prev
        ms /= ms.norm()
        ms.dump(fname_fcn("basis", ind), caller="tests")
        basis.append(ms)

    probe = model_state_class("zeros")
    for tm in probe.tracer_modules:
        tm.set_tracer_vals_all(rng.normal(size=tm.get_tracer_vals_all().shape))
    h_val = probe.mod_gram_schmidt(2, fname_fcn, "basis")
    assert h_val.shape == (2, 2, 1)
    for prev in basis:
        assert np.allclose(probe.dot_prod(prev), 0.0, atol=1e-12)


def test_po4_s_restoring_opt0(tmp_workdir):
    """surface-only po4_s restoring (po4_s_restoring_opt=0) evaluates"""
    import numpy as np

    from newton_krylov_ooc_tpu.models.test_problem import physics

    depth = spatial_axis_from_defn_dict(defn_dict=spatial_axis_defn_dict(nlevs=10))
    grid = physics.column_grid(depth)
    po4 = np.abs(np.random.default_rng(0).normal(1.0, 0.3, 10))
    uptake = np.asarray(physics.po4_uptake(grid, po4))
    tau0 = np.asarray(physics.po4_s_restore_tau_r(grid, po4, uptake, 0))
    assert tau0[0] == pytest.approx(1.0 / 86400.0)
    assert (tau0[1:] == 0.0).all()
    # numpy twin agrees
    tau0_np = physics.po4_s_restore_tau_r_np(depth, po4, uptake, 0)
    assert np.allclose(tau0, tau0_np)
    # opt 1 equals the FD derivative of uptake
    tau1 = np.asarray(physics.po4_s_restore_tau_r(grid, po4, uptake, 1))
    assert (tau1 > 0).all()

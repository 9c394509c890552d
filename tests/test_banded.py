"""tests for the banded LU stage solver"""

import jax.numpy as jnp
import numpy as np
import pytest

from newton_krylov_ooc_tpu.ops.banded import (
    banded_lu_factor,
    banded_lu_factor_blocks,
    banded_lu_solve,
    banded_lu_solve_blocks,
    dense_to_bands,
)


@pytest.mark.parametrize("m,bw", [(12, 1), (30, 4), (90, 30)])
def test_banded_solve_real(m, bw):
    rng = np.random.default_rng(0)
    a = np.zeros((m, m))
    for off in range(-bw, bw + 1):
        idx = np.arange(max(0, -off), min(m, m - off))
        a[idx, idx + off] = rng.normal(size=len(idx)) * 0.1
    a[np.arange(m), np.arange(m)] += 5.0
    b = rng.normal(size=m)
    x = np.asarray(
        banded_lu_solve(
            banded_lu_factor(jnp.asarray(dense_to_bands(a, bw))), jnp.asarray(b)
        )
    )
    assert np.abs(a @ x - b).max() < 1e-12


def test_banded_solve_complex():
    rng = np.random.default_rng(1)
    m, bw = 40, 5
    a = np.zeros((m, m), complex)
    for off in range(-bw, bw + 1):
        idx = np.arange(max(0, -off), min(m, m - off))
        a[idx, idx + off] = (
            rng.normal(size=len(idx)) + 1j * rng.normal(size=len(idx))
        ) * 0.1
    a[np.arange(m), np.arange(m)] += 4.0 + 2.0j
    b = rng.normal(size=m) + 1j * rng.normal(size=m)
    x = np.asarray(
        banded_lu_solve(
            banded_lu_factor(jnp.asarray(dense_to_bands(a, bw))), jnp.asarray(b)
        )
    )
    assert np.abs(a @ x - b).max() < 1e-12


def test_banded_blocks():
    rng = np.random.default_rng(2)
    nb, m, bw = 3, 25, 3
    mats, bands, rhs = [], [], []
    for _ in range(nb):
        a = np.zeros((m, m))
        for off in range(-bw, bw + 1):
            idx = np.arange(max(0, -off), min(m, m - off))
            a[idx, idx + off] = rng.normal(size=len(idx)) * 0.1
        a[np.arange(m), np.arange(m)] += 3.0
        mats.append(a)
        bands.append(dense_to_bands(a, bw))
        rhs.append(rng.normal(size=m))
    fac = banded_lu_factor_blocks(jnp.asarray(np.stack(bands)))
    x = np.asarray(banded_lu_solve_blocks(fac, jnp.asarray(np.stack(rhs))))
    for k in range(nb):
        assert np.abs(mats[k] @ x[k] - rhs[k]).max() < 1e-12


def test_transport_bands_match_dense():
    """py_driver_2d banded Jacobians equal their dense counterparts"""
    import jax

    from newton_krylov_ooc_tpu.core.spatial_axis import (
        spatial_axis_defn_dict,
        spatial_axis_from_defn_dict,
    )
    from newton_krylov_ooc_tpu.models.py_driver_2d import physics
    from newton_krylov_ooc_tpu.models.py_driver_2d.iage import (
        iage,
        surf_restore_rate,
    )

    depth = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(nlevs=8, edge_end=4000.0, delta_ratio_max=19.0)
    )
    ypos = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            axisname="ypos", nlevs=6, edge_start=0.0, edge_end=50.0e5,
            delta_ratio_max=1.0, units="m",
        )
    )
    grid = physics.make_grid(depth, ypos, {"max_abs_vvel": "0.1", "horiz_mix_coeff": "1000.0"})
    t = 0.3 * physics.SEC_PER_YEAR
    sa = (surf_restore_rate(depth),)
    params = jnp.zeros(0)
    n = 48
    jd = np.asarray(iage.build_jac(grid, sa, params)(t, jnp.zeros(2 * n)))
    jb = np.asarray(iage.build_jac_bands(grid, sa, params)(t, jnp.zeros(2 * n)))
    for blk in range(2):
        dense_blk = jd[blk * n : (blk + 1) * n, blk * n : (blk + 1) * n]
        assert np.abs(jb[blk] - dense_to_bands(dense_blk, 6)).max() < 1e-14

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


def _random_block_bands(rng, m, bw, b, dom=30.0):
    bands = rng.standard_normal((m, 2 * bw + 1, b, b))
    for d in range(2 * bw + 1):
        off = d - bw
        bad = [i for i in range(m) if not 0 <= i + off < m]
        bands[bad, d] = 0.0
    bands[:, bw] += dom * np.eye(b)
    return bands


def _block_bands_to_dense(bands):
    m, width, b, _ = bands.shape
    bw = (width - 1) // 2
    dense = np.zeros((m * b, m * b), bands.dtype)
    for i in range(m):
        for d in range(width):
            j = i + d - bw
            if 0 <= j < m:
                dense[i * b : (i + 1) * b, j * b : (j + 1) * b] = bands[i, d]
    return dense


def test_block_banded_solve_matches_dense():
    from newton_krylov_ooc_tpu.ops.banded import (
        block_banded_lu_factor,
        block_banded_lu_solve,
    )

    rng = np.random.default_rng(17)
    m, bw, b = 24, 3, 3
    bands = _random_block_bands(rng, m, bw, b)
    rhs = rng.standard_normal((m, b))
    lu = block_banded_lu_factor(jnp.asarray(bands))
    x = np.asarray(block_banded_lu_solve(lu, jnp.asarray(rhs)))
    x_ref = np.linalg.solve(_block_bands_to_dense(bands), rhs.reshape(-1))
    assert np.allclose(x, x_ref.reshape(m, b), atol=1e-12)


def test_block_banded_complex_paths_agree():
    """interleaved-real (TPU form) and native-complex block solves agree"""
    from newton_krylov_ooc_tpu.ops.banded import (
        block_banded_lu_factor,
        block_banded_lu_solve,
        block_bands_add_diag,
        complex_block_banded_solve,
        complex_shift_block_bands,
    )

    rng = np.random.default_rng(23)
    m, bw, b = 16, 2, 3
    alpha, beta = 2.5, 1.7
    bands = _random_block_bands(rng, m, bw, b)
    rr = rng.standard_normal((m, b))
    ri = rng.standard_normal((m, b))

    lu_i = block_banded_lu_factor(
        complex_shift_block_bands(jnp.asarray(-bands), alpha, beta)
    )
    xr, xi = complex_block_banded_solve(lu_i, jnp.asarray(rr), jnp.asarray(ri))

    lu_n = block_banded_lu_factor(
        block_bands_add_diag(
            jnp.asarray(-bands).astype(jnp.complex128), alpha + 1j * beta
        )
    )
    xn = np.asarray(block_banded_lu_solve(lu_n, jnp.asarray(rr + 1j * ri)))

    cmat = (alpha + 1j * beta) * np.eye(m * b) - _block_bands_to_dense(bands)
    x_ref = np.linalg.solve(cmat, (rr + 1j * ri).reshape(-1)).reshape(m, b)
    assert np.allclose(np.asarray(xr) + 1j * np.asarray(xi), x_ref, atol=1e-11)
    assert np.allclose(xn, x_ref, atol=1e-11)

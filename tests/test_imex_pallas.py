"""pallas IMEX year kernel: interpret-mode equivalence with the XLA scan
version (the real-TPU path is exercised by bench.py and the IageKernel)"""

import numpy as np

import jax
import jax.numpy as jnp

from newton_krylov_ooc_tpu.core.spatial_axis import (
    spatial_axis_defn_dict,
    spatial_axis_from_defn_dict,
)
from newton_krylov_ooc_tpu.models.py_driver_2d import physics
from newton_krylov_ooc_tpu.models.py_driver_2d.iage import (
    SURF_SLOW_FACTOR,
    surf_restore_rate,
)
from newton_krylov_ooc_tpu.ops.imex import imex_year
from newton_krylov_ooc_tpu.ops.imex_pallas import build_iage_year_pallas


def test_pallas_year_matches_xla_scan():
    nz, ny, n_steps = 8, 6, 24
    depth = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            nlevs=nz, edge_end=4000.0, delta_ratio_max=19.0
        )
    )
    ypos = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            axisname="ypos",
            nlevs=ny,
            edge_start=0.0,
            edge_end=50.0e5,
            delta_ratio_max=1.0,
            units="m",
        )
    )
    grid = physics.make_grid(
        depth,
        ypos,
        {"max_abs_vvel": "0.1", "horiz_mix_coeff": "1000.0"},
        jnp.float32,
    )
    year = physics.SEC_PER_YEAR
    rate = surf_restore_rate(depth)
    diag = np.zeros((2, nz, ny), np.float32)
    diag[0, 0, :] = -rate
    diag[1, 0, :] = -SURF_SLOW_FACTOR * rate
    source = np.full((2, 1, 1), 1.0 / year, np.float32)

    def explicit_tend(t, y):
        def one(v):
            return physics.advection_tend(grid, v) + physics.horiz_mix_tend(
                grid, v
            )

        return jax.vmap(one)(y) + 1.0 / year

    col = np.interp(np.asarray(depth.mid), [55.0, 200.0], [0.0, 2.0])
    y0 = jnp.asarray(
        np.broadcast_to(col[None, :, None], (2, nz, ny)), jnp.float32
    )

    y_ref = imex_year(
        explicit_tend,
        lambda t: physics.vert_mixing_coeff(grid, t),
        jnp.asarray(diag),
        grid.dz_r,
        y0,
        (0.0, year),
        n_steps,
    )
    year_pl = build_iage_year_pallas(grid, diag, source, (0.0, year), n_steps)
    y_pl = year_pl(y0, interpret=True)

    scale = float(jnp.abs(y_ref).max())
    # f32 rounding with different accumulation orders; equivalence,
    # not bit-identity
    assert float(jnp.abs(y_pl - y_ref).max()) / scale < 5e-5

    # the lane-packed variant performs the same arithmetic (tracer-block
    # seams carry exact zeros in the lateral stencils); the only rounding
    # difference is reciprocal-multiply vs divide in the PCR (identical on
    # TPU hardware, where divide lowers to reciprocal-multiply)
    from newton_krylov_ooc_tpu.ops.imex_pallas import (
        build_iage_year_pallas_v2,
    )

    year_v2 = build_iage_year_pallas_v2(grid, diag, source, (0.0, year), n_steps)
    y_v2 = year_v2(y0, interpret=True)
    assert float(jnp.abs(y_v2 - y_pl).max()) / scale < 5e-5


def test_pallas_year_v2_vmem_guard():
    """channel batches whose minimum live set cannot fit VMEM must fail at
    build time with an actionable message, not a Mosaic compile error"""
    import pytest

    nz, ny = 64, 512
    depth = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            nlevs=nz, edge_end=4000.0, delta_ratio_max=19.0
        )
    )
    ypos = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            axisname="ypos",
            nlevs=ny,
            edge_start=0.0,
            edge_end=50.0e5,
            delta_ratio_max=1.0,
            units="m",
        )
    )
    grid = physics.make_grid(
        depth,
        ypos,
        {"max_abs_vvel": "0.1", "horiz_mix_coeff": "1000.0"},
        jnp.float32,
    )
    t_dim = 256  # 64 x (256*512) f32 fields: far beyond the VMEM budget
    diag = np.zeros((t_dim, nz, ny), np.float32)
    source = np.zeros((t_dim, 1, 1), np.float32)

    from newton_krylov_ooc_tpu.ops.imex_pallas import (
        build_iage_year_pallas_v2,
    )

    with pytest.raises(ValueError, match="col_chunk"):
        build_iage_year_pallas_v2(grid, diag, source, (0.0, 1.0), 4)


def test_pallas_year_v2_three_tracers():
    """generic tracer-count packing: 3 modules with distinct sources/diags"""
    nz, ny, n_steps = 8, 6, 12
    depth = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            nlevs=nz, edge_end=4000.0, delta_ratio_max=19.0
        )
    )
    ypos = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            axisname="ypos",
            nlevs=ny,
            edge_start=0.0,
            edge_end=50.0e5,
            delta_ratio_max=1.0,
            units="m",
        )
    )
    grid = physics.make_grid(
        depth,
        ypos,
        {"max_abs_vvel": "0.1", "horiz_mix_coeff": "1000.0"},
        jnp.float32,
    )
    year = physics.SEC_PER_YEAR
    rate = surf_restore_rate(depth)
    diag = np.zeros((3, nz, ny), np.float32)
    diag[0, 0, :] = -rate
    diag[1, 0, :] = -SURF_SLOW_FACTOR * rate
    diag[2, 1, :] = -0.5 * rate
    source = (
        np.array([1.0, 2.0, 0.5], np.float32).reshape(3, 1, 1) / year
    )

    from newton_krylov_ooc_tpu.ops.imex_pallas import (
        build_iage_year_pallas_v2,
    )

    col = np.interp(np.asarray(depth.mid), [55.0, 200.0], [0.0, 2.0])
    y0 = jnp.asarray(
        np.broadcast_to(col[None, :, None], (3, nz, ny)), jnp.float32
    )
    y_base = build_iage_year_pallas(grid, diag, source, (0.0, year), n_steps)(
        y0, interpret=True
    )
    y_v2 = build_iage_year_pallas_v2(grid, diag, source, (0.0, year), n_steps)(
        y0, interpret=True
    )
    scale = float(jnp.abs(y_base).max())
    assert float(jnp.abs(y_v2 - y_base).max()) / scale < 5e-5


def test_phosphorus_pallas_year_matches_xla():
    from newton_krylov_ooc_tpu.models.py_driver_2d.incore import (
        PhosphorusKernel,
    )
    from newton_krylov_ooc_tpu.models.py_driver_2d.phosphorus import (
        DEFAULT_PARAMS,
        light_lim_2d,
    )
    from newton_krylov_ooc_tpu.ops.imex_pallas import (
        build_phosphorus_year_pallas,
    )

    nz, ny, n_steps = 8, 6, 24
    depth = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            nlevs=nz, edge_end=4000.0, delta_ratio_max=19.0
        )
    )
    ypos = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            axisname="ypos",
            nlevs=ny,
            edge_start=0.0,
            edge_end=50.0e5,
            delta_ratio_max=1.0,
            units="m",
        )
    )
    modelinfo = {"max_abs_vvel": "0.1", "horiz_mix_coeff": "1000.0"}
    kernel = PhosphorusKernel(
        depth, ypos, modelinfo, dtype=jnp.float32, n_steps=n_steps,
        use_pallas=False,
    )
    y0 = kernel.init_iterate()
    y_ref = kernel._year_fn(y0)

    grid = physics.make_grid(depth, ypos, modelinfo, jnp.float32)
    year_pl = build_phosphorus_year_pallas(
        grid, DEFAULT_PARAMS, light_lim_2d(depth, ypos),
        (0.0, physics.SEC_PER_YEAR), n_steps,
    )
    y_pl = year_pl(y0, interpret=True)
    scale = float(jnp.abs(y_ref).max())
    assert float(jnp.abs(y_pl - y_ref).max()) / scale < 5e-5

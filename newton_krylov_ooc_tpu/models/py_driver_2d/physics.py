"""py_driver_2d physics as pure JAX functions.

2D (depth x ypos) tracer transport: streamfunction-derived non-divergent
advection, Peclet-limited horizontal diffusion, and time-varying
boundary-layer vertical mixing (behavioral spec: nk_ooc/py_driver_2d/
advection.py, horiz_mix.py, vert_mix.py).  Tendencies are centered-flux
stencils written for jit/vmap/jvp; the vertical-mixing profile's conservative
log-space remap is a closed-form clamped-ramp average (jittable, no
data-dependent shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

SEC_PER_YEAR = 365.0 * 86400.0


class Grid2D(NamedTuple):
    """static grid + velocity-field arrays"""

    depth_mid: jnp.ndarray      # (nz,)
    depth_edges: jnp.ndarray    # (nz+1,)
    dz_r: jnp.ndarray           # (nz,)
    dz_mid: jnp.ndarray         # (nz-1,)
    dz_mid_r: jnp.ndarray       # (nz-1,)
    ypos_mid: jnp.ndarray       # (ny,)
    dy_r: jnp.ndarray           # (ny,)
    vvel: jnp.ndarray           # (nz, ny+1) velocity in ypos direction
    wvel: jnp.ndarray           # (nz+1, ny) velocity in depth direction
    stream: jnp.ndarray         # (nz+1, ny+1)
    horiz_mix_coeff: jnp.ndarray  # (nz, ny-1), divided by delta_mid


def gen_vel_field(depth, ypos, max_abs_vvel):
    """streamfunction and non-divergent velocity field (numpy, setup-time)"""
    depth_norm = (depth.edges - depth.edges.min()) / (
        depth.edges.max() - depth.edges.min()
    )
    stretch = 2.0
    depth_norm = stretch * depth_norm / (1 + (stretch - 1) * depth_norm)
    depth_fcn = (27.0 / 4.0) * depth_norm * (1.0 - depth_norm) ** 2

    ypos_norm = (ypos.edges - ypos.edges.min()) / (
        ypos.edges.max() - ypos.edges.min()
    )
    ypos_fcn = 4.0 * ypos_norm * (1.0 - ypos_norm)

    stream = np.outer(depth_fcn, ypos_fcn)

    # normalize so max |vvel| equals max_abs_vvel (zero disables advection)
    vvel = (stream[1:, :] - stream[:-1, :]) * depth.delta_r[:, np.newaxis]
    if np.abs(vvel).max() > 0.0:
        stream = stream * max_abs_vvel / np.abs(vvel).max()

    vvel = (stream[1:, :] - stream[:-1, :]) * depth.delta_r[:, np.newaxis]
    wvel = (stream[:, 1:] - stream[:, :-1]) * ypos.delta_r
    return stream, vvel, wvel


def comp_horiz_mix_coeff(depth, ypos, vvel, horiz_mix_coeff):
    """horizontal mixing coefficient / delta_mid with grid-Peclet <= 2 (numpy)"""
    if horiz_mix_coeff > 0.0:
        res = np.full((len(depth), len(ypos) - 1), horiz_mix_coeff)
        peclet_p5 = (
            (0.5 / horiz_mix_coeff) * ypos.delta_mid[:] * np.abs(vvel[:, 1:-1])
        )
        res *= np.where(peclet_p5 > 1.0, peclet_p5, 1.0)
        res *= ypos.delta_mid_r
    else:
        # enforce grid Peclet = 2 (zero where vvel is zero)
        res = 0.5 * np.abs(vvel[:, 1:-1])
    return res


def make_grid(depth, ypos, modelinfo, dtype=None):
    """build the static Grid2D from SpatialAxis objects + modelinfo

    dtype=None resolves to the process's canonical float dtype (float64 under
    x64, float32 otherwise) so the fast path never requests an unavailable
    dtype; pass jnp.float32 explicitly to force the fast path under x64.
    """
    if dtype is None:
        dtype = jnp.result_type(float)
    max_abs_vvel = float(modelinfo["max_abs_vvel"])
    horiz_mix = float(modelinfo["horiz_mix_coeff"])
    stream, vvel, wvel = gen_vel_field(depth, ypos, max_abs_vvel)
    hmc = comp_horiz_mix_coeff(depth, ypos, vvel, horiz_mix)
    return Grid2D(
        depth_mid=jnp.asarray(depth.mid, dtype),
        depth_edges=jnp.asarray(depth.edges, dtype),
        dz_r=jnp.asarray(depth.delta_r, dtype),
        dz_mid=jnp.asarray(depth.delta_mid, dtype),
        dz_mid_r=jnp.asarray(depth.delta_mid_r, dtype),
        ypos_mid=jnp.asarray(ypos.mid, dtype),
        dy_r=jnp.asarray(ypos.delta_r, dtype),
        vvel=jnp.asarray(vvel, dtype),
        wvel=jnp.asarray(wvel, dtype),
        stream=jnp.asarray(stream, dtype),
        horiz_mix_coeff=jnp.asarray(hmc, dtype),
    )


def explicit_dt_bound(grid: Grid2D):
    """largest stable step for the EXPLICIT (Heun) lateral half of the IMEX
    split: min over faces of dy^2/(2K) (diffusion) and dy/|v| (advection).

    The implicit Crank-Nicolson vertical half is unconditionally stable, so
    this lateral bound is the scheme's only step restriction; fine ypos
    grids (small dy) hit the quadratic diffusion bound first -- exceeding
    it diverges the whole year (silently, to NaN), so year kernels warn
    when configured past it.
    """
    dy = float(1.0 / np.max(np.asarray(grid.dy_r)))  # smallest cell width
    # horiz_mix_coeff is stored as K / dy_mid at interior faces, so the
    # worst diffusive eigenvalue is ~4 * hmc / dy and dt <= dy / (2 * hmc)
    # (the uniform-grid dy^2/(2K) in stored units)
    hmc = np.asarray(grid.horiz_mix_coeff, np.float64)
    bounds = [np.inf]
    if hmc.size and hmc.max() > 0.0:
        bounds.append(float(dy / (2.0 * hmc.max())))
    vmax = float(np.abs(np.asarray(grid.vvel)).max())
    if vmax > 0:
        bounds.append(dy / vmax)
    return min(bounds)


# -- vertical mixing --------------------------------------------------------------

BLD_MIN = 35.0
_BLD_YPOS = np.array([0.4e6, 0.8e6, 1.0e6, 1.2e6, 1.4e6, 1.5e6])
_BLD_MAX = np.array([3000.0, 800.0, 415.0, 325.0, 280.0, BLD_MIN])
_BLD_TFRAC = SEC_PER_YEAR * np.array([0.25, 0.35, 0.65, 0.75])
_BLD_FRAC = np.array([0.0, 1.0, 1.0, 0.0])

# python floats (weak-typed under jax) so the f32 fast path stays f32
VERT_MIX_LOG_SHALLOW = float(np.log(1.0e1))
VERT_MIX_LOG_DEEP = float(np.log(5.0e-4))


def bldepth(grid: Grid2D, time):
    """boundary-layer depth per ypos column (ny,)"""
    dtype = grid.ypos_mid.dtype
    bld_max = jnp.interp(
        grid.ypos_mid, jnp.asarray(_BLD_YPOS, dtype), jnp.asarray(_BLD_MAX, dtype)
    )
    frac = jnp.interp(
        time, jnp.asarray(_BLD_TFRAC, dtype), jnp.asarray(_BLD_FRAC, dtype)
    )
    return BLD_MIN + (bld_max - BLD_MIN) * frac


def _clamped_ramp_layer_mean(edges, x0, x1, y0, y1):
    """
    per-layer average over [edges[k], edges[k+1]] of the clamped linear ramp
    f(x) = y0 for x<=x0, linear to y1 at x1, y1 beyond -- the closed form of a
    conservative remap of the 2-point piecewise-linear interpolant
    """
    slope = (y1 - y0) / (x1 - x0)

    def antider(x):
        # integral of (clip(x, x0, x1) - x0): quadratic ramp then linear tail
        c = jnp.clip(x, x0, x1) - x0
        return 0.5 * c * c + (x1 - x0) * jnp.maximum(x - x1, 0.0)

    num = y0 * (edges[1:] - edges[:-1]) + slope * (
        antider(edges[1:]) - antider(edges[:-1])
    )
    return num / (edges[1:] - edges[:-1])


def vert_mixing_coeff(grid: Grid2D, time):
    """
    vertical mixing coefficient at interior depth edges / delta_mid, per ypos
    column -> (nz-1, ny); conservative log-space remap of the boundary-layer
    ramp, Peclet-limited against wvel
    """
    return vert_mixing_coeff_arrays(
        grid.depth_mid, grid.dz_mid, grid.dz_mid_r, grid.ypos_mid, grid.wvel,
        time,
    )


def vert_mixing_coeff_arrays(depth_mid, dz_mid, dz_mid_r, ypos_mid, wvel, time):
    """vert_mixing_coeff from explicit arrays: column-local, so spatial
    shards evaluate it on their own ypos slice (parallel/sharded_year.py)"""
    dtype = ypos_mid.dtype
    bld_max = jnp.interp(
        ypos_mid, jnp.asarray(_BLD_YPOS, dtype), jnp.asarray(_BLD_MAX, dtype)
    )
    frac = jnp.interp(
        time, jnp.asarray(_BLD_TFRAC, dtype), jnp.asarray(_BLD_FRAC, dtype)
    )
    bld = BLD_MIN + (bld_max - BLD_MIN) * frac  # (ny,)
    # remap onto layers of the "depth_edges axis" whose edges are depth.mid,
    # vectorized over ypos columns
    edges = depth_mid  # (nz,) -> nz-1 layers
    log_coeff = _clamped_ramp_layer_mean(
        edges[:, None],
        bld[None, :] - 20.0,
        bld[None, :] + 20.0,
        VERT_MIX_LOG_SHALLOW,
        VERT_MIX_LOG_DEEP,
    )
    coeff = jnp.exp(log_coeff)  # (nz-1, ny)

    peclet_p5 = 0.5 * dz_mid[:, None] * jnp.abs(wvel[1:-1, :]) / coeff
    coeff = coeff * jnp.where(peclet_p5 > 1.0, peclet_p5, 1.0)
    return coeff * dz_mid_r[:, None]


# -- process tendencies (single tracer, (nz, ny) field) -------------------------


def advection_tend(grid: Grid2D, v):
    """centered-flux advection tendency"""
    wy_int = 0.5 * (v[:, 1:] + v[:, :-1]) * grid.vvel[:, 1:-1]
    zero_col = jnp.zeros((v.shape[0], 1), v.dtype)
    wy = jnp.concatenate([zero_col, wy_int, zero_col], axis=1)
    res = grid.dy_r * (wy[:, :-1] - wy[:, 1:])

    wz_int = 0.5 * (v[1:, :] + v[:-1, :]) * grid.wvel[1:-1, :]
    zero_row = jnp.zeros((1, v.shape[1]), v.dtype)
    wz = jnp.concatenate([zero_row, wz_int, zero_row], axis=0)
    res = res + grid.dz_r[:, None] * (wz[1:, :] - wz[:-1, :])
    return res


def horiz_mix_tend(grid: Grid2D, v):
    """horizontal diffusion tendency (zero-flux lateral boundaries)"""
    flux_int = grid.horiz_mix_coeff * (v[:, 1:] - v[:, :-1])
    zero_col = jnp.zeros((v.shape[0], 1), v.dtype)
    flux = jnp.concatenate([zero_col, flux_int, zero_col], axis=1)
    return grid.dy_r * (flux[:, 1:] - flux[:, :-1])


def vert_mix_tend(grid: Grid2D, kv, v):
    """vertical diffusion tendency given kv = vert_mixing_coeff(grid, t)"""
    flux_int = kv * (v[1:, :] - v[:-1, :])
    zero_row = jnp.zeros((1, v.shape[1]), v.dtype)
    flux = jnp.concatenate([zero_row, flux_int, zero_row], axis=0)
    return grid.dz_r[:, None] * (flux[1:, :] - flux[:-1, :])


def transport_tend(grid: Grid2D, kv, v):
    """sum of all process tendencies for one tracer field"""
    return advection_tend(grid, v) + horiz_mix_tend(grid, v) + vert_mix_tend(grid, kv, v)


# -- analytic Jacobian assembly ---------------------------------------------------
#
# The stage solves of the Radau kernel need dense Jacobians.  Differentiating
# the tendency with jacfwd inside the integrator's while_loop produces enormous
# HLO; instead the Jacobian is assembled directly: the lateral part (advection
# + horizontal mixing) is time-invariant and computed once per grid, the
# vertical part scatters the time-dependent mixing coefficients onto
# precomputed stencil indices.

_LATERAL_JAC_CACHE = {}
_VERT_IDX_CACHE = {}


def lateral_jac_const(grid: Grid2D):
    """time-invariant (ncell, ncell) Jacobian of advection + horizontal mixing

    assembled directly in numpy (trace-safe: grid arrays are concrete), from
    the same centered-flux stencils as the tendencies
    """
    # the cache retains the grid object so its id cannot be recycled
    key = id(grid)
    if key not in _LATERAL_JAC_CACHE or _LATERAL_JAC_CACHE[key][0] is not grid:
        nz = grid.depth_mid.shape[0]
        ny = grid.ypos_mid.shape[0]
        n = nz * ny
        vvel = np.asarray(grid.vvel, np.float64)
        wvel = np.asarray(grid.wvel, np.float64)
        hmc = np.asarray(grid.horiz_mix_coeff, np.float64)
        dz_r = np.asarray(grid.dz_r, np.float64)
        dy_r = np.asarray(grid.dy_r, np.float64)

        jac = np.zeros((n, n))
        cell = np.arange(n).reshape(nz, ny)

        def add(rows, cols, vals):
            np.add.at(jac, (rows.reshape(-1), cols.reshape(-1)), vals.reshape(-1))

        # advection, south faces (flux wy[z, y], present for y >= 1):
        # res[z, y] += dy_r[y] * 0.5 * vvel[z, y] * (v[z, y] + v[z, y-1])
        vals = 0.5 * vvel[:, 1:-1] * dy_r[1:]
        add(cell[:, 1:], cell[:, 1:], vals)
        add(cell[:, 1:], cell[:, :-1], vals)
        # advection, north faces (flux wy[z, y+1], present for y <= ny-2):
        # res[z, y] -= dy_r[y] * 0.5 * vvel[z, y+1] * (v[z, y+1] + v[z, y])
        vals = -0.5 * vvel[:, 1:-1] * dy_r[:-1]
        add(cell[:, :-1], cell[:, 1:], vals)
        add(cell[:, :-1], cell[:, :-1], vals)
        # advection, deep faces (flux wz[z+1, y], present for z <= nz-2):
        # res[z, y] += dz_r[z] * 0.5 * wvel[z+1, y] * (v[z+1, y] + v[z, y])
        vals = 0.5 * wvel[1:-1, :] * dz_r[:-1, None]
        add(cell[:-1, :], cell[1:, :], vals)
        add(cell[:-1, :], cell[:-1, :], vals)
        # advection, shallow faces (flux wz[z, y], present for z >= 1):
        # res[z, y] -= dz_r[z] * 0.5 * wvel[z, y] * (v[z, y] + v[z-1, y])
        vals = -0.5 * wvel[1:-1, :] * dz_r[1:, None]
        add(cell[1:, :], cell[1:, :], vals)
        add(cell[1:, :], cell[:-1, :], vals)

        # horizontal mixing: res[z, y] = dy_r[y] * (hflux[z, y+1] - hflux[z, y])
        vals = hmc * dy_r[:-1]  # north-face contribution, rows y <= ny-2
        add(cell[:, :-1], cell[:, 1:], vals)
        add(cell[:, :-1], cell[:, :-1], -vals)
        vals = hmc * dy_r[1:]  # south-face contribution, rows y >= 1
        add(cell[:, 1:], cell[:, :-1], vals)
        add(cell[:, 1:], cell[:, 1:], -vals)

        _LATERAL_JAC_CACHE[key] = (grid, jac)
    return _LATERAL_JAC_CACHE[key][1]


def _vert_jac_indices(nz, ny):
    """stencil index arrays for the vertical-mixing Jacobian scatter"""
    key = (nz, ny)
    if key not in _VERT_IDX_CACHE:
        cell = np.arange(nz * ny).reshape(nz, ny)
        kv_idx = np.arange((nz - 1) * ny).reshape(nz - 1, ny)
        # d tend[z]/d v[z+1] = dz_r[z] * kv[z]     (z < nz-1)
        rows_up = cell[:-1, :].reshape(-1)
        cols_up = cell[1:, :].reshape(-1)
        k_up = kv_idx.reshape(-1)
        # d tend[z]/d v[z-1] = dz_r[z] * kv[z-1]   (z > 0)
        rows_lo = cell[1:, :].reshape(-1)
        cols_lo = cell[:-1, :].reshape(-1)
        k_lo = kv_idx.reshape(-1)
        _VERT_IDX_CACHE[key] = (rows_up, cols_up, k_up, rows_lo, cols_lo, k_lo)
    return _VERT_IDX_CACHE[key]


def vertical_jac(grid: Grid2D, kv):
    """(ncell, ncell) Jacobian of the vertical-mixing tendency for given kv"""
    nz = grid.depth_mid.shape[0]
    ny = grid.ypos_mid.shape[0]
    n = nz * ny
    rows_up, cols_up, k_up, rows_lo, cols_lo, k_lo = _vert_jac_indices(nz, ny)
    kvf = kv.reshape(-1)
    dz_r_cell = jnp.broadcast_to(grid.dz_r[:, None], (nz, ny)).reshape(-1)

    up_vals = dz_r_cell[rows_up] * kvf[k_up]
    lo_vals = dz_r_cell[rows_lo] * kvf[k_lo]
    jac = jnp.zeros((n, n), kv.dtype)
    jac = jac.at[rows_up, cols_up].add(up_vals)
    jac = jac.at[rows_lo, cols_lo].add(lo_vals)
    jac = jac.at[rows_up, rows_up].add(-up_vals)
    jac = jac.at[rows_lo, rows_lo].add(-lo_vals)
    return jac


def transport_jac(grid: Grid2D, time):
    """(ncell, ncell) Jacobian of the full single-tracer transport tendency"""
    lat = jnp.asarray(lateral_jac_const(grid), grid.depth_mid.dtype)
    return lat + vertical_jac(grid, vert_mixing_coeff(grid, time))


_LATERAL_BANDS_CACHE = {}


def lateral_bands_const(grid: Grid2D):
    """row-band storage (ncell, 2*ny+1) of the lateral Jacobian (bw = ny)"""
    key = id(grid)
    if key not in _LATERAL_BANDS_CACHE or _LATERAL_BANDS_CACHE[key][0] is not grid:
        from ...ops.banded import dense_to_bands

        ny = grid.ypos_mid.shape[0]
        bands = dense_to_bands(lateral_jac_const(grid), ny)
        _LATERAL_BANDS_CACHE[key] = (grid, bands)
    return _LATERAL_BANDS_CACHE[key][1]


def transport_bands(grid: Grid2D, time):
    """row-band (ncell, 2*ny+1) Jacobian of the full transport tendency

    stencil offsets: +-1 (ypos neighbors, lateral), +-ny (depth neighbors,
    vertical mixing), 0 (diagonal)
    """
    nz = grid.depth_mid.shape[0]
    ny = grid.ypos_mid.shape[0]
    dtype = grid.depth_mid.dtype
    bands = jnp.asarray(lateral_bands_const(grid), dtype)

    kv = vert_mixing_coeff(grid, time)  # (nz-1, ny)
    up = (grid.dz_r[:-1, None] * kv).reshape(-1)  # rows z = 0..nz-2
    lo = (grid.dz_r[1:, None] * kv).reshape(-1)   # rows z = 1..nz-1
    bands = bands.at[:-ny, 2 * ny].add(up)
    bands = bands.at[ny:, 0].add(lo)
    bands = bands.at[:-ny, ny].add(-up)
    bands = bands.at[ny:, ny].add(-lo)
    return bands


_LATERAL_BANDS_YMAJOR_CACHE = {}


def lateral_bands_const_ymajor(grid: Grid2D):
    """row-band storage (ncell, 2*nz+1) of the lateral Jacobian in
    ypos-major cell order (cell = y*nz + z): lateral neighbors sit at
    offsets +-nz, so the bandwidth is nz instead of ny"""
    key = id(grid)
    cached = _LATERAL_BANDS_YMAJOR_CACHE.get(key)
    if cached is None or cached[0] is not grid:
        from ...ops.banded import dense_to_bands

        nz = grid.depth_mid.shape[0]
        ny = grid.ypos_mid.shape[0]
        # permute the dense z-major lateral operator into y-major order
        perm = (
            np.arange(ny)[:, None] * 1 + np.arange(nz)[None, :] * ny
        ).reshape(-1)  # y-major cell -> z-major cell index
        jac = lateral_jac_const(grid)[np.ix_(perm, perm)]
        bands = dense_to_bands(jac, nz)
        _LATERAL_BANDS_YMAJOR_CACHE[key] = (grid, bands)
    return _LATERAL_BANDS_YMAJOR_CACHE[key][1]


def transport_bands_ymajor(grid: Grid2D, time):
    """row-band (ncell, 2*nz+1) transport Jacobian, ypos-major cell order

    stencil offsets: +-1 (depth neighbors, vertical mixing), +-nz (ypos
    neighbors, lateral), 0 (diagonal).  The narrower of the two layouts:
    use when nz < ny (bandwidth min(nz, ny)).
    """
    nz = grid.depth_mid.shape[0]
    ny = grid.ypos_mid.shape[0]
    dtype = grid.depth_mid.dtype
    bands = jnp.asarray(lateral_bands_const_ymajor(grid), dtype)

    kv = vert_mixing_coeff(grid, time)  # (nz-1, ny)
    # row (y, z): up couples to z+1 (offset +1), lo to z-1 (offset -1)
    up = (kv * grid.dz_r[:-1, None]).T.reshape(-1)  # (ny*(nz-1),) y-major
    lo = (kv * grid.dz_r[1:, None]).T.reshape(-1)
    rows_up = (
        np.arange(ny)[:, None] * nz + np.arange(nz - 1)[None, :]
    ).reshape(-1)
    rows_lo = rows_up + 1
    bands = bands.at[rows_up, nz + 1].add(up)
    bands = bands.at[rows_lo, nz - 1].add(lo)
    bands = bands.at[rows_up, nz].add(-up)
    bands = bands.at[rows_lo, nz].add(-lo)
    return bands


def block_diag_tracers(blocks):
    """dense block-diagonal assembly of per-tracer (n, n) Jacobians"""
    t_cnt = len(blocks)
    n = blocks[0].shape[0]
    jac = jnp.zeros((t_cnt * n, t_cnt * n), blocks[0].dtype)
    for ind, blk in enumerate(blocks):
        jac = jac.at[ind * n : (ind + 1) * n, ind * n : (ind + 1) * n].set(blk)
    return jac


# -- numpy twins for history/stats fields (exact host arithmetic) -----------------


def bldepth_np(ypos, time):
    bld_max = np.interp(ypos.mid, _BLD_YPOS, _BLD_MAX)
    frac = np.interp(time, _BLD_TFRAC, _BLD_FRAC)
    return BLD_MIN + (bld_max - BLD_MIN) * frac


def vert_mixing_coeff_np(depth, ypos, wvel, time):
    """numpy twin of vert_mixing_coeff (per-column conservative remap)"""
    from ...core.spatial_axis import SpatialAxis

    bld = bldepth_np(ypos, time)
    edges_axis = SpatialAxis("depth_edges", depth.mid)
    res = np.empty((len(depth) - 1, len(ypos)))
    cache = {}
    for j, bld_j in enumerate(bld):
        if bld_j not in cache:
            cache[bld_j] = edges_axis.remap_linear_interpolant(
                np.array([bld_j - 20.0, bld_j + 20.0]),
                np.array([VERT_MIX_LOG_SHALLOW, VERT_MIX_LOG_DEEP]),
            )
        res[:, j] = cache[bld_j]
    res = np.exp(res)
    peclet_p5 = 0.5 * depth.delta_mid[:, None] * np.abs(wvel[1:-1, :]) / res
    res *= np.where(peclet_p5 > 1.0, peclet_p5, 1.0)
    return res * depth.delta_mid_r[:, None]

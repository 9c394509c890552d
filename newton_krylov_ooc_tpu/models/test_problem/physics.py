"""test_problem physics as pure JAX functions.

The test_problem model is a 1D depth column: time-varying boundary-layer
vertical mixing plus per-module sources/sinks (behavioral spec:
nk_ooc/test_problem/vert_mix.py, iage.py, dye_decay.py, phosphorus.py).  All
tendencies here are written as jit/vmap/jvp-friendly closures over static
depth-axis arrays; the Radau kernel integrates them on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import constants


class ColumnGrid(NamedTuple):
    """static depth-axis arrays used by the tendencies"""

    mid: jnp.ndarray          # (nlev,)
    edges_int: jnp.ndarray    # (nlev-1,) interior edges
    delta_r: jnp.ndarray      # (nlev,)
    delta_mid_r: jnp.ndarray  # (nlev-1,)


def column_grid(depth, dtype=jnp.float64):
    """build the static grid arrays from a SpatialAxis"""
    return ColumnGrid(
        mid=jnp.asarray(depth.mid, dtype),
        edges_int=jnp.asarray(depth.edges[1:-1], dtype),
        delta_r=jnp.asarray(depth.delta_r, dtype),
        delta_mid_r=jnp.asarray(depth.delta_mid_r, dtype),
    )


def bldepth(time):
    """time-varying boundary layer depth, 50..150 m, annual cycle"""
    frac = 0.5 + 0.5 * jnp.cos(
        (2 * jnp.pi) * (constants.year_per_sec * time - 0.25)
    )
    return 50.0 + 100.0 * frac


def bldepth_np(time):
    """numpy variant (exact host arithmetic for history/stats fields)"""
    frac = 0.5 + 0.5 * np.cos((2 * np.pi) * (constants.year_per_sec * time - 0.25))
    return 50.0 + 100.0 * frac


def mixing_coeff_np(depth, time):
    """numpy variant of mixing_coeff over a SpatialAxis (host path)"""
    bld = bldepth_np(time)
    res_log10 = np.interp(
        depth.edges[1:-1], [bld - 20.0, bld + 20.0], [0.0, -5.0]
    )
    return 10.0 ** res_log10 * depth.delta_mid_r


def po4_uptake_np(depth, po4):
    """numpy variant of po4_uptake (host path)"""
    llim = np.exp((-1.0 / 25.0) * depth.mid)
    return constants.day_per_sec * llim * po4 / (po4 + PO4_HALFSAT)


def po4_s_restore_tau_r_np(depth, po4, uptake, restoring_opt):
    """numpy variant of po4_s_restore_tau_r (host path)"""
    if restoring_opt == 0:
        res = np.zeros_like(po4)
        res[0] = constants.day_per_sec
        return res
    po4_delta = np.maximum(1.0e-3 * np.abs(po4), 1.0e-8)
    return (po4_uptake_np(depth, po4 + po4_delta) - uptake) / po4_delta


def mixing_coeff(grid: ColumnGrid, time):
    """
    vertical mixing coefficient at interior edges divided by the distance
    between layer midpoints (m/s): log10 profile ramps from 1 to 1e-5 m^2/s
    across bldepth +/- 20 m
    """
    bld = bldepth(time)
    # linear-in-log10 ramp, clamped outside [bld-20, bld+20]
    frac = jnp.clip((grid.edges_int - (bld - 20.0)) / 40.0, 0.0, 1.0)
    res_log10 = 0.0 * (1.0 - frac) + (-5.0) * frac
    return 10.0 ** res_log10 * grid.delta_mid_r


def mix_tend(grid: ColumnGrid, kvals, tracer, surf_flux=0.0):
    """flux-form tendency of vertical mixing with a surface-flux BC

    kvals: (nlev-1,) mixing coefficient / delta_mid at interior edges
    tracer: (nlev,); surf_flux: downward surface flux (positive into column)
    """
    interior = kvals * (tracer[1:] - tracer[:-1])
    flux = jnp.concatenate(
        [jnp.asarray([-surf_flux], tracer.dtype), interior,
         jnp.zeros((1,), tracer.dtype)]
    )
    return (flux[1:] - flux[:-1]) * grid.delta_r


# -- iage ----------------------------------------------------------------------

IAGE_PIST_VEL = 24.0 * constants.day_per_sec * 10.0  # piston velocity, m/s


def make_iage_tend(grid: ColumnGrid):
    """iage: +1 yr/yr aging source, surface restoring via piston velocity"""

    def tend(time, vals_flat):
        surf_flux = -IAGE_PIST_VEL * vals_flat[0]
        kvals = mixing_coeff(grid, time)
        return mix_tend(grid, kvals, vals_flat, surf_flux) + constants.year_per_sec

    return tend


# -- dye_decay --------------------------------------------------------------

_DYE_FLUX_TIMES = constants.sec_per_year * np.array([0.1, 0.2, 0.6, 0.7])
_DYE_FLUX_VALS = constants.year_per_sec * np.array([0.0, 2.0, 2.0, 0.0])


def dye_decay_surf_flux(time, dtype=jnp.float64):
    """pulse surface flux (integral over the year = 1 mol/m^2)"""
    return jnp.interp(
        time,
        jnp.asarray(_DYE_FLUX_TIMES, dtype),
        jnp.asarray(_DYE_FLUX_VALS, dtype),
    )


def make_dye_decay_tend(grid: ColumnGrid, decay_rate_per_year):
    """dye_decay_{suff}: pulsed surface input, first-order decay"""
    decay = decay_rate_per_year * constants.year_per_sec

    def tend(time, vals_flat):
        surf_flux = dye_decay_surf_flux(time, vals_flat.dtype)
        kvals = mixing_coeff(grid, time)
        return mix_tend(grid, kvals, vals_flat, surf_flux) - decay * vals_flat

    return tend


# -- phosphorus ----------------------------------------------------------------

PO4_HALFSAT = 0.5
SIGMA_DOP = 0.67
REMIN_RATE = 0.01 * constants.day_per_sec  # dop and pop remin, 1%/day
SINK_VEL = constants.day_per_sec  # pop sinking, 1 m/day


def light_lim(grid: ColumnGrid):
    """light limitation with 25 m e-folding decay"""
    return jnp.exp((-1.0 / 25.0) * grid.mid)


def po4_uptake(grid: ColumnGrid, po4):
    """Michaelis-Menten uptake with light limitation, max rate 1/day"""
    po4_lim = po4 / (po4 + PO4_HALFSAT)
    return constants.day_per_sec * light_lim(grid) * po4_lim


def po4_s_restore_tau_r(grid: ColumnGrid, po4, uptake, restoring_opt):
    """inverse restoring timescale for the shadow po4 tracer"""
    if restoring_opt == 0:
        res = jnp.zeros_like(po4)
        return res.at[0].set(constants.day_per_sec)
    # finite-difference d(po4_uptake)/d(po4)
    po4_delta = jnp.maximum(1.0e-3 * jnp.abs(po4), 1.0e-8)
    return (po4_uptake(grid, po4 + po4_delta) - uptake) / po4_delta


def sinking_tend(grid: ColumnGrid, tracer):
    """flux-form sinking at 1 m/day, zero flux at surface and bottom"""
    interior = -SINK_VEL * tracer[:-1]
    flux = jnp.concatenate(
        [jnp.zeros((1,), tracer.dtype), interior, jnp.zeros((1,), tracer.dtype)]
    )
    return grid.delta_r * (flux[1:] - flux[:-1])


def make_phosphorus_tend(grid: ColumnGrid, restoring_opt):
    """
    phosphorus cycling: po4/dop/pop plus shadow counterparts; uptake computed
    from real po4 drives both triplets; shadow po4 restores toward real po4
    with compensation from dop_s/pop_s so total shadow P is conserved
    """

    def core(time, kvals, uptake, po4, dop, pop):
        dop_remin = REMIN_RATE * dop
        pop_remin = REMIN_RATE * pop
        d_po4 = -uptake + dop_remin + pop_remin + mix_tend(grid, kvals, po4)
        d_dop = SIGMA_DOP * uptake - dop_remin + mix_tend(grid, kvals, dop)
        d_pop = (
            (1.0 - SIGMA_DOP) * uptake
            - pop_remin
            + mix_tend(grid, kvals, pop)
            + sinking_tend(grid, pop)
        )
        return d_po4, d_dop, d_pop

    nlev = grid.mid.shape[0]

    def tend(time, vals_flat):
        vals = vals_flat.reshape((6, nlev))
        kvals = mixing_coeff(grid, time)
        uptake = po4_uptake(grid, vals[0])

        d_real = core(time, kvals, uptake, vals[0], vals[1], vals[2])
        d_shadow = core(time, kvals, uptake, vals[3], vals[4], vals[5])

        tau_r = po4_s_restore_tau_r(grid, vals[0], uptake, restoring_opt)
        rest_term = tau_r * (vals[0] - vals[3])

        out = jnp.stack(
            [
                d_real[0],
                d_real[1],
                d_real[2],
                d_shadow[0] + rest_term,
                d_shadow[1] - 0.67 * rest_term,
                d_shadow[2] - 0.33 * rest_term,
            ]
        )
        return out.reshape(-1)

    return tend

"""phosphorus tracer module for py_driver_2d: po4/dop/pop cycling with 2D
light limitation and particulate sinking.
Behavioral spec: nk_ooc/py_driver_2d/phosphorus.py.

Preconditioner: one implicit-Euler step I - dt J linearized at po4 snapshots
from the precond file; the near-singular system is regularized by an
eigenvalue shift with Richardson extrapolation; the null-space direction
(smallest eigenvector) is projected out of the result so total phosphorus is
conserved, and is dumped alongside the precond file for inspection.  (The
reference computes this projection but, through an xarray-immutability quirk,
returns the unprojected solution; here the projection is applied as intended.)
"""

from __future__ import annotations

import copy
import logging
import os

import jax.numpy as jnp
import numpy as np

from ...utils.helpers import eval_expr
from ...utils.ncio import NCFile
from . import physics
from .tracer_module_state import TracerModuleState

DEFAULT_PARAMS = {
    "po4_halfsat": 0.5,
    "max_uptake_rate": 1.0 / (3.0 * 86400.0),
    "sigma": 0.67,
    "dop_remin_rate": 1.0 / (0.5 * 365.0 * 86400.0),
    "pop_remin_rate": 1.0 / (0.5 * 365.0 * 86400.0),
    "pop_sink_vel": 2.0 / 86400.0,
}


def gen_params(modelinfo):
    """tracer-module parameters, with modelinfo overrides"""
    logger = logging.getLogger(__name__)
    params = dict(DEFAULT_PARAMS)
    for key in params:
        if key in modelinfo:
            value = eval_expr(modelinfo[key])
            logger.info("using %s=%s (%e) from modelinfo", key, modelinfo[key], value)
            params[key] = value
    return params


def light_lim_2d(depth, ypos):
    """2D light limitation: 25 m e-folding in depth, gaussian in ypos"""
    return np.outer(
        np.exp((-1.0 / 25.0) * depth.mid),
        np.exp(-1.0 * ((ypos.mid - 2.5e6) / 1.5e6) ** 2),
    )


class phosphorus(TracerModuleState):  # noqa: N801
    """phosphorus tracer module (po4, dop, pop)"""

    def __init__(self, tracer_module_name, fname, model_config_obj, depth, ypos):
        self.params = gen_params(model_config_obj.modelinfo)
        super().__init__(tracer_module_name, fname, model_config_obj, depth, ypos)

    @staticmethod
    def build_tend(grid, static_args, params):
        (
            po4_halfsat,
            max_uptake_rate,
            sigma,
            dop_remin_rate,
            pop_remin_rate,
            pop_sink_vel,
            light_lim_flat,
        ) = static_args
        nz = grid.depth_mid.shape[0]
        ny = grid.ypos_mid.shape[0]
        light_lim = jnp.asarray(light_lim_flat, grid.depth_mid.dtype).reshape(
            (nz, ny)
        )

        def tend(time, vals_flat):
            vals = vals_flat.reshape((3, nz, ny))
            po4, dop, pop = vals[0], vals[1], vals[2]
            kv = physics.vert_mixing_coeff(grid, time)

            d_po4 = physics.transport_tend(grid, kv, po4)
            d_dop = physics.transport_tend(grid, kv, dop)
            d_pop = physics.transport_tend(grid, kv, pop)

            uptake = max_uptake_rate * light_lim * po4 / (po4 + po4_halfsat)
            d_po4 = d_po4 - uptake
            d_dop = d_dop + sigma * uptake
            d_pop = d_pop + (1.0 - sigma) * uptake

            dop_remin = dop_remin_rate * dop
            pop_remin = pop_remin_rate * pop
            d_po4 = d_po4 + dop_remin + pop_remin
            d_dop = d_dop - dop_remin
            d_pop = d_pop - pop_remin

            # particulate sinking (flux leaves through the bottom is retained:
            # zero-flux bottom boundary, matching the reference stencil)
            sink_int = pop_sink_vel * pop[:-1, :]
            zero_row = jnp.zeros((1, ny), vals.dtype)
            sink = jnp.concatenate([zero_row, sink_int, zero_row], axis=0)
            d_pop = d_pop + grid.dz_r[:, None] * (sink[:-1, :] - sink[1:, :])

            return jnp.stack([d_po4, d_dop, d_pop]).reshape(-1)

        return tend

    @staticmethod
    def build_jac(grid, static_args, params):
        (
            po4_halfsat,
            max_uptake_rate,
            sigma,
            dop_remin_rate,
            pop_remin_rate,
            pop_sink_vel,
            light_lim_flat,
        ) = static_args
        nz = grid.depth_mid.shape[0]
        ny = grid.ypos_mid.shape[0]
        n = nz * ny
        light_lim = jnp.asarray(light_lim_flat, grid.depth_mid.dtype).reshape(-1)
        diag = jnp.arange(n)

        # time-invariant sinking Jacobian contribution (within the pop block)
        cell = np.arange(n).reshape(nz, ny)
        sink_rows_lo = cell[1:, :].reshape(-1)   # gain from the layer above
        sink_cols_lo = cell[:-1, :].reshape(-1)

        def jac(time, vals_flat):
            jt = physics.transport_jac(grid, time)
            po4 = vals_flat[:n]
            uptake_jac = (
                max_uptake_rate * light_lim * po4_halfsat / (po4 + po4_halfsat) ** 2
            )

            dz_r_flat = jnp.broadcast_to(grid.dz_r[:, None], (nz, ny)).reshape(-1)
            sink_lo = pop_sink_vel * dz_r_flat[sink_rows_lo]
            j_pop = jt.at[sink_rows_lo, sink_cols_lo].add(sink_lo)
            # loss to the layer below (bottom layer retains mass: zero flux)
            loss = jnp.where(
                (jnp.arange(n) < (nz - 1) * ny), pop_sink_vel * dz_r_flat, 0.0
            )
            j_pop = j_pop.at[diag, diag].add(-loss)

            full = physics.block_diag_tracers([jt, jt, j_pop])
            # biogeochemical couplings
            full = full.at[diag, diag].add(-uptake_jac)           # d po4/d po4
            full = full.at[n + diag, diag].add(sigma * uptake_jac)
            full = full.at[2 * n + diag, diag].add((1 - sigma) * uptake_jac)
            full = full.at[diag, n + diag].add(dop_remin_rate)
            full = full.at[n + diag, n + diag].add(-dop_remin_rate)
            full = full.at[diag, 2 * n + diag].add(pop_remin_rate)
            full = full.at[2 * n + diag, 2 * n + diag].add(-pop_remin_rate)
            return full

        return jac

    @classmethod
    def band_info(cls, grid):
        """banded stage solver layout: tracer-innermost state ordering.

        With state index k = cell*3 + tracer, the coupled 3-tracer Jacobian
        is banded: same-cell biogeochemical couplings sit at offsets +-2,
        near-neighbor transport at +-3, and far-neighbor transport at
        +-3*stride -- bandwidth 3*min(nz, ny), with the cell ordering chosen
        so the SMALLER grid dimension is the far stride (z-major cells when
        ny <= nz, ypos-major when nz < ny; LU cost scales with bandwidth^2).
        Returns (bandwidth, perm) with perm mapping banded index ->
        tracer-major flat index.
        """
        return cls._band_layout(
            grid.depth_mid.shape[0], grid.ypos_mid.shape[0]
        )

    @staticmethod
    def _band_layout(nz, ny):
        n = nz * ny
        if nz < ny:
            # ypos-major cells: cell' = y*nz + z; flat z-major cell = z*ny + y
            cell_perm = (
                np.arange(ny)[:, None] + np.arange(nz)[None, :] * ny
            ).reshape(-1)
            bw = 3 * nz
        else:
            cell_perm = np.arange(n)
            bw = 3 * ny
        perm = (
            np.arange(3)[None, :] * n + cell_perm[:, None]
        ).reshape(-1)
        return bw, perm

    @staticmethod
    def build_jac_bands(grid, static_args, params):
        """banded Jacobian in the tracer-innermost layout of band_info;
        receives the integration-ordered (permuted) state"""
        (
            po4_halfsat,
            max_uptake_rate,
            sigma,
            dop_remin_rate,
            pop_remin_rate,
            pop_sink_vel,
            light_lim_flat,
        ) = static_args
        nz = grid.depth_mid.shape[0]
        ny = grid.ypos_mid.shape[0]
        n = nz * ny
        ymajor = nz < ny
        cell_bw = min(nz, ny)
        bw = 3 * cell_bw
        dtype = grid.depth_mid.dtype

        rows = np.arange(3 * n)
        cell_of = rows // 3  # cell index in the CHOSEN ordering
        is_pop = rows % 3 == 2
        dz_r_cell_zmaj = np.broadcast_to(
            np.asarray(grid.dz_r)[:, None], (nz, ny)
        ).reshape(-1)
        light_zmaj = np.asarray(light_lim_flat, np.float64).reshape(-1)
        if ymajor:
            # z index of y-major cell c' = y*nz + z is c' % nz
            z_of = cell_of % nz
            dz_r_cell = np.asarray(grid.dz_r)[z_of]
            light_cells = light_zmaj.reshape(nz, ny).T.reshape(-1)
            sink_off = 1     # layer above is one cell away in y-major order
        else:
            z_of = cell_of // ny
            dz_r_cell = dz_r_cell_zmaj[cell_of]
            light_cells = light_zmaj
            sink_off = ny
        light_lim = jnp.asarray(light_cells, dtype)
        sink_gain = jnp.asarray(
            np.where(is_pop & (z_of >= 1), pop_sink_vel * dz_r_cell, 0.0),
            dtype,
        )
        sink_loss = jnp.asarray(
            np.where(is_pop & (z_of < nz - 1), pop_sink_vel * dz_r_cell, 0.0),
            dtype,
        )
        # cell-level band offset o maps to permuted band position bw + 3*o
        cell_cols = bw + 3 * (np.arange(2 * cell_bw + 1) - cell_bw)

        def jac_bands(time, vals_flat):
            if ymajor:
                cell_bands = physics.transport_bands_ymajor(grid, time)
            else:
                cell_bands = physics.transport_bands(grid, time)
            pb = jnp.zeros((3 * n, 2 * bw + 1), dtype)
            pb = pb.at[:, cell_cols].set(jnp.repeat(cell_bands, 3, axis=0))

            # particulate sinking (pop rows): gain from the layer above,
            # diagonal loss to the layer below (zero-flux bottom)
            pb = pb.at[:, bw - 3 * sink_off].add(sink_gain)
            pb = pb.at[:, bw].add(-sink_loss)

            # biogeochemical couplings, per cell (offsets are tracer deltas)
            po4 = vals_flat[0::3]
            uptake_jac = (
                max_uptake_rate * light_lim * po4_halfsat / (po4 + po4_halfsat) ** 2
            )
            pb = pb.at[0::3, bw].add(-uptake_jac)
            pb = pb.at[1::3, bw - 1].add(sigma * uptake_jac)
            pb = pb.at[2::3, bw - 2].add((1.0 - sigma) * uptake_jac)
            pb = pb.at[0::3, bw + 1].add(dop_remin_rate)
            pb = pb.at[1::3, bw].add(-dop_remin_rate)
            pb = pb.at[0::3, bw + 2].add(pop_remin_rate)
            pb = pb.at[2::3, bw].add(-pop_remin_rate)
            return pb[None]

        return jac_bands

    def tend_static_args(self):
        p = self.params
        return (
            p["po4_halfsat"],
            p["max_uptake_rate"],
            p["sigma"],
            p["dop_remin_rate"],
            p["pop_remin_rate"],
            p["pop_sink_vel"],
            tuple(light_lim_2d(self.depth, self.ypos).reshape(-1)),
        )

    def tend_params(self):
        return np.zeros(0)

    # -- derived hist vars ---------------------------------------------------

    def hist_vars_metadata_tracer_like(self):
        res = super().hist_vars_metadata_tracer_like()
        po4_units = res["po4"]["attrs"]["units"]
        res["po4_uptake"] = {
            "attrs": {"long_name": "uptake of po4", "units": f"{po4_units} / s"}
        }
        return res

    def derived_hist_vals(self, tracer_vals_all):
        llim = light_lim_2d(self.depth, self.ypos)
        po4 = tracer_vals_all[0]  # (nz, ny, nt)
        uptake = (
            self.params["max_uptake_rate"]
            * llim[:, :, None]
            * po4
            / (po4 + self.params["po4_halfsat"])
        )
        return {"po4_uptake": uptake}

    def stats_vars_tracer_like(self):
        res = super().stats_vars_tracer_like()
        res.append("po4_uptake")
        return res

    # -- preconditioner ----------------------------------------------------------

    def apply_precond_jacobian(self, time_range, res_tms, jac_builder, fptr_precond):
        """eigen-regularized implicit-Euler preconditioner (module docstring)"""
        logger = logging.getLogger(__name__)

        self_vals_3d = self.get_tracer_vals_all()
        shape = self_vals_3d.shape
        self_vals = self_vals_3d.reshape(-1)

        time_n = 1
        time_delta = (time_range[1] - time_range[0]) / time_n

        precond_time_vals = fptr_precond.var("time")[:]
        precond_po4 = fptr_precond.var("po4")

        eye = np.eye(self_vals.size)
        mat = np.eye(self_vals.size)
        tracer_vals_3d = np.zeros(shape)
        for time_ind in range(time_n):
            time_end = time_range[0] + (time_ind + 1.0) * time_delta
            precond_time_ind = int(np.argmin(np.abs(time_end - precond_time_vals)))
            tracer_vals_3d[0, :] = precond_po4[precond_time_ind, :]
            time_mid = time_range[0] + (time_ind + 0.5) * time_delta
            jac = jac_builder(time_mid, tracer_vals_3d.reshape(-1))
            mat = mat @ (eye - time_delta * jac)
        mat = eye - mat

        # banded tracer-innermost layout: the eigen iterations and shifted
        # solves run on device through the pivot-free banded LU
        # (ops/eigen.py) -- the deterministic accelerator replacement for
        # the reference's host ARPACK shift-invert
        # (nk_ooc/py_driver_2d/phosphorus.py:197-274)
        from ...ops.banded import dense_to_bands
        from ...ops.eigen import (
            banded_extreme_eigs,
            banded_shift_solve,
            banded_smallest_eigs,
        )

        bw, perm = self._band_layout(shape[1], shape[2])
        bands = jnp.asarray(dense_to_bands(mat[np.ix_(perm, perm)], bw))

        e_cnt = 5
        e_vals = banded_extreme_eigs(bands, k=e_cnt)
        for k in range(e_cnt):
            logger.info(
                "large e_val[%d] = %e + %e j", k, e_vals[k].real, e_vals[k].imag
            )
        # inverse iteration shifted marginally off the (exactly singular)
        # null eigenvalue: roundoff keeps the pivot-free LU viable, and the
        # tiny shift leaves the null mode overwhelmingly dominant
        sigma = 1.0e-8 * float(np.abs(np.diag(mat)).max())
        e_vals, e_vects = banded_smallest_eigs(bands, sigma, k=e_cnt)
        for k in range(e_cnt):
            logger.info(
                "small e_val[%d] = %e + %e j", k, e_vals[k].real, e_vals[k].imag
            )

        # the old host path raised on a null eigenvector with a non-trivial
        # imaginary part; the locked iteration returns a real Ritz vector,
        # so guard on the residual instead -- a vector that is not actually
        # near-null would silently break the conservation projection below
        from ...ops.eigen import band_matvec

        null_p = e_vects[:, 0] / np.linalg.norm(e_vects[:, 0])
        null_resid = float(
            np.linalg.norm(np.asarray(band_matvec(bands, jnp.asarray(null_p))))
        )
        mat_scale = float(np.abs(np.diag(mat)).max())
        if null_resid > 1.0e-4 * mat_scale:
            raise RuntimeError(
                f"computed null vector is not near-null: ||mat @ v|| = "
                f"{null_resid:.3e} vs matrix scale {mat_scale:.3e}; the "
                "inverse iteration failed to isolate the conservation mode"
            )

        null_vect = np.empty(self_vals.size)
        null_vect[perm] = null_p

        # shift-regularize + Richardson-extrapolate to zero shift
        shift = 0.5 * e_vals[1].real
        rhs_p = jnp.asarray(self_vals[perm])
        solve_tmp = np.asarray(banded_shift_solve(bands, shift, rhs_p))
        solve_half = np.asarray(banded_shift_solve(bands, 0.5 * shift, rhs_p))
        solve_vals = np.empty(self_vals.size)
        solve_vals[perm] = 2.0 * solve_half - solve_tmp

        # normalize the null vector so its weighted mean is 1 per region
        e_vect_tms = copy.copy(self)
        e_vect_tms.set_tracer_vals_all(null_vect.reshape(shape), reseat_vals=True)
        e_vect_tms /= e_vect_tms.mean()

        precond_dir = os.path.dirname(fptr_precond.fname)
        null_space_fname = os.path.join(precond_dir, "precond_null_space.nc")
        with NCFile(null_space_fname, mode="w") as fptr_null_space:
            fptr_null_space.stamp_history(
                "py_driver_2d.phosphorus.apply_precond_jacobian"
            )
            e_vect_tms.dump(fptr_null_space, "define")
            e_vect_tms.dump(fptr_null_space, "write")

        # project out the null direction so total P is conserved
        solve_tms = copy.copy(self)
        solve_tms.set_tracer_vals_all(solve_vals.reshape(shape), reseat_vals=True)
        solve_tms -= solve_tms.mean() * e_vect_tms
        solve_vals = solve_tms.get_tracer_vals_all().reshape(-1)

        res_tms.set_tracer_vals_all((solve_vals - self_vals).reshape(shape))

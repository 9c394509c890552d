"""iage tracer module for py_driver_2d: ideal age with fast and slow surface
restoring (2 tracers).  Behavioral spec: nk_ooc/py_driver_2d/iage.py.

Preconditioner: invert I - prod_i (I - dt J(t_i)) (three implicit-Euler steps
across the year) minus identity, i.e. the Jacobian of F(X) = X(1yr) - X under
a coarse time discretization.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import physics
from .tracer_module_state import TracerModuleState

SURF_SLOW_FACTOR = 0.01


def surf_restore_rate(depth):
    """surface restoring rate: 24/day over 10 m, scaled to the surface layer"""
    return 24.0 / 86400.0 * 10.0 / depth.delta[0]


class iage(TracerModuleState):  # noqa: N801
    """iage tracer module (iage, iage_slow_rest)"""

    @staticmethod
    def build_tend(grid, static_args, params):
        (restore_rate,) = static_args
        # python float (weak-typed): a np.float64 scalar would promote the
        # float32 fast path's arithmetic to float64
        restore_rate = float(restore_rate)
        nz = grid.depth_mid.shape[0]
        ny = grid.ypos_mid.shape[0]

        def tend(time, vals_flat):
            vals = vals_flat.reshape((2, nz, ny))
            kv = physics.vert_mixing_coeff(grid, time)
            d0 = physics.transport_tend(grid, kv, vals[0])
            d1 = physics.transport_tend(grid, kv, vals[1])
            d0 = d0.at[0, :].add(-restore_rate * vals[0, 0, :])
            d1 = d1.at[0, :].add(
                -SURF_SLOW_FACTOR * restore_rate * vals[1, 0, :]
            )
            aging = 1.0 / physics.SEC_PER_YEAR
            return (jnp.stack([d0, d1]) + aging).reshape(-1)

        return tend

    @staticmethod
    def build_jac(grid, static_args, params):
        (restore_rate,) = static_args
        nz = grid.depth_mid.shape[0]
        ny = grid.ypos_mid.shape[0]
        n = nz * ny
        surf = np.arange(ny)

        def jac(time, vals_flat):
            jt = physics.transport_jac(grid, time)
            j0 = jt.at[surf, surf].add(-restore_rate)
            j1 = jt.at[surf, surf].add(-SURF_SLOW_FACTOR * restore_rate)
            return physics.block_diag_tracers([j0, j1])

        return jac

    @classmethod
    def band_info(cls, grid):
        """per-tracer banded layout with the smaller grid dimension as the
        far stride: bandwidth min(nz, ny) (cells z-major when ny <= nz,
        ypos-major otherwise); perm keeps tracers outermost so the banded
        solver's per-block reshape stays aligned"""
        nz = grid.depth_mid.shape[0]
        ny = grid.ypos_mid.shape[0]
        n = nz * ny
        if nz < ny:
            cell_perm = (
                np.arange(ny)[:, None] + np.arange(nz)[None, :] * ny
            ).reshape(-1)
            bw = nz
        else:
            cell_perm = np.arange(n)
            bw = ny
        perm = (np.arange(2)[:, None] * n + cell_perm[None, :]).reshape(-1)
        return bw, perm

    @staticmethod
    def build_jac_bands(grid, static_args, params):
        """banded stage Jacobian, (2 tracer blocks, ncell, 2*bw+1) in the
        band_info cell ordering"""
        (restore_rate,) = static_args
        restore_rate = float(restore_rate)  # weak-typed: see build_tend
        nz = grid.depth_mid.shape[0]
        ny = grid.ypos_mid.shape[0]
        ymajor = nz < ny
        bw = min(nz, ny)
        # surface cells (z = 0) in the chosen ordering
        surf = np.arange(ny) * nz if ymajor else np.arange(ny)

        def jac_bands(time, vals_flat):
            if ymajor:
                bt = physics.transport_bands_ymajor(grid, time)
            else:
                bt = physics.transport_bands(grid, time)
            b0 = bt.at[surf, bw].add(-restore_rate)
            b1 = bt.at[surf, bw].add(-SURF_SLOW_FACTOR * restore_rate)
            return jnp.stack([b0, b1])

        return jac_bands

    def tend_static_args(self):
        return (surf_restore_rate(self.depth),)

    def tend_params(self):
        return np.zeros(0)

    def apply_precond_jacobian(self, time_range, res_tms, jac_builder, fptr_precond):
        """coarse implicit-Euler-product preconditioner (see module docstring)"""
        self_vals_3d = self.get_tracer_vals_all()
        shape = self_vals_3d.shape
        self_vals = self_vals_3d.reshape(-1)

        time_n = 3
        time_delta = (time_range[1] - time_range[0]) / time_n

        eye = np.eye(self_vals.size)
        mat = np.eye(self_vals.size)
        for time_ind in range(time_n):
            time_mid = time_range[0] + (time_ind + 0.5) * time_delta
            # iage's Jacobian is tracer-independent; zeros are a fine eval point
            jac = jac_builder(time_mid, np.zeros_like(self_vals))
            mat = mat @ (eye - time_delta * jac)
        mat = eye - mat

        res_vals = np.linalg.solve(mat, self_vals)
        res_tms.set_tracer_vals_all((res_vals - self_vals).reshape(shape))

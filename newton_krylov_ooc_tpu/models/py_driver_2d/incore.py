"""device-resident py_driver_2d kernels for the in-core solver and benchmarks.

The iage kernel integrates both tracers through the fused IMEX year scan,
takes exact jax.jvp Jacobian-vector products through the full year, and
preconditions with a float32 dense LU of the implicit-Euler-product operator
(runs on the TPU MXU).  All reductions contract against the dense region-mean
matrix.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.imex import imex_year
from ...utils.regions import region_mean_weights
from . import physics
from .iage import SURF_SLOW_FACTOR, surf_restore_rate


class IageKernel:
    """in-core kernel: py_driver_2d iage (2 tracers), IMEX year integration

    state layout: (2, nz, ny) device array
    """

    def __init__(self, depth, ypos, modelinfo, dtype=jnp.float32, n_steps=8760,
                 region_mask=None, grid_weight=None):
        self.depth = depth
        self.ypos = ypos
        self.dtype = dtype
        self.n_steps = n_steps
        self.grid = physics.make_grid(depth, ypos, modelinfo, dtype)
        self.nz, self.ny = len(depth), len(ypos)
        self.rate = surf_restore_rate(depth)
        self.year = physics.SEC_PER_YEAR

        if region_mask is None:
            region_mask = np.ones((self.nz, self.ny), dtype=np.int32)
        if grid_weight is None:
            grid_weight = np.outer(depth.delta, ypos.delta)
        self.region_cnt = int(region_mask.max())
        self.mean_mat = jnp.asarray(
            region_mean_weights(region_mask, grid_weight), dtype
        )

        diag = np.zeros((2, self.nz, self.ny))
        diag[0, 0, :] = -self.rate
        diag[1, 0, :] = -SURF_SLOW_FACTOR * self.rate
        self._vert_diag = jnp.asarray(diag, dtype)

        grid = self.grid
        year = self.year

        def explicit_tend(t, y):
            def one(v):
                return physics.advection_tend(grid, v) + physics.horiz_mix_tend(
                    grid, v
                )

            return jax.vmap(one)(y) + 1.0 / year

        def vert_coeff(t):
            return physics.vert_mixing_coeff(grid, t)

        vert_diag = self._vert_diag

        def year_fn(y):
            return imex_year(
                explicit_tend, vert_coeff, vert_diag, grid.dz_r, y,
                (0.0, year), n_steps,
            )

        self._year_fn = jax.jit(year_fn)
        self._comp_fcn = jax.jit(lambda y: year_fn(y) - y)
        self._jvp = jax.jit(
            lambda y, v: jax.jvp(lambda yy: year_fn(yy) - yy, (y,), (v,))[1]
        )

        # dense per-tracer Jacobian hooks for the preconditioner
        physics.lateral_jac_const(grid)
        self._precond_factor = jax.jit(self._precond_factor_impl)
        self._precond_solve = jax.jit(self._precond_solve_impl)

        # region-weighted reductions: (2, nz, ny) -> (1 module, region_cnt)
        def dot(a, b):
            prod = (a * b).sum(axis=0).reshape(-1)
            return (self.mean_mat @ prod)[None, :]

        self._dot = jax.jit(dot)

    # -- solver interface --------------------------------------------------------

    def comp_fcn(self, x):
        return self._comp_fcn(x)

    def jvp(self, x, fcn, v):
        """exact Jacobian-vector product of F at x (forward mode, full year)"""
        return self._jvp(x, v)

    def dot(self, a, b):
        return self._dot(a, b)

    def norm(self, v):
        return jnp.sqrt(self._dot(v, v))

    @staticmethod
    def add(a, b):
        return a + b

    def scale(self, v, factor):
        """scale by a scalar or per-(module, region) factors"""
        factor = np.asarray(factor)
        if factor.ndim == 0:
            return v * float(factor)
        # broadcast per-region scalars onto the grid (single module here)
        return v * self._region_broadcast(jnp.asarray(factor[0], self.dtype))

    @partial(jax.jit, static_argnums=0)
    def _region_broadcast(self, region_vals):
        # mean_mat rows are nonzero exactly on their region's cells
        mask = (self.mean_mat > 0).astype(self.dtype)  # (region, ncell)
        field = (region_vals @ mask).reshape(self.nz, self.ny)
        fill = 1.0 - (jnp.ones((self.region_cnt,), self.dtype) @ mask).reshape(
            self.nz, self.ny
        )
        return field + fill

    def apply_limiter(self, x, increment):
        """iage has no bounds; factors are 1"""
        return np.ones((1, self.region_cnt))

    def lin_comb(self, basis, coeff):
        res = self.scale(basis[0], coeff[0])
        for j in range(1, len(basis)):
            res = res + self.scale(basis[j], coeff[j])
        return res

    # -- preconditioner -----------------------------------------------------------

    def _precond_factor_impl(self):
        """LU-factor the implicit-Euler-product approximation of dF/dx"""
        grid = self.grid
        n = self.nz * self.ny
        time_n = 3
        dt = self.year / time_n
        eye = jnp.eye(n, dtype=self.dtype)
        surf = jnp.arange(self.ny)

        mats = []
        for tracer, rate in ((0, self.rate), (1, SURF_SLOW_FACTOR * self.rate)):
            mat = eye
            for i in range(time_n):
                t_mid = (i + 0.5) * dt
                jt = physics.transport_jac(grid, t_mid).astype(self.dtype)
                jt = jt.at[surf, surf].add(-rate)
                mat = mat @ (eye - dt * jt)
            mats.append(eye - mat)
        lu0 = jax.scipy.linalg.lu_factor(mats[0])
        lu1 = jax.scipy.linalg.lu_factor(mats[1])
        return lu0, lu1

    def _precond_solve_impl(self, data, r):
        lu0, lu1 = data
        n = self.nz * self.ny
        x0 = jax.scipy.linalg.lu_solve(lu0, r[0].reshape(n))
        x1 = jax.scipy.linalg.lu_solve(lu1, r[1].reshape(n))
        return jnp.stack(
            [x0.reshape(self.nz, self.ny), x1.reshape(self.nz, self.ny)]
        ) - r

    def precond_setup(self, x):
        return self._precond_factor()

    def precond_apply(self, data, r):
        return self._precond_solve(data, r)

    # -- conveniences -------------------------------------------------------------

    def init_iterate(self, tracer_module_def=None):
        """column-interpolated initial iterate matching gen_init_iterate"""
        column = np.interp(self.depth.mid, [55.0, 200.0], [0.0, 2.0])
        field = np.broadcast_to(column[:, None], (self.nz, self.ny))
        return jnp.asarray(np.stack([field, field]), self.dtype)

"""device-resident test_problem kernels: the 1D column family batched.

The test_problem model is a single depth column (nk_ooc/test_problem/*);
its parameterized dye_decay_{suff} family (and iage) batch over a leading
module axis and integrate through the same fused IMEX year scan the 2D
model uses (ops/imex.py) with a one-column ypos dimension -- vertical
mixing and the stiff surface terms (iage piston restoring) are implicit,
the pulsed dye inflow and first-order decay explicit.  A whole family of
modules spins up in ONE batched Newton-Krylov solve: every solver scalar
carries the module axis (SURVEY.md section 2.6 P1), and the tridiagonal
implicit-Euler-product preconditioner is the full 1D Jacobian, so GMRES
converges in a couple of iterations.

The file-backed path (model_state.py, Radau at rtol 1e-12) remains the
reference-parity surface; this kernel is the throughput path for family
sweeps, validated against Radau in tests/test_test_problem_incore.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.imex import imex_year
from ...ops.tridiag import pcr_solve
from . import constants, physics


class DyeDecayFamilyKernel:
    """in-core kernel: a batch of dye_decay_{suff} modules (one tracer each)

    decay_rates_per_year: family parameter vector (module axis); state
    layout (module, nlev) device array.
    """

    n_tracers = 1

    def __init__(self, depth, decay_rates_per_year, dtype=jnp.float64,
                 n_steps=2920):
        self.depth = depth
        self.dtype = dtype
        self.n_steps = n_steps
        self.nlev = len(depth)
        self.grid = physics.column_grid(depth, dtype)
        self.rates = np.asarray(decay_rates_per_year, np.float64)
        self.module_cnt = len(self.rates)
        self.year = constants.sec_per_year

        self._weight = jnp.asarray(depth.delta, dtype)
        self._weight_sum = float(np.sum(depth.delta))
        decay = jnp.asarray(
            self.rates[:, None, None] * constants.year_per_sec, dtype
        )
        self._decay = decay

        grid = self.grid
        year = self.year

        def explicit_tend(t, y):
            # pulsed surface inflow + first-order decay; y (M, nlev, 1)
            surf = physics.dye_decay_surf_flux(t, y.dtype) * grid.delta_r[0]
            inflow = jnp.zeros_like(y).at[:, 0, :].add(surf)
            return inflow - decay * y

        def vert_coeff(t):
            return physics.mixing_coeff(grid, t)[:, None]  # (nlev-1, 1)

        zero_diag = jnp.zeros((self.module_cnt, self.nlev, 1), dtype)

        @jax.jit
        def year_fn(y):
            return imex_year(
                explicit_tend, vert_coeff, zero_diag, grid.delta_r,
                y[..., None], (0.0, year), n_steps,
            )[..., 0]

        # source-free map for exact JVPs (the family is linear)
        def explicit_tend0(t, y):
            return -decay * y

        @jax.jit
        def year0_fn(v):
            return imex_year(
                explicit_tend0, vert_coeff, zero_diag, grid.delta_r,
                v[..., None], (0.0, year), n_steps,
            )[..., 0]

        self._year_fn = year_fn
        self._comp_fcn = jax.jit(lambda y: year_fn(y) - y)
        self._jvp = jax.jit(lambda v: year0_fn(v) - v)

        @jax.jit
        def dot(a, b):
            return (
                jnp.sum(a * b * self._weight, axis=1) / self._weight_sum
            )[:, None]

        self._dot = dot

        # preconditioner: implicit Euler of the FULL 1D Jacobian
        # (mixing at mid-year + decay) -- tridiagonal per module, solved by
        # PCR along depth; essentially exact for this model
        dt_pc = year

        @jax.jit
        def precond_apply(_data, r):
            kv = physics.mixing_coeff(grid, 0.5 * year)      # (nlev-1,)
            dr = grid.delta_r
            up = kv * dr[:-1]
            lo = kv * dr[1:]
            zero = jnp.zeros((1,), r.dtype)
            du = jnp.concatenate([up, zero])
            dl = jnp.concatenate([zero, lo])
            dmain = -(du + dl)[None, :] - decay[:, :, 0]     # (M, nlev)
            a_dl = jnp.broadcast_to(-dt_pc * dl, r.shape)
            a_d = 1.0 - dt_pc * dmain
            a_du = jnp.broadcast_to(-dt_pc * du, r.shape)
            return pcr_solve(a_dl, a_d, a_du, r) - r

        self._precond_apply = precond_apply

    # -- solver interface ----------------------------------------------------

    def init_iterate(self):
        return jnp.zeros((self.module_cnt, self.nlev), self.dtype)

    def comp_fcn(self, x):
        return self._comp_fcn(x)

    def jvp(self, x, fcn, v):
        return self._jvp(v)

    def dot(self, a, b):
        return self._dot(a, b)

    def norm(self, v):
        return jnp.sqrt(self._dot(v, v))

    @staticmethod
    def add(a, b):
        return a + b

    def scale(self, v, factor):
        factor = np.asarray(factor)
        if factor.ndim == 0:
            return v * float(factor)
        return v * jnp.asarray(factor, self.dtype)[:, 0, None]

    def region_broadcast(self, scalars):
        """(module, region=1) -> (module, 1) broadcastable field"""
        return scalars

    def apply_limiter(self, x, increment):
        return np.ones((self.module_cnt, 1))

    def lin_comb(self, basis, coeff):
        res = self.scale(basis[0], coeff[0])
        for j in range(1, len(basis)):
            res = res + self.scale(basis[j], coeff[j])
        return res

    def precond_setup(self, x):
        return None

    def precond_apply(self, data, r):
        return self._precond_apply(data, r)


class IageColumnKernel(DyeDecayFamilyKernel):
    """in-core kernel: test_problem iage (single module, one tracer).

    The stiff surface piston-velocity restoring (700 s timescale at
    meter-scale surface layers) folds into the implicit diagonal; the
    +1 yr/yr aging source is explicit.
    """

    def __init__(self, depth, dtype=jnp.float64, n_steps=2920):
        super().__init__(depth, np.zeros(1), dtype=dtype, n_steps=n_steps)
        grid = self.grid
        year = self.year

        diag = np.zeros((1, self.nlev, 1))
        diag[0, 0, 0] = -physics.IAGE_PIST_VEL * float(
            np.asarray(grid.delta_r)[0]
        )
        diag_j = jnp.asarray(diag, dtype)
        self._diag = diag_j

        def explicit_tend(t, y):
            return jnp.full_like(y, constants.year_per_sec)

        def vert_coeff(t):
            return physics.mixing_coeff(grid, t)[:, None]

        @jax.jit
        def year_fn(y):
            return imex_year(
                explicit_tend, vert_coeff, diag_j, grid.delta_r,
                y[..., None], (0.0, year), n_steps,
            )[..., 0]

        def explicit_tend0(t, y):
            return jnp.zeros_like(y)

        @jax.jit
        def year0_fn(v):
            return imex_year(
                explicit_tend0, vert_coeff, diag_j, grid.delta_r,
                v[..., None], (0.0, year), n_steps,
            )[..., 0]

        self._year_fn = year_fn
        self._comp_fcn = jax.jit(lambda y: year_fn(y) - y)
        self._jvp = jax.jit(lambda v: year0_fn(v) - v)

        dt_pc = year

        @jax.jit
        def precond_apply(_data, r):
            kv = physics.mixing_coeff(grid, 0.5 * year)
            dr = grid.delta_r
            up = kv * dr[:-1]
            lo = kv * dr[1:]
            zero = jnp.zeros((1,), r.dtype)
            du = jnp.concatenate([up, zero])
            dl = jnp.concatenate([zero, lo])
            dmain = -(du + dl)[None, :] + diag_j[:, :, 0]
            a_dl = jnp.broadcast_to(-dt_pc * dl, r.shape)
            a_d = 1.0 - dt_pc * dmain
            a_du = jnp.broadcast_to(-dt_pc * du, r.shape)
            return pcr_solve(a_dl, a_d, a_du, r) - r

        self._precond_apply = precond_apply


__all__ = ["DyeDecayFamilyKernel", "IageColumnKernel"]

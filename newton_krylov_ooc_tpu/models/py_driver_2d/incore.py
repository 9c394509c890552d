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


def _matmul_highest(fn):
    """trace fn under highest matmul precision: TPU float32 matmuls default
    to reduced (bfloat16-multiply) MXU precision, which degrades the dense-LU
    preconditioner enough to stall Newton -- solver linear algebra needs the
    full-precision path"""

    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
from .iage import SURF_SLOW_FACTOR, surf_restore_rate
from .phosphorus import DEFAULT_PARAMS, light_lim_2d


def _warn_if_explicit_unstable(grid, n_steps):
    """the Heun (explicit lateral) half diverges silently past its
    stability bound -- at fine ypos spacing the diffusion limit
    dt <= dy^2/(2K) binds before anything else (physics.explicit_dt_bound);
    warn loudly rather than benchmark NaNs"""
    import logging

    dt = physics.SEC_PER_YEAR / n_steps
    bound = physics.explicit_dt_bound(grid)
    if dt > bound:
        logging.getLogger(__name__).warning(
            "dt=%.0f s exceeds the explicit lateral stability bound %.0f s "
            "for this grid (dy^2/(2K) or dy/v); the year integration WILL "
            "diverge -- raise n_steps to at least %d",
            dt,
            bound,
            int(np.ceil(physics.SEC_PER_YEAR / bound)),
        )


class IageKernel:
    """in-core kernel: py_driver_2d iage (2 tracers), IMEX year integration

    state layout: (2, nz, ny) device array
    """

    def __init__(self, depth, ypos, modelinfo, dtype=jnp.float32, n_steps=8760,
                 region_mask=None, grid_weight=None, use_pallas=None,
                 warn_unstable=True):
        self.depth = depth
        self.ypos = ypos
        self.dtype = dtype
        self.n_steps = n_steps
        self.grid = physics.make_grid(depth, ypos, modelinfo, dtype)
        self.nz, self.ny = len(depth), len(ypos)
        # warn_unstable=False is for kernels that are lowered but never
        # executed (cost analysis at n_steps=1): the bound is meaningless
        # there and the warning would read as a real divergence
        if warn_unstable:
            _warn_if_explicit_unstable(self.grid, n_steps)
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
        self._weight_flat = jnp.asarray(np.asarray(grid_weight).reshape(-1), dtype)

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

        # on TPU at float32 the whole year runs as ONE pallas kernel (state
        # VMEM-resident across all steps, ~3x the XLA scan); the model is
        # linear, so the exact Jacobian-vector product is the same kernel
        # with the aging source zeroed: J v = year_src0(v) - v
        if use_pallas is None:
            use_pallas = (
                jax.default_backend() == "tpu" and dtype == jnp.float32
            )
        self.use_pallas = use_pallas
        if use_pallas:
            from ...ops.imex_pallas import build_iage_year_pallas_v2

            source = np.full((2, 1, 1), 1.0 / year, np.float32)
            year_pl = build_iage_year_pallas_v2(
                grid, self._vert_diag, source, (0.0, year), n_steps
            )
            year0_pl = build_iage_year_pallas_v2(
                grid, self._vert_diag, np.zeros((2, 1, 1), np.float32),
                (0.0, year), n_steps,
            )
            self._year_fn = year_pl
            self._comp_fcn = jax.jit(lambda y: year_pl(y) - y)
            self._jvp = jax.jit(lambda y, v: year0_pl(v) - v)
        else:
            self._year_fn = jax.jit(year_fn)
            self._comp_fcn = jax.jit(lambda y: year_fn(y) - y)
            self._jvp = jax.jit(
                lambda y, v: jax.jvp(lambda yy: year_fn(yy) - yy, (y,), (v,))[1]
            )

        # dense per-tracer Jacobian hooks for the preconditioner
        physics.lateral_jac_const(grid)
        self._precond_factor = jax.jit(_matmul_highest(self._precond_factor_impl))
        self._precond_solve = jax.jit(_matmul_highest(self._precond_solve_impl))

        # region-weighted reductions: (2, nz, ny) -> (1 module, region_cnt)
        def dot(a, b):
            prod = (a * b).sum(axis=0).reshape(-1)
            return (self.mean_mat @ prod)[None, :]

        self._dot = jax.jit(dot)

    # -- solver interface --------------------------------------------------------

    def build_year_operator(self, col_chunk=128):
        """probe the exact dense one-year transition operator (the model is
        linear): full-rank lane-packed Jacobian probing through the batched
        year kernel (ops/year_operator.py).  After this one-time cost, fn
        evals and JVPs are single MXU matvecs and the cyclo-stationary state
        solves directly."""
        from ...ops.year_operator import probe_year_operator

        grid, year, n_steps = self.grid, self.year, self.n_steps
        # the pallas kernel is float32 by design; the scan path probes in
        # the kernel's own dtype (float64 operators for f64 kernels)
        probe_dtype = np.float32 if self.use_pallas else np.dtype(self.dtype)
        vert_diag = np.asarray(self._vert_diag, probe_dtype)

        if self.use_pallas:
            from ...ops.imex_pallas import build_iage_year_pallas_v2

            def make_year0(channel_diag):
                c_dim = channel_diag.shape[0]
                return build_iage_year_pallas_v2(
                    grid, channel_diag, np.zeros((c_dim, 1, 1), np.float32),
                    (0.0, year), n_steps,
                )
        else:

            def explicit_tend0(t, y):
                def one(v):
                    return physics.advection_tend(
                        grid, v
                    ) + physics.horiz_mix_tend(grid, v)

                return jax.vmap(one)(y)

            # channel_diag is a jit OPERAND (not a closure capture): the probe
            # calls make_year0 once per chunk, and captured arrays become
            # program literals re-uploaded every call on remote backends --
            # one jitted fn also means one compile across all equal-shape
            # chunks (same operand-form rule as ops/sparse.py, year_operator)
            @jax.jit
            def year0_op(y, channel_diag):
                return imex_year(
                    explicit_tend0,
                    lambda t: physics.vert_mixing_coeff(grid, t),
                    channel_diag,
                    grid.dz_r,
                    y,
                    (0.0, year),
                    n_steps,
                )

            def make_year0(channel_diag):
                channel_diag = jnp.asarray(channel_diag, self.dtype)
                return lambda y: year0_op(y, channel_diag)

        return probe_year_operator(
            make_year0, self._year_fn, vert_diag, col_chunk=col_chunk,
            dtype=probe_dtype,
        )

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

    def region_broadcast(self, scalars):
        """(module=1, region) scalars -> (nz, ny) field (traceable; the
        jitted-GMRES hook)"""
        return self._region_broadcast(scalars[0])

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


class PhosphorusKernel(IageKernel):
    """in-core kernel: py_driver_2d phosphorus (po4/dop/pop), IMEX year.

    Nonlinear (Michaelis-Menten uptake), so the affine year-operator probe
    does not apply -- `build_year_operator` raises rather than probing a
    wrong linearization (see the override below).

    The only stiff term is vertical mixing, which the Crank-Nicolson half of
    the IMEX split absorbs; biogeochemistry (Michaelis-Menten uptake at a
    ~3 day timescale, remineralization at ~0.5 yr) and particulate sinking
    (Courant number ~4e-3 at hourly steps) integrate explicitly in the Heun
    half.  state layout: (3, nz, ny).
    """

    def __init__(self, depth, ypos, modelinfo, dtype=jnp.float32, n_steps=8760,
                 region_mask=None, grid_weight=None, params=None,
                 use_pallas=None):
        # reuse IageKernel's mesh/region plumbing, then swap the physics
        super().__init__(depth, ypos, modelinfo, dtype, n_steps,
                         region_mask, grid_weight, use_pallas=use_pallas)
        self.params = dict(DEFAULT_PARAMS if params is None else params)
        p = self.params

        grid = self.grid
        year = self.year
        nz, ny = self.nz, self.ny
        light_lim = jnp.asarray(light_lim_2d(depth, ypos), dtype)
        dz_r = grid.dz_r
        sink_vel = p["pop_sink_vel"]

        def explicit_tend(t, y):
            po4, dop, pop = y[0], y[1], y[2]

            def transport(v):
                return physics.advection_tend(grid, v) + physics.horiz_mix_tend(
                    grid, v
                )

            d = jax.vmap(transport)(y)

            uptake = (
                p["max_uptake_rate"] * light_lim * po4 / (po4 + p["po4_halfsat"])
            )
            dop_remin = p["dop_remin_rate"] * dop
            pop_remin = p["pop_remin_rate"] * pop
            d_po4 = d[0] - uptake + dop_remin + pop_remin
            d_dop = d[1] + p["sigma"] * uptake - dop_remin
            d_pop = d[2] + (1.0 - p["sigma"]) * uptake - pop_remin

            # particulate sinking, zero-flux bottom (mass retained)
            sink_int = sink_vel * pop[:-1, :]
            zero = jnp.zeros((1, ny), y.dtype)
            sink = jnp.concatenate([zero, sink_int, zero], axis=0)
            d_pop = d_pop + dz_r[:, None] * (sink[:-1, :] - sink[1:, :])

            return jnp.stack([d_po4, d_dop, d_pop])

        def vert_coeff(t):
            return physics.vert_mixing_coeff(grid, t)

        vert_diag = jnp.zeros((3, nz, ny), dtype)  # no linear local term

        def year_fn(y):
            return imex_year(
                explicit_tend, vert_coeff, vert_diag, dz_r, y, (0.0, year),
                n_steps,
            )

        # forward evaluations run as one pallas kernel on TPU (see
        # IageKernel); the model is nonlinear, so Jacobian-vector products
        # stay on the XLA path (exact jax.jvp through the scan)
        if self.use_pallas:
            from ...ops.imex_pallas import build_phosphorus_year_pallas

            year_pl = build_phosphorus_year_pallas(
                grid, self.params, light_lim_2d(depth, ypos), (0.0, year),
                n_steps,
            )
            self._year_fn = year_pl
            self._comp_fcn = jax.jit(lambda y: year_pl(y) - y)
        else:
            self._year_fn = jax.jit(year_fn)
            self._comp_fcn = jax.jit(lambda y: year_fn(y) - y)
        self._jvp = jax.jit(
            lambda y, v: jax.jvp(lambda yy: year_fn(yy) - yy, (y,), (v,))[1]
        )
        self._precond_factor = jax.jit(_matmul_highest(self._phos_precond_factor))
        self._precond_solve = jax.jit(_matmul_highest(self._phos_precond_solve))

        def dot(a, b):
            prod = (a * b).sum(axis=0).reshape(-1)
            return (self.mean_mat @ prod)[None, :]

        self._dot = jax.jit(dot)

    # -- preconditioner: one implicit-Euler step of the full coupled Jacobian ------

    def _phos_jac(self, t_mid, po4_lin):
        """dense coupled Jacobian at a po4 linearization point (f32, MXU)"""
        from .phosphorus import phosphorus

        p = self.params
        static_args = (
            p["po4_halfsat"],
            p["max_uptake_rate"],
            p["sigma"],
            p["dop_remin_rate"],
            p["pop_remin_rate"],
            p["pop_sink_vel"],
            tuple(light_lim_2d(self.depth, self.ypos).reshape(-1)),
        )
        jac_fn = phosphorus.build_jac(self.grid, static_args, jnp.zeros(0))
        n = self.nz * self.ny
        vals = jnp.zeros((3 * n,), self.dtype).at[:n].set(po4_lin.reshape(-1))
        return jac_fn(t_mid, vals).astype(self.dtype)

    def _phos_precond_factor(self, po4_lin):
        """LU of the bordered implicit-Euler operator.

        mat = dt*J is exactly singular: total phosphorus is conserved, so the
        grid-weight functional w (tiled over the three tracers) is a left null
        vector of J.  Bordering with the rank-one term c*w*w^T makes the
        factorization nonsingular, and for P-neutral right-hand sides (which
        F and all Krylov products are, up to discretization error) the
        bordered solve returns exactly the P-neutral solution: multiplying
        the system by w^T gives c*(w.w)*(w.x) = w.r = 0.  This replaces the
        eigen-decomposition + null-space projection the out-of-core module
        uses (phosphorus.apply_precond_jacobian) with a single LU.
        """
        n3 = 3 * self.nz * self.ny
        dt = self.year
        mat = dt * self._phos_jac(0.5 * self.year, po4_lin)
        w = jnp.tile(self._weight_flat, 3)
        c = jnp.abs(jnp.diagonal(mat)).mean() / (w @ w)
        mat = mat + c * jnp.outer(w, w)
        return jax.scipy.linalg.lu_factor(mat)

    def _phos_precond_solve(self, data, r):
        sol = jax.scipy.linalg.lu_solve(data, r.reshape(-1))
        return sol.reshape(r.shape) - r

    def precond_setup(self, x):
        return self._precond_factor(x[0])

    def precond_apply(self, data, r):
        return self._precond_solve(data, r)

    def build_year_operator(self, col_chunk=128):
        raise NotImplementedError(
            "the phosphorus year map is nonlinear (Michaelis-Menten "
            "uptake); the affine year-operator probe applies only to "
            "linear modules such as iage"
        )

    # -- conveniences -------------------------------------------------------------

    def init_iterate(self, tracer_module_def=None):
        """column-interpolated initial iterate matching gen_init_iterate"""
        profiles = (
            ([130.0, 260.0], [5.5e-3, 4.1]),
            ([95.0, 140.0], [7.1e-2, 1.5e-4]),
            ([170.0, 250.0], [1.8e-2, 7.9e-4]),
        )
        cols = [np.interp(self.depth.mid, d, v) for d, v in profiles]
        field = np.stack(
            [np.broadcast_to(c[:, None], (self.nz, self.ny)) for c in cols]
        )
        return jnp.asarray(field, self.dtype)

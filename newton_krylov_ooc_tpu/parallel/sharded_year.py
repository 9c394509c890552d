"""shard_map spatial decomposition of the IMEX model year.

The single-device year kernels (ops/imex.py scan, ops/imex_pallas.py
megakernel) top out at one chip's HBM/VMEM.  Past that, the grid must shard:
this module runs the SAME IMEX year (identical arithmetic, Kahan compensation
included) with the ypos dimension split over the mesh's 'space' axis and a
parameterized-module batch split over 'module' (SURVEY.md section 2.6 P1/P2/
P4; the reference's counterpart is the 2D MPI process grid of solve_ABdist,
nk_ooc/cime_pop/model_state.py:439-450).

Decomposition contract (the design parallel/mesh.py promises):
  * implicit vertical solves are COLUMN-LOCAL -- the Crank-Nicolson
    tridiagonal systems run entirely inside a shard, no communication;
  * the lateral stencils (centered-flux advection, horizontal mixing) need
    one ypos halo column per side per step: exactly two lax.ppermute
    collectives per explicit stage, riding ICI on real hardware;
  * face arrays (edge velocities, mixing coefficients) are precomputed per
    shard at setup with ZERO at physical domain boundaries, so the halo
    value is multiplied by zero there and boundary shards need no special
    cases -- the same zero-flux arithmetic as the unsharded stencils.

Equality: tests/test_sharded_year.py pins the sharded year against the
single-device `imex_year` to float64 roundoff, and a full sharded Newton
solve against the unsharded solve of the same kernel.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.py_driver_2d import physics
from ..models.py_driver_2d.iage import SURF_SLOW_FACTOR, surf_restore_rate
from ..ops.banded import banded_lu_factor_blocks, banded_lu_solve_blocks
from ..ops.imex import imex_year


class ShardedYearData:
    """per-shard static arrays for the decomposed year, stacked on a leading
    'space' axis so shard_map hands each shard its own block"""

    def __init__(self, depth, ypos, modelinfo, n_space, dtype=None):
        if dtype is None:
            dtype = jnp.result_type(float)
        nz, ny = len(depth), len(ypos)
        if ny % n_space != 0:
            raise ValueError(
                f"ypos size {ny} does not split over {n_space} shards"
            )
        ny_loc = ny // n_space
        self.nz, self.ny, self.n_space, self.ny_loc = nz, ny, n_space, ny_loc
        self.dtype = dtype

        grid = physics.make_grid(depth, ypos, modelinfo, dtype)
        self.grid = grid

        vvel = np.asarray(grid.vvel)    # (nz, ny+1) velocities at ypos faces
        hmc = np.asarray(grid.horiz_mix_coeff)  # (nz, ny-1) interior faces
        # effective face arrays with zero flux at the physical boundaries
        vfaces_g = vvel.copy()
        vfaces_g[:, 0] = 0.0
        vfaces_g[:, -1] = 0.0
        hfaces_g = np.zeros((nz, ny + 1), vvel.dtype)
        hfaces_g[:, 1:-1] = hmc

        # shard s covers global columns [s*ny_loc, (s+1)*ny_loc) and the
        # ny_loc+1 faces bounding them
        self.vfaces = np.stack(
            [vfaces_g[:, s * ny_loc : s * ny_loc + ny_loc + 1]
             for s in range(n_space)]
        )
        self.hfaces = np.stack(
            [hfaces_g[:, s * ny_loc : s * ny_loc + ny_loc + 1]
             for s in range(n_space)]
        )
        dy_r = np.asarray(grid.dy_r)
        wvel = np.asarray(grid.wvel)
        ypos_mid = np.asarray(grid.ypos_mid)
        self.dy_r = dy_r.reshape(n_space, ny_loc)
        self.wvel = np.stack(
            [wvel[:, s * ny_loc : (s + 1) * ny_loc] for s in range(n_space)]
        )
        self.ypos_mid = ypos_mid.reshape(n_space, ny_loc)

        # replicated depth-axis arrays
        self.depth_mid = np.asarray(grid.depth_mid)
        self.dz_r = np.asarray(grid.dz_r)
        self.dz_mid = np.asarray(grid.dz_mid)
        self.dz_mid_r = np.asarray(grid.dz_mid_r)


def build_sharded_year(mesh, data: ShardedYearData, diag, aging, t_span,
                       n_steps, unroll=8, local_tend=None,
                       local_data=None):
    """build the jitted sharded year map.

    mesh: ('module', 'space') Mesh (n_module may be 1)
    data: ShardedYearData for the grid
    diag: (module_batch, tracer, nz, ny) stiff local linear rates (e.g.
        surface restoring), folded into the implicit solve
    aging: (module_batch, tracer, 1, 1) per-module explicit source rates
        (the parameterized-module family axis); zeros for the source-free
        (Jacobian) map
    local_tend: optional COLUMN-LOCAL extra tendency hook
        local_tend(t, y_local, data_local) -> same shape as y_local --
        nonlinear biogeochemistry (uptake/remineralization), particulate
        sinking, and any other term with no lateral stencil plug in here
        and need no halo; data_local receives each entry of local_data
        sliced to the shard
    local_data: dict name -> (n_space, nz, ny_loc)-stacked arrays handed
        shard-local to local_tend (e.g. light limitation fields)
    Returns fn(y) -> y_end for y (module_batch, tracer, nz, ny) sharded
    P('module', None, None, 'space'); the result keeps the sharding.
    """
    n_space = data.n_space
    dtype = data.dtype
    dz_r = jnp.asarray(data.dz_r, dtype)
    depth_mid = jnp.asarray(data.depth_mid, dtype)
    dz_mid = jnp.asarray(data.dz_mid, dtype)
    dz_mid_r = jnp.asarray(data.dz_mid_r, dtype)

    fwd_perm = [(i, i + 1) for i in range(n_space - 1)]
    bwd_perm = [(i, i - 1) for i in range(1, n_space)]

    local_names = sorted(local_data) if local_data else []

    def local_year(y, diag_l, aging_l, vfaces, hfaces, dy_r_l, wvel_l,
                   ypos_mid_l, *extra):
        # shard blocks arrive with the leading stack axis of size 1
        vfaces = vfaces[0]
        hfaces = hfaces[0]
        dy_r_l = dy_r_l[0]
        wvel_l = wvel_l[0]
        ypos_mid_l = ypos_mid_l[0]
        data_local = {
            name: arr[0] for name, arr in zip(local_names, extra)
        }

        def halo_ext(v):
            """one halo column per side: ppermute along 'space'; boundary
            shards receive zeros, which the zeroed boundary faces annul"""
            left = jax.lax.ppermute(v[..., -1:], "space", fwd_perm)
            right = jax.lax.ppermute(v[..., :1], "space", bwd_perm)
            return jnp.concatenate([left, v, right], axis=-1)

        def explicit_tend(t, y):
            v_ext = halo_ext(y)                       # (..., nz, nyl+2)
            favg = 0.5 * (v_ext[..., 1:] + v_ext[..., :-1])
            wy = favg * vfaces                        # (..., nz, nyl+1)
            res = dy_r_l * (wy[..., :-1] - wy[..., 1:])
            dflux = hfaces * (v_ext[..., 1:] - v_ext[..., :-1])
            res = res + dy_r_l * (dflux[..., 1:] - dflux[..., :-1])

            # vertical advection: column-local centered flux
            wz_int = 0.5 * (y[..., 1:, :] + y[..., :-1, :]) * wvel_l[1:-1, :]
            zshape = y.shape[:-2] + (1, y.shape[-1])
            zero = jnp.zeros(zshape, y.dtype)
            wz = jnp.concatenate([zero, wz_int, zero], axis=-2)
            res = res + dz_r[:, None] * (wz[..., 1:, :] - wz[..., :-1, :])
            res = res + aging_l
            if local_tend is not None:
                res = res + local_tend(t, y, data_local)
            return res

        def vert_coeff(t):
            return physics.vert_mixing_coeff_arrays(
                depth_mid, dz_mid, dz_mid_r, ypos_mid_l, wvel_l, t
            )

        return imex_year(
            explicit_tend, vert_coeff, diag_l, dz_r, y, t_span, n_steps,
            unroll=unroll,
        )

    state_spec = P("module", None, None, "space")
    shard_spec = P("space", None, None)

    sharded = shard_map(
        local_year,
        mesh=mesh,
        in_specs=(
            state_spec,                    # y
            state_spec,                    # diag
            P("module", None, None, None),  # aging
            shard_spec,                    # vfaces
            shard_spec,                    # hfaces
            P("space", None),              # dy_r
            shard_spec,                    # wvel
            P("space", None),              # ypos_mid
        ) + tuple(shard_spec for _ in local_names),
        out_specs=state_spec,
        check_vma=False,
    )

    diag_dev = jax.device_put(
        jnp.asarray(diag, dtype), NamedSharding(mesh, state_spec)
    )
    aging_dev = jax.device_put(
        jnp.asarray(aging, dtype),
        NamedSharding(mesh, P("module", None, None, None)),
    )
    shard_args = tuple(
        jax.device_put(jnp.asarray(arr, dtype), NamedSharding(mesh, spec))
        for arr, spec in (
            (data.vfaces, shard_spec),
            (data.hfaces, shard_spec),
            (data.dy_r, P("space", None)),
            (data.wvel, shard_spec),
            (data.ypos_mid, P("space", None)),
        )
    )

    extra_dev = tuple(
        jax.device_put(
            jnp.asarray(local_data[name], dtype),
            NamedSharding(mesh, shard_spec),
        )
        for name in local_names
    )

    @jax.jit
    def year(y):
        return sharded(y, diag_dev, aging_dev, *shard_args, *extra_dev)

    return year




def _vertical_product_precond(kernel, tracer_diag, t_dim):
    """(factor_fn, apply_fn) for the column-local implicit-Euler-product
    vertical preconditioner composed with the ADI lateral sweep.

    M_vert = I - prod_i (I - dt T(t_i)) with T the vertical tridiagonal
    (mixing + the module's local linear rates) -- the reference's
    implicit-Euler-product preconditioner (nk_ooc/py_driver_2d/iage.py:66-93)
    restricted to the column-local part so it is shard-local and
    mesh-shape-independent.  The product of three tridiagonals is 7-banded
    per column; factored once per Newton iteration with the pivot-free
    banded LU, batched over (tracer, column) blocks.  apply_fn first runs
    the (I - dt L_y)^{-1} lateral sweep (PCR along the sharded ypos axis;
    without it GMRES must resolve the weakly damped lateral modes itself
    and stalls at the dimension cap)."""
    from ..ops.tridiag import pcr_solve

    data = kernel.data
    nz, ny = kernel.nz, kernel.ny
    dtype = kernel.dtype
    year = kernel.year
    tracer_diag = jnp.asarray(tracer_diag, dtype)      # (T, nz, ny)

    @jax.jit
    def factor():
        grid = data.grid
        dz_r = jnp.asarray(data.dz_r, dtype)
        time_n = 3
        dt = year / time_n
        eye = jnp.eye(nz, dtype=dtype)
        prod = jnp.broadcast_to(eye, (t_dim, ny, nz, nz))
        for i in range(time_n):
            t_mid = (i + 0.5) * dt
            kv = physics.vert_mixing_coeff(grid, t_mid)  # (nz-1, ny)
            up = kv * dz_r[:-1, None]
            lo = kv * dz_r[1:, None]
            zero = jnp.zeros((1, ny), dtype)
            du = jnp.concatenate([up, zero], axis=0)     # (nz, ny)
            dl = jnp.concatenate([zero, lo], axis=0)
            dmain = -(du + dl) + tracer_diag             # (T, nz, ny)
            t_mat = jnp.zeros((t_dim, ny, nz, nz), dtype)
            rows = jnp.arange(nz)
            t_mat = t_mat.at[:, :, rows, rows].set(
                jnp.swapaxes(dmain, -1, -2)
            )
            t_mat = t_mat.at[:, :, rows[1:], rows[:-1]].set(
                jnp.swapaxes(dl, -1, -2)[None, :, 1:]
            )
            t_mat = t_mat.at[:, :, rows[:-1], rows[1:]].set(
                jnp.swapaxes(du, -1, -2)[None, :, :-1]
            )
            prod = prod @ (eye - dt * t_mat)
        m_mat = eye - prod                               # (T, ny, nz, nz)
        bw = min(time_n, nz - 1)
        bands = jnp.zeros((t_dim, ny, nz, 2 * bw + 1), dtype)
        for d in range(2 * bw + 1):
            off = d - bw
            dvals = jnp.diagonal(m_mat, offset=off, axis1=-2, axis2=-1)
            rows = jnp.arange(max(0, -off), min(nz, nz - off))
            bands = bands.at[:, :, rows, d].set(dvals)
        return banded_lu_factor_blocks(bands.reshape(t_dim * ny, nz, -1))

    @jax.jit
    def apply(lu, r):
        # lateral sweep along ypos (last axis; PCR over the sharded dim)
        r_lat = pcr_solve(
            jnp.broadcast_to(kernel._lat_dl, r.shape),
            jnp.broadcast_to(kernel._lat_d, r.shape),
            jnp.broadcast_to(kernel._lat_du, r.shape),
            r,
        )
        # vertical product solve per (tracer, column) block along depth
        rb = jnp.swapaxes(r_lat, -1, -2).reshape(
            r.shape[0], t_dim * ny, nz
        )
        sol = jax.vmap(lambda rr: banded_lu_solve_blocks(lu, rr))(rb)
        sol = jnp.swapaxes(
            sol.reshape(r.shape[0], t_dim, ny, nz), -1, -2
        )
        return sol - r

    return factor, apply


class _ShardedKernelInterface:
    """solver-interface methods shared by the sharded kernels.

    Subclass __init__ must call _init_reductions (region-weighted dots and
    broadcasts) and set _comp_fcn / _precond_factor-or-None /
    _precond_apply; the interface then serves NewtonKrylovInCore and the
    jitted GMRES identically for every kernel."""

    def _init_reductions(self, mesh, region_mask, grid_weight, nz, ny,
                         dtype):
        if region_mask is None:
            region_mask = np.ones((nz, ny), np.int32)
        if grid_weight is None:
            grid_weight = np.outer(self.depth.delta, self.ypos.delta)
        self._region_mask_np = np.asarray(region_mask)
        (
            self.region_cnt,
            self._mean_w,
            self._onehot,
            self._region_fill,
        ) = _region_reduction_arrays(
            mesh, region_mask, grid_weight, nz, ny, dtype
        )

        @jax.jit
        def dot(a, b):
            # (B, T, nz, ny) x (R, nz, ny) -> (B, R): per-module, per-region
            # weighted dot products (tracer axis summed, reference
            # convention)
            prod = jnp.sum(a * b, axis=1)
            return jnp.einsum("bzy,rzy->br", prod, self._mean_w)

        self._dot = dot

        @jax.jit
        def region_broadcast_jit(scalars):
            field = jnp.einsum("br,rzy->bzy", scalars, self._onehot)
            return (field + self._region_fill)[:, None, :, :]

        self._region_broadcast = region_broadcast_jit

    def comp_fcn(self, x):
        return self._comp_fcn(x)

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
        # host numpy, not a committed device array: uncommitted inputs are
        # treated as replicated, which stays legal when the broadcast jit's
        # other operands span a multi-process mesh
        return v * self._region_broadcast(factor.astype(self.dtype))

    def region_broadcast(self, scalars):
        """(module, region) scalars -> (module, 1, nz, ny) field"""
        return self._region_broadcast(scalars)

    def apply_limiter(self, x, increment):
        return np.ones((self.module_batch, self.region_cnt))

    def limiter_scalef_jit(self, x, increment):
        """traced twin of apply_limiter for the fused solver
        (ops/newton_jit.py); the base-interface limiter is a no-op"""
        return jnp.ones((self.module_batch, self.region_cnt), self.dtype)

    def _limiter_scalef_lob0_jit(self, x, increment, lob=0.0):
        """traced twin of _apply_limiter_lob0: the largest per-(module,
        region) scale factor keeping x + scalef * increment >= lob across
        every tracer.  Sub-tolerance undershoots of the bound are clamped
        out of the base like the host path, but a genuinely infeasible
        state cannot raise inside jit -- the fused solver's Armijo/
        convergence flags surface the resulting divergence instead."""
        base = jnp.maximum(x, lob)
        violation = base + increment < lob
        denom = jnp.where(violation, increment, -jnp.ones_like(increment))
        scalef_cell = jnp.where(violation, (lob - base) / denom, 1.0)
        per_cell = jnp.min(scalef_cell, axis=1)       # (M, *spatial)
        masked = jnp.where(
            self._onehot[None] > 0, per_cell[:, None], jnp.inf
        )                                             # (M, R, *spatial)
        spatial_axes = tuple(range(2, masked.ndim))
        scalef = jnp.min(masked, axis=spatial_axes)   # (M, R)
        return jnp.minimum(scalef, 1.0).astype(self.dtype)

    def _finish_linear_family_setup(self, mesh, ypos, region_mask,
                                    grid_weight, tracer_diag_pc, t_dim):
        """shared wiring tail for LINEAR family kernels (self._year /
        self._year0 already built): sharding, region reductions, the ADI +
        vertical-product preconditioner, and the jitted fcn/jvp maps"""
        self.state_sharding = NamedSharding(
            mesh, P("module", None, None, "space")
        )
        self._init_reductions(
            mesh, region_mask, grid_weight, self.nz, self.ny, self.dtype
        )
        self._lat_dl, self._lat_d, self._lat_du = _lateral_tridiag_arrays(
            mesh, self.data, ypos, self.year, self.dtype
        )
        factor, apply = _vertical_product_precond(self, tracer_diag_pc, t_dim)
        self._precond_factor = lambda x: factor()
        self._precond_apply = apply
        self._comp_fcn = jax.jit(lambda y: self._year(y) - y)
        self._jvp = jax.jit(lambda v: self._year0(v) - v)

    def _apply_limiter_lob0(self, x, increment):
        """shared zero-lower-bound limiter: the largest per-(module,
        region) scale factor keeping x + scalef * increment >= 0 across
        every tracer (requires self._region_mask_np)"""
        from ..utils.regions import comp_scalef_lob

        x_np = self._clamp_lob_base(np.asarray(x)[0])
        inc_np = np.asarray(increment)[0]
        scalef = np.ones((1, self.region_cnt))
        for t_ind in range(x_np.shape[0]):
            comp = comp_scalef_lob(
                self.region_cnt, self._region_mask_np, x_np[t_ind],
                inc_np[t_ind], 0.0,
            )
            scalef[0] = np.minimum(scalef[0], comp)
        return scalef

    def _clamp_lob_base(self, x_np, lob=0.0, tol=1.0e-5):
        """clamp ulp/tolerance-level undershoots of the lower bound out of
        a limiter base (unlimited post-Newton fixed-point updates can sit
        slightly below the bound), but reject genuinely infeasible states
        loudly -- silently clamping a diverged iterate would let the next
        function evaluation hit the model's singularities"""
        undershoot = float(lob - x_np.min())
        scale = max(float(np.abs(x_np).max()), 1.0)
        if undershoot > tol * scale:
            raise RuntimeError(
                f"iterate violates the lower bound {lob} by {undershoot:.3e}"
                f" (tolerance {tol * scale:.3e}); the solve has left the "
                "feasible region"
            )
        return np.maximum(x_np, lob)

    def lin_comb(self, basis, coeff):
        res = self.scale(basis[0], coeff[0])
        for j in range(1, len(basis)):
            res = res + self.scale(basis[j], coeff[j])
        return res

    def precond_setup(self, x):
        factor = getattr(self, "_precond_factor", None)
        return None if factor is None else factor(x)

    def precond_apply(self, data, r):
        return self._precond_apply(data, r)


class ShardedIageKernel(_ShardedKernelInterface):
    """in-core solver kernel over a (module, space) mesh: a batch of
    parameterized iage-family modules (per-module aging rates), the sharded
    IMEX year, exact linear-model JVPs, and a column-local vertical-implicit
    preconditioner.

    Every solver operation (GMRES dots, region broadcasts, preconditioner
    tridiagonals) is plain jax on the sharded arrays -- XLA turns the
    reductions into psums over the mesh; nothing here ever gathers the state
    to one device.  The preconditioner is column-local BY CONSTRUCTION
    (vertical-only implicit solve), so the sharded and unsharded solves
    perform identical mathematics and their iterates agree to roundoff --
    the property tests/test_sharded_year.py pins.

    state layout: (module_batch, 2 tracers, nz, ny), sharded
    P('module', None, None, 'space').
    """

    def __init__(self, mesh, depth, ypos, modelinfo, module_rates,
                 dtype=None, n_steps=365, use_pallas=False, block_steps=8,
                 pallas_interpret=False, region_mask=None, grid_weight=None):
        if dtype is None:
            dtype = jnp.float32 if use_pallas else jnp.result_type(float)
        n_module, n_space = mesh.shape["module"], mesh.shape["space"]
        self.mesh = mesh
        self.depth, self.ypos = depth, ypos
        self.dtype = dtype
        self.data = ShardedYearData(depth, ypos, modelinfo, n_space, dtype)
        nz, ny = self.data.nz, self.data.ny
        self.nz, self.ny = nz, ny
        self.module_batch = len(module_rates)
        if self.module_batch % n_module != 0:
            raise ValueError(
                f"module batch {self.module_batch} does not split over "
                f"{n_module} mesh blocks"
            )
        self.year = physics.SEC_PER_YEAR

        rate = surf_restore_rate(depth)
        diag = np.zeros((self.module_batch, 2, nz, ny))
        diag[:, 0, 0, :] = -rate
        diag[:, 1, 0, :] = -SURF_SLOW_FACTOR * rate
        aging = np.asarray(module_rates, np.float64).reshape(-1, 1, 1, 1)
        aging = np.broadcast_to(aging, (self.module_batch, 2, 1, 1))

        t_span = (0.0, self.year)
        if use_pallas:
            # production fast path: VMEM-resident pallas step blocks between
            # halo exchanges (float32 by construction); the model is linear,
            # so the source-free map supplies exact JVPs just like the
            # single-device megakernel path
            if np.dtype(dtype) != np.float32:
                raise ValueError("use_pallas requires float32")
            rates_bt = np.broadcast_to(
                np.asarray(module_rates, np.float32).reshape(-1, 1),
                (self.module_batch, 2),
            )
            self._year = build_sharded_year_pallas(
                mesh, depth, ypos, modelinfo, diag, rates_bt, t_span,
                n_steps, block_steps=block_steps, interpret=pallas_interpret,
            )
            self._year0 = build_sharded_year_pallas(
                mesh, depth, ypos, modelinfo, diag,
                np.zeros_like(rates_bt), t_span, n_steps,
                block_steps=block_steps, interpret=pallas_interpret,
            )
        else:
            self._year = build_sharded_year(
                mesh, self.data, diag, aging, t_span, n_steps
            )
            self._year0 = build_sharded_year(
                mesh, self.data, diag, np.zeros_like(aging), t_span, n_steps
            )

        # sharding + reductions + ADI/vertical-product preconditioner +
        # jitted maps; the precond's tracer diag is module-invariant
        # (restoring depends only on the tracer)
        self._finish_linear_family_setup(
            mesh, ypos, region_mask, grid_weight, diag[0], 2
        )

    # -- solver interface ----------------------------------------------------

    def init_iterate(self):
        column = np.interp(self.depth.mid, [55.0, 200.0], [0.0, 2.0])
        field = np.broadcast_to(
            column[None, None, :, None],
            (self.module_batch, 2, self.nz, self.ny),
        )
        return jax.device_put(
            jnp.asarray(field, self.dtype), self.state_sharding
        )

    def jvp(self, x, fcn, v):
        """exact: the module family is linear, so J v = year0(v) - v"""
        return self._jvp(v)


def build_sharded_year_pallas(mesh, depth, ypos, modelinfo, diag, aging,
                              t_span, n_steps, block_steps=8,
                              interpret=False):
    """VMEM-resident sharded IMEX year: pallas step-block kernels between
    halo exchanges.

    The per-step shard_map year (build_sharded_year) pays the XLA scan's
    per-step cadence; this path runs blocks of `block_steps` interior steps
    as ONE pallas kernel per shard (state VMEM-resident within a block, the
    megakernel's arithmetic -- ops/imex_pallas._block_callable), exchanging
    2*block_steps ghost columns per side between blocks.  Each Heun stage
    pair consumes two ghost columns, so a depth-2k halo sustains exactly k
    steps; the ghost region's arithmetic is identical to its owner's, so
    owned columns see the same operations on the same values regardless of
    the mesh shape.  Agreement across mesh shapes is float32-roundoff-level,
    not bitwise: XLA's shape-dependent codegen can differ by an ulp in the
    mixing-profile chain, and the exponential there amplifies ulps by
    ~1e3 into the diffusivity (shrinking with step count as the implicit
    solves get less stiff; ~5e-6 relative at 97 steps, ~1e-6 at hourly
    steps) -- tests pin 8-shard vs 1-shard agreement at these levels.

    The year decomposes as the megakernel does (interior Strang half-steps
    merged): a leading CN(dt/2), (n_steps-1) x [Heun; CN(dt)] in pallas
    blocks, a final Heun (one-column halo) and trailing CN(dt/2) in plain
    jax.  float32 only (the pallas path's dtype).

    diag: (module_batch, tracer, nz, ny) implicit local rates
    aging: (module_batch, tracer) explicit source rates, or
        (module_batch, tracer, nz) depth profiles
    Returns fn(y) for y (module_batch, tracer, nz, ny) float32 sharded
    P('module', None, None, 'space').
    """
    from ..ops.imex_pallas import _block_callable, pack_block_consts

    n_module, n_space = mesh.shape["module"], mesh.shape["space"]
    nz, ny = len(depth), len(ypos)
    diag = np.asarray(diag, np.float32)
    aging = np.asarray(aging, np.float32)
    b_dim, tr_dim, nz_dim = diag.shape[0], diag.shape[1], diag.shape[2]
    if aging.shape in ((b_dim, tr_dim), (b_dim * tr_dim,)):
        aging = aging.reshape(b_dim, tr_dim)
    elif aging.shape == (b_dim, tr_dim, 1, 1):
        # the sibling XLA builder's documented aging shape
        aging = aging.reshape(b_dim, tr_dim)
    elif aging.shape == (b_dim, tr_dim, nz_dim):
        pass  # per-channel depth profiles
    else:
        raise ValueError(
            f"aging shape {aging.shape} is neither (module_batch, tracer) "
            f"= ({b_dim}, {tr_dim}) [uniform rates, (B, T, 1, 1) also "
            f"accepted] nor (module_batch, tracer, nz) = "
            f"({b_dim}, {tr_dim}, {nz_dim}) [depth profiles]"
        )
    module_batch, t_dim = aging.shape[:2]
    if module_batch % n_module != 0 or ny % n_space != 0:
        raise ValueError("batch/grid do not split over the mesh")
    b_loc = module_batch // n_module
    nyl = ny // n_space
    c_dim = b_loc * t_dim
    k = int(block_steps)
    h = 2 * k
    if nyl < 1 or h < 1:
        raise ValueError("degenerate decomposition")
    if h > nyl:
        raise ValueError(
            f"halo depth 2*block_steps={h} exceeds the shard width "
            f"{nyl}; the slab exchange is single-neighbor -- use "
            f"block_steps <= {nyl // 2} (or fewer spatial shards)"
        )
    nx = nyl + 2 * h

    dtype = jnp.float32
    t0 = float(t_span[0])
    dt = float((t_span[1] - t_span[0]) / n_steps)
    n_inner = int(n_steps) - 1
    m_blocks, r_steps = divmod(n_inner, k)

    grid = physics.make_grid(depth, ypos, modelinfo, dtype)
    from ..models.py_driver_2d.incore import _warn_if_explicit_unstable

    _warn_if_explicit_unstable(grid, n_steps)
    vfaces_g = np.asarray(grid.vvel, np.float32).copy()
    vfaces_g[:, 0] = 0.0
    vfaces_g[:, -1] = 0.0
    hfaces_g = np.zeros((nz, ny + 1), np.float32)
    hfaces_g[:, 1:-1] = np.asarray(grid.horiz_mix_coeff, np.float32)
    wvel_g = np.asarray(grid.wvel, np.float32)
    dy_r_g = np.asarray(grid.dy_r, np.float32)
    ypos_mid_g = np.asarray(grid.ypos_mid, np.float64)
    bld_max_g = np.interp(ypos_mid_g, physics._BLD_YPOS, physics._BLD_MAX)
    dz_r = np.asarray(grid.dz_r, np.float32)
    dz_mid = np.asarray(grid.dz_mid, np.float32)
    dz_mid_r = np.asarray(grid.dz_mid_r, np.float32)
    depth_mid = np.asarray(grid.depth_mid, np.float32)

    def col_clamp(idx):
        return np.clip(idx, 0, ny - 1)

    def face_at(faces, idx):
        """face array sampled at global indices; zero outside the domain"""
        out = np.zeros((faces.shape[0], len(idx)), np.float32)
        inside = (idx >= 0) & (idx <= ny)
        out[:, inside] = faces[:, idx[inside]]
        return out

    # stacked per-(module-block, space-block) packed consts + edge arrays
    consts_stack = None
    diag_own = np.empty((n_module, n_space, c_dim, nz, nyl), np.float32)
    src_stack = np.empty(
        (n_module, n_space, c_dim) + aging.shape[2:], np.float32
    )
    for mi in range(n_module):
        diag_mb = diag[mi * b_loc : (mi + 1) * b_loc].reshape(
            c_dim, nz, ny
        )
        src_mb = aging[mi * b_loc : (mi + 1) * b_loc].reshape(
            (c_dim,) + aging.shape[2:]
        )
        for sj in range(n_space):
            c0 = sj * nyl
            cols = col_clamp(np.arange(c0 - h, c0 + nyl + h))
            faces_idx = np.arange(c0 - h, c0 + nyl + h + 1)
            consts = pack_block_consts(
                face_at(vfaces_g, faces_idx),
                face_at(hfaces_g, faces_idx),
                wvel_g[:, cols],
                diag_mb[:, :, cols],
                src_mb,
                bld_max_g[cols],
                dy_r_g[cols],
                dz_r,
                dz_mid,
                dz_mid_r,
                depth_mid,
            )
            if consts_stack is None:
                consts_stack = [
                    np.empty((n_module, n_space) + c.shape, np.float32)
                    for c in consts
                ]
            for arr, c in zip(consts_stack, consts):
                arr[mi, sj] = c
            diag_own[mi, sj] = diag_mb[:, :, c0 : c0 + nyl]
            src_stack[mi, sj] = src_mb

    # owned-column edge arrays (leading CN half, final Heun + CN half)
    vfaces_own = np.stack(
        [vfaces_g[:, s * nyl : s * nyl + nyl + 1] for s in range(n_space)]
    )
    hfaces_own = np.stack(
        [hfaces_g[:, s * nyl : s * nyl + nyl + 1] for s in range(n_space)]
    )
    wvel_own = np.stack(
        [wvel_g[:, s * nyl : (s + 1) * nyl] for s in range(n_space)]
    )
    dy_r_own = dy_r_g.reshape(n_space, nyl)
    ypos_own = ypos_mid_g.reshape(n_space, nyl).astype(np.float32)

    blk_k = _block_callable(nz, nx, c_dim, dt, k) if m_blocks else None
    blk_r = _block_callable(nz, nx, c_dim, dt, r_steps) if r_steps else None

    t_starts = (t0 + dt * k * np.arange(m_blocks)).astype(np.float32)

    fwd_perm = [(i, i + 1) for i in range(n_space - 1)]
    bwd_perm = [(i, i - 1) for i in range(1, n_space)]

    dz_r_j = jnp.asarray(dz_r)
    dz_mid_j = jnp.asarray(dz_mid)
    dz_mid_r_j = jnp.asarray(dz_mid_r)
    depth_mid_j = jnp.asarray(depth_mid)
    w_dim = c_dim * nx

    def local_year(y, diag_l, src_l, vfo, hfo, wvo, dyo, ypo, *cst):
        diag_l = diag_l[0, 0]                  # (C, nz, nyl)
        src_l = src_l[0, 0]                    # (C,) or (C, nz)
        if src_l.ndim == 1:
            src_l = src_l[:, None, None]       # (C, 1, 1)
        else:
            src_l = src_l[:, :, None]          # (C, nz, 1)
        vfo = vfo[0]                           # (nz, nyl+1)
        hfo = hfo[0]
        wvo = wvo[0]                           # (nz+1, nyl)
        dyo = dyo[0]                           # (nyl,)
        ypo = ypo[0]
        consts = tuple(c[0, 0] for c in cst)

        y = y.reshape(c_dim, nz, nyl).astype(dtype)

        def kv_own(t):
            return physics.vert_mixing_coeff_arrays(
                depth_mid_j, dz_mid_j, dz_mid_r_j, ypo, wvo, t
            ).astype(dtype)

        zero_row = jnp.zeros((c_dim, 1, nyl), dtype)

        def cn_incr(kv, y, half_dt):
            up = kv * dz_r_j[:-1, None]
            lo = kv * dz_r_j[1:, None]
            zr = jnp.zeros((1, nyl), dtype)
            du = jnp.concatenate([up, zr], axis=0)
            dl = jnp.concatenate([zr, lo], axis=0)
            dmain = -(du + dl)[None] + diag_l
            flux = kv[None] * (y[:, 1:, :] - y[:, :-1, :])
            m_v = dz_r_j[None, :, None] * (
                jnp.concatenate([flux, zero_row], axis=1)
                - jnp.concatenate([zero_row, flux], axis=1)
            ) + diag_l * y
            rhs = half_dt * m_v
            q = 0.5 * half_dt
            from ..ops.imex_pallas import _pcr_minor2

            return _pcr_minor2(
                -q * jnp.broadcast_to(dl[None], y.shape),
                1.0 - q * dmain,
                -q * jnp.broadcast_to(du[None], y.shape),
                rhs,
                nz,
                recip=True,
            )

        def kahan(y, c, delta):
            adj = delta + c
            y_new = y + adj
            return y_new, adj - (y_new - y)

        def halo_cat(v, width):
            left = jax.lax.ppermute(v[..., -width:], "space", fwd_perm)
            right = jax.lax.ppermute(v[..., :width], "space", bwd_perm)
            return jnp.concatenate([left, v, right], axis=-1)

        def pack(arr):
            return (
                arr.reshape(c_dim, nz, nx)
                .transpose(1, 0, 2)
                .reshape(nz, w_dim)
            )

        def unpack(arr):
            return arr.reshape(nz, c_dim, nx).transpose(1, 0, 2)

        def run_block(callable_, carry, tb):
            y, c = carry
            y_ext = halo_cat(y, h)
            c_ext = halo_cat(c, h)
            y_p, c_p = callable_(
                pack(y_ext), pack(c_ext), tb, consts, interpret=interpret
            )
            y_ext, c_ext = unpack(y_p), unpack(c_p)
            return y_ext[..., h:-h], c_ext[..., h:-h]

        # leading CN half-step (column-local)
        y, comp = kahan(
            y, jnp.zeros_like(y), cn_incr(kv_own(t0), y, 0.5 * dt)
        )

        if m_blocks:
            def scan_body(carry, tb):
                return run_block(blk_k, carry, tb), None

            (y, comp), _ = jax.lax.scan(
                scan_body, (y, comp), jnp.asarray(t_starts)
            )
        if r_steps:
            y, comp = run_block(
                blk_r, (y, comp),
                jnp.asarray(t0 + dt * k * m_blocks, dtype),
            )

        # final Heun (one halo column per side) + trailing CN half-step
        ca_own = 0.5 * jnp.asarray(vfo) + jnp.asarray(hfo)
        cb_own = 0.5 * jnp.asarray(vfo) - jnp.asarray(hfo)
        wv_int = jnp.asarray(wvo)[1:-1, :]

        def tend1(y_ext):
            g = ca_own[None] * y_ext[..., :-1] + cb_own[None] * y_ext[..., 1:]
            res = jnp.asarray(dyo)[None, None, :] * (
                g[..., :-1] - g[..., 1:]
            )
            wz_int = 0.5 * (y_ext[:, 1:, 1:-1] + y_ext[:, :-1, 1:-1]) * wv_int[None]
            wz = jnp.concatenate([zero_row, wz_int, zero_row], axis=1)
            res = res + dz_r_j[None, :, None] * (wz[:, 1:, :] - wz[:, :-1, :])
            return res + src_l

        t_last = t0 + (n_steps - 1) * dt
        y1 = halo_cat(y, 1)
        f1 = tend1(y1)
        y_mid = y + dt * f1
        f2 = tend1(halo_cat(y_mid, 1))
        y, comp = kahan(y, comp, 0.5 * dt * (f1 + f2))
        y, comp = kahan(y, comp, cn_incr(kv_own(t_last + dt), y, 0.5 * dt))
        return y.reshape(b_loc, t_dim, nz, nyl)

    state_spec = P("module", None, None, "space")
    mod_space = P("module", "space")

    in_specs = (
        state_spec,
        P("module", "space", None, None, None),   # diag_own
        P("module", "space", *([None] * (src_stack.ndim - 2))),  # src
        P("space", None, None),                   # vfaces_own
        P("space", None, None),                   # hfaces_own
        P("space", None, None),                   # wvel_own
        P("space", None),                         # dy_r_own
        P("space", None),                         # ypos_own
    ) + tuple(
        P("module", "space", *([None] * (arr.ndim - 2)))
        for arr in consts_stack
    )

    sharded = shard_map(
        local_year,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=state_spec,
        check_vma=False,
    )

    dev_args = []
    for arr, spec in zip(
        (diag_own, src_stack, vfaces_own, hfaces_own, wvel_own, dy_r_own,
         ypos_own),
        in_specs[1:8],
    ):
        dev_args.append(
            jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))
        )
    for arr, spec in zip(consts_stack, in_specs[8:]):
        dev_args.append(
            jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))
        )
    dev_args = tuple(dev_args)

    @jax.jit
    def year(y):
        return sharded(y, *dev_args)

    return year




def _region_reduction_arrays(mesh, region_mask, grid_weight, nz, ny, dtype):
    """device-resident per-(module, region) reduction operators, sharded
    over ypos like the state (block independence P2 composed with spatial
    sharding): (region_cnt, mean_w, onehot, fill)"""
    from ..utils.regions import region_mean_weights

    region_cnt = int(np.asarray(region_mask).max())
    mean_w = region_mean_weights(region_mask, grid_weight).reshape(
        region_cnt, nz, ny
    )
    space_sharding = NamedSharding(mesh, P(None, None, "space"))
    onehot = np.stack(
        [
            (np.asarray(region_mask) == r + 1).astype(np.float64)
            for r in range(region_cnt)
        ]
    )
    fill = 1.0 - onehot.sum(axis=0)
    return (
        region_cnt,
        jax.device_put(jnp.asarray(mean_w, dtype), space_sharding),
        jax.device_put(jnp.asarray(onehot, dtype), space_sharding),
        jax.device_put(
            jnp.asarray(fill, dtype), NamedSharding(mesh, P(None, "space"))
        ),
    )


def _lateral_tridiag_arrays(mesh, data: ShardedYearData, ypos, dt_lat, dtype):
    """(I - dt L_y) tridiagonal coefficients along ypos for the ADI lateral
    preconditioner sweep, sharded over the ypos axis"""
    n_space = data.n_space
    vf = np.asarray(data.vfaces, np.float64)
    hf = np.asarray(data.hfaces, np.float64)
    vf_glob = np.concatenate(
        [vf[s, :, :-1] for s in range(n_space)] + [vf[-1, :, -1:]], axis=1
    )
    hf_glob = np.concatenate(
        [hf[s, :, :-1] for s in range(n_space)] + [hf[-1, :, -1:]], axis=1
    )
    ca_g = 0.5 * vf_glob + hf_glob
    cb_g = 0.5 * vf_glob - hf_glob
    dy_r = np.asarray(ypos.delta_r, np.float64)[None, :]
    lat_dl = dy_r * ca_g[:, :-1]
    lat_d = dy_r * (cb_g[:, :-1] - ca_g[:, 1:])
    lat_du = -dy_r * cb_g[:, 1:]
    sharding = NamedSharding(mesh, P(None, "space"))
    return (
        jax.device_put(jnp.asarray(-dt_lat * lat_dl, dtype), sharding),
        jax.device_put(jnp.asarray(1.0 - dt_lat * lat_d, dtype), sharding),
        jax.device_put(jnp.asarray(-dt_lat * lat_du, dtype), sharding),
    )


class ShardedPhosphorusKernel(_ShardedKernelInterface):
    """sharded NONLINEAR solver kernel: py_driver_2d phosphorus (po4/dop/
    pop) on a (module=1, space) mesh.

    The year runs through the shard_map IMEX scan with the column-local
    biogeochemistry/sinking hook (build_sharded_year local_tend); Jacobian-
    vector products are exact jax.jvp THROUGH the sharded year (the
    collective permutes differentiate).  The preconditioner is an ADI
    lateral sweep followed by a shift-regularized one-step implicit-Euler
    solve of the COLUMN-LOCAL phosphorus Jacobian (vertical mixing +
    linearized uptake/remin + sinking) in tracer-innermost banded form --
    the shift replaces the global conservation bordering, mirroring the
    reference's own epsilon-shift regularization
    (nk_ooc/py_driver_2d/phosphorus.py:197-274); everything stays
    shard-local except the lateral PCR, whose collectives XLA inserts.

    state layout: (1, 3, nz, ny), sharded P('module', None, None, 'space').
    """

    def __init__(self, mesh, depth, ypos, modelinfo, params=None,
                 dtype=None, n_steps=365, region_mask=None,
                 grid_weight=None):
        from ..models.py_driver_2d.phosphorus import (
            DEFAULT_PARAMS,
            light_lim_2d,
        )

        if dtype is None:
            dtype = jnp.result_type(float)
        if mesh.shape["module"] != 1:
            raise ValueError("phosphorus is a single module; n_module must be 1")
        n_space = mesh.shape["space"]
        self.mesh = mesh
        self.depth, self.ypos = depth, ypos
        self.dtype = dtype
        self.data = ShardedYearData(depth, ypos, modelinfo, n_space, dtype)
        nz, ny = self.data.nz, self.data.ny
        self.nz, self.ny = nz, ny
        self.module_batch = 1
        self.year = physics.SEC_PER_YEAR
        self.params = dict(DEFAULT_PARAMS if params is None else params)
        p = self.params

        light = light_lim_2d(depth, ypos)               # (nz, ny)
        nyl = ny // n_space
        light_stack = np.stack(
            [light[:, s * nyl : (s + 1) * nyl] for s in range(n_space)]
        )
        dz_r_j = jnp.asarray(self.data.dz_r, dtype)

        def local_tend(t, y, dl):
            po4 = y[..., 0, :, :]
            dop = y[..., 1, :, :]
            pop = y[..., 2, :, :]
            uptake = (
                p["max_uptake_rate"] * dl["light"] * po4
                / (po4 + p["po4_halfsat"])
            )
            dop_remin = p["dop_remin_rate"] * dop
            pop_remin = p["pop_remin_rate"] * pop
            d_po4 = -uptake + dop_remin + pop_remin
            d_dop = p["sigma"] * uptake - dop_remin
            d_pop = (1.0 - p["sigma"]) * uptake - pop_remin
            sink_int = p["pop_sink_vel"] * pop[..., :-1, :]
            zero = jnp.zeros(
                pop.shape[:-2] + (1,) + pop.shape[-1:], y.dtype
            )
            sink = jnp.concatenate([zero, sink_int, zero], axis=-2)
            d_pop = d_pop + dz_r_j[:, None] * (
                sink[..., :-1, :] - sink[..., 1:, :]
            )
            return jnp.stack([d_po4, d_dop, d_pop], axis=-3)

        diag = np.zeros((1, 3, nz, ny))
        aging = np.zeros((1, 3, 1, 1))
        self._year = build_sharded_year(
            mesh, self.data, diag, aging, (0.0, self.year), n_steps,
            local_tend=local_tend, local_data={"light": light_stack},
        )

        self.state_sharding = NamedSharding(
            mesh, P("module", None, None, "space")
        )
        self._init_reductions(mesh, region_mask, grid_weight, nz, ny, dtype)

        self._lat_dl, self._lat_d, self._lat_du = _lateral_tridiag_arrays(
            mesh, self.data, ypos, self.year, dtype
        )

        self._comp_fcn = jax.jit(lambda y: self._year(y) - y)
        # the jitted GMRES linearizes this once per solve, so the primal
        # year is paid a single time instead of once per Krylov matvec
        self.linearize_target = lambda y: self._year(y) - y

        @jax.jit
        def jvp_fn(x, v):
            return jax.jvp(lambda y: self._year(y) - y, (x,), (v,))[1]

        self._jvp_fn = jvp_fn

        # column-local banded phosphorus Jacobian (tracer-innermost rows
        # r = z*3 + t per column, bandwidth 3), shift-regularized
        light_j = jnp.asarray(light, dtype)
        grid = self.data.grid
        n3 = 3 * nz

        @jax.jit
        def precond_factor(x):
            from ..ops.banded import banded_lu_factor_blocks as lu_blocks

            dt = self.year
            kv = physics.vert_mixing_coeff(grid, 0.5 * self.year)  # (nz-1,ny)
            dz = dz_r_j
            po4 = x[0, 0]                                  # (nz, ny)
            u1 = (
                p["max_uptake_rate"] * light_j * p["po4_halfsat"]
                / (po4 + p["po4_halfsat"]) ** 2
            )                                               # (nz, ny)

            bands = jnp.zeros((ny, n3, 7), dtype)
            rows = np.arange(n3)
            z_of = rows // 3
            t_of = rows % 3

            # vertical mixing: offsets +-3, identical per tracer
            up = jnp.concatenate(
                [kv * dz[:-1, None], jnp.zeros((1, ny), dtype)], axis=0
            )                                               # (nz, ny)
            lo = jnp.concatenate(
                [jnp.zeros((1, ny), dtype), kv * dz[1:, None]], axis=0
            )
            up_rows = up[z_of, :].T                         # (ny, n3)
            lo_rows = lo[z_of, :].T
            bands = bands.at[:, :, 6].add(up_rows)
            bands = bands.at[:, :, 0].add(lo_rows)
            bands = bands.at[:, :, 3].add(-(up_rows + lo_rows))

            # biogeochemistry (per cell, tracer offsets)
            u1_cols = u1.T                                  # (ny, nz)
            po4_rows = np.nonzero(t_of == 0)[0]
            dop_rows = np.nonzero(t_of == 1)[0]
            pop_rows = np.nonzero(t_of == 2)[0]
            bands = bands.at[:, po4_rows, 3].add(-u1_cols)
            bands = bands.at[:, po4_rows, 4].add(p["dop_remin_rate"])
            bands = bands.at[:, po4_rows, 5].add(p["pop_remin_rate"])
            bands = bands.at[:, dop_rows, 2].add(p["sigma"] * u1_cols)
            bands = bands.at[:, dop_rows, 3].add(-p["dop_remin_rate"])
            bands = bands.at[:, pop_rows, 1].add(
                (1.0 - p["sigma"]) * u1_cols
            )
            bands = bands.at[:, pop_rows, 3].add(-p["pop_remin_rate"])

            # particulate sinking (pop rows): gain from the layer above
            # (offset -3), diagonal loss above the bottom layer
            sink = p["pop_sink_vel"]
            gain = np.where(z_of >= 1, 1.0, 0.0)[t_of == 2]
            loss = np.where(z_of < nz - 1, 1.0, 0.0)[t_of == 2]
            dzr_np = np.asarray(self.data.dz_r)
            bands = bands.at[:, pop_rows, 0].add(
                jnp.asarray(sink * gain * dzr_np, dtype)
            )
            bands = bands.at[:, pop_rows, 3].add(
                jnp.asarray(-sink * loss * dzr_np, dtype)
            )

            mat = dt * bands
            # shift off the exactly singular conservation mode
            eps = 1.0e-6 * jnp.max(jnp.abs(mat[:, :, 3]))
            mat = mat.at[:, :, 3].add(-eps)
            return lu_blocks(mat)

        @jax.jit
        def precond_apply(lu, r):
            from ..ops.banded import banded_lu_solve_blocks as solve_blocks
            from ..ops.tridiag import pcr_solve

            r_lat = pcr_solve(
                jnp.broadcast_to(self._lat_dl, r.shape),
                jnp.broadcast_to(self._lat_d, r.shape),
                jnp.broadcast_to(self._lat_du, r.shape),
                r,
            )
            # (1, 3, nz, ny) -> per-column tracer-innermost rows (ny, 3nz)
            cols = jnp.transpose(r_lat[0], (2, 1, 0)).reshape(ny, n3)
            sol = solve_blocks(lu, cols)
            sol = jnp.transpose(sol.reshape(ny, nz, 3), (2, 1, 0))[None]
            return sol - r

        self._precond_factor = precond_factor
        self._precond_apply = precond_apply

    # -- solver interface ----------------------------------------------------

    def init_iterate(self):
        dm = np.asarray(self.data.depth_mid)
        profiles = (
            ([130.0, 260.0], [5.5e-3, 4.1]),
            ([95.0, 140.0], [7.1e-2, 1.5e-4]),
            ([170.0, 250.0], [1.8e-2, 7.9e-4]),
        )
        cols = [np.interp(dm, d, v) for d, v in profiles]
        field = np.stack(
            [np.broadcast_to(c[:, None], (self.nz, self.ny)) for c in cols]
        )[None]
        return jax.device_put(
            jnp.asarray(field, self.dtype), self.state_sharding
        )

    def jvp(self, x, fcn, v):
        """exact forward-mode JVP through the sharded nonlinear year"""
        return self._jvp_fn(x, v)

    def apply_limiter(self, x, increment):
        """phosphorus tracers are bounded below by zero (the reference's
        lob: 0.0); the per-region scale factor keeps x + scalef*increment
        non-negative, preventing the Michaelis-Menten singularity at
        po4 = -halfsat from ever entering a trial state"""
        return self._apply_limiter_lob0(x, increment)

    def limiter_scalef_jit(self, x, increment):
        return self._limiter_scalef_lob0_jit(x, increment)





class ShardedForcedFamilyKernel(_ShardedKernelInterface):
    """sharded solver kernel for a forced_{suff}-style module family:
    one tracer per module, surface restoring toward per-module constant
    targets plus per-module first-order decay (the py_driver_2d forced
    module's surf_restore_opt=const / sms_opt=decay configuration,
    nk_ooc/py_driver_2d/forced.py) -- linear, so the source-free year map
    supplies exact JVPs.

    state layout: (module_batch, 1, nz, ny), sharded
    P('module', None, None, 'space').
    """

    def __init__(self, mesh, depth, ypos, modelinfo, restore_rate,
                 restore_targets, decay_rates, dtype=None, n_steps=365,
                 region_mask=None, grid_weight=None, use_pallas=False,
                 block_steps=8, pallas_interpret=False):
        if dtype is None:
            dtype = jnp.float32 if use_pallas else jnp.result_type(float)
        n_module, n_space = mesh.shape["module"], mesh.shape["space"]
        self.mesh = mesh
        self.depth, self.ypos = depth, ypos
        self.dtype = dtype
        self.data = ShardedYearData(depth, ypos, modelinfo, n_space, dtype)
        nz, ny = self.data.nz, self.data.ny
        self.nz, self.ny = nz, ny
        restore_targets = np.asarray(restore_targets, np.float64)
        decay_rates = np.asarray(decay_rates, np.float64)
        self.module_batch = len(restore_targets)
        if len(decay_rates) != self.module_batch:
            raise ValueError("per-module targets and decay rates must pair")
        if self.module_batch % n_module != 0:
            raise ValueError(
                f"module batch {self.module_batch} does not split over "
                f"{n_module} mesh blocks"
            )
        self.year = physics.SEC_PER_YEAR

        # implicit local rates: surface restoring + everywhere decay
        diag = np.zeros((self.module_batch, 1, nz, ny))
        diag[:, 0, 0, :] = -float(restore_rate)
        diag -= decay_rates[:, None, None, None]
        # source: the restoring target enters as a surface-layer inflow
        # (z-dependent only, so it broadcasts over the sharded ypos axis)
        source = np.zeros((self.module_batch, 1, nz, 1))
        source[:, 0, 0, 0] = float(restore_rate) * restore_targets

        t_span = (0.0, self.year)
        if use_pallas:
            # VMEM-resident step blocks; the surface-only restoring source
            # rides the pallas path as a per-channel depth profile
            if np.dtype(dtype) != np.float32:
                raise ValueError("use_pallas requires float32")
            src_prof = source[:, :, :, 0].astype(np.float32)  # (B, 1, nz)
            self._year = build_sharded_year_pallas(
                mesh, depth, ypos, modelinfo, diag, src_prof, t_span,
                n_steps, block_steps=block_steps, interpret=pallas_interpret,
            )
            self._year0 = build_sharded_year_pallas(
                mesh, depth, ypos, modelinfo, diag,
                np.zeros_like(src_prof), t_span, n_steps,
                block_steps=block_steps, interpret=pallas_interpret,
            )
        else:
            self._year = build_sharded_year(
                mesh, self.data, diag, source, t_span, n_steps
            )
            self._year0 = build_sharded_year(
                mesh, self.data, diag, np.zeros_like(source), t_span, n_steps
            )

        # the tracer diag varies per module (decay rates); precondition with
        # the family's mean decay -- preconditioners only need to be close
        diag_pc = np.zeros((1, nz, ny))
        diag_pc[0, 0, :] = -float(restore_rate)
        diag_pc -= float(decay_rates.mean())
        self._finish_linear_family_setup(
            mesh, ypos, region_mask, grid_weight, diag_pc, 1
        )

    def init_iterate(self):
        """positive interior start (a zero iterate sits exactly on the
        lower bound, where the limiter zeroes any increment with a negative
        component -- the reference likewise starts from gen_init_iterate)"""
        column = np.interp(
            np.asarray(self.data.depth_mid), [50.0, 400.0], [0.9, 0.1]
        )
        field = np.broadcast_to(
            column[None, None, :, None],
            (self.module_batch, 1, self.nz, self.ny),
        )
        return jax.device_put(
            jnp.asarray(field, self.dtype), self.state_sharding
        )

    def jvp(self, x, fcn, v):
        """exact: the family is linear, so J v = year0(v) - v"""
        return self._jvp(v)

    def apply_limiter(self, x, increment):
        """forced tracers are bounded below by zero (the reference's
        lob: 0.0 for the forced module family)"""
        from ..utils.regions import comp_scalef_lob

        x_np = self._clamp_lob_base(np.asarray(x))
        inc_np = np.asarray(increment)
        scalef = np.ones((self.module_batch, self.region_cnt))
        for b in range(self.module_batch):
            comp_scalef_lob(
                self.region_cnt, self._region_mask_np, x_np[b, 0],
                inc_np[b, 0], 0.0, out=scalef[b],
            )
        return scalef

    def limiter_scalef_jit(self, x, increment):
        return self._limiter_scalef_lob0_jit(x, increment)


__all__ = [
    "ShardedForcedFamilyKernel",
    "ShardedIageKernel",
    "ShardedPhosphorusKernel",
    "ShardedYearData",
    "build_sharded_year",
    "build_sharded_year_pallas",
]

"""mesh-sharded sparse solve: the distributed `solve_ABdist` counterpart.

The reference solves its gen_A preconditioner matrices with an external MPI
program on an explicit nprow x npcol process grid
(`/root/reference/nk_ooc/cime_pop/model_state.py:317-337`, grid sizing at
`:439-450`).  Here the same systems solve on a JAX device mesh: the
ELL-packed matrix rows shard over a 1-D mesh axis, each BiCGSTAB iteration
all-gathers the (Jacobi-preconditioned) search direction over ICI — the
analog of SuperLU_DIST's row exchange — and `psum` assembles the global dot
products.  The whole iteration is one `lax.while_loop` under `shard_map`, so
a solve is a single device dispatch regardless of iteration count.

Right-hand sides batch along a leading axis (one per tracer, as in the
reference's `-v tracer_a,tracer_b` invocation); converged systems freeze via
masks so the loop runs until every system is done.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.sparse import csr_to_ell, jacobi_inverse_diagonal, solve_csr_systems

_AXIS = "rows"


def pad_ell_rows(vals, cols, n_shards):
    """pad an ELL matrix with identity rows so rows divide n_shards evenly

    padding rows get a 1 on their own diagonal and (with zero right-hand
    sides) carry a zero solution; no real row references the padded columns,
    so the solution of the original system is unchanged.  host-side numpy.
    """
    vals = np.asarray(vals)
    cols = np.asarray(cols)
    rows, width = vals.shape
    width = max(width, 1)
    n_pad = (-rows) % n_shards
    if n_pad == 0 and vals.shape[1] == width:
        return vals, cols, rows
    vals_p = np.zeros((rows + n_pad, width), vals.dtype)
    cols_p = np.zeros((rows + n_pad, width), cols.dtype)
    vals_p[:rows, : vals.shape[1]] = vals
    cols_p[:rows, : cols.shape[1]] = cols
    pad_rows = np.arange(rows, rows + n_pad)
    vals_p[rows:, 0] = 1.0
    cols_p[rows:, 0] = pad_rows
    return vals_p, cols_p, rows


@partial(jax.jit, static_argnames=("mesh", "rtol", "max_iter"))
def _sharded_bicgstab(mesh, vals, cols, d_inv, rhs, rtol, max_iter):
    """batched Jacobi-BiCGSTAB on row-sharded ELL data

    vals/cols/d_inv shard on rows; rhs is (n_rhs, rows) sharded on axis 1.
    Returns (x, converged) with the same shardings as rhs.
    """

    def local_solve(vals_l, cols_l, d_inv_l, rhs_l):
        n_rhs = rhs_l.shape[0]

        def dot(a, b):
            return jax.lax.psum(jnp.sum(a * b, axis=1), _AXIS)

        def matvec(x_l):
            # gather the full vector: the ICI analog of the MPI row exchange
            x_g = jax.lax.all_gather(x_l, _AXIS, axis=1, tiled=True)
            return jnp.einsum("rk,brk->br", vals_l, x_g[:, cols_l])

        def resid_norm(r):
            return jnp.sqrt(dot(r, r))

        bnorm = resid_norm(rhs_l)
        tol = rtol * bnorm

        x0 = jnp.zeros_like(rhs_l)
        ones = jnp.ones((n_rhs,), rhs_l.dtype)
        # the residual norm is carried in the loop state so each iteration
        # pays one cross-device reduction for it, not one in cond + one in
        # body (XLA cannot CSE across the separate computations)
        state0 = (
            x0,
            rhs_l,
            rhs_l,
            jnp.zeros_like(rhs_l),
            jnp.zeros_like(rhs_l),
            ones,
            ones,
            ones,
            bnorm,
            jnp.zeros((n_rhs,), jnp.bool_),
            jnp.asarray(0, jnp.int32),
        )

        def cond(state):
            (*_rest, rnorm, broke, k) = state
            return jnp.any((rnorm > tol) & ~broke) & (k < max_iter)

        def safe_div(num, den):
            ok = den != 0
            return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0), ok

        def body(state):
            x, r, r_hat, p, v, rho, alpha, omega, rnorm, broke, k = state
            active = (rnorm > tol) & ~broke
            act = active[:, None]

            rho_new = dot(r_hat, r)
            beta, ok_b = safe_div(rho_new * alpha, rho * omega)
            p_new = r + beta[:, None] * (p - omega[:, None] * v)
            p_hat = d_inv_l[None, :] * p_new
            v_new = matvec(p_hat)
            denom = dot(r_hat, v_new)
            alpha_new, ok_a = safe_div(rho_new, denom)
            s = r - alpha_new[:, None] * v_new
            s_hat = d_inv_l[None, :] * s
            t = matvec(s_hat)
            tt = dot(t, t)
            omega_new, _ = safe_div(dot(t, s), tt)
            x_new = x + alpha_new[:, None] * p_hat + omega_new[:, None] * s_hat
            r_new = s - omega_new[:, None] * t
            broke_new = broke | (
                active & (~ok_b | ~ok_a | (omega_new == 0.0) | (rho_new == 0.0))
            )

            # freeze systems that are done (or broke) this iteration
            x = jnp.where(act, x_new, x)
            r = jnp.where(act, r_new, r)
            p = jnp.where(act, p_new, p)
            v = jnp.where(act, v_new, v)
            rho = jnp.where(active, rho_new, rho)
            alpha = jnp.where(active, alpha_new, alpha)
            omega = jnp.where(active, omega_new, omega)
            rnorm = jnp.where(active, resid_norm(r_new), rnorm)
            return (x, r, r_hat, p, v, rho, alpha, omega, rnorm, broke_new,
                    k + 1)

        state = jax.lax.while_loop(cond, body, state0)
        x, rnorm = state[0], state[8]
        converged = rnorm <= tol
        return x, converged

    return shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(_AXIS), P(_AXIS), P(_AXIS), P(None, _AXIS)),
        out_specs=(P(None, _AXIS), P(None)),
        check_vma=False,
    )(vals, cols, d_inv, rhs)


def solve_csr_systems_sharded(
    row_ptr,
    col_ind,
    data,
    rhs_batch,
    mesh=None,
    rtol=1.0e-12,
    max_iter=10000,
):
    """solve A x_i = b_i over a device mesh (host entry)

    Same contract as `ops.sparse.solve_csr_systems`, but the matrix rows
    shard over `mesh` (a 1-D Mesh; default: one axis over every visible
    device).  Falls back to the single-device solve when only one device is
    available.
    """
    if mesh is None:
        devices = jax.devices()
        if len(devices) == 1:
            return solve_csr_systems(
                row_ptr, col_ind, data, rhs_batch, rtol=rtol, max_iter=max_iter
            )
        mesh = Mesh(np.asarray(devices), (_AXIS,))
    if len(mesh.axis_names) != 1:
        raise ValueError("solve_csr_systems_sharded needs a 1-D mesh")
    n_shards = mesh.devices.size

    vals_np, cols_np = csr_to_ell(row_ptr, col_ind, data)
    vals_np, cols_np, n_rows = pad_ell_rows(vals_np, cols_np, n_shards)
    rhs_np = np.asarray(rhs_batch, np.float64)
    if rhs_np.ndim != 2 or rhs_np.shape[1] != n_rows:
        raise ValueError(
            f"rhs_batch must be (n_rhs, {n_rows}); got {rhs_np.shape}"
        )
    rhs_p = np.zeros((rhs_np.shape[0], vals_np.shape[0]), np.float64)
    rhs_p[:, :n_rows] = rhs_np

    d_inv = jacobi_inverse_diagonal(jnp.asarray(vals_np), jnp.asarray(cols_np))

    mesh_ax = Mesh(mesh.devices, (_AXIS,))  # canonical axis name
    logging.getLogger(__name__).info(
        "sharded sparse solve: %d rows (+%d pad) x %d rhs over %d devices",
        n_rows,
        vals_np.shape[0] - n_rows,
        rhs_p.shape[0],
        n_shards,
    )
    x, ok = _sharded_bicgstab(
        mesh_ax,
        jnp.asarray(vals_np),
        jnp.asarray(cols_np),
        jnp.asarray(d_inv),
        jnp.asarray(rhs_p),
        float(rtol),
        int(max_iter),
    )
    return np.asarray(x)[:, :n_rows], np.asarray(ok)

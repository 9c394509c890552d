"""mesh-sharded sparse solve: the distributed `solve_ABdist` counterpart.

The reference solves its gen_A preconditioner matrices with an external MPI
program on an explicit nprow x npcol process grid
(`/root/reference/nk_ooc/cime_pop/model_state.py:317-337`, grid sizing at
`:439-450`).  Here the same systems solve on a JAX device mesh: the
ELL-packed matrix rows shard over a 1-D mesh axis, each BiCGSTAB iteration
all-gathers the preconditioned search direction over ICI — the analog of
SuperLU_DIST's row exchange — and `psum` assembles the global dot products.
The whole iteration is one `lax.while_loop` under `shard_map`, so a solve is
a single device dispatch regardless of iteration count.  Preconditioning is
pointwise Jacobi, or — given the gen_A grid decomposition — the rows repack
into vertical lines (whole lines per shard) and each iteration applies exact
shard-local column-tridiagonal solves at zero added communication.

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

from ..ops.sparse import (
    MIXED_INNER_RTOL,
    MIXED_REFINE_MAX_ROUNDS,
    MIXED_REFINE_STALL_FACTOR,
    column_tridiag_from_csr,
    csr_to_ell,
    jacobi_inverse_diagonal,
    solve_csr_systems,
    warn_if_x64_off,
)
from ..ops.tridiag import pcr_solve
from .mesh import host_value as _host_value, put_global

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


def _local_bicgstab_loop(matvec, precond, rhs_l, rtol, max_iter):
    """masked batched BiCGSTAB while-loop on shard-local data

    matvec/precond map (n_rhs, rows_local) -> (n_rhs, rows_local); matvec
    owns whatever collectives it needs, precond must be shard-local.
    """
    n_rhs = rhs_l.shape[0]

    def dot(a, b):
        return jax.lax.psum(jnp.sum(a * b, axis=1), _AXIS)

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
        p_hat = precond(p_new)
        v_new = matvec(p_hat)
        denom = dot(r_hat, v_new)
        alpha_new, ok_a = safe_div(rho_new, denom)
        s = r - alpha_new[:, None] * v_new
        s_hat = precond(s)
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
    return x, rnorm <= tol


def _local_mixed_refine_loop(matvec64, matvec32, precond32, rhs_l, rtol,
                             max_iter):
    """float32 BiCGSTAB rounds under float64 iterative refinement, masked
    per right-hand side (the sharded twin of ops.sparse's
    `_solve_dia_batch_line_mixed`)

    matvec64/matvec32 map (n_rhs, rows_local) -> (n_rhs, rows_local) in the
    respective dtype and own their collectives; precond32 must be
    shard-local.  Each round solves the f64-residual correction system in
    f32 at unit scale, applies it, and recomputes the true f64 residual
    (one f64 matvec per round -- the software-emulated-on-TPU operation
    this mode exists to avoid); systems that stop contracting freeze as
    stalled.
    """

    def dot(a, b):
        return jax.lax.psum(jnp.sum(a * b, axis=1), _AXIS)

    bnorm = jnp.sqrt(dot(rhs_l, rhs_l))
    tol = rtol * bnorm

    def cond(state):
        (_x, _r, rnorm, rounds, stalled) = state
        return jnp.any((rnorm > tol) & ~stalled) & (
            rounds < MIXED_REFINE_MAX_ROUNDS
        )

    def body(state):
        x, r, rnorm, rounds, stalled = state
        active = (rnorm > tol) & ~stalled
        # zero the correction rhs of frozen systems so they exit the inner
        # solve immediately instead of holding its while_loop open for up
        # to max_iter discarded iterations
        # normalize the correction system so the f32 inner solve works at
        # unit scale (no under/overflow as the residual shrinks)
        scale = jnp.where(rnorm > 0, rnorm, 1.0)
        dx32, _ok = _local_bicgstab_loop(
            matvec32,
            precond32,
            jnp.where(
                active[:, None], r / scale[:, None], 0.0
            ).astype(jnp.float32),
            MIXED_INNER_RTOL,
            max_iter,
        )
        x_new = x + scale[:, None] * dx32.astype(jnp.float64)
        r_new = rhs_l - matvec64(x_new)
        rn = jnp.sqrt(dot(r_new, r_new))
        # a round that fails to contract the f64 residual means the f32
        # solve has hit its floor -- freeze instead of looping, and only
        # commit corrections that actually reduced the residual (a
        # diverging round must not make the returned x worse)
        stalled = stalled | (
            active & (rn >= MIXED_REFINE_STALL_FACTOR * rnorm)
        )
        accept = active & (rn < rnorm)
        act = accept[:, None]
        x = jnp.where(act, x_new, x)
        r = jnp.where(act, r_new, r)
        rnorm = jnp.where(accept, rn, rnorm)
        return (x, r, rnorm, rounds + 1, stalled)

    state0 = (
        jnp.zeros_like(rhs_l),
        rhs_l,
        bnorm,
        jnp.asarray(0, jnp.int32),
        jnp.zeros((rhs_l.shape[0],), jnp.bool_),
    )
    x, _r, rnorm, _rounds, _stalled = jax.lax.while_loop(cond, body, state0)
    return x, rnorm <= tol


def _ell_matvec_gathered(vals_l, cols_l, x_l):
    """shard-local rows x global vector: all-gather then contract -- the ICI
    analog of the MPI row exchange"""
    x_g = jax.lax.all_gather(x_l, _AXIS, axis=1, tiled=True)
    return jnp.einsum("rk,brk->br", vals_l, x_g[:, cols_l])


@partial(jax.jit, static_argnames=("mesh", "rtol", "max_iter"))
def _sharded_bicgstab(mesh, vals, cols, d_inv, rhs, rtol, max_iter):
    """batched Jacobi-BiCGSTAB on row-sharded ELL data

    vals/cols/d_inv shard on rows; rhs is (n_rhs, rows) sharded on axis 1.
    Returns (x, converged) with the same shardings as rhs.
    """

    def local_solve(vals_l, cols_l, d_inv_l, rhs_l):
        return _local_bicgstab_loop(
            lambda x_l: _ell_matvec_gathered(vals_l, cols_l, x_l),
            lambda v: d_inv_l[None, :] * v,
            rhs_l,
            rtol,
            max_iter,
        )

    return shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(_AXIS), P(_AXIS), P(_AXIS), P(None, _AXIS)),
        out_specs=(P(None, _AXIS), P(None)),
        check_vma=False,
    )(vals, cols, d_inv, rhs)


@partial(jax.jit, static_argnames=("mesh", "rtol", "max_iter"))
def _sharded_bicgstab_line(mesh, vals, cols, dl, d, du, rhs, rtol, max_iter):
    """batched BiCGSTAB with exact vertical-line preconditioning

    The system is in line-packed order (rows grouped into (line, level)
    slots), so whole vertical lines live on one shard and the
    column-tridiagonal preconditioner solve (PCR along the level axis) is
    purely shard-local -- no collective beyond the matvec all-gather.
    dl/d/du: (n_lines, nz) sharded on lines; vals/cols shard on (packed)
    rows; rhs is (n_rhs, rows) sharded on axis 1.
    """

    def local_solve(vals_l, cols_l, dl_l, d_l, du_l, rhs_l):
        nz = dl_l.shape[1]

        def precond(v):
            packed = v.reshape(v.shape[0], -1, nz)
            return pcr_solve(
                dl_l[None], d_l[None], du_l[None], packed
            ).reshape(v.shape)

        return _local_bicgstab_loop(
            lambda x_l: _ell_matvec_gathered(vals_l, cols_l, x_l),
            precond,
            rhs_l,
            rtol,
            max_iter,
        )

    return shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(_AXIS), P(_AXIS), P(_AXIS), P(_AXIS), P(_AXIS),
                  P(None, _AXIS)),
        out_specs=(P(None, _AXIS), P(None)),
        check_vma=False,
    )(vals, cols, dl, d, du, rhs)


@partial(jax.jit, static_argnames=("mesh", "rtol", "max_iter"))
def _sharded_bicgstab_line_mixed(mesh, vals64, cols, vals32, dl, d, du, rhs,
                                 rtol, max_iter):
    """line-preconditioned float32 BiCGSTAB under float64 refinement on
    row-sharded ELL data (line-packed order; dl/d/du in float32)

    The f32 inner iterations halve the all-gather traffic of the matvec as
    well as the arithmetic cost; only the once-per-round true-residual
    matvec touches the f64 matrix.
    """

    def local_solve(vals64_l, cols_l, vals32_l, dl_l, d_l, du_l, rhs_l):
        nz = dl_l.shape[1]

        def precond32(v):
            packed = v.reshape(v.shape[0], -1, nz)
            return pcr_solve(
                dl_l[None], d_l[None], du_l[None], packed
            ).reshape(v.shape)

        return _local_mixed_refine_loop(
            lambda x_l: _ell_matvec_gathered(vals64_l, cols_l, x_l),
            lambda x_l: _ell_matvec_gathered(vals32_l, cols_l, x_l),
            precond32,
            rhs_l,
            rtol,
            max_iter,
        )

    return shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(_AXIS),) * 6 + (P(None, _AXIS),),
        out_specs=(P(None, _AXIS), P(None)),
        check_vma=False,
    )(vals64, cols, vals32, dl, d, du, rhs)


def _put_global(mesh, arr, spec, dtype=None):
    """device-place a host array as a global array sharded per `spec`

    Single-process this is a plain `jnp.asarray` (the shard_map/jit entry
    reshards as needed; committing is unnecessary for these one-shot
    solves).  Multi-process this delegates to `mesh.put_global` -- every
    process holds the same full host value.
    """
    if jax.process_count() == 1:
        return jnp.asarray(arr, dtype)
    return put_global(mesh, arr, spec, dtype)


def _line_pack_system(row_ptr, col_ind, data, rhs_np, row_to_cell, nhoriz,
                      n_shards):
    """permute a gen_A system into line-packed slot order (host-side numpy)

    Slot s = line * nz + level; identity rows fill the slots of inactive
    cells and whole identity lines pad n_lines to a multiple of n_shards, so
    sharding the slot axis keeps every vertical line on one device.
    Returns (vals_s, cols_s, dl, d, du, rhs_s, slot_of_row).
    """
    dl, d, du, slot_of_row = column_tridiag_from_csr(
        row_ptr, col_ind, data, row_to_cell, nhoriz
    )
    n_lines, nz = dl.shape
    n_lines_pad = -(-n_lines // n_shards) * n_shards
    if n_lines_pad != n_lines:
        pad = ((0, n_lines_pad - n_lines), (0, 0))
        dl = np.pad(dl, pad)
        du = np.pad(du, pad)
        d = np.pad(d, pad, constant_values=1.0)
    n_slots = n_lines_pad * nz

    vals_e, cols_e = csr_to_ell(row_ptr, col_ind, data)
    width = max(vals_e.shape[1], 1)
    vals_s = np.zeros((n_slots, width))
    cols_s = np.zeros((n_slots, width), np.int64)
    vals_s[slot_of_row, : vals_e.shape[1]] = vals_e
    cols_s[slot_of_row, : cols_e.shape[1]] = slot_of_row[cols_e]
    pad_slot = np.ones(n_slots, bool)
    pad_slot[slot_of_row] = False
    vals_s[pad_slot, 0] = 1.0
    cols_s[pad_slot, 0] = np.nonzero(pad_slot)[0]

    rhs_s = np.zeros((rhs_np.shape[0], n_slots))
    rhs_s[:, slot_of_row] = rhs_np
    return vals_s, cols_s, dl, d, du, rhs_s, slot_of_row


def solve_csr_systems_sharded(
    row_ptr,
    col_ind,
    data,
    rhs_batch,
    mesh=None,
    rtol=1.0e-12,
    max_iter=10000,
    row_to_cell=None,
    nhoriz=None,
    mixed_precision=False,
):
    """solve A x_i = b_i over a device mesh (host entry)

    Same contract as `ops.sparse.solve_csr_systems`, but the matrix rows
    shard over `mesh` (a 1-D Mesh; default: one axis over every visible
    device).  Falls back to the single-device solve when only one device is
    available.

    With row_to_cell + nhoriz the rows repack into vertical lines (whole
    lines per shard) and BiCGSTAB preconditions with exact shard-local
    column-tridiagonal solves instead of pointwise Jacobi -- the same
    upgrade as the unsharded path, at zero added communication.

    mixed_precision=True (requires the line-precond arguments) runs the
    sharded BiCGSTAB iterations in float32 -- halving both the arithmetic
    and the all-gather traffic -- inside a float64 iterative-refinement
    loop that reaches the same rtol as the pure float64 solve.
    """
    if mixed_precision and (row_to_cell is None or nhoriz is None):
        raise ValueError(
            "mixed_precision needs the line-precond arguments "
            "(row_to_cell + nhoriz)"
        )
    if mesh is None:
        devices = jax.devices()
        if len(devices) == 1:
            return solve_csr_systems(
                row_ptr, col_ind, data, rhs_batch, rtol=rtol,
                max_iter=max_iter, row_to_cell=row_to_cell, nhoriz=nhoriz,
                mixed_precision=mixed_precision,
            )
        mesh = Mesh(np.asarray(devices), (_AXIS,))
    if len(mesh.axis_names) != 1:
        raise ValueError("solve_csr_systems_sharded needs a 1-D mesh")
    warn_if_x64_off("solve_csr_systems_sharded")
    n_shards = mesh.devices.size

    if row_to_cell is not None and nhoriz is not None:
        rhs_np = np.asarray(rhs_batch, np.float64)
        n_rows = len(row_ptr) - 1
        if rhs_np.ndim != 2 or rhs_np.shape[1] != n_rows:
            raise ValueError(
                f"rhs_batch must be (n_rhs, {n_rows}); got {rhs_np.shape}"
            )
        vals_s, cols_s, dl, d, du, rhs_s, slot_of_row = _line_pack_system(
            row_ptr, col_ind, data, rhs_np, row_to_cell, nhoriz, n_shards
        )
        mesh_ax = Mesh(mesh.devices, (_AXIS,))
        logging.getLogger(__name__).info(
            "sharded line-precond sparse solve: %d rows in %d slots x %d rhs "
            "over %d devices%s",
            n_rows, vals_s.shape[0], rhs_s.shape[0], n_shards,
            " (f32 inner / f64 refinement)" if mixed_precision else "",
        )
        if mixed_precision:
            x, ok = _sharded_bicgstab_line_mixed(
                mesh_ax,
                _put_global(mesh_ax, vals_s, P(_AXIS)),
                _put_global(mesh_ax, cols_s, P(_AXIS)),
                _put_global(mesh_ax, vals_s, P(_AXIS), np.float32),
                _put_global(mesh_ax, dl, P(_AXIS), np.float32),
                _put_global(mesh_ax, d, P(_AXIS), np.float32),
                _put_global(mesh_ax, du, P(_AXIS), np.float32),
                _put_global(mesh_ax, rhs_s, P(None, _AXIS)),
                float(rtol),
                int(max_iter),
            )
        else:
            x, ok = _sharded_bicgstab_line(
                mesh_ax,
                _put_global(mesh_ax, vals_s, P(_AXIS)),
                _put_global(mesh_ax, cols_s, P(_AXIS)),
                _put_global(mesh_ax, dl, P(_AXIS)),
                _put_global(mesh_ax, d, P(_AXIS)),
                _put_global(mesh_ax, du, P(_AXIS)),
                _put_global(mesh_ax, rhs_s, P(None, _AXIS)),
                float(rtol),
                int(max_iter),
            )
        return _host_value(x)[:, slot_of_row], _host_value(ok)

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
        _put_global(mesh_ax, vals_np, P(_AXIS)),
        _put_global(mesh_ax, cols_np, P(_AXIS)),
        _put_global(mesh_ax, d_inv, P(_AXIS)),
        _put_global(mesh_ax, rhs_p, P(None, _AXIS)),
        float(rtol),
        int(max_iter),
    )
    return _host_value(x)[:, :n_rows], _host_value(ok)

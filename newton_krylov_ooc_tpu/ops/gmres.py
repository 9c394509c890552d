"""fully-jitted left-preconditioned GMRES (one device call per solve).

The host-driven GMRES in core/incore.py mirrors the reference's control flow
(nk_ooc/krylov_solver.py:103-165): one device round-trip per Arnoldi step to
read convergence scalars.  That is fine when each matvec is a 40 ms model
year, but a year-operator matvec is ~22 us and the remote-dispatch floor is
~25 ms -- the solve is then 100% host latency.  This module runs the whole
iteration as ONE jitted lax.while_loop:

  * the Krylov basis is preallocated at the static maximum dimension and
    masked (XLA needs static shapes; SURVEY.md section 7 "dynamic shapes"),
  * the Hessenberg least squares min ||beta e1 - H y|| is maintained
    incrementally by Givens rotations per (tracer module, region) -- the
    rotated last element of the rhs IS the preconditioned residual norm, so
    convergence costs nothing extra (vs. the host path's per-iteration
    lstsq),
  * every scalar carries a (module, region) axis: block independence over
    tracer modules and regions (SURVEY.md section 2.6 P1/P2) batches through
    the same rotations,
  * the final y solves the triangular system by masked back-substitution on
    device; the increment is a basis contraction.

The least-squares solution is identical to the host path's per-(module,
region) numpy lstsq (QR by rotations of the same Hessenberg), so the two
paths agree to roundoff -- tests/test_gmres.py pins that.

Sharding: everything here is plain jax ops on the caller's arrays, so a
state sharded over a (module, space) mesh propagates through unchanged --
the dot products become psums over ICI, the basis stays sharded.  This is
the on-device counterpart of the reference's distributed solver story
(MPI solve_ABdist, nk_ooc/cime_pop/model_state.py:317-337).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def build_gmres(jvp_fn, precond_fn, dot_fn, broadcast_fn, max_dim, rel_tol,
                linearize_fn=None, consts_aware=False):
    """build a jitted GMRES solve for a kernel's linear algebra.

    jvp_fn(x, fcn, v) -> J v            (the model-year Jacobian action)
    linearize_fn: optional F itself (y -> F(y)); when given, the solve
        calls jax.linearize(F, x) ONCE and the loop applies the tangent
        map -- for nonlinear models this pays the primal year a single
        time instead of re-deriving it inside every Krylov matvec (the
        while_loop body cannot hoist the loop-invariant primal)
    precond_fn(precond_data, r) -> M^-1 r
    dot_fn(a, b) -> (module, region) weighted dot products
    broadcast_fn(scalars (module, region)) -> state-shaped per-region field
        (regions a state cell belongs to get that region's scalar; the
        kernel's region_broadcast)
    max_dim: static maximum Krylov dimension (preallocated basis)
    rel_tol: stop when the preconditioned residual norm < rel_tol * beta
        for every (module, region)

    consts_aware=True switches every kernel fn to a consts-threaded
    signature -- fn(..., consts) with a pytree of device arrays as the
    trailing argument -- and the returned solve to gmres(x, fcn,
    precond_data, consts).  This is how globally-sharded constants (the
    year's coefficient stacks, region-reduction weights) ride through the
    jit boundary as ARGUMENTS: on a multi-process (multi-host) mesh, jax
    forbids closing over arrays that span non-addressable devices, and on
    the single-chip path operand form avoids re-uploading captured
    constants every dispatch.

    Returns gmres(x, fcn, precond_data[, consts]) -> (increment,
    iterations, resid_norm, beta); `iterations` is the number of Arnoldi
    steps taken, resid_norm/beta are (module, region) device arrays.
    """
    max_dim = int(max_dim)

    if not consts_aware:
        # legacy closure-style fns: thread an empty consts pytree
        jvp_fn = _drop_consts(jvp_fn)
        precond_fn = _drop_consts(precond_fn)
        dot_fn = _drop_consts(dot_fn)
        broadcast_fn = _drop_consts(broadcast_fn)
        linearize_fn = (
            None if linearize_fn is None else _drop_consts(linearize_fn)
        )

    @jax.jit
    def gmres(x, fcn, precond_data, consts):
        def norm(v):
            return jnp.sqrt(dot_fn(v, v, consts))

        if linearize_fn is not None:
            _, tangent = jax.linearize(
                lambda y: linearize_fn(y, consts), x
            )

            def apply_jac(v):
                return tangent(v)
        else:

            def apply_jac(v):
                return jvp_fn(x, fcn, v, consts)

        r0 = precond_fn(precond_data, fcn, consts)
        beta = norm(r0)                                   # (M, R)
        safe_beta = _nonzero(beta)
        basis0 = -r0 * broadcast_fn(1.0 / safe_beta, consts)

        mr_shape = beta.shape
        dtype = r0.dtype
        basis = (
            jnp.zeros((max_dim + 1,) + r0.shape, dtype)
            .at[0]
            .set(basis0)
        )
        # Givens-rotated upper-triangular factor of the Hessenberg, its
        # rotation pairs, and the rotated rhs g = Q^T (beta e1); all per
        # (module, region)
        r_mat = jnp.zeros((max_dim, max_dim) + mr_shape, dtype)
        cs = jnp.zeros((max_dim,) + mr_shape, dtype)
        sn = jnp.zeros((max_dim,) + mr_shape, dtype)
        g = jnp.zeros((max_dim + 1,) + mr_shape, dtype).at[0].set(beta)

        # blocks with an exactly zero initial residual (e.g. a region label
        # with no cells, or an already-converged module) are inactive: they
        # must not pin the loop at 0 >= 0 forever
        active = beta > 0

        def cond(state):
            j, _basis, _r, _cs, _sn, g_vec = state
            resid = jnp.abs(g_vec[j])
            return (j < max_dim) & jnp.any(
                active & (resid >= rel_tol * beta)
            )

        def body(state):
            j, basis, r_mat, cs, sn, g_vec = state

            w = precond_fn(precond_data, apply_jac(basis[j]), consts)

            # modified Gram-Schmidt against columns 0..j (masked full sweep:
            # untouched basis slots are zero, so their dot products vanish)
            def mgs_step(i, carry):
                w, h_col = carry
                hij = dot_fn(w, basis[i], consts)
                hij = jnp.where(i <= j, hij, jnp.zeros_like(hij))
                w = w - basis[i] * broadcast_fn(hij, consts)
                return w, h_col.at[i].set(hij)

            h_col0 = jnp.zeros((max_dim + 1,) + mr_shape, dtype)
            w, h_col = jax.lax.fori_loop(
                0, max_dim + 1, mgs_step, (w, h_col0)
            )
            h_last = norm(w)
            h_col = h_col.at[j + 1].set(h_last)
            basis = basis.at[j + 1].set(
                w * broadcast_fn(1.0 / _nonzero(h_last), consts)
            )

            # apply the accumulated rotations to the new column, then the new
            # rotation eliminating h[j+1, j]
            def rot_step(i, col):
                active = i < j
                ci = jnp.where(active, cs[i], jnp.ones_like(cs[i]))
                si = jnp.where(active, sn[i], jnp.zeros_like(sn[i]))
                top = ci * col[i] + si * col[i + 1]
                bot = -si * col[i] + ci * col[i + 1]
                return col.at[i].set(top).at[i + 1].set(bot)

            h_col = jax.lax.fori_loop(0, max_dim, rot_step, h_col)

            denom = _nonzero(jnp.sqrt(h_col[j] ** 2 + h_col[j + 1] ** 2))
            c_new = h_col[j] / denom
            s_new = h_col[j + 1] / denom
            r_jj = c_new * h_col[j] + s_new * h_col[j + 1]
            h_col = h_col.at[j].set(r_jj).at[j + 1].set(jnp.zeros_like(r_jj))

            r_mat = r_mat.at[:, j].set(h_col[:max_dim])
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            g_j = g_vec[j]
            g_vec = (
                g_vec.at[j].set(c_new * g_j).at[j + 1].set(-s_new * g_j)
            )
            return j + 1, basis, r_mat, cs, sn, g_vec

        j_fin, basis, r_mat, _cs, _sn, g_vec = jax.lax.while_loop(
            cond, body, (0, basis, r_mat, cs, sn, g)
        )

        # back-substitution of R[:jf, :jf] y = g[:jf], masked to the columns
        # actually built
        def back_step(step, y):
            i = max_dim - 1 - step
            active = i < j_fin
            contrib = jnp.sum(r_mat[i] * y, axis=0)          # (M, R)
            denom = _nonzero(r_mat[i, i])
            yi = jnp.where(active, (g_vec[i] - contrib) / denom,
                           jnp.zeros(mr_shape, dtype))
            return y.at[i].set(yi)

        y = jax.lax.fori_loop(
            0, max_dim, back_step, jnp.zeros((max_dim,) + mr_shape, dtype)
        )

        # increment = sum_k y_k basis_k with per-(module, region) coefficients
        def contract(k, acc):
            return acc + basis[k] * broadcast_fn(y[k], consts)

        increment = jax.lax.fori_loop(
            0, max_dim, contract, jnp.zeros_like(basis0)
        )
        return increment, j_fin, jnp.abs(g_vec[j_fin]), beta

    if consts_aware:
        return gmres
    return lambda x, fcn, precond_data: gmres(x, fcn, precond_data, ())


def _drop_consts(fn):
    """adapt a closure-style kernel fn to the consts-threaded signature"""

    def wrapped(*args):
        return fn(*args[:-1])

    return wrapped


def _nonzero(x):
    """guard exact zeros (converged/inactive blocks) against division"""
    tiny = jnp.finfo(x.dtype).tiny
    return jnp.where(jnp.abs(x) > tiny, x, jnp.ones_like(x))


class JittedGMRES:
    """adapter: run build_gmres from a NewtonKrylovInCore kernel.

    Constructed internally by NewtonKrylovInCore(kernel, jit_gmres=True),
    which replaces the per-iteration host round-trips of the default Krylov
    loop with one device call.

    Kernels that must thread globally-sharded constants through the jit
    boundary (multi-process meshes; operand-form on axon) define
    `gmres_interface()` returning a dict with keys `consts` (the pytree),
    `jvp`, `precond_apply`, `dot`, `broadcast` (consts-threaded fns, the
    pytree as trailing argument), and optionally `linearize`; absent that
    hook the kernel's plain closure-style methods are used.
    """

    def __init__(self, kernel, max_dim, rel_tol):
        iface = getattr(kernel, "gmres_interface", None)
        if iface is not None:
            spec = iface()
            self._consts = spec["consts"]
            self._gmres = build_gmres(
                spec["jvp"], spec["precond_apply"], spec["dot"],
                spec["broadcast"], max_dim, rel_tol,
                linearize_fn=spec.get("linearize"), consts_aware=True,
            )
            return
        self._consts = None

        def broadcast_fn(scalars):
            return kernel.region_broadcast(scalars)

        self._gmres = build_gmres(
            kernel.jvp, kernel.precond_apply, kernel.dot, broadcast_fn,
            max_dim, rel_tol,
            linearize_fn=getattr(kernel, "linearize_target", None),
        )

    def __call__(self, x, fcn, precond_data):
        if self._consts is not None:
            return self._gmres(x, fcn, precond_data, self._consts)
        return self._gmres(x, fcn, precond_data)


__all__ = ["build_gmres", "JittedGMRES"]

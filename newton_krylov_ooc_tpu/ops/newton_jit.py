"""fully-jitted Newton-Krylov: the WHOLE solve as one device program.

core/incore.py mirrors the reference's host-driven control flow
(nk_ooc/newton_solver.py:252-334): one device round-trip per function
evaluation, Armijo trial, and convergence check.  ops/gmres.py already
collapses the inner Krylov iteration into a single jitted lax.while_loop;
this module does the same for the OUTER loop -- Newton iteration, bounds
limiter, Armijo backtracking, and post-Newton fixed-point runs all live
inside one traced program, so a complete spin-up solve is ONE dispatch.

Why it matters on this hardware: the remote-dispatch floor is ~25 ms per
call (see docs/tpu-architecture.md).  A host-driven Newton solve of a
small column family costs dozens of dispatches (fn evals, norms, Armijo
trials, checkpointed scalars); when each model year is itself fast
(year-operator or small-grid kernels), the solve is pure host latency.
One fused program pays the floor once.

Semantics match the host path step for step:

  * convergence test `(it >= min_iter) & (||F|| < rtol ||x||)` per
    (tracer module, region) -- block independence (SURVEY.md section 2.6
    P1/P2) carried as masked scalars,
  * the same left-preconditioned GMRES (ops/gmres.py, Givens QR) with the
    kernel's limiter applied to the increment,
  * Armijo backtracking with per-(module, region) halving factors,
    alpha = 1e-4, at most `armijo_max_ind + 1` trials
    (nk_ooc/newton_solver.py:183-250 semantics) -- converged blocks carry
    factor 0 and never move,
  * `post_newton_fp_iter` fixed-point updates after each Newton step.

Failure modes that raise on the host path (Armijo exhaustion, Newton
max-iteration overrun) cannot raise inside jit; the returned info carries
flags and NewtonKrylovInCore(jit_newton=True) re-raises the identical
RuntimeErrors after the device call returns.

tests/test_newton_jit.py pins the fused solve to the host-driven solver's
iterates (same iteration counts, same stats trajectory, states equal to
roundoff) for linear families, multi-region kernels, and the nonlinear
sharded phosphorus solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .gmres import build_gmres


def build_newton_krylov(
    kernel,
    newton_rel_tol=1e-5,
    krylov_rel_tol=1e-2,
    newton_max_iter=5,
    newton_min_iter=0,
    krylov_max_dim=40,
    post_newton_fp_iter=1,
    armijo_alpha=1e-4,
    armijo_max_ind=10,
):
    """build a jitted full Newton-Krylov solve over an in-core kernel.

    The kernel provides the same jittable surface NewtonKrylovInCore
    drives (comp_fcn, jvp/linearize_target, precond_setup/apply, dot,
    norm, region_broadcast); the limiter must be jit-compatible --
    kernels expose `limiter_scalef_jit(x, increment)` (the sharded
    kernels' lob-0 limiter has a traced twin), with a no-op fallback
    when absent.

    Returns solve(x0) -> (x, fcn, info) where info holds device arrays:
    `iterations` (scalar), `fcn_norm_hist`/`x_norm_hist`
    ((max_iter+1, module, region), filled through `iterations`),
    `krylov_iterations`/`armijo_factor`/`limiter_scalef` per Newton step,
    `armijo_ok` (per-step success flags) and `converged` (final
    per-block flags).  Callers re-raise on `armijo_ok`/`converged`
    failures -- see NewtonKrylovInCore(jit_newton=True).
    """
    newton_max_iter = int(newton_max_iter)
    gmres = build_gmres(
        kernel.jvp,
        kernel.precond_apply,
        kernel.dot,
        kernel.region_broadcast,
        krylov_max_dim,
        krylov_rel_tol,
        linearize_fn=getattr(kernel, "linearize_target", None),
    )
    limiter_fn = getattr(kernel, "limiter_scalef_jit", None)

    def conv_flags(it, fcn_norm, x_norm):
        return (it >= newton_min_iter) & (
            fcn_norm < newton_rel_tol * x_norm
        )

    def armijo(x, fcn, increment, fcn_norm, converged):
        """bounded per-(module, region) backtracking; converged blocks
        are pinned at factor 0 (nk_ooc/newton_solver.py:183-250)"""
        factor0 = jnp.where(converged, 0.0, 1.0).astype(fcn_norm.dtype)
        ok0 = jnp.zeros_like(converged)

        def cond(carry):
            trial, _factor, _prov, _prov_fcn, ok = carry
            return (trial == 0) | (
                ~jnp.all(ok) & (trial < armijo_max_ind + 1)
            )

        def body(carry):
            trial, factor, _prov, _prov_fcn, _ok = carry
            prov = x + increment * kernel.region_broadcast(factor)
            prov_fcn = kernel.comp_fcn(prov)
            prov_norm = kernel.norm(prov_fcn)
            ok = (factor == 0.0) | (
                prov_norm <= (1.0 - armijo_alpha * factor) * fcn_norm
            )
            factor_next = jnp.where(ok, factor, 0.5 * factor)
            return trial + 1, factor_next, prov, prov_fcn, ok

        _trials, factor, prov, prov_fcn, ok = jax.lax.while_loop(
            cond, body, (0, factor0, x, fcn, ok0)
        )
        # `factor` was already halved where the last trial failed; report
        # the factor the accepted state was computed with
        accepted_factor = jnp.where(ok, factor, 2.0 * factor)
        return prov, prov_fcn, accepted_factor, jnp.all(ok)

    @jax.jit
    def solve(x0):
        fcn0 = kernel.comp_fcn(x0)
        fn0 = kernel.norm(fcn0)
        xn0 = kernel.norm(x0)
        mr_shape = fn0.shape
        sdtype = fn0.dtype

        fn_hist = (
            jnp.zeros((newton_max_iter + 1,) + mr_shape, sdtype).at[0].set(fn0)
        )
        xn_hist = (
            jnp.zeros((newton_max_iter + 1,) + mr_shape, sdtype).at[0].set(xn0)
        )
        # per-step records; at least one slot so the (never-executed) body
        # still traces when newton_max_iter == 0
        n_rec = max(newton_max_iter, 1)
        kry_hist = jnp.zeros((n_rec,), jnp.int32)
        fac_hist = jnp.zeros((n_rec,) + mr_shape, sdtype)
        scalef_hist = jnp.zeros((n_rec,) + mr_shape, sdtype)
        armijo_ok_hist = jnp.ones((n_rec,), bool)

        def cond(carry):
            it, _x, _fcn, fn_hist, xn_hist, *_rest = carry
            converged = conv_flags(it, fn_hist[it], xn_hist[it])
            return ~jnp.all(converged) & (it < newton_max_iter)

        def body(carry):
            (it, x, fcn, fn_hist, xn_hist, kry_hist, fac_hist,
             scalef_hist, armijo_ok_hist) = carry
            fcn_norm = fn_hist[it]
            converged = conv_flags(it, fcn_norm, xn_hist[it])

            precond_data = kernel.precond_setup(x)
            increment, krylov_its, _resid, _beta = gmres(
                x, fcn, precond_data
            )
            if limiter_fn is not None:
                scalef = limiter_fn(x, increment).astype(sdtype)
            else:
                scalef = jnp.ones(mr_shape, sdtype)
            increment = increment * kernel.region_broadcast(scalef)

            x, fcn, factor, armijo_ok = armijo(
                x, fcn, increment, fcn_norm, converged
            )
            for _ in range(post_newton_fp_iter):
                x = x + fcn
                fcn = kernel.comp_fcn(x)

            fn_hist = fn_hist.at[it + 1].set(kernel.norm(fcn))
            xn_hist = xn_hist.at[it + 1].set(kernel.norm(x))
            kry_hist = kry_hist.at[it].set(krylov_its)
            fac_hist = fac_hist.at[it].set(factor)
            scalef_hist = scalef_hist.at[it].set(scalef)
            armijo_ok_hist = armijo_ok_hist.at[it].set(armijo_ok)
            return (it + 1, x, fcn, fn_hist, xn_hist, kry_hist, fac_hist,
                    scalef_hist, armijo_ok_hist)

        (it, x, fcn, fn_hist, xn_hist, kry_hist, fac_hist, scalef_hist,
         armijo_ok_hist) = jax.lax.while_loop(
            cond,
            body,
            (0, x0, fcn0, fn_hist, xn_hist, kry_hist, fac_hist,
             scalef_hist, armijo_ok_hist),
        )
        converged = conv_flags(it, fn_hist[it], xn_hist[it])
        info = {
            "iterations": it,
            "fcn_norm_hist": fn_hist,
            "x_norm_hist": xn_hist,
            "krylov_iterations": kry_hist,
            "armijo_factor": fac_hist,
            "limiter_scalef": scalef_hist,
            "armijo_ok": armijo_ok_hist,
            "converged": converged,
        }
        return x, fcn, info

    return solve


__all__ = ["build_newton_krylov"]

"""adaptive Radau IIA (order 5) stiff ODE integrator, jittable on TPU.

The reference evaluates F(X) by integrating each tracer module one model year
with scipy's Radau (nk_ooc/test_problem/model_state.py:80-99,
nk_ooc/py_driver_2d/model_state.py:94-114).  This is the TPU-native
re-implementation of that hot path: the classic RADAU5 method (Hairer &
Wanner, "Solving ODEs II", ch. IV.8) as a pure JAX function -- a
``lax.while_loop`` per output segment under an outer ``lax.scan``, with dense
LU stage solves on the MXU, Jacobian/LU reuse, an embedded order-3 error
estimator, and the standard predictive (Gustafsson) step-size controller.

Everything is static-shaped: states are flat (n,) vectors, the Jacobian is a
dense (n, n) matrix (problems here are few thousand DOF at most; larger grids
use the structured/sharded solvers in newton_krylov_ooc_tpu.parallel).  The
integrator is vmap-compatible (batch tracer modules) and forward-mode
differentiable (exact jax.jvp Jacobian-vector products through a full model
year).

The Butcher tableau, its inverse's real canonical form, and the collocation
interpolant are derived numerically at import time from the collocation
conditions -- only the abscissae c = ((4-sqrt6)/10, (4+sqrt6)/10, 1) and the
embedded-error weight vector come from the literature.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# -- collocation constants (float64 numpy, derived at import) -----------------

_S6 = np.sqrt(6.0)
_C = np.array([(4.0 - _S6) / 10.0, (4.0 + _S6) / 10.0, 1.0])

# Butcher matrix A from the collocation conditions: A @ V = W with
# V[j, k] = c_j^k and W[i, k] = c_i^(k+1) / (k+1)  (exact for degree<=2)
_V = np.vander(_C, 3, increasing=True)
_W = np.stack([_C ** (k + 1) / (k + 1) for k in range(3)], axis=1)
_A = _W @ np.linalg.inv(_V)
_AINV = np.linalg.inv(_A)

# real canonical form of A^-1: one real eigenvalue and a complex pair
_eigvals, _eigvecs = np.linalg.eig(_AINV)
_real_ind = int(np.argmin(np.abs(_eigvals.imag)))
_cplx_ind = [i for i in range(3) if i != _real_ind and _eigvals[i].imag > 0][0]
MU_REAL = float(_eigvals[_real_ind].real)
_v_real = _eigvecs[:, _real_ind].real
_v_cplx = _eigvecs[:, _cplx_ind]
_T = np.stack([_v_real, _v_cplx.real, _v_cplx.imag], axis=1)
_TI = np.linalg.inv(_T)
_M = _TI @ _AINV @ _T
# complex shift: rows 1,2 of M form [[a, b], [-b, a]] acting on (W1, W2);
# combining w = W1 + i*W2 yields one complex system with mu = M11 + i*M21
MU_COMPLEX = complex(_M[1, 1], _M[2, 1])
assert abs(_M[0, 0] - MU_REAL) < 1e-10
assert abs(_M[1, 1] - _M[2, 2]) < 1e-10 and abs(_M[1, 2] + _M[2, 1]) < 1e-10

# embedded order-3 error estimator weights (Hairer & Wanner, RADAU5)
_E = np.array([-13.0 - 7.0 * _S6, -13.0 + 7.0 * _S6, -1.0]) / 3.0

# collocation interpolant: y(t_old + x*h) = y_old + Q @ (x, x^2, x^3),
# Q = Z^T P, determined by the interpolant passing through the stage values
# continuous-extension coefficients: z(x) = (z.T @ _P) @ [x, x^2, x^3] with
# x = (t - t_old)/h interpolates the stage increments (z(c_i) = z_i, z(0) = 0,
# exact at the right node x = 1).  The Vandermonde inverse is transposed so it
# contracts against z.T from the right.
_P = np.linalg.inv(np.stack([_C ** (k + 1) for k in range(3)], axis=1)).T

NEWTON_MAXITER = 6
MIN_FACTOR = 0.2
MAX_FACTOR = 10.0


def _rms_norm(x):
    return jnp.sqrt(jnp.mean(jnp.square(x)))


class _State(NamedTuple):
    """integrator state carried across step attempts and output segments"""

    t: jnp.ndarray
    y: jnp.ndarray           # (n,)
    f: jnp.ndarray           # (n,) = fun(t, y)
    h_abs: jnp.ndarray
    h_abs_old: jnp.ndarray   # <= 0 encodes "not available"
    error_norm_old: jnp.ndarray  # < 0 encodes "not available"
    jac_mat: jnp.ndarray     # (n, n)
    current_jac: jnp.ndarray  # bool: jac_mat evaluated at (t, y)
    lu_real: tuple           # LU of (MU_REAL/h I - J)
    lu_cplx: tuple           # LU of (MU_COMPLEX/h I - J)
    need_lu: jnp.ndarray     # bool: LU factors stale
    have_sol: jnp.ndarray    # bool: dense-output predictor available
    cont_q: jnp.ndarray      # (n, 3) interpolant coefficients of last step
    cont_base: jnp.ndarray   # (n,) y at the start of the last accepted step
    t_old: jnp.ndarray
    h_old: jnp.ndarray
    rejected: jnp.ndarray    # bool: last attempt was rejected
    nfev: jnp.ndarray
    nlu: jnp.ndarray
    failed: jnp.ndarray      # bool: step underflow / attempt budget exhausted


def _predict_factor(h_abs, h_abs_old, error_norm, error_norm_old):
    """Gustafsson predictive step factor (order-3 error estimator)"""
    have_old = (h_abs_old > 0) & (error_norm_old >= 0) & (error_norm > 0)
    multiplier = jnp.where(
        have_old,
        h_abs
        / jnp.where(h_abs_old > 0, h_abs_old, 1.0)
        * (
            jnp.where(error_norm_old >= 0, error_norm_old, 1.0)
            / jnp.where(error_norm > 0, error_norm, 1.0)
        )
        ** 0.25,
        1.0,
    )
    err = jnp.maximum(error_norm, 1e-30)
    return jnp.minimum(1.0, multiplier) * err ** -0.25


def radau5_integrate(
    fun,
    t_span,
    y0,
    t_eval,
    jac=None,
    rtol=1e-6,
    atol=1e-6,
    max_step=np.inf,
    max_attempts=1_000_000,
    jac_bands=None,
    bandwidth=None,
    lu_reuse_factor=1.2,
):
    """
    integrate dy/dt = fun(t, y) over t_span, reporting y at t_eval points

    fun: (t, y) -> (n,) tendency (traced; must be jittable)
    jac: (t, y) -> (n, n) dense Jacobian; defaults to jax.jacfwd of fun
    jac_bands: alternative structured Jacobian, (t, y) -> (n_blocks, m, 2bw+1)
        row-band blocks (block-diagonal over e.g. tracers, banded within);
        stage systems then use banded LU -- O(m bw^2) instead of O(m^3), and
        float64-capable on TPU.  bandwidth must be given with it.
    t_eval: increasing times, t_eval[0] == t_span[0], last == t_span[1]
    returns (ys, info): ys has shape (len(t_eval), n); info carries
    success/nfev/nlu as traced values

    The function is jittable and vmap-compatible.
    """
    y0 = jnp.asarray(y0)
    dtype = y0.dtype
    n = y0.shape[0]
    t_eval = jnp.asarray(t_eval, dtype=dtype)
    t0 = jnp.asarray(t_span[0], dtype=dtype)
    t_end = jnp.asarray(t_span[1], dtype=dtype)

    banded_mode = jac_bands is not None
    if banded_mode:
        if bandwidth is None:
            raise ValueError("bandwidth is required with jac_bands")
        jac = jac_bands
    elif jac is None:
        def jac(t, y):
            return jax.jacfwd(lambda yy: fun(t, yy))(y)

    # static flag: is a finite max_step in effect?
    try:
        has_max_step = bool(np.isfinite(float(max_step)))
    except TypeError:
        has_max_step = True  # traced value: assume finite

    mu_a = float(MU_COMPLEX.real)
    mu_b = float(MU_COMPLEX.imag)

    if banded_mode:
        from .banded import (
            banded_lu_factor_blocks,
            banded_lu_solve_blocks,
            bands_add_diag,
            complex_banded_solve,
            complex_shift_bands,
        )

        def solve_real(lu, rhs):
            n_blocks = lu.shape[0]
            sol = banded_lu_solve_blocks(lu, rhs.reshape(n_blocks, -1))
            return sol.reshape(-1)

        if jax.default_backend() == "tpu":
            # TPU has no complex128: the complex stage system solves as an
            # interleaved real banded system (2x rows, ~2x bandwidth)
            complex_shift_blocks = jax.vmap(
                complex_shift_bands, in_axes=(0, None, None)
            )
            complex_solve_blocks = jax.vmap(complex_banded_solve)

            def factor_lu(h, jac_mat):
                # jac_mat: (n_blocks, m, 2bw+1) row-band blocks of J
                lu_r = banded_lu_factor_blocks(
                    bands_add_diag(-jac_mat, MU_REAL / h)
                )
                lu_c = banded_lu_factor_blocks(
                    complex_shift_blocks(-jac_mat, mu_a / h, mu_b / h)
                )
                return lu_r, lu_c

            def solve_cplx(lu, rhs_re, rhs_im):
                n_blocks = lu.shape[0]
                x_re, x_im = complex_solve_blocks(
                    lu, rhs_re.reshape(n_blocks, -1), rhs_im.reshape(n_blocks, -1)
                )
                return x_re.reshape(-1), x_im.reshape(-1)

        else:
            # CPU/GPU support complex dtypes natively; the banded kernels are
            # dtype-generic, and the native-complex factorization moves ~4x
            # less memory than the interleaved-real form (same m and bw, 2x
            # bytes per element, vs 2x m and 2x bw at 1x bytes)
            cplx_dtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64

            def factor_lu(h, jac_mat):
                lu_r = banded_lu_factor_blocks(
                    bands_add_diag(-jac_mat, MU_REAL / h)
                )
                mu_over_h = (mu_a + 1j * mu_b) / h.astype(cplx_dtype)
                lu_c = banded_lu_factor_blocks(
                    bands_add_diag((-jac_mat).astype(cplx_dtype), mu_over_h)
                )
                return lu_r, lu_c

            def solve_cplx(lu, rhs_re, rhs_im):
                n_blocks = lu.shape[0]
                rhs = (rhs_re + 1j * rhs_im).astype(cplx_dtype)
                sol = banded_lu_solve_blocks(lu, rhs.reshape(n_blocks, -1))
                return (
                    sol.real.astype(dtype).reshape(-1),
                    sol.imag.astype(dtype).reshape(-1),
                )

    else:
        cplx_dtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
        mu_c = jnp.asarray(MU_COMPLEX, dtype=cplx_dtype)
        eye = jnp.eye(n, dtype=dtype)
        eye_c = jnp.eye(n, dtype=cplx_dtype)

        def factor_lu(h, jac_mat):
            lu_r = jax.scipy.linalg.lu_factor(MU_REAL / h * eye - jac_mat)
            lu_c = jax.scipy.linalg.lu_factor(
                mu_c / h.astype(cplx_dtype) * eye_c - jac_mat.astype(cplx_dtype)
            )
            return lu_r, lu_c

        def solve_real(lu, rhs):
            return jax.scipy.linalg.lu_solve(lu, rhs)

        def solve_cplx(lu, rhs_re, rhs_im):
            sol = jax.scipy.linalg.lu_solve(
                lu, (rhs_re + 1j * rhs_im).astype(cplx_dtype)
            )
            return sol.real.astype(dtype), sol.imag.astype(dtype)

    c_arr = jnp.asarray(_C, dtype=dtype)
    e_arr = jnp.asarray(_E, dtype=dtype)
    t_mat = jnp.asarray(_T, dtype=dtype)
    ti_mat = jnp.asarray(_TI, dtype=dtype)
    p_mat = jnp.asarray(_P, dtype=dtype)
    eps = jnp.finfo(dtype).eps
    newton_tol = jnp.maximum(10 * eps / rtol, jnp.minimum(0.03, rtol ** 0.5))

    # -- initial step size (Hairer & Wanner) ------------------------------------

    f0 = fun(t0, y0)
    scale0 = atol + jnp.abs(y0) * rtol
    d0 = _rms_norm(y0 / scale0)
    d1 = _rms_norm(f0 / scale0)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + h0 * f0
    f1 = fun(t0 + h0, y1)
    d2 = _rms_norm((f1 - f0) / scale0) / h0
    h1 = jnp.where(
        jnp.maximum(d1, d2) <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** 0.25,
    )
    h_init = jnp.minimum(jnp.minimum(100 * h0, h1), jnp.minimum(max_step, t_end - t0))

    jac0 = jac(t0, y0).astype(dtype)
    lu_r0, lu_c0 = factor_lu(jnp.maximum(h_init, 10 * eps), jac0)

    init = _State(
        t=t0,
        y=y0,
        f=f0,
        h_abs=h_init.astype(dtype),
        h_abs_old=jnp.asarray(-1.0, dtype),
        error_norm_old=jnp.asarray(-1.0, dtype),
        jac_mat=jac0,
        current_jac=jnp.asarray(True),
        lu_real=lu_r0,
        lu_cplx=lu_c0,
        need_lu=jnp.asarray(True),
        have_sol=jnp.asarray(False),
        cont_q=jnp.zeros((n, 3), dtype),
        cont_base=y0,
        t_old=t0,
        h_old=jnp.asarray(1.0, dtype),
        rejected=jnp.asarray(False),
        nfev=jnp.asarray(2, jnp.int32),
        nlu=jnp.asarray(1, jnp.int32),
        failed=jnp.asarray(False),
    )

    def newton_collocation(st, h, z0):
        """simplified Newton on the transformed collocation system"""
        w0 = ti_mat @ z0  # (3, n)

        def body(carry):
            k, w, z, dw_norm_old, rate, converged, diverged, nfev_add = carry
            ch = st.t + h * c_arr
            f_stages = jnp.stack([fun(ch[i], st.y + z[i]) for i in range(3)])
            finite = jnp.all(jnp.isfinite(f_stages))

            tif = ti_mat @ f_stages  # (3, n)
            rhs_real = tif[0] - MU_REAL / h * w[0]
            # complex rhs (tif1 + i tif2) - (mu/h)(w1 + i w2), as real parts
            rhs_re = tif[1] - (mu_a * w[1] - mu_b * w[2]) / h
            rhs_im = tif[2] - (mu_b * w[1] + mu_a * w[2]) / h
            dw_real = solve_real(st.lu_real, rhs_real)
            dw_re, dw_im = solve_cplx(st.lu_cplx, rhs_re, rhs_im)
            dw = jnp.stack([dw_real, dw_re, dw_im])

            scale = atol + jnp.abs(st.y) * rtol
            dw_norm = _rms_norm(dw / scale)
            have_old = dw_norm_old >= 0
            rate_new = jnp.where(
                have_old, dw_norm / jnp.maximum(dw_norm_old, 1e-300), rate
            )

            bad_rate = have_old & (
                (rate_new >= 1.0)
                | (
                    rate_new ** (NEWTON_MAXITER - k)
                    / jnp.maximum(1.0 - rate_new, 1e-10)
                    * dw_norm
                    > newton_tol
                )
            )
            diverged_new = ~finite | bad_rate

            w_new = jnp.where(diverged_new, w, w + dw)
            z_new = jnp.where(diverged_new, z, t_mat @ w_new)
            conv_now = ~diverged_new & (
                (dw_norm == 0)
                | (
                    have_old
                    & (
                        rate_new
                        / jnp.maximum(1.0 - rate_new, 1e-10)
                        * dw_norm
                        < newton_tol
                    )
                )
            )
            return (
                k + 1,
                w_new,
                z_new,
                dw_norm,
                rate_new,
                converged | conv_now,
                diverged_new,
                nfev_add + 3,
            )

        def cond(carry):
            k, _w, _z, _dwn, _rate, converged, diverged, _nf = carry
            return (k < NEWTON_MAXITER) & ~converged & ~diverged

        carry0 = (
            jnp.asarray(0, jnp.int32),
            w0,
            z0,
            jnp.asarray(-1.0, dtype),
            jnp.asarray(0.0, dtype),
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.asarray(0, jnp.int32),
        )
        k, _w, z, _dwn, rate, converged, _div, nfev_add = jax.lax.while_loop(
            cond, body, carry0
        )
        return converged, k, z, rate, nfev_add

    def make_attempt(t_bound):
        def attempt(state):
            min_step = 10 * eps * jnp.abs(state.t)
            h_abs = jnp.clip(state.h_abs, min_step, max_step)
            too_small = state.h_abs < min_step

            t_new = jnp.minimum(state.t + h_abs, t_bound)
            h = t_new - state.t
            h_abs_cur = jnp.abs(h)

            # stage predictor from the last step's collocation polynomial
            x = (state.t + h * c_arr - state.t_old) / jnp.where(
                state.h_old != 0, state.h_old, 1.0
            )
            xp = jnp.stack([x, x**2, x**3], axis=0)  # (3 powers, 3 stages)
            y_poly = state.cont_base[:, None] + state.cont_q @ xp  # (n, 3)
            z0_pred = (y_poly - state.y[:, None]).T
            z0 = jnp.where(
                state.have_sol, z0_pred, jnp.zeros((3, n), dtype)
            )

            def do_factor(st):
                lu_r, lu_c = factor_lu(h, st.jac_mat)
                return st._replace(
                    lu_real=lu_r,
                    lu_cplx=lu_c,
                    need_lu=jnp.asarray(False),
                    nlu=st.nlu + 1,
                )

            state1 = jax.lax.cond(state.need_lu, do_factor, lambda st: st, state)

            converged, n_iter, z, rate, nfev_add = newton_collocation(state1, h, z0)
            state1 = state1._replace(nfev=state1.nfev + nfev_add)

            def not_converged(st):
                def refresh_jac(s):
                    return s._replace(
                        jac_mat=jac(s.t, s.y).astype(dtype),
                        current_jac=jnp.asarray(True),
                        need_lu=jnp.asarray(True),
                    )

                def halve(s):
                    return s._replace(
                        h_abs=h_abs_cur * 0.5,
                        need_lu=jnp.asarray(True),
                        rejected=jnp.asarray(True),
                    )

                return jax.lax.cond(st.current_jac, halve, refresh_jac, st)

            def converged_branch(st):
                y_new = st.y + z[-1]
                ze = (z.T @ e_arr) / h
                error = solve_real(st.lu_real, st.f + ze)
                scale = atol + jnp.maximum(jnp.abs(st.y), jnp.abs(y_new)) * rtol
                error_norm = _rms_norm(error / scale)
                safety = (
                    0.9 * (2 * NEWTON_MAXITER + 1) / (2 * NEWTON_MAXITER + n_iter)
                )

                def stabilized(en):
                    err, _ = en
                    err2 = solve_real(st.lu_real, fun(st.t, st.y + err) + ze)
                    return (err2, _rms_norm(err2 / scale))

                error, error_norm = jax.lax.cond(
                    st.rejected & (error_norm > 1),
                    stabilized,
                    lambda en: en,
                    (error, error_norm),
                )

                def reject(s):
                    pf = _predict_factor(
                        h_abs_cur, s.h_abs_old, error_norm, s.error_norm_old
                    )
                    return s._replace(
                        h_abs=h_abs_cur * jnp.maximum(MIN_FACTOR, safety * pf),
                        need_lu=jnp.asarray(True),
                        rejected=jnp.asarray(True),
                    )

                def accept(s):
                    recompute_jac = (n_iter > 2) & (rate > 1e-3)
                    pf = _predict_factor(
                        h_abs_cur, s.h_abs_old, error_norm, s.error_norm_old
                    )
                    factor = jnp.minimum(MAX_FACTOR, safety * pf)
                    # cap growth at max_step so a step pinned at the ceiling
                    # reports factor 1 and keeps its LU factors (otherwise the
                    # ceiling forces a refactorization every step); skipped for
                    # unbounded max_step (inf/h would poison jvp tangents)
                    if has_max_step:
                        factor = jnp.minimum(factor, max_step / h_abs_cur)
                    # keep h (and the LU factors) while the predicted growth
                    # stays below lu_reuse_factor; RADAU5's classic window is
                    # 1.2, but when each factorization costs many solves
                    # (wide-band systems) a larger window trades slightly
                    # smaller steps for far fewer factorizations
                    keep_lu = ~recompute_jac & (factor < lu_reuse_factor)
                    factor = jnp.where(keep_lu, 1.0, factor)

                    f_new = fun(t_new, y_new)
                    jac_new = jax.lax.cond(
                        recompute_jac,
                        lambda _: jac(t_new, y_new).astype(dtype),
                        lambda _: s.jac_mat,
                        None,
                    )
                    return s._replace(
                        t=t_new,
                        y=y_new,
                        f=f_new,
                        h_abs=h_abs_cur * factor,
                        h_abs_old=h_abs_cur,
                        error_norm_old=error_norm,
                        jac_mat=jac_new,
                        current_jac=recompute_jac,
                        need_lu=~keep_lu,
                        have_sol=jnp.asarray(True),
                        cont_q=z.T @ p_mat,
                        cont_base=s.y,
                        t_old=s.t,
                        h_old=h,
                        rejected=jnp.asarray(False),
                        nfev=s.nfev + 1,
                    )

                return jax.lax.cond(error_norm > 1, reject, accept, st)

            state2 = jax.lax.cond(converged, converged_branch, not_converged, state1)
            return state2._replace(failed=state2.failed | too_small)

        return attempt

    # One continuous integration to t_end; t_eval values come from the
    # collocation polynomial (dense output), exactly as scipy's solve_ivp
    # samples t_eval.  Steps are never truncated at interior output points --
    # truncating there resets the controller to the boundary sliver, which
    # both wastes attempts regrowing h and can underflow the min-step check.
    attempt = make_attempt(t_end)
    n_time = t_eval.shape[0]
    ys0 = jnp.broadcast_to(y0, (n_time, n))

    def cond(carry):
        st, _ys, n_att = carry
        return (st.t < t_end) & ~st.failed & (n_att < max_attempts)

    def body(carry):
        st, ys_buf, n_att = carry
        t_prev = st.t
        st2 = attempt(st)
        # fill the output points this step crossed: y(t_old + x*h) from the
        # degree-3 continuous extension (exact at the right node, x == 1)
        h_safe = jnp.where(st2.h_old != 0, st2.h_old, 1.0)
        x = (t_eval - st2.t_old) / h_safe
        xp = jnp.stack([x, x**2, x**3], axis=0)  # (3 powers, n_time)
        vals = st2.cont_base[None, :] + (st2.cont_q @ xp).T  # (n_time, n)
        newly = (t_eval > t_prev) & (t_eval <= st2.t)
        ys_buf = jnp.where(newly[:, None], vals, ys_buf)
        return st2, ys_buf, n_att + 1

    state_final, ys_buf, n_att = jax.lax.while_loop(
        cond, body, (init, ys0, jnp.asarray(0, jnp.int32))
    )
    state_final = state_final._replace(
        failed=state_final.failed
        | ((n_att >= max_attempts) & (state_final.t < t_end))
    )
    ys = ys_buf.at[0].set(y0)
    info = {
        "success": ~state_final.failed,
        "nfev": state_final.nfev,
        "nlu": state_final.nlu,
        "t_final": state_final.t,
        "h_abs_final": state_final.h_abs,
        "n_attempts": n_att,
    }
    return ys, info

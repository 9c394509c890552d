"""dense one-year transition operators for linear tracer modules.

The reference estimates Jacobian columns by packing impulse tracers into a
forward run, using graph coloring to keep the probes structurally orthogonal
(`notebooks/IRF_coloring_dev.ipynb`, `externals/gCol/*` -- SURVEY.md P6).  On
TPU the batched megakernel makes the *full-rank* version affordable: probe
ALL n = nz*ny basis columns by running them as extra lane-packed channels of
the one-year kernel.  For a linear module the probe is exact, and the year
map becomes an explicit affine operator

    year(X) = B X + c        F(X) = (B - I) X + c

after which a function evaluation or Jacobian-vector product is ONE dense
matvec on the MXU (microseconds, vs milliseconds for the time-stepped year),
and the cyclo-stationary problem F(X) = 0 can be solved *directly* as the
linear system (I - B) X = c -- the whole spin-up collapses to a dense solve
plus Richardson polishing with exact evaluations.

The probe cost (n/chunk batched year integrations; ~47 s for the 40x50
benchmark grid on a v5e) is one-time per (grid, time-grid, parameters)
configuration.  At small grids a single Newton-Krylov spin-up with the
time-stepped kernel is cheaper end-to-end; the operator pays off for
parameter studies, repeated solves, spectral analysis of the annual
propagator, and as the exact replacement for coloring-based probing.

Reference parity: nk_ooc gets Jacobian action only via finite differences of
full model runs (nk_ooc/model_state_base.py:492-527) and approximates
preconditioners from IRF output; this module supersedes both for in-core
linear modules.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def _matvec(b_mat, x):
    """(n, n) @ (n,) at operand-dtype-faithful MXU precision"""
    return jax.lax.dot_general(
        b_mat,
        x,
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=b_mat.dtype,
    )


def _matmul(a, b):
    """(n, n) @ (n, n) at operand-dtype-faithful MXU precision"""
    return jax.lax.dot_general(
        a,
        b,
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=a.dtype,
    )


class YearOperator:
    """explicit affine one-year map for a batch of linear tracer fields

    b_mats: (T, n, n) -- per-tracer dense transition operator (source-free)
    const:  (T, nz, ny) -- year(0) with the source terms active
    """

    def __init__(self, b_mats, const, nz, ny):
        self.nz = int(nz)
        self.ny = int(ny)
        self.n = self.nz * self.ny
        self.t_dim = int(b_mats.shape[0])
        # device-resident operands: the matrices MUST be jit arguments, not
        # closure constants -- XLA treats closure-captured arrays as program
        # literals, which remote-device backends re-upload on every call
        # (measured 25 ms/call vs 20 us for the argument form)
        self.b_mats = jnp.asarray(b_mats)
        self.const = jnp.asarray(const)

    def with_source(self, year_src_fn):
        """reuse the probed B under a different source/forcing configuration

        The linear part of the year map (transport + restoring) is
        forcing-independent, so a parameter study over sources only needs a
        new constant response c = year(0) per configuration -- one forward
        run each, not a re-probe.  year_src_fn: the full year map WITH the
        new sources, evaluated once on zeros."""
        zeros = jnp.zeros((self.t_dim, self.nz, self.ny), self.const.dtype)
        return YearOperator(
            self.b_mats, year_src_fn(zeros), self.nz, self.ny
        )

    def year(self, y):
        return _year_apply(self.b_mats, self.const, y)

    def fcn(self, y):
        return _year_apply(self.b_mats, self.const, y) - y

    def jvp(self, v):
        return _jvp_apply(self.b_mats, v)

    def solve_cyclostationary(self, polish_iters=4, ns_iters=64, rtol=1e-4):
        """direct spin-up: solve (I - B) X = c, then polish with exact
        Newton-Richardson steps.

        Row-pivoted LU is serial and pathologically slow on TPU (seconds for
        n=2000); instead the inverse of A = I - B is built by Newton-Schulz
        iteration X <- X (2I - A X) -- nothing but MXU matmuls, quadratically
        convergent from the standard A^T/(|A|_1 |A|_inf) start.  An inexact
        inverse only slows the polish steps, which use exact residuals.

        When I - B is nearly singular (propagator eigenvalues approaching 1,
        e.g. weak restoring or fine grids) the fixed iteration budget may not
        converge; the final affine-model residual ||F(X)|| is checked per
        tracer against rtol * ||X|| and a warning is logged on violation
        (rtol=None skips the readback entirely)."""
        x = _solve_all(self.b_mats, self.const, polish_iters, ns_iters)
        if rtol is not None:
            import logging

            resid = np.asarray(_rel_resid(self.b_mats, self.const, x))
            bad = resid > rtol
            if bad.any():
                logging.getLogger(__name__).warning(
                    "solve_cyclostationary did not converge for tracer(s) %s: "
                    "rel resid %s exceeds rtol=%g -- raise ns_iters/"
                    "polish_iters or check the propagator spectrum",
                    np.nonzero(bad)[0].tolist(),
                    resid[bad].tolist(),
                    rtol,
                )
        return x

    def spectrum(self, k=8, iters=200, seed=0):
        """leading eigenvalues of the annual propagator B per tracer.

        Subspace (orthogonal) iteration runs on device -- batched MXU
        matmuls + QR -- then the k x k projection q^T B q is
        eigendecomposed on the host.  Returns (eigvals, timescales_years):
        eigvals (T, k) complex, sorted by descending magnitude, and the
        implied e-folding spin-up timescales -1/ln|lambda| in years (inf
        for |lambda| >= 1).  The reference reaches for ARPACK shift-invert
        in its phosphorus preconditioner (py_driver_2d/phosphorus.py
        eigs); here the spectrum of the exact year map is available
        directly."""
        # pad the subspace: the trailing iterated eigenvalue converges
        # slowest, so iterate with k+pad columns and report the top k
        k = min(int(k), self.n)
        pad = max(4, k // 2)
        kk = min(k + pad, self.n)
        rng = np.random.default_rng(seed)
        q0 = jnp.asarray(
            rng.standard_normal((self.t_dim, self.n, kk)),
            self.b_mats.dtype,
        )
        q0, _ = jnp.linalg.qr(q0)
        _q, h = _subspace_project(self.b_mats, q0, int(iters))

        eigvals = np.empty((self.t_dim, k), np.complex128)
        for t in range(self.t_dim):
            vals = np.linalg.eigvals(np.asarray(h[t], np.float64))
            eigvals[t] = vals[np.argsort(-np.abs(vals))][:k]
        mags = np.abs(eigvals)
        with np.errstate(divide="ignore", invalid="ignore"):
            log_mags = np.log(mags)
            timescales = np.where(mags < 1.0, -1.0 / log_mags, np.inf)
        return eigvals, timescales


@jax.jit
def _year_apply(b, c, y):
    """year(y) = B y + c, batched over tracers (module-level jit: compiled
    once per shape, no per-instance retraces or self-reference cycles)"""
    t_dim, n, _ = b.shape
    flat = y.reshape(t_dim, n)
    return jax.vmap(_matvec)(b, flat).reshape(y.shape) + c


@jax.jit
def _rel_resid(b, c, x):
    """per-tracer ||B x + c - x|| / max(||x||, tiny) of the affine model"""
    t_dim, n, _ = b.shape
    flat = x.reshape(t_dim, n)
    resid = jax.vmap(_matvec)(b, flat) + c.reshape(t_dim, n) - flat
    x_norm = jnp.sqrt(jnp.sum(flat * flat, axis=1))
    r_norm = jnp.sqrt(jnp.sum(resid * resid, axis=1))
    return r_norm / jnp.maximum(x_norm, jnp.finfo(b.dtype).tiny)


@jax.jit
def _jvp_apply(b, v):
    """(B - I) v, batched over tracers"""
    t_dim, n, _ = b.shape
    flat = v.reshape(t_dim, n)
    return jax.vmap(_matvec)(b, flat).reshape(v.shape) - v


@partial(jax.jit, static_argnums=(2,))
def _subspace_project(b, q0, iters):
    """orthogonal (subspace) iteration: returns (q, h) with h = q^T B q,
    the k-dim projection of B onto its dominant invariant subspace"""

    def body(_i, q):
        z = jax.vmap(_matmul)(b, q)
        q_new, _r = jnp.linalg.qr(z)
        return q_new

    q = jax.lax.fori_loop(0, iters, body, q0)
    bq = jax.vmap(_matmul)(b, q)
    h = jax.vmap(_matmul)(jnp.swapaxes(q, 1, 2), bq)
    return q, h


@partial(jax.jit, static_argnums=(2, 3))
def _solve_all(b, c, polish, ns):
    """module-level (compiled once per shape): Newton-Schulz inverse of
    I - B, initial solve, and `polish` exact-residual correction steps"""
    t_dim, n, _ = b.shape
    eye = jnp.eye(n, dtype=b.dtype)
    a = eye[None] - b                                   # (T, n, n)

    def inv_one(a_t):
        x0 = a_t.T / (
            jnp.abs(a_t).sum(axis=0).max() * jnp.abs(a_t).sum(axis=1).max()
        )

        def body(_i, x):
            return _matmul(x, 2.0 * eye - _matmul(a_t, x))

        return jax.lax.fori_loop(0, ns, body, x0)

    a_inv = jax.vmap(inv_one)(a)

    flat_c = c.reshape(t_dim, n)
    x = jax.vmap(_matvec)(a_inv, flat_c)
    for _ in range(polish):
        # exact residual of F(x) = Bx + c - x, corrected through the
        # approximate inverse
        resid = jax.vmap(_matvec)(b, x) + flat_c - x
        x = x + jax.vmap(_matvec)(a_inv, resid)
    return x.reshape(c.shape)


def probe_year_operator(make_year0, year_src_fn, vert_diag, col_chunk=128,
                        dtype=np.float32):
    """probe the dense per-tracer year operators by basis-column batching

    make_year0(channel_diag: (C, nz, ny) ndarray) -> fn((C, nz, ny)) ->
        (C, nz, ny): a SOURCE-FREE batched year integrator whose channels
        carry the given implicit local rates (e.g. the lane-packed pallas
        megakernel or the vmapped imex_year scan).
    year_src_fn: fn((T, nz, ny)) -> (T, nz, ny): the full year map WITH
        sources, used once on zeros for the constant response.
    vert_diag: (T, nz, ny) per-tracer implicit local rates.
    dtype: probe precision -- match the integrator's dtype (float32 for the
        pallas path; pass the kernel dtype, e.g. float64, for scan paths).

    Returns a YearOperator.  Chunks are padded to col_chunk so one compiled
    kernel (fixed channel count) serves every probe batch.
    """
    dtype = np.dtype(dtype)
    vert_diag = np.asarray(vert_diag, dtype)
    t_dim, nz, ny = vert_diag.shape
    n = nz * ny
    col_chunk = int(min(col_chunk, n))

    # one builder, reused for every chunk: channel layout is tracer-major
    # (tracer t's probes occupy channels [t*col_chunk, (t+1)*col_chunk))
    channel_diag = np.repeat(vert_diag, col_chunk, axis=0)  # (T*chunk, nz, ny)
    year0 = make_year0(channel_diag)

    # assemble ON DEVICE: a host readback here would not only cost transfers,
    # it also flips remote-tunnel backends into a slow synchronous dispatch
    # mode for the rest of the process
    col_blocks = []                                         # (T, n, chunk) each
    for start in range(0, n, col_chunk):
        basis = np.zeros((col_chunk, n), dtype)
        m = min(col_chunk, n - start)
        basis[np.arange(m), start + np.arange(m)] = 1.0
        y0 = np.tile(basis.reshape(col_chunk, nz, ny), (t_dim, 1, 1))
        out = year0(jnp.asarray(y0))                        # (T*chunk, nz, ny)
        cols = out.reshape(t_dim, col_chunk, n)
        col_blocks.append(jnp.swapaxes(cols, 1, 2))         # (T, n, chunk)

    b_mats = jnp.concatenate(col_blocks, axis=2)[:, :, :n]  # (T, n, n)
    const = year_src_fn(jnp.zeros((t_dim, nz, ny), dtype))
    return YearOperator(b_mats, const, nz, ny)

"""in-core device-resident Newton-Krylov solver (the TPU fast path).

The file-backed solver (newton.py / krylov.py) preserves the reference's
out-of-core contract; this module is the same mathematics with every vector
resident on the accelerator:

  * comp_fcn: the IMEX year kernel (one fused lax.scan),
  * Jacobian-vector products: exact jax.jvp through the full year
    (replacing the reference's finite differences),
  * GMRES: on-device basis (preallocated max dimension), modified
    Gram-Schmidt, per-(module, region) Hessenberg least squares,
  * preconditioner: dense implicit-Euler-product inverse factored once per
    Newton iteration (float32 LU runs on the TPU's MXU),
  * Armijo backtracking and bounds limiting on device scalars.

Control flow (Newton/Armijo/GMRES loops) stays on host -- each step is a
handful of jitted device calls on persistent buffers, so the only host-device
traffic is convergence scalars.  State snapshots serialize as flat npz
checkpoints through SolverState, preserving resume semantics for preemptible
TPU VMs.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np


class InCoreModelKernel:
    """interface the in-core solver drives; models provide implementations

    comp_fcn(x) -> F(x)                   (jitted, device)
    jvp(x, fcn, v) -> dF/dx @ v           (jitted, device; exact forward-mode)
    precond_setup(x) -> data              (factorizations etc., device)
    precond_apply(data, r) -> M^-1 r      (jitted, device)
    norm(v) -> per-(module, region) norms (device)
    """


class NewtonKrylovInCore:
    """Armijo-globalized Newton with on-device left-preconditioned GMRES"""

    def __init__(
        self,
        kernel,
        newton_rel_tol=1e-5,
        krylov_rel_tol=1e-2,
        newton_max_iter=5,
        newton_min_iter=0,
        krylov_max_dim=40,
        post_newton_fp_iter=1,
        armijo_alpha=1e-4,
        armijo_max_ind=10,
        jit_gmres=False,
        jit_newton=False,
    ):
        self.kernel = kernel
        self.newton_rel_tol = newton_rel_tol
        self.krylov_rel_tol = krylov_rel_tol
        self.newton_max_iter = newton_max_iter
        self.newton_min_iter = newton_min_iter
        self.krylov_max_dim = krylov_max_dim
        self.post_newton_fp_iter = post_newton_fp_iter
        self.armijo_alpha = armijo_alpha
        self.armijo_max_ind = armijo_max_ind
        self.stats = []
        # jit_gmres: run the whole Krylov iteration as ONE jitted
        # lax.while_loop (ops/gmres.py) instead of one host round-trip per
        # Arnoldi step -- same per-(module, region) least squares, so the
        # iterates agree to roundoff; requires kernel.region_broadcast.
        # Essential when matvecs are microseconds (year-operator solves):
        # the ~25 ms host-dispatch floor would otherwise dominate.
        self._jit_gmres = None
        if jit_gmres:
            from ..ops.gmres import JittedGMRES

            self._jit_gmres = JittedGMRES(
                kernel, krylov_max_dim, krylov_rel_tol
            )
        # jit_newton: fuse the ENTIRE solve -- Newton loop, limiter, Armijo
        # backtracking, fixed-point updates, and the inner GMRES -- into one
        # jitted program (ops/newton_jit.py), so a spin-up solve is a single
        # device dispatch.  Iterates match the host-driven path to roundoff
        # (tests/test_newton_jit.py).  The kernel's limiter must have a
        # traced twin (limiter_scalef_jit) when it is non-trivial; absent
        # that attribute the limiter is a no-op, matching the linear
        # kernels' host apply_limiter.
        self._jit_solve = None
        if jit_newton:
            from ..ops.newton_jit import build_newton_krylov

            self._jit_solve = build_newton_krylov(
                kernel,
                newton_rel_tol=newton_rel_tol,
                krylov_rel_tol=krylov_rel_tol,
                newton_max_iter=newton_max_iter,
                newton_min_iter=newton_min_iter,
                krylov_max_dim=krylov_max_dim,
                post_newton_fp_iter=post_newton_fp_iter,
                armijo_alpha=armijo_alpha,
                armijo_max_ind=armijo_max_ind,
            )

    def solve(self, x0, checkpoint_dir=None, checkpoint_backend="npz"):
        """run Newton to convergence; returns (x, fcn, info)

        checkpoint_dir: snapshot the solver state (iterate + iteration) after
        every Newton step and resume from the latest snapshot on restart --
        the preemptible-TPU-VM analog of the file-backed solver's step log

        checkpoint_backend: "npz" (gather to host, single atomic archive) or
        "orbax" (async per-shard parallel writes that overlap the next
        iteration's device work and restore straight into the mesh sharding
        -- core/checkpoint.py; preferred for large sharded states)
        """
        logger = logging.getLogger(__name__)
        kernel = self.kernel

        if self._jit_solve is not None:
            if checkpoint_dir is not None:
                raise ValueError(
                    "jit_newton fuses the whole solve into one device call; "
                    "per-step checkpointing needs the host-driven path"
                )
            return self._solve_fused(x0)
        if checkpoint_backend not in ("npz", "orbax"):
            raise ValueError(f"unknown checkpoint_backend={checkpoint_backend}")

        ckptr = None
        if checkpoint_dir is not None and checkpoint_backend == "orbax":
            from .checkpoint import SolverCheckpointer

            ckptr = SolverCheckpointer(checkpoint_dir)
        try:
            return self._solve_host(
                x0, checkpoint_dir, ckptr, logger, kernel
            )
        finally:
            if ckptr is not None:
                ckptr.close()

    def _solve_host(self, x0, checkpoint_dir, ckptr, logger, kernel):
        x = x0
        iteration = 0
        if ckptr is not None:
            loaded = ckptr.restore_latest(
                x0, getattr(kernel, "state_sharding", None)
            )
            if loaded is not None:
                x, iteration = loaded
                logger.info("resumed from checkpoint at iteration %d", iteration)
        elif checkpoint_dir is not None:
            loaded = self._load_checkpoint(checkpoint_dir)
            if loaded is not None:
                x, iteration = loaded
                # restore the kernel's sharding: a resumed array arrives
                # host-loaded (single-device), and feeding it unsharded into
                # a mesh-sharded kernel would silently run replicated.
                # Multi-process, checkpoint_dir must be shared storage (the
                # same contract as the file-backed solver's workdir): every
                # process reads the same snapshot and serves its local
                # shards from it.
                sharding = getattr(kernel, "state_sharding", None)
                if sharding is not None:
                    from ..parallel.mesh import put_global

                    x = put_global(
                        sharding.mesh, np.asarray(x), sharding.spec
                    )
                logger.info("resumed from checkpoint at iteration %d", iteration)
        fcn = kernel.comp_fcn(x)
        while True:
            fcn_norm = np.asarray(kernel.norm(fcn))
            x_norm = np.asarray(kernel.norm(x))
            converged = (iteration >= self.newton_min_iter) & (
                fcn_norm < self.newton_rel_tol * x_norm
            )
            self.stats.append(
                {
                    "iteration": iteration,
                    "fcn_norm": fcn_norm.copy(),
                    "x_norm": x_norm.copy(),
                }
            )
            logger.info(
                "newton iteration=%d max rel resid=%e",
                iteration,
                float((fcn_norm / np.maximum(x_norm, 1e-300)).max()),
            )
            if converged.all():
                break
            if iteration >= self.newton_max_iter:
                raise RuntimeError("number of maximum Newton iterations exceeded")

            increment, krylov_its = self._gmres(x, fcn)
            scalef = kernel.apply_limiter(x, increment)
            increment = kernel.scale(increment, scalef)
            x, fcn = self._armijo(x, fcn, increment, converged)

            # post-Newton fixed-point iterations (fixed-point problems)
            for _ in range(self.post_newton_fp_iter):
                x = kernel.add(x, fcn)
                fcn = kernel.comp_fcn(x)
            iteration += 1
            if ckptr is not None:
                ckptr.save(iteration, x)
            elif checkpoint_dir is not None:
                self._save_checkpoint(checkpoint_dir, x, iteration)

        info = {
            "iterations": iteration,
            "fcn_norm": fcn_norm,
            "x_norm": x_norm,
            "stats": self.stats,
        }
        return x, fcn, info

    def _solve_fused(self, x0):
        """one-dispatch solve via ops/newton_jit.py; host work is limited
        to unpacking stats and re-raising the host path's failure modes"""
        logger = logging.getLogger(__name__)
        x, fcn, dev_info = self._jit_solve(x0)
        iterations = int(dev_info["iterations"])
        fn_hist = np.asarray(dev_info["fcn_norm_hist"])
        xn_hist = np.asarray(dev_info["x_norm_hist"])
        armijo_ok = np.asarray(dev_info["armijo_ok"])[:iterations]
        # on Armijo failure at step k the device program (which cannot
        # raise) keeps iterating; record stats only for iterates the host
        # path would have reached (0..k), then fail the same way it does
        armijo_failed = not armijo_ok.all()
        n_good = int(np.argmax(~armijo_ok)) if armijo_failed else iterations
        for it in range(n_good + 1):
            self.stats.append(
                {
                    "iteration": it,
                    "fcn_norm": fn_hist[it].copy(),
                    "x_norm": xn_hist[it].copy(),
                }
            )
            logger.info(
                "newton iteration=%d max rel resid=%e",
                it,
                float(
                    (fn_hist[it] / np.maximum(xn_hist[it], 1e-300)).max()
                ),
            )
        if armijo_failed:
            raise RuntimeError("Armijo_ind exceeds limit")
        if not np.asarray(dev_info["converged"]).all():
            raise RuntimeError("number of maximum Newton iterations exceeded")
        info = {
            "iterations": iterations,
            "fcn_norm": fn_hist[iterations],
            "x_norm": xn_hist[iterations],
            "stats": self.stats,
            "krylov_iterations": np.asarray(
                dev_info["krylov_iterations"]
            )[:iterations],
            "armijo_factor": np.asarray(
                dev_info["armijo_factor"]
            )[:iterations],
            "limiter_scalef": np.asarray(
                dev_info["limiter_scalef"]
            )[:iterations],
        }
        return x, fcn, info

    @staticmethod
    def _save_checkpoint(checkpoint_dir, x, iteration):
        """atomic snapshot of the solver state

        On a multi-process mesh the iterate is not fully addressable on any
        one process: all-gather it, then let only process 0 write (every
        process computes identical host logic, so the snapshot is
        consistent with all of them).
        """
        import os

        import jax

        from ..parallel.mesh import host_value

        x_np = host_value(x)
        if jax.process_index() != 0:
            return
        os.makedirs(checkpoint_dir, exist_ok=True)
        path = os.path.join(checkpoint_dir, "incore_state.npz")
        tmp = path + ".tmp.npz"  # .npz suffix keeps np.savez from renaming
        np.savez(tmp, x=x_np, iteration=iteration)
        os.replace(tmp, path)

    @staticmethod
    def _load_checkpoint(checkpoint_dir):
        import os

        path = os.path.join(checkpoint_dir, "incore_state.npz")
        if not os.path.exists(path):
            return None
        with np.load(path) as data:
            return jnp.asarray(data["x"]), int(data["iteration"])

    def _armijo(self, x, fcn, increment, converged):
        """Armijo backtracking per (module, region)"""
        kernel = self.kernel
        fcn_norm = np.asarray(kernel.norm(fcn))
        factor = np.where(converged, 0.0, 1.0)
        for _ in range(self.armijo_max_ind + 1):
            prov = kernel.add(x, kernel.scale(increment, factor))
            prov_fcn = kernel.comp_fcn(prov)
            prov_norm = np.asarray(kernel.norm(prov_fcn))
            cond = (factor == 0.0) | (
                prov_norm <= (1.0 - self.armijo_alpha * factor) * fcn_norm
            )
            if cond.all():
                return prov, prov_fcn
            factor = np.where(cond, factor, 0.5 * factor)
        raise RuntimeError("Armijo_ind exceeds limit")

    def _gmres(self, x, fcn):
        """left-preconditioned GMRES (on-device basis, Saad alg. 9.4)"""
        kernel = self.kernel
        precond_data = kernel.precond_setup(x)

        if self._jit_gmres is not None:
            increment, its, _resid, _beta = self._jit_gmres(
                x, fcn, precond_data
            )
            return increment, int(its)

        r0 = kernel.precond_apply(precond_data, fcn)
        beta = np.asarray(kernel.norm(r0))
        basis = [kernel.scale(r0, -1.0 / beta)]
        w_list = []
        h_cols = []  # per column: (j+2, module, region) coefficients

        for j in range(self.krylov_max_dim):
            w = kernel.jvp(x, fcn, basis[j])
            w = kernel.precond_apply(precond_data, w)
            # modified Gram-Schmidt
            h_col = []
            for i in range(j + 1):
                hij = np.asarray(kernel.dot(w, basis[i]))
                w = kernel.add(w, kernel.scale(basis[i], -hij))
                h_col.append(hij)
            h_last = np.asarray(kernel.norm(w))
            h_col.append(h_last)
            h_cols.append(np.stack(h_col))  # (j+2, module, region)
            w = kernel.scale(w, 1.0 / h_last)
            w_list.append(w)

            coeff = _hessenberg_lstsq(beta, h_cols)
            # preconditioned residual = sum coeff_i w_i + r0... using the
            # Arnoldi relation keeps it cheap: resid = beta e1 - H y, evaluated
            # in the Krylov basis -- compute its norm directly from H
            resid_norm = _hessenberg_resid_norm(beta, h_cols, coeff)
            if (resid_norm < self.krylov_rel_tol * beta).all():
                break
            basis.append(w)

        # basis may hold one more vector than coefficient rows when the
        # dimension cap was hit without convergence
        res = kernel.lin_comb(basis[: len(coeff)], coeff)
        return res, j + 1


def _hessenberg_lstsq(beta, h_cols):
    """per-(module, region) least squares min ||beta e1 - H y||"""
    ncols = len(h_cols)
    nrows = ncols + 1
    module_cnt, region_cnt = beta.shape
    coeff = np.zeros((ncols, module_cnt, region_cnt))
    for m in range(module_cnt):
        for r in range(region_cnt):
            h_mat = np.zeros((nrows, ncols))
            for jcol, col in enumerate(h_cols):
                h_mat[: jcol + 2, jcol] = col[:, m, r]
            rhs = np.zeros(nrows)
            rhs[0] = beta[m, r]
            coeff[:, m, r] = np.linalg.lstsq(h_mat, rhs, rcond=None)[0]
    return coeff


def _hessenberg_resid_norm(beta, h_cols, coeff):
    """norm of beta e1 - H y per (module, region)"""
    ncols = len(h_cols)
    nrows = ncols + 1
    module_cnt, region_cnt = beta.shape
    out = np.zeros((module_cnt, region_cnt))
    for m in range(module_cnt):
        for r in range(region_cnt):
            h_mat = np.zeros((nrows, ncols))
            for jcol, col in enumerate(h_cols):
                h_mat[: jcol + 2, jcol] = col[:, m, r]
            rhs = np.zeros(nrows)
            rhs[0] = beta[m, r]
            out[m, r] = np.linalg.norm(rhs - h_mat @ coeff[:, m, r])
    return out

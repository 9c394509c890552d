"""irf_offline model state: 3D offline tracer transport integrated on device.

The reference's 3D workload (cime_pop) runs its forward model by submitting
POP to a batch scheduler and waiting
(/root/reference/nk_ooc/cime_pop/model_state.py:124-167); the circulation
only reaches the solver as IRF means consumed by the external gen_A
preconditioner tool.  This model family closes that loop natively: the same
POP-convention circulation fields drive an on-device IMEX year integration
(ops/transport3d stencils for advection + lateral diffusion, implicit
Crank-Nicolson vertical mixing via ops/imex), so a full 3D ocean-tracer
spin-up -- function evaluations included -- runs on the TPU with no
external model, scheduler round-trips, or file-staged restarts.

The preconditioner applies the SAME linearized rate operator matrix-free
(delta_t * M - I, BiCGSTAB with a probed-Jacobi preconditioner): operator
assembly into CSR, the reason the reference needs gen_A + SuperLU_DIST at
256 MPI ranks (model_state.py:317-337), disappears.
"""

from __future__ import annotations

import copy
import logging
import subprocess
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...core.state import ModelState as ModelStateBase
from ...ops.compute import cpu_device, default_accelerator, enable_persistent_cache
from ...ops.imex import imex_year
from ...ops.sparse import bicgstab
from ...ops.tridiag import pcr_solve
from ...ops.transport3d import (
    assemble_rate_fields,
    build_transport3d,
    interp_month,
    interp_transport_coef,
    mask_vmix_coeff,
    mean_transport_coef,
    transport_tend,
    transport_tridiag_bands,
    vmix_vertical_coeff,
)
from ...utils.helpers import class_name, strtobool
from ...utils.ncio import NCFile
from .tracer_module_state import SEC_PER_YEAR

HIST_TIME_SAMPLES = 13  # monthly-ish snapshots plus the year ends


class ModelState(ModelStateBase):
    """offline IRF-transport model state"""

    __array_priority__ = 100

    time_range = (0.0, SEC_PER_YEAR)
    _circ = None
    _circ_key = None
    _year_cache = {}

    def __init__(self, fname):
        if ModelState.model_config_obj is None:
            raise RuntimeError("ModelState.model_config_obj is None")
        if ModelState._circ_key != id(self.model_config_obj):
            self._set_class_vars(self.model_config_obj.modelinfo)
            ModelState._circ_key = id(self.model_config_obj)
        super().__init__(fname)

    # -- circulation ----------------------------------------------------------

    @staticmethod
    def _set_class_vars(modelinfo):
        """load the circulation (IRF mean) file and build device operators"""
        logger = logging.getLogger(__name__)
        irf_fname = modelinfo["irf_fname"]
        logger.debug('irf_fname="%s"', irf_fname)

        with NCFile(modelinfo["grid_vars_fname"]) as fptr:
            mask = np.asarray(fptr.var("region_mask")[:])

        fields = {}
        with NCFile(irf_fname) as fptr:
            for name in ["dz", "TAREA", "UET", "VNT", "WTT", "HDIFF_E",
                         "HDIFF_N", "VDC"]:
                fields[name] = (
                    np.asarray(fptr.var(name)[:]) if fptr.has_var(name) else None
                )
        if fields["dz"] is None or fields["TAREA"] is None:
            raise ValueError(f"{irf_fname} lacks dz/TAREA")

        adv_type = modelinfo.get("circ_adv_type") or "upwind3"
        coef = build_transport3d(
            mask,
            fields["dz"],
            fields["TAREA"],
            uet=fields["UET"],
            vnt=fields["VNT"],
            wtt=fields["WTT"],
            hdiff_e=fields["HDIFF_E"],
            hdiff_n=fields["HDIFF_N"],
            adv_type=adv_type,
        )
        nz, nlat, nlon = mask.shape
        if fields["VDC"] is not None:
            kv, dz_r = vmix_vertical_coeff(fields["VDC"], fields["dz"])
            kv = mask_vmix_coeff(kv, mask)
        else:
            dz_m = 1.0e-2 * fields["dz"]
            kv = jnp.zeros((nz - 1, nlat * nlon))
            dz_r = jnp.asarray(1.0 / dz_m)

        wet = (mask > 0).astype(np.float64)
        depth_edges = np.concatenate([[0.0], np.cumsum(fields["dz"])])
        ModelState._circ = {
            "shape": (nz, nlat, nlon),
            "mask": mask,
            "wet": wet,
            "dz": fields["dz"],
            "depth_mid_cm": 0.5 * (depth_edges[:-1] + depth_edges[1:]),
            "tarea": fields["TAREA"],
            "horiz_weights": fields["TAREA"] * wet[0],
            "coef": coef,
            "kv": kv,
            "dz_r": dz_r,
            "steps_per_year": int(modelinfo["steps_per_year"]),
        }
        ModelState._year_cache = {}
        enable_persistent_cache()

    def _create_tracer_module(self, tms_class, tracer_module_name, fname):
        circ = ModelState._circ
        return tms_class(
            tracer_module_name,
            fname,
            self.model_config_obj,
            grid_shape=circ["shape"],
            depth_mid_cm=circ["depth_mid_cm"],
        )

    def _dtype_and_device(self):
        modelinfo = self.model_config_obj.modelinfo
        dtype_name = modelinfo.get("comp_fcn_dtype") or "float64"
        if dtype_name == "float32":
            return jnp.float32, default_accelerator()
        if dtype_name != "float64":
            raise ValueError(f"unknown comp_fcn_dtype {dtype_name}")
        return jnp.float64, cpu_device()

    # -- rate fields from the module spec -------------------------------------

    def _module_rates(self, tracer_module):
        """(diag, src, couple): per-tracer implicit linear rates [1/s],
        explicit sources [tracer/s] (each (tracer_cnt, nz, nlat*nlon)), and
        the cross-tracer surface-flux coupling matrix (tracer_cnt,
        tracer_cnt) [1/s at the surface layer] or None when the module has
        no off-diagonal gas-exchange terms (the reference's d_SF_X_d_Y
        mechanism, nk_ooc/cime_pop/tracer_module_state.py:192-229)"""
        circ = ModelState._circ
        nz, nlat, nlon = circ["shape"]
        wet = circ["wet"].reshape(nz, nlat * nlon)
        return assemble_rate_fields(
            tracer_module.rate_specs(), wet, circ["dz"][0], SEC_PER_YEAR
        )

    # -- year integration ------------------------------------------------------

    def _year_fn(self, n_steps, dtype, coupled):
        """cached jitted one-segment integration; every field AND the time
        span are operands, so a single compile serves all hist segments"""
        key = (ModelState._circ_key, n_steps, dtype, coupled)
        if key not in ModelState._year_cache:
            nz, nlat, nlon = ModelState._circ["shape"]

            @jax.jit
            def run(y0, coef, kv, dz_r, diag, src, couple, wet_surf, t_span):
                def year_frac(t):
                    return jnp.mod(t / SEC_PER_YEAR, 1.0)

                def explicit_tend(t, y):
                    # seasonal circulation: face arrays carry a leading
                    # time axis and interpolate periodically; a steady
                    # pytree passes through untouched
                    c = interp_transport_coef(coef, year_frac(t))
                    y3 = y.reshape(y.shape[:-2] + (nz, nlat, nlon))
                    tend = transport_tend(c, y3).reshape(y.shape) + src
                    if couple is not None:
                        # cross-tracer surface gas exchange (d_SF_X_d_Y)
                        sflux = wet_surf * jnp.einsum(
                            "xy,yh->xh", couple, y[:, 0, :]
                        )
                        tend = tend.at[:, 0, :].add(sflux)
                    return tend

                if kv.ndim == 3:
                    vert_coeff = lambda t: interp_month(kv, year_frac(t))
                else:
                    vert_coeff = lambda t: kv

                return imex_year(
                    explicit_tend,
                    vert_coeff,
                    diag,
                    dz_r,
                    y0,
                    t_span,
                    n_steps,
                )

            ModelState._year_cache[key] = run
        return ModelState._year_cache[key]

    def _integrate_module(self, tracer_module, n_time):
        """(n_time, tracer_cnt, nz, nh) snapshots over the year"""
        circ = ModelState._circ
        dtype, device = self._dtype_and_device()
        nz, nlat, nlon = circ["shape"]
        nh = nlat * nlon
        diag, src, couple = self._module_rates(tracer_module)
        y = tracer_module.get_tracer_vals_all().reshape(-1, nz, nh)

        t0, t1 = self.time_range
        n_seg = n_time - 1
        steps_total = circ["steps_per_year"]
        seg_steps = max(1, int(np.ceil(steps_total / n_seg)))
        snaps = [y.copy()]
        with jax.default_device(device):
            operands = (
                jax.tree_util.tree_map(
                    lambda a: jnp.asarray(a, dtype), circ["coef"]
                ),
                jnp.asarray(circ["kv"], dtype),
                jnp.asarray(circ["dz_r"], dtype),
                jnp.asarray(diag, dtype),
                jnp.asarray(src, dtype),
                None if couple is None else jnp.asarray(couple, dtype),
                jnp.asarray(circ["wet"][0].reshape(-1), dtype),
            )
            y_dev = jnp.asarray(y, dtype)
            fn = self._year_fn(seg_steps, dtype, couple is not None)
            for seg in range(n_seg):
                seg_span = jnp.asarray(
                    [
                        t0 + (t1 - t0) * seg / n_seg,
                        t0 + (t1 - t0) * (seg + 1) / n_seg,
                    ],
                    dtype,
                )
                y_dev = fn(y_dev, *operands, seg_span)
                snaps.append(np.asarray(y_dev, np.float64))
        if not np.isfinite(snaps[-1]).all():
            raise RuntimeError(
                f"year integration diverged for tracer module "
                f"{tracer_module.name}; raise steps_per_year"
            )
        return np.stack(snaps)

    # -- comp_fcn --------------------------------------------------------------

    def comp_fcn(self, res_fname, solver_state, hist_fname=None):
        logger = logging.getLogger(__name__)
        logger.debug('res_fname="%s", hist_fname="%s"', res_fname, hist_fname)

        if solver_state is not None:
            fcn_complete_step = f"comp_fcn complete for {res_fname}"
            if solver_state.step_logged(fcn_complete_step):
                logger.debug('"%s" logged, returning result', fcn_complete_step)
                return type(self)(res_fname)
            logger.debug('"%s" not logged, proceeding', fcn_complete_step)

        circ = ModelState._circ
        nz, nlat, nlon = circ["shape"]
        n_time = HIST_TIME_SAMPLES if hist_fname is not None else 2
        t_eval = np.linspace(self.time_range[0], self.time_range[1], n_time)

        res_ms = copy.copy(self)
        res_ms.tracer_modules = [copy.copy(tm) for tm in self.tracer_modules]

        fptr_hist = self._hist_open(hist_fname)
        for ind, tracer_module in enumerate(res_ms.tracer_modules):
            if fptr_hist is not None:
                metadata = tracer_module.hist_vars_metadata()
                for md in metadata.values():
                    if "time" in md["dimensions"]:
                        md["attrs"]["cell_methods"] = "time: point"
                fptr_hist.create_vars(metadata)
            y0 = tracer_module.get_tracer_vals_all().reshape(-1, nz, nlat * nlon)
            snaps = self._integrate_module(tracer_module, n_time)
            if ind == 0 and fptr_hist is not None:
                fptr_hist.var("time")[:] = t_eval
                fptr_hist.var("dz")[:] = circ["dz"]
                fptr_hist.sync()
            if fptr_hist is not None:
                tracer_module.write_hist_vars(
                    fptr_hist,
                    np.moveaxis(snaps, 0, 1).reshape(
                        (-1, n_time, nz, nlat, nlon)
                    ),
                    circ["horiz_weights"],
                )
                fptr_hist.sync()
            tracer_module.set_tracer_vals_all(
                (snaps[-1] - y0).reshape((-1, nz, nlat, nlon)),
                reseat_vals=True,
            )
        if fptr_hist is not None:
            fptr_hist.close()

        caller = f"{class_name(self)}.comp_fcn"
        res_ms.comp_fcn_postprocess(res_fname, caller)

        if solver_state is not None:
            solver_state.log_step(fcn_complete_step)
            modelinfo = self.model_config_obj.modelinfo
            if strtobool(modelinfo["reinvoke"]):
                cmd = [modelinfo["invoker_script_fname"], "--resume"]
                logger.info('cmd="%s"', " ".join(cmd))
                subprocess.Popen(cmd)
                raise SystemExit

        return res_ms

    def _hist_open(self, hist_fname):
        if hist_fname is None:
            return None
        circ = ModelState._circ
        nz, nlat, nlon = circ["shape"]
        fptr_hist = NCFile(hist_fname, mode="w")
        fptr_hist.stamp_history(f"{__name__}._gen_hist")
        fptr_hist.create_dimensions_verify(
            {"time": None, "z_t": nz, "nlat": nlat, "nlon": nlon}
        )
        fptr_hist.create_vars(
            {
                "time": {
                    "dimensions": ("time",),
                    "attrs": {
                        "long_name": "time",
                        "units": "seconds since 0001-01-01",
                        "calendar": "noleap",
                    },
                },
                "dz": {
                    "dimensions": ("z_t",),
                    "attrs": {"long_name": "layer thickness", "units": "cm"},
                },
            }
        )
        return fptr_hist

    # -- preconditioner --------------------------------------------------------

    def _rate_operator_parts(self, tracer_module, dtype):
        """operands for the linearized year-rate operator of a module;
        a seasonal circulation contributes its ANNUAL MEAN (the reference's
        ncra-averaged operator) -- the preconditioner is an approximate
        inverse, so the time variation need not be carried there"""
        circ = ModelState._circ
        diag, _src, couple = self._module_rates(tracer_module)
        kv = circ["kv"]
        if kv.ndim == 3:
            kv = kv.mean(axis=0)
        return (
            jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, dtype),
                mean_transport_coef(circ["coef"]),
            ),
            jnp.asarray(kv, dtype),
            jnp.asarray(circ["dz_r"], dtype),
            jnp.asarray(diag, dtype),
            None if couple is None else jnp.asarray(couple, dtype),
            jnp.asarray(circ["wet"][0].reshape(-1), dtype),
        )

    def apply_precond_jacobian(self, precond_fname, res_fname, solver_state):
        """matrix-free solve of (delta_t * M - I) z = r per tracer module,
        M the linearized rate operator; the result is the correction z - r
        (the same contract as the cime_pop adapter's external solve)"""
        logger = logging.getLogger(__name__)
        logger.debug('precond_fname="%s", res_fname="%s"', precond_fname, res_fname)

        if solver_state is not None:
            fcn_complete_step = f"apply_precond_jacobian complete for {res_fname}"
            if solver_state.step_logged(fcn_complete_step):
                logger.debug('"%s" logged, returning result', fcn_complete_step)
                return type(self)(res_fname)
            logger.debug('"%s" not logged, proceeding', fcn_complete_step)

        circ = ModelState._circ
        nz, nlat, nlon = circ["shape"]
        dtype, device = self._dtype_and_device()

        res_ms = copy.copy(self)
        res_ms.tracer_modules = [copy.copy(tm) for tm in self.tracer_modules]
        with jax.default_device(device):
            for tracer_module in res_ms.tracer_modules:
                operands = self._rate_operator_parts(tracer_module, dtype)
                rhs = tracer_module.get_tracer_vals_all().reshape(
                    -1, nz, nlat * nlon
                )
                sol, ok = _precond_solve(
                    jnp.asarray(rhs, dtype), *operands, shape=(nz, nlat, nlon)
                )
                if not bool(ok.all()):
                    raise RuntimeError(
                        f"preconditioner BiCGSTAB failed to converge for "
                        f"tracer module {tracer_module.name}"
                    )
                tracer_module.set_tracer_vals_all(
                    np.asarray(sol, np.float64).reshape((-1, nz, nlat, nlon)),
                    reseat_vals=True,
                )

        res_ms -= self

        # dump BEFORE logging completion: the step log is a write-ahead log,
        # so the result file must be durable when the step reads as done
        res = res_ms.dump(res_fname, f"{class_name(self)}.apply_precond_jacobian")
        if solver_state is not None:
            solver_state.log_step(fcn_complete_step)
        return res


@partial(jax.jit, static_argnames=("shape",))
def _precond_solve(rhs, coef, kv, dz_r, diag, couple, wet_surf, shape):
    """solve (delta_t * M - I) z = r for each tracer (batched over the
    leading axis); returns (z, converged_flags)

    BiCGSTAB preconditioned by the EXACT inverse of the vertical-line block
    of delta_t * M - I: per-column vmix + local-rate tridiagonal PLUS the
    same-column tridiagonal part of the transport stencil (the full operator
    diagonal and the vertical-advection couplings,
    ops.transport3d.transport_tridiag_bands) -- a PCR solve, so both the
    stiff direction (vmix rates up to delta_t*kappa/dz^2 ~ 1e5) and the
    O(delta_t * rate ~ 10) diagonal mass of the lateral transport are
    removed from the Krylov iteration, which only has to damp the strictly
    lateral couplings.

    couple (tracer_cnt, tracer_cnt) surface gas-exchange coupling, or None:
    when present the tracers form ONE linear system (solved jointly, same
    per-tracer vertical-block preconditioner) instead of independent ones.
    """
    nz, nlat, nlon = shape
    nh = nlat * nlon
    delta_t = SEC_PER_YEAR

    # vertical-line bands of delta_t * (V + tridiag(T)) - I, (nz, nh) for
    # pcr_solve
    up = kv * dz_r[:-1, None]
    lo = kv * dz_r[1:, None]
    pad = jnp.zeros((1, nh), kv.dtype)
    lo_t, diag_t, up_t = (
        b.reshape(nz, nh) for b in transport_tridiag_bands(coef)
    )
    du = delta_t * (jnp.concatenate([up, pad], axis=0) + up_t)
    dl = delta_t * (jnp.concatenate([pad, lo], axis=0) + lo_t)
    dmain = delta_t * (-(jnp.concatenate([up, pad], axis=0)
                         + jnp.concatenate([pad, lo], axis=0))
                       + diag_t + diag) - 1.0

    def vert_solve(v3):
        """per-tracer vertical-block inverse; v3 (tracer_cnt, nz, nh)"""
        return jax.vmap(
            lambda d, r: pcr_solve(dl.T, d.T, du.T, r.T).T
        )(dmain, v3)

    if couple is None:

        def one_tracer(r, d, dm):
            def matvec(v):
                v2 = v.reshape(nz, nh)
                out = delta_t * _rate_single(v2, coef, kv, dz_r, d, shape) - v2
                return out.reshape(-1)

            def precond(v):
                return pcr_solve(dl.T, dm.T, du.T, v.reshape(nz, nh).T).T.reshape(-1)

            x, ok, _k = bicgstab(
                matvec,
                r.reshape(-1),
                precond=precond,
                rtol=1.0e-10,
                max_iter=50 * nh,
            )
            return x.reshape(nz, nh), ok

        return jax.vmap(one_tracer)(rhs, diag, dmain)

    # coupled: one system over all tracers of the module
    def matvec_joint(v):
        v3 = v.reshape(rhs.shape)
        out = jax.vmap(
            lambda vv, d: _rate_single(vv, coef, kv, dz_r, d, shape)
        )(v3, diag)
        sflux = wet_surf * jnp.einsum("xy,yh->xh", couple, v3[:, 0, :])
        out = out.at[:, 0, :].add(sflux)
        return (delta_t * out - v3).reshape(-1)

    x, ok, _k = bicgstab(
        matvec_joint,
        rhs.reshape(-1),
        precond=lambda v: vert_solve(v.reshape(rhs.shape)).reshape(-1),
        rtol=1.0e-10,
        max_iter=50 * nh * rhs.shape[0],
    )
    return x.reshape(rhs.shape), jnp.broadcast_to(ok, (rhs.shape[0],))


def _rate_single(v2, coef, kv, dz_r, diag2, shape):
    """linearized rate operator M v for one tracer; v2/diag2 (nz, nh)"""
    nz, nlat, nlon = shape
    tend = transport_tend(coef, v2.reshape(nz, nlat, nlon)).reshape(nz, -1)
    flux = kv * (v2[1:, :] - v2[:-1, :])
    pad = jnp.zeros((1, v2.shape[-1]), v2.dtype)
    vmix = dz_r[:, None] * (
        jnp.concatenate([flux, pad], axis=0) - jnp.concatenate([pad, flux], axis=0)
    )
    return tend + vmix + diag2 * v2

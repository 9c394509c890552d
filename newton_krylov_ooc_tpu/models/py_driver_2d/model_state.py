"""py_driver_2d model state: 2D advection-diffusion tracer transport, one
model year per function evaluation via the JAX Radau IIA(5) kernel with exact
(jacfwd) Jacobians -- the TPU-native analog of the reference's scipy Radau
with hand-assembled sparse Jacobians (nk_ooc/py_driver_2d/model_state.py:94-114).
"""

from __future__ import annotations

import copy
import logging
import subprocess

import jax
import jax.numpy as jnp
import numpy as np

from ...core.spatial_axis import spatial_axis_from_file
from ...core.state import ModelState as ModelStateBase
from ...ops.compute import cpu_device, default_accelerator, enable_persistent_cache
from ...ops.radau import radau5_integrate
from ...utils.helpers import class_name, strtobool
from ...utils.ncio import NCFile
from . import physics

HIST_TIME_SAMPLES = 61
SEC_PER_YEAR = physics.SEC_PER_YEAR


class ModelState(ModelStateBase):
    """py_driver_2d model state"""

    __array_priority__ = 100

    time_range = (0.0, SEC_PER_YEAR)
    depth = None
    ypos = None
    _grids = {}
    _integrate_cache = {}
    _jac_cache = {}

    def __init__(self, fname):
        if ModelState.model_config_obj is None:
            raise RuntimeError("ModelState.model_config_obj is None")
        if ModelState.depth is None:
            self._set_class_vars(self.model_config_obj.modelinfo)
        super().__init__(fname)

    @staticmethod
    def _set_class_vars(modelinfo):
        ModelState.depth = spatial_axis_from_file(
            fname=modelinfo["grid_vars_fname"],
            axisname=modelinfo["depth_axisname"],
        )
        ModelState.ypos = spatial_axis_from_file(
            fname=modelinfo["grid_vars_fname"],
            axisname=modelinfo["ypos_axisname"],
        )
        enable_persistent_cache()

    def _create_tracer_module(self, tms_class, tracer_module_name, fname):
        return tms_class(
            tracer_module_name,
            fname,
            self.model_config_obj,
            depth=self.depth,
            ypos=self.ypos,
        )

    # -- integration machinery ----------------------------------------------------

    def _dtype_and_device(self):
        modelinfo = self.model_config_obj.modelinfo
        dtype_name = modelinfo.get("comp_fcn_dtype") or "float64"
        if dtype_name == "float32":
            return jnp.float32, default_accelerator()
        if dtype_name != "float64":
            raise ValueError(f"unknown comp_fcn_dtype {dtype_name}")
        return jnp.float64, cpu_device()

    def _grid(self, dtype):
        key = (id(self.model_config_obj), dtype)
        if key not in ModelState._grids:
            ModelState._grids[key] = physics.make_grid(
                self.depth, self.ypos, self.model_config_obj.modelinfo, dtype
            )
        return ModelState._grids[key]

    def _integration_fn(self, tracer_module, n_time):
        dtype, _device = self._dtype_and_device()
        grid = self._grid(dtype)
        static_args = tracer_module.tend_static_args()
        key = (type(tracer_module), grid.depth_mid.shape, static_args, n_time, dtype)
        if key not in ModelState._integrate_cache:
            t0, t1 = self.time_range
            t_eval = jnp.linspace(t0, t1, n_time, dtype=dtype)
            # the reference integrates at atol=rtol=1e-6; running somewhat
            # tighter keeps the combined our-error + reference-error within
            # the committed baselines' 1e-6/1e-3 comparison tolerances.
            # float32 can't meet 2e-7 -- the accelerated dtype runs at the
            # reference's own tolerance instead
            tol = 2.0e-7 if dtype == jnp.float64 else 1.0e-5
            max_step = (t1 - t0) * 0.01
            # precompute the time-invariant lateral Jacobian before tracing
            physics.lateral_jac_const(grid)

            use_bands = hasattr(type(tracer_module), "build_jac_bands")
            perm = inv = None
            if use_bands:
                physics.lateral_bands_const(grid)
                # modules with cross-tracer coupling declare a state
                # permutation (band_info) that makes their Jacobian banded
                if hasattr(type(tracer_module), "band_info"):
                    bandwidth, perm_np = type(tracer_module).band_info(grid)
                    perm = jnp.asarray(perm_np)
                    inv = jnp.asarray(np.argsort(perm_np))
                else:
                    bandwidth = grid.ypos_mid.shape[0]

            def integrate(y0, params):
                cls = type(tracer_module)
                fun = cls.build_tend(grid, static_args, params)
                kwargs = {}
                if use_bands:
                    kwargs["jac_bands"] = cls.build_jac_bands(
                        grid, static_args, params
                    )
                    kwargs["bandwidth"] = bandwidth
                    if perm is not None:
                        # integrate in the banded (permuted) state ordering;
                        # jac_bands receives the permuted state directly
                        tracer_major_fun = fun

                        def fun(t, y_banded):  # noqa: F811
                            return tracer_major_fun(t, y_banded[inv])[perm]

                        y0 = y0[perm]
                else:
                    kwargs["jac"] = cls.build_jac(grid, static_args, params)
                ys, info = radau5_integrate(
                    fun,
                    (t0, t1),
                    y0,
                    t_eval,
                    rtol=tol,
                    atol=tol,
                    max_step=max_step,
                    **kwargs,
                )
                if perm is not None:
                    ys = ys[:, inv]
                return ys, info["success"]

            ModelState._integrate_cache[key] = jax.jit(integrate)
        return ModelState._integrate_cache[key]

    def _jac_builder(self, tracer_module):
        """cached jitted dense-Jacobian evaluator for a module's tendency"""
        dtype, device = self._dtype_and_device()
        grid = self._grid(dtype)
        static_args = tracer_module.tend_static_args()
        key = (type(tracer_module), grid.depth_mid.shape, static_args, dtype)
        if key not in ModelState._jac_cache:
            params = jnp.asarray(tracer_module.tend_params(), dtype)
            physics.lateral_jac_const(grid)
            jac_fn = type(tracer_module).build_jac(grid, static_args, params)
            jitted = jax.jit(jac_fn)

            def builder(t, y):
                with jax.default_device(device):
                    return np.asarray(
                        jitted(jnp.asarray(t, dtype), jnp.asarray(y, dtype)),
                        dtype=np.float64,
                    )

            ModelState._jac_cache[key] = builder
        return ModelState._jac_cache[key]

    def _run_module(self, tracer_module, n_time):
        dtype, device = self._dtype_and_device()
        y0 = tracer_module.get_tracer_vals_all().reshape(-1)
        fn = self._integration_fn(tracer_module, n_time)
        with jax.default_device(device):
            ys, success = fn(
                jnp.asarray(y0, dtype),
                jnp.asarray(tracer_module.tend_params(), dtype),
            )
        if not bool(success):
            raise RuntimeError(
                f"Radau integration failed for tracer module {tracer_module.name}"
            )
        return np.asarray(ys, dtype=np.float64)

    # -- comp_fcn -------------------------------------------------------------------

    def comp_fcn(self, res_fname, solver_state, hist_fname=None):
        logger = logging.getLogger(__name__)
        logger.debug('res_fname="%s", hist_fname="%s"', res_fname, hist_fname)

        if solver_state is not None:
            fcn_complete_step = f"comp_fcn complete for {res_fname}"
            if solver_state.step_logged(fcn_complete_step):
                logger.debug('"%s" logged, returning result', fcn_complete_step)
                return type(self)(res_fname)
            logger.debug('"%s" not logged, proceeding', fcn_complete_step)

        n_time = HIST_TIME_SAMPLES if hist_fname is not None else 2
        t_eval = np.linspace(self.time_range[0], self.time_range[1], n_time)

        res_ms = copy.copy(self)
        res_ms.tracer_modules = [copy.copy(tm) for tm in self.tracer_modules]

        fptr_hist = self._hist_open(hist_fname)
        self._hist_def_vars_tracer_module_independent(fptr_hist)

        for ind, tracer_module in enumerate(res_ms.tracer_modules):
            self._hist_def_vars(tracer_module, fptr_hist)
            y0 = tracer_module.get_tracer_vals_all().reshape(-1)
            ys = self._run_module(tracer_module, n_time)
            if ind == 0:
                self._hist_write_tracer_module_independent(t_eval, fptr_hist)
            if fptr_hist is not None:
                shape = (
                    tracer_module.tracer_cnt,
                    len(self.depth),
                    len(self.ypos),
                    n_time,
                )
                tracer_module.write_hist_vars(
                    fptr_hist, np.moveaxis(ys, 0, -1).reshape(shape)
                )
                fptr_hist.sync()
            shape = (tracer_module.tracer_cnt, len(self.depth), len(self.ypos))
            tracer_module.set_tracer_vals_all(
                (ys[-1] - y0).reshape(shape), reseat_vals=True
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

    # -- history file ------------------------------------------------------------

    def _hist_open(self, hist_fname):
        if hist_fname is None:
            return None
        fptr_hist = NCFile(hist_fname, mode="w")
        fptr_hist.stamp_history(f"{__name__}._gen_hist")
        dimensions = {"time": None}
        for axis in [self.depth, self.ypos]:
            dimensions.update(axis.dump_dimensions())
        fptr_hist.create_dimensions_verify(dimensions)
        return fptr_hist

    def _hist_def_vars_tracer_module_independent(self, fptr_hist):
        if fptr_hist is None:
            return
        depth_name = self.depth.axisname
        depth_edges = self.depth.dump_names["edges"]
        ypos_name = self.ypos.axisname
        ypos_edges = self.ypos.dump_names["edges"]

        hist_vars_metadata = {
            "time": {
                "dimensions": ("time",),
                "attrs": {
                    "long_name": "time",
                    "units": "seconds since 0001-01-01",
                    "calendar": "noleap",
                },
            },
        }
        for axis in [self.depth, self.ypos]:
            hist_vars_metadata.update(axis.dump_vars_metadata())
        hist_vars_metadata["stream"] = {
            "dimensions": (depth_edges, ypos_edges),
            "attrs": {"long_name": "velocity streamfunction", "units": "m^2 / s"},
        }
        hist_vars_metadata["vvel"] = {
            "dimensions": (depth_name, ypos_edges),
            "attrs": {"long_name": "velocity in ypos direction", "units": "m / s"},
        }
        hist_vars_metadata["wvel"] = {
            "dimensions": (depth_edges, ypos_name),
            "attrs": {"long_name": "velocity in depth direction", "units": "m / s"},
        }
        hist_vars_metadata["horiz_mixing_coeff"] = {
            "dimensions": (depth_name, ypos_edges),
            "attrs": {
                "long_name": "horizontal mixing coefficient",
                "units": "m^2 / s",
            },
        }
        hist_vars_metadata["bldepth"] = {
            "dimensions": ("time", ypos_name),
            "attrs": {"long_name": "boundary layer depth", "units": "m"},
        }
        hist_vars_metadata["vert_mixing_coeff"] = {
            "dimensions": ("time", depth_edges, ypos_name),
            "attrs": {
                "long_name": "vertical mixing coefficient",
                "units": "m^2 / s",
            },
        }
        for varname, metadata in hist_vars_metadata.items():
            if varname != "time" and "time" in metadata["dimensions"]:
                metadata["attrs"]["cell_methods"] = "time: point"
        fptr_hist.create_vars(hist_vars_metadata)
        fptr_hist.sync()

    @staticmethod
    def _hist_def_vars(tracer_module, fptr_hist):
        if fptr_hist is None:
            return
        hist_vars_metadata = tracer_module.hist_vars_metadata()
        for metadata in hist_vars_metadata.values():
            if "time" in metadata["dimensions"]:
                metadata["attrs"]["cell_methods"] = "time: point"
        fptr_hist.create_vars(hist_vars_metadata)
        fptr_hist.sync()

    def _hist_write_tracer_module_independent(self, t_eval, fptr_hist):
        if fptr_hist is None:
            return
        fptr_hist.var("time")[:] = t_eval
        for axis in [self.depth, self.ypos]:
            axis.dump_write(fptr_hist)

        modelinfo = self.model_config_obj.modelinfo
        stream, vvel, wvel = physics.gen_vel_field(
            self.depth, self.ypos, float(modelinfo["max_abs_vvel"])
        )
        fptr_hist.var("stream")[:] = stream
        fptr_hist.var("vvel")[:] = vvel
        fptr_hist.var("wvel")[:] = wvel

        hmc = physics.comp_horiz_mix_coeff(
            self.depth, self.ypos, vvel, float(modelinfo["horiz_mix_coeff"])
        )
        ny = len(self.ypos)
        hmix = np.empty((len(self.depth), ny + 1))
        hmix[:, 1:-1] = hmc * self.ypos.delta_mid
        hmix[:, 0] = hmix[:, 1]
        hmix[:, -1] = hmix[:, -2]
        fptr_hist.var("horiz_mixing_coeff")[:] = hmix

        nz = len(self.depth)
        bld = np.empty((len(t_eval), ny))
        vmix = np.empty((len(t_eval), nz + 1, ny))
        for tind, time in enumerate(t_eval):
            bld[tind, :] = physics.bldepth_np(self.ypos, time)
            kv = physics.vert_mixing_coeff_np(self.depth, self.ypos, wvel, time)
            vmix[tind, 1:-1, :] = kv * self.depth.delta_mid[:, None]
            vmix[tind, 0, :] = vmix[tind, 1, :]
            vmix[tind, -1, :] = vmix[tind, -2, :]
        fptr_hist.var("bldepth")[:] = bld
        fptr_hist.var("vert_mixing_coeff")[:] = vmix
        fptr_hist.sync()

    # -- preconditioner -------------------------------------------------------------

    def apply_precond_jacobian(self, precond_fname, res_fname, solver_state):
        logger = logging.getLogger(__name__)
        logger.debug('precond_fname="%s", res_fname="%s"', precond_fname, res_fname)

        if solver_state is not None:
            fcn_complete_step = f"apply_precond_jacobian complete for {res_fname}"
            if solver_state.step_logged(fcn_complete_step):
                logger.debug('"%s" logged, returning result', fcn_complete_step)
                return type(self)(res_fname)
            logger.debug('"%s" not logged, proceeding', fcn_complete_step)

        res_ms = copy.deepcopy(self)

        with NCFile(precond_fname) as fptr:
            for ind, tracer_module in enumerate(self.tracer_modules):
                tracer_module.apply_precond_jacobian(
                    self.time_range,
                    res_ms.tracer_modules[ind],
                    self._jac_builder(tracer_module),
                    fptr,
                )

        # dump BEFORE logging completion: the step log is a write-ahead log,
        # so the result file must be durable when the step reads as done
        caller = f"{class_name(self)}.apply_precond_jacobian"
        res = res_ms.dump(res_fname, caller)
        if solver_state is not None:
            solver_state.log_step(fcn_complete_step)
        return res

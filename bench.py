#!/usr/bin/env python
"""framework benchmark: py_driver_2d iage function-evaluation throughput.

The reference's hot path is one forward model run per function evaluation:
scipy's Radau integrating the 2D advection-diffusion model one year at
atol=rtol=1e-6 with a sparse analytic Jacobian
(nk_ooc/py_driver_2d/model_state.py:94-114).  This benchmark times

  * the CPU baseline: a faithful scipy reproduction of that hot path
    (same RHS, same sparse Jacobian, same solver settings), and
  * this framework's accelerator fast path: the fused IMEX year kernel
    (float32, hourly steps, one lax.scan) on the default device,

and prints one JSON line with the speedup.  Accuracy is cross-checked: the
fast path's year-end state is compared against the scipy result.

Resilience contract (the driver records the last ~2000 stdout chars and
parses the LAST JSON line):

  * the child prints the flagship JSON line IMMEDIATELY after the primary
    measurement, then after every secondary section an enriched line
    FOLLOWED by a compact (<1800 char) summary line, so a kill at ANY
    point past the primary leaves a parseable record that FITS the
    driver's tail window (the round-4 enriched record outgrew it);
  * the watchdog parent streams each JSON line through to stdout the
    moment it arrives (noise goes to stderr), so even a kill of the PARENT
    leaves the newest record as the last stdout line;
  * every secondary section checks one hard deadline (NK_BENCH_DEADLINE_S,
    measured from child start) against its own cost estimate before
    running, and the per-section wall-clocks are emitted in
    bench_section_seconds so the estimates are tuned on data.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.realpath(__file__)))

import numpy as np

GRID_NZ = int(os.environ.get("NK_BENCH_NZ", "40"))
GRID_NY = int(os.environ.get("NK_BENCH_NY", "50"))
N_STEPS = int(os.environ.get("NK_BENCH_STEPS", "8760"))
# scipy baseline span as a fraction of the year (1.0 = exact, no extrapolation)
CPU_SPAN_FRAC = float(os.environ.get("NK_BENCH_CPU_SPAN", "1.0"))
REPS = 3

# hard internal deadline for the CHILD, from process start: sections are
# skipped (never killed mid-flight) once their estimated cost no longer
# fits.  The default keeps accelerator child + a primary-only CPU fallback
# comfortably inside a ~2000 s driver budget.
PROC_T0 = time.time()
# 1350 keeps the child inside the 1400 s watchdog kill and the ~2000 s
# driver budget while fitting the family/seasonal re-measurements when
# the big programs cache-hit; the compact-final-line contract keeps any
# overrun kill harmless (the last stdout line is always parseable)
DEADLINE_S = float(os.environ.get("NK_BENCH_DEADLINE_S", "1350"))


def _left():
    """seconds of deadline budget remaining"""
    return DEADLINE_S - (time.time() - PROC_T0)


def stable_step_count(ypos, base_steps):
    """steps/year so the explicit (Heun) lateral half stays comfortably
    inside its stability bounds: dt <= 0.8 * min(dy^2/(2K), dy/v)"""
    year = 365.0 * 86400.0
    dy = float(np.min(ypos.delta))
    dt_max = 0.8 * min(dy * dy / (2.0 * 1000.0), dy / 0.1)
    return max(int(base_steps), int(np.ceil(year / dt_max)))


def build_axes(nz=None, ny=None):
    from newton_krylov_ooc_tpu.core.spatial_axis import (
        spatial_axis_defn_dict,
        spatial_axis_from_defn_dict,
    )

    depth = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            nlevs=GRID_NZ if nz is None else nz,
            edge_end=4000.0,
            delta_ratio_max=19.0,
        )
    )
    ypos = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            axisname="ypos",
            nlevs=GRID_NY if ny is None else ny,
            edge_start=0.0,
            edge_end=50.0e5,
            delta_ratio_max=1.0,
            units="m",
        )
    )
    return depth, ypos


def scipy_baseline(depth, ypos, y0, year):
    """reference hot path: scipy Radau, sparse analytic Jacobian"""
    from scipy import integrate, sparse

    from newton_krylov_ooc_tpu.models.py_driver_2d import physics
    from newton_krylov_ooc_tpu.models.py_driver_2d.iage import (
        SURF_SLOW_FACTOR,
        surf_restore_rate,
    )

    nz, ny = len(depth), len(ypos)
    n = nz * ny
    rate = surf_restore_rate(depth)
    stream, vvel, wvel = physics.gen_vel_field(depth, ypos, 0.1)
    hmc = physics.comp_horiz_mix_coeff(depth, ypos, vvel, 1000.0)
    dz_r = depth.delta_r
    dy_r = ypos.delta_r

    def tend(t, yflat):
        y = yflat.reshape(2, nz, ny)
        kv = physics.vert_mixing_coeff_np(depth, ypos, wvel, t)
        out = np.empty_like(y)
        for k in range(2):
            v = y[k]
            wy = np.zeros((nz, ny + 1))
            wy[:, 1:-1] = 0.5 * (v[:, 1:] + v[:, :-1]) * vvel[:, 1:-1]
            res = dy_r * (wy[:, :-1] - wy[:, 1:])
            wz = np.zeros((nz + 1, ny))
            wz[1:-1, :] = 0.5 * (v[1:, :] + v[:-1, :]) * wvel[1:-1, :]
            res += dz_r[:, None] * (wz[1:, :] - wz[:-1, :])
            hflux = np.zeros((nz, ny + 1))
            hflux[:, 1:-1] = hmc * (v[:, 1:] - v[:, :-1])
            res += dy_r * (hflux[:, 1:] - hflux[:, :-1])
            vflux = np.zeros((nz + 1, ny))
            vflux[1:-1, :] = kv * (v[1:, :] - v[:-1, :])
            res += dz_r[:, None] * (vflux[1:, :] - vflux[:-1, :])
            out[k] = res
        out[0, 0, :] -= rate * y[0, 0, :]
        out[1, 0, :] -= SURF_SLOW_FACTOR * rate * y[1, 0, :]
        return (out + 1.0 / year).reshape(-1)

    # sparse Jacobian, assembled like the reference's process Jacobians
    # (pure numpy: must not touch the jax TPU client from the baseline path)
    grid = physics.make_grid(
        depth, ypos, {"max_abs_vvel": "0.1", "horiz_mix_coeff": "1000.0"}
    )
    lat = physics.lateral_jac_const(grid)  # numpy, trace-free
    cell = np.arange(n).reshape(nz, ny)
    dz_r_cell = np.broadcast_to(dz_r[:, None], (nz, ny)).reshape(-1)

    def jac(t, yflat):
        kv = physics.vert_mixing_coeff_np(depth, ypos, wvel, t)
        jt = lat.copy()
        kvf = kv.reshape(-1)
        rows_up = cell[:-1, :].reshape(-1)
        cols_up = cell[1:, :].reshape(-1)
        rows_lo = cell[1:, :].reshape(-1)
        cols_lo = cell[:-1, :].reshape(-1)
        up_vals = dz_r_cell[rows_up] * kvf
        lo_vals = dz_r_cell[rows_lo] * kvf
        np.add.at(jt, (rows_up, cols_up), up_vals)
        np.add.at(jt, (rows_lo, cols_lo), lo_vals)
        np.add.at(jt, (rows_up, rows_up), -up_vals)
        np.add.at(jt, (rows_lo, rows_lo), -lo_vals)
        j0 = jt.copy()
        j0[np.arange(ny), np.arange(ny)] -= rate
        j1 = jt.copy()
        j1[np.arange(ny), np.arange(ny)] -= SURF_SLOW_FACTOR * rate
        return sparse.block_diag(
            [sparse.csr_matrix(j0), sparse.csr_matrix(j1)], "csr"
        )

    span = CPU_SPAN_FRAC * year
    jac_sparsity = jac(0.0, y0.reshape(-1))
    jac_sparsity.data[:] = 1.0
    start = time.time()
    sol = integrate.solve_ivp(
        tend,
        (0.0, span),
        y0.reshape(-1),
        "Radau",
        t_eval=np.array([0.0, span]),
        max_step=0.01 * year,
        atol=1.0e-6,
        rtol=1.0e-6,
        jac=jac,
        jac_sparsity=jac_sparsity,
    )
    elapsed = (time.time() - start) / CPU_SPAN_FRAC  # scale to a full year
    return elapsed, sol


# last driver-captured measurement of the scipy baseline on this host
# (BENCH_r03.json) -- the flagship record's placeholder until this run's
# own baseline subprocess reports in; the final record always overwrites
# it with (and labels) the fresher number when the subprocess succeeds
_PRIOR_CPU_BASELINE_S = 125.824


def _cpu_baseline_child():
    """subprocess entry: the scipy reference measurement, jax-free.

    The baseline is pure numpy/scipy, so it runs CONCURRENTLY with the
    accelerator sections in its own process (no TPU client, no GIL
    contention with device dispatch) instead of spending ~2 minutes of
    the deadline budget inline.  The headline figure is PROCESS-CPU
    seconds, not wall-clock: on this few-core host the niced child is
    descheduled whenever the main process needs the core, so its wall
    time overstates the reference cost ~3x (measured 371 s wall vs
    ~126 s on an idle core); CPU seconds are the dedicated-core
    equivalent and agree with wall time when the machine is idle (the
    scipy Radau path is effectively single-threaded at this size).
    Both figures are reported."""
    year = 365.0 * 86400.0
    depth, ypos = build_axes()
    column = np.interp(depth.mid, [55.0, 200.0], [0.0, 2.0])
    y0 = np.broadcast_to(column[:, None], (len(depth), len(ypos)))
    y0 = np.stack([y0, y0]).astype(np.float64)
    t_cpu0 = time.process_time()
    wall_time, _sol = scipy_baseline(depth, ypos, y0, year)
    cpu_time = (time.process_time() - t_cpu0) / CPU_SPAN_FRAC
    print(
        json.dumps(
            {
                "baseline_cpu_seconds": round(cpu_time, 3),
                "baseline_cpu_wall_seconds": round(wall_time, 3),
            }
        ),
        flush=True,
    )


def _start_cpu_baseline():
    """launch the scipy-baseline subprocess at nice 19; returns Popen.

    This host has few cores (possibly one), so the child must never
    steal cycles from the main process's tracing/dispatch work: at the
    lowest priority it runs in the long block_until_ready windows where
    the main process is device-bound and otherwise idle.  The priority
    drop rides the `nice` wrapper binary rather than preexec_fn, which
    is fork-unsafe once any thread exists (jax/grpc threads would
    qualify if this launch ever moved after backend init)."""
    import subprocess

    env = dict(os.environ, NK_BENCH_CPU_BASELINE="1")
    env.pop("NK_BENCH_CHILD", None)
    return subprocess.Popen(
        ["nice", "-n", "19", sys.executable, os.path.realpath(__file__)],
        env=env,
        stdout=subprocess.PIPE,
    )


def _harvest_cpu_baseline(proc, timeout_s):
    """collect the baseline subprocess result.  timeout_s <= 0 is a
    non-blocking poll that leaves an unfinished child RUNNING (the
    caller retries later); a positive timeout waits, then kills on
    expiry.  Returns the parsed result dict (baseline_cpu_seconds +
    baseline_cpu_wall_seconds) or None."""
    import subprocess

    if proc is None:
        return None
    try:
        if timeout_s <= 0 and proc.poll() is None:
            return None
        out, _ = proc.communicate(timeout=max(0.1, timeout_s))
        for line in out.decode(errors="replace").splitlines():
            try:
                obj = json.loads(line)
            except ValueError:
                continue
            if isinstance(obj, dict) and "baseline_cpu_seconds" in obj:
                return obj
    except subprocess.TimeoutExpired:
        proc.kill()
    except Exception:  # noqa: BLE001 -- baseline is best-effort here
        proc.kill()
    return None


def _run_with_watchdog():
    """driver resilience: a dead/hung accelerator tunnel can block the jax
    backend init (or any later dispatch) indefinitely, and a hung call into
    the runtime cannot be recovered in-process.  So the measurement runs in
    a watchdogged CHILD whose stdout is streamed line-by-line: every
    parseable JSON record is forwarded to stdout the moment it arrives
    (noise goes to stderr), so a timeout kill -- of the child by this
    watchdog, or of this whole process by the driver -- still leaves the
    newest record as the last stdout line.  Only if the accelerator child
    dies with NO record at all is the measurement rerun forced onto the CPU
    backend (primary metric only), inside whatever budget remains.
    """
    import subprocess
    import threading

    total_s = float(os.environ.get("NK_BENCH_TOTAL_S", "1800"))
    timeout_s = float(os.environ.get("NK_BENCH_WATCHDOG_S", "1400"))
    t0 = time.time()
    errs = []
    for force_cpu in (False, True):
        label = "cpu fallback" if force_cpu else "accelerator session"
        env = dict(os.environ, NK_BENCH_CHILD="1")
        if force_cpu:
            env["NK_BENCH_FORCE_CPU"] = "; ".join(errs) or "1"
            env["NK_BENCH_EXTRA"] = "0"  # primary metric only
            budget = max(120.0, total_s - (time.time() - t0))
        else:
            # leave room after a (killed) accelerator child for the
            # primary-only CPU fallback, but never go below a floor that
            # covers backend init + the primary measurement
            budget = max(180.0, min(timeout_s, total_s - 300.0))
        proc = subprocess.Popen(
            [sys.executable, os.path.realpath(__file__)],
            env=env,
            stdout=subprocess.PIPE,
        )
        timer = threading.Timer(budget, proc.kill)
        timer.start()
        got_record = False
        try:
            for raw in proc.stdout:
                line = raw.decode(errors="replace").rstrip("\n")
                try:
                    obj = json.loads(line)
                except ValueError:
                    print(line, file=sys.stderr)
                    continue
                if isinstance(obj, dict) and "metric" in obj:
                    got_record = True
                    print(line, flush=True)
                else:
                    print(line, file=sys.stderr)
            rc = proc.wait()
        finally:
            timer.cancel()
        if got_record:
            return  # newest record is already the last stdout line
        errs.append(
            f"{label} "
            + ("killed at" if rc < 0 else f"exited rc={rc} after")
            + f" {time.time() - t0:.0f}s with no JSON record"
        )
    print(
        json.dumps(
            {
                "metric": "py_driver_2d iage fn-eval wall-clock",
                "value": None,
                "unit": "seconds",
                "vs_baseline": None,
                "error": "; ".join(errs),
            }
        ),
        flush=True,
    )


def main():
    device_fallback = os.environ.get("NK_BENCH_FORCE_CPU")

    # the scipy reference baseline runs concurrently in its own jax-free
    # process from the first moment -- it needs ~2 minutes of one CPU core
    # and nothing from the device, so it overlaps backend init and every
    # accelerator section below; harvested in the cpu_baseline section
    cpu_proc = None
    if os.environ.get("NK_BENCH_CPU_SUB", "1") != "0":
        try:
            cpu_proc = _start_cpu_baseline()
        except Exception:  # noqa: BLE001
            cpu_proc = None

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the accelerator child's first-compile
    # cost (big unrolled scans over a remote-tunnel backend) measured ~13
    # minutes of the deadline budget, deadline-starving the gx1 sections;
    # cached, repeat runs spend that budget measuring instead
    cache_dir = os.environ.get(
        "NK_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.realpath(__file__)),
                     ".jax_cache"),
    )
    if cache_dir and cache_dir != "0":
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
        except Exception:  # noqa: BLE001 -- cache is best-effort
            pass

    # some device plugins ignore the JAX_PLATFORMS env var (the axon tunnel
    # does) and would still initialize; the config route is respected
    platforms = os.environ.get("JAX_PLATFORMS")
    if device_fallback is not None:
        jax.config.update("jax_platforms", "cpu")
    elif platforms:
        jax.config.update("jax_platforms", platforms)

    from newton_krylov_ooc_tpu.models.py_driver_2d.incore import IageKernel

    year = 365.0 * 86400.0
    depth, ypos = build_axes()
    modelinfo = {"max_abs_vvel": "0.1", "horiz_mix_coeff": "1000.0"}

    device = jax.devices()[0]
    on_accel = device.platform != "cpu"
    kernel = IageKernel(depth, ypos, modelinfo, dtype=jnp.float32, n_steps=N_STEPS)

    column = np.interp(depth.mid, [55.0, 200.0], [0.0, 2.0])
    y0 = np.broadcast_to(column[:, None], (len(depth), len(ypos)))
    y0 = np.stack([y0, y0])

    # accelerator fast path (fused IMEX year)
    y0_dev = jnp.asarray(y0, jnp.float32)
    out = kernel._year_fn(y0_dev)
    out.block_until_ready()  # compile

    profile_dir = os.environ.get("NK_TPU_PROFILE_DIR")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            kernel._year_fn(y0_dev).block_until_ready()

    times = []
    for _ in range(REPS):
        start = time.time()
        out = kernel._year_fn(y0_dev)
        out.block_until_ready()
        times.append(time.time() - start)
    tpu_time = min(times)
    y_fast = np.asarray(out, dtype=np.float64)

    # the scipy baseline subprocess reports in later (cpu_baseline
    # section); until then the flagship record carries the last
    # driver-captured measurement, explicitly labeled
    cpu_time = _PRIOR_CPU_BASELINE_S

    result = {
        "metric": "py_driver_2d iage fn-eval (1 model year, "
        f"{GRID_NZ}x{GRID_NY} grid) wall-clock",
        "value": round(tpu_time, 6),
        "unit": "seconds",
        "vs_baseline": round(cpu_time / tpu_time, 2),
        "baseline_cpu_seconds": round(cpu_time, 3),
        "baseline_cpu_source": "BENCH_r03 artifact (subprocess pending)",
        "device": str(device),
        "n_steps": N_STEPS,
        "fn_evals_per_second": round(1.0 / tpu_time, 3),
        "device_ms_per_step": round(tpu_time / N_STEPS * 1.0e3, 6),
    }
    if device_fallback is not None:
        result["device_fallback"] = (
            f"{device_fallback}; measured on the CPU backend"
        )

    # FLAGSHIP RECORD, printed the moment the primary measurement exists:
    # if anything below dies or is killed, this line is what the driver
    # parses.  Each section below re-prints the enriched record FOLLOWED
    # by a compact tail-sized summary: the driver keeps only the last
    # ~2000 stdout characters and parses the last JSON line, and the
    # round-4 enriched record outgrew that window (BENCH_r04 parsed:
    # null, the record survived only as a text fragment).  The compact
    # line carries the flagship metric plus one headline number per
    # section and is hard-capped well under the window, so the last
    # stdout line is ALWAYS a parseable record no matter when the run
    # is killed; the full enriched record still precedes it for humans
    # (and mostly fits the same tail).
    _COMPACT_KEYS = (
        "metric", "value", "unit", "vs_baseline", "baseline_cpu_seconds",
        "device", "device_ms_per_step",
        "irf3d_gx1_stream_ms_per_step", "irf3d_gx1_stream_config",
        "irf3d_gx1_stream_actual_hbm_gbps",
        "irf3d_gx1_stream_hbm_roofline_pct",
        "irf3d_gx1_stencil_ms_per_step",
        "irf3d_gx1_stencil_bf16_ms_per_step",
        "irf3d_gx1_family_ms_per_step_per_module",
        "irf3d_gx1_seasonal_ms_per_step",
        "irf3d_gx3_year_seconds", "irf3d_gx3_year_pallas_seconds",
        "irf3d_full_solve_seconds", "irf3d_full_solve_path",
        "py2d_full_solve_seconds",
        "phosphorus_year_seconds", "module_year_seconds_batch32",
        "gmres_jitted_seconds", "newton_fused_solve_seconds",
        "precond_gx3_line_solve_seconds", "precond_gx3_mixed_solve_seconds",
        "precond_gx3_jacobi_solve_seconds",
        "precond_gx3_native_serial_solve_seconds",
        "precond_gx3_native_threads_solve_seconds",
        "precond_gx1_line_solve_seconds", "gen_a_gx1_assembly_seconds",
        "bench_sections_skipped",
    )

    def emit():
        full = json.dumps(result)
        print(full, flush=True)
        compact = {k: result[k] for k in _COMPACT_KEYS if k in result}
        compact["full_record_chars"] = len(full)
        line = json.dumps(compact)
        if len(line) > 1800:  # hard cap: the tail window is ~2000 chars
            for k in reversed(_COMPACT_KEYS):
                if k in compact and k != "metric":
                    del compact[k]
                    line = json.dumps(compact)
                    if len(line) <= 1800:
                        break
        print(line, flush=True)

    emit()

    # per-section wall-clock so the deadline estimates are tuned on data
    _sect_prev = [time.time()]
    result["bench_section_seconds"] = {}

    def _mark(name):
        now = time.time()
        result["bench_section_seconds"][name] = round(now - _sect_prev[0], 1)
        _sect_prev[0] = now
        emit()

    # the x64-flipping precond sections must run LAST (their jax_enable_x64
    # flip would invalidate every f32 cache entry after them), so every
    # earlier gate holds back a budget reserve for them: round 4 starved
    # them to "left 20s" and they had NEVER been driver-captured
    gen_a_bin = os.path.join(
        os.path.dirname(os.path.realpath(__file__)),
        "native", "precond_tools", "bin", "gen_A",
    )
    _precond_reserve = (
        250.0
        if os.environ.get("NK_BENCH_EXTRA", "1") != "0"
        and os.path.exists(gen_a_bin)
        else 0.0
    )

    def _gate(name, need, reserve=None):
        """deadline gate; a skip records the budget shortfall so future
        thresholds are tuned on data, not guesses.  reserve (default: the
        precond reserve) is budget this section may not eat into."""
        if reserve is None:
            reserve = _precond_reserve
        left = _left() - reserve
        if left > need:
            return True
        result.setdefault("bench_sections_skipped", {})[name] = (
            f"left {left:.0f}s < {need}s"
            + (f" (reserve {reserve:.0f}s)" if reserve else "")
        )
        return False

    # device-utilization observability: XLA's own cost model for the SAME
    # mathematics (the scan-path year; the pallas megakernel is opaque to
    # cost_analysis) paired with the measured wall-clock.  bf16 peak of one
    # v5e chip is 197 TFLOP/s (public spec) -- a stencil/VPU workload is
    # nowhere near it by design; the number contextualizes, the achieved
    # figures are the measurement.
    try:
        def _cost(n_steps):
            # warn_unstable=False: these kernels are lowered for cost
            # analysis only, never executed, so the stability bound is
            # meaningless noise here
            kern = IageKernel(
                depth, ypos, modelinfo, dtype=jnp.float32, n_steps=n_steps,
                use_pallas=False, warn_unstable=False,
            )
            cost = kern._year_fn.lower(y0_dev).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return (
                float(cost.get("flops", 0.0)),
                float(cost.get("bytes accessed", 0.0)),
            )

        # XLA cost_analysis counts a lax.scan body ONCE regardless of trip
        # count, so n_steps=1 (no scan) vs n_steps=2 (scan of exactly one
        # interior step) differ by precisely one step's cost: one Heun pair
        # + one Crank-Nicolson solve.  Scale that to the benchmarked count.
        f1, b1 = _cost(1)
        f2, b2 = _cost(2)
        flops = (f2 - f1) * N_STEPS
        bytes_acc = (b2 - b1) * N_STEPS
        if flops > 0:
            result["est_flops_per_fn_eval"] = round(flops)
            result["achieved_gflops_per_second"] = round(
                flops / tpu_time / 1.0e9, 2
            )
            result["flops_utilization_of_bf16_peak"] = round(
                flops / tpu_time / 197.0e12, 6
            )
        if bytes_acc > 0:
            # the megakernel holds state in VMEM, so this is the rate the
            # EQUIVALENT XLA scan would demand of HBM -- an upper bound on
            # what the pallas path actually moves
            result["est_bytes_per_fn_eval"] = round(bytes_acc)
            result["equiv_hbm_gbps"] = round(bytes_acc / tpu_time / 1.0e9, 2)
            # fusion CREDIT, not sustained bandwidth: may exceed the
            # chip's physical HBM peak.  True sustained rates are the
            # *_actual_hbm_gbps fields of the streaming sections.
            result["equiv_hbm_gbps_is_fusion_credit"] = True
    except Exception as exc:  # noqa: BLE001
        result["cost_analysis_error"] = f"{type(exc).__name__}: {exc}"
    _mark("cost_analysis")

    extras_on = os.environ.get("NK_BENCH_EXTRA", "1") != "0"
    full_on = os.environ.get("NK_BENCH_FULL") == "1"

    def _time_irf3d_year(nz3, nlat3, nlon3, reps, seed=0):
        """one on-device IMEX-scan year of the 3D IRF-transport stencil at
        the given POP extents (upwind3 advection + lateral diffusion +
        implicit vertical mixing); returns the build artifacts and the
        best-of-reps wall-clock"""
        from functools import partial as _partial

        from newton_krylov_ooc_tpu.models.irf_offline import synthetic
        from newton_krylov_ooc_tpu.ops.imex import imex_year
        from newton_krylov_ooc_tpu.ops.transport3d import (
            build_transport3d,
            mask_vmix_coeff,
            transport_tend,
            vmix_vertical_coeff,
        )

        circ3 = synthetic.gen_circulation(nz3, nlat3, nlon3)
        steps3 = max(2000, synthetic.stable_steps_per_year(circ3))
        coef3 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32),
            build_transport3d(
                circ3["mask"], circ3["dz"], circ3["TAREA"],
                uet=circ3["UET"], vnt=circ3["VNT"], wtt=circ3["WTT"],
                hdiff_e=circ3["HDIFF_E"], hdiff_n=circ3["HDIFF_N"],
            ),
        )
        kv3, dzr3 = vmix_vertical_coeff(circ3["VDC"], circ3["dz"])
        kv3 = jnp.asarray(
            mask_vmix_coeff(kv3, circ3["mask"]), jnp.float32
        )
        dzr3 = jnp.asarray(dzr3, jnp.float32)

        @_partial(jax.jit, static_argnames=("n_steps",))
        def year_fn(y0, cf, kv, dzr, n_steps):
            def tend(t, y):
                y3 = y.reshape(nz3, nlat3, nlon3)
                return transport_tend(cf, y3).reshape(y.shape)

            return imex_year(
                tend, lambda t: kv, jnp.zeros((), jnp.float32),
                dzr, y0, (0.0, year), n_steps,
            )

        y0_ = jnp.asarray(
            np.random.default_rng(seed)
            .uniform(0.0, 1.0, (nz3, nlat3 * nlon3))
            .astype(np.float32)
        )
        out = year_fn(y0_, coef3, kv3, dzr3, steps3)
        out.block_until_ready()
        assert np.isfinite(np.asarray(out)).all()
        times = []
        for _ in range(reps):
            start = time.time()
            year_fn(y0_, coef3, kv3, dzr3, steps3).block_until_ready()
            times.append(time.time() - start)
        return circ3, coef3, kv3, dzr3, steps3, y0_, out, min(times)

    # ---- cheap small-problem sections: 2D pallas year kernels, jitted
    # GMRES vs the host Krylov loop, fused one-dispatch Newton solve.
    if extras_on and _gate("pallas_2d", 150):
        from newton_krylov_ooc_tpu.models.py_driver_2d import physics
        from newton_krylov_ooc_tpu.models.py_driver_2d.iage import (
            surf_restore_rate,
        )

        try:
            from newton_krylov_ooc_tpu.models.py_driver_2d.phosphorus import (
                DEFAULT_PARAMS,
                light_lim_2d,
            )
            from newton_krylov_ooc_tpu.ops.imex_pallas import (
                build_iage_year_pallas_v2,
                build_phosphorus_year_pallas,
            )

            grid = physics.make_grid(depth, ypos, modelinfo, jnp.float32)

            phos = build_phosphorus_year_pallas(
                grid, DEFAULT_PARAMS, light_lim_2d(depth, ypos),
                (0.0, year), N_STEPS,
            )
            p0 = jnp.asarray(np.full((3, GRID_NZ, GRID_NY), 0.5, np.float32))
            phos(p0).block_until_ready()
            times = []
            for _ in range(3):
                start = time.time()
                phos(p0).block_until_ready()
                times.append(time.time() - start)
            result["phosphorus_year_seconds"] = round(min(times), 6)

            batch = 32
            rate = surf_restore_rate(depth)
            bdiag = np.zeros((batch, GRID_NZ, GRID_NY), np.float32)
            bdiag[:, 0, :] = -rate
            bsrc = np.full((batch, 1, 1), 1.0 / year, np.float32)
            bfn = build_iage_year_pallas_v2(
                grid, bdiag, bsrc, (0.0, year), N_STEPS
            )
            b0 = jnp.asarray(
                np.full((batch, GRID_NZ, GRID_NY), 0.5, np.float32)
            )
            bfn(b0).block_until_ready()
            times = []
            for _ in range(3):
                # time through a host scalar read-back: one r4 run saw
                # block_until_ready return in ~32 us for a call that
                # measures ~60 ms (a transient tunnel anomaly); a forced
                # device->host reduction cannot report early
                start = time.time()
                float(jnp.sum(bfn(b0)))
                times.append(time.time() - start)
            result["module_year_seconds_batch32"] = round(min(times) / batch, 6)
        except Exception as exc:  # noqa: BLE001
            result["extra_bench_error"] = f"{type(exc).__name__}: {exc}"
    _mark("pallas_2d")

    # jitted while-loop GMRES vs the host-driven Krylov loop: with fast
    # matvecs the host path pays one ~25 ms dispatch round-trip per Arnoldi
    # step while the jitted path is ONE device call -- the wall-clock gap
    # is the recorded delta (ops/gmres.py)
    if extras_on and _gate("gmres_newton", 120):
        try:
            from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore

            gdepth, gypos = build_axes(16, 12)
            gkern = IageKernel(
                gdepth, gypos, modelinfo, dtype=jnp.float32, n_steps=32,
                use_pallas=False,
            )
            gx = gkern.init_iterate()
            gf = gkern.comp_fcn(gx)
            host_solver = NewtonKrylovInCore(gkern, krylov_rel_tol=1e-2)
            jit_solver = NewtonKrylovInCore(
                gkern, krylov_rel_tol=1e-2, jit_gmres=True
            )
            jit_solver._gmres(gx, gf)  # compile
            host_solver._gmres(gx, gf)  # warm
            start = time.time()
            _, host_its = host_solver._gmres(gx, gf)
            host_s = time.time() - start
            start = time.time()
            inc, jit_its = jit_solver._gmres(gx, gf)
            jax.block_until_ready(inc)
            jit_s = time.time() - start
            result["gmres_host_loop_seconds"] = round(host_s, 4)
            result["gmres_jitted_seconds"] = round(jit_s, 4)
            result["gmres_iterations"] = int(jit_its)

            # the fused one-dispatch Newton solve (ops/newton_jit.py) vs
            # the host-driven outer loop: every fn eval, Armijo trial, and
            # convergence readback in the host path pays the dispatch
            # floor; the fused path pays it once
            host_nk = NewtonKrylovInCore(
                gkern, newton_rel_tol=1e-4, krylov_rel_tol=1e-2,
                newton_max_iter=10, jit_gmres=True,
            )
            fused_nk = NewtonKrylovInCore(
                gkern, newton_rel_tol=1e-4, krylov_rel_tol=1e-2,
                newton_max_iter=10, jit_newton=True,
            )
            xf, _, _ = fused_nk.solve(gx)  # compile
            jax.block_until_ready(xf)
            host_nk.solve(gx)  # warm
            start = time.time()
            _, _, info_h = host_nk.solve(gx)
            host_solve_s = time.time() - start
            start = time.time()
            xf, _, info_f = fused_nk.solve(gx)
            jax.block_until_ready(xf)
            fused_solve_s = time.time() - start
            result["newton_host_solve_seconds"] = round(host_solve_s, 4)
            result["newton_fused_solve_seconds"] = round(fused_solve_s, 4)
            # both iteration counts recorded so the timing comparison is
            # verifiably like-for-like
            result["newton_host_iterations"] = int(info_h["iterations"])
            result["newton_fused_iterations"] = int(info_f["iterations"])
        except Exception as exc:  # noqa: BLE001
            result["gmres_bench_error"] = f"{type(exc).__name__}: {exc}"
    _mark("gmres_newton")


    # non-blocking check on the niced scipy-baseline subprocess; the
    # final blocking harvest happens at the end of the run
    def _try_cpu_baseline(wait_s):
        nonlocal cpu_proc, cpu_time
        if cpu_proc is None:
            return
        measured = _harvest_cpu_baseline(cpu_proc, wait_s)
        if measured is not None or wait_s > 0:
            cpu_proc = None  # done, or killed on a blocking expiry
        if measured is not None:
            cpu_time = float(measured["baseline_cpu_seconds"])
            result["baseline_cpu_seconds"] = round(cpu_time, 3)
            result["baseline_cpu_wall_seconds"] = measured.get(
                "baseline_cpu_wall_seconds"
            )
            result["baseline_cpu_source"] = (
                "measured (this run; CPU seconds -- the niced subprocess's"
                " wall time includes descheduling, see"
                " baseline_cpu_wall_seconds)"
            )
            result["vs_baseline"] = round(cpu_time / tpu_time, 2)

    _try_cpu_baseline(0.0)
    _mark("cpu_baseline")

    # accuracy: step-halving self-convergence of the O(dt^2) scheme --
    # its own gated section (a second 2x-step kernel compile) so a cold
    # cache can never starve the sections above
    if extras_on and _gate("halving", 100):
        try:
            kernel_fine = IageKernel(
                depth, ypos, modelinfo, dtype=jnp.float32,
                n_steps=2 * N_STEPS,
            )
            y_fine = np.asarray(kernel_fine._year_fn(y0_dev), np.float64)
            result["step_halving_rel_err"] = float(
                np.abs(y_fast - y_fine).max()
                / max(np.abs(y_fine).max(), 1e-30)
            )
        except Exception as exc:  # noqa: BLE001
            result["halving_bench_error"] = f"{type(exc).__name__}: {exc}"
    _mark("halving")

    # ---- gx1-scale year throughput (POP gx1v7 extents 60x384x320, the
    # reference's PRODUCTION grid -- its preconditioner solve alone takes
    # 256 MPI ranks at 2.3 GB each): XLA-scan reference, HBM-streaming
    # steady + seasonal kernels, and the multi-module family stream.  The
    # most valuable numbers in the file, so they run FIRST among the
    # accelerator sections.  Accelerator only.
    x_y0 = None
    if extras_on and on_accel and _gate("gx1_stream", 420):
        try:
            x_nz, x_nlat, x_nlon = 60, 384, 320
            (
                _xc, x_coef, x_kv, x_dzr, x_steps, x_y0, x_out, gx1_s
            ) = _time_irf3d_year(x_nz, x_nlat, x_nlon, reps=1)
            result["irf3d_gx1_year_seconds"] = round(gx1_s, 4)
            result["irf3d_gx1_cells"] = x_nz * x_nlat * x_nlon
            result["irf3d_gx1_cell_steps_per_second"] = round(
                x_nz * x_nlat * x_nlon * x_steps / gx1_s
            )
            # the same year through the HBM-streaming pallas kernel (state
            # ping-pong in HBM, latitude-block windows through VMEM) -- the
            # grid is ~6x past one core's VMEM, so the whole-year
            # megakernel cannot apply and the scan above is the fallback
            # this kernel must beat
            from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
                build_transport3d_year_stream,
                plan_stream,
            )

            def _build_stream(**cfg):
                return build_transport3d_year_stream(
                    x_coef, x_kv, x_dzr, None, None, (0.0, year),
                    x_steps, t_dim=1,
                    recip_area=1.0 / np.asarray(_xc["TAREA"]),
                    recip_dz=1.0 / np.asarray(_xc["dz"]),
                    **cfg,
                )

            y0_cfg_probe = jnp.zeros(
                (1, x_nz, x_nlat, x_nlon), jnp.float32
            )
            # the planner's VMEM estimate is advisory and the build itself
            # can fail at trace/Mosaic-compile time, so planner + build +
            # compile probe all sit inside one try; the fallback is the
            # most conservative exercised config (serial schedule needs
            # the LEAST VMEM -- a VMEM-driven probe failure must not fall
            # back onto a hungrier double-buffered one)
            try:
                st_cfg = plan_stream(x_nz, x_nlat, x_nlon, 1, x_steps)
                stream_year = _build_stream(**st_cfg)
                stream_year(y0_cfg_probe).block_until_ready()
            except Exception:  # noqa: BLE001
                st_cfg = {
                    "steps_per_sweep": 2 if x_steps % 2 == 0 else 1,
                    "block_rows": 16,
                    "prefetch": False,
                }
                stream_year = _build_stream(**st_cfg)
            result["irf3d_gx1_stream_config"] = dict(st_cfg)
            y0_4d = jnp.asarray(
                np.asarray(x_y0).reshape(1, x_nz, x_nlat, x_nlon)
            )
            out_st = stream_year(y0_4d)
            out_st.block_until_ready()
            out_st_np = np.asarray(out_st).reshape(x_nz, -1)
            assert np.isfinite(out_st_np).all()
            scan_np = np.asarray(x_out)
            result["irf3d_gx1_stream_vs_scan_rel"] = float(
                np.abs(out_st_np - scan_np).max() / np.abs(scan_np).max()
            )
            start = time.time()
            stream_year(y0_4d).block_until_ready()
            st_s = time.time() - start
            result["irf3d_gx1_year_stream_seconds"] = round(st_s, 4)
            result["irf3d_gx1_stream_cell_steps_per_second"] = round(
                x_nz * x_nlat * x_nlon * x_steps / st_s
            )
            result["irf3d_gx1_stream_ms_per_step"] = round(
                st_s / x_steps * 1.0e3, 4
            )
            # TRUE bytes moved (incl. DMA pads) / wall-clock: sustained
            # HBM bandwidth, bounded by the chip's physical peak --
            # unlike equiv_hbm_gbps, which credits avoided bytes
            result["irf3d_gx1_stream_actual_hbm_gbps"] = round(
                stream_year.hbm_bytes_per_step * x_steps / st_s / 1.0e9, 1
            )
            # compute-vs-HBM roofline: the rough in-kernel VPU flop count
            # (year.est_flops_per_step) next to the exact byte count.
            # hbm_roofline_pct = (bytes / 819 GB/s v5e peak) / measured:
            # how close the kernel runs to a pure-bandwidth limit; the
            # kernel is VPU-bound (measured round 4/5), so the gap IS
            # the compute time.
            result["irf3d_gx1_stream_est_flops_per_step"] = (
                stream_year.est_flops_per_step
            )
            result["irf3d_gx1_stream_vpu_gflops"] = round(
                stream_year.est_flops_per_step / (st_s / x_steps) / 1.0e9,
                1,
            )
            result["irf3d_gx1_stream_hbm_roofline_pct"] = round(
                100.0
                * (stream_year.hbm_bytes_per_step / 819.0e9)
                / (st_s / x_steps),
                1,
            )

            # STENCIL-form streams: the collapsed 13-offset operator
            # (ops.transport3d.transport_stencil_coef) -- f32 for
            # fidelity (measured 5.8e-7 vs the upwind3 stream), bf16
            # coefficient windows for speed (operator rounded to 8-bit
            # mantissas, ~5e-3 solution shift; the reference's own
            # annual-mean IRF collapse is a far larger perturbation).
            # Configs are the measured-compilable serial ones -- every
            # prefetch schedule at gx1 crashes the remote compile
            # service's envelope (round-5 bisect).
            for tag, st_kwargs in (
                ("stencil", {"block_rows": 16, "steps_per_sweep": 2,
                             "stencil": True}),
                ("stencil_bf16", {"block_rows": 16, "steps_per_sweep": 2,
                                  "stencil": True, "coef_bf16": True}),
            ):
                if not _gate(f"gx1_{tag}", 160):
                    continue
                try:
                    stc_year = _build_stream(**st_kwargs)
                    out_stc = stc_year(y0_4d)
                    out_stc.block_until_ready()
                    stc_np = np.asarray(out_stc).reshape(x_nz, -1)
                    assert np.isfinite(stc_np).all()
                    result[f"irf3d_gx1_{tag}_vs_scan_rel"] = float(
                        np.abs(stc_np - scan_np).max()
                        / np.abs(scan_np).max()
                    )
                    start = time.time()
                    float(jnp.sum(stc_year(y0_4d)))
                    stc_s = time.time() - start
                    result[f"irf3d_gx1_{tag}_ms_per_step"] = round(
                        stc_s / x_steps * 1.0e3, 4
                    )
                    result[f"irf3d_gx1_{tag}_actual_hbm_gbps"] = round(
                        stc_year.hbm_bytes_per_step * x_steps / stc_s
                        / 1.0e9, 1
                    )
                    result[f"irf3d_gx1_{tag}_vpu_gflops"] = round(
                        stc_year.est_flops_per_step / (stc_s / x_steps)
                        / 1.0e9, 1
                    )
                except Exception as exc:  # noqa: BLE001
                    result[f"irf3d_gx1_{tag}_error"] = (
                        f"{type(exc).__name__}: {exc}"
                    )
        except Exception as exc:  # noqa: BLE001
            result["irf3d_gx1_bench_error"] = f"{type(exc).__name__}: {exc}"
    _mark("gx1_stream")

    # ---- the BASELINE.md north star, end-to-end: the full py_driver_2d
    # iage Newton-Krylov spin-up on one chip at the flagship grid --
    # whole years as fused IMEX kernels, exact JVPs, jitted GMRES,
    # implicit-Euler-product preconditioner.  The reference runs this
    # workload as tens of scipy-Radau forward integrations (~2 min EACH
    # on this host, the baseline_cpu_seconds above) driven by the
    # file-based solver; iteration count and residual trajectory are
    # recorded so the solve is comparable to the committed
    # Newton_state.json convergence baselines (converged-at-iteration-3
    # class, /root/reference/baselines/ci_long_iage).
    if extras_on and _gate("full_solve_2d", 120):
        try:
            from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore

            solver_2d = NewtonKrylovInCore(
                kernel,
                newton_rel_tol=1.0e-5,
                krylov_rel_tol=1.0e-2,
                newton_max_iter=8,
                jit_gmres=True,
            )
            start = time.time()
            x2d, _f2d, info2d = solver_2d.solve(kernel.init_iterate())
            jax.block_until_ready(x2d)
            solve2d_s = time.time() - start
            rel2d = np.asarray(info2d["fcn_norm"]) / np.asarray(
                info2d["x_norm"]
            )
            assert np.isfinite(np.asarray(x2d)).all()
            assert (rel2d < 1.0e-5).all()
            result["py2d_full_solve_seconds"] = round(solve2d_s, 2)
            result["py2d_full_solve_newton_iterations"] = int(
                info2d["iterations"]
            )
            result["py2d_full_solve_rel_resid"] = float(rel2d.max())
        except Exception as exc:  # noqa: BLE001
            result["py2d_solve_bench_error"] = f"{type(exc).__name__}: {exc}"
    _mark("full_solve_2d")

    # ---- gx3-scale 3D offline IRF-transport year (irf_offline family):
    # the cime_pop-class workload -- ~700k wet cells as one on-device IMEX
    # scan, then the same year as ONE whole-year pallas megakernel (all
    # coefficients, CN bands, state, and Kahan compensation VMEM-resident
    # for every step; the scan re-streams ~50 MB of stencil coefficients
    # from HBM each step).
    g_nz = g_nlat = g_nlon = g_steps = None
    circ = coef = g_kv = g_dzr = y0_3d = out3d = None
    if extras_on and _gate("gx3_scan", 300):
        try:
            g_nz, g_nlat, g_nlon = 60, 116, 100  # POP gx3v7 extents
            (
                circ, coef, g_kv, g_dzr, g_steps, y0_3d, out3d, g_best
            ) = _time_irf3d_year(g_nz, g_nlat, g_nlon, reps=2)
            result["irf3d_gx3_year_seconds"] = round(g_best, 4)
            result["irf3d_n_steps"] = g_steps
            result["irf3d_cells"] = g_nz * g_nlat * g_nlon
            result["irf3d_cell_steps_per_second"] = round(
                g_nz * g_nlat * g_nlon * g_steps / g_best
            )
        except Exception as exc:  # noqa: BLE001
            result["irf3d_bench_error"] = f"{type(exc).__name__}: {exc}"
    _mark("gx3_scan")

    # ---- FULL 3D spin-up: a two-module tracer family solved to its
    # cyclostationary state at gx3 scale with the whole Newton-Krylov
    # stack on device (exact linear JVPs, jitted GMRES, column-local PCR
    # preconditioner).  The reference's equivalent is tens of
    # batch-scheduler round trips of POP plus MPI SuperLU solves -- "hours
    # of wall-clock on a supercomputer" (SURVEY.md section 6).  Skipped on
    # a CPU backend (forced fallback or no accelerator): the full solve
    # would dominate the budget without measuring the device.
    if extras_on and _gate("full_solve", 180) and (
        on_accel or os.environ.get("NK_BENCH_IRF3D_GRID")
    ):
        try:
            from jax.sharding import Mesh

            from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore
            from newton_krylov_ooc_tpu.models.irf_offline import synthetic
            from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
                ShardedTransport3dKernel,
            )

            grid_env = os.environ.get("NK_BENCH_IRF3D_GRID")
            s_nz, s_nlat, s_nlon = (
                tuple(int(v) for v in grid_env.split(","))
                if grid_env
                else (60, 116, 100)
            )
            # the gx3 section above already generated this circulation at
            # the default extents -- reuse it
            if g_steps is not None and (s_nz, s_nlat, s_nlon) == (
                g_nz, g_nlat, g_nlon
            ):
                solve_circ, s_steps = circ, g_steps
            else:
                solve_circ = synthetic.gen_circulation(s_nz, s_nlat, s_nlon)
                s_steps = max(
                    2000, synthetic.stable_steps_per_year(solve_circ)
                )
            # volumetric first-order sinks keep (I - B) well conditioned
            specs = [
                [{"name": "DYE_A", "source_per_year": 0.1,
                  "sink_rate_per_year": 0.5}],
                [{"name": "DYE_B", "source_per_year": 0.1,
                  "sink_rate_per_year": 1.0,
                  "surf_restore_pv_cm_s": 5.0e-3}],
            ]
            mesh = Mesh(np.asarray(jax.devices()[:1]), ("space",))

            def run_spinup(use_pallas):
                kernel = ShardedTransport3dKernel(
                    mesh, solve_circ, specs, n_steps=s_steps,
                    dtype=jnp.float32, use_pallas=use_pallas,
                )
                solver = NewtonKrylovInCore(
                    kernel,
                    newton_rel_tol=1.0e-5,
                    krylov_rel_tol=1.0e-2,
                    newton_max_iter=6,
                    krylov_max_dim=20,
                    jit_gmres=True,
                )
                # one warm fcn eval first, so the per-module year-kernel
                # compiles (cache hits when .jax_cache is warm) are
                # recorded SEPARATELY from the measured solve
                x0 = kernel.init_iterate()
                start = time.time()
                jax.block_until_ready(kernel.comp_fcn(x0))
                compile_s = time.time() - start
                start = time.time()
                x_sol, _fcn, info = solver.solve(x0)
                jax.block_until_ready(x_sol)
                return x_sol, info, time.time() - start, compile_s

            # prefer the whole-year pallas megakernel for the spin-up when
            # it fits (cheap advisory estimate BEFORE building anything);
            # fall back to the XLA scan on ANY pallas-path failure.
            # Default ON since round 5: with the persistent .jax_cache
            # warm the two per-module kernel compiles that once cost
            # ~5 min are cache hits, and the compile/warmup seconds are
            # now recorded separately from the measured solve either way.
            from newton_krylov_ooc_tpu.ops.transport3d_pallas import (
                megakernel_fits_vmem,
            )

            solve_out = None
            if (
                os.environ.get("NK_BENCH_PALLAS_SOLVE", "1") == "1"
                and on_accel
                # the pallas attempt costs ~55 s warm but ~430 s when the
                # persistent cache misses (observed: the big megakernel /
                # solve programs sometimes re-key across sessions while
                # smaller ones hit), so only attempt it when a COLD
                # compile still leaves the precond reserve intact --
                # otherwise fall through to the scan path, which is
                # still a captured full-solve number
                and _left() > 600
                and megakernel_fits_vmem(
                    s_nz, s_nlat, s_nlon, max(len(m) for m in specs)
                )
            ):
                try:
                    solve_out = run_spinup(True)
                    result["irf3d_full_solve_path"] = "pallas"
                except Exception as exc:  # noqa: BLE001
                    result["irf3d_pallas_solve_fallback"] = (
                        f"{type(exc).__name__}: {exc}"
                    )
            if solve_out is None:
                solve_out = run_spinup(False)
                result["irf3d_full_solve_path"] = "xla_scan"
            x_sol, info, solve_s, compile_s = solve_out
            rel = np.asarray(info["fcn_norm"]) / np.asarray(info["x_norm"])
            assert np.isfinite(np.asarray(x_sol)).all()
            assert (rel < 1.0e-5).all()
            result["irf3d_full_solve_seconds"] = round(solve_s, 2)
            result["irf3d_full_solve_compile_seconds"] = round(compile_s, 2)
            result["irf3d_full_solve_modules"] = len(specs)
            result["irf3d_full_solve_rel_resid"] = float(rel.max())
        except Exception as exc:  # noqa: BLE001
            result["irf3d_solve_bench_error"] = f"{type(exc).__name__}: {exc}"
    _mark("full_solve")

    if extras_on and on_accel and g_steps is not None and _gate("gx3_pallas", 240):
        try:
            from newton_krylov_ooc_tpu.ops.transport3d_pallas import (
                build_transport3d_year_pallas,
            )

            diag1 = np.zeros((1, g_nz, g_nlat * g_nlon), np.float32)
            pallas_year = build_transport3d_year_pallas(
                coef, g_kv, g_dzr, diag1, diag1, (0.0, year), g_steps,
            )
            y0_p = jnp.asarray(
                np.asarray(y0_3d).reshape(1, g_nz, g_nlat, g_nlon)
            )
            out_p = pallas_year(y0_p)
            out_p.block_until_ready()
            out_p_np = np.asarray(out_p).reshape(g_nz, -1)
            assert np.isfinite(out_p_np).all()
            scan_np = np.asarray(out3d)
            result["irf3d_pallas_vs_scan_rel"] = float(
                np.abs(out_p_np - scan_np).max() / np.abs(scan_np).max()
            )
            times_p = []
            for _ in range(2):
                start = time.time()
                pallas_year(y0_p).block_until_ready()
                times_p.append(time.time() - start)
            result["irf3d_gx3_year_pallas_seconds"] = round(min(times_p), 4)
            result["irf3d_pallas_cell_steps_per_second"] = round(
                g_nz * g_nlat * g_nlon * g_steps / min(times_p)
            )
        except Exception as exc:  # noqa: BLE001
            result["irf3d_pallas_bench_error"] = f"{type(exc).__name__}: {exc}"
    _mark("gx3_pallas")



    # MULTI-MODULE gx1 family stream: N tracer modules ride ONE
    # coefficient-window residency (the workload the reference spreads
    # over 256 MPI ranks, nk_ooc/cime_pop/model_state.py:317-337).  The
    # stream kernel is coefficient-traffic-bound, so stacking the family
    # amortizes the dominant DMA cost ~N-fold: the per-module ms/step is
    # the headline.  Rate fields take the assemble_rate_fields form
    # (a*wet + b*wet_surf), so they shed their dense streams; module 0 is
    # rate-free and must land on the steady scan's year to float32.
    if extras_on and on_accel and x_y0 is not None and _gate("gx1_family", 260):
        try:
            from newton_krylov_ooc_tpu.ops.transport3d import (
                assemble_rate_fields,
            )
            from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
                plan_stream,
            )

            fam_t = 4
            wet2 = (
                np.asarray(_xc["mask"]).reshape(x_nz, -1) > 0
            ).astype(np.float64)
            fam_specs = [
                {"name": "t0"},
                {"name": "t1", "sink_rate_per_year": 1.0 / 50.0},
                {"name": "t2", "source_per_year": 1.0e-3,
                 "sink_rate_per_year": 0.02},
                {"name": "t3", "surf_restore_pv_cm_s": 2.0e-4,
                 "surf_restore_target": 1.0},
            ]
            fam_diag, fam_src, _cpl = assemble_rate_fields(
                fam_specs, wet2, float(np.asarray(_xc["dz"])[0]), year
            )
            fam_cfg = plan_stream(x_nz, x_nlat, x_nlon, fam_t, x_steps)
            fam_year = build_transport3d_year_stream(
                x_coef, x_kv, x_dzr, fam_diag, fam_src, (0.0, year),
                x_steps,
                recip_area=1.0 / np.asarray(_xc["TAREA"]),
                recip_dz=1.0 / np.asarray(_xc["dz"]),
                **fam_cfg,
            )
            assert not fam_year.stream_diag and not fam_year.stream_src
            y0_fam = jnp.broadcast_to(
                jnp.asarray(
                    np.asarray(x_y0).reshape(1, x_nz, x_nlat, x_nlon)
                ),
                (fam_t, x_nz, x_nlat, x_nlon),
            )
            out_fam = fam_year(y0_fam)
            out_fam.block_until_ready()
            fam_np = np.asarray(out_fam)
            assert np.isfinite(fam_np).all()
            scan_np = np.asarray(x_out)
            result["irf3d_gx1_family_vs_scan_rel"] = float(
                np.abs(fam_np[0].reshape(x_nz, -1) - scan_np).max()
                / np.abs(scan_np).max()
            )
            start = time.time()
            fam_year(y0_fam).block_until_ready()
            fam_s = time.time() - start
            result["irf3d_gx1_family_stream_seconds"] = round(fam_s, 4)
            result["irf3d_gx1_family_t_dim"] = fam_t
            result["irf3d_gx1_family_config"] = dict(fam_cfg)
            result["irf3d_gx1_family_ms_per_step_per_module"] = round(
                fam_s / x_steps / fam_t * 1.0e3, 4
            )
            result["irf3d_gx1_family_cell_steps_per_second"] = round(
                fam_t * x_nz * x_nlat * x_nlon * x_steps / fam_s
            )
            result["irf3d_gx1_family_actual_hbm_gbps"] = round(
                fam_year.hbm_bytes_per_step * x_steps / fam_s / 1.0e9, 1
            )
        except Exception as exc:  # noqa: BLE001
            result["irf3d_gx1_family_bench_error"] = (
                f"{type(exc).__name__}: {exc}"
            )
    _mark("gx1_family")

    # SEASONAL gx1: monthly circulation + monthly vertical mixing streamed
    # as per-block 3-month windows (the reference's setup can only
    # ncra-collapse monthly IRF output to an annual mean).  Timing +
    # finite check only -- accuracy vs the seasonal scan is pinned by
    # tests/test_transport3d_pallas.py (measured on chip rel 4.6e-7).
    # need tuned on data: ~60-80 s warm, ~330 s on a cache miss, and a
    # DEGRADED tunnel inflates it further (one session measured >500 s
    # and drew a watchdog kill that cost the precond sections) -- so the
    # gate demands the bad-weather figure and defers to the reserved
    # precond sections otherwise; the seasonal number is already pinned
    # in BENCH_r04 and this round's rehearsal logs
    if extras_on and on_accel and x_y0 is not None and _gate("gx1_seasonal", 350):
        try:
            from newton_krylov_ooc_tpu.models.irf_offline import synthetic
            from newton_krylov_ooc_tpu.ops.transport3d import (
                build_transport3d,
                mask_vmix_coeff,
                vmix_vertical_coeff,
            )
            from newton_krylov_ooc_tpu.ops.transport3d_stream_pallas import (
                build_transport3d_year_stream,
            )

            xs_circ = synthetic.gen_circulation(
                x_nz, x_nlat, x_nlon, n_seasons=12
            )
            xs_coef = build_transport3d(
                xs_circ["mask"], xs_circ["dz"], xs_circ["TAREA"],
                uet=xs_circ["UET"], vnt=xs_circ["VNT"],
                wtt=xs_circ["WTT"], hdiff_e=xs_circ["HDIFF_E"],
                hdiff_n=xs_circ["HDIFF_N"],
            )
            xs_kv, xs_dzr = vmix_vertical_coeff(
                xs_circ["VDC"], xs_circ["dz"]
            )
            xs_kv = mask_vmix_coeff(xs_kv, xs_circ["mask"])
            xs_steps = max(2000, synthetic.stable_steps_per_year(xs_circ))
            xs_year = build_transport3d_year_stream(
                xs_coef, xs_kv, xs_dzr, None, None, (0.0, year),
                xs_steps, t_dim=1,
                recip_area=1.0 / np.asarray(xs_circ["TAREA"]),
                recip_dz=1.0 / np.asarray(xs_circ["dz"]),
            )
            # the seasonal circulation's wet mask differs from the steady
            # one's -- regenerate y0 under ITS mask so the run integrates a
            # consistent state (dry cells start zero and stay zero)
            wet_xs = (np.asarray(xs_circ["mask"]) > 0).astype(np.float32)
            y0_xs = jnp.asarray(
                np.asarray(x_y0).reshape(1, x_nz, x_nlat, x_nlon) * wet_xs
            )
            out_xs = xs_year(y0_xs)
            out_xs.block_until_ready()
            assert np.isfinite(np.asarray(out_xs)).all()
            start = time.time()
            xs_year(y0_xs).block_until_ready()
            xs_s = time.time() - start
            result["irf3d_gx1_seasonal_stream_seconds"] = round(xs_s, 4)
            result["irf3d_gx1_seasonal_stream_cell_steps_per_second"] = (
                round(x_nz * x_nlat * x_nlon * xs_steps / xs_s)
            )
            result["irf3d_gx1_seasonal_ms_per_step"] = round(
                xs_s / xs_steps * 1.0e3, 4
            )
            result["irf3d_gx1_seasonal_actual_hbm_gbps"] = round(
                xs_year.hbm_bytes_per_step * xs_steps / xs_s / 1.0e9, 1
            )
        except Exception as exc:  # noqa: BLE001
            result["irf3d_gx1_seasonal_bench_error"] = (
                f"{type(exc).__name__}: {exc}"
            )
    _mark("gx1_seasonal")



    # ---- NK_BENCH_FULL=1 extras: structurally interesting but stable
    # round-to-round numbers, kept out of the default budget.
    if extras_on and full_on:
        from newton_krylov_ooc_tpu.models.py_driver_2d import physics
        from newton_krylov_ooc_tpu.models.py_driver_2d.iage import (
            SURF_SLOW_FACTOR as ssf,
            surf_restore_rate,
        )

        # million-cell scaling point.  The fine ypos spacing (2.5 km) puts
        # hourly steps OUTSIDE the explicit lateral-diffusion stability
        # bound dt <= dy^2/(2K) ~ 3125 s -- the step count refines until
        # the Heun half is comfortably stable, and the output is checked
        # finite (an unstable run "benchmarks" NaNs).
        try:
            from newton_krylov_ooc_tpu.ops.imex_pallas import (
                build_iage_year_pallas_v2,
            )

            bz, by = 256, 2000
            bdepth, bypos = build_axes(bz, by)
            big_steps = stable_step_count(bypos, N_STEPS)
            bgrid = physics.make_grid(bdepth, bypos, modelinfo, jnp.float32)
            brate = surf_restore_rate(bdepth)
            bdiag = np.zeros((2, bz, by), np.float32)
            bdiag[0, 0, :] = -brate
            bdiag[1, 0, :] = -ssf * brate
            bsrc = np.full((2, 1, 1), 1.0 / year, np.float32)
            bigfn = build_iage_year_pallas_v2(
                bgrid, bdiag, bsrc, (0.0, year), big_steps
            )
            big0 = jnp.asarray(np.full((2, bz, by), 0.5, np.float32))
            out_big = bigfn(big0)
            out_big.block_until_ready()
            assert np.isfinite(np.asarray(out_big)).all()
            times = []
            for _ in range(2):
                start = time.time()
                bigfn(big0).block_until_ready()
                times.append(time.time() - start)
            result["million_cell_year_seconds"] = round(min(times), 4)
            result["million_cell_n_steps"] = big_steps
            result["cell_steps_per_second"] = round(
                2 * bz * by * big_steps / min(times)
            )
        except Exception as exc:  # noqa: BLE001
            result["scale_bench_error"] = f"{type(exc).__name__}: {exc}"

        # sharded million-cell year: the spatial-decomposition path that
        # scales past one chip (parallel/sharded_year.py) on a 1-device
        # mesh, running VMEM-resident step blocks between halo exchanges.
        try:
            from newton_krylov_ooc_tpu.parallel.mesh import make_mesh
            from newton_krylov_ooc_tpu.parallel.sharded_year import (
                build_sharded_year_pallas,
            )

            sz, sy = 256, 2000
            sdepth, sypos = build_axes(sz, sy)
            s_steps2 = stable_step_count(sypos, N_STEPS)
            mesh1 = make_mesh(
                n_module=1, n_space=1, devices=[jax.devices()[0]]
            )
            srate = surf_restore_rate(sdepth)
            sdiag = np.zeros((1, 2, sz, sy), np.float32)
            sdiag[:, 0, 0, :] = -srate
            sdiag[:, 1, 0, :] = -ssf * srate
            saging = np.full((1, 2), 1.0 / year, np.float32)
            spfn = build_sharded_year_pallas(
                mesh1, sdepth, sypos, modelinfo, sdiag, saging,
                (0.0, year), s_steps2, block_steps=8,
            )
            s0 = jax.device_put(
                jnp.asarray(np.full((1, 2, sz, sy), 0.5, np.float32)),
                jax.sharding.NamedSharding(
                    mesh1,
                    jax.sharding.PartitionSpec("module", None, None, "space"),
                ),
            )
            out_sp = spfn(s0)
            out_sp.block_until_ready()
            assert np.isfinite(np.asarray(out_sp)).all()
            start = time.time()
            spfn(s0).block_until_ready()
            result["sharded_pallas_million_cell_year_seconds"] = round(
                time.time() - start, 4
            )
        except Exception as exc:  # noqa: BLE001
            result["sharded_bench_error"] = f"{type(exc).__name__}: {exc}"

        # SEASONAL whole-year megakernel at the largest gx3-class seasonal
        # extent that fits one core's VMEM with 12-month residency rings
        # (the reference can only run the ncra-collapsed annual mean).
        if on_accel:
            try:
                from newton_krylov_ooc_tpu.models.irf_offline import synthetic
                from newton_krylov_ooc_tpu.ops.transport3d import (
                    build_transport3d,
                    mask_vmix_coeff,
                    vmix_vertical_coeff,
                )
                from newton_krylov_ooc_tpu.ops.transport3d_pallas import (
                    build_transport3d_year_pallas,
                )

                m_nz, m_nlat, m_nlon = 60, 88, 100
                circ_s = synthetic.gen_circulation(
                    m_nz, m_nlat, m_nlon, n_seasons=12
                )
                coef_s = build_transport3d(
                    circ_s["mask"], circ_s["dz"], circ_s["TAREA"],
                    uet=circ_s["UET"], vnt=circ_s["VNT"], wtt=circ_s["WTT"],
                    hdiff_e=circ_s["HDIFF_E"], hdiff_n=circ_s["HDIFF_N"],
                )
                kv_s, dzr_s = vmix_vertical_coeff(
                    circ_s["VDC"], circ_s["dz"]
                )
                kv_s = mask_vmix_coeff(kv_s, circ_s["mask"])
                steps_s = max(1460, synthetic.stable_steps_per_year(circ_s))
                diag_s = np.zeros((1, m_nz, m_nlat * m_nlon), np.float32)
                season_year = build_transport3d_year_pallas(
                    coef_s, kv_s, dzr_s, diag_s, diag_s, (0.0, year), steps_s
                )
                wet_s = (np.asarray(circ_s["mask"]) > 0).astype(np.float32)
                y0_s = jnp.asarray(
                    np.random.default_rng(5)
                    .uniform(0.0, 1.0, (1, m_nz, m_nlat, m_nlon))
                    .astype(np.float32)
                    * wet_s
                )
                out_s = season_year(y0_s)
                out_s.block_until_ready()
                assert np.isfinite(np.asarray(out_s)).all()
                times_s = []
                for _ in range(2):
                    start = time.time()
                    season_year(y0_s).block_until_ready()
                    times_s.append(time.time() - start)
                result["irf3d_seasonal_year_pallas_seconds"] = round(
                    min(times_s), 4
                )
                result["irf3d_seasonal_cells"] = m_nz * m_nlat * m_nlon
                result["irf3d_seasonal_n_steps"] = steps_s
                result["irf3d_seasonal_pallas_cell_steps_per_second"] = round(
                    m_nz * m_nlat * m_nlon * steps_s / min(times_s)
                )
            except Exception as exc:  # noqa: BLE001
                result["irf3d_seasonal_bench_error"] = (
                    f"{type(exc).__name__}: {exc}"
                )
        _mark("full_extras")

    # ---- device sparse preconditioner solve through the REAL pipeline:
    # synthetic IRF circulation -> native gen_A assembly -> ops/sparse
    # BiCGSTAB, comparing the pointwise-Jacobi baseline to the
    # vertical-line (column tridiagonal) preconditioner gen_A's recorded
    # grid decomposition enables, plus the f32-inner/f64-refinement mixed
    # mode.  MUST STAY LAST: these solves claim float64 semantics, so x64
    # is enabled here -- after every f32 kernel entry has been measured --
    # and never turned back off.
    if extras_on and _gate(
        "precond_gx3", 120, reserve=0.0
    ) and os.path.exists(gen_a_bin):
        try:
            import subprocess
            import tempfile

            from newton_krylov_ooc_tpu.models.irf_offline import synthetic
            from newton_krylov_ooc_tpu.ops.sparse import solve_csr_systems
            from newton_krylov_ooc_tpu.utils.ncio import NCFile

            jax.config.update("jax_enable_x64", True)

            def _gen_a_matrix(p_nz, p_nlat, p_nlon, keep_dir=None):
                """assemble the precond matrix through the native gen_A
                pipeline at the given extents; returns the CSR arrays
                (and writes into keep_dir when given, so the native
                solver can be timed on the same matrix file)"""
                circ_p = synthetic.gen_circulation(p_nz, p_nlat, p_nlon)
                with tempfile.TemporaryDirectory() as tmp:
                    work = keep_dir or tmp
                    circ_fname = os.path.join(work, "irf.nc")
                    grid_fname = os.path.join(work, "grid_vars.nc")
                    synthetic.write_circulation(circ_fname, circ_p)
                    synthetic.write_grid_vars(grid_fname, circ_p)
                    opts_fname = os.path.join(work, "matrix.opts")
                    with open(opts_fname, "w", encoding="utf-8") as fobj:
                        fobj.write(
                            "day_cnt 365\n"
                            f"reg_fname {grid_fname}\n"
                            f"circ_fname {circ_fname}\n"
                            "vmix_type file VDC\n"
                            "adv_type upwind3\n"
                            "hmix_type isop_file\n"
                            "sink_type const 3.17e-10\n"
                        )
                    matrix_fname = os.path.join(work, "matrix.nc")
                    start = time.time()
                    subprocess.run(
                        [gen_a_bin, "-o", opts_fname, matrix_fname],
                        check=True,
                    )
                    gen_s = time.time() - start
                    with NCFile(matrix_fname) as fptr:
                        return (
                            fptr.var("row_ptr")[:].astype(np.int64),
                            fptr.var("col_ind")[:].astype(np.int64),
                            np.asarray(fptr.var("data")[:], np.float64),
                            fptr.var("row_to_cell")[:].astype(np.int64),
                            fptr.dimensions["grid_nhoriz"],
                            gen_s,
                        )

            p_nz, p_nlat, p_nlon = 25, 116, 100  # gx3 extents
            keep_dir = tempfile.mkdtemp(prefix="nk_bench_precond_")
            (
                row_ptr, col_ind, mat_data, row_to_cell, p_nhoriz, gen_s
            ) = _gen_a_matrix(p_nz, p_nlat, p_nlon, keep_dir=keep_dir)
            result["gen_a_gx3_assembly_seconds"] = round(gen_s, 3)

            # the native SERIAL fallback's envelope on the same matrix:
            # the reference's solve_ABdist runs this grid class as a
            # 64-rank MPI SuperLU_DIST job
            # (/root/reference/input/cime_pop/tracer_module_defs.yaml:35-37);
            # here the C++ ILU(0)-BiCGSTAB is single-process by design
            # (docs/users-guide.md) with the device path as the
            # production route -- this records where the fallback stands
            try:
                solve_bin = os.path.join(
                    os.path.dirname(gen_a_bin), "solve_ABdist"
                )
                n_rows_gx3 = len(row_ptr) - 1
                rhs_native = np.random.default_rng(23).normal(
                    size=n_rows_gx3
                )
                grid_rhs = np.zeros(p_nz * p_nlat * p_nlon)
                grid_rhs[row_to_cell] = rhs_native
                state_fname = os.path.join(keep_dir, "state.nc")
                with NCFile(state_fname, mode="w") as fptr:
                    fptr.create_dimensions_verify(
                        {"z_t": p_nz, "nlat": p_nlat, "nlon": p_nlon}
                    )
                    for suffix in ("CUR", "OLD"):
                        var = fptr.create_variable(
                            f"IAGE_{suffix}", "f8", ("z_t", "nlat", "nlon")
                        )
                        var[:] = grid_rhs.reshape(p_nz, p_nlat, p_nlon)
                start = time.time()
                subprocess.run(
                    [
                        solve_bin, "-n", "1,1", "-v", "IAGE_CUR",
                        os.path.join(keep_dir, "matrix.nc"), state_fname,
                    ],
                    check=True,
                    timeout=max(30.0, min(180.0, _left() - 120.0)),
                )
                result["precond_gx3_native_serial_solve_seconds"] = round(
                    time.time() - start, 3
                )
                with NCFile(state_fname) as fptr:
                    x_native = np.asarray(
                        fptr.var("IAGE_CUR")[:]
                    ).reshape(-1)[row_to_cell]
                # level-scheduled ILU(0) threads the WHOLE BiCGSTAB
                # iteration (factorization + triangular solves + matvecs
                # + axpys); -n maps the reference's nprow,npcol grid onto
                # the thread pool.  host_cpus is recorded because the
                # scaling this measures is bounded by it (the round-4/5
                # bench host has ONE core, so parity here is expected,
                # not a defect).
                n_thr = min(4, os.cpu_count() or 1)
                start = time.time()
                subprocess.run(
                    [
                        solve_bin, "-n", f"{n_thr},1", "-v", "IAGE_CUR",
                        os.path.join(keep_dir, "matrix.nc"), state_fname,
                    ],
                    check=True,
                    timeout=max(30.0, min(180.0, _left() - 90.0)),
                )
                result["precond_gx3_native_threads_solve_seconds"] = round(
                    time.time() - start, 3
                )
                result["precond_gx3_native_thread_count"] = n_thr
                result["precond_native_host_cpus"] = os.cpu_count()
                from scipy import sparse as _spn

                mat_n = _spn.csr_matrix(
                    (mat_data, col_ind, row_ptr),
                    shape=(n_rows_gx3, n_rows_gx3),
                )
                result["precond_gx3_native_rel_resid"] = float(
                    np.linalg.norm(rhs_native - mat_n @ x_native)
                    / np.linalg.norm(rhs_native)
                )
            except Exception as exc:  # noqa: BLE001
                result["precond_gx3_native_bench_error"] = (
                    f"{type(exc).__name__}: {exc}"
                )
            finally:
                import shutil

                shutil.rmtree(keep_dir, ignore_errors=True)
            rng_p = np.random.default_rng(17)
            rhs_p = rng_p.normal(size=(2, len(row_ptr) - 1))

            def _timed_solve(label, warm=True, **kwargs):
                """warm (compile) once, then time; returns the solution"""
                if warm:
                    solve_csr_systems(
                        row_ptr, col_ind, mat_data, rhs_p,
                        return_iters=True, **kwargs,
                    )
                start = time.time()
                x, ok, iters = solve_csr_systems(
                    row_ptr, col_ind, mat_data, rhs_p,
                    return_iters=True, **kwargs,
                )
                result[f"precond_gx3_{label}_solve_seconds"] = round(
                    time.time() - start, 3
                )
                result[f"precond_gx3_{label}_iters"] = int(iters.max())
                result[f"precond_gx3_{label}_converged"] = bool(ok.all())
                return x, bool(ok.all())

            x_l, ok_l = _timed_solve(
                "line", row_to_cell=row_to_cell, nhoriz=p_nhoriz
            )
            # mixed precision: f32 inner BiCGSTAB (the fast TPU arithmetic)
            # in an f64 iterative-refinement loop
            x_m, ok_m = _timed_solve(
                "mixed", row_to_cell=row_to_cell, nhoriz=p_nhoriz,
                mixed_precision=True,
            )
            if ok_l and ok_m:
                result["precond_gx3_mixed_vs_f64_rel"] = float(
                    np.abs(x_m - x_l).max() / np.abs(x_l).max()
                )
            # Jacobi baseline on the SAME gather-free DIA matvec (the
            # preconditioners differ, nothing else), iteration-capped so a
            # CPU fallback stays inside the bench watchdog; the cap itself
            # documents the gap.  No warm run: a second capped solve would
            # double the bench's slowest phase, so its seconds include one
            # compile
            x_j, ok_j = _timed_solve(
                "jacobi", warm=False, row_to_cell=row_to_cell,
                nhoriz=p_nhoriz, precond="jacobi", max_iter=2500,
            )
            if ok_j:
                result["precond_gx3_line_vs_jacobi_rel"] = float(
                    np.abs(x_l - x_j).max() / np.abs(x_j).max()
                )
        except Exception as exc:  # noqa: BLE001
            result["precond_bench_error"] = f"{type(exc).__name__}: {exc}"
        _mark("precond_gx3")

        # gx1-scale device precond solve: the workload the reference sizes
        # 256 MPI ranks of SuperLU_DIST for
        # (/root/reference/input/cime_pop/tracer_module_defs.yaml:31-34;
        # nk_ooc/cime_pop/model_state.py:317-337), as one single-chip
        # ELL/DIA BiCGSTAB with the vertical-line preconditioner.
        # Accelerator only: the matrix alone is ~GB-scale.
        # need tuned on data: gen_A assembly ~20-40 s after the sort-based
        # rebuild, device solve ~30 s warm-cached, host residual ~15 s
        if on_accel and _gate("precond_gx1", 110, reserve=0.0):
            try:
                q_nz, q_nlat, q_nlon = 25, 384, 320  # gx1 precond extents
                (
                    row_ptr, col_ind, mat_data, row_to_cell, q_nhoriz, gen_s
                ) = _gen_a_matrix(q_nz, q_nlat, q_nlon)
                result["gen_a_gx1_assembly_seconds"] = round(gen_s, 3)
                result["precond_gx1_rows"] = len(row_ptr) - 1
                rng_q = np.random.default_rng(19)
                rhs_q = rng_q.normal(size=(1, len(row_ptr) - 1))
                from newton_krylov_ooc_tpu.ops.sparse import (
                    solve_csr_systems as _solve,
                )

                start = time.time()
                x_q, ok_q, it_q = _solve(
                    row_ptr, col_ind, mat_data, rhs_q, return_iters=True,
                    row_to_cell=row_to_cell, nhoriz=q_nhoriz,
                )
                result["precond_gx1_line_solve_seconds"] = round(
                    time.time() - start, 3
                )
                result["precond_gx1_line_iters"] = int(it_q.max())
                result["precond_gx1_line_converged"] = bool(ok_q.all())
                # residual check against the tolerance the reference's
                # solve_ABdist accepts (host-side CSR matvec)
                from scipy import sparse as _sp

                mat_q = _sp.csr_matrix(
                    (mat_data, col_ind, row_ptr),
                    shape=(len(row_ptr) - 1, len(row_ptr) - 1),
                )
                r_q = rhs_q - np.asarray(x_q) @ mat_q.T
                result["precond_gx1_rel_resid"] = float(
                    np.linalg.norm(r_q) / np.linalg.norm(rhs_q)
                )
            except Exception as exc:  # noqa: BLE001
                result["precond_gx1_bench_error"] = (
                    f"{type(exc).__name__}: {exc}"
                )
        _mark("precond_gx1")

    # final blocking harvest of the niced scipy-baseline subprocess: it
    # has had the whole run's idle windows; give it the remaining budget
    # (capped) before the record goes out with the labeled prior figure
    if cpu_proc is not None:
        _try_cpu_baseline(min(150.0, max(1.0, _left())))
        _mark("cpu_baseline_final")

    emit()


if __name__ == "__main__":
    if os.environ.get("NK_BENCH_CPU_BASELINE"):
        _cpu_baseline_child()
    elif os.environ.get("NK_BENCH_CHILD"):
        main()
    else:
        _run_with_watchdog()

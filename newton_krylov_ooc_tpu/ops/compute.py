"""compute-placement helpers: precision (float64, CPU or TPU-emulated) vs fast
(float32, TPU) paths, and the persistent compilation cache.

The reference runs everything in float64 on CPU.  Here the driver-facing
"precision" path integrates on the host CPU backend in float64 (TPU f64 dense
LU is unsupported by XLA); the flagship "fast" path runs float32 on the TPU.
The persistent compilation cache makes the exit-and-reinvoke out-of-core mode
cheap: re-invoked processes reuse compiled executables.
"""

from __future__ import annotations

import os

import jax


def ensure_x64(cpu_only=True):
    """enable float64 (process-global); called by CLI entry points

    cpu_only=True also pins the process to the CPU backend: the precision
    (float64) path never uses the accelerator, and initializing the TPU client
    would serialize concurrent solver processes on the single-chip lock.  The
    float32 accelerator fast path opts in explicitly (see bench/incore).
    """
    if cpu_only and os.environ.get("NK_TPU_FORCE_ACCEL", "0") != "1":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # noqa: BLE001  (already initialized with a backend)
            pass
    jax.config.update("jax_enable_x64", True)


def enable_persistent_cache(cache_dir=None):
    """enable JAX's persistent compilation cache (survives exit/reinvoke)"""
    if cache_dir is None:
        cache_dir = os.environ.get(
            "NK_TPU_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "nk_tpu_jax"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def cpu_device():
    return jax.devices("cpu")[0]


def default_accelerator():
    """first non-CPU device if present, else CPU"""
    for dev in jax.devices():
        if dev.platform != "cpu":
            return dev
    return cpu_device()

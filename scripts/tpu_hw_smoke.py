"""Hardware smoke of the sharded streaming-year sweep kernel: compile +
run build_sharded_transport3d_year_stream (steady+coupled,
seasonal+coupled, and stencil modes) on the real TPU with a 1-shard
mesh, pinned against the unsharded scan.

Why this exists: the CI suite exercises these kernels in pallas
interpret mode on CPU, and interpret mode once masked a Mosaic
scatter-add lowering bug that only hardware caught.  Run this after any
sweep-kernel change when a chip is available:

    python scripts/tpu_hw_smoke.py
"""
import sys, time
import os
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
)
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from newton_krylov_ooc_tpu.models.irf_offline import synthetic
from newton_krylov_ooc_tpu.ops.imex import imex_year
from newton_krylov_ooc_tpu.ops.transport3d import (
    assemble_rate_fields, build_transport3d, interp_month,
    interp_transport_coef, mask_vmix_coeff, transport_tend,
    vmix_vertical_coeff,
)
from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
    build_sharded_transport3d_year_stream,
)

YEAR = 365.0 * 86400.0
nz, nlat, nlon = 8, 32, 128
n_steps = 96
dev = jax.devices()[0]
print("device:", dev, flush=True)
mesh = Mesh(np.asarray([dev]), ("space",))

for label, n_seasons, stencil in (
    ("steady+coupled", 0, False),
    ("seasonal+coupled", 4, False),
    ("steady stencil", 0, True),
):
    kw = {"n_seasons": n_seasons} if n_seasons else {}
    circ = synthetic.gen_circulation(nz, nlat, nlon, **kw)
    steps = max(n_steps, synthetic.stable_steps_per_year(circ))
    coef = build_transport3d(
        circ["mask"], circ["dz"], circ["TAREA"], uet=circ["UET"],
        vnt=circ["VNT"], wtt=circ["WTT"], hdiff_e=circ["HDIFF_E"],
        hdiff_n=circ["HDIFF_N"],
    )
    kv, dz_r = vmix_vertical_coeff(circ["VDC"], circ["dz"])
    kv = mask_vmix_coeff(kv, circ["mask"])
    wet = (np.asarray(circ["mask"]) > 0).astype(np.float64)
    diag, src, couple = assemble_rate_fields(
        [
            {"name": "DIC", "surf_restore_pv_cm_s": 2.0e-4,
             "surf_restore_target": 1.0, "surf_flux_d": {"DIC14": 1.5e-4}},
            {"name": "DIC14", "sink_rate_per_year": 1.2097e-4},
        ],
        wet.reshape(nz, -1), float(circ["dz"][0]), YEAR,
    )
    if stencil:
        couple = None  # stencil smoke without coupling too
    t_dim = 2
    rng = np.random.default_rng(5)
    y0 = rng.uniform(0.0, 1.0, (t_dim, nz, nlat, nlon)) * wet

    seasonal = np.asarray(circ["UET"]).ndim == 4
    wet_surf = wet[0].reshape(-1)
    couple_j = jnp.asarray(couple) if couple is not None else None

    def tend(t, y):
        c = (
            interp_transport_coef(coef, jnp.mod(t / YEAR, 1.0))
            if seasonal else coef
        )
        y3 = y.reshape(y.shape[:-1] + (nlat, nlon))
        out = transport_tend(c, y3).reshape(y.shape) + jnp.asarray(src)
        if couple_j is not None:
            sflux = wet_surf * jnp.einsum(
                "xy,yh->xh", couple_j, y[:, 0, :]
            )
            out = out.at[:, 0, :].add(sflux)
        return out

    kv_fn = (
        (lambda t: interp_month(jnp.asarray(kv), jnp.mod(t / YEAR, 1.0)))
        if np.asarray(kv).ndim == 3
        else (lambda t: jnp.asarray(kv))
    )
    expected = np.asarray(
        imex_year(
            tend, kv_fn, jnp.asarray(diag), jnp.asarray(dz_r),
            jnp.asarray(y0.reshape(t_dim, nz, nlat * nlon)),
            (0.0, YEAR), steps,
        )
    ).reshape(t_dim, nz, nlat, nlon)

    t0 = time.time()
    fn = build_sharded_transport3d_year_stream(
        mesh, coef, kv, dz_r, diag, src, (0.0, YEAR), steps,
        block_rows=8, steps_per_sweep=1, couple=couple, stencil=stencil,
    )
    y_dev = jax.device_put(
        jnp.asarray(y0, jnp.float32),
        NamedSharding(mesh, P(None, None, "space", None)),
    )
    got = np.asarray(fn(y_dev))
    dt = time.time() - t0
    scale = np.abs(expected).max()
    rel = np.abs(got - expected).max() / scale
    dry = np.abs(got * (1.0 - wet)).max()
    status = "OK" if rel < (5e-4 if stencil else 1e-4) and dry == 0 else "FAIL"
    print(f"{label}: {status} rel {rel:.2e} dry {dry:.1e} "
          f"(compile+run {dt:.0f}s, steps {steps})", flush=True)
    assert status == "OK", label
print("sweep hardware smoke PASSED", flush=True)

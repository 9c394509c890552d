#!/usr/bin/env python
"""3D offline IRF-transport spin-up: the cime_pop-class workload on device.

A family of tracer modules (a decaying dye, an ideal-age tracer, and the
gas-exchange-coupled abiotic DIC+DIC14 pair) rides a synthetic seasonal
gyre circulation and solves to its cyclostationary state with the whole
Newton-Krylov stack on the accelerator: the latitude-sharded IMEX year
(ppermute halos for the upwind3 stencil), exact linear JVPs, jitted GMRES,
and the column-local PCR vertical preconditioner.  The reference runs this
class of problem by submitting POP to a batch scheduler dozens of times
(/root/reference/nk_ooc/cime_pop/model_state.py:124-167).

    python examples/irf3d_spinup.py [nz] [nlat] [nlon] [shards] [months]

`shards` is a device count (latitude-sharded) or `NYxNX` for a 2D
lat x lon process grid (the reference's nprow x npcol decomposition).
For a multi-chip dry run without TPU hardware:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/irf3d_spinup.py 6 16 12 2x2 4
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

import numpy as np


def main():
    nz = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    nlat = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    nlon = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    shards = sys.argv[4] if len(sys.argv) > 4 else "1"
    months = int(sys.argv[5]) if len(sys.argv) > 5 else 4

    import jax

    # Some PJRT plugins ignore the JAX_PLATFORMS env var; re-assert it via
    # jax.config so `JAX_PLATFORMS=cpu` reliably forces the virtual mesh.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp
    from jax.sharding import Mesh

    from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore
    from newton_krylov_ooc_tpu.models.irf_offline import synthetic
    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        ShardedTransport3dKernel,
    )

    circ = synthetic.gen_circulation(
        nz, nlat, nlon, n_seasons=months or None
    )
    n_steps = synthetic.stable_steps_per_year(circ)
    if "x" in shards:
        n_y, n_x = (int(v) for v in shards.split("x"))
    else:
        n_y, n_x = int(shards), None
    print(
        f"grid {nz}x{nlat}x{nlon}, {months or 'steady'} season(s), "
        f"{n_steps} steps/year, "
        + (f"{n_y}x{n_x} process grid" if n_x else f"{n_y} shard(s)")
    )

    # one family: every module shares the transport, differs in its rates
    specs = [
        [{"name": "DYE", "source_per_year": 0.1, "sink_rate_per_year": 0.5}],
        [{"name": "IAGE", "source_per_year": 1.0,
          "surf_restore_pv_cm_s": 5.0e-3}],
    ]
    n_devices = n_y * (n_x or 1)
    if len(jax.devices()) < n_devices:
        raise SystemExit(
            f"{n_devices} shards requested but only "
            f"{len(jax.devices())} devices visible"
        )
    devices = jax.devices()[:n_devices]
    if n_x:
        mesh = Mesh(
            np.asarray(devices).reshape(n_y, n_x), ("space", "space_x")
        )
    else:
        mesh = Mesh(np.asarray(devices), ("space",))
    kernel = ShardedTransport3dKernel(
        mesh, circ, specs, n_steps=n_steps, dtype=jnp.result_type(float)
    )
    solver = NewtonKrylovInCore(
        kernel,
        newton_rel_tol=1e-6,
        krylov_rel_tol=1e-3,
        newton_max_iter=8,
        krylov_max_dim=40,
        jit_gmres=True,
    )

    start = time.time()
    x, fcn, info = solver.solve(kernel.init_iterate())
    jax.block_until_ready(x)
    elapsed = time.time() - start
    rel = np.asarray(info["fcn_norm"]) / np.asarray(info["x_norm"])
    print(
        f"spun up {len(specs)} modules in {elapsed:.2f} s on "
        f"{devices[0].platform}: max rel residual {rel.max():.2e}, "
        f"newton iterations {info['iterations']}"
    )

    # the coupled gas-exchange pair, solved the same way
    abio = [[
        {"name": "ABIO_DIC", "surf_flux_const_cm_s": 1.05e-2,
         "surf_flux_d": {"ABIO_DIC": -5.0e-3}},
        {"name": "ABIO_DIC14", "sink_rate_per_year": 1.2097e-4,
         "surf_flux_d": {"ABIO_DIC": 4.25e-3, "ABIO_DIC14": -5.0e-3}},
    ]]
    kernel2 = ShardedTransport3dKernel(
        mesh, circ, abio, n_steps=n_steps, dtype=jnp.result_type(float)
    )
    solver2 = NewtonKrylovInCore(
        kernel2,
        newton_rel_tol=1e-6,
        krylov_rel_tol=1e-3,
        newton_max_iter=8,
        krylov_max_dim=40,
        jit_gmres=True,
    )
    start = time.time()
    x2, _fcn2, info2 = solver2.solve(kernel2.init_iterate())
    jax.block_until_ready(x2)
    rel2 = np.asarray(info2["fcn_norm"]) / np.asarray(info2["x_norm"])
    surf = np.asarray(x2)[0, :, 0]
    wet0 = np.asarray(circ["mask"])[0] > 0
    ratio = (surf[1][wet0] / surf[0][wet0]).mean()
    print(
        f"abio_dic_dic14 spun up in {time.time() - start:.2f} s: "
        f"max rel residual {rel2.max():.2e}, "
        f"mean surface DIC14/DIC ratio {ratio:.3f} "
        f"(gas-exchange balance 0.85)"
    )


if __name__ == "__main__":
    main()

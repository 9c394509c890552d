#!/usr/bin/env python
"""multi-chip spin-up: the full Newton-Krylov solve on sharded state.

A batch of parameterized iage-family modules shards over the mesh's
'module' axis while the ypos grid dimension shards over 'space'; the IMEX
year runs under shard_map (ppermute halo exchange, shard-local vertical
solves) and the whole Krylov iteration is one jitted device call
(jit_gmres).  On a single chip this runs the same code path on a 1-device
mesh -- tests/test_sharded_year.py pins mesh-shape independence of the
iterates.

    python examples/sharded_spinup.py [n_module] [n_space] [ny] [n_steps]

With more chips than the default (1, 1), the mesh spans them; for a dry
run without TPU hardware:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_spinup.py 2 4 16 365
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

import numpy as np


def main():
    n_module = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_space = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    ny = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    n_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 2920

    import jax

    # some TPU plugins ignore JAX_PLATFORMS from the environment; honor it
    # explicitly so the dry-run invocation above works everywhere
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore
    from newton_krylov_ooc_tpu.core.spatial_axis import (
        spatial_axis_defn_dict,
        spatial_axis_from_defn_dict,
    )
    from newton_krylov_ooc_tpu.parallel import ShardedIageKernel, make_mesh

    depth = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            nlevs=24, edge_end=4000.0, delta_ratio_max=19.0
        )
    )
    ypos = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            axisname="ypos",
            nlevs=ny,
            edge_start=0.0,
            edge_end=50.0e5,
            delta_ratio_max=1.0,
            units="m",
        )
    )

    devices = jax.devices()[: n_module * n_space]
    mesh = make_mesh(n_module=n_module, n_space=n_space, devices=devices)
    year = 365.0 * 86400.0
    # a parameterized module family: aging rates 1.0 .. 1.75 yr/yr
    rates = (1.0 + 0.25 * np.arange(4 * n_module)) / year

    kernel = ShardedIageKernel(
        mesh,
        depth,
        ypos,
        {"max_abs_vvel": "0.1", "horiz_mix_coeff": "1000.0"},
        rates,
        n_steps=n_steps,
    )
    solver = NewtonKrylovInCore(
        kernel,
        newton_rel_tol=1e-4,  # float32-appropriate (use x64 + dtype for tighter)
        krylov_rel_tol=1e-3,
        newton_max_iter=12,
        krylov_max_dim=30,
        jit_gmres=True,
    )

    print(
        f"mesh: {n_module} module x {n_space} space over "
        f"{len(devices)} device(s); state "
        f"({len(rates)}, 2, {len(depth)}, {ny}); {n_steps} steps/year"
    )
    start = time.time()
    x, fcn, info = solver.solve(kernel.init_iterate())
    elapsed = time.time() - start
    rel = np.asarray(info["fcn_norm"]) / np.asarray(info["x_norm"])
    print(
        f"converged in {info['iterations']} Newton iterations, "
        f"{elapsed:.1f} s wall-clock (incl. compilation); "
        f"max rel residual {rel.max():.2e}"
    )
    print("surface age by module (years):", np.asarray(x)[:, 0, 0, 0].round(3))


if __name__ == "__main__":
    main()

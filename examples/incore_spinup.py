#!/usr/bin/env python
"""device-resident Newton-Krylov spin-up of py_driver_2d iage.

The flagship TPU path: IMEX year kernel, exact jax.jvp Jacobian-vector
products, on-device GMRES, float32 with Kahan-compensated accumulation.
Run on the default accelerator:

    python examples/incore_spinup.py [nz] [ny] [n_steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    nz = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 4380

    from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore
    from newton_krylov_ooc_tpu.core.spatial_axis import (
        spatial_axis_defn_dict,
        spatial_axis_from_defn_dict,
    )
    from newton_krylov_ooc_tpu.models.py_driver_2d.incore import IageKernel

    depth = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            nlevs=nz, edge_end=4000.0, delta_ratio_max=19.0
        )
    )
    ypos = spatial_axis_from_defn_dict(
        defn_dict=spatial_axis_defn_dict(
            axisname="ypos", nlevs=ny, edge_start=0.0, edge_end=50.0e5,
            delta_ratio_max=1.0, units="m",
        )
    )
    print(f"grid {nz}x{ny}, {n_steps} IMEX steps/year, device {jax.devices()[0]}")

    kernel = IageKernel(
        depth, ypos,
        {"max_abs_vvel": "0.1", "horiz_mix_coeff": "1000.0"},
        dtype=jnp.float32, n_steps=n_steps,
    )
    solver = NewtonKrylovInCore(
        kernel, newton_rel_tol=3e-5, krylov_rel_tol=1e-2, newton_max_iter=8
    )

    start = time.time()
    x, fcn, info = solver.solve(kernel.init_iterate())
    elapsed = time.time() - start

    rel = float((info["fcn_norm"] / info["x_norm"]).max())
    print(
        f"converged in {info['iterations']} Newton iterations, "
        f"{elapsed:.1f}s wall; final rel resid {rel:.2e}"
    )
    print(f"spun-up max ideal age: {float(jnp.max(x)):.1f} years")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""perf probe for the pallas IMEX year kernel: time variants on the device.

Not part of the benchmark; a scratch harness for kernel experiments.
Usage: python scripts/perf_probe.py [n_steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from newton_krylov_ooc_tpu.models.py_driver_2d import physics
    from newton_krylov_ooc_tpu.models.py_driver_2d.iage import (
        SURF_SLOW_FACTOR,
        surf_restore_rate,
    )
    from newton_krylov_ooc_tpu.ops import imex_pallas

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8760
    nz, ny = 40, 50
    from __graft_entry__ import _axes

    depth, ypos = _axes(nz, ny)
    modelinfo = {"max_abs_vvel": "0.1", "horiz_mix_coeff": "1000.0"}
    grid = physics.make_grid(depth, ypos, modelinfo, jnp.float32)
    year = physics.SEC_PER_YEAR
    rate = surf_restore_rate(depth)
    diag = np.zeros((2, nz, ny), np.float32)
    diag[0, 0, :] = -rate
    diag[1, 0, :] = -SURF_SLOW_FACTOR * rate
    source = np.full((2, 1, 1), 1.0 / year, np.float32)

    column = np.interp(depth.mid, [55.0, 200.0], [0.0, 2.0]).astype(np.float32)
    y0 = jnp.asarray(np.stack([np.broadcast_to(column[:, None], (nz, ny))] * 2))

    builders = {"baseline": imex_pallas.build_iage_year_pallas}
    for name in sorted(dir(imex_pallas)):
        if name.startswith("build_iage_year_pallas_v"):
            builders[name.rsplit("_", 1)[-1]] = getattr(imex_pallas, name)

    ref = None
    for name, builder in builders.items():
        fn = builder(grid, diag, source, (0.0, year), n_steps)
        out = fn(y0)
        out.block_until_ready()
        times = []
        for _ in range(5):
            t = time.time()
            out = fn(y0)
            out.block_until_ready()
            times.append(time.time() - t)
        out_np = np.asarray(out, np.float64)
        if ref is None:
            ref = out_np
            err = 0.0
        else:
            err = float(np.abs(out_np - ref).max() / np.abs(ref).max())
        print(
            f"{name:12s} {min(times) * 1e3:8.2f} ms "
            f"({min(times) / n_steps * 1e6:6.2f} us/step)  rel_vs_baseline={err:.2e}"
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""direct cyclo-stationary solve via the dense year-transition operator.

For linear tracer modules the one-year map is affine, year(X) = B X + c.
This example probes the exact dense B for py_driver_2d iage (every grid
basis column runs as a lane-packed channel of the batched pallas year
kernel -- the full-rank version of the reference's IRF-coloring Jacobian
probing), then solves the spin-up DIRECTLY: (I - B) X = c by Newton-Schulz
inversion on the MXU plus exact-residual polish.  No Newton iteration, no
Krylov subspace -- the whole problem collapses to dense linear algebra.

Run on the default accelerator:

    python examples/year_operator_spinup.py [nz] [ny] [n_steps] [col_chunk]

The probe is a one-time cost per (grid, time-grid, parameters); the
resulting operator also gives ~microsecond function evaluations and exact
JVPs for parameter studies and spectral analysis of the annual propagator.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

import numpy as np


def main():
    nz = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8760
    col_chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 125

    import jax.numpy as jnp

    from __graft_entry__ import _axes
    from newton_krylov_ooc_tpu.models.py_driver_2d.incore import IageKernel

    depth, ypos = _axes(nz, ny)
    modelinfo = {"max_abs_vvel": "0.1", "horiz_mix_coeff": "1000.0"}
    kernel = IageKernel(
        depth, ypos, modelinfo, dtype=jnp.float32, n_steps=n_steps
    )

    n = nz * ny  # columns per tracer; both tracers probe in the same lanes
    t0 = time.time()
    op = kernel.build_year_operator(col_chunk=col_chunk)
    op.b_mats.block_until_ready()
    print(
        f"probed B ({n} columns x 2 tracers, chunk {col_chunk}): "
        f"{time.time() - t0:.1f} s"
    )

    t0 = time.time()
    x_star = op.solve_cyclostationary()
    x_star.block_until_ready()
    print(f"direct solve (Newton-Schulz + polish): {time.time() - t0:.2f} s")

    resid = np.abs(np.asarray(kernel.comp_fcn(x_star))).max()
    scale = np.abs(np.asarray(x_star)).max()
    print(
        f"time-stepped residual |F(X*)|_max = {resid:.3e} "
        f"(|X*|_max = {scale:.1f}, relative {resid / scale:.1e})"
    )

    # spectrum of the annual propagator: the slow modes ARE the spin-up
    # problem -- their e-folding times say how many years a forward run
    # would need (and how hard the Newton solve has to work)
    t0 = time.time()
    eigvals, timescales = op.spectrum(k=5)
    print(f"propagator spectrum ({time.time() - t0:.1f} s):")
    for t, name in enumerate(("iage", "iage_slow_rest")):
        mags = ", ".join(
            f"|l|={abs(v):.4f} (tau={tau:.1f} yr)"
            for v, tau in zip(eigvals[t], timescales[t])
        )
        print(f"  {name}: {mags}")


if __name__ == "__main__":
    main()

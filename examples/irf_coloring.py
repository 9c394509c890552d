#!/usr/bin/env python
"""IRF tracer coloring: pack many impulse-response tracers into one model run.

The workflow the reference prototypes in notebooks/IRF_coloring_dev.ipynb:
estimating the columns of a transport Jacobian requires one impulse tracer per
grid cell -- unless cells whose Jacobian columns are structurally orthogonal
share a tracer.  Build the distance-2 (column-intersection) graph of the
transport stencil, color it (native C++ gcol), and the color count is the
number of impulse tracers needed for one forward run.

Run: python examples/irf_coloring.py [nz] [ny]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

import numpy as np
from scipy import sparse

from newton_krylov_ooc_tpu.ops.probing import (
    build_distance2_graph,
    color_graph,
    probe_jacobian,
)


def transport_sparsity(nz, ny):
    """sparsity of a 5-point (z+-1, y+-1) transport stencil on an nz x ny grid"""
    n = nz * ny
    rows, cols = [], []
    for z in range(nz):
        for y in range(ny):
            i = z * ny + y
            for dz, dy in [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)]:
                z2, y2 = z + dz, y + dy
                if 0 <= z2 < nz and 0 <= y2 < ny:
                    rows.append(i)
                    cols.append(z2 * ny + y2)
    return sparse.csr_matrix(
        (np.ones(len(rows)), (rows, cols)), shape=(n, n)
    )


def main():
    nz = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    n = nz * ny

    pattern = transport_sparsity(nz, ny)
    row_ptr, col_ind = build_distance2_graph(pattern)
    print(f"grid {nz}x{ny}: {n} cells, distance-2 graph with "
          f"{len(col_ind)//2} edges")

    for algorithm in ["greedy", "dsatur", "hybrid_ea"]:
        n_colors, _ = color_graph(row_ptr, col_ind, algorithm=algorithm)
        print(f"  {algorithm:12s}: {n_colors} impulse tracers "
              f"({n / n_colors:.0f}x fewer than one per cell)")

    # demonstrate exact Jacobian recovery through the coloring
    rng = np.random.default_rng(0)
    jac = pattern.multiply(rng.normal(size=(n, n))).tocsc()
    recovered, n_colors = probe_jacobian(
        lambda v: jac @ v, pattern, algorithm="dsatur"
    )
    err = np.abs(recovered - jac.toarray()).max()
    print(f"probing with {n_colors} colors: max recovery error {err:.1e}")


if __name__ == "__main__":
    main()

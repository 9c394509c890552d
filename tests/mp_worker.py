"""worker for the multi-process jax.distributed tests

Launched by tests/test_multiprocess.py as
    python tests/mp_worker.py <process_id> <num_processes> <port> <out.npz> \
        [sparse|solve3d]
with XLA_FLAGS forcing 2 CPU devices per process.  Each process bootstraps
`parallel.bootstrap` against a localhost coordinator (the DCN analog of the
reference's `mpi_cmd solve_ABdist` launch, nk_ooc/cime_pop/model_state.py:
317-337), then every process collectively runs the task over the
process-spanning global mesh:

  sparse  -- the row-sharded gen_A system solves (the reference's only
             distributed kernel, solve_ABdist)
  solve3d -- a FULL Newton-Krylov solve of the 3D IRF-transport family,
             state latitude-sharded over all four devices: sharded year
             integrations with cross-process halo ppermutes, the jitted
             GMRES with consts threaded as operands, region reductions,
             Armijo -- the whole solver on the multi-host mesh, which the
             reference cannot do at all (its Newton loop is single-rank).

Process 0 writes the result for the parent test to compare against the
single-process answer.
"""

import os
import sys


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = int(sys.argv[3])
    out_fname = sys.argv[4]
    task = sys.argv[5] if len(sys.argv) > 5 else "sparse"

    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var; the config
    # update is the reliable way to force the CPU backend
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    sys.path.insert(0, os.path.dirname(__file__))

    from newton_krylov_ooc_tpu.parallel import bootstrap

    assert bootstrap(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    ), "bootstrap must initialize jax.distributed"
    assert jax.process_count() == num_processes
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == num_processes * n_local

    if task == "sparse":
        _task_sparse(out_fname, process_id, n_global)
    elif task == "solve3d":
        _task_solve3d(out_fname, process_id, n_global)
    else:
        raise SystemExit(f"unknown task {task!r}")
    print(f"mp_worker {process_id}/{num_processes} OK", flush=True)


def _task_sparse(out_fname, process_id, n_global):
    from sparse_fixtures import grid_csr

    from newton_krylov_ooc_tpu.parallel.sharded_sparse import (
        solve_csr_systems_sharded,
    )

    row_ptr, col_ind, data, _dense, rhs, row_to_cell, nhoriz = grid_csr(
        6, 2, 4, 3, seed=21
    )
    x_line, ok_line = solve_csr_systems_sharded(
        row_ptr, col_ind, data, rhs, row_to_cell=row_to_cell, nhoriz=nhoriz
    )
    x_mixed, ok_mixed = solve_csr_systems_sharded(
        row_ptr, col_ind, data, rhs, row_to_cell=row_to_cell, nhoriz=nhoriz,
        mixed_precision=True,
    )
    x_jac, ok_jac = solve_csr_systems_sharded(row_ptr, col_ind, data, rhs)
    assert ok_line.all() and ok_mixed.all() and ok_jac.all()

    if process_id == 0:
        import numpy as np

        np.savez(
            out_fname,
            x_line=x_line,
            x_mixed=x_mixed,
            x_jac=x_jac,
            n_global_devices=n_global,
        )


def _task_solve3d(out_fname, process_id, n_global):
    import jax

    from transport3d_fixtures import solve_family

    x = solve_family(jax.devices())
    if process_id == 0:
        import numpy as np

        np.savez(out_fname, x=x, n_global_devices=n_global)


if __name__ == "__main__":
    main()

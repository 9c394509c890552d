"""real multi-process jax.distributed solves (the DCN / multi-host path)

The reference's only distributed-memory kernel runs as MPI ranks launched by
`mpi_cmd` (nk_ooc/cime_pop/model_state.py:317-337 + newton_krylov.cfg
mpi_cmd).  Here the counterpart is `parallel.bootstrap` + a process-spanning
device mesh: this test launches two fresh interpreters, each owning 2
virtual CPU devices, connects them through a localhost coordinator, and runs
the row-sharded gen_A system solves over the 4-device global mesh -- real
cross-process collectives (gloo), not the in-process 8-device simulation the
rest of the suite uses.  The result must match the single-process answer.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from sparse_fixtures import grid_csr

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port():
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as sock:
        sock.bind(("127.0.0.1", 0))
        return sock.getsockname()[1]


def _run_workers(out_fname, task, num_processes=2, timeout=600):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # belt and braces: the config update inside the worker is what actually
    # forces CPU under the axon plugin
    env["JAX_PLATFORMS"] = "cpu"

    workers = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(HERE, "mp_worker.py"),
                str(process_id),
                str(num_processes),
                str(port),
                out_fname,
                task,
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for process_id in range(num_processes)
    ]
    outputs = []
    for worker in workers:
        out, _ = worker.communicate(timeout=timeout)
        outputs.append(out)
    for process_id, (worker, out) in enumerate(zip(workers, outputs)):
        assert worker.returncode == 0, (
            f"worker {process_id} failed:\n{out}"
        )
        assert f"mp_worker {process_id}/{num_processes} OK" in out


@pytest.mark.slow
def test_two_process_sharded_solve(tmp_path):
    out_fname = str(tmp_path / "mp_result.npz")
    _run_workers(out_fname, "sparse")

    result = np.load(out_fname)
    assert int(result["n_global_devices"]) == 4

    # single-process reference answer on the same system
    row_ptr, col_ind, data, dense, rhs, _row_to_cell, _nhoriz = grid_csr(
        6, 2, 4, 3, seed=21
    )
    expected = np.linalg.solve(dense, rhs.T).T
    np.testing.assert_allclose(result["x_line"], expected, rtol=1e-9,
                               atol=1e-9)
    np.testing.assert_allclose(result["x_mixed"], expected, rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(result["x_jac"], expected, rtol=1e-9,
                               atol=1e-9)


@pytest.mark.slow
def test_two_process_full_newton_solve(tmp_path):
    """the WHOLE Newton-Krylov solver on a process-spanning mesh: two
    interpreters, four devices, state latitude-sharded, year integrations
    with cross-process halo ppermutes inside the jitted GMRES (consts
    threaded as jit operands -- closures over non-addressable arrays are
    illegal multi-process).  Goes beyond the reference, whose distributed
    memory is confined to the linear solve (solve_ABdist, nk_ooc/cime_pop/
    model_state.py:317-337) while its Newton loop runs single-rank."""
    out_fname = str(tmp_path / "mp_solve3d.npz")
    _run_workers(out_fname, "solve3d", timeout=900)

    result = np.load(out_fname)
    assert int(result["n_global_devices"]) == 4

    from transport3d_fixtures import solve_family

    import jax

    x_ref = solve_family(jax.devices("cpu")[:1])
    scale = np.abs(x_ref).max()
    np.testing.assert_allclose(result["x"], x_ref, rtol=0.0,
                               atol=1e-11 * scale)

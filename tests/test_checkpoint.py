"""orbax sharded checkpoint backend (core/checkpoint.py).

The async per-shard backend must preserve the npz backend's resume contract:
a restarted sharded solve picks up at the snapshot iteration, produces the
same iterates, and the restored array lands directly in the kernel's mesh
sharding (never a silently-replicated host array).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore
from newton_krylov_ooc_tpu.parallel.mesh import make_mesh
from newton_krylov_ooc_tpu.parallel.sharded_year import ShardedIageKernel

from tests.test_sharded_year import MODELINFO, _axes


def _solver(kernel, **kw):
    args = dict(
        newton_rel_tol=1e-5, newton_max_iter=8, krylov_max_dim=20,
        jit_gmres=True,
    )
    args.update(kw)
    return NewtonKrylovInCore(kernel, **args)


@pytest.fixture(scope="module")
def sharded_kernel():
    depth, ypos = _axes(8, 8)
    rates = (1.0 + 0.25 * np.arange(4)) / (365.0 * 86400.0)
    mesh = make_mesh(n_module=2, n_space=4)
    return ShardedIageKernel(mesh, depth, ypos, MODELINFO, rates, n_steps=36)


def test_orbax_resume_matches_npz_contract(tmp_path, sharded_kernel):
    """orbax-checkpointed solve resumes at the snapshot iteration with the
    mesh sharding restored and the same converged iterate"""
    kernel = sharded_kernel
    ckpt = str(tmp_path / "ckpt")

    x_ref, _, info = _solver(kernel).solve(
        kernel.init_iterate(), checkpoint_dir=ckpt, checkpoint_backend="orbax"
    )
    assert info["iterations"] >= 1

    x2, _, info2 = _solver(kernel).solve(
        kernel.init_iterate(), checkpoint_dir=ckpt, checkpoint_backend="orbax"
    )
    assert info2["iterations"] == info["iterations"]
    assert x2.sharding.is_equivalent_to(kernel.state_sharding, x2.ndim)
    assert np.allclose(np.asarray(x2), np.asarray(x_ref))


def test_orbax_mid_solve_preemption(tmp_path, sharded_kernel):
    """a solve killed mid-run (simulated by a max-iteration abort) resumes
    from the last committed snapshot and converges to the uninterrupted
    solve's answer"""
    kernel = sharded_kernel
    ckpt = str(tmp_path / "ckpt")

    x_full, _, info_full = _solver(kernel).solve(kernel.init_iterate())
    total_iters = info_full["iterations"]
    assert total_iters >= 2

    with pytest.raises(RuntimeError, match="maximum Newton iterations"):
        _solver(kernel, newton_max_iter=1).solve(
            kernel.init_iterate(),
            checkpoint_dir=ckpt,
            checkpoint_backend="orbax",
        )

    x2, _, info2 = _solver(kernel).solve(
        kernel.init_iterate(), checkpoint_dir=ckpt, checkpoint_backend="orbax"
    )
    # resumed run starts at iteration 1, so it reports fewer of its own
    assert info2["iterations"] == total_iters
    assert np.allclose(np.asarray(x2), np.asarray(x_full), rtol=1e-12, atol=0)


def test_unknown_backend_rejected(sharded_kernel):
    with pytest.raises(ValueError, match="checkpoint_backend"):
        _solver(sharded_kernel).solve(
            sharded_kernel.init_iterate(),
            checkpoint_dir="/tmp/unused",
            checkpoint_backend="zarr",
        )

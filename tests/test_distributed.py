"""parallel.distributed: bootstrap no-op, mesh sizing, sharded banded solve
(on the 8-virtual-CPU-device mesh configured in conftest)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from newton_krylov_ooc_tpu.parallel.distributed import (
    auto_mesh_shape,
    bootstrap,
    device_memory_bytes,
    sharded_block_banded_solve,
)
from newton_krylov_ooc_tpu.parallel.mesh import make_mesh


def test_bootstrap_single_process_noop(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert bootstrap() is False


def test_auto_mesh_shape_divisors():
    # 8 devices: module counts pick the largest divisor <= module_cnt
    assert auto_mesh_shape(1) == (1, 8)
    assert auto_mesh_shape(2) == (2, 4)
    assert auto_mesh_shape(3) == (2, 4)
    assert auto_mesh_shape(4) == (4, 2)
    assert auto_mesh_shape(100) == (8, 1)


def test_auto_mesh_shape_memory_cap(monkeypatch):
    import newton_krylov_ooc_tpu.parallel.distributed as dist

    monkeypatch.setattr(dist, "device_memory_bytes", lambda device=None: 1 << 30)
    # each module needs 2 devices -> at most 4 module blocks on 8 devices
    assert dist.auto_mesh_shape(8, bytes_per_module=(1 << 31)) == (4, 2)
    # fits on one device -> full module parallelism
    assert dist.auto_mesh_shape(8, bytes_per_module=(1 << 20)) == (8, 1)


def test_device_memory_bytes_cpu_none():
    # CPU backend reports no bytes_limit; must not raise
    assert device_memory_bytes() in (None,) or isinstance(
        device_memory_bytes(), int
    )


def _random_banded(rng, m, bw):
    """well-conditioned banded matrix in row-band storage + dense twin"""
    bands = rng.standard_normal((m, 2 * bw + 1))
    bands[:, bw] += 4.0 * (1 + bw)  # diagonal dominance
    dense = np.zeros((m, m))
    for i in range(m):
        for d in range(2 * bw + 1):
            j = i + d - bw
            if 0 <= j < m:
                dense[i, j] = bands[i, d]
            else:
                bands[i, d] = 0.0
    return bands, dense


def test_sharded_block_banded_solve_matches_dense():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(2, 4)
    rng = np.random.default_rng(1234)
    m, bw = 24, 3
    bands = np.empty((4, 8, m, 2 * bw + 1))
    dense = np.empty((4, 8, m, m))
    rhs = rng.standard_normal((4, 8, m))
    for i in range(4):
        for j in range(8):
            bands[i, j], dense[i, j] = _random_banded(rng, m, bw)

    x, resid = sharded_block_banded_solve(
        mesh, jnp.asarray(bands), jnp.asarray(rhs)
    )
    x_np = np.asarray(x)
    expected = np.linalg.solve(dense, rhs[..., None])[..., 0]
    assert np.allclose(x_np, expected, rtol=1e-9, atol=1e-9)
    assert float(resid) < 1e-8
    # solution sharded over the mesh, residual fully replicated
    assert len(x.sharding.device_set) == 8

"""tiny 3D IRF-transport family shared by the multi-process full-solve
test and its single-process reference solve (same grid/regions/modules as
tests/test_sharded_transport3d.py, packaged so a fresh worker interpreter
can run the identical problem)"""

import numpy as np

NZ, NLAT, NLON = 4, 8, 6
N_STEPS = 480

MODULE_SPECS = [
    [{"sink_rate_per_year": 0.5, "source_per_year": 1.0}],
    [
        {
            "surf_restore_pv_cm_s": 5.0,
            "surf_restore_target": 2.0,
            "sink_rate_per_year": 0.1,
        }
    ],
]


def family_setup():
    """synthetic circulation + two-basin region mask"""
    from newton_krylov_ooc_tpu.models.irf_offline import synthetic

    mask = np.ones((NZ, NLAT, NLON), np.int32)
    mask[:, 3, 2] = 0
    mask[2:, 5, 4] = 0
    circ = synthetic.gen_circulation(NZ, NLAT, NLON, mask=mask)
    n_steps = max(N_STEPS, synthetic.stable_steps_per_year(circ))
    region_mask = np.asarray(circ["mask"]).copy()
    north = region_mask[:, NLAT // 2 :, :]
    north[north > 0] = 2
    return circ, n_steps, region_mask


def solve_family(devices):
    """full Newton-Krylov solve of the family on a latitude mesh over the
    given devices (which may span processes); returns the converged state
    on host, all-gathered so every process holds the full answer"""
    from jax.sharding import Mesh

    from newton_krylov_ooc_tpu.core.incore import NewtonKrylovInCore
    from newton_krylov_ooc_tpu.parallel.mesh import host_value
    from newton_krylov_ooc_tpu.parallel.sharded_transport3d import (
        ShardedTransport3dKernel,
    )

    circ, n_steps, region_mask = family_setup()
    mesh = Mesh(np.asarray(devices), ("space",))
    kernel = ShardedTransport3dKernel(
        mesh, circ, MODULE_SPECS, n_steps=n_steps, region_mask=region_mask
    )
    solver = NewtonKrylovInCore(
        kernel,
        newton_rel_tol=1e-6,
        krylov_rel_tol=1e-4,
        newton_max_iter=6,
        krylov_max_dim=60,
        jit_gmres=True,
    )
    x, _fcn, info = solver.solve(kernel.init_iterate())
    rel = info["fcn_norm"] / info["x_norm"]
    assert (rel < 1e-6).all(), "family solve did not converge"
    return host_value(x)

"""device mesh + sharding helpers.

The reference's distribution mechanisms (SURVEY.md section 2.6) map onto a
2-axis jax mesh:

  "module" -- block independence over tracer modules (P1): parameterized
      module families (dye_decay_{suff}, forced_{suff}) integrate as one
      batched system; the batch axis shards across devices.
  "space"  -- spatial decomposition (P2/P4): the ypos dimension of the 2D
      grid shards across devices; XLA inserts halo collective-permutes for the
      stencil tendencies and psums for region reductions over ICI.  In the
      column-regions configuration (lateral transport off) the shards are
      fully independent -- the TPU analog of the reference's decoupled-region
      solves and its MPI process-grid linear solver (solve_ABdist).

Multi-host: initialize jax.distributed externally; the mesh spans all devices
(ICI within a slice, DCN across slices).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_module=1, n_space=None, devices=None):
    """build a (module, space) mesh over the available devices"""
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_space is None:
        n_space = n_dev // n_module
    if n_module * n_space != n_dev:
        raise ValueError(
            f"mesh shape ({n_module}, {n_space}) != device count {n_dev}"
        )
    dev_array = np.asarray(devices).reshape(n_module, n_space)
    return Mesh(dev_array, axis_names=("module", "space"))


def module_sharding(mesh):
    """sharding for (module_batch, state...) arrays: batch over 'module'"""
    return NamedSharding(mesh, P("module"))


def space_sharding_2d(mesh):
    """sharding for (..., depth, ypos) fields: ypos over 'space'"""
    return NamedSharding(mesh, P(None, None, "space"))


def state_sharding(mesh, ndim, ypos_axis=-1):
    """sharding for a state array with ypos on the given axis"""
    spec = [None] * ndim
    spec[ypos_axis % ndim] = "space"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh):
    return NamedSharding(mesh, P())


def put_global(mesh, arr, spec, dtype=None):
    """device-place a host array as a global array sharded per `spec`.

    Single-process this is a committed `jax.device_put`.  On a
    multi-process (multi-host) mesh `jax.device_put` cannot reach
    non-addressable devices; every process holds the same full host value
    (the analog of every MPI rank reading the same input file in the
    reference's `solve_ABdist` launch, nk_ooc/cime_pop/model_state.py:
    317-337), and each serves its local shards via
    `make_array_from_callback`.
    """
    sharding = NamedSharding(mesh, spec) if not isinstance(
        spec, NamedSharding
    ) else spec
    if jax.process_count() == 1:
        import jax.numpy as jnp

        return jax.device_put(jnp.asarray(arr, dtype), sharding)
    arr = np.asarray(arr, dtype)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def host_value(arr):
    """fetch a (possibly process-spanning) device array to host numpy.

    Sharded outputs of a multi-process mesh are not fully addressable;
    all-gather them so every process returns the full value.
    """
    if jax.process_count() == 1 or arr.is_fully_replicated:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(arr, tiled=True)

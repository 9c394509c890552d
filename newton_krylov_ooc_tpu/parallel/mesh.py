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

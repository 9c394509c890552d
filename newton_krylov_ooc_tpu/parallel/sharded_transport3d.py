"""shard_map decomposition of the 3D offline IRF-transport year.

The single-device irf_offline year (ops/transport3d + ops/imex) tops out at
one chip's HBM; a real POP-grid workload (gx1v7: 60x384x320) with many
tracers wants the latitude dimension split over the mesh's 'space' axis --
the same decomposition contract as parallel/sharded_year.py, extended to
the 3D stencil:

  * implicit vertical solves stay COLUMN-LOCAL (no communication);
  * the zonal direction is periodic and stays shard-local (jnp.roll);
  * the meridional stencil is upwind3, reaching TWO rows past a face, so
    each explicit stage exchanges a DEPTH-2 latitude halo: exactly two
    lax.ppermute collectives per stage, riding ICI on real hardware;
  * every shard holds an EXTENDED coefficient slice (its latitude block
    plus two rows each side, zero-padded at the physical boundaries), so
    applying the plain transport_tend on the halo-extended state and
    keeping the interior rows reproduces the global stencil exactly --
    boundary shards need no special cases.

Equality: tests/test_sharded_transport3d.py pins the sharded year against
the single-device integration to float64 roundoff across mesh shapes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.imex import imex_year
from ..ops.transport3d import transport_tend

HALO = 2  # upwind3 reaches two rows past a face


def _extended_slices(arr, n_space, nl_loc):
    """(n_space, nz, nl_loc + 2*HALO, nlon) stack of per-shard latitude
    blocks extended by HALO rows each side, zero-padded off-grid"""
    nz, nlat, nlon = arr.shape
    padded = np.zeros((nz, nlat + 2 * HALO, nlon), arr.dtype)
    padded[:, HALO : HALO + nlat, :] = arr
    return np.stack(
        [
            padded[:, s * nl_loc : s * nl_loc + nl_loc + 2 * HALO, :]
            for s in range(n_space)
        ]
    )


def build_sharded_transport3d_year(
    mesh, coef, kv, dz_r, diag, src, t_span, n_steps, unroll=8
):
    """build the jitted sharded 3D transport year.

    mesh: Mesh with a 'space' axis (other axes are ignored/replicated)
    coef: the stencil pytree from ops.transport3d.build_transport3d
        (GLOBAL arrays; sliced into extended shard blocks here)
    kv: (nz-1, nlat*nlon) vertical-mixing coupling; dz_r: (nz,)
    diag: (tracer, nz, nlat*nlon) implicit local rates
    src: (tracer, nz, nlat*nlon) explicit sources
    Returns fn(y) -> y_end for y (tracer, nz, nlat, nlon) sharded
    P(None, None, 'space', None); the result keeps the sharding.
    """
    n_space = mesh.shape["space"]
    wet_np = np.asarray(coef["wet"])
    nz, nlat, nlon = wet_np.shape
    if nlat % n_space != 0:
        raise ValueError(f"nlat {nlat} does not split over {n_space} shards")
    nl_loc = nlat // n_space
    if nl_loc < HALO:
        raise ValueError(
            f"latitude block {nl_loc} shorter than the halo depth {HALO}"
        )
    dtype = jnp.asarray(coef["wet"]).dtype

    coef_names = [name for name, arr in sorted(coef.items()) if arr is not None]
    coef_stacks = tuple(
        jnp.asarray(
            _extended_slices(np.asarray(coef[name], np.float64), n_space, nl_loc),
            dtype,
        )
        for name in coef_names
    )

    # column-local fields sliced to interior latitude blocks
    def interior_stack(arr, inner_shape):
        arr = np.asarray(arr, np.float64).reshape(inner_shape + (nlat, nlon))
        return np.stack(
            [arr[..., s * nl_loc : (s + 1) * nl_loc, :] for s in range(n_space)]
        ).reshape((n_space,) + inner_shape + (nl_loc * nlon,))

    kv_stack = jnp.asarray(interior_stack(kv, (nz - 1,)), dtype)
    t_dim = diag.shape[0]
    diag_stack = jnp.asarray(interior_stack(diag, (t_dim, nz)), dtype)
    src_stack = jnp.asarray(interior_stack(src, (t_dim, nz)), dtype)
    dz_r_dev = jnp.asarray(dz_r, dtype)

    fwd_perm = [(i, i + 1) for i in range(n_space - 1)]
    bwd_perm = [(i, i - 1) for i in range(1, n_space)]

    def local_year(y, kv_l, diag_l, src_l, *coef_arrays):
        # shard blocks arrive with the leading stack axis of size 1
        kv_l = kv_l[0]
        diag_l = diag_l[0]
        src_l = src_l[0]
        coef_local = dict(
            zip(coef_names, (arr[0] for arr in coef_arrays))
        )
        # y arrives (tracer, nz, nl_loc, nlon) per shard

        def halo_ext(y4):
            """HALO latitude rows per side: boundary shards receive zeros,
            which the zero-padded extended coefficients annul"""
            south = jax.lax.ppermute(y4[..., -HALO:, :], "space", fwd_perm)
            north = jax.lax.ppermute(y4[..., :HALO, :], "space", bwd_perm)
            return jnp.concatenate([south, y4, north], axis=-2)

        def explicit_tend(t, y):
            y4 = y.reshape(y.shape[:-1] + (nl_loc, nlon))
            tend_ext = transport_tend(coef_local, halo_ext(y4))
            tend = tend_ext[..., HALO:-HALO, :]
            return tend.reshape(y.shape) + src_l

        return imex_year(
            explicit_tend,
            lambda t: kv_l,
            diag_l,
            dz_r_dev,
            y.reshape(y.shape[:-2] + (nl_loc * nlon,)),
            t_span,
            n_steps,
            unroll=unroll,
        ).reshape(y.shape)

    state_spec = P(None, None, "space", None)
    stack3 = P("space", None, None)
    stack4 = P("space", None, None, None)

    sharded = shard_map(
        local_year,
        mesh=mesh,
        in_specs=(state_spec, stack3, stack4, stack4)
        + tuple(stack4 for _ in coef_names),
        out_specs=state_spec,
        check_vma=False,
    )

    operands = tuple(
        jax.device_put(arr, NamedSharding(mesh, spec))
        for arr, spec in [
            (kv_stack, stack3),
            (diag_stack, stack4),
            (src_stack, stack4),
        ]
        + [(arr, stack4) for arr in coef_stacks]
    )

    @jax.jit
    def year(y):
        return sharded(y, *operands)

    return year

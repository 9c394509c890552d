"""k-step 3D-transport block kernel: the per-shard compute of the sharded
gx1-regime year.

One invocation advances a halo-extended latitude block k IMEX steps --
k x [Heun(dt); CN(dt)] -- with EVERY operand VMEM-resident for the whole
block: stencil coefficients, CN bands, state, and Kahan compensation are
read from HBM once per k steps instead of once per step (the
coefficient-traffic amortization that motivates temporal halo blocking).
Each step's upwind3 Heun pair consumes 4 rows of halo validity (2 rows of
stencil reach per stage), so callers hand the kernel a block extended by
4*k rows per side and re-fill the halo between invocations -- on a device
mesh via two jax.lax.ppermute collectives riding ICI
(parallel/sharded_transport3d.build_sharded_transport3d_year_pallas); the
reference instead spreads this workload over an explicit nprow x npcol
MPI rank grid (nk_ooc/cime_pop/model_state.py:439-450).

The full window is updated every step with no shrinking-validity
bookkeeping: stencil reads past the window edge see zero padding, and the
garbage this produces creeps inward 4 rows per step, reaching exactly the
interior boundary after k steps -- interior rows see the identical
arithmetic a single-device integration applies.  Kahan compensation rides
the halo exchange with the state, so accumulation accuracy does not reset
at block boundaries.

Arithmetic mirrors ops/transport3d_stream_pallas (flux-form CN rhs,
increment-form solves, per-tracer-chunk stencil evaluation to bound live
register pressure); rate fields of the assemble_rate_fields form shed
their dense residency the same way (2 scalars per tracer rebuilt from the
resident wet mask).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .transport3d import transport_tend
from .transport3d_pallas import VmemBudgetError, _pcr_axis3, _shift_axis3
from .transport3d_stream_pallas import (
    _STREAM_TEMP_WINDOWS,
    _STREAM_VMEM_CAP,
)


def block3d_vmem_bytes(nz, rows_ext, nlon, t_dim, n_coef, *,
                       stream_diag=False, stream_src=False,
                       tend_chunk=None):
    """advisory VMEM bytes of one k-step block-kernel invocation: the
    whole-array VMEM residency (coefficients, CN bands, state + Kahan
    compensation in/out, f1, any dense rate fields) plus the charged
    per-chunk live stencil temporaries.  Independent of k (deeper blocks
    reuse the same residency; only rows_ext = nl_loc + 8*k grows)."""
    lanes = -(-nlon // 128) * 128
    chunk = tend_chunk if tend_chunk else (t_dim if t_dim <= 2 else 1)
    rows = (
        n_coef + 2                      # coefficient fields + CN bands
        + (t_dim if stream_diag else 0)
        + (t_dim if stream_src else 0)
        + 2 * t_dim                     # y + comp (outputs alias inputs)
        + t_dim                         # Heun f1
        + _STREAM_TEMP_WINDOWS * chunk  # live stencil temporaries
    )
    return 4 * nz * lanes * rows_ext * rows


def build_block3d_steps(
    coef_names, nz, rows_ext, nlon, t_dim, dt, k_steps, *,
    has_diag=False, has_src=False, diag_fac=None, src_fac=None,
    couple=None, tend_chunk=None, vmem_cap=_STREAM_VMEM_CAP,
):
    """build fn(y, c, coef_stack, dlb, dub[, diag][, src], interpret=False)
    -> (y, c): k_steps x [Heun(dt); CN(dt)] on one halo-extended block.

    Array shapes (lanes = nlon padded up to a multiple of 128):
      y, c:        (t_dim, nz, rows_ext, lanes) float32
      coef_stack:  (n_coef, nz, rows_ext, lanes) -- the fields named by
                   coef_names, in order (everything transport_tend reads,
                   including 'wet' and 'recip_vol')
      dlb, dub:    (nz, rows_ext, lanes) Crank-Nicolson vertical bands
      diag, src:   (t_dim, nz, rows_ext, lanes), passed only when
                   has_diag/has_src AND no factored form exists
                   (diag_fac/src_fac carry (a, b) per-tracer scalars of
                   the a*wet + b*wet_surf form instead -- see
                   transport3d_stream_pallas._factor_rate_field)

    couple: optional (t_dim, t_dim) surface gas-exchange coupling [1/s];
    tend_chunk bounds the tracer width per stencil evaluation (default:
    all tracers when t_dim <= 2, else 1).
    """
    lanes = -(-nlon // 128) * 128
    chunk = int(tend_chunk) if tend_chunk else (t_dim if t_dim <= 2 else 1)
    if not 1 <= chunk <= t_dim:
        raise ValueError(f"tend_chunk={chunk} outside [1, {t_dim}]")
    stream_diag = has_diag and diag_fac is None
    stream_src = has_src and src_fac is None
    n_coef = len(coef_names)
    est = block3d_vmem_bytes(
        nz, rows_ext, nlon, t_dim, n_coef, stream_diag=stream_diag,
        stream_src=stream_src, tend_chunk=chunk,
    )
    if est > vmem_cap:
        raise VmemBudgetError(
            f"block kernel (rows_ext={rows_ext}, t_dim={t_dim}, "
            f"tend_chunk={chunk}) estimates {est >> 20} MiB VMEM > "
            f"{vmem_cap >> 20} MiB; use more latitude shards, fewer "
            "steps per exchange, or a smaller tend_chunk"
        )
    tr_slices = [
        slice(i, min(i + chunk, t_dim)) for i in range(0, t_dim, chunk)
    ]
    dtype = jnp.float32
    dt_f = np.float32(dt)
    half = np.float32(0.5 * dt)
    couple_np = None if couple is None else np.asarray(couple, np.float64)
    if couple_np is not None and couple_np.shape != (t_dim, t_dim):
        raise ValueError("couple must be (tracer, tracer)")
    n_extra = int(stream_diag) + int(stream_src)
    pad_w = ((0, 0), (0, 0), (0, 0), (0, lanes - nlon))

    def _cat(parts):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    def sep_field(fac, wet3, sl):
        """rebuild a factored rate field a_t*wet + b_t*wet_surf for
        tracer slice sl from the resident wet values (dense residency was
        shed; the scalars bake into the kernel)"""
        a_vals, b_vals = fac
        parts = []
        for t in range(sl.start, sl.stop):
            a_v, b_v = a_vals[t], b_vals[t]
            f = np.float32(a_v) * wet3 if a_v else jnp.zeros_like(wet3)
            if b_v:
                # surface-row add via concat: Mosaic has no scatter-add
                f = jnp.concatenate(
                    [(f[0] + np.float32(b_v) * wet3[0])[None], f[1:]],
                    axis=0,
                )
            parts.append(f)
        return jnp.stack(parts)

    def kernel(*refs):
        y_ref, c_ref, coef_ref, dlb_ref, dub_ref = refs[:5]
        pos = 5
        diag_ref = src_ref = None
        if stream_diag:
            diag_ref = refs[pos]
            pos += 1
        if stream_src:
            src_ref = refs[pos]
            pos += 1
        y_out, c_out = refs[pos], refs[pos + 1]

        y = y_ref[...][..., :nlon]
        c = c_ref[...][..., :nlon]
        coef_w = {
            name: coef_ref[i][..., :nlon]
            for i, name in enumerate(coef_names)
        }
        dlb = dlb_ref[...][..., :nlon]
        dub = dub_ref[...][..., :nlon]
        diag_w = diag_ref[...][..., :nlon] if stream_diag else None
        src_w = src_ref[...][..., :nlon] if stream_src else None
        wet3 = coef_w["wet"]

        def base_tend(y_sl, sl):
            out = transport_tend(coef_w, y_sl)
            if src_w is not None:
                out = out + src_w[sl]
            elif src_fac is not None and has_src:
                out = out + sep_field(src_fac, wet3, sl)
            return out

        def couple_rows(surf):
            """(T, rows, nlon) surface coupling tendencies from the full
            family's surface values"""
            rws = []
            for x_ind in range(t_dim):
                acc = None
                for y_ind in range(t_dim):
                    c_val = float(couple_np[x_ind, y_ind])
                    if c_val != 0.0:
                        term = c_val * surf[y_ind]
                        acc = term if acc is None else acc + term
                rws.append(
                    jnp.zeros_like(surf[0]) if acc is None else acc
                )
            return wet3[0] * jnp.stack(rws)

        def kahan(y_v, c_v, delta):
            adj = delta + c_v
            y_new = y_v + adj
            return y_new, adj - (y_new - y_v)

        b_base = 1.0 + half * (dub + dlb)

        for _step in range(k_steps):
            # Heun (explicit trapezoid), tracer-chunked
            f1 = _cat([base_tend(y[sl], sl) for sl in tr_slices])
            if couple_np is not None:
                # surface-level adds via concat (no Mosaic scatter-add)
                f1 = jnp.concatenate(
                    [(f1[:, 0] + couple_rows(y[:, 0]))[:, None], f1[:, 1:]],
                    axis=1,
                )
                c2 = couple_rows(y[:, 0] + dt_f * f1[:, 0])
            f2_parts = []
            for sl in tr_slices:
                f2_sl = base_tend(y[sl] + dt_f * f1[sl], sl)
                if couple_np is not None:
                    f2_sl = jnp.concatenate(
                        [(f2_sl[:, 0] + c2[sl])[:, None], f2_sl[:, 1:]],
                        axis=1,
                    )
                f2_parts.append(f2_sl)
            f2 = _cat(f2_parts)
            y, c = kahan(y, c, np.float32(0.5) * dt_f * (f1 + f2))
            # Crank-Nicolson(dt), column-local; flux-form rhs: neighbor
            # differences first (cancellation-safe) -- imex_year's solve
            y_parts, c_parts = [], []
            for sl in tr_slices:
                y_r = y[sl]
                d_up = _shift_axis3(y_r, 1) - y_r   # dub's zero last level
                d_dn = _shift_axis3(y_r, -1) - y_r  # dlb's zero first
                m_v = dub * d_up + dlb * d_dn
                b_main = b_base
                if diag_w is not None:
                    dgb = diag_w[sl]
                elif diag_fac is not None and has_diag:
                    dgb = sep_field(diag_fac, wet3, sl)
                else:
                    dgb = None
                if dgb is not None:
                    m_v = m_v + dgb * y_r
                    b_main = b_main - half * dgb
                dv = _pcr_axis3(
                    -half * dlb, b_main, -half * dub, 2.0 * half * m_v, nz
                )
                y_sl, c_sl = kahan(y_r, c[sl], dv)
                y_parts.append(y_sl)
                c_parts.append(c_sl)
            y, c = _cat(y_parts), _cat(c_parts)

        y_out[...] = jnp.pad(y, pad_w)
        c_out[...] = jnp.pad(c, pad_w)

    shape = jax.ShapeDtypeStruct((t_dim, nz, rows_ext, lanes), dtype)
    n_in = 5 + n_extra

    @partial(jax.jit, static_argnames=("interpret",))
    def block(y, c, *ops, interpret=False):
        if len(ops) != n_in - 2:
            raise ValueError(
                f"expected {n_in - 2} coefficient operands, got {len(ops)}"
            )
        return pl.pallas_call(
            kernel,
            out_shape=[shape, shape],
            input_output_aliases={0: 0, 1: 1},
            interpret=interpret,
        )(y, c, *ops)

    block.vmem_bytes = est
    block.stream_diag = stream_diag
    block.stream_src = stream_src
    block.tend_chunk = chunk
    return block

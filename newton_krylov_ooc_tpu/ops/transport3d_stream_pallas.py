"""HBM-streaming whole-year pallas kernel for VMEM-oversized 3D grids.

The VMEM-resident megakernel (ops/transport3d_pallas.py) owns grids that
fit one core's VMEM (~gx3 scale); past that the XLA-scan year falls off a
cliff -- measured 0.88 G cell-steps/s at gx1 (60x384x320) vs 2.4 G at gx3
on a v5e, because each fused scan step re-materializes full-field
intermediates through HBM.  This kernel instead makes the per-step HBM
traffic EXPLICIT and minimal:

  * the state lives in HBM in two ping-pong buffers plus a
    Kahan-compensation buffer (zero-initialized operands aliased onto the
    kernel outputs -- this toolchain's remote AOT compile rejects pallas
    HBM scratch, aliased operands it accepts);
  * every step sweeps latitude blocks; per block, ONE stacked DMA brings
    the stencil coefficients + sources (a (13+T, nz, W, lanes) window),
    one more the CN bands + implicit rates, the state window rides a
    third, and only the updated block interior goes back out -- ~17
    streamed field-windows per block against the scan's 40+ materialized
    full-field passes;
  * the Heun stage-1 tendency is recomputed on the block halo (8 rows)
    instead of materialized globally, trading (b+16)/b redundant VPU work
    for never writing f1/f2 to HBM.

The step math is IDENTICAL to ops.imex.imex_year's composition

    CNh(t0)  [Heun CNf] x (n-1)  Heun  CNh(t_end)

with Kahan-compensated float32 accumulation and the cancellation-safe
flux-form CN right-hand side (see transport3d_pallas.py for why).  The
lat-block windows reproduce ops.transport3d._shift's closed-boundary
zero-fill through _HALO dry rows padded onto both buffer ends (wet == 0
there kills every stencil contribution; the pads are zeroed once before
the first sweep so no uninitialized memory is ever read).

Steady circulation only: one sweep's coefficient windows are
time-independent.  Seasonal gx1-class runs use the sharded scan
(parallel/sharded_transport3d.py).

The reference runs this grid by submitting POP to a batch scheduler and
solving the preconditioner with 256 MPI ranks of SuperLU_DIST
(/root/reference/nk_ooc/cime_pop/model_state.py:124-167,317-337); here
the production-grid forward year is a single on-device kernel.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .transport3d import (
    UPWIND3_SELECTOR_KEYS,
    transport_coef_n_time,
    transport_tend,
    upwind3_selectors,
)
from .transport3d_pallas import _cn_bands, _pcr_axis3

SEC_PER_YEAR = 365.0 * 86400.0

_HALO = 8  # >= 4 rows consumed per step (two stencil radii), 8-aligned


def _pad_rows(arr, rows, lanes):
    """zero-pad the minor two axes to (rows, lanes), physical row 0 at
    buffer row _HALO"""
    arr = np.asarray(arr, np.float32)
    pad = [(0, 0)] * arr.ndim
    pad[-2] = (_HALO, rows - _HALO - arr.shape[-2])
    pad[-1] = (0, lanes - arr.shape[-1])
    return np.pad(arr, pad)


def build_transport3d_year_stream(
    coef, kv, dz_r, diag, src, t_span, n_steps, couple=None, block_rows=16,
    prefetch=False, steps_per_sweep=1,
):
    """build fn(y0, interpret=False) -> y_end, the streaming-year kernel.

    Arguments as ops.transport3d_pallas.build_transport3d_year_pallas
    (steady coef pytree from build_transport3d, (nz-1, nlat*nlon) kv,
    (T, nz, nlat*nlon) diag/src, optional (T, T) surface coupling);
    block_rows is the latitude block height (multiple of 8).  Raises for
    seasonal inputs.  y0: (T, nz, nlat, nlon), any float dtype (cast to
    float32).

    prefetch=True double-buffers the coefficient-stack window (the
    dominant per-block DMA): block k+1's window streams while block k
    computes, hiding most of the coefficient traffic behind the stencil
    work at the cost of a second window buffer in VMEM.

    steps_per_sweep=2 runs TWO model steps per latitude sweep inside one
    window residency -- the 8-row halo is exactly two steps' stencil
    consumption (step one updates rows halo/2 .. W-halo/2, step two the
    interior), halving the per-step coefficient/state traffic for ~12%
    more VPU work.  Requires even n_steps.  Results remain block-size
    independent: the halo rows' step-one update is the bitwise-identical
    arithmetic the neighboring block applies to the same rows.
    """
    if transport_coef_n_time(coef) is not None or np.asarray(kv).ndim == 3:
        raise ValueError(
            "the streaming year kernel is steady-only; seasonal "
            "circulations use the sharded scan year"
        )
    if block_rows % 8 or block_rows <= 0:
        raise ValueError("block_rows must be a positive multiple of 8")
    if steps_per_sweep not in (1, 2):
        raise ValueError("steps_per_sweep must be 1 or 2")
    if steps_per_sweep == 2 and int(n_steps) % 2:
        raise ValueError("steps_per_sweep=2 needs an even n_steps")

    dtype = jnp.float32
    wet = np.asarray(coef["wet"], np.float32)
    nz, nlat, nlon = wet.shape
    t_dim = int(np.asarray(diag).shape[0])
    dt = float((t_span[1] - t_span[0]) / n_steps)
    n_steps = int(n_steps)

    b_rows = block_rows
    nlat_p = -(-nlat // b_rows) * b_rows
    lanes = -(-nlon // 128) * 128
    rows = nlat_p + 2 * _HALO  # buffer row r == physical row r - _HALO
    n_blocks = nlat_p // b_rows
    w_rows = b_rows + 2 * _HALO

    # the six upwind3 selectors are pure shifts of `wet`: derive them from
    # the wet window in-kernel instead of streaming six more field-windows
    # per block (43% of the coefficient traffic at the full stencil)
    upwind3 = "sel3p_e" in coef and coef["sel3p_e"] is not None
    names = [
        name
        for name, arr in sorted(coef.items())
        if arr is not None and name not in UPWIND3_SELECTOR_KEYS
    ]
    n_coef = len(names)
    n_w = n_coef + t_dim  # window stack: coefficients, then per-tracer src
    stack_w = np.concatenate(
        [
            np.stack([_pad_rows(coef[name], rows, lanes) for name in names]),
            _pad_rows(
                np.asarray(src).reshape(t_dim, nz, nlat, nlon), rows, lanes
            ),
        ]
    )

    dl_b, du_b = _cn_bands(
        np.asarray(kv, np.float32), np.asarray(dz_r, np.float64), nz, nlat,
        nlon,
    )
    stack_b = np.concatenate(
        [
            np.stack(
                [_pad_rows(dl_b, rows, lanes), _pad_rows(du_b, rows, lanes)]
            ),
            _pad_rows(
                np.asarray(diag).reshape(t_dim, nz, nlat, nlon), rows, lanes
            ),
        ]
    ).astype(np.float32)

    couple_np = None
    if couple is not None:
        couple_np = np.asarray(couple, np.float64)
        if couple_np.shape != (t_dim, t_dim):
            raise ValueError("couple must be (tracer, tracer)")

    name_ind = {name: ind for ind, name in enumerate(names)}
    buf_shape = (t_dim, nz, rows, lanes)
    int_lo, int_hi = _HALO, _HALO + b_rows  # block interior inside a window
    k_steps = steps_per_sweep
    n_sweeps = n_steps // k_steps + 1  # sweep 0 is the opening CNh(dt/2)

    def kernel(stack_w_hbm, stack_b_hbm, y0_hbm, y_pp_in, c_pp_in,
               y_pp, c_pp, w_buf, b_buf, y_buf, f1_buf, c_buf, sems):
        # y_pp/c_pp are the OUTPUT refs aliased onto the zero-initialized
        # y_pp_in/c_pp_in operands (pallas HBM scratch does not survive
        # this toolchain's remote AOT compile; aliased operands do, and
        # arrive pre-zeroed so padding rows are never uninitialized)
        del y_pp_in, c_pp_in
        s = pl.program_id(0)       # sweep: 0=CNh, 1..n-1=Heun+CN, n=Heun+CNh
        blk = pl.program_id(1)
        win0 = blk * b_rows        # buffer row of the window start
        int0 = win0 + _HALO        # buffer row of the block interior

        def copy(src_ref, dst_ref, sem_ind):
            dma = pltpu.make_async_copy(src_ref, dst_ref, sems.at[sem_ind])
            dma.start()
            dma.wait()

        # -- stream this block's inputs -----------------------------------
        if prefetch:
            # double-buffered coefficient windows: start block g+1's DMA
            # before waiting on block g's (issued one iteration earlier;
            # warm-up start at g == 0).  Coefficient windows depend only
            # on the block index -- never on the sweep or the state -- so
            # prefetching across the sweep boundary is hazard-free.
            g = s * n_blocks + blk
            total = n_sweeps * n_blocks

            def dma_w(slot, g2):
                blk2 = jnp.remainder(g2, n_blocks)
                return pltpu.make_async_copy(
                    stack_w_hbm.at[:, :, pl.ds(blk2 * b_rows, w_rows), :],
                    w_buf.at[slot],
                    sems.at[7 + slot],
                )

            @pl.when(g == 0)
            def _():
                dma_w(0, 0).start()

            @pl.when(g + 1 < total)
            def _():
                dma_w(jnp.remainder(g + 1, 2), g + 1).start()

            dma_w(jnp.remainder(g, 2), g).wait()
            w_cur = jnp.remainder(g, 2)
        else:
            copy(stack_w_hbm.at[:, :, pl.ds(win0, w_rows), :], w_buf.at[0], 0)
            w_cur = 0
        copy(stack_b_hbm.at[:, :, pl.ds(win0, w_rows), :], b_buf, 1)

        @pl.when(s == 0)
        def _():
            copy(y0_hbm.at[:, :, pl.ds(win0, w_rows), :], y_buf, 2)
            c_buf[:] = jnp.zeros_like(c_buf[:])

        @pl.when(s > 0)
        def _():
            copy(
                y_pp.at[(s - 1) % 2, :, :, pl.ds(win0, w_rows), :], y_buf, 2
            )
            copy(c_pp.at[:, :, pl.ds(win0, w_rows), :], c_buf, 3)

        # COMPUTE ON LANE-TRIMMED VALUES: the lon axis is periodic and
        # transport_tend wraps it with jnp.roll, so the (128-tile) lane
        # padding must never be part of the logical array -- buffers stay
        # padded for DMA alignment, values are trimmed to nlon, and every
        # write touches only the logical lanes (the pad lanes round-trip
        # the zeros they were initialized with)
        coef_w = {
            name: w_buf[w_cur, ind][..., :nlon]
            for name, ind in name_ind.items()
        }
        if upwind3:
            coef_w.update(upwind3_selectors(coef_w["wet"]))
        src_w = jnp.stack(
            [w_buf[w_cur, n_coef + t] for t in range(t_dim)]
        )[..., :nlon]
        dlb_w = b_buf[0][..., :nlon]
        dub_w = b_buf[1][..., :nlon]
        diag_w = b_buf[2 : 2 + t_dim][..., :nlon]

        def tend(y_w):
            out = transport_tend(coef_w, y_w) + src_w
            if couple_np is not None:
                surf = y_w[:, 0]  # (T, W, lanes)
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
                out = out.at[:, 0].add(coef_w["wet"][0] * jnp.stack(rws))
            return out

        def kahan(y, comp, delta):
            adj = delta + comp
            y_new = y + adj
            return y_new, adj - (y_new - y)

        def cn(lo, hi, half):
            """Crank-Nicolson on window rows [lo, hi) (column-local in
            depth); flux-form rhs: neighbor differences first
            (cancellation-safe) -- exactly imex_year's solve"""
            y_r = y_buf[:, :, lo:hi, :nlon]
            dlb = dlb_w[:, lo:hi, :]
            dub = dub_w[:, lo:hi, :]
            dgb = diag_w[:, :, lo:hi, :]
            d_up = _shift_z(y_r, 1) - y_r   # dub's zero last level
            d_dn = _shift_z(y_r, -1) - y_r  # dlb's zero first level
            m_v = dub * d_up + dlb * d_dn + dgb * y_r
            b_main = 1.0 + half * (dub + dlb) - half * dgb
            dv = _pcr_axis3(
                -half * dlb, b_main, -half * dub, 2.0 * half * m_v, nz
            )
            y_new, c_new = kahan(y_r, c_buf[:, :, lo:hi, :nlon], dv)
            y_buf[:, :, lo:hi, :nlon] = y_new
            c_buf[:, :, lo:hi, :nlon] = c_new

        def heun(lo, hi):
            """one Heun update on window rows [lo, hi); the stage-1
            tendency is recomputed over the halo so it never round-trips
            HBM"""
            y_w = y_buf[:, :, :, :nlon]
            f1 = tend(y_w)
            f1_buf[:, :, :, :nlon] = f1
            f2_r = tend(y_w + dtype(dt) * f1)[:, :, lo:hi, :]
            delta = 0.5 * dtype(dt) * (f1_buf[:, :, lo:hi, :nlon] + f2_r)
            y_new, c_new = kahan(
                y_buf[:, :, lo:hi, :nlon], c_buf[:, :, lo:hi, :nlon], delta
            )
            y_buf[:, :, lo:hi, :nlon] = y_new
            c_buf[:, :, lo:hi, :nlon] = c_new

        # -- model steps: sweep 0 is the opening CNh(dt/2); each later
        # sweep runs k_steps x [Heun; CN], the FIRST on rows
        # [halo/2, W - halo/2) so its result feeds the second step's
        # stencil (halo rows get the bitwise-identical update their owning
        # block applies, so results stay block-size independent), the last
        # on the interior.  The final model step's CN is the closing
        # CNh(dt/2) -- exactly imex_year's merged-half-step schedule. ----
        @pl.when(s == 0)
        def _():
            cn(int_lo, int_hi, dtype(0.25 * dt))

        @pl.when(s > 0)
        def _():
            if k_steps == 2:
                heun(_HALO // 2, w_rows - _HALO // 2)
                cn(_HALO // 2, w_rows - _HALO // 2, dtype(0.5 * dt))
            last = s == n_sweeps - 1
            heun(int_lo, int_hi)
            half_b = 0.5 * jnp.where(last, dtype(0.5 * dt), dtype(dt))
            cn(int_lo, int_hi, half_b)

        # -- write back: the interior rows, to this sweep's ping-pong slot
        # (the final sweep's slot, (n_sweeps-1) % 2, is the result) -------
        copy(
            y_buf.at[:, :, pl.ds(int_lo, b_rows), :],
            y_pp.at[s % 2, :, :, pl.ds(int0, b_rows), :],
            5,
        )
        copy(
            c_buf.at[:, :, pl.ds(int_lo, b_rows), :],
            c_pp.at[:, :, pl.ds(int0, b_rows), :],
            6,
        )

    def _shift_z(arr, off):
        """result[..., k, :, :] = arr[..., k + off, :, :], zero off-grid"""
        pad = [(0, 0)] * arr.ndim
        index = [slice(None)] * arr.ndim
        if off > 0:
            pad[-3] = (0, off)
            index[-3] = slice(off, None)
        else:
            pad[-3] = (-off, 0)
            index[-3] = slice(None, off)
        return jnp.pad(arr, pad)[tuple(index)]

    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)  # noqa: E731

    grid = (n_sweeps, n_blocks)
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=127 << 20,
    )
    n_slots = 2 if prefetch else 1
    scratch_shapes = [
        pltpu.VMEM((n_slots, n_w, nz, w_rows, lanes), dtype),  # windows
        pltpu.VMEM((2 + t_dim, nz, w_rows, lanes), dtype),     # bands+diag
        pltpu.VMEM((t_dim, nz, w_rows, lanes), dtype),         # state win
        pltpu.VMEM((t_dim, nz, w_rows, lanes), dtype),         # Heun f1
        pltpu.VMEM((t_dim, nz, w_rows, lanes), dtype),         # comp
        pltpu.SemaphoreType.DMA((9,)),
    ]

    # the coefficient stacks ride the jit boundary as OPERANDS, never
    # closures: captured half-GB constants become program literals, which
    # both re-upload per call and overflow remote-compile request limits
    # (the same operand-form rule as ops/sparse.py and the sharded year)
    stack_w_j = jnp.asarray(stack_w)
    stack_b_j = jnp.asarray(stack_b)

    @partial(jax.jit, static_argnames=("interpret",))
    def _year_op(y0, sw, sb, interpret=False):
        y0_p = jnp.zeros(buf_shape, dtype)
        y0_p = y0_p.at[
            :, :, _HALO : _HALO + nlat, :nlon
        ].set(jnp.asarray(y0, dtype).reshape(t_dim, nz, nlat, nlon))
        y_pp, _c_pp = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=[
                jax.ShapeDtypeStruct((2,) + buf_shape, dtype),
                jax.ShapeDtypeStruct(buf_shape, dtype),
            ],
            in_specs=[hbm(), hbm(), hbm(), hbm(), hbm()],
            out_specs=[hbm(), hbm()],
            input_output_aliases={3: 0, 4: 1},
            scratch_shapes=scratch_shapes,
            compiler_params=compiler_params,
            interpret=interpret,
        )(
            sw, sb, y0_p,
            jnp.zeros((2,) + buf_shape, dtype),
            jnp.zeros(buf_shape, dtype),
        )
        return y_pp[(n_sweeps - 1) % 2, :, :, _HALO : _HALO + nlat, :nlon]

    def year(y0, interpret=False):
        return _year_op(y0, stack_w_j, stack_b_j, interpret=interpret)

    # callers composing this year into a larger jit trace year.pure and
    # thread year.operands through their own argument lists
    year.pure = _year_op
    year.operands = (stack_w_j, stack_b_j)
    return year

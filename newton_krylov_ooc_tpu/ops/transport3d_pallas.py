"""whole-year pallas megakernel for the 3D offline IRF-transport model.

The XLA-scan year (ops/imex.imex_year over ops/transport3d.transport_tend)
re-reads the ~13 stencil coefficient fields from HBM every step; at gx3
scale that is ~50 MB of streaming per step and the loop is HBM-bound.
This kernel keeps the ENTIRE problem VMEM-resident -- coefficients, CN
bands, state, and Kahan compensation -- and runs all n_steps inside one
pallas_call, the 3D analog of the 2D megakernels in ops/imex_pallas.py.
The step math is identical to imex_year's composition

    CNh(t0)  [Heun CNf] x (n-1)  Heun  CNh(t_end)

with Kahan-compensated float32 accumulation.  The CN right-hand side is
computed in FLUX form (differences of neighboring levels first, then
scaled) exactly as ops.imex.cn_vertical_increment does -- the
algebraically identical band form loses ~h*eps*|kv/dz| absolutely to
cancellation under stiff mixing (~1e-4 of the state at gx3 step sizes),
while the flux form's error stays relative to the rhs itself.

Steady circulation only: a seasonal coefficient pytree carries a 12x
memory footprint that cannot stay VMEM-resident -- callers fall back to
the XLA scan (imex_year interpolates in-loop) for seasonal runs.

The reference runs this workload by submitting POP to a batch scheduler
(/root/reference/nk_ooc/cime_pop/model_state.py:124-167); the stencil
conventions follow the gen_A preconditioner-matrix spec
(/root/reference/docs/source/users-guide/tracer-module-defn-file.rst:70-105).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .imex_pallas import _pcr_minor2
from .transport3d import _shift, transport_coef_n_time, transport_tend

_VMEM_CAP = 110 << 20  # leave headroom below a v5e core's 128 MiB
# ceiling on the live stencil temporaries of one latitude block: the block
# size is chosen so ~_TEMPS_PER_BLOCK windows of (T, nz, block+4, nlon)
# stay inside this, which is what keeps Mosaic's register allocator from
# spilling whole-field SSA values to VMEM (measured 197 MiB of spill slots
# at gx3 scale when the stencil ran un-blocked over the full grid)
_TEMP_BUDGET = 24 << 20
_TEMPS_PER_BLOCK = 20
_HALO = 2  # upwind3 reaches two rows in latitude


def _padded_field_bytes(nz, nlat, nlon):
    """float32 VMEM bytes of one (nz, nlat, nlon) field after (8, 128)
    tile padding of the trailing two axes"""
    sub = -(-nlat // 8) * 8
    lane = -(-nlon // 128) * 128
    return 4 * nz * sub * lane


def megakernel_fits_vmem(nz, nlat, nlon, t_dim, n_coef=13):
    """advisory: does a t_dim-tracer megakernel of this grid fit the VMEM
    budget?  Callers can test BEFORE building anything; the same estimate
    gates build_transport3d_year_pallas, and Mosaic's compile-time check
    remains the authority on hardware."""
    return _estimate_vmem(nz, nlat, nlon, t_dim, n_coef) <= _VMEM_CAP


def _estimate_vmem(nz, nlat, nlon, t_dim, n_coef):
    # resident fields: coefficients + 2 shared CN band fields + per-tracer
    # (diag, src, y0, out-as-state, Kahan compensation, f1, f2) refs, plus
    # the bounded per-block stencil transients (advisory; Mosaic's
    # compile-time VMEM check is the authority and surfaces as a clear
    # error)
    return (
        _padded_field_bytes(nz, nlat, nlon) * (n_coef + 2 + t_dim * 7)
        + _TEMP_BUDGET
    )


def _lat_blocks(nz, nlat, nlon, t_dim):
    """static latitude-block ranges [(j0, j1), ...] sized so the live
    stencil temporaries of one block stay inside _TEMP_BUDGET"""
    lane = -(-nlon // 128) * 128
    row_bytes = 4 * t_dim * nz * lane  # one lat row of a (T, nz, ., lane)
    rows = _TEMP_BUDGET // (_TEMPS_PER_BLOCK * row_bytes)
    block = max(8, int(rows - 2 * _HALO) // 8 * 8)
    return [(j0, min(j0 + block, nlat)) for j0 in range(0, nlat, block)]


def _shift_axis3(arr, off):
    """result[..., k, :, :] = arr[..., k + off, :, :], zero-filled
    off-grid (the vertical axis is closed; ops.transport3d._shift on the
    depth axis)"""
    return _shift(arr, off, -3)


def _pcr_axis3(dl, d, du, b, nz):
    """reciprocal-form PCR along axis -3 of (..., nz, nlat, nlon) arrays
    (ops/imex_pallas._pcr_minor2 with the depth axis named explicitly)"""
    return _pcr_minor2(
        jnp.broadcast_to(dl, b.shape),
        jnp.broadcast_to(d, b.shape),
        jnp.broadcast_to(du, b.shape),
        b,
        nz,
        recip=True,
        axis=-3,
    )


def build_transport3d_year_pallas(
    coef, kv, dz_r, diag, src, t_span, n_steps, couple=None
):
    """build fn(y0, interpret=False) -> y_end, the whole-year megakernel.

    coef: STEADY stencil pytree from ops.transport3d.build_transport3d
    kv: (nz-1, nlat*nlon) steady vertical-mixing coupling; dz_r: (nz,)
    diag: (T, nz, nlat*nlon) implicit local rates [1/s]
    src: (T, nz, nlat*nlon) explicit sources
    couple: optional STATIC (T, T) surface gas-exchange coupling [1/s]
        (the d_SF_X_d_Y mechanism) -- compiled in as scalar constants
    y0: (T, nz, nlat, nlon) float32 (other dtypes are cast)

    Raises ValueError for seasonal inputs or when the VMEM footprint
    exceeds the per-kernel budget (shard the grid instead:
    parallel/sharded_transport3d.py).
    """
    if transport_coef_n_time(coef) is not None:
        raise ValueError(
            "seasonal coefficients cannot stay VMEM-resident; "
            "use the XLA-scan year (ops.imex.imex_year)"
        )
    kv = np.asarray(kv, np.float32)
    if kv.ndim != 2:
        raise ValueError("seasonal vertical mixing is not supported here")
    dtype = jnp.float32
    wet = np.asarray(coef["wet"], np.float32)
    nz, nlat, nlon = wet.shape
    t_dim = int(np.asarray(diag).shape[0])
    dt = float((t_span[1] - t_span[0]) / n_steps)
    n_steps = int(n_steps)

    coef_names = [
        name for name, arr in sorted(coef.items()) if arr is not None
    ]
    coef_arrays = tuple(
        jnp.asarray(np.asarray(coef[name], np.float32)) for name in coef_names
    )

    # constant Crank-Nicolson bands: (M y)[k] = dl[k] y[k-1] + dmain[k] y[k]
    # + du[k] y[k+1] with dmain = -(du + dl) + diag (the flux-form operator
    # of ops.imex.cn_vertical_increment, expanded)
    dz_r_np = np.asarray(dz_r, np.float64)
    kv3 = np.asarray(kv, np.float64).reshape(nz - 1, nlat, nlon)
    up = kv3 * dz_r_np[:-1, None, None]
    lo = kv3 * dz_r_np[1:, None, None]
    zrow = np.zeros((1, nlat, nlon))
    du_b = np.concatenate([up, zrow], axis=0)
    dl_b = np.concatenate([zrow, lo], axis=0)
    diag4 = np.asarray(diag, np.float64).reshape(t_dim, nz, nlat, nlon)
    src4 = np.asarray(src, np.float32).reshape(t_dim, nz, nlat, nlon)

    couple_np = None
    if couple is not None:
        couple_np = np.asarray(couple, np.float64)
        if couple_np.shape != (t_dim, t_dim):
            raise ValueError("couple must be (tracer, tracer)")

    est = _estimate_vmem(nz, nlat, nlon, t_dim, len(coef_arrays))
    if est > _VMEM_CAP:
        raise ValueError(
            f"~{est >> 20} MiB estimated VMEM for {t_dim} tracers of "
            f"{nz}x{nlat}x{nlon} exceeds the ~{_VMEM_CAP >> 20} MiB "
            "budget; shard the grid (parallel/sharded_transport3d.py)"
        )
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=max(est + (4 << 20), 32 << 20)
    )

    n_coef = len(coef_arrays)
    blocks = _lat_blocks(nz, nlat, nlon, t_dim)

    def kernel(*refs):
        # every per-step pass below walks the STATIC latitude-block list,
        # reading a +/-_HALO-row window of the state through the VMEM refs
        # and writing the block interior back.  Whole-field SSA values
        # never exist, which is what bounds Mosaic's live vector-register
        # set (the un-blocked form of this kernel spilled ~197 MiB of
        # registers to VMEM at gx3 scale and could not compile on a v5e).
        # The window math is IDENTICAL to the full-field form: latitude
        # shifts zero-fill at window edges exactly as ops.transport3d._shift
        # zero-fills off-grid, and only halo-independent rows are kept.
        coef_refs = {name: refs[ind] for ind, name in enumerate(coef_names)}
        dlb_ref = refs[n_coef]
        dub_ref = refs[n_coef + 1]
        # NOTE: the local rates ride as their own operand -- recovering
        # diag as dmain + du + dl in float32 cancels catastrophically
        # (rates ~1e-7/s against mixing bands ~1e-1/s), biasing the
        # integrated rates by ~10%
        diag_ref = refs[n_coef + 2]
        src_ref = refs[n_coef + 3]
        y0_ref = refs[n_coef + 4]
        y_out_ref = refs[n_coef + 5]
        c_scr = refs[n_coef + 6]
        f1_scr = refs[n_coef + 7]
        f2_scr = refs[n_coef + 8]
        y_scr = y_out_ref  # the output buffer doubles as the state

        def win(ref, j0, j1):
            """read rows [j0-_HALO, j1+_HALO) of a lat-axis ref, zero-
            filled off-grid (matching _shift's closed-boundary fill)"""
            ja, jb = max(0, j0 - _HALO), min(nlat, j1 + _HALO)
            index = (slice(None),) * (len(ref.shape) - 2) + (
                slice(ja, jb),
                slice(None),
            )
            vals = ref[index]
            lo, hi = ja - (j0 - _HALO), (j1 + _HALO) - jb
            if lo or hi:
                pad = [(0, 0)] * vals.ndim
                pad[-2] = (lo, hi)
                vals = jnp.pad(vals, pad)
            return vals

        def tend_win(j0, j1, y_of_win):
            """tendency rows [j0, j1) from the window state y_of_win(...)"""
            cw = {
                name: (win(ref, j0, j1) if ref is not None else None)
                for name, ref in coef_refs.items()
            }
            y_w = y_of_win(j0, j1)
            out = transport_tend(cw, y_w) + win(src_ref, j0, j1)
            if couple_np is not None:
                surf = y_w[:, 0]  # (T, W, nlon)
                rows = []
                for x_ind in range(t_dim):
                    acc = None
                    for y_ind in range(t_dim):
                        c_val = float(couple_np[x_ind, y_ind])
                        if c_val != 0.0:
                            term = c_val * surf[y_ind]
                            acc = term if acc is None else acc + term
                    rows.append(
                        jnp.zeros_like(surf[0]) if acc is None else acc
                    )
                sflux = cw["wet"][0] * jnp.stack(rows)
                out = out.at[:, 0].add(sflux)
            return out[:, :, _HALO : _HALO + (j1 - j0), :]

        def kahan_block(j0, j1, delta):
            """compensated y += delta on block-interior rows (in-place
            safe: reads and writes only [j0, j1))"""
            adj = delta + c_scr[:, :, j0:j1, :]
            y_old = y_scr[:, :, j0:j1, :]
            y_new = y_old + adj
            c_scr[:, :, j0:j1, :] = adj - (y_new - y_old)
            y_scr[:, :, j0:j1, :] = y_new

        def cn_pass(h):
            # solve (I - h/2 M) dv = h (M y) column-locally per block; the
            # rhs takes neighbor DIFFERENCES first (flux-form accuracy: the
            # band form dl*y_prev + dmain*y + du*y_next cancels
            # catastrophically under stiff mixing, losing ~h*eps*|kv/dz|)
            half = 0.5 * h
            for j0, j1 in blocks:
                y_b = y_scr[:, :, j0:j1, :]
                dlb = dlb_ref[:, j0:j1, :]
                dub = dub_ref[:, j0:j1, :]
                diag_b = diag_ref[:, :, j0:j1, :]
                d_up = _shift_axis3(y_b, 1) - y_b   # du_b's zero last row
                d_dn = _shift_axis3(y_b, -1) - y_b  # dl_b's zero first row
                m_v = dub * d_up + dlb * d_dn + diag_b * y_b
                b_main = 1.0 + half * (dub + dlb) - half * diag_b
                dv = _pcr_axis3(
                    -half * dlb, b_main, -half * dub, h * m_v, nz
                )
                kahan_block(j0, j1, dv)

        def y_win(j0, j1):
            return win(y_scr, j0, j1)

        def heun():
            # three block passes with barriers between them: pass 2 reads
            # halo rows of f1 from neighboring blocks, and pass 3's y
            # updates must not feed pass 2's halo reads of y
            for j0, j1 in blocks:
                f1_scr[:, :, j0:j1, :] = tend_win(j0, j1, y_win)
            for j0, j1 in blocks:
                f2_scr[:, :, j0:j1, :] = tend_win(
                    j0,
                    j1,
                    lambda a, b: win(y_scr, a, b) + dt * win(f1_scr, a, b),
                )
            for j0, j1 in blocks:
                kahan_block(
                    j0,
                    j1,
                    0.5
                    * dt
                    * (f1_scr[:, :, j0:j1, :] + f2_scr[:, :, j0:j1, :]),
                )

        y_scr[:] = y0_ref[:]
        c_scr[:] = jnp.zeros_like(c_scr[:])
        cn_pass(0.5 * dt)

        def body(_i, carry):
            heun()
            cn_pass(dt)
            return carry

        jax.lax.fori_loop(0, n_steps - 1, body, 0)
        heun()
        cn_pass(0.5 * dt)

    shape4 = (t_dim, nz, nlat, nlon)
    operands = coef_arrays + (
        jnp.asarray(dl_b, dtype),
        jnp.asarray(du_b, dtype),
        jnp.asarray(diag4, dtype),
        jnp.asarray(src4, dtype),
    )

    @partial(jax.jit, static_argnames=("interpret",))
    def year(y0, interpret=False):
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape4, dtype),
            in_specs=[vmem() for _ in range(len(operands) + 1)],
            out_specs=vmem(),
            scratch_shapes=[
                pltpu.VMEM(shape4, dtype),  # Kahan compensation
                pltpu.VMEM(shape4, dtype),  # Heun stage 1
                pltpu.VMEM(shape4, dtype),  # Heun stage 2
            ],
            compiler_params=compiler_params,
            interpret=interpret,
        )(*operands, jnp.asarray(y0, dtype).reshape(shape4))

    return year

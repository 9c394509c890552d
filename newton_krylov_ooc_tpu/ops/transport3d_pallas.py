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

SEASONAL circulation (monthly face fields / vertical mixing with a leading
time axis): the month slabs stay in HBM and only the three months around
the current periodic-interpolation bracket are VMEM-resident, in a ring of
per-field slabs refreshed by one async DMA each time the bracket advances
(n_time DMAs per period -- a rounding error next to per-step streaming).
Each step interpolates the resident slabs at the exact sample times the
XLA scan uses (ops.transport3d.interp_month: samples at interval midpoints
(m + 0.5)/n_time of the period), so seasonal years match the scan at the
float32 discretization level while keeping megakernel speed.

The reference runs this workload by submitting POP to a batch scheduler
(/root/reference/nk_ooc/cime_pop/model_state.py:124-167) and can only
consume the ncra-collapsed annual-mean circulation
(/root/reference/nk_ooc/cime_pop/setup_solver.py:100-166); the stencil
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
from .transport3d import (
    UPWIND3_SELECTOR_KEYS,
    _shift,
    transport_coef_n_time,
    transport_tend,
    upwind3_selectors,
)

SEC_PER_YEAR = 365.0 * 86400.0

_VMEM_CAP = 110 << 20  # leave headroom below a v5e core's 128 MiB


class VmemBudgetError(ValueError):
    """the requested grid/tracer batch exceeds the megakernel's VMEM
    budget estimate -- callers that can split the work (per-module
    megakernels, the sharded year) catch exactly this, never the
    unrelated build-time ValueErrors"""

# ceiling on the live stencil temporaries of one latitude block: the block
# size is chosen so ~_TEMPS_PER_BLOCK windows of (T, nz, block+4, nlon)
# stay inside this, which is what keeps Mosaic's register allocator from
# spilling whole-field SSA values to VMEM (measured 197 MiB of spill slots
# at gx3 scale when the stencil ran un-blocked over the full grid)
_TEMP_BUDGET = 24 << 20
_TEMPS_PER_BLOCK = 20
_HALO = 2  # upwind3 reaches two rows in latitude
_SLABS = 3  # resident months per seasonal field: brackets of t and t+dt


def _padded_field_bytes(nz, nlat, nlon):
    """float32 VMEM bytes of one (nz, nlat, nlon) field after (8, 128)
    tile padding of the trailing two axes"""
    sub = -(-nlat // 8) * 8
    lane = -(-nlon // 128) * 128
    return 4 * nz * sub * lane


def megakernel_fits_vmem(
    nz, nlat, nlon, t_dim, n_coef=7, n_seasonal=0, kv_seasonal=False
):
    """advisory: does a t_dim-tracer megakernel of this grid fit the VMEM
    budget?  n_coef counts the STEADY coefficient fields (7 for the full
    stencil: wet, recip_vol, three transports, two conductances -- the six
    upwind3 selectors are derived from `wet` in-kernel and cost nothing);
    each seasonal field (n_seasonal, plus the two CN band fields when
    kv_seasonal) costs _SLABS resident month slabs instead of one.
    Callers can test BEFORE building anything; the same estimate gates
    build_transport3d_year_pallas, and Mosaic's compile-time check remains
    the authority on hardware."""
    return (
        _estimate_vmem(nz, nlat, nlon, t_dim, n_coef, n_seasonal, kv_seasonal)
        <= _VMEM_CAP
    )


def _estimate_vmem(nz, nlat, nlon, t_dim, n_coef, n_seasonal=0,
                   kv_seasonal=False):
    # resident fields: steady coefficients + CN band fields (2 steady, or
    # 2*_SLABS ring slabs when seasonal) + _SLABS slabs per seasonal
    # coefficient + per-tracer (diag, src, y0, out-as-state, Kahan
    # compensation, f1, f2) refs, plus the bounded per-block stencil
    # transients (advisory; Mosaic's compile-time VMEM check is the
    # authority and surfaces as a clear error).  HBM-resident month stacks
    # do not count.
    bands = 2 * (_SLABS if kv_seasonal else 1)
    # multi-tracer kernels pay heavy register-allocator spills on top of
    # the resident fields (measured: a 2-tracer gx3 kernel spilled 45 MiB
    # of vector registers and OOMed while this sum said it fit) -- charge
    # 12 field-equivalents per tracer beyond the first so oversized
    # families take the per-module split instead of a doomed compile
    spill = (t_dim - 1) * 12
    return (
        _padded_field_bytes(nz, nlat, nlon)
        * (n_coef + _SLABS * n_seasonal + bands + t_dim * 7 + spill)
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


def _cn_bands(kv2, dz_r_np, nz, nlat, nlon):
    """(dl_b, du_b) float64 band fields of one vertical-mixing sample

    constant Crank-Nicolson bands: (M y)[k] = dl[k] y[k-1] + dmain[k] y[k]
    + du[k] y[k+1] with dmain = -(du + dl) + diag (the flux-form operator
    of ops.imex.cn_vertical_increment, expanded)
    """
    kv3 = np.asarray(kv2, np.float64).reshape(nz - 1, nlat, nlon)
    up = kv3 * dz_r_np[:-1, None, None]
    lo = kv3 * dz_r_np[1:, None, None]
    zrow = np.zeros((1, nlat, nlon))
    du_b = np.concatenate([up, zrow], axis=0)
    dl_b = np.concatenate([zrow, lo], axis=0)
    return dl_b, du_b


def build_transport3d_year_pallas(
    coef, kv, dz_r, diag, src, t_span, n_steps, couple=None,
    period=SEC_PER_YEAR,
):
    """build fn(y0, interpret=False) -> y_end, the whole-year megakernel.

    coef: stencil pytree from ops.transport3d.build_transport3d; face
        fields may be SEASONAL ((n_time, nz, nlat, nlon) monthly means)
    kv: (nz-1, nlat*nlon) vertical-mixing coupling, or seasonal
        (n_time, nz-1, nlat*nlon); dz_r: (nz,)
    diag: (T, nz, nlat*nlon) implicit local rates [1/s]
    src: (T, nz, nlat*nlon) explicit sources
    couple: optional STATIC (T, T) surface gas-exchange coupling [1/s]
        (the d_SF_X_d_Y mechanism) -- compiled in as scalar constants
    period: length [s] of the seasonal cycle (the scan path's
        year_frac uses the calendar year regardless of segment span)
    y0: (T, nz, nlat, nlon) float32 (other dtypes are cast)

    Raises ValueError when the VMEM footprint exceeds the per-kernel
    budget (shard the grid instead: parallel/sharded_transport3d.py) or
    when seasonal steps are longer than one coefficient interval.
    """
    kv_np = np.asarray(kv, np.float32)
    kv_seasonal = kv_np.ndim == 3
    n_time = transport_coef_n_time(coef)
    if kv_seasonal:
        if n_time is not None and kv_np.shape[0] != n_time:
            raise ValueError(
                "seasonal kv and coefficient time axes disagree: "
                f"{kv_np.shape[0]} vs {n_time}"
            )
        n_time = n_time or kv_np.shape[0]
    elif kv_np.ndim != 2:
        raise ValueError("kv must be (nz-1, nh) or seasonal (n_time, nz-1, nh)")
    seasonal = n_time is not None

    dtype = jnp.float32
    wet = np.asarray(coef["wet"], np.float32)
    nz, nlat, nlon = wet.shape
    t_dim = int(np.asarray(diag).shape[0])
    dt = float((t_span[1] - t_span[0]) / n_steps)
    t0 = float(t_span[0])
    n_steps = int(n_steps)
    if seasonal and dt > period / n_time:
        raise ValueError(
            f"seasonal megakernel needs dt <= period/n_time "
            f"({period / n_time:.0f} s); got dt={dt:.0f} s -- raise n_steps"
        )

    # the six upwind3 selectors are pure shifts of `wet`: derive them from
    # the resident wet field per block instead of keeping six more fields
    # in VMEM -- ~22 MiB back at gx3 scale, which is what lets two-tracer
    # families fit the whole-year kernel
    upwind3 = coef.get("sel3p_e") is not None
    all_names = [
        name
        for name, arr in sorted(coef.items())
        if arr is not None and name not in UPWIND3_SELECTOR_KEYS
    ]
    seasonal_names = [n for n in all_names if np.asarray(coef[n]).ndim == 4]
    steady_names = [n for n in all_names if n not in seasonal_names]

    def f32(arr):
        return jnp.asarray(np.asarray(arr, np.float32))

    # DMA'd month slabs must be sliceable out of the HBM stacks, and
    # Mosaic requires those slices be whole (8, 128) tiles of the minor
    # two axes -- pad the SEASONAL operands (and their VMEM rings) up
    # front and trim the padding lanes after each interpolated read
    nlat_p = -(-nlat // 8) * 8
    nlon_p = -(-nlon // 128) * 128

    def pad_minor2(arr):
        arr = np.asarray(arr, np.float32)
        pad = [(0, 0)] * arr.ndim
        pad[-2] = (0, nlat_p - arr.shape[-2])
        pad[-1] = (0, nlon_p - arr.shape[-1])
        return jnp.asarray(np.pad(arr, pad))

    steady_ops = tuple(f32(coef[name]) for name in steady_names)
    seasonal_ops = tuple(pad_minor2(coef[name]) for name in seasonal_names)

    dz_r_np = np.asarray(dz_r, np.float64)
    if kv_seasonal:
        months = [
            _cn_bands(kv_np[m], dz_r_np, nz, nlat, nlon)
            for m in range(n_time)
        ]
        dl_b = np.stack([m[0] for m in months])
        du_b = np.stack([m[1] for m in months])
    else:
        dl_b, du_b = _cn_bands(kv_np, dz_r_np, nz, nlat, nlon)
    diag4 = np.asarray(diag, np.float64).reshape(t_dim, nz, nlat, nlon)
    src4 = np.asarray(src, np.float32).reshape(t_dim, nz, nlat, nlon)

    couple_np = None
    if couple is not None:
        couple_np = np.asarray(couple, np.float64)
        if couple_np.shape != (t_dim, t_dim):
            raise ValueError("couple must be (tracer, tracer)")

    est = _estimate_vmem(
        nz, nlat, nlon, t_dim, len(steady_ops), len(seasonal_ops), kv_seasonal
    )
    if est > _VMEM_CAP:
        raise VmemBudgetError(
            f"~{est >> 20} MiB estimated VMEM for {t_dim} tracers of "
            f"{nz}x{nlat}x{nlon} exceeds the ~{_VMEM_CAP >> 20} MiB "
            "budget; shard the grid (parallel/sharded_transport3d.py)"
        )
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=max(est + (4 << 20), 32 << 20)
    )

    n_steady = len(steady_ops)
    n_seasonal = len(seasonal_ops)
    n_dma = n_seasonal + (2 if kv_seasonal else 0)
    blocks = _lat_blocks(nz, nlat, nlon, t_dim)
    # per-period sample coordinate of the periodic midpoint interpolation:
    # x(t) = t/period * n_time - 0.5, kept UNWRAPPED (monotone in t) so the
    # floor doubles as the resident-slab bookkeeping index; interp_month's
    # wrapped mod only re-enters through the HBM month index (mod n_time)
    # and the VMEM slot (mod _SLABS)
    x_scale = float(n_time / period) if seasonal else 0.0

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
        ind = 0
        steady_refs = {
            name: refs[ind + pos] for pos, name in enumerate(steady_names)
        }
        ind += n_steady
        if not kv_seasonal:
            dlb_ref, dub_ref = refs[ind], refs[ind + 1]
            ind += 2
        # NOTE: the local rates ride as their own operand -- recovering
        # diag as dmain + du + dl in float32 cancels catastrophically
        # (rates ~1e-7/s against mixing bands ~1e-1/s), biasing the
        # integrated rates by ~10%
        diag_ref = refs[ind]
        src_ref = refs[ind + 1]
        ind += 2
        seasonal_hbm = {
            name: refs[ind + pos] for pos, name in enumerate(seasonal_names)
        }
        ind += n_seasonal
        if kv_seasonal:
            dlb_hbm, dub_hbm = refs[ind], refs[ind + 1]
            ind += 2
        y0_ref = refs[ind]
        y_out_ref = refs[ind + 1]
        c_scr = refs[ind + 2]
        f1_scr = refs[ind + 3]
        f2_scr = refs[ind + 4]
        ind += 5
        seasonal_scr = {
            name: refs[ind + pos] for pos, name in enumerate(seasonal_names)
        }
        ind += n_seasonal
        if kv_seasonal:
            dlb_scr, dub_scr = refs[ind], refs[ind + 1]
            ind += 2
        if seasonal:
            dma_sem = refs[ind]
            cur_b_ref = refs[ind + 1]
        y_scr = y_out_ref  # the output buffer doubles as the state

        # -- seasonal residency ring ------------------------------------
        # DMA pairs, fixed at trace time: (HBM month stack, VMEM slab ring)
        dma_pairs = [
            (seasonal_hbm[name], seasonal_scr[name])
            for name in seasonal_names
        ]
        if kv_seasonal:
            dma_pairs += [(dlb_hbm, dlb_scr), (dub_hbm, dub_scr)]

        def load_month(month):
            """one async copy per seasonal field: HBM month -> ring slot"""
            hbm_ind = jnp.remainder(month, n_time)
            slot = jnp.remainder(month, _SLABS)
            dmas = [
                pltpu.make_async_copy(
                    hbm.at[hbm_ind], scr.at[slot], dma_sem.at[sem_ind]
                )
                for sem_ind, (hbm, scr) in enumerate(dma_pairs)
            ]
            for dma in dmas:
                dma.start()
            for dma in dmas:
                dma.wait()

        def x_of(t):
            return t * x_scale - 0.5

        def bracket_of(t):
            return jnp.floor(x_of(t)).astype(jnp.int32)

        def tw_of(t):
            """(weight, slot of month m0, slot of m0+1) at sample time t"""
            x = x_of(t)
            m0f = jnp.floor(x)
            m0 = m0f.astype(jnp.int32)
            return (
                (x - m0f).astype(dtype),
                jnp.remainder(m0, _SLABS),
                jnp.remainder(m0 + 1, _SLABS),
            )

        def advance_to(t):
            """keep months {b(t), b(t)+1, b(t)+2} resident -- covers every
            sample in [t, t + dt].  dt <= period/n_time bounds the exact
            bracket advance to one interval per step, but at dt exactly on
            the boundary float32 evaluation of x(t) can round floor(x)
            forward by TWO in one step -- so a 2-interval advance refills
            the skipped slot as well instead of leaving a stale slab"""
            b_now = bracket_of(t)

            @pl.when(b_now > cur_b_ref[0] + 1)
            def _():
                load_month(b_now + 1)

            @pl.when(b_now > cur_b_ref[0])
            def _():
                load_month(b_now + 2)
                cur_b_ref[0] = b_now

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

        def win_slabs(scr, tw, j0, j1):
            """interpolated window of a seasonal slab ring at sample tw
            (trimming the ring's (8, 128) DMA-tile padding)"""
            w_1, s0, s1 = tw
            ja, jb = max(0, j0 - _HALO), min(nlat, j1 + _HALO)
            a = scr[s0, :, ja:jb, :nlon]
            b = scr[s1, :, ja:jb, :nlon]
            vals = (1.0 - w_1) * a + w_1 * b
            lo, hi = ja - (j0 - _HALO), (j1 + _HALO) - jb
            if lo or hi:
                pad = [(0, 0)] * vals.ndim
                pad[-2] = (lo, hi)
                vals = jnp.pad(vals, pad)
            return vals

        def coef_win(name, tw, j0, j1):
            if name in seasonal_scr:
                return win_slabs(seasonal_scr[name], tw, j0, j1)
            ref = steady_refs.get(name)
            return None if ref is None else win(ref, j0, j1)

        def band_block(tw, j0, j1):
            """(dl, du) bands on block rows [j0, j1) at sample tw"""
            if not kv_seasonal:
                return dlb_ref[:, j0:j1, :], dub_ref[:, j0:j1, :]
            w_1, s0, s1 = tw
            dlb = (1.0 - w_1) * dlb_scr[s0, :, j0:j1, :nlon] + (
                w_1 * dlb_scr[s1, :, j0:j1, :nlon]
            )
            dub = (1.0 - w_1) * dub_scr[s0, :, j0:j1, :nlon] + (
                w_1 * dub_scr[s1, :, j0:j1, :nlon]
            )
            return dlb, dub

        def tend_win(tw, j0, j1, y_of_win):
            """tendency rows [j0, j1) from the window state y_of_win(...)"""
            cw = {
                name: coef_win(name, tw, j0, j1) for name in all_names
            }
            if upwind3:
                cw.update(upwind3_selectors(cw["wet"]))
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
                # surface-level add via concat (no Mosaic scatter-add)
                out = jnp.concatenate(
                    [(out[:, 0] + sflux)[:, None], out[:, 1:]], axis=1
                )
            return out[:, :, _HALO : _HALO + (j1 - j0), :]

        def kahan_block(j0, j1, delta):
            """compensated y += delta on block-interior rows (in-place
            safe: reads and writes only [j0, j1))"""
            adj = delta + c_scr[:, :, j0:j1, :]
            y_old = y_scr[:, :, j0:j1, :]
            y_new = y_old + adj
            c_scr[:, :, j0:j1, :] = adj - (y_new - y_old)
            y_scr[:, :, j0:j1, :] = y_new

        def cn_pass(h, tw):
            # solve (I - h/2 M) dv = h (M y) column-locally per block; the
            # rhs takes neighbor DIFFERENCES first (flux-form accuracy: the
            # band form dl*y_prev + dmain*y + du*y_next cancels
            # catastrophically under stiff mixing, losing ~h*eps*|kv/dz|)
            half = 0.5 * h
            for j0, j1 in blocks:
                y_b = y_scr[:, :, j0:j1, :]
                dlb, dub = band_block(tw, j0, j1)
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

        def heun(tw_a, tw_b):
            # three block passes with barriers between them: pass 2 reads
            # halo rows of f1 from neighboring blocks, and pass 3's y
            # updates must not feed pass 2's halo reads of y
            for j0, j1 in blocks:
                f1_scr[:, :, j0:j1, :] = tend_win(tw_a, j0, j1, y_win)
            for j0, j1 in blocks:
                f2_scr[:, :, j0:j1, :] = tend_win(
                    tw_b,
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

        def t_at(i):
            return t0 + i.astype(dtype) * dtype(dt) if seasonal else None

        y_scr[:] = y0_ref[:]
        c_scr[:] = jnp.zeros_like(c_scr[:])
        if seasonal:
            b0 = bracket_of(jnp.asarray(t0, dtype))
            for k in range(_SLABS):
                load_month(b0 + k)
            cur_b_ref[0] = b0
            cn_pass(0.5 * dt, tw_of(jnp.asarray(t0, dtype)))
        else:
            cn_pass(0.5 * dt, None)

        def body(i, carry):
            if seasonal:
                t = t_at(i)
                advance_to(t)
                heun(tw_of(t), tw_of(t + dtype(dt)))
                cn_pass(dt, tw_of(t + dtype(dt)))
            else:
                heun(None, None)
                cn_pass(dt, None)
            return carry

        jax.lax.fori_loop(0, n_steps - 1, body, 0)
        if seasonal:
            t_last = t_at(jnp.asarray(n_steps - 1, jnp.int32))
            advance_to(t_last)
            heun(tw_of(t_last), tw_of(t_last + dtype(dt)))
            cn_pass(0.5 * dt, tw_of(t_last + dtype(dt)))
        else:
            heun(None, None)
            cn_pass(0.5 * dt, None)

    shape4 = (t_dim, nz, nlat, nlon)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)  # noqa: E731

    operands = steady_ops
    in_specs = [vmem() for _ in steady_ops]
    if not kv_seasonal:
        operands += (jnp.asarray(dl_b, dtype), jnp.asarray(du_b, dtype))
        in_specs += [vmem(), vmem()]
    operands += (jnp.asarray(diag4, dtype), jnp.asarray(src4, dtype))
    in_specs += [vmem(), vmem()]
    operands += seasonal_ops
    in_specs += [hbm() for _ in seasonal_ops]
    if kv_seasonal:
        operands += (pad_minor2(dl_b), pad_minor2(du_b))
        in_specs += [hbm(), hbm()]
    in_specs.append(vmem())  # y0

    scratch_shapes = [
        pltpu.VMEM(shape4, dtype),  # Kahan compensation
        pltpu.VMEM(shape4, dtype),  # Heun stage 1
        pltpu.VMEM(shape4, dtype),  # Heun stage 2
    ]
    scratch_shapes += [
        pltpu.VMEM((_SLABS, nz, nlat_p, nlon_p), dtype)
        for _ in seasonal_ops
    ]
    if kv_seasonal:
        scratch_shapes += [
            pltpu.VMEM((_SLABS, nz, nlat_p, nlon_p), dtype)
            for _ in range(2)
        ]
    if seasonal:
        scratch_shapes += [
            pltpu.SemaphoreType.DMA((n_dma,)),
            pltpu.SMEM((1,), jnp.int32),
        ]

    @partial(jax.jit, static_argnames=("interpret",))
    def year(y0, interpret=False):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape4, dtype),
            in_specs=in_specs,
            out_specs=vmem(),
            scratch_shapes=scratch_shapes,
            compiler_params=compiler_params,
            interpret=interpret,
        )(*operands, jnp.asarray(y0, dtype).reshape(shape4))

    return year

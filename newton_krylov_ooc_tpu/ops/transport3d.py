"""3D offline tracer transport operators assembled from IRF circulation
fields, evaluated as on-device stencils.

The reference runs its 3D ocean workload by submitting POP to a batch
scheduler (nk_ooc/cime_pop/model_state.py:124-167) and only ever *assembles*
the transport operator host-side for the preconditioner, via the external
gen_A tool (nk_ooc/cime_pop/model_state.py:84-87; spec
docs/source/users-guide/tracer-module-defn-file.rst:70-105).  Here the same
POP-convention circulation fields (face volume transports UET/VNT/WTT,
face conductances HDIFF_E/N, TAREA, dz) become *device* stencil operators,
so the annual transport integration itself runs on the TPU -- the offline
(IRF-driven) tracer model the reference cannot express.

Conventions (identical to native/precond_tools/gen_A.cpp, which is pinned
against an independent numpy assembly in tests/test_native.py):
  UET[k,j,i]  volume transport across the EAST face of cell (k,j,i)
              [cm^3/s], positive eastward; zonally periodic
  VNT[k,j,i]  transport across the NORTH face [cm^3/s]; north face of the
              last latitude row is closed
  WTT[k,j,i]  transport across the TOP face [cm^3/s], positive UP (POP
              convention); the surface face is closed
  HDIFF_E/N   diffusive conductances kappa*A/dx across east/north faces
              [cm^3/s]
  TAREA[j,i]  horizontal cell area [cm^2]; with dz[k] [cm] gives volumes
Faces touching a masked cell carry no flux.  upwind3 uses the 3rd-order
upwind-biased face value (-T_uu + 5 T_up + 2 T_down)/6, falling back to
1st-order upwind where the far-upwind cell is masked or off-grid.  The
divergence is flux-form, so the volume-weighted integral of the
advective+diffusive tendency vanishes identically (tracer conservation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SIXTH = 1.0 / 6.0

# coefficient arrays that may carry a leading (seasonal) time axis; the
# selector/geometry arrays are mask-derived and always static
_TIME_VARYING_KEYS = ("t_e", "t_n", "t_t", "cond_e", "cond_n")


def transport_coef_n_time(coef):
    """leading time-axis length of the face arrays (None if steady)"""
    for key in _TIME_VARYING_KEYS:
        arr = coef.get(key)
        if arr is not None and arr.ndim == 4:
            return arr.shape[0]
    return None


def interp_month(arr, frac):
    """periodic linear interpolation along a leading time axis whose
    samples sit at interval midpoints (m + 0.5)/n_time of the period;
    frac is the (traced) fraction of the period in [0, 1)"""
    n_t = arr.shape[0]
    x = frac * n_t - 0.5
    m0f = jnp.floor(x)
    w1 = jnp.asarray(x - m0f, arr.dtype)
    m0 = jnp.asarray(m0f, jnp.int32) % n_t
    m1 = (m0 + 1) % n_t
    a0 = jax.lax.dynamic_index_in_dim(arr, m0, 0, keepdims=False)
    a1 = jax.lax.dynamic_index_in_dim(arr, m1, 0, keepdims=False)
    return (1.0 - w1) * a0 + w1 * a1


def assemble_rate_fields(specs, wet, dz_surf, sec_per_year):
    """local linear rates of a tracer module from its gen_A-vocabulary specs

    specs: per-tracer dicts with (all optional) source_per_year,
    sink_rate_per_year, surf_restore_pv_cm_s, surf_restore_target,
    surf_flux_const_cm_s, surf_flux_d ({tracer_name: cm/s} linearized
    gas-exchange derivatives -- the reference's d_SF_X_d_Y fields,
    nk_ooc/cime_pop/tracer_module_state.py:192-229); wet: (nz, nh) 0/1
    mask; dz_surf: surface layer thickness [cm].

    Returns (diag, src, couple): implicit per-tracer rates [1/s] and
    explicit sources [tracer/s], each (tracer_cnt, nz, nh), plus the
    cross-tracer surface coupling matrix (tracer_cnt, tracer_cnt) [1/s at
    the surface layer] or None when no off-diagonal terms exist.  The
    surf_flux_d SELF-derivatives fold into diag (solved implicitly); only
    the off-diagonal (nilpotent) part stays explicit in couple.
    """
    names = [spec.get("name") for spec in specs]
    nz, nh = wet.shape
    diag = np.zeros((len(specs), nz, nh))
    src = np.zeros((len(specs), nz, nh))
    couple = np.zeros((len(specs), len(specs)))
    for ind, spec in enumerate(specs):
        diag[ind] -= spec.get("sink_rate_per_year", 0.0) / sec_per_year
        src[ind] += spec.get("source_per_year", 0.0) / sec_per_year
        pv = spec.get("surf_restore_pv_cm_s", 0.0)
        if pv != 0.0:
            # gen_A `pv` convention: surface-layer rate pv/dz_surf [1/s]
            rate = pv / dz_surf
            diag[ind, 0, :] -= rate
            src[ind, 0, :] += rate * spec.get("surf_restore_target", 0.0)
        src[ind, 0, :] += spec.get("surf_flux_const_cm_s", 0.0) / dz_surf
        for other, deriv in spec.get("surf_flux_d", {}).items():
            if other not in names:
                raise ValueError(
                    f"surf_flux_d of {spec.get('name')} names a tracer "
                    f"not in its module: {other}"
                )
            rate = deriv / dz_surf
            if other == spec.get("name"):
                diag[ind, 0, :] += rate
            else:
                couple[ind, names.index(other)] += rate
        diag[ind] *= wet
        src[ind] *= wet
    return diag, src, (couple if couple.any() else None)


def mean_transport_coef(coef):
    """annual-mean coefficient pytree of a (possibly seasonal) one --
    what the reference's ncra-averaged IRF mean file would have produced;
    used for the linearized preconditioner operator"""
    out = dict(coef)
    for key in _TIME_VARYING_KEYS:
        arr = coef.get(key)
        if arr is not None and arr.ndim == 4:
            out[key] = arr.mean(axis=0)
    return out


def interp_transport_coef(coef, frac):
    """sample a seasonal coefficient pytree at a fraction of the period;
    steady entries (and a fully steady pytree) pass through unchanged"""
    out = dict(coef)
    for key in _TIME_VARYING_KEYS:
        arr = coef.get(key)
        if arr is not None and arr.ndim == 4:
            out[key] = interp_month(arr, frac)
    return out


def _shift(arr, off, axis):
    """result[..., idx, ...] = arr[..., idx + off, ...], zero-filled
    off-grid (for the non-periodic lat/depth axes)"""
    if off == 0:
        return arr
    pad = [(0, 0)] * arr.ndim
    index = [slice(None)] * arr.ndim
    if off > 0:
        pad[axis] = (0, off)
        index[axis] = slice(off, None)
    else:
        pad[axis] = (-off, 0)
        index[axis] = slice(None, off)
    return jnp.pad(arr, pad)[tuple(index)]


def build_transport3d(
    mask,
    dz,
    tarea,
    uet=None,
    vnt=None,
    wtt=None,
    hdiff_e=None,
    hdiff_n=None,
    adv_type="upwind3",
    dtype=None,
):
    """precompute the stencil coefficient pytree for transport_tend

    mask: (nz, nlat, nlon) ints, >0 = wet; dz: (nz,) [cm];
    tarea: (nlat, nlon) [cm^2]; uet/vnt/wtt/hdiff_*: (nz, nlat, nlon)
    [cm^3/s] (None = term absent); adv_type: upwind3 | centered

    SEASONAL circulation: any face field may instead be (n_time, nz, nlat,
    nlon) -- e.g. the monthly IRF means the reference's setup ncra-averages
    away (nk_ooc/cime_pop/setup_solver.py:100-166).  The resulting
    time-varying coefficient arrays carry the leading time axis; sample
    them at a time of year with interp_transport_coef before calling
    transport_tend.

    Returned arrays are plain jnp values: pass the dict as a jit OPERAND
    (never closure-capture it -- large captured constants re-upload per
    call on remote-device backends).
    """
    if adv_type not in ("upwind3", "centered"):
        raise ValueError(f"adv_type {adv_type!r} not supported")
    mask = np.asarray(mask)
    if mask.ndim != 3:
        raise ValueError("mask must be (nz, nlat, nlon)")
    nz, nlat, nlon = mask.shape
    if dtype is None:
        dtype = jnp.zeros(0).dtype  # the process default float
    wet = (mask > 0).astype(np.float64)
    vol = np.asarray(dz, np.float64)[:, None, None] * np.asarray(
        tarea, np.float64
    )[None, :, :]

    def prep(field, other_wet):
        """mask a face field: zero where either side of the face is dry"""
        if field is None:
            return None
        field = np.asarray(field, np.float64)
        if field.ndim not in (3, 4):
            raise ValueError("face fields must be rank 3 or (seasonal) 4")
        vals = field * wet * other_wet  # broadcasts over a leading time axis
        return jnp.asarray(vals, dtype)

    wet_e = np.roll(wet, -1, axis=2)
    wet_n = np.concatenate([wet[:, 1:, :], np.zeros((nz, 1, nlon))], axis=1)
    wet_up = np.concatenate([np.zeros((1, nlat, nlon)), wet[:-1, :, :]], axis=0)

    coef = {
        "wet": jnp.asarray(wet, dtype),
        "recip_vol": jnp.asarray(wet / vol, dtype),
        "t_e": prep(uet, wet_e),
        "t_n": prep(vnt, wet_n),
        # top face of cell k couples k (below) and k-1 (above); surface closed
        "t_t": prep(wtt, wet_up) if wtt is not None else None,
        "cond_e": prep(hdiff_e, wet_e),
        "cond_n": prep(hdiff_n, wet_n),
    }
    if coef["t_t"] is not None:
        coef["t_t"] = coef["t_t"].at[..., 0, :, :].set(0.0)
    if adv_type == "upwind3":
        # 3rd-order usable only where the far-upwind cell is wet and on-grid
        coef["sel3p_e"] = jnp.asarray(np.roll(wet, 1, axis=2), dtype)
        coef["sel3n_e"] = jnp.asarray(np.roll(wet, -2, axis=2), dtype)
        z_lat = np.zeros((nz, 1, nlon))
        coef["sel3p_n"] = jnp.asarray(
            np.concatenate([z_lat, wet[:, :-1, :]], axis=1), dtype
        )
        coef["sel3n_n"] = jnp.asarray(
            np.concatenate([wet[:, 2:, :], z_lat, z_lat], axis=1), dtype
        )
        z_z = np.zeros((1, nlat, nlon))
        # positive (upward) transport: upwind cell is k, far-upwind k+1
        coef["sel3p_t"] = jnp.asarray(
            np.concatenate([wet[1:, :, :], z_z], axis=0), dtype
        )
        # negative: upwind cell is k-1, far-upwind k-2
        coef["sel3n_t"] = jnp.asarray(
            np.concatenate([z_z, z_z, wet[:-2, :, :]], axis=0), dtype
        )
    return coef


UPWIND3_SELECTOR_KEYS = (
    "sel3p_e", "sel3n_e", "sel3p_n", "sel3n_n", "sel3p_t", "sel3n_t",
)


def upwind3_selectors(wet):
    """derive the six upwind3 far-cell selector fields from a wet mask.

    Every selector is a pure shift of `wet` (periodic in lon, zero-filled
    in lat/depth) -- identical to the arrays build_transport3d
    precomputes, so streaming/VMEM-resident kernels can hold only `wet`
    and rebuild the selectors on the fly (six fewer resident/streamed
    fields).  Valid wherever `wet` itself is valid to a 2-cell shift:
    on a lat-window, rows within 2 of a window cut get zero-filled
    neighbors exactly as a dry halo row would provide.
    """
    return {
        "sel3p_e": jnp.roll(wet, 1, axis=-1),
        "sel3n_e": jnp.roll(wet, -2, axis=-1),
        "sel3p_n": _shift(wet, -1, -2),
        "sel3n_n": _shift(wet, 2, -2),
        "sel3p_t": _shift(wet, 1, -3),
        "sel3n_t": _shift(wet, -2, -3),
    }


def _face_value(trans, y_up, y_dn, y_uu, y_dd, sel3p, sel3n, upwind3):
    """advective face tracer value for transport `trans` from cell `up`
    toward cell `dn` (positive trans); y_uu/y_dd are the far cells"""
    if not upwind3:
        return 0.5 * (y_up + y_dn)
    v_pos = sel3p * _SIXTH * (-y_uu + 5.0 * y_up + 2.0 * y_dn) + (
        1.0 - sel3p
    ) * y_up
    v_neg = sel3n * _SIXTH * (2.0 * y_up + 5.0 * y_dn - y_dd) + (
        1.0 - sel3n
    ) * y_dn
    return jnp.where(trans > 0.0, v_pos, v_neg)


def transport_tend(coef, y):
    """advection + lateral-diffusion tendency dy/dt [tracer/s]

    y: (..., nz, nlat, nlon); returns the same shape, exactly zero on land.
    Linear in y.  coef must be a STEADY pytree here: sample a seasonal one
    at the wanted time of year with interp_transport_coef first.
    """
    # upwind3 is encoded by the presence of the selector arrays, so it stays
    # static (pytree structure) when coef is passed as a jit operand
    up3 = "sel3p_e" in coef
    y = y * coef["wet"]
    flux_div = jnp.zeros_like(y)

    if coef.get("t_e") is not None or coef.get("cond_e") is not None:
        y_e = jnp.roll(y, -1, axis=-1)
        flux = jnp.zeros_like(y)
        if coef.get("t_e") is not None:
            val = _face_value(
                coef.get("t_e"),
                y,
                y_e,
                jnp.roll(y, 1, axis=-1),
                jnp.roll(y, -2, axis=-1),
                coef.get("sel3p_e"),
                coef.get("sel3n_e"),
                up3,
            )
            flux = coef.get("t_e") * val
        if coef.get("cond_e") is not None:
            flux = flux + coef.get("cond_e") * (y - y_e)
        flux_div = flux_div + jnp.roll(flux, 1, axis=-1) - flux

    if coef.get("t_n") is not None or coef.get("cond_n") is not None:
        y_n = _shift(y, 1, -2)
        flux = jnp.zeros_like(y)
        if coef.get("t_n") is not None:
            val = _face_value(
                coef.get("t_n"),
                y,
                y_n,
                _shift(y, -1, -2),
                _shift(y, 2, -2),
                coef.get("sel3p_n"),
                coef.get("sel3n_n"),
                up3,
            )
            flux = coef.get("t_n") * val
        if coef.get("cond_n") is not None:
            flux = flux + coef.get("cond_n") * (y - y_n)
        flux_div = flux_div + _shift(flux, -1, -2) - flux

    if coef.get("t_t") is not None:
        # flux UP across the top face of cell k: leaves k, enters k-1;
        # upwind cell for positive (upward) transport is k itself
        y_above = _shift(y, -1, -3)
        val = _face_value(
            coef.get("t_t"),
            y,
            y_above,
            _shift(y, 1, -3),
            _shift(y, -2, -3),
            coef.get("sel3p_t"),
            coef.get("sel3n_t"),
            up3,
        )
        flux = coef.get("t_t") * val
        flux_div = flux_div + _shift(flux, 1, -3) - flux

    return flux_div * coef["recip_vol"]


def _face_derivs(trans, sel3p, sel3n, upwind3):
    """per-face partial derivatives of _face_value wrt its four cell values

    returns (d_up, d_dn, d_uu, d_dd), each the face-field shape; the where()
    on the transport sign mirrors _face_value exactly.
    """
    if not upwind3:
        half = 0.5 * jnp.ones_like(trans)
        zero = jnp.zeros_like(trans)
        return half, half, zero, zero
    pos = trans > 0.0
    d_up = jnp.where(pos, sel3p * (5.0 * _SIXTH) + (1.0 - sel3p),
                     sel3n * (2.0 * _SIXTH))
    d_dn = jnp.where(pos, sel3p * (2.0 * _SIXTH),
                     sel3n * (5.0 * _SIXTH) + (1.0 - sel3n))
    d_uu = jnp.where(pos, -sel3p * _SIXTH, 0.0)
    d_dd = jnp.where(pos, 0.0, -sel3n * _SIXTH)
    return d_up, d_dn, d_uu, d_dd


def transport_tridiag_bands(coef):
    """exact same-column tridiagonal part of the transport_tend operator

    returns (lo, diag, up), each (..., nz, nlat, nlon) in tendency units
    [1/s]: diag[k] = d tend[k] / d y[k] (every direction's diagonal
    contribution, advective and diffusive), lo[k] = d tend[k] / d y[k-1]
    and up[k] = d tend[k] / d y[k+1] (the vertical-advection couplings,
    including the upwind3 far-cell terms that land on adjacent levels).

    This is the transport contribution to a vertical-line (column
    tridiagonal) preconditioner: together with the implicit vertical-mixing
    bands it captures everything stiff plus the full diagonal of dt*M - I,
    leaving only the strictly lateral couplings to the Krylov iteration --
    the same line-relaxation upgrade the gen_A device solver applies
    (ops/sparse.column_tridiag_from_csr).  coef must be a STEADY pytree
    (sample or mean a seasonal one first).
    """
    up3 = "sel3p_e" in coef
    zeros = jnp.zeros_like(coef["wet"])
    diag = zeros
    lo = zeros
    up = zeros

    if coef.get("t_e") is not None or coef.get("cond_e") is not None:
        flux_dup = zeros
        flux_ddn = zeros
        if coef.get("t_e") is not None:
            d_up, d_dn, _uu, _dd = _face_derivs(
                coef["t_e"], coef.get("sel3p_e"), coef.get("sel3n_e"), up3
            )
            flux_dup = coef["t_e"] * d_up
            flux_ddn = coef["t_e"] * d_dn
        if coef.get("cond_e") is not None:
            flux_dup = flux_dup + coef["cond_e"]
            flux_ddn = flux_ddn - coef["cond_e"]
        # east face of c: y[c] is y_up; west face (= east face of c-1,
        # periodic): y[c] is y_dn
        diag = diag + jnp.roll(flux_ddn, 1, axis=-1) - flux_dup

    if coef.get("t_n") is not None or coef.get("cond_n") is not None:
        flux_dup = zeros
        flux_ddn = zeros
        if coef.get("t_n") is not None:
            d_up, d_dn, _uu, _dd = _face_derivs(
                coef["t_n"], coef.get("sel3p_n"), coef.get("sel3n_n"), up3
            )
            flux_dup = coef["t_n"] * d_up
            flux_ddn = coef["t_n"] * d_dn
        if coef.get("cond_n") is not None:
            flux_dup = flux_dup + coef["cond_n"]
            flux_ddn = flux_ddn - coef["cond_n"]
        diag = diag + _shift(flux_ddn, -1, -2) - flux_dup

    if coef.get("t_t") is not None:
        # face k couples y_up=y[k], y_dn=y[k-1], y_uu=y[k+1], y_dd=y[k-2];
        # tend[k] gets +flux[k+1] - flux[k]
        d_up, d_dn, d_uu, d_dd = _face_derivs(
            coef["t_t"], coef.get("sel3p_t"), coef.get("sel3n_t"), up3
        )
        t = coef["t_t"]
        diag = diag + _shift(t * d_dn, 1, -3) - t * d_up
        lo = lo + _shift(t * d_dd, 1, -3) - t * d_dn
        up = up + _shift(t * d_up, 1, -3) - t * d_uu

    rv = coef["recip_vol"]
    return lo * rv, diag * rv, up * rv


# the explicit transport stencil reaches two cells per direction (upwind3
# far cells); streaming kernels derive their per-step garbage creep and
# halo sizing from this -- a wider future scheme then fails loudly in the
# builders instead of silently corrupting interior rows
STENCIL_RADIUS = 2

# offsets (dz, dlat, dlon) of the 13-point transport stencil, center
# first; result[i] = sum_o c_o[i] * y[i + o] with lon periodic and
# lat/depth zero-filled off-grid.  The order is the contract between
# transport_stencil_coef and stencil_tend (and the streaming kernels'
# window stacks).
STENCIL_OFFSETS = (
    (0, 0, 0),
    (0, 0, 1), (0, 0, -1), (0, 0, 2), (0, 0, -2),
    (0, 1, 0), (0, -1, 0), (0, 2, 0), (0, -2, 0),
    (1, 0, 0), (-1, 0, 0), (2, 0, 0), (-2, 0, 0),
)


def transport_stencil_coef(coef):
    """collapse a STEADY transport_tend operator to 13 stencil fields.

    transport_tend is linear in y with static coefficients (the upwind
    selection depends only on the sign of the steady face transports), so
    the whole operator is c[o][i] = d tend[i] / d y[i+o] over the 13
    offsets of STENCIL_OFFSETS: per face the _face_derivs partials times
    the face transport (plus the diffusive conductance on the near pair),
    gathered onto the two cells each face feeds, scaled by recip_vol, and
    carrying the source cell's wet factor (transport_tend masks y by wet
    before differencing).  This is the same operator the reference's
    external gen_A tool assembles as a sparse MATRIX for its
    preconditioner (/root/reference/nk_ooc/cime_pop/model_state.py:
    317-337); here it feeds the streaming year kernel's stencil mode,
    where 13 fused multiply-adds per cell replace the full
    selector/blend/flux chain (the VPU-bound part of the stream kernel)
    at the price of streaming 13 coefficient windows instead of 6.

    Returns (13, nz, nlat, nlon) in STENCIL_OFFSETS order.  Applying it
    with stencil_tend reproduces transport_tend to reassociation
    roundoff (the flux form sums face differences, this form sums
    per-offset products), NOT bitwise: constant fields see O(1 ulp)
    residual tendencies where the flux form cancels exactly.
    """
    up3 = "sel3p_e" in coef and coef.get("sel3p_e") is not None
    wet = coef["wet"]
    zeros = jnp.zeros_like(wet)
    c = {off: zeros for off in STENCIL_OFFSETS}

    def face_terms(t_key, cond_key, selp_key, seln_key):
        """(f_up, f_dn, f_uu, f_dd): d flux / d (near-up, near-dn,
        far-up, far-dn) for one face direction"""
        t = coef.get(t_key)
        cond = coef.get(cond_key)
        f_up = f_dn = f_uu = f_dd = zeros
        if t is not None:
            d_up, d_dn, d_uu, d_dd = _face_derivs(
                t, coef.get(selp_key), coef.get(seln_key), up3
            )
            f_up, f_dn, f_uu, f_dd = t * d_up, t * d_dn, t * d_uu, t * d_dd
        if cond is not None:
            f_up = f_up + cond
            f_dn = f_dn - cond
        return f_up, f_dn, f_uu, f_dd

    # east faces: flux[i] feeds cells i (out) and i+1 (in, periodic);
    # tend[i] = flux[i-1] - flux[i], so coefficients gather the i-1 face
    # terms through a +1 roll (value at i-1)
    if coef.get("t_e") is not None or coef.get("cond_e") is not None:
        f_up, f_dn, f_uu, f_dd = face_terms(
            "t_e", "cond_e", "sel3p_e", "sel3n_e"
        )
        r1 = lambda a: jnp.roll(a, 1, axis=-1)  # noqa: E731
        c[(0, 0, 0)] = c[(0, 0, 0)] + r1(f_dn) - f_up
        c[(0, 0, 1)] = c[(0, 0, 1)] + r1(f_dd) - f_dn
        c[(0, 0, -1)] = c[(0, 0, -1)] + r1(f_up) - f_uu
        c[(0, 0, -2)] = c[(0, 0, -2)] + r1(f_uu)
        c[(0, 0, 2)] = c[(0, 0, 2)] - f_dd

    # north faces: same structure along lat with zero-filled shifts
    if coef.get("t_n") is not None or coef.get("cond_n") is not None:
        f_up, f_dn, f_uu, f_dd = face_terms(
            "t_n", "cond_n", "sel3p_n", "sel3n_n"
        )
        s1 = lambda a: _shift(a, -1, -2)  # noqa: E731 -- value at j-1
        c[(0, 0, 0)] = c[(0, 0, 0)] + s1(f_dn) - f_up
        c[(0, 1, 0)] = c[(0, 1, 0)] + s1(f_dd) - f_dn
        c[(0, -1, 0)] = c[(0, -1, 0)] + s1(f_up) - f_uu
        c[(0, -2, 0)] = c[(0, -2, 0)] + s1(f_uu)
        c[(0, 2, 0)] = c[(0, 2, 0)] - f_dd

    # top faces: face k couples y_up=y[k], y_dn=y[k-1], y_uu=y[k+1],
    # y_dd=y[k-2]; tend[k] = flux[k+1] - flux[k]
    if coef.get("t_t") is not None:
        f_up, f_dn, f_uu, f_dd = face_terms(
            "t_t", None, "sel3p_t", "sel3n_t"
        )
        s1 = lambda a: _shift(a, 1, -3)  # noqa: E731 -- value at k+1
        c[(0, 0, 0)] = c[(0, 0, 0)] + s1(f_dn) - f_up
        c[(1, 0, 0)] = c[(1, 0, 0)] + s1(f_up) - f_uu
        c[(-1, 0, 0)] = c[(-1, 0, 0)] + s1(f_dd) - f_dn
        c[(2, 0, 0)] = c[(2, 0, 0)] + s1(f_uu)
        c[(-2, 0, 0)] = c[(-2, 0, 0)] - f_dd

    rv = coef["recip_vol"]

    def src_wet(off):
        dz_, dy_, dx_ = off
        w = wet
        if dx_:
            w = jnp.roll(w, -dx_, axis=-1)
        if dy_:
            w = _shift(w, dy_, -2)
        if dz_:
            w = _shift(w, dz_, -3)
        return w

    return jnp.stack(
        [rv * c[off] * src_wet(off) for off in STENCIL_OFFSETS]
    )


def stencil_tend(st, y):
    """apply a transport_stencil_coef operator: 13 fused multiply-adds.

    st: (13,) + grid (or any sequence of 13 per-offset fields that
    broadcast against y); y: (..., nz, nlat, nlon).  Exactly zero on land
    (every c_o carries recip_vol's wet factor)."""
    acc = st[0] * y
    for ind, (dz_, dy_, dx_) in enumerate(STENCIL_OFFSETS[1:], 1):
        y_s = y
        if dx_:
            y_s = jnp.roll(y_s, -dx_, axis=-1)
        if dy_:
            y_s = _shift(y_s, dy_, -2)
        if dz_:
            y_s = _shift(y_s, dz_, -3)
        acc = acc + st[ind] * y_s
    return acc


def vmix_vertical_coeff(vdc, dz):
    """vertical-mixing coupling for the implicit (Crank-Nicolson) solve

    vdc: (nz, nlat, nlon) interface diffusivity below each level [cm^2/s]
    (VDC convention; the bottom row is unused), or seasonal
    (n_time, nz, nlat, nlon); dz: (nz,) [cm]

    returns (kv, dz_r): kv ([n_time,] nz-1, nlat*nlon) = kappa/dz_mid [m/s]
    and dz_r (nz,) = 1/dz [1/m], the operands ops.imex.cn_vertical_increment
    expects -- units follow gen_A.cpp:182-198 (cm -> m conversions) so the
    assembled rates match the preconditioner matrix exactly
    """
    vdc = np.asarray(vdc, np.float64)
    dz_m = 1.0e-2 * np.asarray(dz, np.float64)
    dz_mid = 0.5 * (dz_m[:-1] + dz_m[1:])
    kappa = 1.0e-4 * vdc[..., :-1, :, :]  # cm^2/s -> m^2/s, interface below k
    kv = kappa / dz_mid[:, None, None]
    return (
        jnp.asarray(kv.reshape(kv.shape[:-2] + (-1,))),
        jnp.asarray(1.0 / dz_m),
    )


def mask_vmix_coeff(kv, mask):
    """zero the vertical-mixing coupling across faces touching dry cells

    kv: ([n_time,] nz-1, nlat*nlon); mask: (nz, nlat, nlon)
    """
    wet = (np.asarray(mask).reshape(mask.shape[0], -1) > 0).astype(np.float64)
    return kv * jnp.asarray(wet[:-1, :] * wet[1:, :], kv.dtype)

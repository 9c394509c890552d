"""tridiagonal (Thomas) solvers: jittable JAX scan version for on-device
preconditioner applies and implicit vertical-mixing steps, plus a vectorized
numpy version for the host solver path.

TPU notes: the Thomas recurrence is sequential in the vertical but embarrassingly
parallel across columns/tracers/systems -- the JAX version vmaps the batch axis
so the VPU processes whole column-batches per recurrence step.  Unlike dense
LuDecomposition, this runs in float64 on TPU (pure arithmetic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def thomas_solve(dl, d, du, b):
    """
    solve the tridiagonal system with sub/main/super diagonals (dl, d, du)

    dl: (n,) with dl[0] unused; d: (n,); du: (n,) with du[-1] unused; b: (n,)
    batched via vmap over leading axes.
    """
    n = d.shape[0]

    def fwd(carry, inp):
        c_prev, g_prev = carry
        dl_i, d_i, du_i, b_i = inp
        denom = d_i - dl_i * c_prev
        c_i = du_i / denom
        g_i = (b_i - dl_i * g_prev) / denom
        return (c_i, g_i), (c_i, g_i)

    inp = (dl, d, du, b)
    (_, _), (c_all, g_all) = jax.lax.scan(
        fwd, (jnp.zeros((), d.dtype), jnp.zeros((), d.dtype)), inp
    )

    def back(carry, inp):
        x_next = carry
        c_i, g_i = inp
        x_i = g_i - c_i * x_next
        return x_i, x_i

    _, x_rev = jax.lax.scan(
        back, jnp.zeros((), d.dtype), (c_all, g_all), reverse=True
    )
    return x_rev


def thomas_solve_batch(dl, d, du, b):
    """batched Thomas solve: all args (batch, n); solves along the last axis"""
    return jax.vmap(thomas_solve)(dl, d, du, b)


def thomas_solve_np(dl, d, du, b):
    """numpy Thomas solve (host path), same argument convention"""
    n = d.shape[-1]
    dl = np.asarray(dl, dtype=np.float64)
    d = np.asarray(d, dtype=np.float64)
    du = np.asarray(du, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.empty_like(d)
    g = np.empty_like(b)
    c[..., 0] = du[..., 0] / d[..., 0]
    g[..., 0] = b[..., 0] / d[..., 0]
    for i in range(1, n):
        denom = d[..., i] - dl[..., i] * c[..., i - 1]
        c[..., i] = du[..., i] / denom
        g[..., i] = (b[..., i] - dl[..., i] * g[..., i - 1]) / denom
    x = np.empty_like(b)
    x[..., -1] = g[..., -1]
    for i in range(n - 2, -1, -1):
        x[..., i] = g[..., i] - c[..., i] * x[..., i + 1]
    return x


def pcr_solve(dl, d, du, b):
    """parallel-cyclic-reduction tridiagonal solve along the LAST axis

    All arguments (..., n) with the Thomas convention (dl[..., 0] and
    du[..., -1] unused).  ceil(log2(n)) fully-vectorized stages instead of 2n
    sequential recurrence steps -- the depth-optimal form for accelerators,
    where the batched Thomas scan's latency is the step-time floor of the
    IMEX kernel.  Stable for the diagonally dominant Crank-Nicolson systems
    (same regime as the pivot-free banded LU).
    """
    n = d.shape[-1]
    if n == 1:
        return b / d
    a_c = jnp.where(
        jnp.arange(n) == 0, jnp.zeros((), d.dtype), dl
    )
    c_c = jnp.where(
        jnp.arange(n) == n - 1, jnp.zeros((), d.dtype), du
    )
    b_c, r_c = d, b

    def shifted(arr, shift, fill):
        """arr shifted so that out[..., i] = arr[..., i + shift], padded"""
        if shift > 0:
            pad = jnp.full(arr.shape[:-1] + (shift,), fill, arr.dtype)
            return jnp.concatenate([arr[..., shift:], pad], axis=-1)
        pad = jnp.full(arr.shape[:-1] + (-shift,), fill, arr.dtype)
        return jnp.concatenate([pad, arr[..., :shift]], axis=-1)

    stride = 1
    while stride < n:
        # neighbors at i -/+ stride; out-of-range rows act as identity rows
        a_m = shifted(a_c, -stride, 0.0)
        b_m = shifted(b_c, -stride, 1.0)
        c_m = shifted(c_c, -stride, 0.0)
        r_m = shifted(r_c, -stride, 0.0)
        a_p = shifted(a_c, stride, 0.0)
        b_p = shifted(b_c, stride, 1.0)
        c_p = shifted(c_c, stride, 0.0)
        r_p = shifted(r_c, stride, 0.0)

        alpha = -a_c / b_m
        gamma = -c_c / b_p
        a_c = alpha * a_m
        c_c = gamma * c_p
        b_c = b_c + alpha * c_m + gamma * a_p
        r_c = r_c + alpha * r_m + gamma * r_p
        stride *= 2

    return r_c / b_c

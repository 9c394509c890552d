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

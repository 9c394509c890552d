"""tests for the JAX Radau IIA(5) integrator against scipy's Radau"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import integrate

from newton_krylov_ooc_tpu.ops.radau import radau5_integrate


def test_linear_scalar():
    """dy/dt = -y, exact solution known"""
    fun = lambda t, y: -y
    ys, info = jax.jit(
        lambda y0: radau5_integrate(
            fun, (0.0, 2.0), y0, jnp.array([0.0, 1.0, 2.0]), rtol=1e-10, atol=1e-10
        )
    )(jnp.array([1.0]))
    assert bool(info["success"])
    assert np.allclose(np.asarray(ys[:, 0]), np.exp([-0.0, -1.0, -2.0]), rtol=1e-8)


def test_stiff_robertson():
    """Robertson chemical kinetics, the classic stiff benchmark"""

    def fun(t, y):
        return jnp.array(
            [
                -0.04 * y[0] + 1e4 * y[1] * y[2],
                0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                3e7 * y[1] ** 2,
            ]
        )

    y0 = jnp.array([1.0, 0.0, 0.0])
    t_eval = jnp.array([0.0, 1.0, 10.0, 100.0])
    ys, info = radau5_integrate(fun, (0.0, 100.0), y0, t_eval, rtol=1e-8, atol=1e-10)
    assert bool(info["success"])

    sol = integrate.solve_ivp(
        lambda t, y: np.asarray(fun(t, y)),
        (0.0, 100.0),
        np.asarray(y0),
        "Radau",
        t_eval=np.asarray(t_eval),
        rtol=1e-8,
        atol=1e-10,
    )
    assert np.allclose(np.asarray(ys).T, sol.y, rtol=1e-5, atol=1e-9)
    # mass conservation
    assert np.allclose(np.asarray(ys).sum(axis=1), 1.0, rtol=1e-9)


def test_stiff_diffusion_column():
    """1D diffusion column with time-varying coefficient (test_problem-like)"""
    nlev = 20
    dz = 900.0 / nlev
    year = 365.0 * 86400.0

    def mixing_coeff(t):
        # boundary-layer-like modulation of a stiff mixing profile
        frac = 0.5 + 0.5 * jnp.cos(2 * jnp.pi * t / year)
        kvals = 10.0 ** (-5.0 + 5.0 * frac) / dz
        return kvals

    def fun(t, y):
        k = mixing_coeff(t)
        flux = jnp.zeros(nlev + 1)
        flux = flux.at[1:-1].set(k * (y[1:] - y[:-1]))
        # surface restoring + constant source
        flux = flux.at[0].set(24.0 / 86400.0 * 10.0 * y[0])
        return (flux[1:] - flux[:-1]) / dz + 1.0 / year

    y0 = jnp.linspace(0.0, 100.0, nlev)
    t_eval = jnp.linspace(0.0, year, 5)
    ys, info = jax.jit(
        lambda y: radau5_integrate(
            fun, (0.0, year), y, t_eval, rtol=1e-10, atol=1e-10
        )
    )(y0)
    assert bool(info["success"])

    sol = integrate.solve_ivp(
        lambda t, y: np.asarray(fun(t, y)),
        (0.0, float(year)),
        np.asarray(y0),
        "Radau",
        t_eval=np.asarray(t_eval),
        rtol=1e-10,
        atol=1e-10,
    )
    assert np.allclose(np.asarray(ys).T, sol.y, rtol=1e-7, atol=1e-8)


def test_forward_mode_jvp():
    """exact jax.jvp through the adaptive integrator (linear problem)"""
    a = -0.7

    def fun(t, y):
        return a * y

    def end_state(y0):
        ys, _ = radau5_integrate(
            fun, (0.0, 1.0), y0, jnp.array([0.0, 1.0]), rtol=1e-12, atol=1e-12
        )
        return ys[-1]

    y0 = jnp.array([2.0])
    v = jnp.array([1.0])
    _, tangent = jax.jvp(end_state, (y0,), (v,))
    # for a linear ODE, d(end)/d(y0) = exp(a*T)
    assert np.allclose(np.asarray(tangent), np.exp(a), rtol=1e-6)


def test_vmap_batching():
    """vmap over a batch of independent decay problems"""

    def end_state(rate, y0):
        fun = lambda t, y: -rate * y
        ys, _ = radau5_integrate(
            fun, (0.0, 1.0), y0, jnp.array([0.0, 1.0]), rtol=1e-10, atol=1e-10
        )
        return ys[-1]

    rates = jnp.array([0.1, 1.0, 5.0])
    y0s = jnp.ones((3, 2))
    res = jax.vmap(end_state)(rates, y0s)
    assert np.allclose(np.asarray(res), np.exp(-np.asarray(rates))[:, None], rtol=1e-8)

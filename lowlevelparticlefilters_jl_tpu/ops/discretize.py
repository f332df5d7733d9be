"""Discretization helpers: RK4 and integrator covariances.

Mirrors /root/reference/src/utils.jl:133-237 (`rk4`,
`double_integrator_covariance[_smooth]`, `n_integrator_covariance[_smooth]`).
`rk4` returns a jit-compatible discrete dynamics; `supersample` unrolls at
trace time (static), matching the reference's compile-time loop.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def rk4(f, Ts: float, supersample: int = 1):
    """Discretize continuous dynamics ``f(x, u, p, t) -> dx/dt`` with RK4.

    Returns ``fd(x, u, p, t) -> x(t + Ts)`` (utils.jl:220-237).
    """
    if supersample < 1:
        raise ValueError("supersample must be positive")
    h = Ts / supersample

    def fd(x, u, p, t, *args, **kwargs):
        for _ in range(supersample):
            f1 = f(x, u, p, t, *args, **kwargs)
            f2 = f(x + 0.5 * h * f1, u, p, t + 0.5 * h, *args, **kwargs)
            f3 = f(x + 0.5 * h * f2, u, p, t + 0.5 * h, *args, **kwargs)
            f4 = f(x + h * f3, u, p, t + h, *args, **kwargs)
            x = x + (h / 6.0) * (f1 + 2.0 * f2 + 2.0 * f3 + f4)
            t = t + h
        return x

    return fd


def double_integrator_covariance(Ts: float, s2: float = 1.0) -> jnp.ndarray:
    """Piecewise-constant-force double-integrator covariance (utils.jl:133-136)."""
    return s2 * jnp.array(
        [[Ts**4 / 4, Ts**3 / 2], [Ts**3 / 2, Ts**2]]
    )


def double_integrator_covariance_smooth(Ts: float, s2: float = 1.0) -> jnp.ndarray:
    """Continuous-noise double-integrator covariance (utils.jl:181-184)."""
    return s2 * jnp.array(
        [[Ts**3 / 3, Ts**2 / 2], [Ts**2 / 2, Ts]]
    )


def n_integrator_covariance(n: int, Ts: float, s2: float = 1.0) -> jnp.ndarray:
    """Rank-1 n-integrator covariance, piecewise-constant force (utils.jl:163-169)."""
    B = jnp.array([Ts ** (n - i) / math.factorial(n - i) for i in range(n)])
    return s2 * jnp.outer(B, B)


def n_integrator_covariance_smooth(n: int, Ts: float, s2: float = 1.0) -> jnp.ndarray:
    """Full-rank n-integrator covariance, continuous noise (utils.jl:213-216)."""
    rows = []
    for i in range(1, n + 1):
        row = []
        for j in range(1, n + 1):
            p = 2 * n - i - j + 1
            row.append(
                s2 * Ts**p / (p * math.factorial(n - i) * math.factorial(n - j))
            )
        rows.append(row)
    return jnp.array(rows)

"""Linear Kalman filter vs. a straight-line NumPy oracle + API behavior.

Mirrors the reference's linear-Gaussian tests (test/runtests.jl:332-382)
and the function/time-varying matrix tests (test/test_function_versions.jl,
test/test_getmat_3d_time.jl).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf


def make_system(dtype=np.float64):
    eye = np.eye(2, dtype=dtype)
    A = np.array([[1.0, 0.1], [0.0, 1.0]], dtype=dtype)
    B = np.array([[0.0], [1.0]], dtype=dtype)
    C = np.array([[1.0, 0.0]], dtype=dtype)
    R1 = 0.01 * eye
    R2 = np.array([[0.1]], dtype=dtype)
    return A, B, C, R1, R2


def numpy_kf(A, B, C, R1, R2, x0, P0, u, y):
    """Reference-semantics sequential KF (filtering.jl:52-128)."""
    T = len(y)
    x, P = x0.copy(), P0.copy()
    ll = 0.0
    xs, xts, Rs, Rts, es = [], [], [], [], []
    for k in range(T):
        xs.append(x.copy())
        Rs.append(P.copy())
        e = y[k] - C @ x
        S = C @ P @ C.T + R2
        K = P @ C.T @ np.linalg.inv(S)
        x = x + K @ e
        P = (np.eye(len(x)) - K @ C) @ P
        P = 0.5 * (P + P.T)
        ll += -0.5 * (
            len(e) * np.log(2 * np.pi)
            + np.linalg.slogdet(S)[1]
            + e @ np.linalg.solve(S, e)
        )
        xts.append(x.copy())
        Rts.append(P.copy())
        es.append(e.copy())
        x = A @ x + B @ u[k]
        P = A @ P @ A.T + R1
    return map(np.array, (xs, xts, Rs, Rts, es)), ll


@pytest.fixture
def data(rng):
    A, B, C, R1, R2 = make_system()
    T = 200
    u = rng.normal(size=(T, 1))
    x = np.zeros(2)
    ys = []
    for k in range(T):
        ys.append(C @ x + np.sqrt(R2[0, 0]) * rng.normal(size=1))
        x = A @ x + B @ u[k] + rng.multivariate_normal(np.zeros(2), R1)
    return u, np.array(ys)


def test_forward_trajectory_matches_numpy_oracle(data):
    A, B, C, R1, R2 = make_system()
    u, y = data
    kf = llpf.KalmanFilter(A, B, C, 0, R1, R2)
    sol = llpf.forward_trajectory(kf, u, y)
    (xs, xts, Rs, Rts, es), ll = numpy_kf(
        A, B, C, R1, R2, np.zeros(2), R1.copy(), u, y
    )
    np.testing.assert_allclose(sol.x, xs, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(sol.xt, xts, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(sol.R, Rs, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(sol.Rt, Rts, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(sol.e, es, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(float(sol.ll), ll, rtol=1e-8)
    assert bool(jnp.all(sol.ok))


def test_loglik_and_sse_agree_with_solution(data):
    A, B, C, R1, R2 = make_system()
    u, y = data
    kf = llpf.KalmanFilter(A, B, C, 0, R1, R2)
    sol = llpf.forward_trajectory(kf, u, y)
    assert np.isclose(float(llpf.loglik(kf, u, y)), float(sol.ll))
    assert np.isclose(float(llpf.sse(kf, u, y)), float(np.sum(sol.e**2)))


def test_jit_and_grad_through_filter(data):
    """ForwardDiff tests analogue (test/test_diff.jl:33-107): gradients of
    loglik w.r.t. covariance parameters flow through the scan."""
    A, B, C, R1, R2 = make_system()
    u, y = data

    def nll(log_r2):
        kf = llpf.KalmanFilter(A, B, C, 0, R1, jnp.exp(log_r2) * jnp.eye(1))
        return -llpf.loglik(kf, u, y)

    g = jax.grad(nll)(jnp.log(jnp.asarray(0.1)))
    assert np.isfinite(float(g))
    # finite-difference check
    eps = 1e-6
    fd = (nll(jnp.log(0.1) + eps) - nll(jnp.log(0.1) - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)

    jitted = jax.jit(lambda: llpf.forward_trajectory(
        llpf.KalmanFilter(A, B, C, 0, R1, R2), u, y).ll)
    assert np.isfinite(float(jitted()))


def test_time_varying_and_function_matrices(data):
    """get_mat convention: constant == stacked == callable
    (test/test_function_versions.jl:36-44, test_getmat_3d_time.jl)."""
    A, B, C, R1, R2 = make_system()
    u, y = data
    T = len(y)
    kf_const = llpf.KalmanFilter(A, B, C, 0, R1, R2)
    A_stack = np.broadcast_to(A, (T, 2, 2)).copy()
    kf_tv = llpf.KalmanFilter(llpf.TimeVarying(jnp.asarray(A_stack)), B, C, 0, R1, R2,
                              nx=2, ny=1, nu=1, d0=llpf.MvNormal(jnp.zeros(2), jnp.asarray(R1)))
    kf_fn = llpf.KalmanFilter(lambda x, u_, p, t: jnp.asarray(A), B, C, 0, R1, R2,
                              nx=2, ny=1, nu=1, d0=llpf.MvNormal(jnp.zeros(2), jnp.asarray(R1)))
    ll0 = float(llpf.loglik(kf_const, u, y))
    assert np.isclose(float(llpf.loglik(kf_tv, u, y)), ll0)
    assert np.isclose(float(llpf.loglik(kf_fn, u, y)), ll0)


def test_alpha_forgetting_increases_covariance(data):
    A, B, C, R1, R2 = make_system()
    u, y = data
    kf1 = llpf.KalmanFilter(A, B, C, 0, R1, R2, alpha=1.0)
    kf2 = llpf.KalmanFilter(A, B, C, 0, R1, R2, alpha=1.2)
    s1 = llpf.forward_trajectory(kf1, u, y)
    s2 = llpf.forward_trajectory(kf2, u, y)
    assert float(jnp.trace(s2.R[-1])) > float(jnp.trace(s1.R[-1]))


def test_simulate_roundtrip_covariance(rng):
    """simulate → filter statistical roundtrip (runtests.jl:245-486 style)."""
    A, B, C, R1, R2 = make_system()
    kf = llpf.KalmanFilter(A, B, C, 0, R1, R2)
    key = jax.random.PRNGKey(0)
    u = jnp.asarray(rng.normal(size=(500, 1)))
    x, u, y = llpf.simulate(kf, u, key)
    sol = llpf.forward_trajectory(kf, u, y)
    err = np.asarray(sol.xt) - np.asarray(x)
    # filtered error should be smaller than raw measurement noise mapped to x1
    assert err[:, 0].std() < np.sqrt(R2[0, 0])
    assert bool(jnp.all(sol.ok))


def test_simulate_typed_key_and_ensemble(rng):
    """simulate accepts new-style typed keys (jax.random.key) and
    simulate_ensemble (the MonteCarloMeasurementsExt counterpart) is
    reachable from the package root — regression for the raw-uint32
    key-reshape assumption in the scan key split."""
    A, B, C, R1, R2 = make_system()
    kf = llpf.KalmanFilter(A, B, C, 0, R1, R2)
    u = jnp.asarray(rng.normal(size=(40, 1)))
    x, u2, y = llpf.simulate(kf, u, jax.random.key(3))
    assert x.shape == (40, 2) and y.shape == (40, 1)
    xs, us, ys = llpf.simulate_ensemble(kf, u, jax.random.key(4), n_runs=6)
    assert xs.shape == (6, 40, 2) and ys.shape == (6, 40, 1)
    # distinct runs draw distinct noise
    assert not np.allclose(np.asarray(xs[0]), np.asarray(xs[1]))


def test_vmap_filter_bank(data):
    """Batched KF bank — the @1024-filters execution mode."""
    A, B, C, R1, R2 = make_system()
    u, y = data
    q = jnp.linspace(0.5, 2.0, 8)

    def ll_one(qi):
        kf = llpf.KalmanFilter(A, B, C, 0, qi * R1, R2)
        return llpf.loglik(kf, u, y)

    lls = jax.vmap(ll_one)(q)
    assert lls.shape == (8,)
    assert bool(jnp.all(jnp.isfinite(lls)))
